package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.plans.TopK

/** Property-style hardening for the custom TopKPerKey operator: random
  * datasets (sizes, key cardinalities, duplicate order values, partition
  * counts, k) against an independently-written Scala reference model.
  * The window-parity test in TopKOperatorSpec checks one real table;
  * this sweeps the input space, seeded for reproducibility.
  */
class TopKPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", LongType), StructField("v", DoubleType),
    StructField("id", LongType)))

  test("TopK.perKey equals the sorted-take reference model on random inputs") {
    val rnd = new scala.util.Random(20260814L)
    for (c <- 1 to 25) {
      val n = rnd.nextInt(200)
      val nKeys = 1 + rnd.nextInt(8)
      val k = 1 + rnd.nextInt(5)
      val parts = 1 + rnd.nextInt(4)
      // small value domain on purpose: forces order-value ties so the
      // id tiebreak is exercised constantly
      val rows = Seq.tabulate(n)(i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toDouble, i.toLong))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(t => Row(t._1, t._2, t._3)),
          parts), schema)
      val got = TopK.perKey(df, Seq("g"), Seq(("v", false), ("id", true)), k)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(t => (-t._2, t._3)).take(k)
      }.toSet
      assert(got == want, s"case $c: n=$n keys=$nKeys k=$k parts=$parts")
    }
  }
}
