package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mint a larger scale-factor copy of the driver's test tables by
  * unioning K re-keyed copies of the sf0.1 facts (docs/SCALE.md's
  * measured scale curve uses K=10 → "sf1").
  *
  * - Dimension tables (region/nation/customer/supplier/part) copy
  *   through unchanged — at 100 TB the dims stay broadcast-sized, so
  *   growing them would distort the join shapes being measured.
  * - Fact tables (orders/lineitem/events/documents/embeddings) get K
  *   copies with primary keys shifted by copy*1e9 so keys stay unique;
  *   fact-to-fact keys (l_orderkey) shift with their parent so join
  *   cardinality per key is preserved. Dim FKs (o_custkey, l_partkey,
  *   l_suppkey) are left alone: each customer simply has K× orders,
  *   which is exactly what a bigger fact against a fixed dim looks like.
  * - Payload columns (text, embedding) are NOT perturbed: copy k of a
  *   document is content-identical to copy 0, so every LSH/SimHash/
  *   Jaccard bucket gets K× denser. That is deliberate — it stress-tests
  *   the per-bucket probe caps that keep near-dup candidate generation
  *   linear (a cap-less implementation would go quadratic here).
  *
  * Usage: runMain graft.MintScale <srcDir> <outDir> [K=10]
  */
object MintScale {
  private val KeyOffset = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rekey: Map[String, Seq[String]] = Map(
      "orders" -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey"),
      "events" -> Seq("event_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    def copies(df: DataFrame, keys: Seq[String]): DataFrame =
      (0 until k).map { c =>
        keys.foldLeft(df)((d, key) =>
          d.withColumn(key, col(key) + lit(c.toLong * KeyOffset)))
      }.reduce(_.unionAll(_))

    graft.core.Tables.names.foreach { name =>
      val base =
        if (name == "events") graft.core.Tables.events(spark, src)
        else graft.core.Tables.load(spark, src, name)
      val scaled = rekey.get(name) match {
        case Some(keys) =>
          // Repartition so the output lands as multiple row groups —
          // the measured dir should scan in parallel like a production
          // table, not serialize on one K-file-concat row group.
          copies(base, keys).repartition(cpus.toInt)
        case None => base
      }
      scaled.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[mint] $name -> $out/$name.parquet" +
        (if (rekey.contains(name)) s" (x$k)" else " (dim copy)"))
    }
    spark.stop()
  }
}
