package graft

import org.apache.spark.sql.functions._
import graft.queries.QueryBase

/** Adversarial coverage for the exact-sum kernels (QueryBase.wsum/dsum) —
  * the claim "exact, order-independent, at any magnitude the digit-split
  * supports" is what every money/centroid oracle row leans on. */
class WsumSpec extends SparkSpec with QueryBase {
  import spark.implicits._

  test("wsum equals BigInt sum on adversarial longs (negatives, extremes)") {
    val rnd = new scala.util.Random(42)
    val xs: Seq[Long] = Seq(0L, 1L, -1L, Long.MaxValue / 4, -(Long.MaxValue / 4),
      (1L << 42) - 1, -(1L << 42), (1L << 21) - 1, -(1L << 21)) ++
      Seq.fill(2000)(rnd.nextLong() / 4)
    val expected = xs.map(BigInt(_)).sum
    val got = xs.toDF("x").repartition(13)
      .agg(wsum(col("x")).as("s")).head().getDecimal(0)
    assert(BigInt(got.toBigInteger) === expected)
  }

  test("wsum is partition-order independent") {
    val xs = Seq.fill(5000)(new scala.util.Random(7).nextLong() / 8)
    val a = xs.toDF("x").repartition(3).agg(wsum(col("x"))).head().getDecimal(0)
    val b = xs.reverse.toDF("x").repartition(31).agg(wsum(col("x"))).head().getDecimal(0)
    assert(a === b)
  }

  test("dsum equals exact decimal sum of 2-decimal money values") {
    val rnd = new scala.util.Random(11)
    val cents = Seq.fill(3000)(rnd.nextInt(2000000000) - 1000000000)
    val xs = cents.map(_ / 100.0)
    val expected = BigDecimal(cents.map(BigInt(_)).sum) / 100
    val got = xs.toDF("x").repartition(17)
      .agg(dsum(col("x")).as("s")).head().getDouble(0)
    assert(got === expected.toDouble)
  }
}
