package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for catalog queries.
  *
  * Determinism rules (the DuckDB oracle hash-compares values):
  *  - Money-ish SUMs go through DECIMAL so the aggregation is exact and
  *    order-independent — `sum(x::DECIMAL(20,4))::DOUBLE` is bit-identical
  *    between Spark and DuckDB, while a parallel double sum is not.
  *  - O(1)-magnitude float results (stddev, cosine, ratios) are rounded to
  *    6 decimals on both sides.
  *  - Every query ends in a total ORDER BY (unique tiebreak included).
  */
trait QueryBase {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") graft.core.Tables.events(s, dir)
    else graft.core.Tables.load(s, dir, name)

  /** Total order by `keys` with an EXPLICIT range-partition count.
    *
    * The sorted-input restructure (OPTIMIZATION_r14.md Finding A)
    * deliberately sorts NARROW key columns and runs the expensive
    * projection above the sort — but a plain `orderBy` plans an
    * ENSURE_REQUIREMENTS range exchange that AQE coalesces by BYTES,
    * and narrow keys make the byte count tiny, so the whole post-sort
    * projection collapsed to one task (measured at ×10: bronze_bookings
    * 1.6 → 17.4 s cold). An explicit numPartitions is exempt from AQE
    * coalescing; the count derives from the session's core count (the
    * Tables.parallelize policy), not a local-mode constant. Equal keys
    * hash to one partition and partitions are range-ordered, so the
    * total output order is identical to `orderBy(keys)`. */
  def sortedByKeys(df: DataFrame, keys: Column*): DataFrame =
    df.repartitionByRange(
        df.sparkSession.sparkContext.defaultParallelism, keys: _*)
      .sortWithinPartitions(keys: _*)

  /** Deterministic 60-bit hash from md5 — identical in Spark and DuckDB
    * (duck face: `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`).
    * ONE definition for every sampling/bucketing/embedding site (it was
    * copied per-file through round 8; the oracle twin must change in
    * lockstep, so the drift surface is now a single method). The
    * defensive cast-to-string is a no-op in-plan for string inputs
    * (SimplifyCasts) and makes numeric keys hash their decimal digits,
    * matching the duck face's CAST(x AS VARCHAR). */
  def h64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Heavy-compute scan: same table, but guaranteed ≥ one partition per
    * core before the expensive map-side work (see Tables.parallelize). */
  def th(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.parallelize(t(s, dir, name))

  /** Exact, order-independent sum of an integral long expression with
    * 100-TB-scale headroom, on the codegen'd long-sum path (2-20x faster
    * than Spark's BigDecimal-backed DECIMAL(>18) sum).
    *
    * The per-row value is split into three digit sums (bits 0-20, 21-41,
    * 42-63; arithmetic shift = floor division, so the identity
    * `x == (x>>42)*2^42 + ((x>>21)&m)*2^21 + (x&m)` holds for negatives
    * too). Each digit column sums as a plain long; the three per-group
    * totals are recombined once in DECIMAL(38,0), which is exact.
    * Headroom: the low/mid digit sums are < 2^21 per row, overflowing
    * int64 only past 2^42 (~4.4e12) rows per group; the high digit sum
    * overflows only when the TRUE total exceeds 2^63 * 2^21. A 100 TB
    * lineitem (~7e11 rows) aggregated into one group stays exact. */
  def wsum(x: Column): Column = {
    val m = lit((1L << 21) - 1)
    val dec = DecimalType(38, 0)
    sum(shiftright(x, 42)).cast(dec) * lit(1L << 42) +
      sum(shiftright(x, 21).bitwiseAND(m)).cast(dec) * lit(1L << 21) +
      sum(x.bitwiseAND(m)).cast(dec)
  }

  /** Exact sum of a fixed-point double column via scaled-long arithmetic.
    * `scale` must make the column integral (money = 100). The scaled total
    * is exact at any group size (see [[wsum]]); the descale divides in
    * DECIMAL (exact — quotients have <= 6 fractional digits) and rounds
    * ONCE casting to double, bit-identical to the oracle's
    * `CAST(sum(DECIMAL) AS DOUBLE)`. */
  def dsum(c: Column, scale: Long = 100L): Column =
    (wsum(round(c * scale).cast("long")).cast(DecimalType(38, 6)) / lit(scale))
      .cast("double")

  /** Exact average = scaled-long sum / count. */
  def davg(c: Column, scale: Long = 100L): Column =
    dsum(c, scale) / count(c)
}
