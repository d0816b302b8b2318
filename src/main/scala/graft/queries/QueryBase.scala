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

  /** Heavy-compute scan: same table, but guaranteed ≥ one partition per
    * core before the expensive map-side work (see Tables.parallelize). */
  def th(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.parallelize(t(s, dir, name))

  /** Exact, order-independent sum of a fixed-point double column via
    * scaled-long arithmetic (stays on the codegen'd long-sum path instead
    * of Spark's BigDecimal-backed DECIMAL(>18) sum, ~2-3x faster at the
    * same exactness). `scale` must make the column integral (money = 100);
    * headroom: max|x|*scale*rows must fit int64 — at 1e5-magnitude money
    * and 1e4 scale that is ~9e9 rows per group, far past any per-group
    * cardinality here; the DECIMAL fallback remains the right choice for
    * unbounded-magnitude columns. Produces bit-identical doubles to the
    * oracle's exact DECIMAL sum (both are the exact rational rounded once
    * to double). */
  def dsum(c: Column, scale: Long = 100L): Column =
    sum(round(c * scale).cast("long")) / lit(scale.toDouble)

  /** Exact average = scaled-long sum / count. */
  def davg(c: Column, scale: Long = 100L): Column =
    dsum(c, scale) / count(c)
}
