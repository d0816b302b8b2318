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

  /** Exact, order-independent sum of a 2-decimal double column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 4))).cast("double")

  /** Exact average = decimal sum / count. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(30, 4))).cast("double") / count(c)).cast("double")
}
