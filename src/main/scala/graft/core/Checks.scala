package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.LongAccumulator

/** CHECK-constraint equivalents (SURVEY §1.2): the reference's schema
  * carries CHECKs (`weight BETWEEN -1 AND 1` migration_028.sql:10,
  * `max - sold - reserved = available` migration_052.sql:21, sentiment
  * bounds migration_038.sql:36-39). Postgres rejects the offending ROW at
  * insert; the engine form is a filter-with-metric: violating rows are
  * dropped from the flow and counted in an accumulator the job can
  * inspect/alert on — the same observable outcome as the reference's
  * insert-time rejection plus its error logging, without failing the
  * batch.
  *
  * Scale shape: one single-pass filter (boolean UDF carrying the
  * accumulator side effect), no shuffle, no extra action or second scan.
  * The UDF is marked non-deterministic so Catalyst never collapses,
  * reorders, or re-evaluates it within a plan. Two overcount caveats
  * remain inherent to accumulators-in-transformations: (a) task-attempt
  * retries/speculation count per ATTEMPT, and (b) every ACTION on the
  * returned `Checked.df` (or a plan built on it) re-runs the filter and
  * adds again — read the metric after exactly one action, or persist the
  * frame first. Fine for alerting (the reference's logger.warning
  * analog); derive exact audit counts with a separate aggregation.
  */
object Checks {

  final case class Checked(df: DataFrame, violations: LongAccumulator)

  /** Keep rows satisfying `constraint`. PG CHECK three-valued logic:
    * a NULL predicate PASSES (only FALSE violates) — that is the default;
    * `nullPasses = false` gives the strict form. */
  def enforce(df: DataFrame, constraint: Column, name: String,
      nullPasses: Boolean = true): Checked = {
    val acc = df.sparkSession.sparkContext.longAccumulator(s"check_$name")
    import org.apache.spark.sql.functions.{coalesce, lit, udf}
    val count = udf { (ok: Boolean) =>
      if (!ok) acc.add(1L)
      ok
    }.asNondeterministic()
    val pass =
      if (nullPasses) coalesce(constraint, lit(true))
      else coalesce(constraint, lit(false))
    Checked(df.filter(count(pass)), acc)
  }
}
