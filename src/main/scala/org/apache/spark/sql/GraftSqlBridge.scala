package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows` (private[sql]) so graft's custom logical
  * operators (e.g. [[graft.plans.TopKPerKey]]) can be wrapped back into a
  * public DataFrame. The same package-placement technique Delta Lake and
  * Iceberg use for their DataFrame-producing operators; nothing else of
  * Spark's internals is touched here.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a raw Catalyst expression in a public Column (and back) —
    * `classic.ExpressionUtils` is private[sql]. Lets builders construct
    * parameterized custom expressions (e.g. band_keys_l) directly
    * instead of round-tripping through a SQL string + the function
    * registry (string quoting hazard, registration side effects). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
