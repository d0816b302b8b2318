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
}
