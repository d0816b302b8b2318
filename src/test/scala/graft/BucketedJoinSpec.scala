package graft

import graft.queries.Catalog
import org.apache.spark.sql.functions._

/** Plan-shape proof for `join_bucketed_colocate`: bucketing must remove
  * the shuffle under the sort-merge join, and the unbucketed twin of the
  * same join must show the shuffles bucketing saved — otherwise the
  * query demonstrates nothing.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed SMJ has zero exchanges under the join; unbucketed twin shuffles") {
    // Building the query runs the bucketed writes eagerly.
    val df = Catalog.byName("join_bucketed_colocate").spark(spark, dir)

    // Isolate the join subtree: re-read the bucketed tables exactly as
    // the query does and inspect the join's own plan (the full query's
    // groupBy/orderBy legitimately add exchanges above the join).
    val joined = spark.table("g_bkt_orders").hint("merge")
      .join(spark.table("g_bkt_customer"),
        col("o_custkey") === col("c_custkey"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ in:\n$p")
    assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")

    val unbucketed = graft.core.Tables.load(spark, dir, "orders")
      .select("o_custkey", "o_totalprice").hint("merge")
      .join(graft.core.Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
    val q = unbucketed.queryExecution.executedPlan.toString
    assert(q.contains("Exchange"), s"unbucketed twin should shuffle:\n$q")

    // And the query's visible result is sane (full value parity is the
    // DuckDB gate's job).
    val rows = df.collect()
    assert(rows.length == 5) // TPC-H mktsegments
    assert(rows.map(_.getLong(1)).sum > 0)
  }
}
