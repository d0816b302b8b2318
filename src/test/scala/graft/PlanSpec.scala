package graft

import graft.queries.Catalog

/** Physical-plan shape regressions — the properties that make the catalog
  * hold up at 100 TB, asserted so a future edit can't silently trade them
  * away:
  *
  *  - small dims/lexicons broadcast (no shuffle of the fact side);
  *  - no cartesian product on fact × fact anywhere in the catalog;
  *  - filters reach the parquet scan (PushedFilters);
  *  - projections prune the scan (ReadSchema carries only used columns).
  *
  * Plans are built against sf0.001 (plan shape, not data, is under test).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Catalog.byName(name).spark(spark, dir)
      .queryExecution.executedPlan.toString

  test("small-dim joins broadcast") {
    assert(plan("join_multiway_broadcast").contains("BroadcastHashJoin"))
    assert(plan("join_lexicon_equality").contains("BroadcastHashJoin"))
    assert(plan("src_catalog_geocode").contains("BroadcastHashJoin"))
    assert(plan("text_embedding_lookup").contains("BroadcastHashJoin"))
  }

  test("KNN forecast is a broadcast cross join, never a shuffled cartesian") {
    val p = plan("ml_knn_forecast")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("exhibition_day interval join broadcasts the tiny dim") {
    val p = plan("view_exhibition_day")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("no cartesian products in any catalog plan") {
    // The dedup/similarity self-joins must stay keyed (band/bucket
    // equi-joins); pattern cross joins must broadcast their 2-row dim.
    // The two driver-fit ML stages execute eagerly at plan-build time, so
    // they are exercised implicitly (their final frames are tiny).
    Catalog.all.foreach { q =>
      val p = Catalog.byName(q.name).spark(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${q.name} contains a cartesian product")
    }
  }

  test("filters are pushed down to the parquet scan") {
    val p = plan("join_fkey_violations")
    assert(p.contains("PushedFilters: [") && p.contains("IsNotNull"),
      s"expected pushed filters in:\n$p")
  }

  test("projections prune the scan schema") {
    // set_union_all touches only the nationkey columns; a scan that still
    // reads the wide comment/address columns would be a pruning break.
    val p = plan("set_union_all")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("c_comment") && !p.contains("c_address"),
      s"unpruned customer scan in:\n$p")
  }
}
