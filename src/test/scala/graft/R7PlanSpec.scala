package graft

import graft.queries.Catalog

/** Physical-plan shape assertions for the round-7 operators — each
  * pins the structural claim its Scaladoc/SCALE.md row makes (plans
  * inspected via executedPlan.toString: QueryStageExec is a leaf to
  * TreeNode.collect under AQE, so string assertions are the robust
  * form here).
  */
class R7PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = Catalog.byName(name).spark(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("join_phonetic_soundex is a hash equi-join, not a nested loop") {
    val p = plan("join_phonetic_soundex")
    assert(p.contains("BroadcastHashJoin"),
      "phonetic blocking must plan as a broadcast HASH join on the block key")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "no nested-loop/cartesian allowed — blocking is the whole point")
  }

  test("ml_hmm_viterbi streams a single user-keyed secondary-sorted fold") {
    // The AQE plan string prints "== Final Plan ==" AND "== Initial
    // Plan ==" — count exchanges only in the final section.
    val p = plan("ml_hmm_viterbi").split("== Initial Plan ==")(0)
    val exchanges = "Exchange ".r.findAllIn(p).length
    // r9 form: flatMapSortedGroups = MapGroups over the user-keyed
    // exchange with a (key, us, event_id) secondary sort — the spillable
    // streaming fold, NOT a collected array.
    assert(p.contains("MapGroups"),
      "the fold must stream through MapGroups (flatMapSortedGroups)")
    assert("Sort \\[value#\\d+L ASC NULLS FIRST, us#\\d+L ASC".r
      .findFirstIn(p).isDefined,
      "rows must be secondary-sorted inside the user partition")
    assert(!p.contains("collect_list"),
      "no collected per-user array anywhere in the plan")
    // one hash exchange for the grouping + one range exchange for the
    // final total ORDER BY — nothing else.
    assert(exchanges <= 2, s"expected <= 2 exchanges, got $exchanges in:\n$p")
  }

  test("pipe_sequence_pack windows are shard-partitioned, never global") {
    val p = plan("pipe_sequence_pack")
    assert(p.contains("hashpartitioning(shard"),
      "the running offset must partition by shard")
    assert(!p.contains("SinglePartition), Window") &&
      !p.contains("Window [sum") || p.contains("hashpartitioning(shard"),
      "no single-partition global window allowed")
  }

  test("ml_ridge_crossval is join-free: one grouped aggregate + window") {
    val p = plan("ml_ridge_crossval")
    assert(!p.contains("Join"),
      "CV must come from sufficient-statistic algebra, not per-fold joins")
  }

  test("window_zscore_anomaly carries no join and one series partitioning") {
    val p = plan("window_zscore_anomaly")
    assert(!p.contains("Join"), "rolling z is window-only")
    assert(p.contains("hashpartitioning(event_type"),
      "windows must partition by series key")
  }

  test("jaro queries run the guarded/pruned forms") {
    val p = plan("join_jaro_prefilter")
    assert(p.contains("jaro_winkler_ge_bounded"),
      "the bound rule must have rewritten the bare threshold")
  }
}
