package graft

import org.apache.spark.sql.execution.columnar.InMemoryRelation

import graft.queries.Catalog

/** Plan-shape + semantics assertions for the three-algorithm aspect-match
  * composite `pipe_aspect_match` (r7 verdict item 6): all three guarded
  * kernels present exactly once in the persisted pair-scoring plan, the
  * token stream joined by broadcast hash (never a cartesian), and the
  * fixture's threshold/best-match bind cases verified by value.
  */
class AspectMatchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val df = Catalog.byName("pipe_aspect_match").spark(spark, sfDir)
  private lazy val rows = df.collect()

  /** Top physical plan text plus the cached (persisted) subplan text —
    * the kernels live BELOW the persist point, which the top plan prints
    * only as InMemoryTableScan. */
  private lazy val planText: (String, String) = {
    rows // materialize so AQE finalizes and the cache fills
    val top = df.queryExecution.executedPlan.toString
    // AQE plan strings repeat the tree ("== Final Plan ==" then
    // "== Initial Plan ==") — count kernels in the final section only.
    val cached = df.queryExecution.optimizedPlan
      .collectWithSubqueries { case r: InMemoryRelation =>
        r.cachedPlan.toString.split("== Initial Plan ==")(0) }
      .distinct // the union's three branches scan the SAME cached relation
      .mkString("\n")
    (top, cached)
  }

  test("all three kernels appear once each, in guarded form") {
    val (_, cached) = planText
    // TrigramBoundRule rewrote the 0.65 threshold to the guarded cmp;
    // the raw kernel remains ONCE as the match-value projection.
    assert("trigram_sim_ge_bounded\\(".r.findAllIn(cached).length === 1,
      s"expected exactly one guarded trigram cmp in:\n$cached")
    assert(!cached.contains("trigram_sim(phrase#") ||
      "trigram_sim\\(phrase#\\d+, word#\\d+\\) >= 0\\.65".r
        .findFirstIn(cached).isEmpty,
      "no unrewritten trigram threshold comparison may survive")
    // The levenshtein ratio test runs the BANDED kernel (3-arg, per-row
    // bound floor(0.19·len)) — exactly one levenshtein call in-plan.
    assert("levenshtein\\(".r.findAllIn(cached).length === 1,
      s"expected exactly one banded levenshtein in:\n$cached")
    assert(cached.contains("FLOOR((0.19"),
      "the levenshtein call must carry the per-row 0.19·len band")
    // Equality kernel once.
    assert("\\(lower\\(phrase#\\d+\\) = lower\\(word#\\d+\\)\\)".r
      .findAllIn(cached).length === 1,
      s"expected exactly one equality kernel in:\n$cached")
  }

  test("token stream passes through a broadcast hash join, no cartesian") {
    val (top, cached) = planText
    assert(top.contains("BroadcastHashJoin"),
      "tokens must broadcast-hash-join the matched lexicon")
    assert(!top.contains("CartesianProduct") &&
      !cached.contains("CartesianProduct"),
      "no cartesian product anywhere — the only cross join is the " +
        "broadcast vocab × lexicon pair scoring")
    assert(top.contains("InMemoryTableScan"),
      "the scored pair table must be served from the persist point")
  }

  test("delta: 3VL watermark binds — warm strictly newer, cold covers all") {
    val d = Catalog.byName("pipe_aspect_match_delta").spark(spark, sfDir)
      .collect()
    val (warm, cold) = d.partition(_.getString(0) == "warm")
    assert(warm.nonEmpty && cold.nonEmpty)
    // warm = strictly after the day-179 watermark (2024-06-28)
    assert(warm.map(_.getString(5)).min > "2024-06-28",
      "warm scenario must only touch posts strictly newer than the watermark")
    // cold = NULL watermark (empty state) → IS NOT FALSE → full corpus
    assert(cold.map(_.getString(5)).min == "2024-01-01",
      "cold scenario (empty state table) must process from day zero")
    // warm is a subset of cold's work per (algorithm, aspect)
    val coldTok = cold.map(r => (r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    warm.foreach { r =>
      val k = (r.getString(1), r.getInt(2))
      assert(coldTok.contains(k) && r.getLong(3) <= coldTok(k),
        s"warm work for $k must not exceed the full-corpus run")
    }
  }

  test("fixture bind cases: thresholds and best-match visibly bind") {
    val byAlgoWord = rows.groupBy(r => (r.getString(5), r.getString(4)))
      .view.mapValues(_.length).toMap
    // equality finds only the exact lexicon words present in the corpus
    assert(byAlgoWord.keys.filter(_._1 == "equality").map(_._2).toSet ===
      Set("spark", "merge"))
    // 'victor' matches vector by levenshtein ONLY (trigram 0.4 < 0.65)
    assert(byAlgoWord.contains(("levenshtein", "victor")))
    assert(!byAlgoWord.contains(("trigram", "victor")))
    // best-match binds: 'customeres' qualifies at 0.667 but 'customers'
    // scores 0.727 — the weaker candidate must be absent everywhere
    assert(byAlgoWord.contains(("trigram", "customers")))
    assert(!byAlgoWord.keys.exists(_._2 == "customeres"))
    // both thresholds bind: 'tables' (trigram 0.625, ratio 0.2) absent
    assert(!byAlgoWord.keys.exists(_._2 == "tables"))
  }
}
