package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Bench's baseline parser is a deliberate no-dependency regex scan; this
  * spec pins the contract the gate's self-check relies on — the declared
  * "n" count comes back so a half-parsed warm map can be REFUSED instead
  * of silently gating fewer queries.
  */
class BenchBaselineSpec extends AnyFunSuite {

  private def write(body: String): String = {
    val f = Files.createTempFile("baseline", ".json")
    Files.writeString(f, body)
    f.toString
  }

  test("parses warm map and declared n") {
    val p = write(
      """{"source":"x","n":3,"sf":"sf0.1",
        |"warm":{"q1_agg":0.5,"join_x":1.25,"window_y":0.07},
        |"other":{"not_warm":9.9}}""".stripMargin)
    val (warm, n) = Bench.parseBaseline(p)
    assert(warm == Map("q1_agg" -> 0.5, "join_x" -> 1.25, "window_y" -> 0.07))
    assert(n.contains(3))
  }

  test("missing n comes back None, missing file comes back empty") {
    val p = write("""{"warm":{"a":1.0}}""")
    val (warm, n) = Bench.parseBaseline(p)
    assert(warm == Map("a" -> 1.0) && n.isEmpty)
    val (none, n2) = Bench.parseBaseline("/nonexistent/baseline.json")
    assert(none.isEmpty && n2.isEmpty)
  }

  // --- self-healing remeasure logic (r10 verdict item 2) ---

  test("healSuspects: contended AND over-threshold AND baselined, sorted") {
    val base = Map("a" -> 1.0, "b" -> 1.0, "c" -> 10.0, "d" -> 1.0)
    val warm = Map(
      "a" -> 2.0,  // contended, > max(1.5, 1.5) → suspect
      "b" -> 1.4,  // contended but under threshold → contention didn't bite
      "c" -> 16.0, // contended, > 15.0 → suspect (1.5× rule dominates)
      "d" -> 9.0,  // NOT contended → the gate's business, not the healer's
      "e" -> 99.0) // contended but no baseline → nothing to heal toward
    val sus = Bench.healSuspects(warm, Set("c", "a", "b", "e"), base)
    assert(sus == Seq("a", "c"))
  }

  test("healSuspects: the +0.5 s floor guards sub-second baselines") {
    // base 0.1 s: 1.5× = 0.15 s would false-suspect timer noise; the
    // floor requires 0.6 s before a remeasure is spent on it.
    val base = Map("tiny" -> 0.1)
    assert(Bench.healSuspects(Map("tiny" -> 0.5), Set("tiny"), base).isEmpty)
    assert(Bench.healSuspects(Map("tiny" -> 0.7), Set("tiny"), base)
      == Seq("tiny"))
  }

  test("remeasureClean: co-tenant Spark JVM or excess load rejects") {
    // clean: no sparks, both loads within idle + own + 4
    assert(Bench.remeasureClean(0, 0, 5.0, 2.0, 6.0, 3.0, 1.0))
    // a co-tenant Spark JVM at either boundary rejects
    assert(!Bench.remeasureClean(1, 0, 5.0, 2.0, 6.0, 3.0, 1.0))
    assert(!Bench.remeasureClean(0, 2, 5.0, 2.0, 6.0, 3.0, 1.0))
    // load beyond idle + own + 4 at either boundary rejects
    assert(!Bench.remeasureClean(0, 0, 7.1, 2.0, 6.0, 3.0, 1.0))
    assert(!Bench.remeasureClean(0, 0, 5.0, 2.0, 8.1, 3.0, 1.0))
    // an unknown (-1) JVM count from a /proc walk failure reads clean,
    // matching the per-query flag's treatment
    assert(Bench.remeasureClean(-1, -1, 5.0, 2.0, 6.0, 3.0, 1.0))
  }

  test("a drifted entry shrinks the parsed map below the declared n") {
    // uppercase name: a drift shape the name regex deliberately rejects —
    // the count check catches the shrink. Scientific notation is PARSED
    // (not truncated at 'e'): a truncated value would keep the name and
    // sail past the count check with a wrong number.
    val p = write(
      """{"n":3,"warm":{"ok_query":0.5,"BadName":1.0,"sci":1e-3}}""")
    val (warm, n) = Bench.parseBaseline(p)
    assert(n.contains(3) && warm.size < 3 && warm.contains("ok_query"))
    assert(warm("sci") == 1e-3)
  }
}
