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
