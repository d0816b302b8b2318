package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JaroOps

/** Value tests for [[graft.functions.JaroWinklerSim]]'s kernel against
  * ground truth obtained from DuckDB's independent
  * `jaro_winkler_similarity` implementation (probed 2026-08-14; the
  * catalog query `func_jaro_winkler` re-checks the same parity densely
  * through the oracle gate).
  */
class JaroWinklerSpec extends AnyFunSuite {

  private val cases: Seq[(String, String, Double)] = Seq(
    ("", "", 0.0),
    ("a", "", 0.0),
    ("", "a", 0.0),
    ("a", "a", 1.0),
    ("abc", "abc", 1.0),
    ("ab", "ba", 0.0), // window 0: no off-position matches
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964), // jaro>0.7, prefix 0
    ("hash", "hashing", 0.9142857142857143), // full 4-char prefix boost
    ("join", "jion", 0.9249999999999999),
    ("scan", "scam", 0.8833333333333334),
    ("ab", "ax", 0.6666666666666666), // jaro<=0.7: NO boost despite prefix
    ("ab", "abcdefghij", 0.7866666666666667), // boost just past 0.7
    ("crate", "trace", 0.7333333333333333), // prefix 0 at jaro>0.7
    ("abcdexyz", "abcedxyz", 0.9708333333333333), // one transposition
    ("abcdef", "bcadef", 0.9444444444444445), // ODD raw transpositions: t=3/2=1
    ("abcde", "bcade", 0.8666666666666667),
    ("abcdef", "abxxxx", 0.5555555555555555),
    ("xab", "xba", 0.5555555555555555))

  test("kernel matches DuckDB jaro_winkler_similarity bit-for-bit on probes") {
    cases.foreach { case (a, b, want) =>
      val got = JaroOps.simStr(a, b)
      assert(math.abs(got - want) < 1e-12, s"jw($a, $b): got $got want $want")
    }
  }

  test("symmetry and range on random-ish corpus words") {
    val words = Seq("join", "hash", "row", "batch", "scan", "stream",
      "window", "merge", "index", "b", "", "aaaaaaaaaa")
    for (a <- words; b <- words) {
      val ab = JaroOps.simStr(a, b)
      val ba = JaroOps.simStr(b, a)
      assert(math.abs(ab - ba) < 1e-15, s"asym: $a/$b")
      assert(ab >= 0.0 && ab <= 1.0)
    }
  }

  test("length prune bound is necessary for jw >= 0.9") {
    // join_fuzzy_jaro prunes pairs with 2*min < max; verify no such
    // pair can reach 0.9: jw <= 0.6*jaro + 0.4, jaro <= (2+min/max)/3.
    val words = Seq("a", "ab", "abc", "abcd", "abcdefgh", "abcdefghijklmnop")
    for (a <- words; b <- words
         if math.min(a.length, b.length) * 2 < math.max(a.length, b.length)) {
      assert(JaroOps.simStr(a, b) < 0.9, s"prune unsound on $a/$b")
    }
  }
}
