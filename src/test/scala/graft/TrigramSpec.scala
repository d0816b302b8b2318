package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TrigramOps

/** pg_trgm parity vectors for the TrigramSimilarity expression.
  * The headline vector is PostgreSQL's own documented example:
  * similarity('word', 'two words') = 4/11 ≈ 0.363636.
  */
class TrigramSpec extends AnyFunSuite {

  private def sim(a: String, b: String): Double =
    TrigramOps.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  private def tg(s: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    TrigramOps.trigrams(s).asScala.toSet
  }

  test("pg_trgm documented example: similarity('word','two words') = 4/11") {
    assert(math.abs(sim("word", "two words") - 4.0 / 11.0) < 1e-12)
  }

  test("trigram extraction pads two spaces front, one back, per word") {
    assert(tg("cat") === Set("  c", " ca", "cat", "at "))
    assert(tg("a") === Set("  a", " a "))
    // words split on non-alnum; '#' is a separator (pg_trgm semantics)
    assert(tg("Brand#13") === tg("brand 13"))
    assert(tg("") === Set.empty)
  }

  test("identity, symmetry, bounds") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 #-."
    def randStr() = Seq.fill(rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 500).foreach { _ =>
      val (a, b) = (randStr(), randStr())
      val s = sim(a, b)
      assert(s >= 0.0 && s <= 1.0, s"a=$a b=$b")
      assert(math.abs(sim(a, b) - sim(b, a)) < 1e-15)
      if (tg(a).nonEmpty) assert(sim(a, a) === 1.0)
    }
  }

  test("case-insensitive like pg_trgm") {
    assert(sim("WORD", "word") === 1.0)
  }
}
