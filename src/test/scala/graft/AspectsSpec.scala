package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.absa.TargetAspects

/** Reference-derived vectors for the aspect-tree flatten (the expected
  * tuples below are the output of the reference's own
  * `ConvertTargetAspects.flatten`/`expand` run over the same fixture). */
class AspectsSpec extends AnyFunSuite {

  private val fixture = """
  {
    /* engine fixture: quoted keys, nesting, empty lists, scope leak */
    "'General'": ["alpha", "beta"],
    "Exhibits": {
      "'General'": ["art", "canvas"],
      "Modern": ["klee", "munch"],
      "Empty": [],
      "Nested": {"Deep": ["deepword"]}
    },
    "Cafe": ["coffee", "cake"]
  }"""

  test("quoted keys strip quotes and do not self-add") {
    val lex = TargetAspects.lexicon(fixture)
    assert(lex.contains((Seq("General"), "alpha")))
    assert(!lex.contains((Seq("General"), "General")))
    assert(!lex.exists(_._1.exists(_.contains("'"))))
  }

  test("unquoted leaf keys self-add after their words") {
    val lex = TargetAspects.lexicon(fixture)
    assert(lex.contains((Seq("Exhibits", "Modern"), "Modern")))
    // empty word list still yields the self row
    assert(lex.filter(_._1 == Seq("Exhibits", "Empty")).map(_._2) === Seq("Empty"))
  }

  test("subtree nodes inherit the LAST descendant's words (reference scope leak)") {
    val lex = TargetAspects.lexicon(fixture)
    assert(lex.filter(_._1 == Seq("Exhibits", "Nested")).map(_._2)
      === Seq("deepword", "Deep", "Nested"))
    assert(lex.filter(_._1 == Seq("Exhibits")).map(_._2)
      === Seq("deepword", "Deep", "Nested", "Exhibits"))
  }

  test("reference-run expected rows, full fixture, in order") {
    val got = TargetAspects.lexicon(fixture)
      .map { case (p, w) => (p.mkString(">"), w) }
    val expected = Seq(
      ("General", "alpha"), ("General", "beta"),
      ("Exhibits>General", "art"), ("Exhibits>General", "canvas"),
      ("Exhibits>Modern", "klee"), ("Exhibits>Modern", "munch"),
      ("Exhibits>Modern", "Modern"),
      ("Exhibits>Empty", "Empty"),
      ("Exhibits>Nested>Deep", "deepword"), ("Exhibits>Nested>Deep", "Deep"),
      ("Exhibits>Nested", "deepword"), ("Exhibits>Nested", "Deep"),
      ("Exhibits>Nested", "Nested"),
      ("Exhibits", "deepword"), ("Exhibits", "Deep"), ("Exhibits", "Nested"),
      ("Exhibits", "Exhibits"),
      ("Cafe", "coffee"), ("Cafe", "cake"), ("Cafe", "Cafe"))
    assert(got === expected)
  }

  test("duplicate paths collapse dict-style: first position, last value") {
    val dup = """{"'X'": ["a"], "X": ["b"]}"""
    // ('X',)->["a"] then ('X',)->["b","X"]: last value wins, first position
    assert(TargetAspects.lexicon(dup).map { case (p, w) => (p.head, w) }
      === Seq(("X", "b"), ("X", "X")))
  }
}
