package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Planted-fixture behavior of the substring-dedup span detector:
  * cross-doc shared substrings, within-doc repetition, span merging, and
  * clean docs staying out of the output.
  */
class SubstringSpanSpec extends SparkSpec {

  private def words(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("shared >=k substring is found with exact span bounds; clean docs omitted") {
    import spark.implicits._
    val shared = words(10, "dup") // 10 shared tokens
    val a = s"${words(5, "ua")} $shared ${words(4, "ub")}" // span at 6..15
    val b = s"$shared ${words(7, "uc")}" // span at 1..10
    val clean = words(20, "clean")
    val df = Seq((1L, a), (2L, b), (3L, clean)).toDF("doc_id", "text")
    val got = DedupQueries.substringSpans(df, 4)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // doc 1: 19 tokens, one span of the 10 shared tokens; doc 2: 17 tokens
    assert(got.toSeq == Seq((1L, 19, 1L, 10L), (2L, 17, 1L, 10L)))
  }

  test("within-doc repetition is caught and adjacent windows merge to one span") {
    import spark.implicits._
    val phrase = words(6, "rep")
    // phrase appears twice inside ONE doc, separated by unique filler
    val doc = s"$phrase ${words(8, "mid")} $phrase"
    val df = Seq((7L, doc)).toDF("doc_id", "text")
    val got = DedupQueries.substringSpans(df, 4).collect()
    assert(got.length == 1)
    val r = got.head
    // both 6-token occurrences become spans: 2 spans, 12 duplicated tokens
    assert(r.getLong(2) == 2L, s"n_spans: ${r.getLong(2)}")
    assert(r.getLong(3) == 12L, s"dup_tokens: ${r.getLong(3)}")
    assert(math.abs(r.getDouble(4) - 12.0 / 20.0) < 1e-9)
  }

  test("overlapping duplicated regions merge into a single maximal span") {
    import spark.implicits._
    // two docs share a long 12-token run; every interior 4-shingle dups,
    // so windows overlap chain-wise and must merge to ONE span of 12
    val run = words(12, "x")
    val df = Seq(
      (1L, s"${words(3, "p")} $run"),
      (2L, s"$run ${words(3, "q")}")).toDF("doc_id", "text")
    val got = DedupQueries.substringSpans(df, 4)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 1L))
    assert(got.map(_.getLong(3)).toSeq == Seq(12L, 12L))
  }
}
