package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every oracle SQL string in [[SparkEntry.oracleSql]].
  *
  * Guards the exact bug class behind the two round-3 correctness reds:
  * DuckDB `sum()` over an integer column returns HUGEINT, which pandas
  * renders as float64 ("2924.0"), so the driver's exact hash compare
  * fails even when values are identical. Any projected integer sum must
  * be written `CAST(sum(...) AS BIGINT)`.
  *
  * DuckDB is driver-side only (not on this JVM's classpath), so this is
  * a line lint, not a dtype probe: flag every `sum(` line lacking a
  * `CAST` on the same line, minus a documented allowlist of sums that
  * are float-typed or never projected into the compared result.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Lines where an uncast sum( is known-safe. Keep each entry justified. */
  private val allow: Seq[(String, String)] = Seq(
    // double-typed: gaussian weights (agg_gaussian_weight, pipe_absa_sentiment)
    ("sum(weight", "sum over DOUBLE weight column"),
    // double-typed: langid trigram log-weights (text_langid_ngram)
    ("sum(coalesce(w.wt", "sum over DOUBLE weight/floor columns"),
    // HAVING-only predicate, never projected (pipe_opinion_patterns)
    ("sum(occ) >= 2", "HAVING predicate, not in the compared projection"),
    // windowed session counter used as a GROUP BY key only (window_sessionize)
    ("sum(case when gap_sec", "grouping key, dropped before final projection"),
    // windowed island counter used as a GROUP BY key only (dedup_substring_spans)
    ("sum(brk) over", "grouping key, dropped before final projection"),
    // list_sum is DuckDB's array fold over DOUBLE vectors (cosine oracles)
    ("list_sum(", "array fold over DOUBLE embeddings"),
    // double-typed: DSIR importance weights are sums of ln() terms
    ("sum(ln(", "sum over DOUBLE log-ratio terms"),
    // divisor inside `n * 1.0 / sum(n) OVER ...` — the projected value is
    // the DOUBLE ratio, the raw HUGEINT sum never reaches the projection
    // (window_markov_transitions)
    ("/ sum(n) over", "divisor in a DOUBLE ratio, raw sum not projected")
  )

  test("every projected integer sum in oracle SQL is CAST to BIGINT") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      (line, i)   <- sql.linesIterator.zipWithIndex.toSeq
      lc           = line.toLowerCase
      if lc.contains("sum(")
      if !lc.contains("cast")
      if !allow.exists { case (pat, _) => lc.contains(pat) }
    } yield s"$name line ${i + 1}: ${line.trim}"

    assert(offenders.isEmpty,
      s"\nUncast sum() in oracle SQL — DuckDB returns HUGEINT for integer " +
        s"sums and the driver hash compare will fail on '2924.0' vs '2924'. " +
        s"Wrap in CAST(sum(...) AS BIGINT) or extend the allowlist with a " +
        s"justification:\n  ${offenders.mkString("\n  ")}")
  }

  test("no oracle line starts with | (stripMargin || truncation residue)") {
    // A source line starting with `||` (SQL concat) loses its first `|` to
    // stripMargin, so a `|`-leading line in the final string is the
    // truncation residue of that trap. Valid SQL never needs a leading `|`.
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      (line, i)   <- sql.linesIterator.zipWithIndex.toSeq
      if line.trim.startsWith("|")
    } yield s"$name line ${i + 1}: ${line.trim}"
    assert(offenders.isEmpty,
      s"\nOracle lines starting with | — stripMargin ate a || concat " +
        s"operator; use concat(...) instead:\n  ${offenders.mkString("\n  ")}")
  }
}
