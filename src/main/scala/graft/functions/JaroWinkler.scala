package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native Catalyst expression.
  *
  * The reference matches noisy user text against clean lexica with
  * PostgreSQL `similarity()` / python-Levenshtein
  * (src/absa/post_aspects.py:152-199); Jaro–Winkler is the third
  * classic fuzzy-match kernel alongside the repo's levenshtein and
  * trigram paths — the one tuned for short tokens with typos, where
  * a shared prefix should count extra (Winkler 1990).
  *
  * Semantics (the textbook definition, byte-for-byte the one DuckDB's
  * `jaro_winkler_similarity` implements — verified empirically against
  * DuckDB on edge pairs: empty strings → 0, window
  * `max(⌊max(|a|,|b|)/2⌋-1, 0)`, half-transpositions, Winkler boost
  * `p·0.1·(1−jaro)` with prefix p ≤ 4 applied only when jaro > 0.7):
  *
  *  - either side empty → 0.0; equal strings → 1.0;
  *  - m = greedy left-to-right matches within the window, each target
  *    position consumed at most once;
  *  - t = half the number of matched characters out of order;
  *  - jaro = (m/|a| + m/|b| + (m−t)/m) / 3.
  *
  * Determinism across engines: catalog queries compare and project
  * `round(jw, 6)`. A 6-decimal tie is impossible — the exact value is
  * a rational whose reduced denominator always carries the factor 3
  * (from the /3) and never divides 2·10⁶, so the true value sits at
  * least ~5e-12 from any rounding boundary, far beyond cross-engine
  * ulp drift in the float evaluation.
  *
  * Stays inside whole-stage codegen via a static call (same idiom as
  * [[TrigramSimilarity]]).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroOps.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroOps.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroOps {

  /** Entry point for codegen'd calls (UTF8String → JVM String is a
    * copy; the corpus tokens this runs on are short, so the copy is
    * cheaper than a code-point decoder loop would save). */
  def sim(a: UTF8String, b: UTF8String): Double =
    simStr(a.toString, b.toString)

  def simStr(s1: String, s2: String): Double = {
    val la = s1.length
    val lb = s2.length
    if (la == 0 || lb == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && s1.charAt(i) == s2.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var traw = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) traw += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - traw / 2) / md) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(la, lb))
      var p = 0
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
