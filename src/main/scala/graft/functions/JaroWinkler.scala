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

/** Guarded Jaro–Winkler threshold comparison — the rewrite target of
  * [[graft.plans.JaroWinklerBoundRule]], completing the fuzzy-kernel
  * bound-rule family ([[graft.plans.LevenshteinBoundRule]],
  * [[graft.plans.TrigramBoundRule]]).
  *
  * `jaro_winkler(a, b) >= t` pays the O(|a|·|b|) matching window for
  * EVERY pair. This fused form runs an O(1)-arithmetic length bound
  * first (lengths only — no content scan): from m ≤ min(|a|,|b|) the
  * Jaro score obeys jaro ≤ (2 + min/max)/3, and the Winkler boost
  * obeys jw ≤ 0.6·jaro + 0.4 whenever the boost applies (boost =
  * p·0.1·(1−jaro), p ≤ 4), jw = jaro otherwise. Hence jw ≥ t forces
  * jaro ≥ jmin where jmin = (t − 0.4)/0.6 for t > 0.7 and jmin = t
  * otherwise, which forces min ≥ (3·jmin − 2)·max — pairs failing that
  * cannot reach the threshold. An ε = 1e-9 slack absorbs the float
  * rounding in the bound arithmetic, keeping it strictly NECESSARY;
  * null semantics match the unguarded comparison exactly (null iff an
  * input is null). Fused as one expression, so the optimizer fixpoint
  * cannot re-match its own output. */
case class JaroGuardedCmp(left: Expression, right: Expression,
    threshold: Double, strict: Boolean) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String =
    if (strict) "jaro_winkler_gt_bounded" else "jaro_winkler_ge_bounded"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroOps.cmpBounded(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], threshold, strict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroOps.cmpBounded($a, $b, $threshold, $strict)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroGuardedCmp =
    copy(left = newLeft, right = newRight)
}

object JaroOps {

  /** Bounded threshold compare (see [[JaroGuardedCmp]]). The length
    * bound needs code-point counts: numChars is an allocation-free
    * byte scan, still far below the O(|a|·|b|) matching window. */
  def cmpBounded(a: UTF8String, b: UTF8String, t: Double,
      strict: Boolean): Boolean = {
    val la = a.numChars()
    val lb = b.numChars()
    if (la == 0 || lb == 0) {
      // sim = 0 exactly; compare without the kernel.
      return if (strict) 0.0 > t else 0.0 >= t
    }
    if (!lengthBound(la, lb, t)) return false
    val s = simStr(a.toString, b.toString)
    if (strict) s > t else s >= t
  }

  /** The O(1) necessary length condition for jw ≥ t (t > 0): from
    * m ≤ min, jaro ≤ (2 + min/max)/3 and jw ≤ max(jaro, 0.6·jaro+0.4),
    * so jw ≥ t forces min ≥ (3·jmin − 2)·max with jmin as below; ε
    * slack keeps necessity under float rounding. Exposed for the
    * soundness property test. */
  def lengthBound(la: Int, lb: Int, t: Double): Boolean = {
    val jmin = if (t > 0.7) (t - 0.4) / 0.6 else t
    val lo = math.min(la, lb).toDouble
    val hi = math.max(la, lb).toDouble
    lo >= (3.0 * jmin - 2.0) * hi - 1e-9
  }

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
