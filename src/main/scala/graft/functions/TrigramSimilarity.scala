package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pg_trgm-semantics trigram similarity as a native Catalyst expression
  * (SURVEY.md §4 custom-work item 1; reference uses PostgreSQL
  * `similarity()` in src/absa/post_aspects.py:40-199 at threshold 0.65,
  * extension enabled in migration_027.sql:6-7).
  *
  * Semantics (pg_trgm): lowercase, split into alphanumeric words, pad each
  * word with two leading and one trailing space, collect the distinct
  * 3-grams of every padded word, then set-Jaccard the two trigram sets.
  * ASCII alnum word boundaries (the reference corpus is matched after
  * lowercasing; locale-dependent pg behavior on non-ASCII is out of scope
  * and documented here as a divergence).
  *
  * Implements `doGenCode` via a static call so the expression stays inside
  * whole-stage codegen (no UDF boxing, no Row round-trip).
  */
case class TrigramSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "trigram_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TrigramOps.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TrigramOps.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrigramSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Guarded trigram-threshold comparison — the rewrite target of
  * [[graft.plans.TrigramBoundRule]] (the pg_trgm-index analog of
  * [[graft.plans.LevenshteinBoundRule]]).
  *
  * `trigram_sim(a, b) >= t` (t > 0 literal) builds two trigram hash-sets
  * and intersects them for EVERY pair, even pairs whose lengths already
  * make the threshold unreachable. pg_trgm never pays that: its GIN
  * index prunes candidates before `similarity()` runs (the reference
  * relies on exactly that via postgres `similarity() >= 0.65`,
  * src/absa/post_aspects.py:120-199, pg_trgm enabled in
  * migration_027.sql). This expression is the planner-level equivalent:
  * an allocation-free O(len) length/char-diversity bound runs first and
  * the full kernel only on survivors.
  *
  * Soundness (bound is NECESSARY for sim >= t > 0): Jaccard >= t implies
  * |A| >= t·|B| and |B| >= t·|A| and both sets nonempty; the guard
  * relaxes those with a per-side upper bound U (total padded trigram
  * positions; chars >= U+0080 count 2 since some lowercase INTO ascii,
  * e.g. U+212A KELVIN SIGN → 'k') and lower bound L (distinct definite
  * ascii-alnum chars + 1: every word char is the middle of a distinct
  * trigram, plus the double-space lead gram). Null semantics match the
  * unguarded comparison exactly (null iff an input is null). Fused as
  * one expression — no bare `trigram_sim >= lit` survives the rewrite,
  * so the optimizer's fixpoint cannot re-match it. */
case class TrigramGuardedCmp(left: Expression, right: Expression,
    threshold: Double, strict: Boolean) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String =
    if (strict) "trigram_sim_gt_bounded" else "trigram_sim_ge_bounded"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TrigramOps.boundedCmp(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], threshold, strict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TrigramOps.boundedCmp($a, $b, ${threshold}D, $strict)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrigramGuardedCmp =
    copy(left = newLeft, right = newRight)
}

object TrigramOps {
  /** Distinct padded trigrams of `s`, pg_trgm style. */
  def trigrams(s: String): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    val n = lower.length
    val sb = new java.lang.StringBuilder()
    while (i <= n) {
      val c = if (i < n) lower.charAt(i) else ' '
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) sb.append(c)
      else if (sb.length > 0) {
        val padded = "  " + sb + " "
        var j = 0
        while (j + 3 <= padded.length) { out.add(padded.substring(j, j + 3)); j += 1 }
        sb.setLength(0)
      }
      i += 1
    }
    out
  }

  /** Packed (U << 32) | L pre-filter stats in ONE allocation-free scan
    * DIRECTLY over the UTF8String's bytes (a String-decoding form cost a
    * measurable ~10% per pair on non-pruning workloads).
    * U = upper bound on |trigram set| = Σ over definite words (len + 1).
    * L = lower bound = popcount(distinct definite ascii-alnum chars) + 1
    * when any definite word exists (each distinct word char is the
    * middle of a distinct trigram; the "  c" lead gram of the first word
    * has a space middle, so it is distinct from all of those).
    * ASCII bytes carry the exact char logic; every byte >= 0x80 (which includes UTF-8
    * continuation bytes, so a multi-byte char counts once per byte) goes
    * down the may-be-anything branch: +2 to U (over-count, sound for an
    * upper bound), nothing to L (under-count, sound for a lower bound). */
  def statsBytes(s: UTF8String): Long = {
    // Long accumulators: a multi-GB multi-byte string would overflow Int
    // counters (+2 per byte >= 0x80), turning U negative and silently
    // pruning a pair the unguarded kernel would keep. Long keeps the
    // upper bound sound; the packed U is clamped to Int.MaxValue below.
    var total = 0L
    var words = 0L
    var extra = 0L
    var inWord = false
    var bits = 0L
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      var c = s.getByte(i).toInt & 0xff
      if (c >= 'A' && c <= 'Z') c += 32
      if (c >= 'a' && c <= 'z') {
        total += 1; bits |= 1L << (c - 'a')
        if (!inWord) { words += 1; inWord = true }
      } else if (c >= '0' && c <= '9') {
        total += 1; bits |= 1L << (26 + (c - '0'))
        if (!inWord) { words += 1; inWord = true }
      } else if (c >= 0x80) {
        extra += 2; inWord = false
      } else inWord = false
      i += 1
    }
    val u = math.min(total + words + extra, Int.MaxValue.toLong)
    val l = if (words > 0) java.lang.Long.bitCount(bits) + 1 else 0
    (u << 32) | l.toLong
  }

  /** Cheap necessary condition for sim(a, b) >= t (t > 0): both trigram
    * sets nonempty (U > 0) and the cross size bounds U_x >= t · L_y
    * (relaxations of |A| >= t·|B| / |B| >= t·|A|). */
  def bound(a: UTF8String, b: UTF8String, t: Double): Boolean = {
    val sa = statsBytes(a)
    val sb = statsBytes(b)
    val ua = (sa >>> 32).toInt
    val la = sa.toInt
    val ub = (sb >>> 32).toInt
    val lb = sb.toInt
    ua > 0 && ub > 0 && ua.toDouble >= t * lb && ub.toDouble >= t * la
  }

  /** Guarded comparison: bound first, full kernel only on survivors. */
  def boundedCmp(a: UTF8String, b: UTF8String, t: Double,
      strict: Boolean): Boolean =
    bound(a, b, t) && {
      val s = sim(a, b)
      if (strict) s > t else s >= t
    }

  def sim(a: UTF8String, b: UTF8String): Double = {
    val ta = trigrams(a.toString)
    val tb = trigrams(b.toString)
    if (ta.isEmpty && tb.isEmpty) return 0.0
    var inter = 0
    val it = ta.iterator()
    while (it.hasNext) if (tb.contains(it.next())) inter += 1
    val union = ta.size + tb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
