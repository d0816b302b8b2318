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
