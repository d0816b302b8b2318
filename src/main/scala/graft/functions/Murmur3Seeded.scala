package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Standard Murmur3_x86_32 of a string's UTF-8 bytes with a caller-chosen
  * seed — signed-int parity with the reference's `mmh3.hash(email, seed=666)`
  * privacy hash (SURVEY.md P4; reference
  * src/gomus/_utils/extract_customers.py:135-140, seed constant
  * src/_utils/database.py:59).
  *
  * Spark's built-in `hash()` is Murmur3 but pins seed=42 and uses Spark's
  * lenient tail handling, so it cannot reproduce the reference ids; this
  * expression implements the canonical algorithm (block + tail + fmix)
  * which matches mmh3's default signed output.
  */
case class Murmur3Seeded(child: Expression, seed: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "murmur3_seeded"

  override protected def nullSafeEval(input: Any): Any =
    Murmur3Ops.hashString(input.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Murmur3Ops.hashString($c, $seed)")

  override protected def withNewChildInternal(newChild: Expression): Murmur3Seeded =
    copy(child = newChild)
}

object Murmur3Ops {
  def hashString(s: UTF8String, seed: Int): Int = hashBytes(s.getBytes, seed)

  /** Canonical Murmur3_x86_32 (little-endian blocks, standard tail). */
  def hashBytes(bytes: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = bytes.length
    var h1 = seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val b = 4 * i
      var k1 = (bytes(b) & 0xff) | ((bytes(b + 1) & 0xff) << 8) |
        ((bytes(b + 2) & 0xff) << 16) | ((bytes(b + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks * 4
    var k1 = 0
    if ((len & 3) >= 3) k1 ^= (bytes(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (bytes(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= bytes(tail) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }
}
