package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a mergeable Catalyst aggregate:
  * `misra_gries(item, k)` → `array<struct<item: string, est: bigint>>`.
  *
  * The 100 TB frequent-items path: exact top-N (`agg_topn_terms`) shuffles
  * every distinct item; this aggregate keeps AT MOST `k` counters per
  * group — fixed-size state, map-side partials, merge is
  * counter-addition + one trim — so the shuffle carries O(k) per group
  * regardless of item cardinality, the same state contract as HLL++ /
  * GK in `agg_sketch_contract`.
  *
  * Deterministic guarantees (data- and merge-order-independent), which
  * `agg_heavy_hitters` value-gates through the oracle:
  *  - UNDERESTIMATE: `0 <= exact(i) - est(i) <= N/(k+1)` for every item
  *    in the summary (N = group row count);
  *  - COVERAGE: every item with `exact(i) > N/(k+1)` is in the summary.
  * Both survive arbitrary merge trees (Agarwal et al., "Mergeable
  * Summaries", PODS 2012: MG summaries merge by pointwise count addition
  * followed by subtracting the (k+1)-th largest count).
  *
  * The summary CONTENT beyond those guarantees (which borderline items
  * survive, their exact est values) is partition-layout-dependent, so
  * queries must gate on the theorems, not on raw sketch rows.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item, got ${child.dataType}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty[UTF8String, Long]

  // Buffer keys are UTF8String (cloned on first insert — `child.eval` may
  // reuse its backing bytes), not decoded java Strings: the update path
  // runs once per input row, and a per-row String decode plus the
  // decrement-step ArrayBuffer were measurable GC pressure at sf0.1
  // (3x run-to-run bench variance). All trims are now in-place and
  // allocation-free.
  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item.clone(), 1L)
        case None =>
          // decrement-all step; drop zeroed counters
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (it, c) => buf.update(it, buf.getOrElse(it, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from all, drop <= 0
      val m = buf.values.toArray.sortBy(-_).apply(k)
      buf.mapValuesInPlace((_, c) => c - m)
      buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // Once per GROUP over at most k entries — the String decode for the
    // deterministic (count desc, item asc) tie-break is fine here.
    val rows = buf.toArray.sortBy { case (it, c) => (-c, it.toString) }.map {
      case (it, c) => InternalRow(it, c): Any
    }
    new GenericArrayData(rows): ArrayData
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (it, c) =>
      val b = it.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
