package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Runtime Bloom-filter join pruning: `bloom_contains(key, bitsLiteral)`.
  *
  * The 100 TB join pattern this enables: build a Bloom filter over the
  * (filtered) dimension side's join keys — a fixed-size, mergeable
  * summary aggregated distributively, only the ~KB filter reaches the
  * driver — then push `bloom_contains(fact_key)` down to the FACT scan,
  * so non-matching fact rows are dropped at the parquet reader, BEFORE
  * the shuffle that feeds the join. The join that follows repairs the
  * filter's false positives, so results are exact while the shuffle
  * carries only ~selectivity + fpp of the fact table. (This is the
  * manual, engine-level form of Spark's own runtime row-level filtering;
  * doing it explicitly lets the engine prune through sinks, multi-step
  * lineages, and sessions where the optimizer rule would not fire.)
  *
  * Implemented as a native Catalyst expression with `doGenCode`, so the
  * probe stays inside whole-stage codegen (no UDF boxing). The filter is
  * carried as its serialized bytes (a plain `Array[Byte]` constructor
  * argument — serializable, shipped with the plan) and deserialized once
  * per JVM via a transient lazy val.
  *
  * Reference anchor: the reference joins fact extracts against small
  * filtered dims row-at-a-time (e.g. src/gomus/orders.py:89-101); at
  * cluster scale the equivalent equi-join wants its shuffle input pruned
  * ahead of time, which is this expression's job.
  */
case class BloomContainsLong(child: Expression, bits: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bits))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsLong =
    copy(child = newChild)
}

object BloomOps {
  /** Serialize a BloomFilter to the byte form `bloom_contains` carries. */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
