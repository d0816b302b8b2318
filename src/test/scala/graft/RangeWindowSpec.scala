package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.RangeWindow

/** RangeWindow must equal Spark's own global-window results exactly —
  * the whole point is swapping the SinglePartition plan for a partitioned
  * one WITHOUT changing a single output value. Reference results here use
  * `Window.orderBy` (fine on test-sized frames); equivalence is checked
  * on tie-heavy keys, negative keys, and frames smaller than the bucket
  * count.
  */
class RangeWindowSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def frame(n: Int) = {
    // deterministic tie-heavy data: key collides every 7 rows, values
    // mix signs; id is the unique tiebreak
    val rows = (1 to n).map { i =>
      org.apache.spark.sql.Row(i.toLong, ((i * 31) % 7).toLong - 3,
        ((i * 17) % 11).toLong)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(rows.asJava, schema).repartition(4)
  }

  test("withRank equals global row_number on a tie-heavy frame") {
    val df = frame(500)
    val (got, n) = RangeWindow.withRank(
      df, col("key"), Seq(col("id")), 8, "rk")
    assert(n == 500)
    val want = df.withColumn("rk",
      row_number().over(Window.orderBy(col("key").asc, col("id").asc))
        .cast("long"))
    assert(got.select("id", "key", "v", "rk").orderBy("id").collect().toSeq ==
      want.select("id", "key", "v", "rk").orderBy("id").collect().toSeq)
  }

  test("ntileFromRank equals ntile across bucket counts and remainders") {
    val df = frame(101) // 101 % k != 0 for every k tested
    for (k <- Seq(2, 5, 20, 64, 101, 150)) {
      val (ranked, n) = RangeWindow.withRank(
        df, col("key"), Seq(col("id")), 8, "rk")
      val got = ranked
        .withColumn("b", RangeWindow.ntileFromRank(col("rk"), n, k))
        .select("id", "b").orderBy("id").collect().toSeq
      val want = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("key").asc, col("id").asc)))
        .select("id", "b").orderBy("id").collect().toSeq
      assert(got == want, s"ntile($k) mismatch")
    }
  }

  test("withRanks: several independent orderings equal their global windows") {
    val df = frame(300).persist()
    val (got, n) = RangeWindow.withRanks(df, Seq(
      RangeWindow.Spec(col("key"), Seq(col("id")), "rk1"),
      RangeWindow.Spec(-col("v"), Seq(col("id")), "rk2"),
      RangeWindow.Spec(col("id"), Nil, "rk3")), 8)
    assert(n == 300)
    val want = df
      .withColumn("rk1", row_number().over(
        Window.orderBy(col("key").asc, col("id").asc)).cast("long"))
      .withColumn("rk2", row_number().over(
        Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
      .withColumn("rk3", row_number().over(
        Window.orderBy(col("id").asc)).cast("long"))
    assert(got.select("id", "rk1", "rk2", "rk3").orderBy("id")
      .collect().toSeq ==
      want.select("id", "rk1", "rk2", "rk3").orderBy("id")
        .collect().toSeq)
    df.unpersist()
  }

  test("withRunningSum equals global ROWS-frame cumulative sum") {
    val df = frame(500)
    val (got, n, tot) = RangeWindow.withRunningSum(
      df, -col("key"), Seq(col("id")), 8, col("v"), "cum")
    assert(n == 500)
    val w = Window.orderBy(col("key").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
    assert(got.select("id", "cum").orderBy("id").collect().toSeq ==
      want.select("id", "cum").orderBy("id").collect().toSeq)
    assert(tot == df.agg(sum("v")).collect()(0).getLong(0))
  }

  test("degenerate shapes: parts=1, frame smaller than parts, one row") {
    val df = frame(3)
    for (parts <- Seq(1, 8)) {
      val (got, n) = RangeWindow.withRank(
        df, col("key"), Seq(col("id")), parts, "rk")
      assert(n == 3)
      val want = df.withColumn("rk",
        row_number().over(Window.orderBy(col("key").asc, col("id").asc))
          .cast("long"))
      assert(got.select("id", "rk").orderBy("id").collect().toSeq ==
        want.select("id", "rk").orderBy("id").collect().toSeq)
    }
    val one = frame(1)
    val (g1, n1) = RangeWindow.withRank(one, col("key"), Seq(col("id")), 4, "rk")
    assert(n1 == 1 && g1.select("rk").collect()(0).getLong(0) == 1L)
  }

  test("the plan is partitioned: no empty-partitionSpec Window node") {
    val df = frame(500)
    val (got, _) = RangeWindow.withRank(df, col("key"), Seq(col("id")), 8, "rk")
    val bad = got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "RangeWindow produced a SinglePartition window")
    // and the offsets ship as a literal map — the helper adds no join
    val joins = got.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, "RangeWindow should be join-free")
  }
}
