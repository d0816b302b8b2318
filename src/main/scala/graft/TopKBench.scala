package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Head-to-head evidence for the TopKPerKey physical operator at its WIN
  * shape — keys ≪ rows (VERDICT r5 item 5; reference shape: latest-2
  * reservations per category, src/gomus/events.py:125-129).
  *
  * Runs top-3 per `o_orderpriority` (5 keys) over the FULL orders fact
  * twice — once through the custom heap operator, once through the
  * declarative `row_number() OVER (...)` Window — and reports, per
  * variant: warm seconds (min of 3) and the number of records the
  * key-hash exchange actually moved (the `shuffle records written`
  * metric read off the executed plan). The operator's partial stage caps
  * every (partition, key) at k BEFORE the exchange, so its shuffle moves
  * ≤ partitions × keys × k rows; Window must move the entire fact.
  *
  * Usage: runMain graft.TopKBench [sfDir]   (default /root/testdata/sf0.1)
  */
object TopKBench {

  private def deepCollect[T](p: SparkPlan)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val kids = p match {
      case q: QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => p.children
    }
    pf.lift(p).toSeq ++ kids.flatMap(deepCollect(_)(pf))
  }

  /** Records written by every shuffle exchange in the executed plan. */
  private def shuffleRecords(df: DataFrame): Long = {
    deepCollect(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec =>
        e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
    }.sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val orders = graft.core.Tables.load(spark, sfDir, "orders")
      .select("o_orderpriority", "o_totalprice", "o_orderkey")

    def operator(): DataFrame = graft.plans.TopK.perKey(orders,
      Seq("o_orderpriority"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)

    def window(): DataFrame = {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
    }

    def run(mk: () => DataFrame): (Double, Long, Long) = {
      var rows = 0L
      var recs = 0L
      val times = (1 to 3).map { _ =>
        val df = mk()
        val t0 = System.nanoTime()
        // collect() executes df's OWN QueryExecution (count() would spin
        // up a separate one and leave these metrics untouched); the
        // result is k × keys rows, so the driver fetch is negligible.
        rows = df.collect().length.toLong
        val t = (System.nanoTime() - t0) / 1e9
        recs = shuffleRecords(df)
        t
      }
      (times.min, recs, rows)
    }

    // Warm-up both plans (codegen, parquet footers) before timing.
    run(operator); run(window)
    val (tOp, recOp, rowsOp) = run(operator)
    val (tWin, recWin, rowsWin) = run(window)
    require(rowsOp == rowsWin, s"row mismatch: $rowsOp vs $rowsWin")
    val inputRows = orders.count()
    println(f"""{"sf":"$sfDir","input_rows":$inputRows,"result_rows":$rowsOp,"operator":{"warm_sec":$tOp%.3f,"shuffle_records":$recOp},"window":{"warm_sec":$tWin%.3f,"shuffle_records":$recWin}}""")
    spark.stop()
  }
}
