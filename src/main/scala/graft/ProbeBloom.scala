package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary diagnostic (not part of the catalog): split join_bloom_prune
  * into its two jobs — the driver-side Bloom build and the pruned join —
  * to attribute the r6 warm regression. */
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label%-24s ${(System.nanoTime()-t0)/1e9}%.3f s")
      r
    }
    for (i <- 1 to 4) {
      System.err.println(s"-- iteration $i")
      val dim = t("dim-construct") {
        graft.core.Tables.load(spark, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey", "c_nationkey")
      }
      val bloom = t("bloom-build-job") { dim.stat.bloomFilter("c_custkey", 4096, 0.01) }
      val bits = graft.functions.BloomOps.toBytes(bloom)
      val fact = graft.core.Tables.load(spark, dir, "orders")
        .filter(call_function("bloom_contains", col("o_custkey"), lit(bits)))
      val q = fact.join(dim, fact("o_custkey") === dim("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
      t("main-query-exec") { q.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
