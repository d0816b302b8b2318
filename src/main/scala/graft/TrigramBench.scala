package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Prune-effectiveness evidence for TrigramBoundRule: a lexicon theta
  * join (distinct part names × generated probes, threshold 0.35) timed
  * with the rule ON vs OFF, plus the measured prune rate of the cheap
  * bound across the joined pair population. Usage:
  * `scripts/run_main.sh graft.TrigramBench [sfDir]`. */
object TrigramBench {
  def main(args: Array[String]): Unit = {
    val _ = args // workload is synthetic; no fixture needed
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    // Two workloads: HOMOGENEOUS (mid-length probes, like-for-like word
    // matching — the bound rarely fires; measures pure guard overhead)
    // and SKEWED (short tokens vs long multi-word names at the
    // reference's 0.65 threshold — the dedup-corpus shape the bound is
    // for). doc-side = distinct p_name (long, multi-word).
    // 2000 × 2000 = 4M pairs so per-pair kernel cost dominates the join
    // machinery (the 64-name fixture gave pure-overhead numbers).
    val names = spark.range(0, 2000)
      .select(concat(lit("alpha beta "), col("id"),
        expr("repeat(concat(' gamma', CAST(id % 17 AS STRING)), 3)")).as("p_name"))
    val homogeneous = spark.range(0, 2000)
      .select(concat(lit("alpha delta "), col("id"),
        expr("repeat(concat(' gamma', CAST(id % 13 AS STRING)), 3)")).as("probe"))
    val skewed = spark.range(0, 2000)
      .select(concat(lit("t"), expr("CAST(id % 97 AS STRING)")).as("probe"))

    def joined(probes: org.apache.spark.sql.DataFrame, t: Double) =
      names.join(broadcast(probes), expr(s"trigram_sim(p_name, probe) >= $t"))

    def time(f: => Long): (Double, Long) = {
      f // warm
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); rows = f; (System.nanoTime() - t0) / 1e9
      }
      (ts.min, rows)
    }

    def measure(label: String, probes: org.apache.spark.sql.DataFrame,
        t: Double): String = {
      val (tOn, rowsOn) = time(joined(probes, t).count())
      val saved = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations =
        saved.filterNot(_ eq graft.plans.TrigramBoundRule)
      val (tOff, rowsOff) = time(joined(probes, t).count())
      spark.experimental.extraOptimizations = saved
      require(rowsOn == rowsOff, s"rule changed results: $rowsOn vs $rowsOff")
      val ns = names.collect().map(_.getString(0))
      val ps = probes.collect().map(_.getString(0))
      var pruned = 0L
      var total = 0L
      for (n <- ns; p <- ps) {
        total += 1
        if (!graft.functions.TrigramOps.bound(
          UTF8String.fromString(n), UTF8String.fromString(p), t)) pruned += 1
      }
      f""""$label":{"t":$t,"pairs":$total,"match_rows":$rowsOn,"prune_rate":${pruned.toDouble / total}%.4f,"rule_on_sec":$tOn%.3f,"rule_off_sec":$tOff%.3f}"""
    }

    val a = measure("homogeneous", homogeneous, 0.35)
    val b = measure("skewed", skewed, 0.65)
    println(s"{$a,$b}")
    spark.stop()
  }
}
