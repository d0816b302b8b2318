package graft

import org.apache.spark.sql.SparkSession

/** spark-submit smoke entry (VERDICT r6 item 8) — the route a real
  * cluster uses: the packaged graft jar on the submit classpath, the
  * session configured ONLY through --conf flags (master, shuffle
  * partitions, `spark.sql.extensions=graft.functions.GraftExtensions`),
  * no sbt anywhere. Runs a 5-query smoke set spanning the engine's
  * surfaces — codegen custom expressions, the banded-levenshtein
  * optimizer rule, the TopKPerKey planner strategy, an LSH dedup, and a
  * multi-stage pipeline — and exits non-zero unless every query returns
  * rows. Driven by scripts/spark_submit_smoke.sh; documented in
  * docs/DEPLOY.md. */
object SubmitSmoke {
  private val smokeSet = Seq(
    "agg_avg_stddev",        // core agg over the fact table
    "func_trigram_match",    // custom codegen expression + trigram rule
    "join_fuzzy_levenshtein",// LevenshteinBoundRule on the join path
    "window_topk_per_group", // TopKPerKey custom operator route
    "dedup_minhash_lsh")     // LSH banding + persist point

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // No master/.config here: everything arrives via spark-submit flags —
    // that IS the deployment property under test.
    val spark = SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(
      spark.conf.get("spark.sql.extensions", "")
        .contains("graft.functions.GraftExtensions"),
      "smoke must run with --conf spark.sql.extensions=graft.functions.GraftExtensions")
    var failed = 0
    smokeSet.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[submit-smoke] $name%-24s rows=$n%-6d $secs%.2f s")
        if (n <= 0) { failed += 1; System.err.println(s"[submit-smoke] $name EMPTY") }
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[submit-smoke] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
    println(s"""{"submit_smoke":"ok","queries":${smokeSet.size},"sf":"$sfDir"}""")
  }
}
