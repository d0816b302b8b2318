package graft

import org.apache.spark.sql.SparkSession

/** Scale-evidence main for the Z-order read-side payoff (r10 verdict
  * item 3): `runMain graft.ZorderSkipProbe <sfDir> [files]` writes the
  * two 64-file layouts, measures footer-stats file pruning and executed
  * scan rows for the centered box read, and prints ONE JSON line.
  * docs/SCALE.md records the ×10 run; ZorderSkipSpec asserts the same
  * inequalities at sf0.001.
  */
object ZorderSkipProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val files = if (args.length > 1) args(1).toInt else 64
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
    val scratch = graft.sources.Sources.scratchDir(sfDir, "zorder_skip")
    val r = graft.core.ZorderSkip.run(spark, sfDir, scratch, files)
    println(s"""{"sf":"$sfDir",${r.json.tail}""")
    spark.stop()
  }
}
