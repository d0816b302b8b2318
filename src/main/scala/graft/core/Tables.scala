package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-registry-backed table access (SURVEY.md §1.3).
  *
  * The reference discovers schemas at runtime from
  * information_schema (reference: src/_utils/database.py:101-138); here the
  * registry is static: every table the engine reads is named, and reads are
  * plain parquet scans so Catalyst gets pushdown + pruning for free.
  */
object Tables {
  /** All driver-generated test tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan with column pruning / predicate pushdown left to Catalyst. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan-parallelism guard for compute-heavy consumers (hashing,
    * tokenization, pairwise similarity): a parquet file is splittable only
    * at row-group boundaries, so a file written as ONE row group scans as
    * one task no matter how many cores exist — and every map-side
    * expression downstream runs single-threaded. Production tables at
    * 100 TB have thousands of row groups and never hit this; the
    * benchmark fixtures are single-row-group, so heavy pipelines insert
    * one explicit round-robin repartition (which Catalyst still pushes
    * filters and pruning through). Cheap scans must NOT use this — for a
    * plain aggregation the extra shuffle costs more than the parallelism
    * buys. */
  def parallelize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** `events.ts` is written as parquet TIMESTAMP(NANOS); Spark has no
    * nanosecond timestamp type. If the scan surfaces it as LongType (via
    * `spark.sql.legacy.parquet.nanosAsLong`), truncate to micros — the same
    * thing DuckDB's `epoch_ms`/`date_trunc` comparisons see.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime-settable session conf; without it the scan aborts with
    // PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(floor(col("ts") / 1000L).cast("long")))
      case _ => df
    }
  }

  /** JSONC config scan (SURVEY.md §2.1 S6; reference
    * src/_utils/json_converters.py:25-32 strips comments by hand before
    * json.load): Jackson's comment support makes it a reader option. */
  def readJsonc(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("allowComments", "true")
      .option("multiLine", "true")
      .json(path)

  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
