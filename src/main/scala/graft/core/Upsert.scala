package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's two sink semantics (SURVEY.md §2.2), Spark-native.
  *
  * K1 upsert (reference src/_utils/database.py:140-174: COPY to temp +
  * `INSERT ... ON CONFLICT ON CONSTRAINT pk DO UPDATE`): expressed as a
  * PK-anti-join of existing against incoming followed by a union — the
  * incoming row wins every PK conflict, exactly the ON CONFLICT UPDATE
  * outcome. The anti-join shuffles both sides once on the PK (or
  * broadcasts incoming when it is small — left to AQE), which is the
  * MERGE plan every lakehouse engine runs; no row-at-a-time conflict
  * checks.
  *
  * K2 replace-content (database.py:96-99,158-170: upsert + DELETE of rows
  * absent from the batch): a plain snapshot overwrite.
  *
  * Durability: `upsertWrite` stages the merged result into a sibling
  * directory and swaps it in via rename, so readers never observe a
  * half-written table (the moral equivalent of the reference's
  * single-transaction COPY+merge).
  */
object Upsert {

  /** K1 merge: rows of `existing` whose PK collides with `incoming` are
    * replaced by the incoming row; everything else is kept. */
  def merge(existing: DataFrame, incoming: DataFrame, pk: Seq[String]): DataFrame =
    existing.join(incoming.select(pk.head, pk.tail: _*), pk, "left_anti")
      .unionByName(incoming)

  /** K1 against a parquet table path, with staged atomic swap. */
  def upsertWrite(spark: SparkSession, tablePath: String, incoming: DataFrame,
      pk: Seq[String]): Unit = {
    val path = new Path(tablePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(path)) merge(spark.read.parquet(tablePath), incoming, pk)
      else incoming
    val staged = new Path(tablePath + ".staged-" + java.util.UUID.randomUUID())
    merged.write.mode("overwrite").parquet(staged.toString)
    if (fs.exists(path)) fs.delete(path, true)
    if (!fs.rename(staged, path))
      throw new java.io.IOException(s"atomic swap failed: $staged -> $path")
  }

  /** K2 replace-content: full-snapshot overwrite of the table. */
  def replaceWrite(spark: SparkSession, tablePath: String, snapshot: DataFrame): Unit =
    upsertOverwrite(spark, tablePath, snapshot)

  private def upsertOverwrite(spark: SparkSession, tablePath: String,
      df: DataFrame): Unit = {
    val path = new Path(tablePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new Path(tablePath + ".staged-" + java.util.UUID.randomUUID())
    df.write.mode("overwrite").parquet(staged.toString)
    if (fs.exists(path)) fs.delete(path, true)
    if (!fs.rename(staged, path))
      throw new java.io.IOException(s"atomic swap failed: $staged -> $path")
  }
}
