package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming forms of the reference's incremental-batch
  * patterns (SURVEY.md §2.9).
  *
  * The reference has no true streaming — "hourly" is a cron re-run
  * (src/_fill_db.py:48-54) with a high-watermark predicate
  * (src/absa/post_words.py:106-115). `Trigger.AvailableNow` is the exact
  * Spark-native equivalent: process everything new since the last
  * checkpoint, then stop — same cadence semantics, but exactly-once and
  * restartable from state instead of re-deriving a watermark per run.
  */
object Incremental {

  /** File-stream source over a parquet table directory with an enforced
    * schema (the streaming analog of graft.core.Tables.load). */
  def readStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling-window rollup — the streaming form of the daily
    * entries rollup (A8, reference predict.py:75-84): per-window sums that
    * tolerate `late` out-of-order data before finalizing. */
  def windowedRollup(events: DataFrame, window_ : String, late: String): DataFrame =
    events
      .withWatermark("ts", late)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(sum("value").as("total_value"), count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("total_value"), col("n_events"))

  /** Gap-based sessionization (W2, reference keyword_intervals.py:117-141)
    * via the native session_window — state-backed in streaming, plain
    * aggregation in batch. */
  def sessionized(events: DataFrame, gap: String, late: String): DataFrame =
    events
      .withWatermark("ts", late)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup — the ingestion-side twin of the batch
    * `dedup_exact` operator (LLM-pipeline family): keep the first arrival
    * per fingerprint, with `dropDuplicatesWithinWatermark` so the
    * dedup state is BOUNDED by the watermark horizon instead of growing
    * with the full corpus (plain dropDuplicates state never expires — a
    * non-starter for a continuous 100 TB ingest). */
  def dedupStream(docs: DataFrame, fingerprintCol: String, tsCol: String,
      late: String): DataFrame =
    docs
      .withWatermark(tsCol, late)
      .dropDuplicatesWithinWatermark(fingerprintCol)

  /** Streaming heavy hitters — the continuous-ingest twin of the batch
    * `agg_heavy_hitters` query: per watermarked tumbling window, a
    * Misra–Gries summary ([[graft.functions.MisraGriesAgg]]) of the
    * item stream. The state-store row per (window, group) is the O(k)
    * serialized counter map — NOT the item set — so state stays
    * fixed-size at any stream cardinality; window expiry via the
    * watermark bounds the number of live rows. The MG merge is
    * arbitrary-merge-tree-safe, which is exactly what micro-batch
    * partial aggregation needs. */
  def heavyHitters(items: DataFrame, window_ : String, late: String,
      k: Int): DataFrame = {
    items.sparkSession match { case s => graft.functions.GraftFunctions.register(s) }
    items
      .withWatermark("ts", late)
      .groupBy(window(col("ts"), window_), col("grp"))
      .agg(expr(s"misra_gries(w, $k)").as("sketch"),
        count(lit(1)).as("n_items"))
      .select(col("window.start").as("window_start"), col("grp"),
        col("sketch"), col("n_items"))
  }

  /** Streaming curation intake — the ingest-time quality gate + sequence
    * chunking of the LLM-pipeline family, running the SAME transform as
    * the batch `pipe_corpus_intake` query
    * ([[graft.queries.CurationQueries.curateChunks]]). Every step is a
    * stateless row-level expression (codegen bigram_stats kernel,
    * explode, slice), so it needs no watermark or state store and keeps
    * exactly the batch plan's map parallelism under continuous ingest.
    */
  def curationIntake(docs: DataFrame): DataFrame =
    graft.queries.CurationQueries.curateChunks(docs)

  /** Stream-stream interval join — attribution: each purchase joins the
    * same user's clicks from the preceding hour (`c_ts ∈ [p_ts - 1h,
    * p_ts)`). Both sides are watermarked and the join condition carries
    * an explicit event-time range, so Spark derives state-expiry bounds
    * for BOTH join buffers: a click older than `p_ts_max - 1h - late` or
    * a purchase older than the click watermark can never match again and
    * is evicted. Without the time bound the buffers grow with the full
    * history — the classic unbounded-state trap; with it, state is
    * O(rate × (horizon + lateness)) at any stream length. Inner join ⇒
    * append-mode rows emit as soon as both sides arrive. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
      late: String): DataFrame =
    purchases.withWatermark("p_ts", late)
      .join(clicks.withWatermark("c_ts", late),
        expr("p_user = c_user AND " +
          "c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts < p_ts"))

  /** Run a streaming transform over everything currently unprocessed, then
    * stop (the FillDbHourly cadence). Restart with the same checkpoint to
    * pick up only new files. */
  def runAvailableNow(out: DataFrame, checkpoint: String, outPath: String): StreamingQuery =
    out.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .format("parquet")
      .start(outPath)

  /** The complete FillDbHourly analog (reference _fill_db.py:48-54 →
    * database.py:140-174): process everything unprocessed, then MERGE
    * each micro-batch into the live table by primary key — the K1 upsert
    * as a streaming sink via foreachBatch. Restart-safe: the checkpoint
    * tracks consumed input and the merge is idempotent (re-upserting a
    * replayed batch rewrites the same rows to the same values), which is
    * exactly the property the reference gets from `ON CONFLICT DO
    * UPDATE`. For non-aggregated transforms (append-mode lineage). */
  def runAvailableNowUpsert(out: DataFrame, checkpoint: String,
      tablePath: String, pk: Seq[String]): StreamingQuery =
    out.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.core.Upsert.upsertWrite(batch.sparkSession, tablePath,
          batch, pk)
      }
      .start()
}
