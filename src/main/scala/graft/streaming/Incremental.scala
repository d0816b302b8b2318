package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
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

  /** Streaming multimodal near-dup gate — the ingest-time twin of the
    * batch `dedup_image_phash` operator: arriving image payloads decode
    * (REAL ImageIO, stateless mapPartitions) to the packed 64-bit dHash,
    * and an arrival whose EXACT perceptual hash was already admitted
    * inside the watermark horizon is dropped —
    * `dropDuplicatesWithinWatermark` keys its bounded state on the hash,
    * so state is O(distinct hashes per horizon), not O(stream). The
    * Hamming-BALL pair search (near-but-not-identical) stays a
    * batch/periodic job over the admitted set; the streaming gate
    * removes the exact re-uploads that dominate real media ingest. */
  def imagePhashDedupStream(media: DataFrame, late: String): DataFrame =
    graft.multimodal.Multimodal.imageDHashStamped(media)
      .withWatermark("arrival", late)
      .dropDuplicatesWithinWatermark("h")

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

  /** Stream-static enrichment join — the remaining cell of the streaming
    * join matrix (stream-stream: [[attributionJoin]]): each micro-batch
    * joins the arriving facts against a STATIC dimension snapshot.
    * Stateless — no watermark, no state store; the dim is re-resolved
    * per micro-batch (so a replace-content refresh of the dim parquet is
    * picked up by the next batch) and small dims broadcast exactly as in
    * batch plans. Inner join keeps the stream append-only. */
  def enrichStream(facts: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String): DataFrame =
    // Dataframe-qualified keys: bare col() is ambiguous when the fact
    // and dim key columns share a name (the common enrichment case).
    facts.join(dim, facts(factKey) === dim(dimKey))

  /** Streaming ordered-event funnel — the continuous twin of the batch
    * `window_funnel` query, as keyed custom state: per user the state is
    * EXACTLY three epoch-micro longs (first view, first click strictly
    * after it, first purchase strictly after that; -1 = stage not
    * reached) — the same O(1)-per-user bound the batch window argument
    * makes, held in the state store instead of a shuffle partition.
    *
    * Each micro-batch's events for a user are folded in (event-time,
    * type) order, so results equal the batch query whenever a user's
    * events arrive in event-time order ACROSS batches (within a batch,
    * order never matters — we sort). That's the standard streaming-
    * funnel contract: out-of-order arrival is tolerated up to the
    * micro-batch boundary; an earlier-stage event that arrives in a
    * LATER batch than its dependents cannot retroactively validate them
    * (the alternative — buffering every candidate event per user — has
    * unbounded state). Append output with NoTimeout: each batch emits
    * the user's current reach; readers keep the last row per user. */
  def funnelStages(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val typed = events.select(col("user_id").cast("long").as("user_id"),
      col("ts").cast("timestamp").as("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, String)],
            state: GroupState[(Long, Long, Long)]) =>
          var (t1, t2, t3) = state.getOption.getOrElse((-1L, -1L, -1L))
          it.toSeq
            .map { case (_, ts, tpe) =>
              val inst = ts.toInstant
              (inst.getEpochSecond * 1000000L + inst.getNano / 1000L, tpe)
            }
            .sortBy(identity)
            .foreach { case (t, tpe) =>
              tpe match {
                case "view" if t1 < 0 => t1 = t
                case "click" if t2 < 0 && t1 >= 0 && t > t1 => t2 = t
                case "purchase" if t3 < 0 && t2 >= 0 && t > t2 => t3 = t
                case _ => ()
              }
            }
          state.update((t1, t2, t3))
          Iterator.single((user, t1, t2, t3))
      }
      .toDF("user_id", "t1", "t2", "t3")
  }

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
