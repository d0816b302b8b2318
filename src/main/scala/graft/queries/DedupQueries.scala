package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the large-scale training-data pipeline:
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard with
  * length-bucket blocking, and embedding-cosine near-dup via banded
  * random-hyperplane LSH.
  *
  * Scale posture: every variant is blocking-based — candidate pairs only
  * ever form inside a bucket (LSH band, length bucket), so the join is a
  * plain shuffle on the bucket key and the quadratic blow-up is bounded by
  * bucket size; nothing ever compares all pairs globally. Hashes are
  * md5-derived so the DuckDB oracle reproduces them bit-for-bit; a
  * production deployment would swap `h64` to `xxhash64` (one line) for
  * ~10x cheaper hashing with the same plan shape.
  */
object DedupQueries extends QueryBase {

  /** Verified embedding near-dup pairs (banded hyperplane LSH candidates,
    * cosine >= 0.4), shared by `dedup_embedding_cosine` (pair surface) and
    * `dedup_semantic_cluster` (pairs → components → representatives).
    *
    * Embeddings stay raw array<float>: the float→double widening happens
    * inside the compiled kernels (exact), not as an interpreted
    * transform-cast re-evaluated at every use of the column — that cast
    * was the dominant cost of this query. The band keys and verify cosine
    * are native codegen expressions (the interpreted-lambda formulation of
    * the same math was ~50x slower; the UDF form boxed every element on
    * top). Candidates come from bounded per-bucket pair enumeration
    * ([[QueryBase.cappedPairs]], r15 — the earlier self-join needed a
    * buckets persist because it consumed the band-key pipeline twice);
    * per-bucket probe cap 32 bounds the quadratic term at any corpus
    * size.
    *
    * Each call rebuilds the PLAN, but storage is shared: Spark's
    * CacheManager registers cache entries by canonicalized plan, so the
    * identical `persist()` from a second consumer (or a bench repeat)
    * attaches to the existing entry instead of stacking a copy, and its
    * `count()` materialization is served from that cache. No
    * driver-side memo is kept on purpose — a memo map would pin dead
    * sessions and run multi-second Spark jobs inside a map lock; the
    * CacheManager already provides the sharing with neither hazard.
    * (Staleness is the same either way: a cached entry keeps serving the
    * materialized pairs if the dir's parquet is rewritten mid-session —
    * re-mint fixtures into a fresh dir or clearCache() first.)
    * (Cross-query timing consequence: whichever dedup query touches the
    * pair set first pays the build — documented in the verify skill.)
    */
  private def embeddingPairs(s: SparkSession, dir: String): DataFrame = {
    val e = th(s, dir, "embeddings")
    val v = e.select(col("vec_id"), col("embedding").as("vv"))
    graft.functions.GraftFunctions.register(s)
    // Probe cap via the TopKPerKey operator (r6 verdict item 1): the
    // row_number window form sorts every bucket in full; the bounded
    // heap keeps the same k-smallest vec_ids per (bd, bkey) — identical
    // rows because the ordering is total — with a map-side partial cap
    // instead of a per-bucket sort.
    // Fused bucket cap + pair enumeration (r15, see
    // dedup_audio_fingerprint). Retires the buckets persist too: it
    // existed only because the self-join consumed the capped frame
    // twice (re-running band_keys_f per side); the fused operator's
    // ≤32 bucket lists emit their pairs directly — no cache write, no
    // second band-key pass.
    val cand = graft.plans.TopK.pairsPerKey(
        v.select(col("vec_id"),
          posexplode(expr("band_keys_f(vv)")).as(Seq("bd", "bkey"))),
        Seq("bd", "bkey"), Seq(("vec_id", true)), Seq("vec_id"), 32)
      .select(col("x_vec_id").as("left_id"), col("y_vec_id").as("right_id"))
      .distinct()
    val out = cand
      .join(v.select(col("vec_id").as("lid"), col("vv").as("va")), col("left_id") === col("lid"))
      .join(v.select(col("vec_id").as("rid"), col("vv").as("vb")), col("right_id") === col("rid"))
      .withColumn("cosine", expr("cosine_ff(va, vb)"))
      .filter(col("cosine") >= 0.4)
      .select(col("left_id"), col("right_id"), col("cosine"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    // Tracked for deferred cleanup: the lazy result references this
    // persist, so the builder can't unpersist in-scope. Verify releases
    // it per query (a later embedding-dedup query simply re-persists via
    // its own builder call); Bench deliberately does NOT release, so
    // warm repeats and the documented cross-query cache sharing keep
    // working there.
    graft.core.CacheLedger.track(out)
  }

  /** Driver-side twin of [[h64]] for plan-build-time constants. */
  private def md5Long(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Distinct word-3-shingles of lower(text) (shared with the ×100
    * stratified-slice twins in [[SliceQueries]] and the streaming
    * near-dup admission gate in [[graft.streaming.Incremental]]). */
  private[graft] def shingles3: Column = {
    val tk = split(lower(col("text")), "\\s+")
    array_distinct(
      when(size(tk) >= 3,
        transform(sequence(lit(1), size(tk) - 2),
          i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
            element_at(tk, i + 2))))
        .otherwise(array().cast("array<string>")))
  }

  /** Corpus-wide SEGMENT-level dedup with document rewrite — the C4 /
    * Lee et al. 2022 repeated-passage removal step, as a rewrite (the
    * sibling `dedup_substring_spans` only DETECTS spans). Documents are
    * split into consecutive 10-word segments; a segment that already
    * occurred anywhere in the corpus (first occurrence = smallest
    * (doc_id, idx), total order) is dropped, and each document is
    * reassembled from its surviving segments in order.
    *
    * Scale shape: two shuffles total — one hash-partition on the segment
    * (the keeper window; high-cardinality key, no skew group bigger than
    * a segment's true dup count) and one doc_id shuffle to reassemble.
    * Per-key window state is O(dups of that segment); nothing is
    * collected. At 100 TB the window key becomes (xxhash64(seg), seg) so
    * the shuffle carries 8-byte keys — same plan, cheaper exchange. */
  private val paragraphDedupQ = Q(
    "dedup_paragraphs",
    (s, dir) => {
      val d = th(s, dir, "documents").select("doc_id", "text")
      val segs = d.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, (size(split(text, ' ')) - 1) DIV 10), " +
          "i -> array_join(slice(split(text, ' '), i * 10 + 1, 10), ' '))"))
        .as(Seq("idx", "seg")))
      // Keep-first = top-1 per segment hash: TopKPerKey with k=1 (total
      // order (doc_id, idx)) — a bounded single-slot heap per segment
      // instead of sorting every duplicate group.
      val kept = graft.plans.TopK.perKey(
          segs, Seq("seg"), Seq(("doc_id", true), ("idx", true)), 1)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(expr(
            "transform(array_sort(collect_list(struct(idx, seg))), t -> t.seg)"),
            " ").as("text_dedup"))
      segs.groupBy("doc_id").agg(count(lit(1)).as("n_segs"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_segs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("text_dedup"), lit("")).as("text_dedup"))
        .orderBy("doc_id")
    },
    Some("""
      WITH segs AS (
        SELECT doc_id, i AS idx,
               array_to_string(toks[i*10+1 : i*10+10], ' ') AS seg
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents),
             LATERAL (SELECT unnest(range(0, (len(toks)-1)//10 + 1)) AS i)),
      kept AS (
        SELECT doc_id, idx, seg,
               row_number() OVER (PARTITION BY seg
                                  ORDER BY doc_id, idx) AS rk
        FROM segs),
      agg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(seg, ' ' ORDER BY idx) AS text_dedup
        FROM kept WHERE rk = 1 GROUP BY doc_id),
      tot AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id)
      SELECT t.doc_id, t.n_segs, coalesce(a.n_kept, 0) AS n_kept,
             coalesce(a.text_dedup, '') AS text_dedup
      FROM tot t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id"""),
    doc = "corpus-wide 10-word-segment dedup with document REWRITE " +
      "(first occurrence kept, total order): one segment-hash shuffle " +
      "+ one doc_id reassembly shuffle")

  /** Winnowing document fingerprints (Schleimer et al. 2002 — the MOSS
    * algorithm): hash every 8-char gram, slide a w=4 window over the
    * hash sequence, and select each window's minimum hash — the
    * guarantee that matching substrings of length ≥ k+w−1 share a
    * fingerprint, at selection density ~2/(w+1). Fingerprints here are
    * the selected hash VALUES (array_distinct per doc): pairing joins
    * on the hash, so per-occurrence positions — which full MOSS keeps
    * for match LOCATION — are deliberately dropped. Selection is
    * closed-form per window (array_min), no fold anywhere. Pairing joins on the fingerprint hash with the standard
    * per-posting probe cap; everything upstream is per-doc expression
    * work. The gram hash is murmur3_seeded over FIXED 8-char substrings,
    * so the DuckDB oracle replays the whole pipeline — hashes,
    * selection, pairing — via the independent SQL murmur3 applied once
    * per DISTINCT gram (vocab-sized, joined back by position). */
  private val winnowingQ = Q(
    "dedup_winnowing",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val d0 = th(s, dir, "documents").select(col("doc_id"),
        lower(col("text")).as("t"))
      val d = d0.unionByName(d0.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000))
        // Docs shorter than one gram (8 chars) have no full-width gram;
        // drop them so every hashed substring is exactly 8 bytes — the
        // fixed width the oracle's SQL murmur3 replay contracts on.
        .filter(length(col("t")) >= 8)
      val hs = d.withColumn("hs", expr(
        "transform(sequence(1, greatest(length(t) - 7, 1)), " +
          "i -> murmur3_seeded(substring(t, i, 8), 7))"))
      // winnow_min4 kernel (r15): distinct w=4 window minima in one
      // allocation-free pass — replaces the per-window
      // `array_min(slice(hs, j, 4))` expression (one 4-element array
      // per gram position), value-identical including the n<4
      // truncated-window edge.
      val fp = hs.select(col("doc_id"),
          explode(expr("winnow_min4(hs)")).as("h"))
        .distinct()
      // Fused posting cap + pair enumeration (r15, see
      // dedup_audio_fingerprint): same 32 smallest doc_ids per
      // fingerprint as the old TopK.perKey cap, with the upper triangle
      // emitted straight from the merged heaps — the r14 shuffle_hash
      // form re-read the h-exchange and hash-built per partition.
      graft.plans.TopK.pairsPerKey(fp, Seq("h"),
          Seq(("doc_id", true)), Seq("doc_id"), 32)
        .groupBy(col("x_doc_id").as("doc_a"), col("y_doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
        .limit(25)
    },
    Some(s"""
      WITH d0 AS (SELECT doc_id, lower(text) AS t FROM documents),
      d AS (SELECT * FROM (
              SELECT * FROM d0
              UNION ALL
              SELECT doc_id + 100000, t FROM d0 WHERE doc_id % 10 = 0)
            WHERE length(t) >= 8),
      pos AS (
        SELECT doc_id, i, substr(t, i, 8) AS gram
        FROM d, LATERAL (SELECT unnest(range(1,
               greatest(length(t) - 7, 1) + 1)) AS i)),
      raw AS (SELECT DISTINCT gram FROM pos),
      ${graft.queries.Mm3Sql.chain("raw", "gram", "gram", 8, 7L, "m")},
      hseq AS (
        SELECT p.doc_id, list(m.hash ORDER BY p.i) AS hs
        FROM pos p JOIN m_fin m ON m.k = p.gram
        GROUP BY p.doc_id),
      fp AS (
        SELECT DISTINCT doc_id, h FROM (
          SELECT doc_id,
                 list_min(hs[j:j+3]) AS h
          FROM hseq, LATERAL (SELECT unnest(range(1,
                 greatest(len(hs) - 3, 1) + 1)) AS j))),
      capped AS (
        SELECT doc_id, h FROM (
          SELECT doc_id, h,
                 row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
          FROM fp)
        WHERE rn <= 32)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      FROM capped a JOIN capped b
        ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2 ORDER BY n_shared DESC, doc_a, doc_b LIMIT 25"""),
    doc = "winnowing fingerprints (8-gram murmur3, w=4 window minima, " +
      "density ~2/(w+1)): per-doc expression selection, capped " +
      "fingerprint-hash pair join; full murmur3 oracle replay over the " +
      "distinct-gram vocab")

  /** Image near-duplicate detection over the multimodal column — the
    * dedup family extended to binary image payloads (VERDICT r5 item 7).
    *
    * Pipeline: mint one PNG per document id (+ a red-channel-bumped
    * near-dup variant for every 10th id, media_id + 100000) → REAL
    * ImageIO decode → 64-bit dHash over the 9×8 nearest-neighbor
    * luminance grid, carried as four 16-bit bands
    * ([[graft.multimodal.Multimodal.dHashBands]]) → Hamming-ball LSH:
    * by pigeonhole, any pair within Hamming distance ≤ 3 agrees on at
    * least one of the 4 bands EXACTLY, so candidates come from a plain
    * equi-join on (band, value) — never an all-pairs scan — with the
    * standard per-bucket probe cap 32; survivors verified with the full
    * 64-bit Hamming distance (bit_count over xor, codegen'd).
    *
    * Scale posture: decode is linear mapPartitions work in the scan
    * stage; the only shuffles are the band hash-partition and the
    * bucket equi-join; bucket caps bound the quadratic term. The DuckDB
    * oracle recomputes the ENTIRE chain — pixel formula, sampling grid,
    * gradient bits, banding, cap, verify — from the mint seed alone
    * (the `pipe_multimodal_media` discipline), so the real
    * encode→decode→hash path is value-checked end-to-end. */
  private val imagePhashQ = Q(
    "dedup_image_phash",
    (s, dir) => {
      val mm = graft.multimodal.Multimodal
      val d = th(s, dir, "documents").select(col("doc_id"))
      val media = mm.asImageMediaTextured(d).unionByName(
        mm.asImageMediaTexturedBumped(d.filter(col("doc_id") % 10 === 0)))
      val hashed = mm.imageDHash(media)
      val bands = hashed.select(col("media_id"),
        col("b0"), col("b1"), col("b2"), col("b3"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band", "bv")))
      // Per-bucket probe cap through TopKPerKey (same rows as the
      // row_number form — (band, bv, media_id) is unique — minus the
      // per-bucket sort).
      // Fused bucket cap + pair enumeration (r15, see
      // dedup_audio_fingerprint): the default BHJ built the whole
      // mint->decode->dHash pipeline a second time as its broadcast
      // side (the r14 shuffle_hash A/B lost to SMJ/SHJ fixed costs);
      // the merged ≤32 buckets emit their upper triangle directly —
      // the pipeline runs once and no broadcast exists at any scale.
      graft.plans.TopK.pairsPerKey(bands, Seq("band", "bv"),
          Seq(("media_id", true)),
          Seq("media_id", "b0", "b1", "b2", "b3"), 32)
        .select(col("x_media_id").as("media_a"),
          col("y_media_id").as("media_b"),
          (expr("bit_count(x_b0 ^ y_b0)") + expr("bit_count(x_b1 ^ y_b1)") +
            expr("bit_count(x_b2 ^ y_b2)") + expr("bit_count(x_b3 ^ y_b3)"))
            .cast("int").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("hamming", "media_a", "media_b")
    },
    Some("""
      WITH ids AS (
        SELECT doc_id AS media_id, doc_id AS k, 0 AS bump FROM documents
        UNION ALL
        SELECT doc_id + 100000, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
      dims AS (
        SELECT media_id, k, bump,
               CAST(9 + k % 5 AS BIGINT) AS w,
               CAST(8 + k % 3 AS BIGINT) AS h
        FROM ids),
      grid AS (
        SELECT media_id, k, bump, gx.x AS x, gy.y AS y,
               (gx.x * w) // 9 AS sx, (gy.y * h) // 8 AS sy
        FROM dims,
             (SELECT unnest(range(0, 9)) AS x) gx,
             (SELECT unnest(range(0, 8)) AS y) gy),
      lums AS (
        SELECT media_id, x, y,
               (((k*31 + sx*7 + sy*13 + (k % 7 + 1)*sx*sx) % 256 + bump) % 256
                + (k*17 + sx*11 + sy*5 + (k % 11 + 1)*sx*sy) % 256
                + (k*29 + sx*3 + sy*19 + (k % 13 + 1)*sy*sy) % 256) // 3 AS lum
        FROM grid),
      bits AS (
        SELECT a.media_id, a.x, a.y,
               CASE WHEN b.lum > a.lum THEN 1 ELSE 0 END AS bit
        FROM lums a JOIN lums b
          ON a.media_id = b.media_id AND b.y = a.y AND b.x = a.x + 1
        WHERE a.x < 8),
      bands AS (
        SELECT media_id, y // 2 AS band,
               CAST(sum(bit * (1 << ((y % 2) * 8 + x))) AS INT) AS bv
        FROM bits GROUP BY media_id, y // 2),
      hv AS (
        SELECT media_id,
               max(CASE WHEN band = 0 THEN bv END) AS b0,
               max(CASE WHEN band = 1 THEN bv END) AS b1,
               max(CASE WHEN band = 2 THEN bv END) AS b2,
               max(CASE WHEN band = 3 THEN bv END) AS b3
        FROM bands GROUP BY media_id),
      capped AS (
        SELECT band, bv, media_id, b0, b1, b2, b3 FROM (
          SELECT b.band, b.bv, b.media_id, h.b0, h.b1, h.b2, h.b3,
                 row_number() OVER (PARTITION BY b.band, b.bv
                                    ORDER BY b.media_id) AS rn
          FROM bands b JOIN hv h USING (media_id))
        WHERE rn <= 32)
      SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
             CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
               AS INT) AS hamming
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
      ORDER BY hamming, media_a, media_b"""),
    doc = "image near-dup via dHash perceptual hash (real ImageIO decode, " +
      "9x8 gradient grid) + Hamming-ball LSH band join, probe cap 32; " +
      "oracle recomputes the full pixel->hash chain from the mint seed")

  /** Audio near-duplicate detection — the dedup family's third modality
    * (text: [[winnowingQ]], image: [[imagePhashQ]]).
    *
    * Pipeline: mint one 16-bit PCM WAV per document id (+ a
    * sample-shifted near-dup variant for every 10th id) → REAL
    * javax.sound decode to the raw sample stream
    * ([[graft.multimodal.Multimodal.audioSampleFrame]]) → 8-bit
    * quantization → 4-gram acoustic shingles → w=4 window-minima
    * fingerprint selection (the winnowing scheme over samples instead
    * of characters — a Shazam-style constellation stand-in that keeps
    * every step integer-exact) → capped fingerprint equi-join →
    * shared-fingerprint count per pair. The +1 sample shift moves at
    * most 1/256 of quantized values, so planted pairs share nearly all
    * fingerprints while distinct seeds share none.
    *
    * Scale posture: decode is linear mapPartitions work; everything
    * after it is codegen expression work per row; the only shuffles are
    * the fingerprint hash-partition (probe cap 32) and the pair
    * aggregate. The DuckDB oracle replays the ENTIRE chain — PCM
    * formula, quantization, shingles, minima, cap — from the mint seed,
    * so the real encode→decode path is value-checked end-to-end. */
  private val audioFingerprintQ = Q(
    "dedup_audio_fingerprint",
    (s, dir) => {
      val mm = graft.multimodal.Multimodal
      val d = th(s, dir, "documents").select(col("doc_id"))
      val media = mm.asAudioMediaTextured(d).unionByName(
        mm.asAudioMediaTexturedBumped(d.filter(col("doc_id") % 10 === 0)))
      val samp = mm.audioSampleFrame(media)
      // Fused fingerprint kernel (r15): quantize → pack rolling 4-grams
      // → drop constant shingles (multiples of 16843009 = 0x01010101,
      // the audio stopwords — every slowly-varying stream emits them)
      // → winnow w=4 minima → distinct, in ONE allocation-free pass
      // (graft.functions.ArrayKernelOps.audioWinnowFps; value-identical
      // to the expression chain it replaced — the per-window
      // `array_min(slice(g, j, 4))` alone allocated a 4-element array
      // per sample position). The oracle replays the same chain in SQL.
      graft.functions.GraftFunctions.register(s)
      val fp = samp
        .select(col("media_id"),
          explode(expr("audio_winnow_fps(smp)")).as("h"))
      // Fused posting cap + pair enumeration (r15): the r14 A/B between
      // BHJ (duplicated mint+decode pipeline) and shuffle_hash (second
      // exchange read through byte-coalesced partitions) was a choice
      // between two taxes; TopK.pairsPerKey pays neither — the map-side
      // heaps cap each fingerprint's posting list exactly like
      // TopK.perKey did, and the merged ≤32 groups emit their upper
      // triangle directly (no join, no broadcast, no aggregate), so the
      // shape is identical past any broadcast threshold (VERDICT r14
      // item 1).
      graft.plans.TopK.pairsPerKey(fp, Seq("h"),
          Seq(("media_id", true)), Seq("media_id"), 32)
        .groupBy(col("x_media_id").as("media_a"),
          col("y_media_id").as("media_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 20)
        .orderBy(col("n_shared").desc, col("media_a"), col("media_b"))
    },
    Some("""
      WITH ids AS (
        SELECT doc_id AS media_id, doc_id AS k, 0 AS bump FROM documents
        UNION ALL
        SELECT doc_id + 100000, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
      smp AS (
        SELECT media_id, i,
               (k*24097 + i*17 + (k % 251 + 3)*i*i + bump) % 65536 - 32768 AS s
        FROM (SELECT media_id, k, bump, CAST(64 + k % 65 AS BIGINT) AS n
              FROM ids),
             LATERAL (SELECT unnest(range(0, n)) AS i)),
      qs AS (
        SELECT media_id, list((s + 32768) // 256 ORDER BY i) AS ql
        FROM smp GROUP BY media_id),
      grams AS (
        SELECT media_id,
               [x FOR x IN [((ql[j]*256 + ql[j+1])*256 + ql[j+2])*256 + ql[j+3]
                            FOR j IN range(1, len(ql) - 2)]
                  IF x % 16843009 != 0] AS gl
        FROM qs),
      fps AS (
        SELECT DISTINCT media_id, h FROM (
          SELECT media_id, list_min(gl[j:j+3]) AS h
          FROM grams, LATERAL (SELECT unnest(range(1, len(gl) - 2)) AS j))),
      capped AS (
        SELECT media_id, h FROM (
          SELECT media_id, h,
                 row_number() OVER (PARTITION BY h ORDER BY media_id) AS rn
          FROM fps)
        WHERE rn <= 32)
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             count(*) AS n_shared
      FROM capped a JOIN capped b
        ON a.h = b.h AND a.media_id < b.media_id
      GROUP BY 1, 2 HAVING count(*) >= 20
      ORDER BY n_shared DESC, media_a, media_b"""),
    doc = "audio near-dup fingerprints (real WAV decode, 8-bit quantized " +
      "4-gram shingles, w=4 winnowing minima), capped fingerprint join; " +
      "oracle replays PCM formula -> quantize -> shingle -> select -> cap")

  /** Containment near-dup via bottom-k minhash — the ASYMMETRIC measure
    * the Jaccard family can't express: a short fragment inside a long
    * document has tiny Jaccard but containment ≈ 1 (Broder 1997's
    * bottom-k containment estimate; the doc-inside-doc /
    * decontamination shape).
    *
    * C(A,B) = |H(A) ∩ H(B)| / |H(A)| estimated from A's bottom-16
    * shingle hashes: est = |bottom16(A) ∩ H(B)| / min(16, |H(A)|). Both
    * engines compute the SAME md5-derived hashes, so the estimate is
    * deterministic and the gate value-checks it exactly.
    *
    * Scale shape: bottom-k selection is a per-doc window over distinct
    * hashes (k rows survive per fragment); candidates form ONLY via the
    * hash equi-join with the standard per-hash posting cap 32 — a
    * fragment is never compared against documents it shares no shingle
    * with. Planted fragments (first half of every 10th doc, id+100000)
    * must surface with containment 1.0 against their source. */
  private val containmentQ = Q(
    "dedup_containment_minhash",
    (s, dir) => {
      val d = th(s, dir, "documents").select(col("doc_id"), col("text"))
      val frags = d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          expr("array_join(slice(split(lower(text), ' '), 1, " +
            "greatest(size(split(lower(text), ' ')) DIV 2, 5)), ' ')")
            .as("text"))
      def shingleHashes(df: DataFrame): DataFrame =
        df.select(col("doc_id"), explode(shingles3).as("sg"))
          .select(col("doc_id"), h64(col("sg")).as("h"))
          .distinct()
      val fragH = shingleHashes(frags)
      val corpusH = shingleHashes(d)
        .select(col("doc_id").as("src_id"), col("h"))
      // Both caps through TopKPerKey (r6 verdict item 1): the window
      // form paid two corpus-shingle-sized sort passes (the query's
      // whole cold cost); the bounded heaps keep the same rows —
      // bottom-16 hashes per fragment, 32 smallest src_ids per hash —
      // with map-side partial caps and no per-group sort.
      val bottom = graft.plans.TopK.perKey(
          fragH, Seq("doc_id"), Seq(("h", true)), 16)
        .select("doc_id", "h")
      // n_bottom = least(count(fragH per doc), 16) — and TopKPerKey
      // keeps EXACTLY min(16, count) of the (distinct) per-doc hashes,
      // so counting `bottom` gives the identical integer and fragH gains
      // a single consumer: the shingle+md5 pipeline that used to run
      // twice (VERDICT r14 item 5) runs once, and the count sits on
      // bottom's existing doc_id exchange with no extra shuffle.
      val nA = bottom.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bottom"))
      val posting = graft.plans.TopK.perKey(
          corpusH, Seq("h"), Seq(("src_id", true)), 32)
        .select("src_id", "h")
      bottom.join(posting, Seq("h"))
        .groupBy("doc_id", "src_id").agg(count(lit(1)).as("n_match"))
        .join(nA, Seq("doc_id"))
        .withColumn("containment", round(
          col("n_match").cast("double") / col("n_bottom").cast("double"), 6))
        .filter(col("containment") >= 0.8)
        .select(col("doc_id").as("frag_id"), col("src_id"),
          col("n_match"), col("containment"))
        .orderBy("frag_id", "src_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, text FROM documents),
      frags AS (
        SELECT doc_id + 100000 AS doc_id,
               array_to_string(toks[1 : greatest(len(toks)//2, 5)], ' ')
                 AS text
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
              FROM d WHERE doc_id % 10 = 0)),
      fragh AS (
        SELECT DISTINCT doc_id,
               CAST(concat('0x', substr(md5(sg), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id,
                     array_to_string(toks[i : i+2], ' ') AS sg
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                    FROM frags),
                   LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i)
              WHERE len(toks) >= 3)),
      corpush AS (
        SELECT DISTINCT doc_id AS src_id,
               CAST(concat('0x', substr(md5(sg), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id,
                     array_to_string(toks[i : i+2], ' ') AS sg
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                    FROM d),
                   LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i)
              WHERE len(toks) >= 3)),
      na AS (SELECT doc_id, least(count(*), 16) AS n_bottom
             FROM fragh GROUP BY doc_id),
      bottom AS (
        SELECT doc_id, h FROM (
          SELECT doc_id, h,
                 row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rk
          FROM fragh)
        WHERE rk <= 16),
      posting AS (
        SELECT src_id, h FROM (
          SELECT src_id, h,
                 row_number() OVER (PARTITION BY h ORDER BY src_id) AS rk
          FROM corpush)
        WHERE rk <= 32)
      SELECT b.doc_id AS frag_id, p.src_id, count(*) AS n_match,
             round(CAST(count(*) AS DOUBLE) / any_value(na.n_bottom), 6)
               AS containment
      FROM bottom b JOIN posting p ON b.h = p.h
      JOIN na ON na.doc_id = b.doc_id
      GROUP BY b.doc_id, p.src_id
      HAVING round(CAST(count(*) AS DOUBLE) / any_value(na.n_bottom), 6)
             >= 0.8
      ORDER BY frag_id, src_id"""),
    doc = "bottom-16 minhash CONTAINMENT estimate (Broder): asymmetric " +
      "doc-inside-doc detection, hash-join blocking with posting cap 32; " +
      "identical md5 hashes on both faces make the estimate exact")

  /** Exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better" — the ExactSubstr variant): any
    * ≥ k-token exact repeat at ARBITRARY alignment is removed from every
    * occurrence except the corpus-first one, and each document is
    * rewritten from its surviving tokens. The sibling `dedup_paragraphs`
    * only catches repeats aligned to its fixed 10-word segment grid; this
    * is the canonical training-data op that catches the rest (r11 verdict
    * item 1).
    *
    * Distributed shape (the suffix-array of the paper replayed as
    * relational ops): (1) per-position k-gram explode — every token
    * position emits its forward k-gram, so a duplicated substring of
    * length L ≥ k is covered by its L−k+1 duplicated k-grams and the
    * UNION of their spans is exactly the repeat (the paper's "extension"
    * step, subsumed because overlapping k-grams chain); (2) keep-first
    * per gram = the per-gram minimum (doc_id, pos), computed as a
    * partial-aggregable min(struct) + join-back — the grouping key
    * is the exact gram STRING, so no hash-collision verify pass is
    * needed; (3) duplicated occurrences explode to covered token indices
    * (span union) and an interval-merge window counts the contiguous
    * removed spans for the audit; (4) anti-join rewrite reassembles each
    * doc from its uncovered tokens.
    *
    * Scale: one gram-keyed aggregate + join (map-side combine folds each
    * task's occurrences of a gram to one min-candidate before the
    * exchange, so a corpus-frequent boilerplate gram never concentrates
    * its occurrences — let alone sorts them — in one task; the join-back
    * is AQE-skew-splittable because no per-key ordering survives it; at
    * 100 TB the key becomes (xxhash64(gram), gram) so the exchange
    * carries 8-byte prefixes — same plan), ONE doc-keyed aggregate for
    * the whole per-doc dup surface (audit counts + covered indices via
    * per-row array folds, bounded by doc length), one join + groupBy
    * for the rewrite — all key-hash shuffles, nothing driver-side, no
    * per-key ordering anywhere. The planted fixture
    * re-keys every 10th doc with tokens 4..27 of the original behind a
    * 3-token filler prefix: a 24-token repeat at alignment shift 3, which
    * the 10-word segment grid of `dedup_paragraphs` cannot see.
    */
  /** ExactSubstr REWRITE core over a (doc_id, text) frame (Lee et al.
    * 2022): every ≥ `k`-token exact repeat at arbitrary alignment is
    * removed from all but its corpus-first occurrence (total order
    * (doc_id, pos)) and each doc is rewritten from surviving tokens.
    * Returns (doc_id, n_tokens, n_dup_grams, n_spans, n_removed,
    * text_dedup) for EVERY input doc. The catalog Q plants its fixture
    * then delegates here; Round12OpsSpec drives it on toy corpora. */
  def exactSubstringDedup(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val grams = base
        .select(col("doc_id"), posexplode(expr(
          s"CASE WHEN size(toks) >= $k THEN transform(sequence(1, size(toks) - ${k - 1}), " +
            s"i -> array_join(slice(toks, i, $k), ' ')) " +
            "ELSE array() END")).as(Seq("p0", "gram")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("gram"))
      // Keep-first needs only the per-gram MINIMUM (doc_id, pos) — not a
      // rank over the whole group. The former row_number window sorted
      // every occurrence of a gram inside ONE task: a boilerplate 8-gram
      // repeated 1e8 times at 100 TB is a single-partition sort-everything
      // group (the exact hot spot ExactSubstr exists for). min(struct) is
      // partial-aggregable — each map task folds its local occurrences to
      // one candidate before the exchange — and the join-back is a plain
      // hash join on gram that AQE can skew-split. Identical rows: the
      // struct min under (doc_id, pos) IS the keep-first total order.
      val firstOcc = grams.groupBy("gram")
        .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
      val dup = grams.join(firstOcc, Seq("gram"))
        .filter(col("doc_id") =!= col("first.doc_id") ||
          col("pos") =!= col("first.pos"))
        .select("doc_id", "pos")
      // ONE doc-keyed aggregate over dup yields the whole per-doc dup
      // surface: the audit counts AND the covered-index set. A doc's dup
      // positions are bounded by its token count, so the sorted-array
      // fold is per-row work (the same bound the rewrite's collect_list
      // already assumes); deriving spans from the array replaces the
      // doc-keyed window AND keeps dup single-consumer — the r12 form
      // ran one window pass and one explode pass over dup, which after
      // the keep-first de-skew would have re-executed the gram join
      // twice.
      val docDup = dup.groupBy("doc_id")
        .agg(sort_array(collect_list(col("pos"))).as("ps"))
        .select(col("doc_id"),
          size(col("ps")).cast("long").as("n_dup_grams"),
          // spans merge when consecutive sorted positions are within k
          // (equal width k ⇒ previous end is monotone): a new span
          // starts at index 1 and wherever ps[i] > ps[i-1] + k
          // sequence(2, n) with n < 2 runs DESCENDING in Spark 4 (and
          // element_at(ps, 0) throws) — single-dup docs take the empty
          // branch
          (lit(1L) + size(filter(
            expr("CASE WHEN size(ps) >= 2 THEN transform(sequence(2, " +
              s"size(ps)), i -> element_at(ps, i) > element_at(ps, i - 1) " +
              s"+ $k) ELSE array() END"),
            x => x)).cast("long")).as("n_spans"),
          expr(s"array_distinct(flatten(transform(ps, " +
            s"p -> sequence(p, p + ${k - 1}))))").as("rm_idx"))
      // span union → covered token indices (k-wide, overlap collapses),
      // CARRYING the per-doc audit stats on every exploded row (constant
      // within a doc) so docDup has exactly ONE consumer — a separate
      // stats join-back would re-execute the whole gram pipeline for a
      // second copy of this aggregate
      val removed = docDup
        .select(col("doc_id"), col("n_dup_grams"), col("n_spans"),
          explode(col("rm_idx")).as("idx"), lit(1).as("rm"))
      // rewrite + stats in ONE doc-keyed aggregate: tokens carry a
      // removed flag from the coverage left join, n_tokens is the token
      // count itself, and collect_list's null-skipping drops covered
      // tokens from the rewrite — no separate per-doc stats scan or
      // second join back to base
      val tok = base
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("i0", "tok")))
        .select(col("doc_id"), (col("i0") + 1).as("idx"), col("tok"))
      tok
        .join(removed, Seq("doc_id", "idx"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          coalesce(max(col("n_dup_grams")), lit(0L)).as("n_dup_grams"),
          coalesce(max(col("n_spans")), lit(0L)).as("n_spans"),
          sum(coalesce(col("rm"), lit(0))).cast("long").as("n_removed"),
          array_join(expr(
            "transform(array_sort(collect_list(CASE WHEN rm IS NULL THEN " +
              "struct(idx, tok) END)), t -> t.tok)"), " ").as("text_dedup"))
        .select(col("doc_id"), col("n_tokens"), col("n_dup_grams"),
          col("n_spans"), col("n_removed"), col("text_dedup"))
        .orderBy("doc_id")
  }


  private val exactSubstringQ = Q(
    "dedup_exact_substring",
    (s, dir) => {
      val d0 = th(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d0.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"),
          concat(lit("zq0 zq1 zq2 "),
            array_join(slice(split(col("text"), " "), 4, 24), " ")).as("text"))
      exactSubstringDedup(d0.unionByName(planted), 8)
    },
    Some("""
      WITH d0 AS (SELECT doc_id, text FROM documents),
      base AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM d0
        UNION ALL
        SELECT doc_id + 300000,
               string_split('zq0 zq1 zq2 ' ||
                 array_to_string(string_split(text, ' ')[4:27], ' '), ' ')
        FROM d0 WHERE doc_id % 10 = 0),
      grams AS (
        SELECT doc_id, i AS pos,
               array_to_string(toks[i:i+7], ' ') AS gram
        FROM base, LATERAL (SELECT unnest(range(1,
               greatest(len(toks) - 7, 0) + 1)) AS i)),
      rk AS (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY gram
                                  ORDER BY doc_id, pos) AS r
        FROM grams),
      dup AS (SELECT doc_id, pos FROM rk WHERE r > 1),
      removed AS (
        SELECT DISTINCT doc_id, pos + o AS idx
        FROM dup, LATERAL (SELECT unnest(range(0, 8)) AS o)),
      spans AS (
        SELECT doc_id,
               CASE WHEN lag(pos) OVER w IS NULL
                         OR pos > lag(pos) OVER w + 8
                    THEN 1 ELSE 0 END AS new_span
        FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      dupstats AS (
        SELECT doc_id, count(*) AS n_dup_grams,
               CAST(sum(new_span) AS BIGINT) AS n_spans
        FROM spans GROUP BY doc_id),
      tok AS (
        SELECT doc_id, i AS idx, toks[i] AS tok
        FROM base, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)),
      agg AS (
        SELECT t.doc_id, count(*) AS n_kept,
               string_agg(t.tok, ' ' ORDER BY t.idx) AS text_dedup
        FROM tok t LEFT JOIN removed r
          ON r.doc_id = t.doc_id AND r.idx = t.idx
        WHERE r.doc_id IS NULL GROUP BY t.doc_id)
      SELECT b.doc_id, CAST(len(b.toks) AS BIGINT) AS n_tokens,
             coalesce(ds.n_dup_grams, 0) AS n_dup_grams,
             coalesce(ds.n_spans, 0) AS n_spans,
             CAST(len(b.toks) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
             coalesce(a.text_dedup, '') AS text_dedup
      FROM base b
        LEFT JOIN dupstats ds ON ds.doc_id = b.doc_id
        LEFT JOIN agg a ON a.doc_id = b.doc_id
      ORDER BY b.doc_id"""),
    doc = "ExactSubstr dedup (Lee et al. 2022): arbitrary-alignment " +
      "≥ 8-token exact repeats removed corpus-wide (keep-first total " +
      "order), span-merged audit + document rewrite; planted 24-token " +
      "shift-3 repeat the fixed segment grid cannot see")

  val all: Seq[Q] = Seq(incrementalBloomQ, paragraphDedupQ, winnowingQ,
    imagePhashQ, audioFingerprintQ, containmentQ, exactSubstringQ) ++ Seq(
    // Exact dedup: canonical-form fingerprint → hash-groupBy, keep the
    // minimum id (deterministic keeper). Input is documents ∪ a re-keyed
    // copy of every 10th doc, so the dup groups are non-trivial.
    // reference A13 drop_duplicates (src/twitter.py:68 etc.).
    Q(
      "dedup_exact",
      (s, dir) => {
        val d = th(s, dir, "documents")
        val dup = d.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 100000)
        val incoming = d.unionByName(dup)
        val fp = md5(trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9\\s]", ""), "\\s+", " ")))
        incoming.withColumn("fp", fp)
          .groupBy("fp")
          .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
          .orderBy("keeper_id")
      },
      Some("""
        SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                    '\s+', ' ', 'g'))) AS fp,
               min(doc_id) AS keeper_id, count(*) AS n_copies
        FROM (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)
        GROUP BY fp ORDER BY keeper_id"""),
      doc = "exact dedup via fingerprint hash-groupBy; A13 drop_duplicates analog"),

    // MinHash + LSH near-dup: word-3-shingles → 12-hash minhash signature
    // → 4 bands × 3 rows → bucket self-join for candidates → exact
    // shingle-Jaccard verify ≥ 0.5. Finds exactly the planted near-dup
    // pairs at sf0.01. Candidates form only inside (band, bucket) groups:
    // the pair join shuffles on the band key, never crosses buckets.
    Q(
      "dedup_minhash_lsh",
      (s, dir) => {
        val d = th(s, dir, "documents")
        val shingled = d.select(col("doc_id"), shingles3.as("sh"))
        // Compiled signature kernel as a native expression: one md5 per
        // shingle, affine per-seed family, consuming ArrayData directly —
        // no per-token Seq[String] boxing (the interpreted-lambda version
        // re-hashed every shingle 12x and was ~50x slower; the UDF form
        // paid a per-row converter on top of the kernel).
        graft.functions.GraftFunctions.register(s)
        // Probe cap (see dedup_embedding_cosine): near-identical template
        // docs collide on whole signatures, so an uncapped bucket join
        // goes quadratic in the hottest bucket.
        val banded = shingled.withColumn("sig", expr("minhash_sig(sh, 12)"))
          .select(col("doc_id"), explode(transform(sequence(lit(0), lit(3)),
            b => struct(b.as("bd"), md5(concat_ws(",",
              element_at(col("sig"), b * 3 + 1).cast("string"),
              element_at(col("sig"), b * 3 + 2).cast("string"),
              element_at(col("sig"), b * 3 + 3).cast("string"))).as("bkey"))))
            .as("b"))
          .select(col("doc_id"), col("b.bd").as("bd"),
            col("b.bkey").as("bkey"))
        // Fused bucket cap + pair enumeration (r15, see
        // dedup_audio_fingerprint). This also retires the bands persist:
        // it existed only because the self-join consumed the capped
        // frame twice (re-running the signature kernel per side); with
        // the single fused operator the ≤32 bucket lists emit their
        // pairs directly — no cache write, no second pass.
        val cand = graft.plans.TopK.pairsPerKey(banded, Seq("bd", "bkey"),
            Seq(("doc_id", true)), Seq("doc_id"), 32)
          .select(col("x_doc_id").as("left_id"), col("y_doc_id").as("right_id"))
          .distinct()
        val out = cand
          .join(shingled.select(col("doc_id").as("lid"), col("sh").as("sa")),
            col("left_id") === col("lid"))
          .join(shingled.select(col("doc_id").as("rid"), col("sh").as("sb")),
            col("right_id") === col("rid"))
          .select(col("left_id"), col("right_id"),
            round(expr("jaccard_sim(sa, sb)"), 6).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .orderBy("left_id", "right_id")
          // The verified-pair result is tiny (pairs that LSH-collided AND
          // pass Jaccard ≥ 0.5); cache it eagerly so warm repeats serve
          // from the pair set instead of re-running the pipeline.
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        // tracked: Verify releases after the result is written (r10)
        graft.core.CacheLedger.track(out)
      },
      Some("""
        WITH tk AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk FROM documents),
        sh AS (
          SELECT doc_id,
                 list_distinct(CASE WHEN len(tk) >= 3
                   THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                         FOR i IN range(1, len(tk) - 1)]
                   ELSE CAST([] AS VARCHAR[]) END) AS sh
          FROM tk),
        sig AS (
          SELECT doc_id, sh,
                 CASE WHEN len(sh) = 0 THEN [CAST(-1 AS BIGINT) FOR j IN range(0, 12)]
                 ELSE [list_min([((2*j+1) * (CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 268435456)
                                  + 7919*j) % 2147483647
                            FOR x IN sh]) FOR j IN range(0, 12)] END AS sig
          FROM sh),
        bands AS (
          SELECT doc_id, bd, bkey FROM (
            SELECT doc_id, bd,
                   md5(concat(CAST(sig[bd*3+1] AS VARCHAR), ',',
                              CAST(sig[bd*3+2] AS VARCHAR), ',',
                              CAST(sig[bd*3+3] AS VARCHAR))) AS bkey
            FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS bd) t)
          QUALIFY row_number() OVER (PARTITION BY bd, bkey ORDER BY doc_id) <= 32),
        cand AS (
          SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
          FROM bands a JOIN bands b
            ON a.bd = b.bd AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
        SELECT left_id, right_id,
               round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
                     len(list_distinct(sa.sh || sb.sh)), 6) AS jaccard
        FROM cand
          JOIN sh sa ON cand.left_id = sa.doc_id
          JOIN sh sb ON cand.right_id = sb.doc_id
        WHERE round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
              len(list_distinct(sa.sh || sb.sh)), 6) >= 0.5
        ORDER BY left_id, right_id"""),
      doc = "MinHash(12) + LSH(4x3) near-dup with exact-Jaccard verify (training pipeline)"),

    // SimHash: 32-bit signature over the distinct-token set; docs sharing
    // a signature form a near-dup cluster. Output is the cluster summary
    // (signature, size, representative) — one shuffle on the signature.
    Q(
      "dedup_simhash",
      (s, dir) => {
        val d = th(s, dir, "documents")
        // Compiled kernel as a native expression: one md5 per distinct
        // token, 32-bit sign aggregation, straight off ArrayData (the
        // interpreted-lambda form of the same math was ~50x slower).
        graft.functions.GraftFunctions.register(s)
        d.withColumn("toks", array_distinct(split(lower(col("text")), "\\s+")))
          .withColumn("simhash", expr("simhash32(toks)"))
          .groupBy("simhash")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .filter(col("n_docs") > 1)
          .orderBy("simhash")
      },
      Some("""
        SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc
        FROM (
          SELECT doc_id,
                 CAST(list_sum([CASE WHEN CAST(list_sum(
                     [CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1
                           THEN 1 ELSE -1 END FOR h IN th]) AS BIGINT) > 0
                       THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END
                     FOR j IN range(0, 32)]) AS BIGINT) AS simhash
          FROM (SELECT doc_id,
                       [CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT)
                        FOR w IN list_distinct(string_split_regex(lower(text), '\s+'))] AS th
                FROM documents))
        GROUP BY simhash HAVING count(*) > 1 ORDER BY simhash"""),
      doc = "SimHash-32 near-dup clustering (training pipeline)"),

    // Character-3-gram Jaccard near-dup with length-bucket blocking: each
    // doc lands in two adjacent 25-char buckets (so no boundary misses for
    // similar-length pairs); exact Jaccard only inside a bucket. The
    // all-pairs cost is bounded per bucket — never global.
    Q(
      "dedup_ngram_jaccard",
      (s, dir) => {
        val d = th(s, dir, "documents")
        graft.functions.GraftFunctions.register(s)
        val g = d.select(col("doc_id"), col("n_chars"),
          expr("char_trigrams(lower(text))").as("grams"))
        // Probe cap: at most 64 docs per length bucket meet pairwise, so
        // the quadratic verify stays bounded at any corpus size. Fused
        // cap + pair enumeration (r15, see dedup_audio_fingerprint):
        // the ≤64 (doc_id, grams) rows per length bucket emit their
        // upper triangle straight from the merged heaps — the trigram
        // pipeline runs once, no join.
        graft.plans.TopK.pairsPerKey(
          g.select(col("doc_id"), col("grams"),
            explode(array((col("n_chars") / 25).cast("long"),
              (col("n_chars") / 25).cast("long") + 1)).as("bucket")),
          Seq("bucket"), Seq(("doc_id", true)), Seq("doc_id", "grams"), 64)
          .select(col("x_doc_id").as("left_id"), col("y_doc_id").as("right_id"),
            round(expr("jaccard_sim(x_grams, y_grams)"), 6).as("jaccard"))
          .filter(col("jaccard") >= 0.8)
          .distinct()
          .orderBy("left_id", "right_id")
      },
      Some("""
        WITH g AS (
          SELECT doc_id, n_chars,
                 list_distinct([substr(txt, i, 3) FOR i IN range(1, length(txt) - 1)]) AS grams
          FROM (SELECT doc_id, n_chars, lower(text) AS txt FROM documents)),
        blocked AS (
          SELECT doc_id, grams, n_chars // 25 + bo AS bucket
          FROM g CROSS JOIN (SELECT unnest(range(0, 2)) AS bo) t
          QUALIFY row_number() OVER (PARTITION BY (n_chars // 25 + bo) ORDER BY doc_id) <= 64)
        SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id,
               round(len(list_intersect(a.grams, b.grams)) * 1.0 /
                     len(list_distinct(a.grams || b.grams)), 6) AS jaccard
        FROM blocked a JOIN blocked b
          ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.grams, b.grams)) * 1.0 /
              len(list_distinct(a.grams || b.grams)), 6) >= 0.8
        ORDER BY left_id, right_id"""),
      doc = "char-3-gram Jaccard near-dup, length-bucket blocking (training pipeline)"),

    // Embedding-cosine near-dup: banded random-hyperplane LSH (8 bands x
    // 4 bits) buckets the vectors; exact cosine ≥ 0.4 verifies candidates.
    // The hyperplane coefficients are md5-derived constants — computed
    // ONCE at plan-build time and embedded as literals, not re-hashed per
    // row (the oracle re-derives identical values in SQL). Each bucket's
    // probe set is capped at the 32 lowest vec_ids: candidate volume stays
    // bounded per bucket at ANY corpus size, the standard guard against
    // hot LSH buckets going quadratic.
    Q(
      "dedup_embedding_cosine",
      (s, dir) => embeddingPairs(s, dir)
        .select(col("left_id"), col("right_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy("left_id", "right_id"),
      Some("""
        WITH v AS (
          SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS vv FROM embeddings),
        buckets AS (
          SELECT vec_id, bd, bkey FROM (
            SELECT vec_id, bd,
                   CAST(list_sum([CASE WHEN list_sum([vv[d+1] *
                       CAST((CAST(concat('0x', substr(md5(CAST(bd*4+j AS VARCHAR) || '_' ||
                         CAST(d AS VARCHAR)), 1, 15)) AS BIGINT) % 2001) - 1000 AS DOUBLE)
                       FOR d IN range(0, 64)]) > 0
                     THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END FOR j IN range(0, 4)]) AS BIGINT) AS bkey
            FROM v CROSS JOIN (SELECT unnest(range(0, 8)) AS bd) t)
          QUALIFY row_number() OVER (PARTITION BY bd, bkey ORDER BY vec_id) <= 32),
        cand AS (
          SELECT DISTINCT a.vec_id AS left_id, b.vec_id AS right_id
          FROM buckets a JOIN buckets b
            ON a.bd = b.bd AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
        j AS (
          SELECT left_id, right_id,
                 list_sum([va.vv[i+1] * vb.vv[i+1] FOR i IN range(0, 64)]) /
                 (sqrt(list_sum([va.vv[i+1] * va.vv[i+1] FOR i IN range(0, 64)])) *
                  sqrt(list_sum([vb.vv[i+1] * vb.vv[i+1] FOR i IN range(0, 64)]))) AS cosine
          FROM cand JOIN v va ON cand.left_id = va.vec_id
                    JOIN v vb ON cand.right_id = vb.vec_id)
        SELECT left_id, right_id, round(cosine, 6) AS cosine
        FROM j WHERE cosine >= 0.4 ORDER BY left_id, right_id"""),
      doc = "embedding near-dup via banded hyperplane LSH + cosine verify (training pipeline)"),

    // Near-dup CLUSTERING: the LSH queries above verify pair generation;
    // this verifies the transitive-closure step that turns pairs into
    // keep-one-per-cluster groups (graft.ml.ConnectedComponents,
    // iterative min-label propagation — two shuffles per round, rounds =
    // graph diameter, labels localCheckpointed, nothing collected). The
    // planted edges form 3-node chains (doc → +100000 → +200000) with a
    // bridge merging every 5th family pair, so a propagation that stops
    // at direct neighbors (1 round) or misses the bridge cannot match
    // the oracle's closed-form component roots.
    Q(
      "dedup_cluster_cc",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .filter(col("doc_id") % 10 === 0).select("doc_id")
        val e1 = d.select(col("doc_id").as("src"),
          (col("doc_id") + 100000L).as("dst"))
        val e2 = d.select((col("doc_id") + 100000L).as("src"),
          (col("doc_id") + 200000L).as("dst"))
        val bridge = d.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("src"), (col("doc_id") + 10L).as("dst"))
        val labels = graft.ml.ConnectedComponents.run(
          e1.unionByName(e2).unionByName(bridge))
        labels.groupBy("label")
          .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_member"))
          .orderBy("label")
      },
      Some("""
        WITH base AS (
          SELECT doc_id AS b FROM documents WHERE doc_id % 10 = 0),
        members AS (
          SELECT CASE WHEN b % 50 = 10 THEN b - 10 ELSE b END AS label,
                 unnest([b, b + 100000, b + 200000]) AS m
          FROM base)
        SELECT label, count(*) AS n_members, max(m) AS max_member
        FROM members GROUP BY label ORDER BY label"""),
      doc = "near-dup cluster assembly: distributed connected components " +
        "(min-label propagation) over planted chain+bridge pair graph"),

    // SemDeDup-style end-to-end semantic dedup: the full pipeline a
    // 100 TB embedding dedup runs — LSH-blocked verified cosine pairs
    // (embeddingPairs, probe-capped) → distributed connected components
    // (min-label propagation, O(diameter) rounds) → one representative
    // (min vec_id = the component label) kept per cluster. Output is the
    // cluster ledger: label, size, the kept representative, and how many
    // vectors a keep-one policy drops. The oracle rebuilds the clusters
    // through DuckDB's recursive CTE — a completely different closure
    // algorithm — over the same pair SQL as dedup_embedding_cosine.
    Q(
      "dedup_semantic_cluster",
      (s, dir) => {
        val pairs = embeddingPairs(s, dir)
        val labels = graft.ml.ConnectedComponents.run(
          pairs.select(col("left_id").as("src"), col("right_id").as("dst")))
        labels.groupBy("label")
          .agg(count(lit(1)).as("n_members"),
            min(col("id")).as("representative"),
            (count(lit(1)) - 1).as("n_dropped"))
          .orderBy("label")
      },
      Some("""
        WITH RECURSIVE v AS (
          SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS vv FROM embeddings),
        buckets AS (
          SELECT vec_id, bd, bkey FROM (
            SELECT vec_id, bd,
                   CAST(list_sum([CASE WHEN list_sum([vv[d+1] *
                       CAST((CAST(concat('0x', substr(md5(CAST(bd*4+j AS VARCHAR) || '_' ||
                         CAST(d AS VARCHAR)), 1, 15)) AS BIGINT) % 2001) - 1000 AS DOUBLE)
                       FOR d IN range(0, 64)]) > 0
                     THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END FOR j IN range(0, 4)]) AS BIGINT) AS bkey
            FROM v CROSS JOIN (SELECT unnest(range(0, 8)) AS bd) t)
          QUALIFY row_number() OVER (PARTITION BY bd, bkey ORDER BY vec_id) <= 32),
        cand AS (
          SELECT DISTINCT a.vec_id AS left_id, b.vec_id AS right_id
          FROM buckets a JOIN buckets b
            ON a.bd = b.bd AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
        pairs AS (
          SELECT left_id, right_id
          FROM (SELECT left_id, right_id,
                 list_sum([va.vv[i+1] * vb.vv[i+1] FOR i IN range(0, 64)]) /
                 (sqrt(list_sum([va.vv[i+1] * va.vv[i+1] FOR i IN range(0, 64)])) *
                  sqrt(list_sum([vb.vv[i+1] * vb.vv[i+1] FOR i IN range(0, 64)]))) AS cosine
                FROM cand JOIN v va ON cand.left_id = va.vec_id
                          JOIN v vb ON cand.right_id = vb.vec_id)
          WHERE cosine >= 0.4),
        edges AS (
          SELECT left_id AS u, right_id AS w FROM pairs
          UNION ALL SELECT right_id, left_id FROM pairs),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, reach.r FROM edges e JOIN reach ON e.w = reach.u),
        lab AS (SELECT u AS id, min(r) AS label FROM reach GROUP BY u)
        SELECT label, count(*) AS n_members, min(id) AS representative,
               count(*) - 1 AS n_dropped
        FROM lab GROUP BY label ORDER BY label"""),
      doc = "SemDeDup-style semantic dedup composite: LSH cosine pairs -> " +
        "connected components -> keep-one-per-cluster ledger; oracle " +
        "replays the closure via recursive CTE"),

    // Keep-BEST-per-cluster: the representative policy production
    // curation actually uses — keep the highest-quality member of each
    // near-dup cluster (here: longest document, ties to lowest id), not
    // the arbitrary min-id. Same pair graph and components as
    // dedup_semantic_cluster (shared via the CacheManager persist on the
    // pair set — the CC labels join the quality table once, one hash
    // shuffle on id); the argmax is a per-cluster window over
    // cluster-sized partitions.
    Q(
      "dedup_keep_best",
      (s, dir) => {
        val pairs = embeddingPairs(s, dir)
        val labels = graft.ml.ConnectedComponents.run(
          pairs.select(col("left_id").as("src"), col("right_id").as("dst")))
        val quality = t(s, dir, "documents")
          .select(col("doc_id").as("id"), col("n_chars"))
        val w = Window.partitionBy("label")
          .orderBy(col("n_chars").desc, col("id").asc)
        labels.join(quality, Seq("id"))
          .withColumn("rk", row_number().over(w))
          .groupBy("label")
          .agg(count(lit(1)).as("n_members"),
            max(when(col("rk") === 1, col("id"))).as("best_id"),
            max(when(col("rk") === 1, col("n_chars"))).as("best_n_chars"))
          .orderBy("label")
      },
      Some("""
        WITH RECURSIVE v AS (
          SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS vv FROM embeddings),
        buckets AS (
          SELECT vec_id, bd, bkey FROM (
            SELECT vec_id, bd,
                   CAST(list_sum([CASE WHEN list_sum([vv[d+1] *
                       CAST((CAST(concat('0x', substr(md5(CAST(bd*4+j AS VARCHAR) || '_' ||
                         CAST(d AS VARCHAR)), 1, 15)) AS BIGINT) % 2001) - 1000 AS DOUBLE)
                       FOR d IN range(0, 64)]) > 0
                     THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END FOR j IN range(0, 4)]) AS BIGINT) AS bkey
            FROM v CROSS JOIN (SELECT unnest(range(0, 8)) AS bd) t)
          QUALIFY row_number() OVER (PARTITION BY bd, bkey ORDER BY vec_id) <= 32),
        cand AS (
          SELECT DISTINCT a.vec_id AS left_id, b.vec_id AS right_id
          FROM buckets a JOIN buckets b
            ON a.bd = b.bd AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
        pairs AS (
          SELECT left_id, right_id
          FROM (SELECT left_id, right_id,
                 list_sum([va.vv[i+1] * vb.vv[i+1] FOR i IN range(0, 64)]) /
                 (sqrt(list_sum([va.vv[i+1] * va.vv[i+1] FOR i IN range(0, 64)])) *
                  sqrt(list_sum([vb.vv[i+1] * vb.vv[i+1] FOR i IN range(0, 64)]))) AS cosine
                FROM cand JOIN v va ON cand.left_id = va.vec_id
                          JOIN v vb ON cand.right_id = vb.vec_id)
          WHERE cosine >= 0.4),
        edges AS (
          SELECT left_id AS u, right_id AS w FROM pairs
          UNION ALL SELECT right_id, left_id FROM pairs),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, reach.r FROM edges e JOIN reach ON e.w = reach.u),
        lab AS (SELECT u AS id, min(r) AS label FROM reach GROUP BY u),
        q AS (
          SELECT lab.id, label, n_chars,
                 row_number() OVER (PARTITION BY label
                                    ORDER BY n_chars DESC, lab.id ASC) AS rk
          FROM lab JOIN documents d ON lab.id = d.doc_id)
        SELECT label, count(*) AS n_members,
               max(CASE WHEN rk = 1 THEN id END) AS best_id,
               max(CASE WHEN rk = 1 THEN n_chars END) AS best_n_chars
        FROM q GROUP BY label ORDER BY label"""),
      doc = "keep-best-per-cluster dedup policy: semantic clusters joined " +
        "to a quality signal, per-cluster argmax (longest doc, ties to " +
        "lowest id) replayed by the oracle's window over the recursive " +
        "closure"),

    // Substring-level dedup span detection (the distributed form of
    // Lee et al. 2022's suffix-array ExactSubstr dedup): any substring of
    // >= 8 tokens that occurs twice anywhere in the corpus shares all its
    // 8-token shingles, so duplicated spans = the merged union of
    // duplicated-shingle windows. Three linear shuffles at any corpus
    // size: (1) hash-groupBy shingle to find multiply-occurring hashes,
    // (2) hash join back to positions, (3) per-doc window to merge
    // overlapping/adjacent windows into maximal spans (the island trick:
    // running max of span ends). No suffix array, no global sort — this
    // is the scalable approximation production curation pipelines use.
    // Output: per affected doc, the merged span count, covered token
    // count, and covered fraction.
    Q(
      "dedup_substring_spans",
      (s, dir) =>
        DedupQueries.substringSpans(
          th(s, dir, "documents").select(col("doc_id"), col("text")), 8)
          .orderBy("doc_id"),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS ws
          FROM documents),
        pos AS (
          SELECT doc_id, len(ws) AS n_tokens,
                 unnest(generate_series(1, len(ws) - 7)) AS i, ws
          FROM t WHERE len(ws) >= 8),
        sh AS (
          SELECT doc_id, n_tokens, i AS start,
                 md5(array_to_string(ws[i:i+7], ' ')) AS h
          FROM pos),
        dup AS (SELECT h FROM sh GROUP BY h HAVING count(*) > 1),
        hits AS (SELECT doc_id, n_tokens, start FROM sh
                 WHERE h IN (SELECT h FROM dup)),
        isl AS (
          SELECT doc_id, n_tokens, start,
                 CASE WHEN start > coalesce(
                        max(start + 7) OVER (PARTITION BY doc_id ORDER BY start
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) + 1 THEN 1 ELSE 0 END AS brk
          FROM hits),
        isl2 AS (
          SELECT doc_id, n_tokens, start,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM isl),
        spans AS (
          SELECT doc_id, n_tokens, island,
                 max(start) + 7 - min(start) + 1 AS span_len
          FROM isl2 GROUP BY 1, 2, 3)
        SELECT doc_id, n_tokens, count(*) AS n_spans,
               CAST(sum(span_len) AS BIGINT) AS dup_tokens,
               round(CAST(sum(span_len) AS BIGINT) / n_tokens, 6) AS dup_frac
        FROM spans GROUP BY doc_id, n_tokens ORDER BY doc_id"""),
      doc = "substring-level dedup spans (Lee et al. ExactSubstr, " +
        "distributed shingle form): duplicated 8-token shingle windows " +
        "merged into maximal per-doc spans via the island window trick"))

  /** Duplicated-substring span detection over a (doc_id, text) frame:
    * every substring of >= `k` tokens occurring more than once in the
    * corpus is covered by duplicated k-shingles; the merged
    * (overlapping-or-adjacent) union of those shingle windows per doc is
    * returned as (doc_id, n_tokens, n_spans, dup_tokens, dup_frac),
    * docs without duplicated spans omitted. Three linear shuffles:
    * shingle-hash groupBy, hash join back, per-doc window merge. */
  def substringSpans(docs: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val toked = docs
      .select(col("doc_id"), CurationDefs.toks.as("ws"))
      .withColumn("n_tokens", size(col("ws")))
      .filter(col("n_tokens") >= k)
    val sh = toked
      .select(col("doc_id"), col("n_tokens"),
        explode(transform(sequence(lit(1), col("n_tokens") - (k - 1)),
          i => struct(i.as("start"),
            md5(concat_ws(" ", slice(col("ws"), i, lit(k)))).as("h"))))
          .as("sg"))
      .select(col("doc_id"), col("n_tokens"),
        col("sg.start").as("start"), col("sg.h").as("h"))
    val dupH = sh.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("h")
    val hits = sh.join(dupH, "h")
    val wDoc = Window.partitionBy("doc_id").orderBy("start")
    val isl = hits
      .withColumn("prev_end",
        max(col("start") + (k - 1)).over(
          wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("start") > coalesce(col("prev_end"), lit(-1L)) + 1, 1)
          .otherwise(0))
      .withColumn("island",
        sum(col("brk")).over(
          wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy("doc_id", "n_tokens", "island")
      .agg((max(col("start")) + (k - 1) - min(col("start")) + 1)
        .as("span_len"))
      .groupBy("doc_id", "n_tokens")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_len")).cast("long").as("dup_tokens"))
      .withColumn("dup_frac",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
  }

  /** Incremental (cross-batch) exact dedup — the CONTINUOUS-ingest shape
    * of `dedup_exact`: an arriving batch must drop documents already in
    * the historical corpus WITHOUT reshuffling the history. The history
    * contributes only a fixed-size Bloom filter over its fingerprints
    * (built distributively, ~KB to the driver, shipped with the plan);
    * the batch probes it map-side, definite-new rows pass through with
    * ZERO join, and only the bloom-positive sliver joins history for
    * exact false-positive repair. At 100 TB of history the per-batch
    * cost is O(batch) + O(batch × fpp) join input — the history is
    * never rescanned beyond its (cacheable) fingerprint column.
    */
  private[queries] lazy val incrementalBloomQ = Q(
    "dedup_incremental_bloom",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val d = th(s, dir, "documents")
      // 60-bit fingerprint of the normalized text (md5-prefix — the
      // engine/oracle-portable hash, same trick as the LSH band keys).
      val fp = expr("CAST(conv(substring(md5(trim(regexp_replace(" +
        "regexp_replace(lower(text), '[^a-z0-9\\\\s]', ''), " +
        "'\\\\s+', ' '))), 1, 15), 16, 10) AS BIGINT)")
      // The fp chain (two regex passes + md5 over the full text) is the
      // whole linear cost here, and BOTH sides used to pay it twice:
      // hist once for the bloom build (a separate driver action — no
      // exchange reuse can cross jobs) and again under the anti-join;
      // batch once per union branch (probe-pass and probe-fail are two
      // subtrees of one plan with no exchange to share). Persisting the
      // NARROW fp projections (8-16 bytes/row — nothing like the
      // token-sized frame that sank the r14 text_lm_score persist)
      // halves the query's dominant term (guide §5 reuse; VERDICT r14
      // item 3). At 100 TB this is the docstring's "(cacheable)
      // fingerprint column" made explicit.
      val hist = graft.core.CacheLedger.track(
        d.filter(col("doc_id") % 5 =!= 0).withColumn("fp", fp)
          .select("fp")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // Arriving batch: the held-out docs plus re-sent history docs under
      // new ids — planted cross-batch duplicates.
      val batch = graft.core.CacheLedger.track(
        d.filter(col("doc_id") % 5 === 0).withColumn("fp", fp)
          .unionByName(d.filter(col("doc_id") % 10 === 3)
            .withColumn("doc_id", col("doc_id") + 100000)
            .withColumn("fp", fp))
          .select("doc_id", "fp")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val bloom = hist.stat.bloomFilter("fp", 100000, 0.01)
      // Materialize the batch cache in ONE pass before its two union
      // branches race to build it concurrently (same minhash precedent:
      // the eager count is the persist's build action).
      batch.count()
      val bits = graft.functions.BloomOps.toBytes(bloom)
      val probe = call_function("bloom_contains", col("fp"), lit(bits))
      val definiteNew = batch.filter(!probe)
      val candidates = batch.filter(probe)
        .join(hist.select("fp").distinct(), Seq("fp"), "left_anti")
      definiteNew.select("doc_id", "fp")
        .unionByName(candidates.select("doc_id", "fp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH fps AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                 '\s+', ' ', 'g'))), 1, 15)) AS BIGINT) AS fp
        FROM documents),
      hist AS (SELECT fp FROM fps WHERE doc_id % 5 <> 0),
      batch AS (
        SELECT doc_id, fp FROM fps WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 100000, fp FROM fps WHERE doc_id % 10 = 3)
      SELECT doc_id, fp FROM batch
      WHERE fp NOT IN (SELECT fp FROM hist)
      ORDER BY doc_id"""),
    doc = "incremental cross-batch dedup: history contributes only a " +
      "broadcast Bloom filter; definite-new batch rows never join, the " +
      "bloom-positive sliver gets exact anti-join repair — O(batch) " +
      "per ingest at any history size")
}
