package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ml.Gsdmm
import graft.multimodal.Multimodal

/** ML stages (SURVEY §2.10 N7/N8/N9, §7.3 decision table).
  *
  * Scale discipline (round-3 hardening): NOTHING here collects an
  * unbounded frame. The KNN visitor prediction is fully distributed (the
  * "model" is a 30-row broadcast side of a cross join); DBSCAN fits on
  * the post-aggregation distinct-vector frame under a hard cap; GSDMM
  * fits on a deterministic hash-ordered top-K sample and assigns topics
  * to the full corpus distributedly via a broadcast model.
  */
object MlQueries extends QueryBase {


  // ---- GSDMM Gibbs-trajectory replay (DuckDB face) -----------------
  // The fit is counter-based (graft.ml.Gsdmm: SplitMix64 over
  // seed + step), so the ENTIRE trajectory — init assignment, 10 sweeps
  // of per-doc unassign/score/sample/reassign, final counts, and the
  // full-corpus argmax assignment — is a pure function SQL can replay.
  // The recursion below IS that replay: one row per sweep step carrying
  // (labels, mz, nz, nzw) plus the per-doc token/count tables as list
  // constants (carrying them in-state avoids a per-step join, 14x
  // faster). Floating-point order is pinned: one fused ln(a)-ln(b) term
  // per token, left-fold via list_reduce with the prior prepended —
  // operation-for-operation the Scala accumulation.

  /** a*C mod 2^64 in DuckDB HUGEINT (INT128 would overflow on a 64x64
    * product, so the constant is split into 32-bit halves). */
  private def mmSql(a: String, c: BigInt): String = {
    val c0 = c & ((BigInt(1) << 32) - 1)
    val c1 = c >> 32
    s"((((($a) % 4294967296) * $c1 + (($a) // 4294967296) * $c0) % 4294967296) * 4294967296" +
      s" + (($a) % 4294967296) * $c0) % 18446744073709551616"
  }

  /** SplitMix64 finalizer over HUGEINT expression `x` — bit-identical to
    * [[graft.ml.Gsdmm.mix64]] (validated against the Scala values). */
  private def mixSql(x: String): String = {
    val z1 = s"((($x) + 11400714819323198485) % 18446744073709551616)"
    val z2 = mmSql(s"xor($z1, ($z1) >> 30)", BigInt("BF58476D1CE4E5B9", 16))
    val z3 = mmSql(s"xor($z2, ($z2) >> 27)", BigInt("94D049BB133111EB", 16))
    s"xor($z3, ($z3) >> 31)"
  }

  /** The sampling walk `z=0; while (z < k-1 && r > ps(z)) { r -= ps(z);
    * z += 1 }` as one CASE — subtraction chains are textual so the
    * rounding sequence matches the Scala loop exactly. */
  private def pickSql(k: Int): String = {
    var r = "r0"
    val cases = (0 until k - 1).map { z =>
      val c = s"WHEN $r <= ps[${z + 1}] THEN $z"
      r = s"($r - ps[${z + 1}])"
      c
    }
    "CASE " + cases.mkString(" ") + s" ELSE ${k - 1} END"
  }

  /** CTE chain replaying fit + assignment for one corpus window.
    * `docsCte` must provide (doc_id, tk LIST<VARCHAR>); emits CTEs
    * `<p>fin` (final counts), `<p>assign` (doc_id → topic over the FULL
    * window), `<p>top` (top-3 words per topic). */
  private def gsdmmReplaySql(p: String, docsCte: String, k: Int,
      iters: Int, sampleN: Int, seed: Long = 42L): String = {
    val D = "CAST(0.1 AS DOUBLE)"
    val initMix = mixSql(s"CAST($seed AS HUGEINT) + sd.d")
    val drawMix = mixSql(s"CAST($seed AS HUGEINT) + s3.n + s3.step")
    s"""
${p}samp AS (
  SELECT doc_id, tk FROM $docsCte
  ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) ASC,
           doc_id ASC
  LIMIT $sampleN),
${p}sd AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS INT) AS d, tk FROM ${p}samp),
${p}nn AS (SELECT CAST(count(*) AS INT) AS n FROM ${p}sd),
${p}tp AS (SELECT d, CAST(j - 1 AS INT) AS j, tok FROM (
    SELECT d, unnest(tk) AS tok, generate_subscripts(tk, 1) AS j FROM ${p}sd)),
${p}vw AS (SELECT tok, CAST(row_number() OVER (ORDER BY tok) - 1 AS INT) AS w
          FROM (SELECT DISTINCT tok FROM ${p}tp)),
${p}vv AS (SELECT CAST(greatest(count(*), 1) AS INT) AS v FROM ${p}vw),
${p}tw AS (SELECT t.d, t.j, vw.w,
            CAST(row_number() OVER (PARTITION BY t.d, t.tok ORDER BY t.j) - 1 AS INT) AS prior
          FROM ${p}tp t JOIN ${p}vw vw ON vw.tok = t.tok),
${p}dt AS (SELECT d,
            list(struct_pack(w := w, prior := prior, j := j) ORDER BY j) AS toks,
            CAST(count(*) AS INT) AS len
          FROM ${p}tw GROUP BY d),
${p}dv AS (SELECT g.d, list(CAST(coalesce(x.c, 0) AS INT) ORDER BY vw.w) AS dvec FROM
            (SELECT DISTINCT d FROM ${p}sd) g CROSS JOIN ${p}vw vw
            LEFT JOIN (SELECT d, w, count(*) AS c FROM ${p}tw GROUP BY d, w) x
              ON x.d = g.d AND x.w = vw.w
          GROUP BY g.d),
${p}init AS (SELECT sd.d, CAST((($initMix) >> 1) % $k AS INT) AS z FROM ${p}sd sd),
${p}st0 AS (SELECT
   (SELECT list(z ORDER BY d) FROM ${p}init) AS labels,
   (SELECT list(c ORDER BY zz) FROM (
      SELECT zz, CAST(count(i.d) AS INT) AS c
      FROM range(0, $k) t(zz) LEFT JOIN ${p}init i ON i.z = zz GROUP BY zz)) AS mz,
   (SELECT list(c ORDER BY zz) FROM (
      SELECT zz, CAST(coalesce(sum(dt.len), 0) AS INT) AS c
      FROM range(0, $k) t(zz)
      LEFT JOIN ${p}init i ON i.z = zz LEFT JOIN ${p}dt dt ON dt.d = i.d
      GROUP BY zz)) AS nz,
   (SELECT list(c ORDER BY zz, w) FROM (
      SELECT t.zz, vw.w, CAST(coalesce(sum(x.c), 0) AS INT) AS c
      FROM range(0, $k) t(zz) CROSS JOIN ${p}vw vw
      LEFT JOIN (SELECT i.z, tw.w, count(*) AS c
                 FROM ${p}init i JOIN ${p}tw tw ON tw.d = i.d GROUP BY 1, 2) x
        ON x.z = t.zz AND x.w = vw.w
      GROUP BY t.zz, vw.w)) AS nzw),
${p}cst AS (SELECT
  (SELECT list(toks ORDER BY d) FROM ${p}dt) AS toksall,
  (SELECT list(len ORDER BY d) FROM ${p}dt) AS lenall,
  (SELECT list(dvec ORDER BY d) FROM ${p}dv) AS dvall,
  (SELECT n FROM ${p}nn) AS n, (SELECT v FROM ${p}vv) AS v),
${p}g AS (
  SELECT 0 AS step, labels, mz, nz, nzw, toksall, lenall, dvall, n, v
  FROM ${p}st0, ${p}cst
  UNION ALL
  SELECT step + 1,
         [CASE WHEN i = s5.d THEN s5.zn ELSE s5.labels[i+1] END FOR i IN range(0, len(s5.labels))],
         [s5.mzu[i+1] + CASE WHEN i = s5.zn THEN 1 ELSE 0 END FOR i IN range(0, $k)],
         [s5.nzu[i+1] + CASE WHEN i = s5.zn THEN s5.len ELSE 0 END FOR i IN range(0, $k)],
         [s5.nzwu[i+1] + CASE WHEN i // s5.v = s5.zn THEN s5.dvec[(i % s5.v) + 1] ELSE 0 END FOR i IN range(0, $k * s5.v)],
         s5.toksall, s5.lenall, s5.dvall, s5.n, s5.v
  FROM (
    SELECT s4.*, ${pickSql(k)} AS zn
    FROM (
      SELECT s3.*, s3.psx AS ps,
             CAST(($drawMix) >> 11 AS DOUBLE) / 9007199254740992.0
               * list_reduce(s3.psx, (a, x) -> a + x) AS r0
      FROM (
        SELECT s2.*,
          [exp(sc - list_aggregate(s2.scores, 'max')) FOR sc IN s2.scores] AS psx
        FROM (
        SELECT s1b.*,
               [list_reduce(list_prepend(ln(s1b.mzu[z+1] + $D),
                  [ln(s1b.nzwu[z * s1b.v + tk.w + 1] + $D + tk.prior)
                   - ln(s1b.nzu[z+1] + s1b.v * $D + tk.j) FOR tk IN s1b.toks]),
                  (a, x) -> a + x)
                FOR z IN range(0, $k)] AS scores
        FROM (
          SELECT s1.*,
                 [s1.mz[i+1] - CASE WHEN i = s1.zo THEN 1 ELSE 0 END FOR i IN range(0, $k)] AS mzu,
                 [s1.nz[i+1] - CASE WHEN i = s1.zo THEN s1.len ELSE 0 END FOR i IN range(0, $k)] AS nzu,
                 [s1.nzw[i+1] - CASE WHEN i // s1.v = s1.zo THEN s1.dvec[(i % s1.v) + 1] ELSE 0 END FOR i IN range(0, $k * s1.v)] AS nzwu
          FROM (
            SELECT g.*, CAST(g.step % g.n AS INT) AS d,
                   g.labels[CAST(g.step % g.n AS INT) + 1] AS zo,
                   g.toksall[CAST(g.step % g.n AS INT) + 1] AS toks,
                   g.lenall[CAST(g.step % g.n AS INT) + 1] AS len,
                   g.dvall[CAST(g.step % g.n AS INT) + 1] AS dvec
            FROM ${p}g g WHERE g.step < $iters * g.n) s1) s1b) s2) s3) s4) s5),
${p}fin AS (SELECT labels, mz, nz, nzw FROM ${p}g
           WHERE step = $iters * (SELECT n FROM ${p}nn)),
${p}alltok AS (SELECT doc_id, CAST(j - 1 AS INT) AS j, tok FROM (
    SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS j FROM $docsCte)),
${p}alltw AS (SELECT a.doc_id, a.j, CAST(coalesce(vw.w, -1) AS INT) AS w,
               CAST(row_number() OVER (PARTITION BY a.doc_id, a.tok ORDER BY a.j) - 1 AS INT) AS prior
             FROM ${p}alltok a LEFT JOIN ${p}vw vw ON vw.tok = a.tok),
${p}adt AS (SELECT doc_id, list(struct_pack(w := w, prior := prior, j := j) ORDER BY j) AS toks
           FROM ${p}alltw GROUP BY doc_id),
${p}ascore AS (
  SELECT a.doc_id, t.z,
    list_reduce(list_prepend(
      ln(f.mz[t.z + 1] + $D),
      [ln(CASE WHEN tk.w >= 0 THEN f.nzw[t.z * v.v + tk.w + 1] ELSE 0 END + $D + tk.prior)
       - ln(f.nz[t.z + 1] + v.v * $D + tk.j) FOR tk IN a.toks]),
      (a1, x) -> a1 + x) AS s
  FROM ${p}adt a, ${p}fin f, ${p}vv v, range(0, $k) t(z)),
${p}assign AS (SELECT doc_id, CAST(z AS INT) AS topic FROM (
    SELECT doc_id, z, row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, z ASC) AS rn
    FROM ${p}ascore) WHERE rn = 1),
${p}top AS (SELECT CAST(zz AS INT) AS topic,
             coalesce(string_agg(tok, ' ' ORDER BY rn), '') AS top_words
           FROM (
             SELECT zz, tok, c, row_number() OVER (PARTITION BY zz ORDER BY c DESC, tok ASC) AS rn
             FROM (SELECT t.zz, vw.tok, f.nzw[t.zz * v.v + vw.w + 1] AS c
                   FROM range(0, $k) t(zz) CROSS JOIN ${p}vw vw, ${p}fin f, ${p}vv v)
             WHERE c > 0)
           WHERE rn <= 3 GROUP BY zz)"""
  }

  /** The visitor-prediction feature frame (N9; reference
    * visitor_prediction/preprocessing.py:6-95 + predict.py:95-206):
    * daily entries (exact decimal sum), is_closed / limited_entries from
    * the closing/limited timespans, exhibition progress and popularity
    * from the exhibition intervals, weekday index (Monday=0), and MinMax
    * scaling of progress/popularity fitted over the whole frame
    * (train + to-be-predicted rows together, like the reference).
    *
    * The exhibition/closing intervals are a checked-in literal config —
    * the reference's MuseumFacts JSON is likewise a checked-in literal
    * (museum_facts.jsonc). Two exhibitions with a 2-day gap (progress -1,
    * popularity 0 there, exercising the reference's fallback branches),
    * one closing timespan, one limited-entries timespan.
    */
  private def knnFrame(s: SparkSession, dir: String,
      dropLastDays: Int = 0): DataFrame = {
    val ev = t(s, dir, "events")
    val daily0 = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(dsum(col("value")).as("entries"))
    // Sample-prediction variant (predict.py:123-124: `all_entries =
    // all_entries.iloc[:-days_to_predict]`): drop the LAST n observed
    // days (row-based, matching pandas iloc over the one-row-per-day
    // frame) before the span/grid build, so the 14 predicted days
    // overlap held-back actuals. Anti-join against the top-n days — no
    // global window needed.
    val daily =
      if (dropLastDays == 0) daily0
      else daily0.join(
        broadcast(daily0.select("day")
          .orderBy(col("day").desc).limit(dropLastDays)),
        Seq("day"), "left_anti")
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    // Day grid = observed days + 14 days to predict, appended BEFORE
    // feature building so everything is preprocessed together
    // (predict.py:130-141).
    val grid = span.select(
      explode(sequence(col("d0"), date_add(col("d1"), 14))).as("day"))
    val day = col("day")
    def in(a: String, b: String) =
      day.between(lit(a).cast("date"), lit(b).cast("date"))
    val progress =
      when(in("2024-01-01", "2024-01-18"),
        datediff(day, lit("2024-01-01").cast("date")).cast("double") / 17.0)
      .when(in("2024-01-21", "2024-02-13"),
        datediff(day, lit("2024-01-21").cast("date")).cast("double") / 23.0)
      .otherwise(-1.0) // uncovered day → -1 (preprocessing.py:64-73)
    val popularity =
      when(in("2024-01-01", "2024-01-18"), 120.0)
      .when(in("2024-01-21", "2024-02-13"), 80.0)
      .otherwise(0.0)
    val f1 = grid.join(daily, Seq("day"), "left")
      .withColumn("is_closed", when(in("2024-01-08", "2024-01-09"), 1).otherwise(0))
      .withColumn("limited_entries", when(in("2024-01-15", "2024-01-17"), 1).otherwise(0))
      .withColumn("progress", progress)
      .withColumn("popularity", popularity)
      // Python weekday(): Monday=0; Spark dayofweek: Sunday=1.
      .withColumn("wd", ((dayofweek(day) + lit(5)) % 7).cast("int"))
    val scalers = f1.agg(
      min(col("progress")).as("pmin"), max(col("progress")).as("pmax"),
      min(col("popularity")).as("qmin"), max(col("popularity")).as("qmax"))
    f1.crossJoin(broadcast(scalers))
      .withColumn("progress_s",
        (col("progress") - col("pmin")) / (col("pmax") - col("pmin")))
      .withColumn("popularity_s",
        (col("popularity") - col("qmin")) / (col("qmax") - col("qmin")))
      .drop("pmin", "pmax", "qmin", "qmax", "progress", "popularity")
  }

  /** Prefixed CTE chain `<p>daily0 … <p>frame` — the DuckDB face of
    * [[knnFrame]] with the same literal interval predicates and the
    * optional row-based drop of the last `dropLast` observed days
    * (the sample-prediction variant, predict.py:123-124). ONE generator
    * feeds ml_knn_features, ml_knn_forecast and both ml_knn_combined
    * variants, so the faces cannot drift. */
  private def knnFrameCtes(p: String, dropLast: Int): String = {
    val dailySel =
      if (dropLast == 0) s"SELECT * FROM ${p}daily0"
      else s"""SELECT * FROM ${p}daily0 WHERE day NOT IN
            (SELECT day FROM ${p}daily0 ORDER BY day DESC LIMIT $dropLast)"""
    s"""${p}daily0 AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS entries
      FROM events GROUP BY 1),
    ${p}daily AS ($dailySel),
    ${p}span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ${p}daily),
    ${p}grid AS (
      SELECT CAST(unnest(generate_series(d0, d1 + INTERVAL 14 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM ${p}span),
    ${p}f1 AS (
      SELECT g.day, d.entries,
        CASE WHEN g.day BETWEEN DATE '2024-01-08' AND DATE '2024-01-09'
             THEN 1 ELSE 0 END AS is_closed,
        CASE WHEN g.day BETWEEN DATE '2024-01-15' AND DATE '2024-01-17'
             THEN 1 ELSE 0 END AS limited_entries,
        CASE WHEN g.day BETWEEN DATE '2024-01-01' AND DATE '2024-01-18'
             THEN CAST(datediff('day', DATE '2024-01-01', g.day) AS DOUBLE) / 17.0
             WHEN g.day BETWEEN DATE '2024-01-21' AND DATE '2024-02-13'
             THEN CAST(datediff('day', DATE '2024-01-21', g.day) AS DOUBLE) / 23.0
             ELSE -1.0 END AS progress,
        CASE WHEN g.day BETWEEN DATE '2024-01-01' AND DATE '2024-01-18' THEN 120.0
             WHEN g.day BETWEEN DATE '2024-01-21' AND DATE '2024-02-13' THEN 80.0
             ELSE 0.0 END AS popularity,
        CAST(isodow(g.day) - 1 AS INT) AS wd
      FROM ${p}grid g LEFT JOIN ${p}daily d ON d.day = g.day),
    ${p}sc AS (SELECT min(progress) AS pmin, max(progress) AS pmax,
                  min(popularity) AS qmin, max(popularity) AS qmax
               FROM ${p}f1),
    ${p}frame AS (
      SELECT f1.day, f1.entries, f1.is_closed, f1.limited_entries, f1.wd,
             (progress - pmin) / (pmax - pmin) AS progress_s,
             (popularity - qmin) / (qmax - qmin) AS popularity_s
      FROM ${p}f1 f1 CROSS JOIN ${p}sc)"""
  }

  /** Prefixed CTE chain `<p>train … <p>out` — the DuckDB face of
    * [[knnForecast]] over `<p>frame`; `<p>out` yields (day, predicted). */
  private def knnForecastCtes(p: String): String = s"""
    ${p}train AS (SELECT * FROM ${p}frame WHERE entries IS NOT NULL),
    ${p}predict AS (SELECT * FROM ${p}frame WHERE entries IS NULL),
    ${p}pairs AS (
      SELECT p.day AS pday, p.is_closed, p.wd, t.day AS tday, t.entries,
        CAST(p.is_closed - t.is_closed AS DOUBLE) * CAST(p.is_closed - t.is_closed AS DOUBLE)
        + CAST(p.limited_entries - t.limited_entries AS DOUBLE) * CAST(p.limited_entries - t.limited_entries AS DOUBLE)
        + (p.progress_s - t.progress_s) * (p.progress_s - t.progress_s)
        + (p.popularity_s - t.popularity_s) * (p.popularity_s - t.popularity_s)
        + CASE WHEN p.wd = t.wd THEN 0.0 ELSE 2.0 END AS dist2
      FROM ${p}predict p CROSS JOIN ${p}train t),
    ${p}ranked AS (
      SELECT *, row_number() OVER (PARTITION BY pday
                                   ORDER BY dist2 ASC, tday ASC) AS rn
      FROM ${p}pairs),
    ${p}avg5 AS (
      SELECT pday, any_value(is_closed) AS is_closed, any_value(wd) AS wd,
             CAST(sum(CAST(round(entries * 100) AS BIGINT)) AS DOUBLE)
               / 500.0 AS knn_pred
      FROM ${p}ranked WHERE rn <= 5 GROUP BY pday),
    ${p}minv AS (SELECT min(entries) AS min_e FROM ${p}train),
    ${p}out AS (
      SELECT strftime(pday, '%Y-%m-%d') AS day,
             CAST(floor(CASE WHEN is_closed = 1 OR wd = 1 THEN min_e
                             ELSE knn_pred END) AS BIGINT) AS predicted
      FROM ${p}avg5 CROSS JOIN ${p}minv)"""

  /** Literal interval predicates shared by every oracle below. */
  private val knnOracleFrame = "\n    WITH " + knnFrameCtes("", 0) + "\n  "

  /** KNN-5 visitor forecast over a [[knnFrame]]-shaped frame (N9;
    * reference predict.py:95-206): train = rows with observed entries,
    * predict = null-entry rows; exact integer-cents 5-NN mean with the
    * closed-day/Monday min-fallback. Returns (day string, predicted) —
    * shared by `ml_knn_forecast` and the two-variant `ml_knn_combined`. */
  private def knnForecast(frame: DataFrame): DataFrame = {
    val train = frame.filter(col("entries").isNotNull).select(
      col("day").as("tday"), col("entries"),
      col("is_closed").as("t_ic"), col("limited_entries").as("t_le"),
      col("progress_s").as("t_pr"), col("popularity_s").as("t_po"),
      col("wd").as("t_wd"))
    val predict = frame.filter(col("entries").isNull)
      .drop("entries")
    val dIc = (col("is_closed") - col("t_ic")).cast("double")
    val dLe = (col("limited_entries") - col("t_le")).cast("double")
    val dPr = col("progress_s") - col("t_pr")
    val dPo = col("popularity_s") - col("t_po")
    // One-hot weekday distance: 0 if same weekday else 2 (exact).
    val dWd = when(col("wd") === col("t_wd"), 0.0).otherwise(2.0)
    val dist2 = dIc * dIc + dLe * dLe + dPr * dPr + dPo * dPo + dWd
    val w = Window.partitionBy("pday")
      .orderBy(col("dist2").asc, col("tday").asc)
    val top5 = predict.select(col("day").as("pday"), col("is_closed"),
        col("limited_entries"), col("progress_s"), col("popularity_s"),
        col("wd"))
      .join(broadcast(train))
      .withColumn("dist2", dist2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
    // Exact mean of 5 raw entries: integer-cents sum (always 5 rows
    // per group — no overflow headroom needed) / 500.0 as ONE double
    // division, identical on the oracle side.
    val knnPred = top5
      .groupBy("pday", "is_closed", "wd")
      .agg((sum(round(col("entries") * 100).cast("long")).cast("double")
        / lit(500.0)).as("knn_pred"))
    val minTrain = frame.filter(col("entries").isNotNull)
      .agg(min(col("entries")).as("min_e"))
    knnPred.crossJoin(broadcast(minTrain))
      .select(
        date_format(col("pday"), "yyyy-MM-dd").as("day"),
        floor(when(col("is_closed") === 1 || col("wd") === 1, col("min_e"))
          .otherwise(col("knn_pred"))).cast("long").as("predicted"))
  }

  /** Jaccard link prediction over the customer–part bipartite graph —
    * the classic common-neighbors recommender signal (Liben-Nowell &
    * Kleinberg 2003): two customers are candidate links when they bought
    * the same part, scored by Jaccard over their FULL part
    * neighborhoods.
    *
    * Scale shape: candidate generation AND common-neighbor counting are
    * one per-part capped self-join (32 customers per part, deterministic
    * order) → one (a,b) aggregate — pair volume is cap²-bounded per
    * part, linear in parts. `n_common` therefore counts shared parts
    * among capped postings (the standard blocking estimate, replayed by
    * the oracle; a lower bound that is exact wherever the cap does not
    * bind); degrees are exact full-neighborhood counts. An earlier form
    * re-joined candidates against full edge lists for exact
    * intersections — candidates × degree rows exploded to ~350M at
    * sf0.1 (40 s); the capped count is the scalable shape. */
  private val linkPredictionQ = Q(
    "ml_link_prediction",
    (s, dir) => {
      // Persisted: deg, capped(x) and capped(y) each consume this frame
      // — unpersisted, the orders⋈lineitem→distinct pipeline planned
      // once per consumer (deg's c-exchange and capped's p-exchange key
      // differently, so exchange reuse cannot dedupe them; measured A/B
      // at sf0.1: persist 2.74 s vs stage-reuse-only 3.11 s warm).
      // Tracked in CacheLedger; drivers release it per query.
      val edges = graft.core.CacheLedger.track(
        t(s, dir, "orders").select("o_orderkey", "o_custkey")
          .join(t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val deg = edges.groupBy("c").agg(count(lit(1)).as("d"))
      // Fused per-part posting cap + pair enumeration (r15, see
      // dedup_audio_fingerprint): the 32 smallest custkeys per part
      // (total order ⇒ same selection as the old TopK.perKey) emit
      // their upper triangle straight from the merged heaps — one
      // exchange, no join, no broadcast.
      val inter = graft.plans.TopK.pairsPerKey(edges, Seq("p"),
          Seq(("c", true)), Seq("c"), 32)
        .select(col("x_c").as("a"), col("y_c").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
      inter
        .join(deg.select(col("c").as("a"), col("d").as("da")), Seq("a"))
        .join(deg.select(col("c").as("b"), col("d").as("db")), Seq("b"))
        .withColumn("jaccard", round(col("n_common").cast("double") /
          (col("da") + col("db") - col("n_common")).cast("double"), 6))
        .select("a", "b", "n_common", "jaccard")
        .orderBy(col("jaccard").desc, col("n_common").desc, col("a"), col("b"))
        .limit(25)
    },
    Some("""
      WITH edges AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      deg AS (SELECT c, count(*) AS d FROM edges GROUP BY c),
      capped AS (
        SELECT p, c FROM (
          SELECT p, c, row_number() OVER (PARTITION BY p ORDER BY c) AS rk
          FROM edges)
        WHERE rk <= 32),
      inter AS (
        SELECT x.c AS a, y.c AS b, count(*) AS n_common
        FROM capped x JOIN capped y ON x.p = y.p AND x.c < y.c
        GROUP BY x.c, y.c)
      SELECT i.a, i.b, i.n_common,
             round(CAST(i.n_common AS DOUBLE) /
                   (da.d + db.d - i.n_common), 6) AS jaccard
      FROM inter i
      JOIN deg da ON da.c = i.a
      JOIN deg db ON db.c = i.b
      ORDER BY jaccard DESC, n_common DESC, a, b LIMIT 25"""),
    doc = "Jaccard link prediction: per-part capped blocking joins count " +
      "shared parts in one cap-bounded aggregate (exact full degrees); " +
      "Liben-Nowell & Kleinberg common-neighbors family")

  /** Multinomial Naive Bayes train + classify, fully distributed: the
    * model is two bounded aggregates (per-(class, word) counts and class
    * totals over the TRAIN half), broadcast against the TEST half —
    * fitting never collects, classification is one broadcast join + one
    * doc-keyed aggregate, the textbook NB-at-scale shape.
    *
    * Determinism: per-term log-likelihoods `ln((cnt+1)/(tot+V))`
    * (Laplace α=1) are QUANTIZED to integer micro-units
    * (`round(ln·1e6)`) before summing, so per-doc scores are exact
    * integer sums — shuffle-order-independent and argmax-stable (the
    * same integer-micro-unit discipline as ml_pagerank). Target label:
    * whether the document contains the token "join" — derivable, so the
    * oracle can recompute it, and learnable, so accuracy is meaningful
    * (the target word itself remains a feature; this demonstrates the
    * estimator, not a modeling best practice). Even doc_ids train, odd
    * classify. */
  private val naiveBayesQ = Q(
    "ml_naive_bayes",
    (s, dir) => {
      val d = th(s, dir, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("tk"))
        .withColumn("label",
          when(array_contains(col("tk"), "join"), 1).otherwise(0))
      val train = d.filter(col("doc_id") % 2 === 0)
      val test = d.filter(col("doc_id") % 2 =!= 0)
      val tw = train.select(col("label"), explode(col("tk")).as("w"))
      val wc = tw.groupBy("w").agg(
        count(when(col("label") === 0, 1)).as("c0"),
        count(when(col("label") === 1, 1)).as("c1"))
      val stats = tw.agg(
        count(when(col("label") === 0, 1)).as("tot0"),
        count(when(col("label") === 1, 1)).as("tot1"),
        countDistinct(col("w")).as("v"))
      val nDocs = train.agg(
        count(when(col("label") === 0, 1)).as("nd0"),
        count(when(col("label") === 1, 1)).as("nd1"))
      def termMicro(cnt: org.apache.spark.sql.Column,
          tot: org.apache.spark.sql.Column) =
        round(log((cnt + 1).cast("double") /
          (tot + col("v")).cast("double")) * 1e6).cast("long")
      val scoredTerms = test.select(col("doc_id"), col("label"),
          explode(col("tk")).as("w"))
        .join(broadcast(wc), Seq("w"), "left")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("label"),
          termMicro(coalesce(col("c0"), lit(0L)), col("tot0")).as("t0"),
          termMicro(coalesce(col("c1"), lit(0L)), col("tot1")).as("t1"))
      val priors = nDocs.select(
        round(log(col("nd0").cast("double") /
          (col("nd0") + col("nd1")).cast("double")) * 1e6).cast("long").as("p0"),
        round(log(col("nd1").cast("double") /
          (col("nd0") + col("nd1")).cast("double")) * 1e6).cast("long").as("p1"))
      scoredTerms.groupBy("doc_id", "label")
        .agg(sum(col("t0")).as("s0"), sum(col("t1")).as("s1"))
        .crossJoin(broadcast(priors))
        .withColumn("pred",
          when(col("p1") + col("s1") > col("p0") + col("s0"), 1).otherwise(0))
        .groupBy("label", "pred")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("label", "pred")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, string_split(lower(text), ' ') AS tk,
               CASE WHEN list_contains(string_split(lower(text), ' '), 'join')
                    THEN 1 ELSE 0 END AS label
        FROM documents),
      train AS (SELECT * FROM d WHERE doc_id % 2 = 0),
      test AS (SELECT * FROM d WHERE doc_id % 2 <> 0),
      tw AS (SELECT label, unnest(tk) AS w FROM train),
      wc AS (
        SELECT w, count(*) FILTER (label = 0) AS c0,
               count(*) FILTER (label = 1) AS c1
        FROM tw GROUP BY w),
      stats AS (
        SELECT CAST(count(*) FILTER (label = 0) AS BIGINT) AS tot0,
               CAST(count(*) FILTER (label = 1) AS BIGINT) AS tot1,
               CAST(count(DISTINCT w) AS BIGINT) AS v
        FROM tw),
      nd AS (
        SELECT CAST(count(*) FILTER (label = 0) AS BIGINT) AS nd0,
               CAST(count(*) FILTER (label = 1) AS BIGINT) AS nd1
        FROM train),
      priors AS (
        SELECT CAST(round(ln(CAST(nd0 AS DOUBLE) / (nd0 + nd1)) * 1e6)
                 AS BIGINT) AS p0,
               CAST(round(ln(CAST(nd1 AS DOUBLE) / (nd0 + nd1)) * 1e6)
                 AS BIGINT) AS p1
        FROM nd),
      terms AS (
        SELECT t.doc_id, t.label,
               CAST(round(ln(CAST(coalesce(wc.c0, 0) + 1 AS DOUBLE) /
                 (stats.tot0 + stats.v)) * 1e6) AS BIGINT) AS t0,
               CAST(round(ln(CAST(coalesce(wc.c1, 0) + 1 AS DOUBLE) /
                 (stats.tot1 + stats.v)) * 1e6) AS BIGINT) AS t1
        FROM (SELECT doc_id, label, unnest(tk) AS w FROM test) t
        LEFT JOIN wc ON wc.w = t.w
        CROSS JOIN stats),
      scored AS (
        SELECT doc_id, label, CAST(sum(t0) AS BIGINT) AS s0,
               CAST(sum(t1) AS BIGINT) AS s1
        FROM terms GROUP BY doc_id, label)
      SELECT label,
             CASE WHEN p1 + s1 > p0 + s0 THEN 1 ELSE 0 END AS pred,
             count(*) AS n_docs
      FROM scored CROSS JOIN priors
      GROUP BY 1, 2 ORDER BY label, pred"""),
    doc = "multinomial Naive Bayes (Laplace a=1): bounded broadcast " +
      "model, integer micro-unit log-likelihood sums (order-independent " +
      "argmax), confusion-matrix rollup; train/test by doc parity")

  /** Logistic regression via full-batch gradient descent, 3 unrolled
    * rounds — the convex companion to [[naiveBayesQ]]: each round is ONE
    * aggregate of per-row gradient contributions (map-side partial, 5
    * longs of state) plus a driver-side 5-value weight update — the
    * k-means discipline (bounded driver state, zero data collect).
    *
    * Determinism: weights live in integer MICRO-units; each row's
    * gradient term `(σ(w·x) − y)·x_j` is quantized to micro before the
    * sum, so round aggregates are exact integer sums and the whole
    * trajectory is shuffle-order-independent. Features: bias, words/100,
    * avg word length, distinct-token ratio — all scaled to ≲1 so full-batch GD is stable — and a ±1 target indicator
    * (the separating direction GD must find — the estimator demo, not a
    * modeling recipe); target = document mentions "slow"; lr = 2. */
  private val logRegQ = Q(
    "ml_logreg_gd",
    (s, dir) => {
      val d = th(s, dir, "documents")
        .withColumn("tk", split(lower(col("text")), " "))
        .withColumn("n", size(col("tk")).cast("double"))
        .withColumn("x1", col("n") / 1000d)
        .withColumn("x2", expr(
          "aggregate(tk, 0L, (a, x) -> a + length(x))").cast("double") /
          (col("n") * 10d))
        .withColumn("x3", size(array_distinct(col("tk"))).cast("double") /
          col("n"))
        .withColumn("y",
          when(array_contains(col("tk"), "slow"), 1d).otherwise(0d))
        .withColumn("x4", when(col("y") === 1d, 1d).otherwise(-1d))
        .select(col("doc_id"), col("y"), col("x1"), col("x2"), col("x3"),
          col("x4"))
      val nDocs = d.count()
      val lr = 2d
      var w = Array(0L, 0L, 0L, 0L, 0L) // micro-units
      def z = lit(w(0) / 1e6) + lit(w(1) / 1e6) * col("x1") +
        lit(w(2) / 1e6) * col("x2") + lit(w(3) / 1e6) * col("x3") +
        lit(w(4) / 1e6) * col("x4")
      def sigma = lit(1d) / (lit(1d) + exp(-z))
      for (_ <- 1 to 3) {
        val err = sigma - col("y")
        val g = d.agg(
          sum(round(err * 1e6).cast("long")).as("g0"),
          sum(round(err * col("x1") * 1e6).cast("long")).as("g1"),
          sum(round(err * col("x2") * 1e6).cast("long")).as("g2"),
          sum(round(err * col("x3") * 1e6).cast("long")).as("g3"),
          sum(round(err * col("x4") * 1e6).cast("long")).as("g4")).head()
        w = w.zipWithIndex.map { case (wj, j) =>
          // Half-away-from-zero to match DuckDB round() and Spark round
          // (scala math.round is half-toward-+inf, which would diverge on
          // an exact negative .5 step).
          val step = lr * g.getLong(j).toDouble / nDocs
          wj - math.signum(step).toLong * math.round(math.abs(step))
        }
      }
      d.withColumn("pred", when(sigma >= 0.5, 1d).otherwise(0d))
        .groupBy(col("y").cast("int").as("label"),
          col("pred").cast("int").as("pred"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("w_micro", lit(w.mkString(",")))
        .orderBy("label", "pred")
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
               CASE WHEN list_contains(tk, 'slow') THEN 1.0 ELSE 0.0 END AS y,
               CAST(len(tk) AS DOUBLE) / 1000 AS x1,
               CAST(list_aggregate(list_transform(tk, x -> length(x)), 'sum')
                 AS DOUBLE) / (len(tk) * 10) AS x2,
               CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS x3,
               CASE WHEN list_contains(tk, 'slow') THEN 1.0 ELSE -1.0 END
                 AS x4
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
              FROM documents)),
      n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d),
      gr1 AS (
        SELECT CAST(sum(CAST(round((0.5 - y) * 1e6) AS BIGINT)) AS BIGINT) AS g0,
               CAST(sum(CAST(round((0.5 - y) * x1 * 1e6) AS BIGINT)) AS BIGINT) AS g1,
               CAST(sum(CAST(round((0.5 - y) * x2 * 1e6) AS BIGINT)) AS BIGINT) AS g2,
               CAST(sum(CAST(round((0.5 - y) * x3 * 1e6) AS BIGINT)) AS BIGINT) AS g3,
               CAST(sum(CAST(round((0.5 - y) * x4 * 1e6) AS BIGINT)) AS BIGINT) AS g4
        FROM d),
      w1 AS (
        SELECT 0 - CAST(round(2.0 * g0 / nd) AS BIGINT) AS w0,
               0 - CAST(round(2.0 * g1 / nd) AS BIGINT) AS w1,
               0 - CAST(round(2.0 * g2 / nd) AS BIGINT) AS w2,
               0 - CAST(round(2.0 * g3 / nd) AS BIGINT) AS w3,
               0 - CAST(round(2.0 * g4 / nd) AS BIGINT) AS w4
        FROM gr1, n),
      gr2 AS (
        SELECT CAST(sum(CAST(round((1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2 + w3/1e6*x3 + w4/1e6*x4))) - y) * 1e6) AS BIGINT)) AS BIGINT) AS g0,
               CAST(sum(CAST(round((1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2 + w3/1e6*x3 + w4/1e6*x4))) - y) * x1 * 1e6) AS BIGINT)) AS BIGINT) AS g1,
               CAST(sum(CAST(round((1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2 + w3/1e6*x3 + w4/1e6*x4))) - y) * x2 * 1e6) AS BIGINT)) AS BIGINT) AS g2,
               CAST(sum(CAST(round((1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2 + w3/1e6*x3 + w4/1e6*x4))) - y) * x3 * 1e6) AS BIGINT)) AS BIGINT) AS g3,
               CAST(sum(CAST(round((1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2 + w3/1e6*x3 + w4/1e6*x4))) - y) * x4 * 1e6) AS BIGINT)) AS BIGINT) AS g4
        FROM d, w1),
      w2 AS (
        SELECT w1.w0 - CAST(round(2.0 * gr2.g0 / nd) AS BIGINT) AS w0,
               w1.w1 - CAST(round(2.0 * gr2.g1 / nd) AS BIGINT) AS w1,
               w1.w2 - CAST(round(2.0 * gr2.g2 / nd) AS BIGINT) AS w2,
               w1.w3 - CAST(round(2.0 * gr2.g3 / nd) AS BIGINT) AS w3,
               w1.w4 - CAST(round(2.0 * gr2.g4 / nd) AS BIGINT) AS w4
        FROM gr2, w1, n),
      gr3 AS (
        SELECT CAST(sum(CAST(round((1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2 + w3/1e6*x3 + w4/1e6*x4))) - y) * 1e6) AS BIGINT)) AS BIGINT) AS g0,
               CAST(sum(CAST(round((1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2 + w3/1e6*x3 + w4/1e6*x4))) - y) * x1 * 1e6) AS BIGINT)) AS BIGINT) AS g1,
               CAST(sum(CAST(round((1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2 + w3/1e6*x3 + w4/1e6*x4))) - y) * x2 * 1e6) AS BIGINT)) AS BIGINT) AS g2,
               CAST(sum(CAST(round((1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2 + w3/1e6*x3 + w4/1e6*x4))) - y) * x3 * 1e6) AS BIGINT)) AS BIGINT) AS g3,
               CAST(sum(CAST(round((1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2 + w3/1e6*x3 + w4/1e6*x4))) - y) * x4 * 1e6) AS BIGINT)) AS BIGINT) AS g4
        FROM d, w2),
      w3 AS (
        SELECT w2.w0 - CAST(round(2.0 * gr3.g0 / nd) AS BIGINT) AS w0,
               w2.w1 - CAST(round(2.0 * gr3.g1 / nd) AS BIGINT) AS w1,
               w2.w2 - CAST(round(2.0 * gr3.g2 / nd) AS BIGINT) AS w2,
               w2.w3 - CAST(round(2.0 * gr3.g3 / nd) AS BIGINT) AS w3,
               w2.w4 - CAST(round(2.0 * gr3.g4 / nd) AS BIGINT) AS w4
        FROM gr3, w2, n)
      SELECT CAST(y AS INT) AS label,
             CAST(CASE WHEN 1/(1+exp(-(w0/1e6 + w1/1e6*x1 + w2/1e6*x2
               + w3/1e6*x3 + w4/1e6*x4))) >= 0.5 THEN 1 ELSE 0 END AS INT)
               AS pred,
             count(*) AS n_docs,
             any_value(concat(CAST(w0 AS VARCHAR), ',', CAST(w1 AS VARCHAR),
               ',', CAST(w2 AS VARCHAR), ',', CAST(w3 AS VARCHAR), ',',
               CAST(w4 AS VARCHAR))) AS w_micro
      FROM d, w3
      GROUP BY 1, 2 ORDER BY label, pred"""),
    doc = "logistic regression, 3 full-batch GD rounds (lr=2): one 5-long " +
      "gradient aggregate per round + driver weight update (k-means " +
      "discipline); integer micro-unit quantization keeps the whole " +
      "trajectory order-independent; oracle unrolls the rounds in SQL")

  /** Decision stump via distributed HISTOGRAM split search — the GBDT
    * building block (LightGBM's histogram trick, Ke et al. 2017): the
    * only corpus pass builds per-(feature, bin) count/positive
    * histograms as one tiny partial-aggregated shuffle (F×B ≤ 96 groups
    * at ANY corpus size); every candidate split's left/right stats then
    * come from a cumulative window over the histogram — O(F×B) post-agg
    * work, no re-scan per threshold, no driver fit. Features and label
    * mirror [[logRegQ]] (same frame, tree vs logistic on identical
    * inputs); candidate thresholds are the occupied bin boundaries
    * t = (bin+1)/32 with STRICT `x < t` splits, so the histogram
    * assignment `floor(x·32)` is exact at boundaries. Best split per
    * feature = weighted-Gini argmin, ties to the smaller threshold —
    * selected with the repo's own TopKPerKey operator (k=1). */
  private val stumpQ = Q(
    "ml_decision_stump",
    (s, dir) => {
      val d = th(s, dir, "documents")
        .withColumn("tk", split(lower(col("text")), " "))
        .withColumn("n", size(col("tk")).cast("double"))
        .withColumn("x1", col("n") / 1000d)
        .withColumn("x2", expr(
          "aggregate(tk, 0L, (a, x) -> a + length(x))").cast("double") /
          (col("n") * 10d))
        .withColumn("x3", size(array_distinct(col("tk"))).cast("double") /
          col("n"))
        .withColumn("y",
          when(array_contains(col("tk"), "slow"), 1L).otherwise(0L))
      val f = d.select(col("y"),
        posexplode(array(col("x1"), col("x2"), col("x3")))
          .as(Seq("fidx", "x")))
      val hist = f
        .withColumn("bin", least(lit(31), floor(col("x") * 32).cast("int")))
        .groupBy("fidx", "bin")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val w = Window.partitionBy("fidx").orderBy("bin")
      val tot = Window.partitionBy("fidx")
      def imp(n: org.apache.spark.sql.Column,
          p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(n === 0, 0d).otherwise(
          lit(1d) - (p.cast("double") / n.cast("double")) *
            (p.cast("double") / n.cast("double")) -
            ((n - p).cast("double") / n.cast("double")) *
            ((n - p).cast("double") / n.cast("double")))
      val splits = hist
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("cp", sum(col("pos")).over(w))
        .withColumn("tn", sum(col("n")).over(tot))
        .withColumn("tp", sum(col("pos")).over(tot))
        .filter(col("bin") <= 30)
        .select(col("fidx"),
          ((col("bin") + 1).cast("double") / 32d).as("t"),
          col("cn").as("nl"), col("cp").as("pl"),
          (col("tn") - col("cn")).as("nr"), (col("tp") - col("cp")).as("pr"),
          col("tn"))
        .withColumn("gini",
          (col("nl").cast("double") * imp(col("nl"), col("pl")) +
            col("nr").cast("double") * imp(col("nr"), col("pr"))) /
            col("tn").cast("double"))
      graft.plans.TopK.perKey(splits, Seq("fidx"),
          Seq(("gini", true), ("t", true)), 1)
        .select(col("fidx").cast("int").as("fidx"),
          element_at(array(lit("ntok_k"), lit("avg_len"), lit("uniq_ratio")),
            col("fidx").cast("int") + 1).as("feature"),
          round(col("t"), 6).as("t"),
          round(col("gini"), 6).as("gini"),
          col("nl"), col("pl"), col("nr"), col("pr"))
        .orderBy("fidx")
    },
    Some("""
      WITH d AS (
        SELECT CASE WHEN list_contains(tk, 'slow') THEN 1 ELSE 0 END AS y,
               CAST(len(tk) AS DOUBLE) / 1000 AS x1,
               CAST(list_aggregate(list_transform(tk, x -> length(x)), 'sum')
                 AS DOUBLE) / (len(tk) * 10) AS x2,
               CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS x3
        FROM (SELECT string_split(lower(text), ' ') AS tk FROM documents)),
      f AS (
        SELECT y, 0 AS fidx, x1 AS x FROM d
        UNION ALL SELECT y, 1, x2 FROM d
        UNION ALL SELECT y, 2, x3 FROM d),
      hist AS (
        SELECT fidx, least(31, CAST(floor(x * 32) AS INT)) AS bin,
               count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
        FROM f GROUP BY 1, 2),
      splits AS (
        SELECT fidx, CAST(bin + 1 AS DOUBLE) / 32 AS t,
               CAST(sum(n) OVER (PARTITION BY fidx ORDER BY bin) AS BIGINT) AS nl,
               CAST(sum(pos) OVER (PARTITION BY fidx ORDER BY bin) AS BIGINT) AS pl,
               CAST(sum(n) OVER (PARTITION BY fidx) AS BIGINT) AS tn,
               CAST(sum(pos) OVER (PARTITION BY fidx) AS BIGINT) AS tp
        FROM hist QUALIFY bin <= 30),
      scored AS (
        SELECT fidx, t, nl, pl, tn - nl AS nr, tp - pl AS pr,
               (CAST(nl AS DOUBLE) *
                  (CASE WHEN nl = 0 THEN 0 ELSE
                    1 - (CAST(pl AS DOUBLE)/nl)*(CAST(pl AS DOUBLE)/nl)
                      - (CAST(nl - pl AS DOUBLE)/nl)*(CAST(nl - pl AS DOUBLE)/nl) END)
                + CAST(tn - nl AS DOUBLE) *
                  (CASE WHEN tn - nl = 0 THEN 0 ELSE
                    1 - (CAST(tp - pl AS DOUBLE)/(tn - nl))*(CAST(tp - pl AS DOUBLE)/(tn - nl))
                      - (CAST((tn - nl) - (tp - pl) AS DOUBLE)/(tn - nl))*(CAST((tn - nl) - (tp - pl) AS DOUBLE)/(tn - nl)) END))
               / CAST(tn AS DOUBLE) AS gini
        FROM splits)
      SELECT fidx, ['ntok_k', 'avg_len', 'uniq_ratio'][fidx + 1] AS feature,
             round(t, 6) AS t, round(gini, 6) AS gini,
             CAST(nl AS BIGINT) AS nl, pl,
             CAST(nr AS BIGINT) AS nr, pr
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY fidx ORDER BY gini, t) = 1
      ORDER BY fidx"""),
    doc = "decision stump via the LightGBM histogram trick: one F×B " +
      "histogram shuffle (96 groups at any scale), cumulative-window " +
      "split stats, weighted-Gini argmin per feature through TopKPerKey")

  /** Top principal direction of the embedding matrix via POWER
    * ITERATION (the classic distributed PCA/SVD first factor, e.g.
    * Halko et al. 2011's baseline): per round ONE aggregate computes
    * w = Σ_docs (aᵀv)·a (64 longs — every per-doc contribution
    * micro-quantized BEFORE the sum, so the reduction is
    * order-independent, the [[logRegQ]] discipline), the driver
    * normalizes the 64-vector (bounded state), and the next round's v
    * ships back as literals. Two rounds unrolled; the oracle replays
    * the identical trajectory in SQL via list comprehensions. σ =
    * ‖w‖ / 1e6 after the last round estimates the top singular value of
    * AᵀA's action. Scale shape: O(corpus × dim) map work per round, a
    * 64-long aggregate as the only shuffle, driver state 64 longs. */
  private val svdPowerQ = Q(
    "ml_svd_power",
    (s, dir) => {
      val e = th(s, dir, "embeddings").select(col("embedding"))
      def roundAway(x: Double): Long =
        (math.signum(x) * math.round(math.abs(x))).toLong
      var vm: Array[Long] = Array.fill(64)(125000L) // 1/8 in micro-units
      var sigmaMicro = 0L
      for (_ <- 1 to 2) {
        val dot = (0 until 64).map(j =>
          element_at(col("embedding"), j + 1).cast("double") *
            lit(vm(j) / 1e6)).reduce(_ + _)
        val aggs = (0 until 64).map(j =>
          sum(round(col("__dot") *
            element_at(col("embedding"), j + 1).cast("double") * 1e6)
            .cast("long")).as(s"w$j"))
        val row = e.withColumn("__dot", dot)
          .agg(aggs.head, aggs.tail: _*).head()
        val wq = (0 until 64).map(row.getLong).toArray
        val nrm = math.sqrt(wq.map(x => x.toDouble * x.toDouble).sum)
        vm = wq.map(x => roundAway(x / nrm * 1e6))
        sigmaMicro = roundAway(nrm)
      }
      s.range(64).select(col("id").cast("int").as("dim"),
        element_at(array(vm.map(lit(_)): _*),
          col("id").cast("int") + 1).as("v_micro"),
        lit(sigmaMicro).as("sigma_micro"))
        .orderBy("dim")
    },
    Some("""
      WITH e AS (
        SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS a FROM embeddings),
      js AS (SELECT unnest(range(1, 65)) AS j),
      d1 AS (
        SELECT a, list_sum([a[j] * 0.125 FOR j IN range(1, 65)]) AS dot
        FROM e),
      w1 AS (
        SELECT j, CAST(sum(round(dot * a[j] * 1e6)) AS BIGINT) AS wq
        FROM d1, js GROUP BY j),
      n1 AS (
        SELECT sqrt(sum(CAST(wq AS DOUBLE) * CAST(wq AS DOUBLE))) AS nrm
        FROM w1),
      v1 AS (
        SELECT list(CAST(round(wq / nrm * 1e6) AS BIGINT) ORDER BY j) AS vm
        FROM w1, n1),
      d2 AS (
        SELECT a, list_sum([a[j] * (vm[j] / 1e6) FOR j IN range(1, 65)])
          AS dot
        FROM e, v1),
      w2 AS (
        SELECT j, CAST(sum(round(dot * a[j] * 1e6)) AS BIGINT) AS wq
        FROM d2, js GROUP BY j),
      n2 AS (
        SELECT sqrt(sum(CAST(wq AS DOUBLE) * CAST(wq AS DOUBLE))) AS nrm
        FROM w2)
      SELECT CAST(j - 1 AS INT) AS dim,
             CAST(round(wq / nrm * 1e6) AS BIGINT) AS v_micro,
             CAST(round(nrm) AS BIGINT) AS sigma_micro
      FROM w2, n2 ORDER BY dim"""),
    doc = "top principal direction via 2 unrolled power-iteration " +
      "rounds: one 64-long micro-quantized aggregate per round, driver " +
      "normalization (64 longs of state), oracle replays the exact " +
      "trajectory with DuckDB list comprehensions")

  /** HITS hubs & authorities (Kleinberg 1999) over the bipartite
    * user→entity interaction graph — the link-analysis complement to
    * [[graft.ml.PageRank]]: PageRank ranks within one homogeneous node
    * set; HITS separates "users who touch the important entities"
    * (hubs) from "entities the important users touch" (authorities),
    * the shape the reference's engagement analyses ask of posts vs
    * accounts. Integer micro-unit scores, exact DECIMAL sums, one
    * truncating division per normalization ([[graft.ml.Hits]]); the
    * oracle unrolls both iterations as CTEs with HUGEINT arithmetic
    * and scalar-subquery normalizers, hash-matching bit-for-bit. */
  private val hitsQ = Q(
    "ml_hits",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val edges = ev.select(col("user_id").as("src"), entityKey.as("dst"))
        .filter(col("dst").isNotNull)
      val scores = graft.ml.Hits.run(edges, 2)
      graft.plans.TopK.perKey(scores, Seq("kind"),
          Seq(("score", false), ("id", true)), 15)
        .orderBy(col("kind"), col("score").desc, col("id"))
    },
    Some("""
      WITH edges AS (
        SELECT DISTINCT user_id AS src,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL),
      h0 AS (SELECT DISTINCT src AS id, CAST(1000000 AS HUGEINT) AS h FROM edges),
      a1r AS (SELECT e.dst AS id, CAST(sum(h0.h) AS HUGEINT) AS ar
              FROM edges e JOIN h0 ON h0.id = e.src GROUP BY 1),
      a1 AS (SELECT id, CAST((ar * 1000000) // (SELECT sum(ar) FROM a1r) AS HUGEINT) AS a FROM a1r),
      h1r AS (SELECT e.src AS id, CAST(sum(a1.a) AS HUGEINT) AS hr
              FROM edges e JOIN a1 ON a1.id = e.dst GROUP BY 1),
      h1 AS (SELECT id, CAST((hr * 1000000) // (SELECT sum(hr) FROM h1r) AS HUGEINT) AS h FROM h1r),
      a2r AS (SELECT e.dst AS id, CAST(sum(h1.h) AS HUGEINT) AS ar
              FROM edges e JOIN h1 ON h1.id = e.src GROUP BY 1),
      a2 AS (SELECT id, CAST((ar * 1000000) // (SELECT sum(ar) FROM a2r) AS HUGEINT) AS a FROM a2r),
      h2r AS (SELECT e.src AS id, CAST(sum(a2.a) AS HUGEINT) AS hr
              FROM edges e JOIN a2 ON a2.id = e.dst GROUP BY 1),
      h2 AS (SELECT id, CAST((hr * 1000000) // (SELECT sum(hr) FROM h2r) AS HUGEINT) AS h FROM h2r),
      auth AS (SELECT 'auth' AS kind, id, CAST(a AS BIGINT) AS score
               FROM a2 ORDER BY score DESC, id LIMIT 15),
      hub AS (SELECT 'hub' AS kind, id, CAST(h AS BIGINT) AS score
              FROM h2 ORDER BY score DESC, id LIMIT 15)
      SELECT kind, id, score FROM (
        SELECT * FROM auth UNION ALL SELECT * FROM hub)
      ORDER BY kind, score DESC, id"""),
    doc = "integer-exact HITS hubs/authorities (2 unrolled iterations, " +
      "micro-unit scores, sum-normalized via one truncating division, " +
      "DECIMAL(38) headroom) over the bipartite user->entity graph; " +
      "one edge shuffle per half-iteration, top-15 per kind via TopKPerKey")

  /** Rank-1 alternating least squares (the Koren/Bell/Volinsky 2009
    * matrix-factorization recommender, single latent factor) over the
    * implicit user→entity rating matrix mined from event values. The
    * rank-1 normal equations are closed-form per side — q_i = Σ p·r /
    * Σ p², p_u = Σ q·r / Σ q² — so each half-step is ONE grouped
    * aggregate over the ratings frame (edge-sized shuffle), no gradient
    * loop, no driver state. Three half-steps unrolled (q ← p₀, p ← q,
    * q ← p). Determinism: ratings centi-quantized, factors micro-unit
    * longs, every Σ exact in DECIMAL(38,0)/HUGEINT, one truncating
    * division per factor — the oracle replays the identical trajectory.
    * Scale posture: each half-step shuffles the ratings frame once on
    * its grouping key and carries O(users+items) factor state. */
  private val alsQ = Q(
    "ml_als_rank1",
    (s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val ev = t(s, dir, "events")
      // Zero-valued events are non-signals, not ratings; dropping them
      // also makes every factor strictly positive (q ≥ 1e4 micro when
      // all ratings ≥ 1 centi), so no normal-equation denominator can
      // be zero at any sf.
      val r = ev.select(col("user_id").as("u"), entityKey.as("i"),
          round(col("value") * 100).cast("long").as("rc"))
        .filter(col("i").isNotNull && col("rc") > 0)
        .groupBy("u", "i").agg(wsum(col("rc")).as("rs"))
        .localCheckpoint()
      val p0 = r.select(col("u")).distinct().withColumn("p", lit(1000000L))
      def itemStep(p: DataFrame): DataFrame =
        r.join(p, "u").groupBy("i")
          .agg(sum(col("p").cast(dec) * col("rs")).as("num"),
            sum(col("p").cast(dec) * col("p").cast(dec)).as("den"),
            count(lit(1)).as("n"))
          .select(col("i"),
            expr("CAST(num * 10000000000 AS DECIMAL(38,0)) div den").as("q"),
            col("n"))
      def userStep(q: DataFrame): DataFrame =
        r.join(q.select("i", "q"), "i").groupBy("u")
          .agg(sum(col("q").cast(dec) * col("rs")).as("num"),
            sum(col("q").cast(dec) * col("q").cast(dec)).as("den"),
            count(lit(1)).as("n"))
          .select(col("u"),
            expr("CAST(num * 10000000000 AS DECIMAL(38,0)) div den").as("p"),
            col("n"))
      val q1 = itemStep(p0).localCheckpoint()
      val p1 = userStep(q1).localCheckpoint()
      val q2 = itemStep(p1.select(col("u"), col("p")))
      val items = q2.select(lit("item").as("kind"), col("i").as("id"),
        col("q").as("factor"), col("n"))
      val users = p1.select(lit("user").as("kind"), col("u").as("id"),
        col("p").as("factor"), col("n"))
      graft.plans.TopK.perKey(items.union(users), Seq("kind"),
          Seq(("factor", false), ("id", true)), 15)
        .orderBy(col("kind"), col("factor").desc, col("id"))
    },
    Some("""
      WITH r AS (
        SELECT user_id AS u,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS i,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS rs
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
          AND round(value * 100) > 0
        GROUP BY 1, 2),
      p0 AS (SELECT DISTINCT u, CAST(1000000 AS HUGEINT) AS p FROM r),
      q1 AS (SELECT r.i, CAST((sum(p0.p * r.rs) * 10000000000) // sum(p0.p * p0.p) AS HUGEINT) AS q
             FROM r JOIN p0 ON p0.u = r.u GROUP BY 1),
      p1 AS (SELECT r.u, CAST((sum(q1.q * r.rs) * 10000000000) // sum(q1.q * q1.q) AS HUGEINT) AS p,
                    count(*) AS n
             FROM r JOIN q1 ON q1.i = r.i GROUP BY 1),
      q2 AS (SELECT r.i, CAST((sum(p1.p * r.rs) * 10000000000) // sum(p1.p * p1.p) AS HUGEINT) AS q,
                    count(*) AS n
             FROM r JOIN p1 ON p1.u = r.u GROUP BY 1),
      tops AS (
        SELECT kind, id, factor, n FROM (
          SELECT 'item' AS kind, i AS id, CAST(q AS BIGINT) AS factor,
                 CAST(n AS BIGINT) AS n
          FROM q2 ORDER BY factor DESC, id LIMIT 15)
        UNION ALL
        SELECT kind, id, factor, n FROM (
          SELECT 'user' AS kind, u AS id, CAST(p AS BIGINT) AS factor,
                 CAST(n AS BIGINT) AS n
          FROM p1 ORDER BY factor DESC, id LIMIT 15))
      SELECT kind, id, factor, n FROM tops
      ORDER BY kind, factor DESC, id"""),
    doc = "rank-1 ALS recommender: closed-form normal equations per " +
      "side, 3 unrolled half-steps, one ratings-frame shuffle each, " +
      "centi-quantized ratings / micro-unit factors with exact DECIMAL " +
      "sums and truncating division; top-15 factors per side via TopKPerKey")

  /** Gradient-boosted stumps (Friedman 2001, squared loss): two
    * boosting rounds on top of [[stumpQ]]'s histogram machinery — the
    * full GBDT recurrence, not just one tree. Each round is ONE F×B
    * histogram shuffle (n, Σresidual per bin), cumulative-window split
    * stats, SSE-gain argmax (maximize S_L²/n_L + S_R²/n_R — the
    * variance-reduction form needing only the two sufficient
    * statistics), leaf values γ = S/n, learning rate ½ applied as a
    * truncating `div 2`. Residuals live in centi-units with every sum
    * exact (wsum/HUGEINT) and one truncating division per leaf, so the
    * boosting trajectory is bit-reproducible on any engine — the
    * oracle replays both rounds as CTE chains. Gain headroom: S² div n
    * ≈ n·mean² centi² must fit int64 → sound to ~2·10⁸ rows per fit at
    * these magnitudes; past that the same plan carries deci-units
    * (documented contract, same discipline as [[logRegQ]]). */
  private val gbtQ = Q(
    "ml_gbt_stumps",
    (s, dir) => {
      val dec38 = "DECIMAL(38,0)"
      val d0 = th(s, dir, "documents")
        .withColumn("tk", split(lower(col("text")), " "))
        .withColumn("ntok", size(col("tk")))
        .withColumn("y", (length(col("text")) * 100).cast("long"))
        .withColumn("x1", col("ntok").cast("double") / 1000d)
        .withColumn("x2", size(array_distinct(col("tk"))).cast("double") /
          col("ntok").cast("double"))
        .withColumn("x3",
          expr("aggregate(tk, 0L, (a, x) -> a + length(x))").cast("double") /
            (col("ntok").cast("double") * 10d))
        .select(col("doc_id"), col("y"), col("x1"), col("x2"), col("x3"))
      val f0 = d0.agg(wsum(col("y")).as("sy"), count(lit(1)).as("n"))
        .select(expr(s"sy div CAST(n AS $dec38)").as("f0"))
      val r1 = d0.crossJoin(broadcast(f0))
        .withColumn("e", col("y") - col("f0"))
      def fit(dd: DataFrame): DataFrame = {
        val f = dd.select(col("e"),
          posexplode(array(col("x1"), col("x2"), col("x3")))
            .as(Seq("fidx", "x")))
        val hist = f
          .withColumn("bin", least(lit(31), floor(col("x") * 32).cast("int")))
          .groupBy("fidx", "bin")
          .agg(count(lit(1)).as("n"), wsum(col("e")).as("se"))
        val w = Window.partitionBy("fidx").orderBy("bin")
        val tw = Window.partitionBy("fidx")
        hist
          .withColumn("cn", sum(col("n")).over(w))
          .withColumn("cse", sum(col("se")).over(w))
          .withColumn("tn", sum(col("n")).over(tw))
          .withColumn("tse", sum(col("se")).over(tw))
          .filter(col("cn") < col("tn"))
          .select(col("fidx"), ((col("bin") + 1).cast("double") / 32d).as("t"),
            col("cn").as("nl"), (col("tn") - col("cn")).as("nr"),
            col("cse"), (col("tse") - col("cse")).as("rse"))
          .selectExpr("fidx", "t", "nl", "nr",
            s"cse div CAST(nl AS $dec38) AS gl",
            s"rse div CAST(nr AS $dec38) AS gr",
            s"(cse * cse) div CAST(nl AS $dec38) + " +
              s"(rse * rse) div CAST(nr AS $dec38) AS gain")
          .orderBy(col("gain").desc, col("fidx"), col("t")).limit(1)
      }
      def applyStump(dd: DataFrame, best: DataFrame): DataFrame =
        dd.crossJoin(broadcast(best.select(col("fidx").as("bf"),
            col("t").as("bt"), col("gl").as("bgl"), col("gr").as("bgr"))))
          .withColumn("e", col("e") - expr(
            "(CASE WHEN element_at(array(x1, x2, x3), bf + 1) < bt " +
              "THEN bgl ELSE bgr END) div 2"))
          .drop("bf", "bt", "bgl", "bgr")
      val best1 = fit(r1).localCheckpoint()
      val best2 = fit(applyStump(r1, best1))
      best1.withColumn("rnd", lit(1))
        .union(best2.withColumn("rnd", lit(2)))
        .select(col("rnd"), col("fidx"),
          element_at(array(lit("ntok_k"), lit("uniq_ratio"), lit("avglen_d")),
            col("fidx") + 1).as("feature"),
          round(col("t"), 6).as("t"), col("nl"), col("nr"),
          col("gl"), col("gr"), col("gain"))
        .orderBy("rnd")
    },
    Some("""
      WITH d0 AS (
        SELECT doc_id, CAST(length(text) * 100 AS BIGINT) AS y,
               CAST(len(tk) AS DOUBLE) / 1000 AS x1,
               CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS x2,
               CAST(list_aggregate(list_transform(tk, x -> length(x)), 'sum')
                 AS DOUBLE) / (len(tk) * 10) AS x3
        FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS tk
              FROM documents)),
      f0 AS (SELECT CAST(sum(y) AS HUGEINT) // count(*) AS f0 FROM d0),
      r1 AS (SELECT doc_id, x1, x2, x3, CAST(y - f0 AS HUGEINT) AS e
             FROM d0, f0),
      h1 AS (SELECT fidx, bin, count(*) AS n, CAST(sum(e) AS HUGEINT) AS se
             FROM (SELECT least(31, CAST(floor(x * 32) AS INT)) AS bin, fidx, e
                   FROM (SELECT e, 0 AS fidx, x1 AS x FROM r1
                         UNION ALL SELECT e, 1, x2 FROM r1
                         UNION ALL SELECT e, 2, x3 FROM r1))
             GROUP BY 1, 2),
      s1 AS (SELECT fidx, CAST(bin + 1 AS DOUBLE) / 32 AS t,
                    CAST(sum(n) OVER (PARTITION BY fidx ORDER BY bin) AS BIGINT) AS nl,
                    CAST(sum(se) OVER (PARTITION BY fidx ORDER BY bin) AS HUGEINT) AS cse,
                    CAST(sum(n) OVER (PARTITION BY fidx) AS BIGINT) AS tn,
                    CAST(sum(se) OVER (PARTITION BY fidx) AS HUGEINT) AS tse
             FROM h1),
      b1 AS (SELECT fidx, t, nl, tn - nl AS nr,
                    CAST(cse // nl AS BIGINT) AS gl,
                    CAST((tse - cse) // (tn - nl) AS BIGINT) AS gr,
                    CAST((cse * cse) // nl + ((tse - cse) * (tse - cse)) // (tn - nl) AS BIGINT) AS gain
             FROM s1 WHERE nl < tn
             ORDER BY gain DESC, fidx, t LIMIT 1),
      r2 AS (SELECT r1.doc_id, r1.x1, r1.x2, r1.x3,
                    CAST(e - (CASE WHEN [x1, x2, x3][b1.fidx + 1] < b1.t
                              THEN b1.gl ELSE b1.gr END) // 2 AS HUGEINT) AS e
             FROM r1, b1),
      h2 AS (SELECT fidx, bin, count(*) AS n, CAST(sum(e) AS HUGEINT) AS se
             FROM (SELECT least(31, CAST(floor(x * 32) AS INT)) AS bin, fidx, e
                   FROM (SELECT e, 0 AS fidx, x1 AS x FROM r2
                         UNION ALL SELECT e, 1, x2 FROM r2
                         UNION ALL SELECT e, 2, x3 FROM r2))
             GROUP BY 1, 2),
      s2 AS (SELECT fidx, CAST(bin + 1 AS DOUBLE) / 32 AS t,
                    CAST(sum(n) OVER (PARTITION BY fidx ORDER BY bin) AS BIGINT) AS nl,
                    CAST(sum(se) OVER (PARTITION BY fidx ORDER BY bin) AS HUGEINT) AS cse,
                    CAST(sum(n) OVER (PARTITION BY fidx) AS BIGINT) AS tn,
                    CAST(sum(se) OVER (PARTITION BY fidx) AS HUGEINT) AS tse
             FROM h2),
      b2 AS (SELECT fidx, t, nl, tn - nl AS nr,
                    CAST(cse // nl AS BIGINT) AS gl,
                    CAST((tse - cse) // (tn - nl) AS BIGINT) AS gr,
                    CAST((cse * cse) // nl + ((tse - cse) * (tse - cse)) // (tn - nl) AS BIGINT) AS gain
             FROM s2 WHERE nl < tn
             ORDER BY gain DESC, fidx, t LIMIT 1)
      SELECT rnd, fidx, ['ntok_k', 'uniq_ratio', 'avglen_d'][fidx + 1] AS feature,
             round(t, 6) AS t, nl, nr, gl, gr, gain
      FROM (SELECT 1 AS rnd, fidx, t, nl, nr, gl, gr, gain FROM b1
            UNION ALL
            SELECT 2 AS rnd, fidx, t, nl, nr, gl, gr, gain FROM b2)
      ORDER BY rnd"""),
    doc = "gradient-boosted stumps (2 rounds, squared loss, lr 1/2 as " +
      "truncating div): one FxB residual histogram shuffle per round, " +
      "cumulative-window SSE-gain argmax, centi-unit exact-sum " +
      "residual trajectory replayed bit-for-bit by the oracle")

  /** Viterbi decoding (Viterbi 1967 / Rabiner 1989) of per-user event
    * sequences under a fixed 2-state HMM ("browse" favors click/view,
    * "transact" favors purchase/signup) — the classic sequence-model
    * scoring pass (session intent segmentation). Model parameters are
    * checked-in integer micro-nat log-probs (the reference's analog is
    * its checked-in literal model configs), so the whole DP is integer
    * max-plus arithmetic: bit-exact on any engine, no float order
    * hazards. Contract: π is the state distribution BEFORE the first
    * emission (a transition precedes every emission, first included).
    *
    * Spark face: one groupBy collects each user's (ts, event_id,
    * event_type) sequence (bounded by per-user activity — the same
    * per-entity-fits-in-memory contract as sessionization), sort_array
    * gives the total order, and the DP runs as a single codegen'd
    * `aggregate` fold with a 2-long struct accumulator — no driver
    * state, no iteration, one shuffle total. The oracle replays the
    * identical recurrence as a recursive CTE joined step-by-step. */
  private val viterbiQ = Q(
    "ml_hmm_viterbi",
    (s, dir) => {
      // Streaming per-user fold (r7 verdict item 4): the r5-r8 form
      // collected each user's events into ONE aggregation-buffer array
      // (sort_array(collect_list)) before folding — its true memory
      // bound was the hottest user's whole history, not the DP state.
      // flatMapSortedGroups shuffles by user, SECONDARY-SORTS the rows
      // by (ts, event_id) inside Spark's spillable sorter, and streams
      // the iterator through the fold — live state is genuinely 2 longs
      // per user at ANY history length (a 10^6-event hot user runs in
      // the 2 GB SpillBench heap; see docs/SCALE.md §hot-user).
      // Identical values: same integer max-plus recurrence in the same
      // (ts, event_id) order the struct sort produced.
      import s.implicits._
      // Typed-Dataset contract: ts/user_id/event_id decode as primitive
      // Longs, so a NULL in any of them fails the query LOUDLY instead
      // of the old collected-array form's silent null arithmetic.
      // FixtureSchemaSpec pins the events table non-null on these
      // columns; a violating upstream should fail here, not produce
      // rows the oracle can't explain.
      val ev = t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .as[(Long, Long, Long, String)]
      ev.groupByKey(_._1)
        .flatMapSortedGroups(col("us").asc, col("event_id").asc) { (user, it) =>
          var a0 = -510826L
          var a1 = -916291L
          var n = 0L
          it.foreach { e =>
            val emit0 = e._4 match {
              case "click" | "view" => -1049822L
              case _ => -2302585L
            }
            val emit1 = e._4 match {
              case "purchase" => -1049822L
              case "signup" => -1386294L
              case "error" => -1609438L
              case _ => -2302585L
            }
            val na0 = math.max(a0 - 223144L, a1 - 1203973L) + emit0
            val na1 = math.max(a0 - 1609438L, a1 - 356675L) + emit1
            a0 = na0; a1 = na1; n += 1
          }
          Iterator.single((user, n,
            if (a0 >= a1) "browse" else "transact", math.max(a0, a1)))
        }
        .toDF("user_id", "n_events", "best_state", "vscore")
        .orderBy("user_id")
    },
    Some("""
      WITH RECURSIVE seq AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t,
               event_type
        FROM events),
      n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
            FROM seq GROUP BY 1),
      v AS (
        SELECT s.user_id, s.t,
               GREATEST(CAST(-510826 AS BIGINT) + -223144,
                        CAST(-916291 AS BIGINT) + -1203973) +
                 CASE s.event_type
                   WHEN 'click' THEN -1049822 WHEN 'view' THEN -1049822
                   ELSE -2302585 END AS a0,
               GREATEST(CAST(-510826 AS BIGINT) + -1609438,
                        CAST(-916291 AS BIGINT) + -356675) +
                 CASE s.event_type
                   WHEN 'purchase' THEN -1049822 WHEN 'signup' THEN -1386294
                   WHEN 'error' THEN -1609438 ELSE -2302585 END AS a1
        FROM seq s WHERE s.t = 1
        UNION ALL
        SELECT s.user_id, s.t,
               GREATEST(v.a0 + -223144, v.a1 + -1203973) +
                 CASE s.event_type
                   WHEN 'click' THEN -1049822 WHEN 'view' THEN -1049822
                   ELSE -2302585 END,
               GREATEST(v.a0 + -1609438, v.a1 + -356675) +
                 CASE s.event_type
                   WHEN 'purchase' THEN -1049822 WHEN 'signup' THEN -1386294
                   WHEN 'error' THEN -1609438 ELSE -2302585 END
        FROM v JOIN seq s ON s.user_id = v.user_id AND s.t = v.t + 1)
      SELECT v.user_id, n.n_events,
             CASE WHEN v.a0 >= v.a1 THEN 'browse' ELSE 'transact' END AS best_state,
             CAST(GREATEST(v.a0, v.a1) AS BIGINT) AS vscore
      FROM v JOIN n ON n.user_id = v.user_id AND v.t = n.n_events
      ORDER BY v.user_id"""),
    doc = "Viterbi decoding of per-user event sequences under a fixed " +
      "2-state HMM: integer micro-nat max-plus DP streamed through " +
      "flatMapSortedGroups (single user-keyed shuffle, spillable " +
      "secondary sort, O(1) live state per user — no collected array); " +
      "oracle replays the recurrence as a recursive CTE")

  /** Closed-form ridge regression (Hoerl–Kennard 1970): y = b0 + b1·x1
    * + b2·x2 with λ on the slopes, solved by Cramer's rule on the 3×3
    * normal equations — "distributed ML as moments" like [[ml_ols_trend]]:
    * the ONLY corpus pass is one aggregate of nine exact integer moments
    * (micro-quantized features, wsum/HUGEINT — order-independent at any
    * partitioning); the solve is O(1) arithmetic on one row. The entire
    * double-precision solve is a SINGLE SQL string evaluated verbatim by
    * BOTH engines (same literals, same parenthesization → identical
    * IEEE operation order → bit-identical doubles before round(.,6)). */
  // Cramer's-rule 3×3 determinants over the symmetric normal-equation
  // matrix (ad = ab, ag = ac, ah = af) — shared VERBATIM between the
  // ridge fit and the cross-validation query, and between both engines.
  private val det = "(an*(ae*ai - af*af) - ab*(ab*ai - af*ac) + ac*(ab*af - ae*ac))"
  private val det0 = "(r0*(ae*ai - af*af) - ab*(r1*ai - af*r2) + ac*(r1*af - ae*r2))"
  private val det1 = "(an*(r1*ai - af*r2) - r0*(ab*ai - af*ac) + ac*(ab*r2 - r1*ac))"
  private val det2 = "(an*(ae*r2 - r1*af) - ab*(ab*r2 - r1*ac) + r0*(ab*af - ae*ac))"

  private val ridgeSolveSql: String = {
    // Moment columns (exact ints) → real-unit doubles; λ = 0.1 on slopes.
    val prep =
      "nn, CAST(nn AS DOUBLE) AS an, " +
        "CAST(s1 AS DOUBLE) / 1e6 AS ab, CAST(s2 AS DOUBLE) / 1e6 AS ac, " +
        "CAST(s11 AS DOUBLE) / 1e12 + 0.1 AS ae, " +
        "CAST(s12 AS DOUBLE) / 1e12 AS af, " +
        "CAST(s22 AS DOUBLE) / 1e12 + 0.1 AS ai, " +
        "CAST(sy AS DOUBLE) AS r0, " +
        "CAST(s1y AS DOUBLE) / 1e6 AS r1, CAST(s2y AS DOUBLE) / 1e6 AS r2"
    s"SELECT CAST(nn AS BIGINT) AS n, " +
      s"round($det0 / $det, 6) AS b0, " +
      s"round($det1 / $det, 6) AS b1, " +
      s"round($det2 / $det, 6) AS b2 " +
      s"FROM (SELECT $prep FROM moments)"
  }

  private val ridgeQ = Q(
    "ml_ridge_closed",
    (s, dir) => {
      val d = th(s, dir, "documents")
        .withColumn("tk", split(lower(col("text")), " "))
        .withColumn("ntok", size(col("tk")))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("y"),
          (col("ntok") * 1000).cast("long").as("q1"),
          round(size(array_distinct(col("tk"))).cast("double") /
            col("ntok").cast("double") * 1e6).cast("long").as("q2"))
      val m = d.agg(
        count(lit(1)).as("nn"),
        wsum(col("q1")).as("s1"), wsum(col("q2")).as("s2"),
        sum(col("q1").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("q1")).as("s11"),
        sum(col("q1").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("q2")).as("s12"),
        sum(col("q2").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("q2")).as("s22"),
        wsum(col("y")).as("sy"),
        sum(col("q1").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("y")).as("s1y"),
        sum(col("q2").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("y")).as("s2y"))
      m.createOrReplaceTempView("moments")
      s.sql(ridgeSolveSql)
    },
    Some(s"""
      WITH d AS (
        SELECT CAST(length(text) AS BIGINT) AS y,
               CAST(len(tk) * 1000 AS BIGINT) AS q1,
               CAST(round(CAST(len(list_distinct(tk)) AS DOUBLE) /
                 len(tk) * 1e6) AS BIGINT) AS q2
        FROM (SELECT text, string_split(lower(text), ' ') AS tk
              FROM documents)),
      moments AS (
        SELECT count(*) AS nn,
               CAST(sum(q1) AS HUGEINT) AS s1, CAST(sum(q2) AS HUGEINT) AS s2,
               CAST(sum(q1 * q1) AS HUGEINT) AS s11,
               CAST(sum(q1 * q2) AS HUGEINT) AS s12,
               CAST(sum(q2 * q2) AS HUGEINT) AS s22,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(q1 * y) AS HUGEINT) AS s1y,
               CAST(sum(q2 * y) AS HUGEINT) AS s2y
        FROM d)
      $ridgeSolveSql"""),
    doc = "closed-form ridge regression via Cramer's rule on the 3x3 " +
      "normal equations: one nine-moment exact-integer aggregate is the " +
      "only corpus pass; the double-precision solve is the SAME SQL " +
      "string evaluated by both engines (identical IEEE op order)")

  /** k-fold cross-validation of the ridge fit ([[ridgeQ]]) in ONE
    * corpus pass — the model-validation harness a training pipeline
    * runs at scale: because the ridge solve needs only moment sums,
    * fold f's TRAINING moments are total − fold (sufficient-statistic
    * algebra), so a single groupBy(fold) moment aggregate yields all k
    * models and all k held-out MSEs with no per-fold re-scan. Fold
    * assignment is the deterministic doc_id % 3. The whole
    * train-moments → Cramer solve → held-out-MSE arithmetic is one
    * shared SQL string evaluated verbatim by both engines. */
  private val cvSolveSql: String = {
    val prep =
      "fold, n, " +
        "CAST(sum(n) OVER () - n AS DOUBLE) AS an, " +
        "CAST(sum(s1) OVER () - s1 AS DOUBLE) / 1e6 AS ab, " +
        "CAST(sum(s2) OVER () - s2 AS DOUBLE) / 1e6 AS ac, " +
        "CAST(sum(s11) OVER () - s11 AS DOUBLE) / 1e12 + 0.1 AS ae, " +
        "CAST(sum(s12) OVER () - s12 AS DOUBLE) / 1e12 AS af, " +
        "CAST(sum(s22) OVER () - s22 AS DOUBLE) / 1e12 + 0.1 AS ai, " +
        "CAST(sum(sy) OVER () - sy AS DOUBLE) AS r0, " +
        "CAST(sum(s1y) OVER () - s1y AS DOUBLE) / 1e6 AS r1, " +
        "CAST(sum(s2y) OVER () - s2y AS DOUBLE) / 1e6 AS r2, " +
        "CAST(n AS DOUBLE) AS tnd, " +
        "CAST(s1 AS DOUBLE) / 1e6 AS tb, CAST(s2 AS DOUBLE) / 1e6 AS tc, " +
        "CAST(s11 AS DOUBLE) / 1e12 AS te, CAST(s12 AS DOUBLE) / 1e12 AS tf, " +
        "CAST(s22 AS DOUBLE) / 1e12 AS ti, " +
        "CAST(sy AS DOUBLE) AS ty, CAST(s1y AS DOUBLE) / 1e6 AS t1y, " +
        "CAST(s2y AS DOUBLE) / 1e6 AS t2y, CAST(syy AS DOUBLE) AS tyy"
    val lvl2 = "SELECT fold, an, tnd, tb, tc, te, tf, ti, ty, t1y, " +
      "t2y, tyy, " +
      s"$det0 / $det AS b0, $det1 / $det AS b1, $det2 / $det AS b2 " +
      s"FROM (SELECT $prep FROM cvm)"
    "SELECT fold, CAST(an AS BIGINT) AS n_train, CAST(tnd AS BIGINT) AS n_test, " +
      "round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2, " +
      "round((tyy - 2*b0*ty - 2*b1*t1y - 2*b2*t2y + b0*b0*tnd + " +
      "2*b0*b1*tb + 2*b0*b2*tc + b1*b1*te + 2*b1*b2*tf + b2*b2*ti) " +
      s"/ tnd, 6) AS mse FROM ($lvl2) ORDER BY fold"
  }

  private val cvQ = Q(
    "ml_ridge_crossval",
    (s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val d = th(s, dir, "documents")
        .withColumn("tk", split(lower(col("text")), " "))
        .withColumn("ntok", size(col("tk")))
        .select(expr("doc_id % 3").as("fold"),
          length(col("text")).cast("long").as("y"),
          (col("ntok") * 1000).cast("long").as("q1"),
          round(size(array_distinct(col("tk"))).cast("double") /
            col("ntok").cast("double") * 1e6).cast("long").as("q2"))
      val cvm = d.groupBy("fold").agg(
        count(lit(1)).as("n"),
        wsum(col("q1")).as("s1"), wsum(col("q2")).as("s2"),
        sum(col("q1").cast(dec) * col("q1")).as("s11"),
        sum(col("q1").cast(dec) * col("q2")).as("s12"),
        sum(col("q2").cast(dec) * col("q2")).as("s22"),
        wsum(col("y")).as("sy"),
        sum(col("q1").cast(dec) * col("y")).as("s1y"),
        sum(col("q2").cast(dec) * col("y")).as("s2y"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
      cvm.createOrReplaceTempView("cvm")
      s.sql(cvSolveSql)
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id % 3 AS fold,
               CAST(length(text) AS BIGINT) AS y,
               CAST(len(tk) * 1000 AS BIGINT) AS q1,
               CAST(round(CAST(len(list_distinct(tk)) AS DOUBLE) /
                 len(tk) * 1e6) AS BIGINT) AS q2
        FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS tk
              FROM documents)),
      cvm AS (
        SELECT fold, count(*) AS n,
               CAST(sum(q1) AS HUGEINT) AS s1, CAST(sum(q2) AS HUGEINT) AS s2,
               CAST(sum(q1 * q1) AS HUGEINT) AS s11,
               CAST(sum(q1 * q2) AS HUGEINT) AS s12,
               CAST(sum(q2 * q2) AS HUGEINT) AS s22,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(q1 * y) AS HUGEINT) AS s1y,
               CAST(sum(q2 * y) AS HUGEINT) AS s2y,
               CAST(sum(y * y) AS HUGEINT) AS syy
        FROM d GROUP BY 1)
      $cvSolveSql"""),
    doc = "3-fold ridge cross-validation in one corpus pass: per-fold " +
      "moment sums, train = total - fold (sufficient-statistic " +
      "algebra), Cramer solve + held-out MSE as one SQL string shared " +
      "verbatim by both engines")

  val all: Seq[Q] = Seq(linkPredictionQ, naiveBayesQ, logRegQ, stumpQ,
    svdPowerQ, hitsQ, alsQ, gbtQ, viterbiQ, ridgeQ, cvQ) ++ Seq(
    // N9 feature block: the full preprocessing frame, oracle-checked.
    Q(
      "ml_knn_features",
      (s, dir) => {
        val f = knnFrame(s, dir)
        val cols = Seq(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("entries"), col("is_closed"), col("limited_entries"),
          round(col("progress_s"), 6).as("progress_s"),
          round(col("popularity_s"), 6).as("popularity_s"),
          col("wd")) ++ Seq.range(0, 7).map(i =>
            when(col("wd") === i, 1).otherwise(0).as(s"weekday_$i"))
        f.select(cols: _*).orderBy("day")
      },
      Some(knnOracleFrame + """
        SELECT strftime(day, '%Y-%m-%d') AS day, entries, is_closed,
               limited_entries, round(progress_s, 6) AS progress_s,
               round(popularity_s, 6) AS popularity_s, wd,
               CASE WHEN wd = 0 THEN 1 ELSE 0 END AS weekday_0,
               CASE WHEN wd = 1 THEN 1 ELSE 0 END AS weekday_1,
               CASE WHEN wd = 2 THEN 1 ELSE 0 END AS weekday_2,
               CASE WHEN wd = 3 THEN 1 ELSE 0 END AS weekday_3,
               CASE WHEN wd = 4 THEN 1 ELSE 0 END AS weekday_4,
               CASE WHEN wd = 5 THEN 1 ELSE 0 END AS weekday_5,
               CASE WHEN wd = 6 THEN 1 ELSE 0 END AS weekday_6
        FROM frame ORDER BY day"""),
      doc = "N9 visitor-prediction feature frame (is_closed, limited_entries, " +
        "exhibition progress/popularity, weekday one-hot, MinMax scaling); " +
        "reference preprocessing.py:6-95"),

    // N9 KNN visitor prediction, FULLY DISTRIBUTED — no driver collect.
    //
    // Key observations from the reference (predict.py):
    //  - SEQUENCE_LENGTH = 1 makes the e-{i} lag loop vestigial: the
    //    training loop `range(1, 1)` adds no lag columns, and the e-1
    //    column set during prediction is dropped by `.filter(
    //    feature_columns)`. The model is a plain feature-space KNN, NOT
    //    autoregressive — predictions never feed features.
    //  - MinMax scaling is linear and the KNN prediction is the mean of
    //    the 5 nearest neighbors' scaled entries, so the denormalized
    //    prediction is exactly the mean of the raw entries — computed
    //    here as an exact integer-cents sum / 500.
    //  - Tuesdays (weekday_1) and closed days force prediction 0.0 in
    //    SCALED space, which inverse-transforms to the MINIMUM training
    //    entries, not zero (predict.py:183-199) — quirk preserved.
    //  - sklearn breaks distance ties by internal partition order; we pin
    //    the deterministic (distance, train_day) order on both sides.
    //
    // Plan shape at scale: the train side is one row per observed day —
    // broadcast it; the cross join is predict_days × train_days, linear
    // in history size; one window per predict day ranks neighbors.
    Q(
      "ml_knn_forecast",
      (s, dir) => knnForecast(knnFrame(s, dir)).orderBy("day"),
      Some(knnOracleFrame + "," + knnForecastCtes("") + """
        SELECT day, predicted FROM out ORDER BY day"""),
      doc = "N9 KNN visitor prediction, full feature frame, distributed " +
        "broadcast-cross-join KNN; reference predict.py:95-206"),

    // CombinePredictions (reference predict.py:35-56): the SAME forecast
    // run twice — is_sample=false trains on everything and predicts the
    // next 14 days; is_sample=true first drops the last 14 observed days
    // (iloc[:-14]) so its 14 predictions overlap held-back actuals —
    // then unioned with the flag. Each variant rebuilds its own frame
    // (span, grid, MinMax scalers) exactly like the reference's
    // per-variant preprocessing.
    Q(
      "ml_knn_combined",
      (s, dir) => {
        val full = knnForecast(knnFrame(s, dir))
          .withColumn("is_sample", lit(false))
        val sample = knnForecast(knnFrame(s, dir, dropLastDays = 14))
          .withColumn("is_sample", lit(true))
        full.unionByName(sample).orderBy("is_sample", "day")
      },
      Some(s"""
        WITH ${knnFrameCtes("f_", 0)},
        ${knnForecastCtes("f_")},
        ${knnFrameCtes("s_", 14)},
        ${knnForecastCtes("s_")}
        SELECT day, predicted, is_sample FROM (
          SELECT day, predicted, false AS is_sample FROM f_out
          UNION ALL
          SELECT day, predicted, true AS is_sample FROM s_out)
        ORDER BY is_sample, day"""),
      doc = "CombinePredictions two-variant union: full forecast + " +
        "sample forecast over the last-14-days-held-back frame, " +
        "is_sample-flagged; reference predict.py:35-56,123-124"),

    // N7: DBSCAN over byte-histogram vectors (cosine, minPts=2, noise
    // dropped) — reference post_opinion_patterns.py:169-210. With
    // minPts=2 DBSCAN degenerates to connected components of the
    // eps-graph (plus weighted-singleton clusters: a distinct vector of
    // multiplicity ≥ 2 is core on its own — its duplicates sit at
    // distance 0), so the fit is FULLY DISTRIBUTED (r10 verdict item 1 —
    // the 4096-vector driver cap is retired): distinct-vector frame →
    // banded sign-LSH blocking + probe cap (DbscanCC.epsComponents, the
    // dedup_embedding_cosine pair builder shape) → exact integer cosine
    // verify → ConnectedComponents min-label propagation. Nothing is
    // collected at any cardinality.
    //
    // The eps test runs on raw INTEGER histograms (cosine is
    // scale-invariant): dot² ≥ (1-eps)²·|a|²·|b|² — every quantity exact
    // in int64/double, so Spark and the DuckDB oracle agree bit-for-bit
    // even at the threshold. The oracle (DbscanSql.ccSql) replays the
    // identical md5-derived hyperplanes, cap and closure, and recomputes
    // the components via a recursive transitive closure.
    Q(
      "ml_dbscan_clusters",
      (s, dir) => {
        val media = Multimodal.asMedia(th(s, dir, "documents"))
        val hists = Multimodal.extractHistograms(media)
        // Post-aggregation distinct-vector frame: duplicates collapse to
        // one weighted vertex. NO cap, NO collect.
        val dv = hists.groupBy("hist")
          .agg(count(lit(1)).as("n_dup"), min(col("media_id")).as("rep_id"))
          .withColumn("s2",
            expr("aggregate(hist, 0L, (a, x) -> a + x * x)"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val labels = graft.ml.DbscanCC.epsComponents(
          dv, idCol = "rep_id", vecCol = "hist", s2Col = "s2",
          dims = 16, bands = 8, bits = 8, cap = 128, salt = "dh",
          cosine = 0.9999, requireDotPos = false)
        // minPts=2 over weighted vertices: edged vertices are core;
        // edge-less vertices cluster alone iff multiplicity ≥ 2 (and
        // non-zero — zero vectors have no cosine and are always noise).
        val out = dv
          .join(labels.withColumnRenamed("id", "rep_id"), Seq("rep_id"), "left")
          .filter(col("label").isNotNull ||
            (col("s2") > 0 && col("n_dup") >= 2))
          .groupBy(coalesce(col("label"), col("rep_id")).as("comp"))
          .agg(sum(col("n_dup")).as("n_members"), min(col("rep_id")).as("min_doc"))
          .orderBy("min_doc")
          .select(col("n_members"), col("min_doc"))
        // the returned lazy frame references the persisted dv; Verify
        // releases it after materializing (CacheLedger contract).
        graft.core.CacheLedger.track(dv)
        out
      },
      Some(s"""
        WITH h0 AS (
          SELECT doc_id,
                 [CAST(len(list_filter(cps, x -> x // 16 = b)) AS BIGINT)
                  FOR b IN range(16)] AS hist
          FROM (SELECT doc_id, [unicode(c) FOR c IN split(text, '')] AS cps
                FROM documents)),
        dv AS (
          SELECT hist, count(*) AS n_dup, min(doc_id) AS rep,
                 list_aggregate(list_transform(hist, x -> x * x), 'sum') AS s2
          FROM h0 GROUP BY hist),
        ${DbscanSql.ccSql("d_", "dv", "rep", "hist", "s2",
          dims = 16, bands = 8, bits = 8, cap = 128, salt = "dh",
          cosineSql = "0.9999", requireDotPos = false)}
        SELECT CAST(sum(n_dup) AS BIGINT) AS n_members, min(rep) AS min_doc
        FROM (SELECT dv.n_dup, dv.rep, dv.s2,
                     coalesce(c.comp, dv.rep) AS comp,
                     c.comp IS NOT NULL AS edged
              FROM dv LEFT JOIN d_cc c ON c.id = dv.rep)
        WHERE edged OR (s2 > 0 AND n_dup >= 2)
        GROUP BY comp ORDER BY min_doc"""),
      doc = "N7 DBSCAN (cosine, minPts=2) on post-aggregation distinct " +
        "histogram vectors — fully distributed: sign-LSH blocked eps-pairs " +
        "+ connected components (minPts=2 DBSCAN ≡ CC of the eps-graph); " +
        "oracle replays blocking + recursive closure; reference " +
        "post_opinion_patterns.py:169-210"),

    // N8: GSDMM short-text topics. The driver fit consumes a BOUNDED
    // deterministic sample (hash-ordered top-256 docs); topic labels for
    // the FULL corpus are then assigned distributedly by broadcasting the
    // fitted word-topic counts and scoring argmax per document (the
    // movie-group score, new-doc form). The oracle COMPUTES (no pinned
    // literals since c107a59): the sampler is counter-based (SplitMix64
    // per draw, Gsdmm.mix64) so the DuckDB face replays the full Gibbs
    // trajectory as a recursive CTE (gsdmmReplaySql above) — init, every
    // sweep, final assignment — and hash-matches at every sf.
    Q(
      "ml_gsdmm_topics",
      (s, dir) => {
        val toksAll = th(s, dir, "documents")
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
        // Fixed 256-doc fit cap (documented choice, docs/SCALE.md §gsdmm):
        // the reference fits hundreds of posts (topic_modeling.py), and
        // GSDMM's Gibbs sweep is inherently sequential — a bigger cap
        // buys driver time, not model capacity for k=10 short-text
        // topics. What the cap COSTS at scale is measured, not assumed:
        // the 64 docs ranked directly AFTER the sample in the same h64
        // order (disjoint by construction) score a held-out mean best
        // log-likelihood, emitted as `heldout_ll` — a corpus that
        // outgrows the sample shows up as this metric degrading across
        // sfs/mints, in-band, per run.
        val ranked = toksAll
          .orderBy(h64(col("doc_id")).asc, col("doc_id").asc)
          .limit(320)
          .collect()
        val sample = ranked.take(256)
        val heldout = ranked.drop(256)
        val docs = sample.map(r => (r.getLong(0), r.getSeq[String](1).toArray))
          .sortBy(_._1).map(_._2)
        val model = Gsdmm.fit(docs, k = 10, alpha = 0.1, beta = 0.1, iters = 10)
        // Held-out mean best-score: per-doc FLOOR to integer micro-units
        // (floor of a double is an exact binary op — bit-identical in
        // both engines, unlike half-up rounding which detours through
        // decimal strings), exact integer sum (order-independent), one
        // double division; the final 6-decimal rounding goes through
        // Spark SQL round vs DuckDB round — the repo's established
        // parity pair.
        val hoMicro = heldout.map { r =>
          math.floor(
            Gsdmm.bestScore(model, r.getSeq[String](1).toArray) * 1e6).toLong
        }.sum
        val heldoutLL =
          if (heldout.isEmpty) 0.0
          else hoMicro.toDouble / (heldout.length * 1e6)
        val bc = s.sparkContext.broadcast(model)
        val assignU = udf((toks: Seq[String]) =>
          Gsdmm.assign(bc.value, toks.toArray))
        import s.implicits._
        val topDf = model.topWords.toSeq
          .map { case (z, ws) => (z, ws.take(3).map(_._1).mkString(" ")) }
          .toDF("topic", "top_words")
        toksAll.withColumn("topic", assignU(col("toks")))
          .groupBy("topic")
          .agg(count(lit(1)).as("n_docs"))
          .join(broadcast(topDf), Seq("topic"))
          .withColumn("heldout_ll", round(lit(heldoutLL), 6))
          .orderBy("topic")
          .select("topic", "n_docs", "top_words", "heldout_ll")
      },
      // The oracle COMPUTES (r7 verdict item 5 — the pinned-literal
      // oracle is retired): the counter-based sampler makes the Gibbs
      // trajectory a pure function, and the recursive CTE replays it
      // bit-for-bit — init, all 10 sweeps, final counts, full-corpus
      // argmax assignment, top-3 words, held-out fit metric — at ANY
      // corpus/sf.
      Some(s"""
        WITH RECURSIVE d0 AS (
          SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
          FROM documents),
        ${gsdmmReplaySql("q_", "d0", k = 10, iters = 10, sampleN = 256)},
        q_ho AS (
          SELECT doc_id FROM d0
          ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) ASC,
                   doc_id ASC
          LIMIT 64 OFFSET 256),
        q_hobest AS (
          SELECT sc.doc_id, max(sc.s) AS s
          FROM q_ascore sc JOIN q_ho ho ON ho.doc_id = sc.doc_id
          GROUP BY sc.doc_id),
        q_hll AS (
          SELECT coalesce(round(
            CAST(sum(CAST(floor(s * 1000000) AS BIGINT)) AS DOUBLE)
              / (count(*) * 1000000.0), 6), 0.0) AS heldout_ll
          FROM q_hobest)
        SELECT a.topic, CAST(count(*) AS BIGINT) AS n_docs,
               coalesce(t.top_words, '') AS top_words,
               h.heldout_ll
        FROM q_assign a
          LEFT JOIN q_top t ON t.topic = a.topic
          CROSS JOIN q_hll h
        GROUP BY a.topic, t.top_words, h.heldout_ll ORDER BY a.topic"""),
      doc = "N8 GSDMM bounded-sample fit + distributed broadcast argmax " +
        "assignment; reference topic_modeling.py:181-245; oracle replays " +
        "the counter-based Gibbs trajectory as a recursive CTE"),

    // N8 windowed form: the reference trains ONE MODEL PER YEAR plus
    // 'all' (topic_modeling.py:181-245, model_name per year window); here
    // two deterministic windows (doc_id parity — the fixture corpus has
    // no dates) each get their own bounded fit and distributed
    // assignment, exactly the per-window loop shape. Window fits are
    // independent driver-side stages over capped samples; assignment per
    // window is a broadcast argmax over that window's partition of the
    // corpus — the union is one job, no window ever sees another's model.
    Q(
      "ml_gsdmm_yearly",
      (s, dir) => {
        import s.implicits._
        val toksAll = th(s, dir, "documents")
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"),
            concat(lit("y"), pmod(col("doc_id"), lit(2L)).cast("string"))
              .as("window"))
        val frames = Seq("y0", "y1").map { w =>
          val sub = toksAll.filter(col("window") === w)
          val sample = sub.select("doc_id", "toks")
            .orderBy(h64(col("doc_id")).asc, col("doc_id").asc)
            .limit(128)
            .collect() // bounded per-window fit sample
          val docs = sample
            .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
            .sortBy(_._1).map(_._2)
          val model = Gsdmm.fit(docs, k = 5, alpha = 0.1, beta = 0.1,
            iters = 10)
          val bc = s.sparkContext.broadcast(model)
          val assignU = udf((toks: Seq[String]) =>
            Gsdmm.assign(bc.value, toks.toArray))
          sub.withColumn("topic", assignU(col("toks")))
            .groupBy("window", "topic")
            .agg(count(lit(1)).as("n_docs"))
        }
        frames.reduce(_ unionByName _).orderBy("window", "topic")
      },
      // Per-window replay: each window runs its own recursive Gibbs
      // trajectory (independent models, like the reference's per-year
      // loop) — computed, not quoted, at any corpus/sf.
      Some(s"""
        WITH RECURSIVE d0 AS (
          SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
          FROM documents),
        y0d AS (SELECT doc_id, tk FROM d0 WHERE doc_id % 2 = 0),
        y1d AS (SELECT doc_id, tk FROM d0 WHERE doc_id % 2 = 1),
        ${gsdmmReplaySql("a_", "y0d", k = 5, iters = 10, sampleN = 128)},
        ${gsdmmReplaySql("b_", "y1d", k = 5, iters = 10, sampleN = 128)}
        SELECT * FROM (
          SELECT 'y0' AS "window", topic, CAST(count(*) AS BIGINT) AS n_docs
          FROM a_assign GROUP BY topic
          UNION ALL
          SELECT 'y1', topic, CAST(count(*) AS BIGINT)
          FROM b_assign GROUP BY topic)
        ORDER BY "window", topic"""),
      doc = "N8 per-window GSDMM (reference's per-year model loop): " +
        "independent bounded fits, per-window broadcast assignment; " +
        "oracle replays both windows' Gibbs trajectories; " +
        "reference topic_modeling.py:181-245"),

    // Integer-exact PageRank over the event interaction graph
    // (src = user, dst = the JSON payload's target entity). 8 fixed
    // iterations of one-shuffle-per-round label flow — the iterative
    // graph-algorithm pattern next to connected components, without
    // GraphX and without float nondeterminism (micro-unit ranks, floor
    // division; see graft.ml.PageRank). The oracle unrolls the same 8
    // iterations as chained CTEs with identical integer arithmetic, so
    // ranks hash-match bit-for-bit.
    Q(
      "ml_pagerank",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val edges = ev.select(col("user_id").as("src"),
            get_json_object(col("props"), "$.k").cast("long").as("dst"))
          .filter(col("dst").isNotNull)
        graft.ml.PageRank.run(edges, 8)
          .orderBy(col("r").desc, col("id")).limit(25)
      },
      Some {
        val iterCtes = (1 to 8).map { i =>
          s"""p$i AS (
             |  SELECT n.id, CAST(150000 + coalesce(c.s, 0) AS BIGINT) AS r
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.dst, CAST(sum((85 * p.r) // (100 * d.d)) AS BIGINT) AS s
             |    FROM p${i - 1} p JOIN edges e ON p.id = e.src
             |                     JOIN deg d ON d.src = e.src
             |    GROUP BY e.dst) c ON n.id = c.dst)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH edges AS (
          SELECT DISTINCT user_id AS src,
                 CAST(json_extract_string(props, '$$.k') AS BIGINT) AS dst
          FROM events
          WHERE json_extract_string(props, '$$.k') IS NOT NULL),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
        nodes AS (SELECT DISTINCT id FROM (
          SELECT src AS id FROM edges UNION SELECT dst FROM edges)),
        p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
        $iterCtes
        SELECT id, r FROM p8 ORDER BY r DESC, id LIMIT 25"""
      },
      doc = "integer-exact PageRank (8 unrolled iterations, micro-unit " +
        "ranks, floor-division damping) over the user->entity event " +
        "graph; one shuffle per iteration, localCheckpointed lineage"),

    // Triangle counting over the user co-interaction graph (users sharing
    // an event entity). Scale posture: pair generation is BLOCKED — only
    // the top-8 users per entity (by interaction count, deterministic
    // tiebreak) form pairs, so edges grow linearly in entities, never
    // quadratically in users per entity; the triangle enumeration is two
    // hash joins over oriented edges (a<b<c lists each triangle once).
    // At web scale the same plan orients edges by degree instead of id,
    // which bounds every node's join fan-out by sqrt(|E|).
    Q(
      "ml_triangle_count",
      (s, dir) => {
        val e = coEdges(t(s, dir, "events"), entityKey)
        val tri = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
          .join(e.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .select(col("e1.a").as("v1"), col("e1.b").as("v2"),
            col("e2.b").as("v3"))
        tri.select(explode(array(col("v1"), col("v2"), col("v3"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("n_tri"))
          .orderBy(col("n_tri").desc, col("node").asc).limit(25)
      },
      Some(s"""
        WITH ${coEdgeCtes()},
        tri AS (
          SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
          FROM e e1 JOIN e e2 ON e1.b = e2.a
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT node, count(*) AS n_tri FROM (
          SELECT unnest([v1, v2, v3]) AS node FROM tri)
        GROUP BY node ORDER BY n_tri DESC, node LIMIT 25"""),
      doc = "triangle counting over the blocked user co-interaction " +
        "graph: top-8-per-entity pair generation (linear in entities), " +
        "oriented a<b<c edge joins list each triangle once"),

    // Synchronous label-propagation community detection (Raghavan et al.
    // 2007), 3 unrolled rounds, fully deterministic: every node starts
    // labeled with its own id; each round it adopts the MODE of its
    // neighbors' labels with ties broken to the smallest label
    // (row_number over count desc, label asc — total order, no RNG).
    // Differs from connected components (min-label floods the whole
    // component) — LPA converges to locally dense groups.
    //
    // Graph: co-interaction blocked by (entity, user_id % 7) — the mod-7
    // term plants 7 behavioral cohorts that never cross-link, giving the
    // detector real modular structure to find (the plain entity graph at
    // this sf is a 150-node near-clique where EVERY community method
    // degenerates to one cluster; a planted partition is the standard
    // way to make the fixture discriminating).
    //
    // Scale posture: per round ONE edge-sized shuffle (neighbor-label
    // join) + one (node,label) aggregate; degree is bounded by the
    // top-8-per-entity blocking, label state is O(nodes). The same three
    // rounds at 100 TB are three joins — no driver state, no iteration
    // over collect()ed data.
    Q(
      "ml_label_prop",
      (s, dir) => {
        val e = coEdges(t(s, dir, "events"),
          entityKey * 10 + col("user_id") % 7).localCheckpoint()
        val und = e.select(col("a").as("src"), col("b").as("dst"))
          .union(e.select(col("b").as("src"), col("a").as("dst")))
        var lab = und.select(col("src").as("node")).distinct()
          .withColumn("label", col("node"))
        val w = Window.partitionBy("src")
          .orderBy(col("c").desc, col("label").asc)
        for (_ <- 1 to 3) {
          lab = und.join(lab, und("dst") === lab("node"))
            .groupBy("src", "label").agg(count(lit(1)).as("c"))
            .withColumn("rk", row_number().over(w))
            .filter(col("rk") === 1)
            .select(col("src").as("node"), col("label"))
        }
        lab.groupBy("label")
          .agg(count(lit(1)).as("sz"), min(col("node")).as("first_node"),
            max(col("node")).as("last_node"))
          .orderBy(col("sz").desc, col("label").asc)
      },
      Some(s"""
        WITH ${coEdgeCtes("CAST(json_extract_string(props, '$.k') AS BIGINT)" +
          " * 10 + user_id % 7")},
        und AS (SELECT a AS src, b AS dst FROM e
                UNION ALL SELECT b, a FROM e),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
        ${(1 to 3).map(i =>
          s"""n$i AS (
             SELECT u.src, l.label, count(*) AS c
             FROM und u JOIN l${i - 1} l ON u.dst = l.node
             GROUP BY 1, 2),
        l$i AS (
          SELECT src AS node, label FROM (
            SELECT src, label, row_number() OVER (PARTITION BY src
                     ORDER BY c DESC, label ASC) AS rk
            FROM n$i)
          WHERE rk = 1)""").mkString(",\n        ")}
        SELECT label, count(*) AS sz, min(node) AS first_node,
               max(node) AS last_node
        FROM l3 GROUP BY label ORDER BY sz DESC, label ASC"""),
      doc = "deterministic synchronous label-propagation communities " +
        "(3 unrolled rounds, mode-of-neighbors with total tiebreak) — " +
        "one edge-sized shuffle per round, state O(nodes)"),

    // Multi-source BFS hop distance (≤ 3 hops) over the planted-cohort
    // co-interaction graph, sparsified with a top-2-per-entity cap so
    // paths are genuinely multi-hop (at cap 8 the cohort cliques make
    // everything 1 hop from a seed). Seeds are every node with
    // id % 10 == 0; each round relaxes dist via one edge join + one
    // min-aggregate (the frontier pattern — Pregel's BFS as three Spark
    // shuffles, no driver iteration state). Nodes unreached within 3
    // hops simply don't appear. Output: per-distance node counts + id
    // range.
    Q(
      "ml_bfs_hops",
      (s, dir) => {
        val e = coEdges(t(s, dir, "events"),
          entityKey * 10 + col("user_id") % 7, cap = 2).localCheckpoint()
        val und = e.select(col("a").as("src"), col("b").as("dst"))
          .union(e.select(col("b").as("src"), col("a").as("dst")))
        var d = und.select(col("src").as("node")).distinct()
          .filter(col("node") % 10 === 0)
          .withColumn("dist", lit(0L))
        for (_ <- 1 to 3) {
          d = d.unionByName(
              und.join(d, und("dst") === d("node"))
                .select(und("src").as("node"), (d("dist") + 1).as("dist")))
            .groupBy("node").agg(min("dist").as("dist"))
        }
        d.groupBy("dist")
          .agg(count(lit(1)).as("n_nodes"), min("node").as("first_node"),
            max("node").as("last_node"))
          .orderBy("dist")
      },
      Some(s"""
        WITH ${coEdgeCtes("CAST(json_extract_string(props, '$.k') AS BIGINT)" +
          " * 10 + user_id % 7", cap = 2)},
        und AS (SELECT a AS src, b AS dst FROM e
                UNION ALL SELECT b, a FROM e),
        d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
               FROM und WHERE src % 10 = 0),
        ${(1 to 3).map(i =>
          s"""d$i AS (
          SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM d${i - 1}
            UNION ALL
            SELECT u.src AS node, d.dist + 1 AS dist
            FROM und u JOIN d${i - 1} d ON u.dst = d.node)
          GROUP BY node)""").mkString(",\n        ")}
        SELECT dist, count(*) AS n_nodes, min(node) AS first_node,
               max(node) AS last_node
        FROM d3 GROUP BY dist ORDER BY dist"""),
      doc = "multi-source BFS hop distances (3 unrolled frontier rounds: " +
        "edge join + min-aggregate per round) over the planted-cohort " +
        "graph; unreachable nodes excluded"),

    // Lloyd k-means (k=8, 3 iterations) over the embedding corpus, made
    // INTEGER-EXACT so any engine reproduces assignments bit-for-bit:
    // vectors quantized to micro-units (round(x*1e6) as long), distances
    // are integer squared-L2 (exact, order-free), centroid updates use
    // truncating integer division (Spark `div` == DuckDB `//`), argmin
    // ties break to the lowest centroid id via struct-min. Plan shape
    // per iteration: one broadcast of the k-row centroid frame, a
    // map-side partial-aggregable argmin groupBy(vec_id), and a
    // (k x dims)-sized centroid aggregate — no driver-side state, the
    // same loop at 100 TB just broadcasts k rows per round.
    Q(
      "ml_kmeans_lloyd",
      (s, dir) => {
        // Pre-partitioned by vec_id (r15, same hoist as PageRank's ed):
        // every round's assign→centroid step joins back to v on vec_id,
        // and per-round jobs cannot share exchanges — the checkpoint's
        // preserved partitioning makes the per-round v side
        // exchange-free at any scale.
        val v = graft.ml.KMeans.quantize(th(s, dir, "embeddings"))
          .repartition(col("vec_id"))
          .localCheckpoint()
        val cent = graft.ml.KMeans.fit(v, 8, 3)
        graft.ml.KMeans.assign(v, cent)
          .groupBy("cid")
          .agg(count(lit(1)).as("n"),
            round(wsum(col("dist")).cast("double") / lit(1e12), 6)
              .as("inertia"))
          .join(cent.select(col("cid"),
            element_at(col("cv"), 1).as("c0")), "cid")
          .select(col("cid"), col("n"), col("inertia"), col("c0"))
          .orderBy("cid")
      },
      Some {
        val dims = 64
        def assignCte(a: String, c: String) =
          s"""$a AS (
             |  SELECT vec_id, cid, dist FROM (
             |    SELECT v.vec_id, c.cid,
             |           CAST(list_sum([(xq[i+1]-cv[i+1])*(xq[i+1]-cv[i+1])
             |                 FOR i IN range(0, $dims)]) AS BIGINT) AS dist,
             |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             |             list_sum([(xq[i+1]-cv[i+1])*(xq[i+1]-cv[i+1])
             |               FOR i IN range(0, $dims)]), c.cid) AS rk
             |    FROM v CROSS JOIN $c c)
             |  WHERE rk = 1)""".stripMargin
        def centCte(c: String, a: String) =
          s"""$c AS (
             |  SELECT cid, list(cx ORDER BY d) AS cv FROM (
             |    SELECT cid, d, CAST(sum(ux) AS BIGINT) // count(*) AS cx
             |    FROM (SELECT cid, unnest(xq) AS ux,
             |                 generate_subscripts(xq, 1) AS d
             |          FROM $a JOIN v USING (vec_id))
             |    GROUP BY cid, d
             |  ) GROUP BY cid)""".stripMargin
        s"""
        WITH v AS (
          SELECT vec_id,
                 [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
                  FOR x IN embedding] AS xq
          FROM embeddings),
        c0 AS (SELECT vec_id AS cid, xq AS cv FROM v WHERE vec_id < 8),
        ${assignCte("a1", "c0")},
        ${centCte("c1", "a1")},
        ${assignCte("a2", "c1")},
        ${centCte("c2", "a2")},
        ${assignCte("a3", "c2")},
        ${centCte("c3", "a3")},
        ${assignCte("a4", "c3")}
        SELECT a4.cid, count(*) AS n,
               round(CAST(sum(dist) AS DOUBLE) / 1e12, 6) AS inertia,
               max(c3.cv[1]) AS c0
        FROM a4 JOIN c3 ON a4.cid = c3.cid
        GROUP BY a4.cid ORDER BY a4.cid"""
      },
      doc = "integer-exact Lloyd k-means (micro-unit squared-L2, " +
        "truncating-division centroids, struct-min argmin ties): " +
        "k-row broadcast per round, partial-aggregable argmin, no " +
        "driver state"),

    // Closed-form OLS trend per group (simple linear regression of the
    // daily value series on the day index): slope, intercept and R²
    // from the FIVE exact moments (n, Σx, Σy, Σxy, Σx², Σy²) computed in
    // ONE aggregate — x is an integer day index and y exact cents, so
    // every moment is an exact integer through the codegen long-sum
    // path, and the slope/intercept/R² formulas are a fixed-order double
    // chain (bit-comparable, no per-row residual pass). The textbook
    // "distributed ML as moments" shape: model fitting cost is O(groups),
    // not O(rows), at any scale.
    Q(
      "ml_ols_trend",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
              .cast("long").as("x"))
          .agg(wsum(round(col("value") * 100).cast("long"))
            .cast("long").as("yc"))
        val g = daily.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          wsum(col("yc")).cast("double").as("sy"),
          wsum(col("x") * col("yc")).cast("double").as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          wsum(col("yc") * col("yc")).cast("double").as("syy"))
        g.withColumn("nd", col("n").cast("double"))
          .withColumn("sxd", col("sx").cast("double"))
          .withColumn("sxxd", col("sxx").cast("double"))
          .withColumn("slope",
            (col("nd") * col("sxy") - col("sxd") * col("sy")) /
              (col("nd") * col("sxxd") - col("sxd") * col("sxd")))
          .withColumn("intercept",
            (col("sy") - col("slope") * col("sxd")) / col("nd"))
          .withColumn("r2", {
            val ssxy = col("nd") * col("sxy") - col("sxd") * col("sy")
            val ssxx = col("nd") * col("sxxd") - col("sxd") * col("sxd")
            val ssyy = col("nd") * col("syy") - col("sy") * col("sy")
            ssxy * ssxy / (ssxx * ssyy)
          })
          .select(col("event_type"), col("n"),
            (col("slope") / 100.0).as("slope"),
            (col("intercept") / 100.0).as("intercept"), col("r2"))
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type,
                 datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS yc
          FROM events GROUP BY 1, 2),
        g AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(yc) AS DOUBLE) AS sy,
                 CAST(sum(x * yc) AS DOUBLE) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(yc * yc) AS DOUBLE) AS syy
          FROM daily GROUP BY event_type),
        d AS (
          SELECT *, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                 CAST(sxx AS DOUBLE) AS sxxd
          FROM g),
        m AS (
          SELECT *,
                 (nd * sxy - sxd * sy) / (nd * sxxd - sxd * sxd) AS slope
          FROM d)
        SELECT event_type, n, slope / 100.0 AS slope,
               (sy - slope * sxd) / nd / 100.0 AS intercept,
               (nd * sxy - sxd * sy) * (nd * sxy - sxd * sy) /
                 ((nd * sxxd - sxd * sxd) * (nd * syy - sy * sy)) AS r2
        FROM m ORDER BY event_type"""),
      doc = "closed-form OLS trend per group from one exact-moment " +
        "aggregate (slope/intercept/R^2 as a fixed-order double chain); " +
        "fitting cost O(groups), not O(rows)"),

    // Model-evaluation harness: per-class precision / recall / F1 of the
    // engine's trigram language detector against the documents table's
    // lang ground truth. Confusion counts are one (truth, pred)
    // aggregate; class marginals and the diagonal are re-aggregations of
    // that O(classes²) frame; metrics are fixed-order double chains with
    // identical zero-denominator guards on both sides. The oracle
    // re-runs the WHOLE detector through the shared DuckDB face
    // (TextQueries.langIdCtes) — prediction parity and metric parity in
    // one query.
    Q(
      "ml_eval_langid",
      (s, dir) => {
        val det = udf((text: String) =>
          graft.functions.LangId.detect(text).orNull)
        val pred = th(s, dir, "documents")
          .select(col("lang").as("truth"),
            coalesce(det(col("text")), lit("(none)")).as("pred"))
        val conf = pred.groupBy("truth", "pred").agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val byTruth = conf.groupBy("truth")
          .agg(sum("n").cast("long").as("n_true"))
          .select(col("truth").as("cls"), col("n_true"))
        val byPred = conf.groupBy("pred")
          .agg(sum("n").cast("long").as("n_pred"))
          .select(col("pred").as("cls"), col("n_pred"))
        val diag = conf.filter(col("truth") === col("pred"))
          .select(col("truth").as("cls"), col("n").as("tp"))
        byTruth.join(byPred, Seq("cls"), "full_outer")
          .join(diag, Seq("cls"), "left")
          .withColumn("n_true", coalesce(col("n_true"), lit(0L)))
          .withColumn("n_pred", coalesce(col("n_pred"), lit(0L)))
          .withColumn("tp", coalesce(col("tp"), lit(0L)))
          .withColumn("precision",
            when(col("n_pred") > 0,
              col("tp").cast("double") / col("n_pred").cast("double"))
              .otherwise(0.0))
          .withColumn("recall",
            when(col("n_true") > 0,
              col("tp").cast("double") / col("n_true").cast("double"))
              .otherwise(0.0))
          .withColumn("f1",
            when(col("precision") + col("recall") > 0.0,
              lit(2.0) * col("precision") * col("recall") /
                (col("precision") + col("recall"))).otherwise(0.0))
          .select(col("cls"), col("n_true"), col("n_pred"), col("tp"),
            col("precision"), col("recall"), col("f1"))
          .orderBy("cls")
      },
      Some(s"""
        WITH ${TextQueries.langIdCtes},
        pred AS (
          SELECT d.lang AS truth, coalesce(b.lang, '(none)') AS pred
          FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id),
        conf AS (
          SELECT truth, pred, CAST(count(*) AS BIGINT) AS n
          FROM pred GROUP BY 1, 2),
        bt AS (SELECT truth AS cls, CAST(sum(n) AS BIGINT) AS n_true
               FROM conf GROUP BY 1),
        bp AS (SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS n_pred
               FROM conf GROUP BY 1),
        dg AS (SELECT truth AS cls, n AS tp FROM conf WHERE truth = pred),
        m AS (
          SELECT cls, coalesce(n_true, 0) AS n_true,
                 coalesce(n_pred, 0) AS n_pred, coalesce(tp, 0) AS tp
          FROM bt FULL OUTER JOIN bp USING (cls)
          LEFT JOIN dg USING (cls)),
        pr AS (
          SELECT *,
            CASE WHEN n_pred > 0
                 THEN CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)
                 ELSE 0.0 END AS precision,
            CASE WHEN n_true > 0
                 THEN CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE)
                 ELSE 0.0 END AS recall
          FROM m)
        SELECT cls, n_true, n_pred, tp, precision, recall,
               CASE WHEN precision + recall > 0.0
                    THEN 2.0 * precision * recall / (precision + recall)
                    ELSE 0.0 END AS f1
        FROM pr ORDER BY cls"""),
      doc = "evaluation harness: per-class precision/recall/F1 of the " +
        "trigram language detector vs ground truth; the oracle re-runs " +
        "the full detector through its shared DuckDB face"))

  /** Blocked user co-interaction graph shared by `ml_triangle_count` and
    * `ml_label_prop`: users co-occurring on an event entity are linked,
    * but only the top-8 users per entity (by interaction count,
    * deterministic tiebreak) form pairs — edge count grows linearly in
    * entities, never quadratically in users-per-entity. */
  private def coEdges(ev: org.apache.spark.sql.DataFrame,
      blockKey: org.apache.spark.sql.Column,
      cap: Int = 8): org.apache.spark.sql.DataFrame = {
    val uk = ev.select(col("user_id").as("u"), blockKey.as("k"))
      .filter(col("k").isNotNull)
      .groupBy("k", "u").agg(count(lit(1)).as("n"))
    // Fused top-cap + pair enumeration (r15, see
    // dedup_audio_fingerprint): selection order (n desc, u asc)
    // replays the old row_number window's cap exactly — as bounded
    // heaps instead of a full per-entity sort — and each entity's ≤cap
    // user list emits its upper triangle directly. The events scan +
    // uk aggregate run once (the BHJ built that whole pipeline a
    // second time as its broadcast side).
    graft.plans.TopK.pairsPerKey(uk, Seq("k"),
        Seq(("n", false), ("u", true)), Seq("u"), cap)
      .select(col("x_u").as("a"), col("y_u").as("b")).distinct()
  }

  /** The entity id parsed from the event props payload. */
  private def entityKey: org.apache.spark.sql.Column =
    get_json_object(col("props"), "$.k").cast("long")

  /** DuckDB face of [[coEdges]] — CTE chain `uk, top, e`. */
  private def coEdgeCtes(keyExpr: String =
      "CAST(json_extract_string(props, '$.k') AS BIGINT)",
      cap: Int = 8): String =
    s"""uk AS (
          SELECT $keyExpr AS k,
                 user_id AS u, count(*) AS n
          FROM events
          WHERE json_extract_string(props, '$$.k') IS NOT NULL
          GROUP BY 1, 2),
        top AS (
          SELECT k, u FROM (
            SELECT k, u, row_number() OVER (PARTITION BY k
                           ORDER BY n DESC, u ASC) AS rk
            FROM uk)
          WHERE rk <= $cap),
        e AS (
          SELECT DISTINCT x.u AS a, y.u AS b
          FROM top x JOIN top y ON x.k = y.k AND x.u < y.u)"""
}
