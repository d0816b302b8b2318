package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.silver.Views

/** The reference's named PG views, materialized end-to-end over a
  * deterministic fixture mapping of the `documents` table (doc_id % 4
  * buckets play the four social sources; metric columns derive from
  * n_chars so the DuckDB oracle can rebuild the identical inputs):
  *
  *  - `social_media_post`  (migration_023.sql:30-86)
  *  - `app_review`         (migration_059.sql:22-46)
  *  - `exhibition_day`     (migration_018.sql:32-41)
  *  - `post`               (migration_015.sql:140-186, via Views.postUnion)
  *
  * These exercise [[Views.fbPostGenerated]], [[Views.latestSnapshot]],
  * [[Views.withIsResponse]] and [[Views.postUnion]] through real view
  * shapes rather than analog queries — each is a green CORRECTNESS row.
  * The Spark builders and the oracle SQL fragments are both shared
  * across the queries, so `post` provably consumes the same branch
  * definitions the individual views expose.
  */
object ViewQueries extends QueryBase {

  /** documents + the shared derived columns every pseudo-source uses. */
  private def docBase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), col("text"), col("n_chars"),
      date_format(date_add(lit("2024-01-01").cast("date"),
        (col("doc_id") % 30).cast("int")), "yyyy-MM-dd").as("post_date"))

  private def nullS: Column = lit(null).cast("string")
  private def nullI: Column = lit(null).cast("int")

  /** social_media_post (unordered): fb posts ∪ fb comments (fb_post_all)
    * LEFT JOIN latest performance snapshot via [[Views.latestSnapshot]],
    * ∪ instagram ∪ twitter, PG UNION (distinct), generated is_response. */
  private def socialMediaPost(s: SparkSession, dir: String): DataFrame = {
    val d = docBase(s, dir)
    val fbRaw = d.filter(col("doc_id") % 4 === 0)
      .select(lit("mb").as("page_id"),
        col("doc_id").cast("string").as("post_id"),
        col("text"), col("post_date"), col("n_chars"))
    // generated surrogate id + permalink (migration_011 semantics)
    val fbPost = Views.fbPostGenerated(fbRaw)
    val fbAll = fbPost.select(
        col("fb_post_id").as("post_id"), col("text"), col("post_date"),
        lit(true).as("is_from_museum"), nullS.as("response_to"),
        lit(false).as("is_comment"), col("permalink"))
      .unionByName(d.filter(col("doc_id") % 4 === 1).select(
        concat(lit("mb_"), col("doc_id")).as("post_id"),
        col("text"), col("post_date"),
        (col("doc_id") % 8 === 1).as("is_from_museum"),
        concat(lit("mb_"), col("doc_id") - 1).as("response_to"),
        lit(true).as("is_comment"),
        concat(lit("https://www.facebook.com/mb/posts/"),
          col("doc_id") - 1, lit("?comment_id="), col("doc_id"))
          .as("permalink")))
    // two performance snapshots per post, half the posts get a newer
    // one — latestSnapshot must pick it (greatest-n-per-group).
    val snap1 = fbPost.select(
      col("fb_post_id"), lit("2024-02-01").as("snap_ts"),
      (col("n_chars") % 50).cast("int").as("likes"),
      (col("n_chars") % 7).cast("int").as("comments"),
      (col("n_chars") % 5).cast("int").as("shares"))
    val snap2 = fbPost.filter(col("doc_id").cast("long") % 8 === 0).select(
      col("fb_post_id"), lit("2024-02-15").as("snap_ts"),
      (col("n_chars") % 50 + 5).cast("int").as("likes"),
      (col("n_chars") % 7 + 1).cast("int").as("comments"),
      (col("n_chars") % 5 + 2).cast("int").as("shares"))
    val rich = snap1.unionByName(snap2)
    val fb = Views.latestSnapshot(
        fbAll.withColumnRenamed("post_id", "fb_post_id"), rich,
        "fb_post_id", "snap_ts")
      .select(
        when(col("is_comment"), "Facebook Comment")
          .otherwise("Facebook Post").as("source"),
        col("fb_post_id").as("post_id"), col("text"), col("post_date"),
        nullS.as("media_type"), col("response_to"),
        nullS.as("user_id"), col("is_from_museum"),
        col("likes"), col("comments"), col("shares"), col("permalink"))
    val ig = d.filter(col("doc_id") % 4 === 2).select(
      lit("Instagram").as("source"),
      concat(lit("ig"), col("doc_id")).as("post_id"),
      col("text"), col("post_date"),
      element_at(array(lit("image"), lit("video"), lit("carousel")),
        (col("n_chars") % 3 + 1).cast("int")).as("media_type"),
      nullS.as("response_to"), nullS.as("user_id"),
      lit(true).as("is_from_museum"),
      (col("n_chars") % 40).cast("int").as("likes"),
      (col("n_chars") % 6).cast("int").as("comments"),
      nullI.as("shares"),
      concat(lit("https://www.instagram.com/p/ig"), col("doc_id"))
        .as("permalink"))
    val tw = d.filter(col("doc_id") % 4 === 3).select(
      lit("Twitter").as("source"),
      concat(lit("tw"), col("doc_id")).as("post_id"),
      col("text"), col("post_date"), nullS.as("media_type"),
      when(col("doc_id") % 12 === 7, concat(lit("tw"), col("doc_id") - 4))
        .otherwise(nullS).as("response_to"),
      (col("doc_id") % 100).cast("string").as("user_id"),
      (col("doc_id") % 5 === 3).as("is_from_museum"),
      (col("n_chars") % 30).cast("int").as("likes"),
      (col("n_chars") % 8).cast("int").as("comments"),
      (col("n_chars") % 9).cast("int").as("shares"),
      concat(lit("https://twitter.com/i/status/tw"), col("doc_id"))
        .as("permalink"))
    Views.withIsResponse(fb.unionByName(ig).unionByName(tw).distinct())
  }

  /** app_review (unordered): appstore ∪ gplay branches with per-store
    * app-id filter, generated appstore permalink, NULLIF/CONCAT_WS text. */
  private def appReview(s: SparkSession, dir: String): DataFrame = {
    val d = docBase(s, dir)
    val titleCol = element_at(split(col("text"), " "), 1)
    val appstore = d.filter(col("doc_id") % 2 === 0)
      .withColumn("app_id",
        when(col("doc_id") % 20 === 0, "000").otherwise("1150432552"))
      .withColumn("title", titleCol)
      .select(
        lit("Apple Appstore").as("source"),
        concat(lit("as"), col("doc_id")).as("review_id"),
        nullif(concat_ws("\n", col("title"), col("text")), lit(""))
          .as("text"),
        col("post_date"),
        (col("n_chars") % 5 + 1).cast("int").as("rating"),
        concat(lit("2."), col("doc_id") % 4).as("app_version"),
        nullI.as("likes"), col("title"),
        // generated column (migration_059.sql:12-19)
        concat(lit("https://apps.apple.com/de/app/museum-barberini/id"),
          col("app_id"), lit("?see-all=reviews")).as("permalink"),
        col("app_id"))
      .filter(col("app_id") === "1150432552").drop("app_id")
    val gplay = d.filter(col("doc_id") % 2 === 1)
      .withColumn("app_id",
        when(col("doc_id") % 20 === 1, "com.other")
          .otherwise("com.barberini.museum.barberinidigital"))
      .select(
        lit("Google Play").as("source"),
        concat(lit("gp"), col("doc_id")).as("review_id"),
        col("text"), col("post_date"),
        (col("n_chars") % 5 + 1).cast("int").as("rating"),
        concat(lit("1."), col("doc_id") % 6).as("app_version"),
        (col("n_chars") % 20).cast("int").as("likes"),
        nullS.as("title"),
        concat(lit("https://play.google.com/store/apps/details?id="),
          col("app_id"), lit("&reviewId=gp"), col("doc_id"))
          .as("permalink"),
        col("app_id"))
      .filter(col("app_id") === "com.barberini.museum.barberinidigital")
      .drop("app_id")
    appstore.unionByName(gplay).distinct()
  }

  /** museum (google-maps) review branch for the `post` union. */
  private def museumReview(s: SparkSession, dir: String): DataFrame =
    docBase(s, dir).filter(col("doc_id") % 9 === 0).select(
      lit("Google Maps").as("source"),
      concat(lit("gm"), col("doc_id")).as("review_id"),
      col("text"), col("post_date"),
      (col("n_chars") % 5 + 1).cast("int").as("rating"),
      concat(lit("https://maps.google.com/review/gm"), col("doc_id"))
        .as("permalink"))

  // ---- shared oracle SQL fragments (composed per query) ----

  private val dSql = """
        d AS (
          SELECT doc_id, text, n_chars,
                 strftime(DATE '2024-01-01' + CAST(doc_id % 30 AS INT),
                          '%Y-%m-%d') AS post_date
          FROM documents)"""

  private val socialChainSql = """
        fb_post AS (
          SELECT 'mb_' || doc_id AS post_id, text, post_date, n_chars,
                 doc_id,
                 'https://www.facebook.com/mb/posts/' || doc_id AS permalink
          FROM d WHERE doc_id % 4 = 0),
        fb_all AS (
          SELECT post_id, text, post_date, TRUE AS is_from_museum,
                 CAST(NULL AS VARCHAR) AS response_to, FALSE AS is_comment,
                 permalink, doc_id, n_chars
          FROM fb_post
          UNION ALL
          SELECT 'mb_' || doc_id, text, post_date, doc_id % 8 = 1,
                 'mb_' || (doc_id - 1), TRUE,
                 concat('https://www.facebook.com/mb/posts/',
                        doc_id - 1, '?comment_id=', doc_id),
                 doc_id, n_chars
          FROM d WHERE doc_id % 4 = 1),
        rich AS (
          SELECT post_id AS fb_post_id, '2024-02-01' AS snap_ts,
                 CAST(n_chars % 50 AS INT) AS likes,
                 CAST(n_chars % 7 AS INT) AS comments,
                 CAST(n_chars % 5 AS INT) AS shares
          FROM fb_post
          UNION ALL
          SELECT post_id, '2024-02-15', CAST(n_chars % 50 + 5 AS INT),
                 CAST(n_chars % 7 + 1 AS INT), CAST(n_chars % 5 + 2 AS INT)
          FROM fb_post WHERE doc_id % 8 = 0),
        rich_latest AS (
          SELECT fb_post_id, likes, comments, shares FROM (
            SELECT *, row_number() OVER (PARTITION BY fb_post_id
                                         ORDER BY snap_ts DESC) AS rn
            FROM rich) WHERE rn = 1),
        smp AS (
          SELECT CASE WHEN is_comment THEN 'Facebook Comment'
                      ELSE 'Facebook Post' END AS source,
                 a.post_id, a.text, a.post_date,
                 CAST(NULL AS VARCHAR) AS media_type, a.response_to,
                 CAST(NULL AS VARCHAR) AS user_id, a.is_from_museum,
                 r.likes, r.comments, r.shares, a.permalink
          FROM fb_all a LEFT JOIN rich_latest r ON a.post_id = r.fb_post_id
          UNION
          SELECT 'Instagram', 'ig' || doc_id, text, post_date,
                 ['image','video','carousel'][CAST(n_chars % 3 AS INT) + 1],
                 NULL, NULL, TRUE,
                 CAST(n_chars % 40 AS INT), CAST(n_chars % 6 AS INT),
                 CAST(NULL AS INT),
                 'https://www.instagram.com/p/ig' || doc_id
          FROM d WHERE doc_id % 4 = 2
          UNION
          SELECT 'Twitter', 'tw' || doc_id, text, post_date, NULL,
                 CASE WHEN doc_id % 12 = 7 THEN 'tw' || (doc_id - 4) END,
                 CAST(doc_id % 100 AS VARCHAR), doc_id % 5 = 3,
                 CAST(n_chars % 30 AS INT), CAST(n_chars % 8 AS INT),
                 CAST(n_chars % 9 AS INT),
                 'https://twitter.com/i/status/tw' || doc_id
          FROM d WHERE doc_id % 4 = 3),
        social AS (
          SELECT DISTINCT *, (response_to IS NOT NULL) AS is_response
          FROM smp)"""

  private val appChainSql = """
        appstore AS (
          SELECT 'Apple Appstore' AS source, 'as' || doc_id AS review_id,
                 NULLIF(CONCAT_WS(chr(10), split_part(text, ' ', 1), text),
                        '') AS text,
                 post_date, CAST(n_chars % 5 + 1 AS INT) AS rating,
                 '2.' || (doc_id % 4) AS app_version, CAST(NULL AS INT) AS likes,
                 split_part(text, ' ', 1) AS title,
                 concat('https://apps.apple.com/de/app/museum-barberini/id',
                        app_id, '?see-all=reviews') AS permalink
          FROM (SELECT *, CASE WHEN doc_id % 20 = 0 THEN '000'
                               ELSE '1150432552' END AS app_id
                FROM d WHERE doc_id % 2 = 0)
          WHERE app_id = '1150432552'),
        gplay AS (
          SELECT 'Google Play', 'gp' || doc_id, text, post_date,
                 CAST(n_chars % 5 + 1 AS INT), '1.' || (doc_id % 6),
                 CAST(n_chars % 20 AS INT), CAST(NULL AS VARCHAR),
                 concat('https://play.google.com/store/apps/details?id=',
                        app_id, '&reviewId=gp', doc_id)
          FROM (SELECT *, CASE WHEN doc_id % 20 = 1 THEN 'com.other'
                  ELSE 'com.barberini.museum.barberinidigital' END AS app_id
                FROM d WHERE doc_id % 2 = 1)
          WHERE app_id = 'com.barberini.museum.barberinidigital'),
        app AS (SELECT * FROM appstore UNION SELECT * FROM gplay)"""

  private val museumSql = """
        museum AS (
          SELECT 'Google Maps' AS source, 'gm' || doc_id AS review_id,
                 text, post_date, CAST(n_chars % 5 + 1 AS INT) AS rating,
                 'https://maps.google.com/review/gm' || doc_id AS permalink
          FROM d WHERE doc_id % 9 = 0)"""

  val all: Seq[Q] = Seq(
    // social_media_post: the performance join runs through
    // Views.latestSnapshot (J3) — posts carry two snapshots for half the
    // keys, so the window actually resolves.
    Q(
      "view_social_media_post",
      (s, dir) => socialMediaPost(s, dir).orderBy("source", "post_id"),
      Some(s"""
        WITH $dSql, $socialChainSql
        SELECT * FROM social ORDER BY source, post_id"""),
      doc = "social_media_post view end-to-end (fb_post_all + latest " +
        "performance snapshot + ig + twitter, PG UNION, is_response); " +
        "reference migration_023.sql:30-86"),

    // app_review: appstore ∪ gplay branches with per-store app-id filter,
    // the generated appstore permalink, and NULLIF(CONCAT_WS(...)) text.
    Q(
      "view_app_review",
      (s, dir) => appReview(s, dir).orderBy("source", "review_id"),
      Some(s"""
        WITH $dSql, $appChainSql
        SELECT * FROM app ORDER BY source, review_id"""),
      doc = "app_review view end-to-end (appstore ∪ gplay, app-id filters, " +
        "generated permalink, NULLIF/CONCAT_WS text); reference " +
        "migration_059.sql:22-46"),

    // exhibition_day: day grid from min(start_date) to a fixed 'now'
    // literal, LEFT JOIN exhibition_time on interval containment.
    // The exhibition dim is a handful of rows → a BROADCAST range join is
    // the right plan (contrast join_range_interval, which explode-rewrites
    // because there the interval side is fact-sized). Uncovered days keep
    // a NULL title; overlapping timespans produce one row each.
    Q(
      "view_exhibition_day",
      (s, dir) => {
        import s.implicits._
        val exTime = Seq(
          ("Exhibition One", "2024-01-01", "2024-01-10"),
          ("Exhibition One", "2024-01-12", "2024-01-18"),
          ("Exhibition Two", "2024-01-21", "2024-02-13"),
          ("Schließtag / Closing Day", "2024-01-08", "2024-01-09"))
          .toDF("title", "start_date", "end_date")
          .select(col("title"), col("start_date").cast("date"),
            col("end_date").cast("date"))
        val grid = exTime.agg(min(col("start_date")).as("d0"))
          .select(explode(sequence(col("d0"),
            lit("2024-02-29").cast("date"))).as("day"))
        grid.join(broadcast(exTime),
            col("day").between(col("start_date"), col("end_date")), "left")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("title"))
          .orderBy("day", "title")
      },
      Some("""
        WITH ex AS (
          SELECT * FROM (VALUES
            ('Exhibition One', DATE '2024-01-01', DATE '2024-01-10'),
            ('Exhibition One', DATE '2024-01-12', DATE '2024-01-18'),
            ('Exhibition Two', DATE '2024-01-21', DATE '2024-02-13'),
            ('Schließtag / Closing Day', DATE '2024-01-08', DATE '2024-01-09'))
            AS t(title, start_date, end_date)),
        grid AS (
          SELECT CAST(unnest(generate_series(
                   (SELECT min(start_date) FROM ex),
                   DATE '2024-02-29', INTERVAL 1 DAY)) AS DATE) AS day)
        SELECT strftime(g.day, '%Y-%m-%d') AS day, e.title
        FROM grid g LEFT JOIN ex e
          ON g.day BETWEEN e.start_date AND e.end_date
        ORDER BY day, title"""),
      doc = "exhibition_day view (day grid LEFT JOIN interval containment, " +
        "broadcast range join on the tiny dim); reference " +
        "migration_018.sql:32-41"),

    // post: the top-level U1 union view — app reviews ∪ museum reviews ∪
    // social posts through Views.postUnion (typed NULL padding, constant
    // context, PG UNION dedup), consuming EXACTLY the same branch
    // builders/SQL fragments as the individual views above.
    Q(
      "view_post",
      (s, dir) => {
        val app = appReview(s, dir).select("source", "review_id", "text",
          "post_date", "rating", "likes", "permalink")
        val museum = museumReview(s, dir)
        val social = socialMediaPost(s, dir).select("source", "post_id",
          "text", "post_date", "is_from_museum", "is_response", "likes",
          "comments", "shares", "permalink")
        Views.postUnion(app, museum, social)
          .orderBy("context", "source", "post_id")
      },
      Some(s"""
        WITH $dSql, $socialChainSql, $appChainSql, $museumSql,
        post AS (
          SELECT source, review_id AS post_id, 'App Review' AS context,
                 text, post_date, CAST(rating AS DOUBLE) AS rating,
                 FALSE AS is_from_museum, FALSE AS is_response, likes,
                 CAST(NULL AS INT) AS comments, CAST(NULL AS INT) AS shares,
                 permalink
          FROM app
          UNION
          SELECT source, review_id, 'Museum Review', text, post_date,
                 CAST(rating AS DOUBLE), FALSE, FALSE, CAST(NULL AS INT),
                 CAST(NULL AS INT), CAST(NULL AS INT), permalink
          FROM museum
          UNION
          SELECT source, post_id, 'Social Media', text, post_date,
                 CAST(NULL AS DOUBLE), is_from_museum, is_response, likes,
                 comments, shares, permalink
          FROM social)
        SELECT * FROM post ORDER BY context, source, post_id"""),
      doc = "post union view via Views.postUnion (U1: typed NULL padding, " +
        "per-branch context, PG UNION dedup) over the same branch " +
        "definitions as the individual views; reference " +
        "migration_015.sql:140-186"))
}
