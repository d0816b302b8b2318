package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver-layer union views (SURVEY.md §2.8 U1, §2.4 J3, §2.3 P15) — the
  * reference's PostgreSQL view layer re-expressed as DataFrame functions.
  *
  * Each branch of a union is type-aligned with explicit NULL padding
  * (`lit(null).cast(...)`) and a constant `source`/`context` column, then
  * combined with `unionByName` + `distinct()` — PG `UNION` dedups, and that
  * is load-bearing for the reference (duplicate posts would double-count
  * downstream sentiment), so it is preserved and tested.
  *
  * Scale posture: the generated columns and padding are projections
  * (codegen'd, zero shuffle); the one shuffle is the union-distinct
  * itself, keyed on the full row — at 100 TB the same plan holds because
  * distinct() partial-aggregates map-side before the exchange.
  */
object Views {

  /** Generated columns of the facebook post table
    * (reference migration_011.sql:55-70): surrogate id + permalink. */
  def fbPostGenerated(fbPost: DataFrame): DataFrame =
    fbPost
      .withColumn("fb_post_id", concat_ws("_", col("page_id"), col("post_id")))
      .withColumn("permalink", concat(lit("https://www.facebook.com/"),
        col("page_id"), lit("/posts/"), col("post_id")))

  /** Latest-snapshot resolution (J3): keep the newest performance row per
    * key; base rows with no snapshot survive (right side of the
    * reference's NATURAL RIGHT JOIN). */
  def latestSnapshot(base: DataFrame, perf: DataFrame, key: String,
      ts: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).desc)
    val latest = perf.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", ts)
    base.join(latest, Seq(key), "left")
  }

  private def nullI: Column = lit(null).cast("int")

  /** The `post` union view (reference migration_015.sql:140-186): app
    * reviews ∪ museum reviews ∪ social-media posts with per-branch
    * constant context and typed NULL padding, deduplicating like PG UNION.
    *
    * Expected branch schemas (post-normalization):
    *  - appReviews: source, review_id, text, post_date, rating, likes,
    *    permalink
    *  - museumReviews: source, review_id, text, post_date, rating,
    *    permalink
    *  - socialPosts: source, post_id, text, post_date, is_from_museum,
    *    is_response, likes, comments, shares, permalink
    */
  def postUnion(appReviews: DataFrame, museumReviews: DataFrame,
      socialPosts: DataFrame): DataFrame = {
    val app = appReviews.select(
      col("source"), col("review_id").as("post_id"),
      lit("App Review").as("context"), col("text"), col("post_date"),
      col("rating").cast("double").as("rating"),
      lit(false).as("is_from_museum"), lit(false).as("is_response"),
      col("likes").cast("int").as("likes"),
      nullI.as("comments"), nullI.as("shares"), col("permalink"))
    val museum = museumReviews.select(
      col("source"), col("review_id").as("post_id"),
      lit("Museum Review").as("context"), col("text"), col("post_date"),
      col("rating").cast("double").as("rating"),
      lit(false).as("is_from_museum"), lit(false).as("is_response"),
      nullI.as("likes"), nullI.as("comments"), nullI.as("shares"),
      col("permalink"))
    val social = socialPosts.select(
      col("source"), col("post_id"), lit("Social Media").as("context"),
      col("text"), col("post_date"),
      lit(null).cast("double").as("rating"),
      col("is_from_museum"), col("is_response"),
      col("likes").cast("int").as("likes"),
      col("comments").cast("int").as("comments"),
      col("shares").cast("int").as("shares"), col("permalink"))
    app.unionByName(museum).unionByName(social).distinct()
  }

  /** `is_response` derivation of the social_media_post view
    * (reference migration_023.sql:84-85). */
  def withIsResponse(posts: DataFrame): DataFrame =
    posts.withColumn("is_response", col("response_to").isNotNull)
}
