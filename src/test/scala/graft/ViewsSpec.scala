package graft

import java.sql.Timestamp

import graft.silver.Views

/** Silver view-layer tests: generated columns, latest-snapshot join, and
  * the post union view's dedup + NULL-padding + uniqueness invariant
  * (reference tests/schema/check_posts.py:40-54).
  */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  test("fbPostGenerated: surrogate id + permalink generated columns") {
    val out = Views.fbPostGenerated(
      Seq(("pg1", "42")).toDF("page_id", "post_id")).collect().head
    assert(out.getAs[String]("fb_post_id") === "pg1_42")
    assert(out.getAs[String]("permalink") ===
      "https://www.facebook.com/pg1/posts/42")
  }

  test("latestSnapshot: newest perf row wins, bases without snapshot survive") {
    val base = Seq("a", "b").toDF("post_id")
    val perf = Seq(
      ("a", Timestamp.valueOf("2021-01-01 00:00:00"), 10),
      ("a", Timestamp.valueOf("2021-01-02 00:00:00"), 20))
      .toDF("post_id", "ts", "likes")
    val out = Views.latestSnapshot(base, perf, "post_id", "ts")
      .select("post_id", "likes").as[(String, Option[Int])]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq(("a", Some(20)), ("b", None)))
  }

  test("postUnion: NULL padding, contexts, PG UNION dedup, key uniqueness") {
    val ts = Timestamp.valueOf("2021-06-01 12:00:00")
    val app = Seq(
      ("Apple Appstore", "r1", "great", ts, 5, 3, "https://x/r1"),
      // exact duplicate row — PG UNION must collapse it
      ("Apple Appstore", "r1", "great", ts, 5, 3, "https://x/r1"))
      .toDF("source", "review_id", "text", "post_date", "rating", "likes",
        "permalink")
    val museum = Seq(("Google Maps", "m1", "nice", ts, 4, "https://x/m1"))
      .toDF("source", "review_id", "text", "post_date", "rating", "permalink")
    val social = Seq(
      ("Twitter", "t1", "tweet", ts, false, true, 7, 1, 2, "https://x/t1"))
      .toDF("source", "post_id", "text", "post_date", "is_from_museum",
        "is_response", "likes", "comments", "shares", "permalink")

    val post = Views.postUnion(app, museum, social)
    assert(post.count() === 3) // duplicate app review collapsed
    // (source, post_id) uniqueness invariant from the reference's schema
    // acceptance checks.
    assert(post.groupBy("source", "post_id").count()
      .filter($"count" > 1).count() === 0)
    val m = post.filter($"context" === "Museum Review").collect().head
    assert(m.isNullAt(m.fieldIndex("likes")) &&
      m.isNullAt(m.fieldIndex("comments")) && m.isNullAt(m.fieldIndex("shares")))
    val s = post.filter($"context" === "Social Media").collect().head
    assert(s.isNullAt(s.fieldIndex("rating")))
    assert(s.getAs[Int]("shares") === 2)
  }

  test("withIsResponse derives from response_to nullability") {
    val out = Views.withIsResponse(
      Seq(("p1", Some("p0")), ("p2", None))
        .toDF("post_id", "response_to"))
      .select("post_id", "is_response").as[(String, Boolean)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq(("p1", true), ("p2", false)))
  }
}
