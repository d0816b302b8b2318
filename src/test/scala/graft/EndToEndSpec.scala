package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.bronze.Gomus
import graft.core.Upsert
import graft.silver.Views

/** Minimal end-to-end pipeline run — the engine's analog of the
  * reference's CI stage `run_minimal_mining_pipeline.sh` (SURVEY.md §5.3):
  * raw report rows → bronze normalizers → upserted tables → second
  * incremental batch → silver union view → schema/acceptance invariants
  * (domains, key uniqueness, non-null permalinks).
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("bronze → upsert → incremental batch → silver view → invariants") {
    val dir = Files.createTempDirectory("graft-e2e").toString

    // ---- bronze: normalize a raw order report and upsert it (K1).
    val rawOrders1 = Seq(
      ("5001", "43840.96875", "77", "Ja", "bezahlt", "web"),
      ("5002", "44000.5", "88", "Ja", "offen", "kasse"))
      .toDF("Bestellnummer", "Erstellt", "Kundennummer", "ist gültig?",
        "Bezahlstatus", "Herkunft")
    val mapping = Seq((77, 424242), (88, 515151)).toDF("gomus_id", "customer_id")
    val orders1 = Gomus.extractOrders(rawOrders1, mapping)
    Upsert.upsertWrite(spark, s"$dir/gomus_order", orders1, Seq("order_id"))

    // ---- incremental batch: one corrected row (paid flips) + one new.
    val rawOrders2 = Seq(
      ("5002", "44000.5", "88", "Ja", "bezahlt", "kasse"),
      ("5003", "44010.0", "77", "Nein", "offen", "web"))
      .toDF("Bestellnummer", "Erstellt", "Kundennummer", "ist gültig?",
        "Bezahlstatus", "Herkunft")
    Upsert.upsertWrite(spark, s"$dir/gomus_order",
      Gomus.extractOrders(rawOrders2, mapping), Seq("order_id"))

    val orders = spark.read.parquet(s"$dir/gomus_order")
    assert(orders.count() === 3)
    // PK conflict resolved incoming-wins: 5002 is now paid.
    assert(orders.filter($"order_id" === 5002).select("paid")
      .as[Boolean].head() === true)
    // Key uniqueness invariant (reference check_posts-style).
    assert(orders.groupBy("order_id").count().filter($"count" > 1).count() === 0)

    // ---- silver: post union over two review sources + social.
    val ts = Timestamp.valueOf("2021-06-01 12:00:00")
    val app = Seq(("Apple Appstore", "r1", "great", ts, 5, 3, "https://x/r1"))
      .toDF("source", "review_id", "text", "post_date", "rating", "likes",
        "permalink")
    val museum = Seq(("Google Maps", "m1", "nice", ts, 4, "https://x/m1"))
      .toDF("source", "review_id", "text", "post_date", "rating", "permalink")
    val fb = Views.fbPostGenerated(
      Seq(("pg", "42", "hello", ts, true, 7, 1, 2,
        null.asInstanceOf[String]))
        .toDF("page_id", "post_id", "text", "post_date", "is_from_museum",
          "likes", "comments", "shares", "response_to"))
    val social = Views.withIsResponse(fb)
      .withColumn("source", lit("Facebook Post"))
      .select(col("source"), col("fb_post_id").as("post_id"), col("text"),
        col("post_date"), col("is_from_museum"), col("is_response"),
        col("likes"), col("comments"), col("shares"), col("permalink"))
    val post = Views.postUnion(app, museum, social)

    // Acceptance invariants (reference tests/schema/check_posts.py:20-100):
    // source domain, (source, post_id) uniqueness, permalink non-null and
    // URL-shaped.
    assert(post.count() === 3)
    assert(post.groupBy("source", "post_id").count()
      .filter($"count" > 1).count() === 0)
    val domains = post.select("context").distinct().as[String].collect().toSet
    assert(domains === Set("App Review", "Museum Review", "Social Media"))
    assert(post.filter($"permalink".isNull ||
      !$"permalink".rlike("^https://")).count() === 0)

    // ---- gold: per-customer order rollup joins the upserted table.
    val gold = orders.groupBy("customer_id")
      .agg(count(lit(1)).as("order_count"),
        sum(when($"paid", 1).otherwise(0)).as("paid_count"))
    val g77 = gold.filter($"customer_id" === 424242).collect().head
    assert(g77.getAs[Long]("order_count") === 2)
    assert(g77.getAs[Long]("paid_count") === 1)
  }
}
