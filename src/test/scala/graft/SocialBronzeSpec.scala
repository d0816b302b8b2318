package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.bronze.Social

/** Social-source fidelity gate: run the engine's normalizers over the
  * REFERENCE'S OWN fixtures (tests/test_data/{facebook,instagram,twitter,
  * google_maps}) and compare against its expected CSVs — the same ground
  * truth test_facebook/test_instagram/test_twitter/test_gmaps assert.
  * Skipped (assume) when the reference checkout is absent. */
class SocialBronzeSpec extends SparkSpec {
  import spark.implicits._

  private val refData = Paths.get("/root/reference/tests/test_data")

  private def path(p: String): String = refData.resolve(p).toString

  private def readText(p: String): String =
    new String(Files.readAllBytes(refData.resolve(p)), "UTF-8")

  /** Canonical row images: every cell to string, null → "", booleans
    * capitalized like pandas to_csv. */
  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => ""
      case true => "True"
      case false => "False"
      case v => v.toString
    })

  private def expectedCsv(p: String): Seq[Seq[String]] = {
    val df = spark.read
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(path(p))
    rows(df.select(df.columns.map(col): _*))
  }

  test("fb posts reproduce post_expected.csv") {
    assume(Files.isDirectory(refData))
    val pages = spark.read.option("multiLine", "true")
      .json(path("facebook/post_actual.json"))
    assert(rows(Social.fbPosts(pages)) ===
      expectedCsv("facebook/post_expected.csv"))
  }

  test("fb comments reproduce post_comments_expected.csv") {
    assume(Files.isDirectory(refData))
    // The reference harness feeds post_expected_single.csv back through
    // pandas WITHOUT dtype=str, so the post id int-parses (leading zero
    // dropped) before str() — hence post_id "987654321".
    val batches = Seq(("1234567890", "987654321",
      readText("facebook/post_comments_actual.json")))
      .toDF("page_id", "post_id", "payload")
    val got = Social.fbComments(batches, "Museum Barberini")
      .orderBy("post_date")
    assert(rows(got) === expectedCsv("facebook/post_comments_expected.csv"))
  }

  test("fb insights reproduce post_insights_expected.csv") {
    assume(Files.isDirectory(refData))
    val batches = Seq(("1234567890", "987654321",
      readText("facebook/post_insights_actual.json")))
      .toDF("page_id", "post_id", "payload")
    val got = Social.fbInsights(batches, "2020-01-01 00:00:05")
    assert(rows(got) === expectedCsv("facebook/post_insights_expected.csv"))
  }

  test("ig posts reproduce post_expected.csv") {
    assume(Files.isDirectory(refData))
    val pages = spark.read.option("multiLine", "true")
      .json(path("instagram/post_actual.json"))
    assert(rows(Social.igPosts(pages)) ===
      expectedCsv("instagram/post_expected.csv"))
  }

  test("ig posts timestamp rendering is session-timezone independent") {
    assume(Files.isDirectory(refData))
    val pages = spark.read.option("multiLine", "true")
      .json(path("instagram/post_actual.json"))
    val utc = rows(Social.igPosts(pages))
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
      assert(rows(Social.igPosts(pages)) === utc,
        "igPosts output shifted with the session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
  }

  test("ig post insights + condense deltas reproduce post_insights_expected.csv") {
    assume(Files.isDirectory(refData))
    // The reference harness re-reads the posts CSV without dtype=str, so
    // the VIDEO post's id "0123456789" int-parses to 123456789; insights
    // payloads are served per post (video json for the video post).
    val batches = Seq(
      ("123456789", "VIDEO",
        readText("instagram/post_insights_video_actual.json")),
      ("9876543210", "IMAGE",
        readText("instagram/post_insights_no_video_actual.json")))
      .toDF("ig_post_id", "media_type", "payload")
    val fresh = Social.igPostInsights(batches, "2020-01-01 00:00:05")
    // latest stored row seeded by the reference test (test_instagram.py:
    // 161-163); the second post has no prior → deltas 0
    val latest = Seq(("123456789", 5L, 4L, 3L, 2L, 1L))
      .toDF("ig_post_id", "impressions", "reach", "total_interactions",
        "saved", "video_views")
    val got = graft.core.Condense.withDeltas(fresh, latest,
      Seq("ig_post_id"),
      Seq("impressions", "reach", "total_interactions", "saved",
        "video_views"))
      .orderBy(col("impressions"))
    assert(rows(got) === expectedCsv("instagram/post_insights_expected.csv"))
  }

  test("ig audience gender/age reproduces audience_gender_age_expected.csv") {
    assume(Files.isDirectory(refData))
    val pages = spark.read.option("multiLine", "true")
      .json(path("instagram/audience_gender_age_actual.json"))
    assert(rows(Social.igAudienceGenderAge(pages, "2020-01-01 00:00:05")) ===
      expectedCsv("instagram/audience_gender_age_expected.csv"))
  }

  test("ig audience origin reproduces audience_origin_expected.csv") {
    assume(Files.isDirectory(refData))
    val pages = spark.read.option("multiLine", "true")
      .json(path("instagram/audience_origin_actual.json"))
    assert(rows(Social.igAudienceOrigin(pages, "2020-01-01 00:00:05")) ===
      expectedCsv("instagram/audience_origin_expected.csv"))
  }

  test("ig profile metrics development reproduces its expected csv") {
    assume(Files.isDirectory(refData))
    val pages = spark.read.option("multiLine", "true")
      .json(path("instagram/profile_metrics_development_actual.json"))
    assert(rows(Social.igProfileMetricsDevelopment(pages)) ===
      expectedCsv("instagram/profile_metrics_development_expected.csv"))
  }

  test("ig total profile metrics reproduces its expected csv") {
    assume(Files.isDirectory(refData))
    val pages = spark.read.option("multiLine", "true")
      .json(path("instagram/total_profile_metrics_actual.json"))
    assert(rows(Social.igTotalProfileMetrics(pages, "2020-01-01 00:00:05")) ===
      expectedCsv("instagram/total_profile_metrics_expected.csv"))
  }

  test("fb insights reject the malformed edge-case payload like the reference") {
    assume(Files.isDirectory(refData))
    // post_insights_edgecases.json plants non-integer reaction counts
    // (like: 3.3 as a json FLOAT, "anger": "4.4" as a STRING); the
    // reference aborts with ValueError at "4.4" (test_facebook.py:193-211
    // — python int() truncates the float but rejects the string). The
    // engine's ANSI IntegerType cast rejects at the FIRST non-integral
    // count ('3.3' — json numbers and strings are indistinguishable once
    // in the string map). Same contract either way: a malformed insights
    // payload is REFUSED, never silently mis-counted.
    val batches = Seq(("1234567890", "987654321",
      readText("facebook/post_insights_edgecases.json")))
      .toDF("page_id", "post_id", "payload")
    val e = intercept[Exception] {
      Social.fbInsights(batches, "2020-01-01 00:00:05").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("CAST_INVALID_INPUT") &&
        (m.contains("'3.3'") || m.contains("'4.4'"))),
      s"rejection must name a malformed reaction literal, got: ${messages(e)}")
  }

  test("empty raw tweets extract to the empty-output contract") {
    assume(Files.isDirectory(refData))
    val raw = spark.read.option("header", "true")
      .csv(path("twitter/empty_raw_tweets.csv"))
    val got = Social.tweets(raw)
    assert(got.count() === 0L)
    assert(rows(got) === expectedCsv("twitter/empty_extracted_tweets.csv"))
  }

  test("empty raw tweets yield the empty performance contract") {
    assume(Files.isDirectory(refData))
    val raw = spark.read.option("header", "true")
      .csv(path("twitter/empty_raw_tweets.csv"))
    val got = Social.tweetPerformance(raw, "YYYY-MM-DD HH:mm:ss")
    assert(got.count() === 0L)
    assert(rows(got) === expectedCsv("twitter/empty_tweet_performance.csv"))
  }

  test("tweets reproduce expected_extracted_tweets.csv") {
    assume(Files.isDirectory(refData))
    val raw = spark.read.option("header", "true")
      .csv(path("twitter/raw_tweets.csv"))
    assert(rows(Social.tweets(raw).orderBy("post_date")) ===
      expectedCsv("twitter/expected_extracted_tweets.csv"))
  }

  test("tweet performance reproduces expected_tweet_performance.csv") {
    assume(Files.isDirectory(refData))
    val raw = spark.read.option("header", "true")
      .csv(path("twitter/raw_tweets.csv"))
    // the expected file carries the literal timestamp placeholder the
    // reference test substitutes with frozen now(); inject it verbatim
    val got = Social.tweetPerformance(raw, "YYYY-MM-DD HH:mm:ss")
      .orderBy(col("likes").desc)
    assert(rows(got) === expectedCsv("twitter/expected_tweet_performance.csv"))
  }

  // The reference's own inline XML fixture (test_apple_appstore.py:13-78)
  private val appstoreXmlFrame =
    """<?xml version="1.0" encoding="utf-8"?>
      |<feed xmlns:im="http://itunes.apple.com/rss"
      |    xmlns="http://www.w3.org/2005/Atom" xml:lang="de">
      |<link rel="not-next" href="do not follow"/>
      |<link rel="next" href="https://itunes.apple.com/de/rss/page=2/xml"/>
      |%s
      |</feed>""".stripMargin
  private val appstoreEntry =
    """<entry>
      |  <updated>2012-11-10T09:08:07-07:00</updated>
      |  <id>5483431986</id>
      |  <title>I'm a fish</title>
      |  <content type="text">
      |  The fish life is thug af #okboomer
      |  </content>
      |  <im:voteSum>9</im:voteSum>
      |  <im:voteCount>42</im:voteCount>
      |  <im:rating>5</im:rating>
      |  <im:version>2.10.7</im:version>
      |  <author><name>Blubb</name></author>
      |  <content type="html">
      |  <somehtml> note=&quot;We don't want to parse this&quot;</somehtml>
      |  </content>
      |</entry>""".stripMargin

  test("appstore XML page parses like the reference's xmltodict path") {
    val (entries, next) =
      Social.appstoreEntries(appstoreXmlFrame.format(appstoreEntry))
    assert(next.contains("https://itunes.apple.com/de/rss/page=2/xml"))
    assert(entries.length === 1)
    val r = entries.head
    assert(r.appstore_review_id === "5483431986")
    assert(r.text === "The fish life is thug af #okboomer")
    assert(r.rating === "5" && r.app_version === "2.10.7")
    assert(r.vote_count === "42" && r.vote_sum === "9")
    assert(r.title === "I'm a fish")
    assert(r.date === "2012-11-10T09:08:07-07:00")
    // empty frame: no entries, but pagination link still parsed
    val (none, _) = Social.appstoreEntries(appstoreXmlFrame.format(""))
    assert(none.isEmpty)
  }

  test("appstore cross-country dedup keeps the first sorted country") {
    val pages = Seq(
      ("US", appstoreXmlFrame.format(appstoreEntry)),
      ("DE", appstoreXmlFrame.format(appstoreEntry)),
      ("PL", appstoreXmlFrame.format(""))).toDF("country_code", "payload")
    val got = Social.appstoreReviews(spark, pages, "288286261")
    assert(got.count() === 1) // same review in US+DE collapses
    val row = got.collect().head
    assert(row.getAs[String]("country_code") === "DE")
    assert(row.getAs[String]("app_id") === "288286261")
    assert(row.getAs[String]("text") === "The fish life is thug af #okboomer")
  }

  test("gplay reviews flatten per-language pages and dedup across languages") {
    // mirrors test_gplay_reviews.py test_drop_duplicate_reviews /
    // test_same_review_for_multiple_country_codes / test_umlauts
    def page(reviews: String) = s"""{"results": [$reviews]}"""
    val shared =
      """{"id": "gp:1", "date": "2020-01-01", "score": 5,
        |"text": "Dös wär ja wüs wänn", "thumbsUp": 7, "version": "1.2"}"""
        .stripMargin
    val deOnly =
      """{"id": "gp:2", "date": "2020-01-02", "score": 3,
        |"text": "ganz gut", "thumbsUp": 0, "version": "1.3"}""".stripMargin
    val pages = Seq(
      ("de", page(s"$shared, $deOnly")),
      ("en", page(shared)),
      ("pl", page(""))).toDF("lang", "payload")
    val got = Social.gplayReviews(pages, "com.barberini.museum")
      .orderBy("playstore_review_id")
    assert(got.columns.toSeq === Seq("playstore_review_id", "text",
      "rating", "app_version", "likes", "date", "app_id"))
    val rowsOut = got.collect().map(_.toSeq)
    assert(rowsOut.length === 2) // shared review collapses across languages
    assert(rowsOut(0) === Seq("gp:1", "Dös wär ja wüs wänn", 5, "1.2", 7,
      "2020-01-01", "com.barberini.museum"))
    assert(rowsOut(1) === Seq("gp:2", "ganz gut", 3, "1.3", 0,
      "2020-01-02", "com.barberini.museum"))
  }

  test("google maps reviews reproduce expected_extracted_reviews.csv") {
    assume(Files.isDirectory(refData))
    val raw = spark.read.option("multiLine", "true")
      .json(path("google_maps/raw_reviews.json"))
    assert(rows(Social.gmapsReviews(raw)) ===
      expectedCsv("google_maps/expected_extracted_reviews.csv"))
  }
}
