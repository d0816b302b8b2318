package graft

import org.apache.spark.sql.functions._

import graft.functions.Domains
import graft.queries.Catalog

/** Round-14 operators: the composed web-curation pipeline's planted
  * verdict classes, the public-suffix registrable-domain rule, the PII
  * fixture's class-disjointness (the assumption the fused redaction
  * rides on — r13 ADVICE), and the filter-aware quota sampler's
  * renormalization invariants.
  */
class Round14OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("registrable domain applies the public-suffix rule") {
    import spark.implicits._
    val got = Seq(
      "wiki.example.co.uk", // multi-label suffix → 3 labels
      "a.b.example.co.uk",  // deep host, same registrable
      "example.co.uk",      // already registrable
      "www.example.com",    // single-label TLD → 2 labels
      "example.com",        // bare registrable
      "shop.site.com.au",   // second multi-label family
      "co.uk")              // bare suffix (fewer labels than match+1)
      .toDF("host")
      .select(Domains.registrable(col("host")).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("example.co.uk", "example.co.uk", "example.co.uk",
      "example.com", "example.com", "site.com.au", "co.uk"))
  }

  test("pipe_web_curation plants one domain per verdict class and the " +
      "authority ranks are the 4-iteration integer PageRank constants") {
    val out = Catalog.byName("pipe_web_curation").spark(spark, sfDir)
      .collect()
    assert(out.length == 50)
    val byDomain = out.groupBy(_.getAs[String]("domain"))
    assert(byDomain.keySet == Set("example.com", "example.biz",
      "sample.org", "tracker.net", "example.co.uk"))
    // one verdict class per planted domain, all four classes present
    val verdicts = byDomain.map { case (d, rows) =>
      val vs = rows.map(_.getAs[String]("verdict")).distinct
      assert(vs.length == 1, s"$d has mixed verdicts: ${vs.toSeq}")
      d -> vs.head
    }
    assert(verdicts == Map(
      "example.com" -> "keep",
      "example.biz" -> "lowq_domain",
      "sample.org" -> "low_authority",
      "tracker.net" -> "blocklist",
      "example.co.uk" -> "keep"))
    // the distinct domain edge set is scale-independent, so the
    // 4-iteration micro-unit ranks are CONSTANTS (docstring derivation)
    val auth = byDomain.map { case (d, rows) =>
      d -> rows.map(_.getAs[Long]("authority")).distinct.head
    }
    assert(auth == Map(
      "example.com" -> 2191496L, "example.biz" -> 1773795L,
      "sample.org" -> 214397L, "tracker.net" -> 316993L,
      "example.co.uk" -> 503304L))
    // mojibake repair ran on the kept text: no double-encoded lead
    // bytes survive, and the repaired German umlaut appears
    val cleans = out.map(_.getAs[String]("text_clean"))
    assert(!cleans.exists(t => t.contains("Ã") || t.contains("â€")),
      "mojibake survived the repair chain")
    // most (not all — a p1 block can land lowstop and drop its plant)
    assert(cleans.count(_.contains("Müller")) > 30,
      "repaired umlaut text missing from kept content")
    // one DOM parse found all six leaf blocks and all eight hrefs
    assert(out.forall(_.getAs[Long]("n_blocks") == 6L))
    assert(out.forall(_.getAs[Long]("n_outlinks") == 8L))
  }

  test("pipe_pii_redact fixture classes are position-disjoint: every " +
      "counted candidate is masked or a checksum-broken survivor") {
    // The fused redaction equals the 12-pass chain ONLY when no two
    // class matches overlap (an IPv4 inside an email would be consumed
    // by the email alternative and its <IP4> mask would vanish). Assert
    // the output invariant per row: each per-class audit count equals
    // the number of masks (valid classes) in the redacted text — a
    // nested/overlapping match would break the equality.
    def nOcc(c: org.apache.spark.sql.Column, needle: String) =
      ((length(c) - length(replace(c, lit(needle), lit("")))) /
        needle.length).cast("long")
    val out = Catalog.byName("pipe_pii_redact").spark(spark, sfDir)
    val bad = out.filter(
      nOcc(col("redacted"), "<EMAIL>") =!= col("n_emails") ||
        nOcc(col("redacted"), "<PHONE>") =!= col("n_phones") ||
        nOcc(col("redacted"), "<IP4>") =!= col("n_ip4") ||
        nOcc(col("redacted"), "<IP6>") =!= col("n_ip6") ||
        nOcc(col("redacted"), "<CC>") =!= col("n_cards_valid") ||
        nOcc(col("redacted"), "<IBAN>") =!= col("n_ibans_valid"))
      .count()
    assert(bad == 0L, s"$bad rows where per-class counts disagree with " +
      "masks — class patterns overlap on this fixture")
    // checksum-broken twins SURVIVE: unmasked 16-digit runs remain
    // exactly where seen > valid
    val survivors = out.filter(
      size(filter(split(col("redacted"), "\\s+"),
        t => t.rlike("^\\d{16}$"))).cast("long") =!=
        col("n_cards_seen") - col("n_cards_valid")).count()
    assert(survivors == 0L,
      "broken-card survivors disagree with seen-valid audit delta")
  }

  test("pipe_quota_sample renormalizes rates from post-filter survivors") {
    val out = Catalog.byName("pipe_quota_sample").spark(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (total, after, sampled) = (r.getAs[Long]("n_total"),
        r.getAs[Long]("n_after_filter"), r.getAs[Long]("n_sampled"))
      assert(sampled <= after && after <= total,
        s"ordering violated for ${r.getAs[String]("lang")}")
      assert(after < total,
        "every lang spans the dropped domains, so filtering must bite")
      val rate = r.getAs[Long]("rate_millis")
      assert(rate >= 1L && rate <= 1000L)
    }
    // the rarest SURVIVING language keeps everything (rate = 1000)
    assert(out.map(_.getAs[Long]("rate_millis")).max == 1000L)
    // filter drop is exactly the two planted domains: doc_id%5 ∈ {1,3}
    val expectAfter = graft.core.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 5 =!= 1 && col("doc_id") % 5 =!= 3)
      .count()
    assert(out.map(_.getAs[Long]("n_after_filter")).sum == expectAfter,
      "post-filter mass must equal the non-planted 3/5 of the corpus")
  }

  test("sim_rerank_blend emits a full top-5 per query with in-range " +
      "pair features") {
    val out = Catalog.byName("sim_rerank_blend").spark(spark, sfDir)
      .collect()
    assert(out.length == 25)
    val perQ = out.groupBy(_.getAs[Long]("qid"))
    assert(perQ.size == 5 && perQ.values.forall(_.length == 5))
    out.foreach { r =>
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 5)
      assert(r.getAs[Int]("retrieval_rank") >= 1 &&
        r.getAs[Int]("retrieval_rank") <= 20)
      val sa = r.getAs[Long]("sign_agree")
      assert(sa >= 0L && sa <= 64L)
      assert(Set(0L, 1L).contains(r.getAs[Long]("label_match")))
      val blend = r.getAs[Double]("blend_score")
      assert(blend >= -1.0 && blend <= 1.0 + 0.1 + 0.1 + 1e-9)
    }
    // within each query the emitted ranks follow blend_score desc
    perQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      val scores = sorted.map(_.getAs[Double]("blend_score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}
