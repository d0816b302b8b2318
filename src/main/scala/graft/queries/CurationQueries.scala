package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond near-dup: the remaining transforms a
  * large-scale training-data job runs between "raw crawl" and "tokenizer
  * input" — benchmark decontamination, per-stratum mix sampling, and
  * token-budget shard packing.
  *
  * Scale posture: decontamination broadcasts the (small by construction)
  * eval-set n-gram table so the corpus side never shuffles for the probe;
  * sampling is a map-only deterministic hash test; shard packing windows
  * over (lang, stream) where `stream` is a hash split, so no packing
  * partition ever exceeds 1/N of a language and the sort stays bounded.
  */
/** The single source of truth for the curation gate/chunk parameters and
  * the shared expression builders — `text_repetition_filter`,
  * `text_chunk_split`, and the batch/streaming intake all read THESE, so
  * the "same thresholds / same geometry" parity the docs and
  * StreamingSpec claim is enforced structurally, not by convention.
  */
object CurationDefs {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  /** Repetition-gate thresholds (dup-bigram fraction, top-bigram token
    * coverage). */
  val DupMax = 0.08
  val TopMax = 0.2

  /** Chunk geometry: window length, stride, minimum tail length. */
  val ChunkLen = 32
  val ChunkStride = 24
  val ChunkMinTail = 8

  /** Lowercased whitespace tokens of `text` (the curation tokenizer). */
  def toks: Column = split(lower(col("text")), "\\s+")

  /** Adjacent-token bigram pairs of token array `t` as
    * array<struct<w1,w2>> (empty below 2 tokens) — shared by the LM
    * scorer and the DSIR featurizer so the pair geometry can't drift. */
  def bigramPairs(t: Column): Column =
    transform(sequence(lit(1), size(t) - 1), i =>
      struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2")))

  /** Stride-overlapped token-window chunking of a (doc_id, t) frame —
    * expression-only (sequence + explode + slice), no shuffle. */
  def chunkExplode(withToks: DataFrame): DataFrame =
    withToks
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")), lit(ChunkStride))).as("s"))
      .select(col("doc_id"), col("s").as("chunk_start"),
        (least(col("s") + (ChunkLen - 1), size(col("t"))) - col("s") + 1)
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("t"), col("s"),
          least(lit(ChunkLen), size(col("t")) - col("s") + 1))).as("chunk"))
      .filter(col("n_chunk_tokens") >= ChunkMinTail)
}

object CurationQueries extends QueryBase {
  import CurationDefs._

  /** Shared batch/streaming curation-intake transform: repetition quality
    * gate then stride-overlapped token chunking, both driven by
    * [[CurationDefs]]. The gate is the single-call `repetition_keep`
    * kernel rather than threshold arithmetic over `bigram_stats` fields:
    * Catalyst pushes the filter below the token projection by alias
    * substitution, and FilterExec evaluates each struct-field reference
    * independently — the one-call predicate keeps the stats pass at
    * exactly one kernel run per row wherever the filter lands. Every
    * step is a stateless row-level expression, so the SAME function runs
    * unchanged under Structured Streaming
    * ([[graft.streaming.Incremental.curationIntake]]) — no watermark or
    * state store; at continuous ingest scale this is pure map
    * parallelism.
    */
  def curateChunks(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    chunkExplode(
      docs.select(col("doc_id"), toks.as("t"))
        .filter(expr(s"repetition_keep(t, $DupMax, $TopMax)")))
  }

  /** Distinct word-5-grams of lower(text) — decontamination standard
    * practice probes long n-grams so natural re-use doesn't false-flag. */
  private def ngrams5(c: Column): Column = {
    val tk = split(lower(c), "\\s+")
    array_distinct(
      when(size(tk) >= 5,
        transform(sequence(lit(1), size(tk) - 4),
          i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
            element_at(tk, i + 2), element_at(tk, i + 3),
            element_at(tk, i + 4))))
        .otherwise(array().cast("array<string>")))
  }

  val all: Seq[Q] = Seq(
    // Benchmark decontamination: flag training docs sharing >= 3 distinct
    // word-5-grams with a held-out eval set. The fixture plants real
    // leaks (every eval doc re-keyed +100000 with a 2-token prefix —
    // an eval passage embedded in a crawl page); the threshold separates
    // planted leaks (~50 shared grams) from chance vocabulary collisions.
    // Plan shape: the eval n-gram table is small by construction and
    // BROADCAST, so the corpus side is map-only (explode + hash probe);
    // the only shuffle is the final groupBy over matched (doc, gram)
    // rows — contamination-sized, not corpus-sized. At 100 TB the same
    // plan holds: eval sets are fixed-size benchmarks, never fact-scale.
    Q(
      "dedup_decontaminate",
      (s, dir) => {
        val d = th(s, dir, "documents")
        val eval = d.filter(col("doc_id") % 25 === 0)
        val corpus = d.filter(col("doc_id") % 25 =!= 0)
          .select(col("doc_id"), col("text"))
          .unionByName(eval.select(
            (col("doc_id") + 100000L).as("doc_id"),
            concat(lit("leak marker "), col("text")).as("text")))
        val evalGrams = eval
          .select(explode(ngrams5(col("text"))).as("ng")).distinct()
        corpus.select(col("doc_id"), explode(ngrams5(col("text"))).as("ng"))
          .join(broadcast(evalGrams), Seq("ng"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"))
          .filter(col("n_hits") >= 3)
          .orderBy("doc_id")
      },
      Some("""
        WITH base AS (SELECT doc_id, text FROM documents),
        corpus AS (
          SELECT doc_id, text FROM base WHERE doc_id % 25 <> 0
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, 'leak marker ' || text AS text
          FROM base WHERE doc_id % 25 = 0),
        cg AS (
          SELECT doc_id,
                 unnest(list_distinct(CASE WHEN len(tk) >= 5
                   THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                         tk[i+3] || ' ' || tk[i+4]
                         FOR i IN range(1, len(tk) - 3)]
                   ELSE CAST([] AS VARCHAR[]) END)) AS ng
          FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk
                FROM corpus)),
        eg AS (
          SELECT DISTINCT
                 unnest(list_distinct(CASE WHEN len(tk) >= 5
                   THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                         tk[i+3] || ' ' || tk[i+4]
                         FOR i IN range(1, len(tk) - 3)]
                   ELSE CAST([] AS VARCHAR[]) END)) AS ng
          FROM (SELECT string_split_regex(lower(text), '\s+') AS tk
                FROM base WHERE doc_id % 25 = 0))
        SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM cg JOIN eg USING (ng)
        GROUP BY cg.doc_id HAVING count(*) >= 3
        ORDER BY doc_id"""),
      doc = "benchmark decontamination via 5-gram overlap against a " +
        "broadcast eval-set gram table; planted leak fixture"),

    // Training-mix stratified sampling: per-language keep rates applied
    // with the deterministic md5 hash-mod test (same mechanism as
    // pipe_sample_hash, per-stratum rate instead of global). Map-only:
    // the hash test evaluates inside the scan stage; the rollup below
    // exists to make the achieved mix checkable. At 100 TB this is the
    // one-pass "20% en / 30% de / 10% rest" mix cut with NO shuffle of
    // the kept rows themselves (downstream consumers read the filter).
    Q(
      "pipe_stratified_sample",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val rate = when(col("lang") === "en", lit(500L))
          .when(col("lang") === "de", lit(300L))
          .otherwise(lit(100L))
        val bucket = pmod(
          conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long"), lit(1000L))
        d.withColumn("kept", bucket < rate)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy("lang")
      },
      Some("""
        SELECT lang, count(*) AS n_total,
               CAST(sum(CASE WHEN
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 1000 <
                 (CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 300
                  ELSE 100 END)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents GROUP BY lang ORDER BY lang"""),
      doc = "per-stratum deterministic hash-mod sampling for training " +
        "mixes; map-only rate test, rollup verifies the achieved mix"),

    // Temperature-scaled mixture sampling (the UniMax-style alpha=0.5
    // resample): per-language keep rates DERIVED FROM THE DATA —
    // r_l = sqrt(n_min / n_l), so the rarest language keeps 100% and a
    // language 4x its size keeps 50%, flattening the mix toward
    // share^0.5. Rates are integerized to millis through sqrt + round
    // only (both IEEE exact-rounded, so Spark and DuckDB derive the SAME
    // integer rate — no pow() ulp hazard), then applied as the same
    // deterministic md5 hash-mod test as pipe_stratified_sample.
    // Plan: one language-cardinality agg + 1-row min, broadcast back;
    // the corpus side stays map-only.
    Q(
      "pipe_temperature_mix",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val counts = d.groupBy("lang").agg(count(lit(1)).as("n_l"))
        val minN = counts.agg(min(col("n_l")).as("n_min"))
        val rates = counts.crossJoin(broadcast(minN))
          .select(col("lang"),
            round(lit(1000.0) *
              sqrt(col("n_min").cast("double") / col("n_l").cast("double")))
              .cast("long").as("rate_millis"))
        val bucket = pmod(
          conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long"), lit(1000L))
        d.join(broadcast(rates), Seq("lang"))
          .withColumn("kept", bucket < col("rate_millis"))
          .groupBy("lang", "rate_millis")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy("lang")
      },
      Some("""
        WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
        r AS (
          SELECT lang,
                 CAST(round(1000 * sqrt(CAST((SELECT min(n_l) FROM c) AS DOUBLE)
                                        / CAST(n_l AS DOUBLE))) AS BIGINT)
                   AS rate_millis
          FROM c)
        SELECT d.lang, r.rate_millis, count(*) AS n_total,
               CAST(sum(CASE WHEN
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 1000 < r.rate_millis
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents d JOIN r ON d.lang = r.lang
        GROUP BY d.lang, r.rate_millis ORDER BY d.lang"""),
      doc = "temperature-scaled mixture sampling (alpha=0.5): data-derived " +
        "per-language rates sqrt(n_min/n_l), broadcast back over a " +
        "map-only hash test"),

    // Token-budget shard packing (sequence packing's distribution half):
    // assign docs to ~1500-token shards per (lang, stream), stream =
    // doc_id % 4 — the hash split that keeps every packing partition at
    // 1/N of a language, so the running-total window never sorts more
    // than one stream. At 100 TB: streams scale with the cluster (N =
    // executors), shards stay budget-sized, and no global sort exists.
    // A doc's shard is decided by its STARTING offset (cum - ntok), the
    // standard greedy rule — a shard may overflow by at most one doc.
    Q(
      "pipe_token_shards",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val ntok = size(split(lower(col("text")), "\\s+")).cast("long")
        val w = Window.partitionBy("lang", "stream").orderBy("doc_id")
        d.select(col("lang"), pmod(col("doc_id"), lit(4L)).as("stream"),
            col("doc_id"), ntok.as("ntok"))
          .withColumn("cum", sum(col("ntok")).over(w))
          .withColumn("shard",
            ((col("cum") - col("ntok")) / lit(1500L)).cast("long"))
          .groupBy("lang", "stream", "shard")
          .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"))
          .orderBy("lang", "stream", "shard")
      },
      Some("""
        WITH t AS (
          SELECT lang, doc_id % 4 AS stream, doc_id,
                 CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
                   AS ntok
          FROM documents),
        c AS (
          SELECT lang, stream, ntok,
                 CAST(sum(ntok) OVER (PARTITION BY lang, stream
                                      ORDER BY doc_id) AS BIGINT) AS cum
          FROM t)
        SELECT lang, stream, CAST((cum - ntok) // 1500 AS BIGINT) AS shard,
               count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS sum_tokens
        FROM c
        GROUP BY lang, stream, shard
        ORDER BY lang, stream, shard"""),
      doc = "token-budget shard packing: greedy cumulative assignment " +
        "inside hash-split (lang, stream) packing partitions"),

    // Domain-level curation (r12 verdict item 8) — the CommonCrawl-
    // pipeline stage between URL normalization and quality scoring:
    // registrable-domain extraction (public-suffix rule,
    // [[graft.functions.Domains]] — `wiki.example.co.uk` pools under
    // `example.co.uk`, not `co.uk`; r13 verdict item 8), a BROADCAST
    // blocklist, and a per-domain quality prior joined back to every
    // document. The crawl frontier is minted deterministically (five
    // hosts, one on a multi-label public suffix; docs on the spam host
    // get repeated commerce tokens appended so their DOMAIN's pooled
    // distinct-token ratio drops — the planted low-quality domain).
    // Quality is integer-exact:
    // per-doc (distinct tokens, tokens) counts, pooled per domain as two
    // integer sums, one rounded division at the end; the low-quality
    // gate is the cross-multiplied 20·Σdistinct < 7·Σtokens (pooled
    // ratio < 0.35 — planted domain sits at ~0.29, organic ones ≥ 0.42).
    //
    // Plan shape at 100 TB: quality counts are map-only on the scan; the
    // ONLY keyed shuffle is the domain rollup, whose output is
    // domain-cardinality (thousands, not documents) and re-enters as a
    // BROADCAST — the corpus never reshuffles. The blocklist is a
    // broadcast by construction. Verdict precedence: blocklist, then
    // low-quality domain, then keep.
    Q(
      "pipe_domain_filter",
      (s, dir) => {
        val host = element_at(array(
          lit("news.example.com"), lit("spam-ads.example.biz"),
          lit("blog.sample.org"), lit("cdn.tracker.net"),
          lit("wiki.example.co.uk")), (col("doc_id") % 5 + 1).cast("int"))
        val scoreText = when(col("doc_id") % 5 === 1,
          concat(col("text"), lit(" buy" * 30))).otherwise(col("text"))
        val base = t(s, dir, "documents")
          .select(col("doc_id"), host.as("host"),
            split(lower(scoreText), " ").as("tk"))
          .withColumn("domain",
            graft.functions.Domains.registrable(col("host")))
          .select(col("doc_id"), col("domain"),
            size(array_distinct(col("tk"))).cast("long").as("qn"),
            size(col("tk")).cast("long").as("qd"))
        val dom = base.groupBy("domain")
          .agg(count(lit(1)).as("n_dom_docs"),
            sum("qn").as("sqn"), sum("qd").as("sqd"))
        val block = s.createDataFrame(Seq(Tuple1("tracker.net")))
          .toDF("domain").withColumn("blocked", lit(true))
        base.join(broadcast(dom), Seq("domain"))
          .join(broadcast(block), Seq("domain"), "left")
          .select(col("doc_id"), col("domain"),
            round(col("qn").cast("double") / col("qd"), 6).as("q"),
            round(col("sqn").cast("double") / col("sqd"), 6).as("dom_q"),
            col("n_dom_docs"),
            when(col("blocked"), "blocklist")
              .when(lit(20) * col("sqn") < lit(7) * col("sqd"),
                "lowq_domain")
              .otherwise("keep").as("verdict"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id,
            CASE doc_id % 5 WHEN 0 THEN 'news.example.com'
                            WHEN 1 THEN 'spam-ads.example.biz'
                            WHEN 2 THEN 'blog.sample.org'
                            WHEN 3 THEN 'cdn.tracker.net'
                            ELSE 'wiki.example.co.uk' END AS host,
            string_split(lower(CASE WHEN doc_id % 5 = 1
              THEN text || repeat(' buy', 30) ELSE text END), ' ') AS tk
          FROM documents),
        q AS (
          SELECT doc_id,
                 ${graft.functions.Domains.registrableSql("host")} AS domain,
                 CAST(len(list_distinct(tk)) AS BIGINT) AS qn,
                 CAST(len(tk) AS BIGINT) AS qd
          FROM b),
        dom AS (
          SELECT domain, count(*) AS n_dom_docs,
                 CAST(sum(qn) AS BIGINT) AS sqn,
                 CAST(sum(qd) AS BIGINT) AS sqd
          FROM q GROUP BY domain)
        SELECT q.doc_id, q.domain,
               round(qn * 1.0 / qd, 6) AS q,
               round(sqn * 1.0 / sqd, 6) AS dom_q,
               n_dom_docs,
               CASE WHEN q.domain = 'tracker.net' THEN 'blocklist'
                    WHEN 20 * sqn < 7 * sqd THEN 'lowq_domain'
                    ELSE 'keep' END AS verdict
        FROM q JOIN dom ON dom.domain = q.domain
        ORDER BY doc_id"""),
      doc = "domain-level curation: public-suffix registrable-domain " +
        "extraction (functions/Domains, PSL longest-suffix rule), " +
        "broadcast blocklist, per-domain pooled quality prior joined " +
        "back (integer-exact counts, one domain-sized aggregate); " +
        "planted blocklisted, low-quality, and co.uk domains"),

    // The web-curation pipeline COMPOSED end-to-end (r13 verdict item 1)
    // — the CommonCrawl shape, one lineage over ONE shared frontier
    // instead of four queries minting four fixtures: minted page files →
    // binaryFile scan → own-parser DOM (ONE parse per page feeding BOTH
    // the block model and the outlink extractor) → jusText boilerplate
    // classification (TextQueries.blockVerdict — the shared integer
    // thresholds) → mojibake repair of the kept text
    // (TextQueries.unicodeFixChain) → outlink domain graph
    // (functions/Domains PSL rule) → integer-exact PageRank as domain
    // AUTHORITY (graft.ml.PageRank, 4 iterations) → domain filter
    // verdict with THREE priors: broadcast blocklist, pooled quality
    // (3·Σdistinct < Σtokens ⟺ ratio < 1/3), and low authority
    // (20·r < Σr ⟺ rank < mean/4).
    //
    // The frontier plants one domain per failure class: cdn.tracker.net
    // is blocklisted, spam-ads.example.biz gets 25 "buy the" pairs per
    // page (pooled distinct-token ratio ~0.24 vs organic ≥ 0.39),
    // blog.sample.org is linked by NOBODY (the ring redirects around it,
    // so its 4-iteration rank 214397 sits under the mean/4 threshold
    // while the next-lowest, 316993, clears it — constants are
    // scale-independent because the DISTINCT domain edge set is the
    // same 12 edges at any corpus size), and wiki.example.co.uk
    // exercises the multi-label public suffix through every stage.
    //
    // Plan shape at 100 TB: the page side is ONE scan → map-only parse +
    // classify + repair (persisted once — it feeds the doc output, the
    // domain rollup, and the edge extractor; without the persist the
    // three consumers would re-run the parse). The only keyed shuffles
    // are domain-sized: the quality rollup and PageRank's per-iteration
    // contributions over the 12-edge domain graph. Every join back to
    // the corpus is a BROADCAST. The mint is driver-side fixture
    // plumbing bounded scale-independently (doc_id % 10 = 0 AND
    // doc_id < 10000 ⇒ ≤ 1000 pages; ×K mints shift copy keys by 1e9).
    Q(
      "pipe_web_curation",
      (s, dir) => {
        val hosts = Seq("news.example.com", "spam-ads.example.biz",
          "blog.sample.org", "cdn.tracker.net", "wiki.example.co.uk")
        val out = graft.sources.Sources.scratchDir(dir, "webcur_pages")
        val frontier = t(s, dir, "documents")
          .filter(col("doc_id") % 10 === 0 && col("doc_id") < 10000)
          .select("doc_id", "text")
          .collect() // bounded fixture mint: <= 1000 pages at ANY scale
        val d = new java.io.File(out)
        d.mkdirs()
        Option(d.listFiles()).foreach(_.foreach(f =>
          if (f.getName.endsWith(".html")) f.delete()))
        frontier.foreach { r =>
          val id = r.getLong(0)
          val hid = ((id / 10) % 5).toInt
          val toks = r.getString(1).split(" ")
          val h = (toks.length + 1) / 2
          val nxt = if ((hid + 1) % 5 == 2) hosts(0) else hosts((hid + 1) % 5)
          val buy = if (hid == 1) " buy the" * 25 else ""
          val page = "<html><body>\n" +
            "<div class=\"nav\"><a href=\"/\">Home</a> | " +
            "<a href=\"/s\">Search</a> | <a href=\"/c\">Contact</a></div>\n" +
            "<p>" + toks.take(h).mkString(" ") +
            " MÃ¼ller sagte â€žhalloâ€œ â€“ CafÃ©</p>\n" +
            "<div>SUBSCRIBE NOW FOR PREMIUM ACCESS TODAY</div>\n" +
            "<p>" + toks.drop(h).mkString(" ") + buy + "</p>\n" +
            "<div class=\"rel\"><a href=\"HTTPS://WWW.Example.COM/p/" +
            (id % 50) + "?utm_source=feed&amp;id=" + (id % 7) +
            "\">M&uuml;ller-" + (id % 7) + "</a> " +
            "<a href=\"https://" + nxt + "/x/" + (id % 9) +
            "#frag\">next</a> " +
            "<a href=\"/local/" + (id % 4) + "\">self</a> " +
            "<a name=\"anchor-only\">skip</a></div>\n" +
            "<footer>(c) 2020 <a href=\"/p\">Privacy</a> " +
            "<a href=\"/t\">Terms</a></footer>\n</body></html>"
          java.nio.file.Files.write(
            new java.io.File(d, s"$id.html").toPath,
            page.getBytes("UTF-8"))
        }
        import s.implicits._
        val idRe = """(\d+)\.html$""".r.unanchored
        val pages = s.read.format("binaryFile")
          .option("pathGlobFilter", "*.html")
          .load(out)
          .select(col("path"), col("content"))
          .as[(String, Array[Byte])]
          .map { case (path, bytes) =>
            val id = idRe.findFirstMatchIn(path)
              .map(_.group(1).toLong).getOrElse(-1L)
            val dom = graft.sources.Html.parse(new String(bytes, "UTF-8"))
            val blocks = graft.sources.Html.leafBlocks(dom)
            val hrefs = dom.descendants.filter(_.tag == "a")
              .flatMap(_.attr("href"))
            (id, blocks, hrefs)
          }
          .toDF("doc_id", "blocks", "hrefs")
        val srcHost = element_at(array(hosts.map(lit(_)): _*),
          (pmod(expr("doc_id DIV 10"), lit(5)) + 1).cast("int"))
        def nBy(v: String) = size(filter(col("feat"),
          f => f.getField("v") === v)).cast("long")
        val perDoc = graft.core.CacheLedger.track(pages
          .select(col("doc_id"), col("hrefs"),
            transform(col("blocks"), b => struct(
              b.getField("_1").as("btext"),
              TextQueries.blockVerdict(b.getField("_1"), b.getField("_2"))
                .as("v"))).as("feat"))
          .select(col("doc_id"), col("hrefs"),
            size(col("feat")).cast("long").as("n_blocks"),
            nBy("content").as("n_content"),
            TextQueries.unicodeFixChain(array_join(transform(
              filter(col("feat"), f => f.getField("v") === "content"),
              f => f.getField("btext")), " ")).as("text_clean"),
            size(col("hrefs")).cast("long").as("n_outlinks"),
            graft.functions.Domains.registrable(srcHost).as("domain"),
            srcHost.as("host"))
          .select(col("doc_id"), col("hrefs"), col("n_blocks"),
            col("n_content"), col("text_clean"), col("n_outlinks"),
            col("domain"), col("host"),
            size(array_distinct(split(col("text_clean"), " ")))
              .cast("long").as("qn"),
            size(split(col("text_clean"), " ")).cast("long").as("qd"))
          .persist())
        val dstHost = lower(regexp_extract(
          when(col("href").startsWith("/"),
            concat(lit("https://"), col("host"), col("href")))
            .otherwise(col("href")),
          "^[A-Za-z]+://([^/?#]+)", 1))
        val edges = perDoc
          .select(col("domain").as("src"), explode(col("hrefs")).as("href"),
            col("host"))
          .select(col("src"),
            graft.functions.Domains.registrable(dstHost).as("dst"))
        val ranks = graft.ml.PageRank.run(edges, 4)
          .select(col("id").as("domain"), col("r").as("authority"))
        val rsum = ranks.agg(sum(col("authority")).as("total_r"))
        val dom = perDoc.groupBy("domain")
          .agg(sum(col("qn")).as("sqn"), sum(col("qd")).as("sqd"))
        val block = s.createDataFrame(Seq(Tuple1("tracker.net")))
          .toDF("domain").withColumn("blocked", lit(true))
        perDoc
          .join(broadcast(dom), Seq("domain"))
          .join(broadcast(ranks), Seq("domain"))
          .crossJoin(broadcast(rsum))
          .join(broadcast(block), Seq("domain"), "left")
          .select(col("doc_id"), col("domain"), col("n_blocks"),
            col("n_content"), col("n_outlinks"), col("text_clean"),
            round(col("sqn").cast("double") / col("sqd"), 6).as("dom_q"),
            col("authority"),
            when(col("blocked"), "blocklist")
              .when(lit(3) * col("sqn") < col("sqd"), "lowq_domain")
              .when(lit(20) * col("authority") < col("total_r"),
                "low_authority")
              .otherwise("keep").as("verdict"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH f AS (
          SELECT doc_id, ((doc_id // 10) % 5) AS hid,
                 string_split(text, ' ') AS toks,
                 (len(string_split(text, ' ')) + 1) // 2 AS h
          FROM documents WHERE doc_id % 10 = 0 AND doc_id < 10000),
        hostd AS (
          SELECT *,
            CASE hid WHEN 0 THEN 'news.example.com'
                     WHEN 1 THEN 'spam-ads.example.biz'
                     WHEN 2 THEN 'blog.sample.org'
                     WHEN 3 THEN 'cdn.tracker.net'
                     ELSE 'wiki.example.co.uk' END AS host,
            CASE (hid + 1) % 5 WHEN 0 THEN 'news.example.com'
                               WHEN 1 THEN 'spam-ads.example.biz'
                               WHEN 2 THEN 'news.example.com'
                               WHEN 3 THEN 'cdn.tracker.net'
                               ELSE 'wiki.example.co.uk' END AS next_host
          FROM f),
        hostd2 AS (
          SELECT *,
            ${graft.functions.Domains.registrableSql("host")} AS domain,
            ${graft.functions.Domains.registrableSql("next_host")}
              AS next_domain
          FROM hostd),
        blocks AS (
          SELECT doc_id, 1 AS bidx,
                 'Home | Search | Contact' AS btext, 17 AS link_len
          FROM hostd2
          UNION ALL
          SELECT doc_id, 2,
                 trim(regexp_replace(array_to_string(toks[1:h], ' ') ||
                   ' MÃ¼ller sagte â€žhalloâ€œ â€“ CafÃ©',
                   '\\s+', ' ', 'g')), 0
          FROM hostd2
          UNION ALL
          SELECT doc_id, 3, 'SUBSCRIBE NOW FOR PREMIUM ACCESS TODAY', 0
          FROM hostd2
          UNION ALL
          SELECT doc_id, 4,
                 trim(regexp_replace(array_to_string(toks[h+1:len(toks)],
                     ' ') ||
                   CASE WHEN hid = 1 THEN repeat(' buy the', 25)
                        ELSE '' END,
                   '\\s+', ' ', 'g')), 0
          FROM hostd2
          UNION ALL
          SELECT doc_id, 5,
                 'Müller-' || CAST(doc_id % 7 AS VARCHAR) ||
                   ' next self skip',
                 20
          FROM hostd2
          UNION ALL
          SELECT doc_id, 6, '(c) 2020 Privacy Terms', 12 FROM hostd2),
        cls AS (
          SELECT doc_id, bidx, btext,
            CASE WHEN 10 * link_len > 3 * len(btext) THEN 'link'
                 WHEN n_words < 4 THEN 'short'
                 WHEN 50 * n_stop < n_words THEN 'lowstop'
                 ELSE 'content' END AS v
          FROM (
            SELECT *, len(words) AS n_words,
                   len(list_filter(words, w -> list_contains(
                     ['the', 'a', 'of', 'and', 'to'], lower(w)))) AS n_stop
            FROM (SELECT *, list_filter(string_split(btext, ' '),
                              w -> w <> '') AS words
                  FROM blocks))),
        docs2 AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
                 CAST(count(*) FILTER (WHERE v = 'content') AS BIGINT)
                   AS n_content,
                 coalesce(string_agg(btext, ' ' ORDER BY bidx)
                   FILTER (WHERE v = 'content'), '') AS kept
          FROM cls GROUP BY doc_id),
        clean AS (
          SELECT doc_id,
                 ${TextQueries.unicodeFixSql("kept")} AS text_clean
          FROM docs2),
        q AS (
          SELECT c.doc_id, h.domain, d.n_blocks, d.n_content, c.text_clean,
                 CAST(len(list_distinct(string_split(c.text_clean, ' ')))
                   AS BIGINT) AS qn,
                 CAST(len(string_split(c.text_clean, ' ')) AS BIGINT) AS qd
          FROM clean c JOIN docs2 d ON d.doc_id = c.doc_id
                       JOIN hostd2 h ON h.doc_id = c.doc_id),
        dom AS (
          SELECT domain, CAST(sum(qn) AS BIGINT) AS sqn,
                 CAST(sum(qd) AS BIGINT) AS sqd
          FROM q GROUP BY domain),
        edges AS (
          SELECT DISTINCT domain AS src, domain AS dst FROM hostd2
          UNION
          SELECT DISTINCT domain, 'example.com' FROM hostd2
          UNION
          SELECT DISTINCT domain, next_domain FROM hostd2),
        deg AS (SELECT src, count(*) AS dg FROM edges GROUP BY 1),
        nodes AS (SELECT DISTINCT nid FROM (
          SELECT src AS nid FROM edges UNION SELECT dst FROM edges)),
        p0 AS (SELECT nid, CAST(1000000 AS BIGINT) AS r FROM nodes),
        p1 AS (
          SELECT n.nid, CAST(150000 + coalesce(c.s, 0) AS BIGINT) AS r
          FROM nodes n LEFT JOIN (
            SELECT e.dst, CAST(sum((85 * p.r) // (100 * d.dg)) AS BIGINT)
              AS s
            FROM p0 p JOIN edges e ON p.nid = e.src
                      JOIN deg d ON d.src = e.src
            GROUP BY e.dst) c ON n.nid = c.dst),
        p2 AS (
          SELECT n.nid, CAST(150000 + coalesce(c.s, 0) AS BIGINT) AS r
          FROM nodes n LEFT JOIN (
            SELECT e.dst, CAST(sum((85 * p.r) // (100 * d.dg)) AS BIGINT)
              AS s
            FROM p1 p JOIN edges e ON p.nid = e.src
                      JOIN deg d ON d.src = e.src
            GROUP BY e.dst) c ON n.nid = c.dst),
        p3 AS (
          SELECT n.nid, CAST(150000 + coalesce(c.s, 0) AS BIGINT) AS r
          FROM nodes n LEFT JOIN (
            SELECT e.dst, CAST(sum((85 * p.r) // (100 * d.dg)) AS BIGINT)
              AS s
            FROM p2 p JOIN edges e ON p.nid = e.src
                      JOIN deg d ON d.src = e.src
            GROUP BY e.dst) c ON n.nid = c.dst),
        p4 AS (
          SELECT n.nid, CAST(150000 + coalesce(c.s, 0) AS BIGINT) AS r
          FROM nodes n LEFT JOIN (
            SELECT e.dst, CAST(sum((85 * p.r) // (100 * d.dg)) AS BIGINT)
              AS s
            FROM p3 p JOIN edges e ON p.nid = e.src
                      JOIN deg d ON d.src = e.src
            GROUP BY e.dst) c ON n.nid = c.dst),
        rsum AS (SELECT CAST(sum(r) AS BIGINT) AS total_r FROM p4)
        SELECT q.doc_id, q.domain, q.n_blocks, q.n_content,
               CAST(8 AS BIGINT) AS n_outlinks, q.text_clean,
               round(sqn * 1.0 / sqd, 6) AS dom_q,
               p4.r AS authority,
               CASE WHEN q.domain = 'tracker.net' THEN 'blocklist'
                    WHEN 3 * sqn < sqd THEN 'lowq_domain'
                    WHEN 20 * p4.r < rsum.total_r THEN 'low_authority'
                    ELSE 'keep' END AS verdict
        FROM q JOIN dom ON dom.domain = q.domain
               JOIN p4 ON p4.nid = q.domain
               CROSS JOIN rsum
        ORDER BY q.doc_id"""),
      doc = "web-curation pipeline composed end-to-end over ONE shared " +
        "frontier: page files -> own-parser DOM (one parse feeds blocks " +
        "AND outlinks) -> jusText boilerplate -> unicode repair -> " +
        "domain link graph -> integer PageRank authority -> verdict " +
        "from blocklist + pooled-quality + low-authority priors; " +
        "corpus side map-only + broadcast, shuffles are domain-sized"),

    // Filter-aware quota sampling (r13 verdict item 5b): the
    // `pipe_temperature_mix` rates are wrong the moment a domain filter
    // runs first — a language whose mass lived on now-blocked domains
    // must have its keep-rate RENORMALIZED from the surviving counts,
    // or the final mix under-represents it. This composes the
    // pipe_domain_filter verdict (same fixture: blocklist + pooled
    // quality over PSL registrable domains) with temperature sampling
    // (alpha = 0.5, rate = round(1000·sqrt(n_min/n_l)) in millis)
    // where n_l counts ONLY post-filter survivors; the deterministic
    // md5 hash-mod test then applies the rate. Output rollup shows
    // n_total vs n_after_filter vs n_sampled per language, making the
    // renormalization checkable.
    //
    // Plan shape at 100 TB: verdicts are map-only against broadcast
    // domain stats (domain-cardinality shuffle, same as
    // pipe_domain_filter); the rate derivation is one lang-cardinality
    // aggregate over survivors + 1-row min broadcast back; the apply
    // pass is a map-only hash test. Two corpus passes total — the
    // structural minimum, since rates depend on global post-filter
    // counts.
    Q(
      "pipe_quota_sample",
      (s, dir) => {
        val host = element_at(array(
          lit("news.example.com"), lit("spam-ads.example.biz"),
          lit("blog.sample.org"), lit("cdn.tracker.net"),
          lit("wiki.example.co.uk")), (col("doc_id") % 5 + 1).cast("int"))
        val scoreText = when(col("doc_id") % 5 === 1,
          concat(col("text"), lit(" buy" * 30))).otherwise(col("text"))
        val base = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), host.as("host"),
            split(lower(scoreText), " ").as("tk"))
          .withColumn("domain",
            graft.functions.Domains.registrable(col("host")))
          .select(col("doc_id"), col("lang"), col("domain"),
            size(array_distinct(col("tk"))).cast("long").as("qn"),
            size(col("tk")).cast("long").as("qd"))
        val dom = base.groupBy("domain")
          .agg(sum("qn").as("sqn"), sum("qd").as("sqd"))
        val block = s.createDataFrame(Seq(Tuple1("tracker.net")))
          .toDF("domain").withColumn("blocked", lit(true))
        val flagged = base.join(broadcast(dom), Seq("domain"))
          .join(broadcast(block), Seq("domain"), "left")
          .withColumn("dropped",
            coalesce(col("blocked"), lit(false)) ||
              (lit(20) * col("sqn") < lit(7) * col("sqd")))
        val counts = flagged.filter(!col("dropped"))
          .groupBy("lang").agg(count(lit(1)).as("n_l"))
        val minN = counts.agg(min(col("n_l")).as("n_min"))
        val rates = counts.crossJoin(broadcast(minN))
          .select(col("lang"),
            round(lit(1000.0) *
              sqrt(col("n_min").cast("double") / col("n_l").cast("double")))
              .cast("long").as("rate_millis"))
        val bucket = pmod(h64(col("doc_id")), lit(1000L))
        flagged.join(broadcast(rates), Seq("lang"))
          .groupBy("lang", "rate_millis")
          .agg(count(lit(1)).as("n_total"),
            sum(when(!col("dropped"), 1L).otherwise(0L))
              .as("n_after_filter"),
            sum(when(!col("dropped") && bucket < col("rate_millis"), 1L)
              .otherwise(0L)).as("n_sampled"))
          .orderBy("lang")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, lang,
            CASE doc_id % 5 WHEN 0 THEN 'news.example.com'
                            WHEN 1 THEN 'spam-ads.example.biz'
                            WHEN 2 THEN 'blog.sample.org'
                            WHEN 3 THEN 'cdn.tracker.net'
                            ELSE 'wiki.example.co.uk' END AS host,
            string_split(lower(CASE WHEN doc_id % 5 = 1
              THEN text || repeat(' buy', 30) ELSE text END), ' ') AS tk
          FROM documents),
        q AS (
          SELECT doc_id, lang,
                 ${graft.functions.Domains.registrableSql("host")} AS domain,
                 CAST(len(list_distinct(tk)) AS BIGINT) AS qn,
                 CAST(len(tk) AS BIGINT) AS qd
          FROM b),
        dom AS (
          SELECT domain, CAST(sum(qn) AS BIGINT) AS sqn,
                 CAST(sum(qd) AS BIGINT) AS sqd
          FROM q GROUP BY domain),
        k AS (
          SELECT q.doc_id, q.lang,
                 (q.domain = 'tracker.net' OR 20 * sqn < 7 * sqd)
                   AS dropped
          FROM q JOIN dom ON dom.domain = q.domain),
        c AS (SELECT lang, count(*) AS n_l FROM k
              WHERE NOT dropped GROUP BY lang),
        r AS (
          SELECT lang,
                 CAST(round(1000 * sqrt(
                   CAST((SELECT min(n_l) FROM c) AS DOUBLE)
                     / CAST(n_l AS DOUBLE))) AS BIGINT) AS rate_millis
          FROM c)
        SELECT k.lang, r.rate_millis, count(*) AS n_total,
               CAST(sum(CASE WHEN NOT dropped THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_after_filter,
               CAST(sum(CASE WHEN NOT dropped AND
                 CAST(concat('0x', substr(md5(CAST(k.doc_id AS VARCHAR)),
                   1, 15)) AS BIGINT) % 1000 < r.rate_millis
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM k JOIN r ON k.lang = r.lang
        GROUP BY k.lang, r.rate_millis ORDER BY k.lang"""),
      doc = "filter-aware quota sampling: domain-filter verdicts " +
        "(blocklist + pooled quality over PSL domains) feed a " +
        "temperature-mix rate derivation over SURVIVORS only " +
        "(renormalized quotas), applied by the deterministic hash-mod " +
        "test; map-only apply pass, domain- and lang-sized aggregates"),

    // PII redaction — the scrub pass a curation job runs before text ever
    // reaches a tokenizer. Tier 1: mask emails and phone numbers by
    // regex. Tier 2 (r11 verdict item 7): IPv4/IPv6 addresses by regex,
    // and credit-card / IBAN candidates gated by their CHECKSUMS — a
    // 16-digit number is masked only if Luhn-valid, a DE IBAN only if
    // its ISO 13616 mod-97 remainder is 1, both as integer-exact
    // higher-order folds that evaluate bit-identically in Spark and
    // DuckDB. Every row plants one VALID and one checksum-broken
    // candidate of each class (some rows invalid-only, so the audit
    // counts vary), proving the gate: the broken twin survives
    // redaction. Per-reason counts feed the privacy-audit ledger. The
    // test tables carry no live PII, so the query first MINTS the
    // support-note column from customer fields (deterministically,
    // identically in the oracle — the minting is fixture plumbing, the
    // redaction is the op). Patterns stay in the RE2 ∩ java.util.regex
    // common dialect. Row-level map work, no shuffle.
    Q(
      "pipe_pii_redact",
      (s, dir) => {
        val emailRe = "[a-z0-9.]+@[a-z0-9.-]+"
        val phoneRe = "\\+\\d{2}-\\d{3}-\\d{4}"
        val ip4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val ip6Re = "[0-9a-f]{1,4}::(?:[0-9a-f]{1,4}:)*[0-9a-f]{1,4}"
        val cardRe = "\\b\\d{16}\\b"
        val ibanRe = "\\bDE\\d{20}\\b"
        // Checksums run as the compiled luhn_sum / mod97_fold kernels
        // (functions/ArrayKernels.scala): the HOF-fold forms
        // (aggregate∘transform∘substring per digit) evaluate interpreted
        // and put the whole map-only projection on the slow path
        // (measured 5.0 s warm at sf0.1 vs 0.5 s for the tier-1 query).
        // Both kernels double/fold with exactly the parity rule the
        // DuckDB oracle replays in SQL. Constructed directly — no
        // registration side effect on the session.
        def luhnSum(sc: Column): Column =
          org.apache.spark.sql.GraftSqlBridge.column(
            graft.functions.LuhnSum(
              org.apache.spark.sql.GraftSqlBridge.expression(sc)))
        def mod97(sc: Column): Column =
          org.apache.spark.sql.GraftSqlBridge.column(
            graft.functions.Mod97Fold(
              org.apache.spark.sql.GraftSqlBridge.expression(sc)))
        val k = col("c_custkey").cast("long")
        val ip4 = concat_ws(".", lit("10"), (k % 256).cast("string"),
          ((k * 3) % 256).cast("string"), ((k * 7) % 256).cast("string"))
        val ip6 = concat(lit("fe80::"),
          lpad((k % 9999).cast("string"), 4, "0"), lit(":"),
          lpad(((k * 3) % 9999).cast("string"), 4, "0"))
        val card15 = concat(lit("4"),
          lpad(((k * 13) % 100000000000000L).cast("string"), 14, "0"))
        val luhnCheck = pmod(lit(10) - pmod(luhnSum(card15), lit(10)),
          lit(10))
        val validCard = concat(card15, luhnCheck.cast("string"))
        val brokenCard = concat(card15,
          pmod(luhnCheck + 1, lit(10)).cast("string"))
        val bban = concat(
          lpad(((k * 37) % 1000000000L).cast("string"), 9, "0"),
          lpad(((k * 91) % 1000000000L).cast("string"), 9, "0"))
        // ISO 13616: check digits = 98 − (BBAN ∥ '1314' ∥ '00') mod 97
        // ('1314' = the letters DE moved to the tail and digitized)
        val ibanCheck = lit(98) - mod97(concat(bban, lit("131400")))
        val validIban = concat(lit("DE"),
          lpad(ibanCheck.cast("string"), 2, "0"), bban)
        val brokenIban = concat(lit("DE"),
          lpad((pmod(ibanCheck - 1, lit(97)) + 2).cast("string"), 2, "0"),
          bban)
        val txt = concat(
          lit("reach "), col("c_name"), lit(" <"),
          lower(regexp_replace(col("c_name"), "#", ".")),
          lit("@example.com> or +49-"),
          lpad((col("c_custkey") % 900 + 100).cast("string"), 3, "0"),
          lit("-"),
          lpad(((col("c_custkey") * 7) % 10000).cast("string"), 4, "0"),
          lit(" re: "), col("c_mktsegment"),
          lit(" ip "), ip4, lit(" v6 "), ip6,
          // every third row plants ONLY the checksum-broken card, every
          // fifth ONLY the broken IBAN — audit counts vary per row and
          // the <CC>/<IBAN> masks are absent exactly there
          when(k % 3 === 0, concat(lit(" card "), brokenCard))
            .otherwise(concat(lit(" card "), validCard, lit(" alt "),
              brokenCard)),
          when(k % 5 === 0, concat(lit(" acct "), brokenIban))
            .otherwise(concat(lit(" acct "), validIban, lit(" alt2 "),
              brokenIban)))
        def luhnOk(cand: Column): Column =
          pmod(luhnSum(cand), lit(10)) === 0
        def ibanOk(cand: Column): Column =
          mod97(concat(cand.substr(lit(5), lit(18)), lit("1314"),
            cand.substr(lit(3), lit(2)))) === 1
        // r12 shipped this as 12 full-text regex passes (8 extract_all +
        // 4 regexp_replace) — the catalog's priciest per-row chain at
        // 2.9 s warm. Fused (r12 verdict item 7): ONE alternation scan
        // extracts every candidate of every class and the REDACTION
        // folds that match list with literal replaces — exactly how the
        // checksum-gated card/IBAN path already worked, now for all six
        // classes. The fused redaction equals the sequential
        // regexp_replace chain only when class matches are
        // position-disjoint (true of the fixture; Round14OpsSpec asserts
        // it: per-class counts sum to the alternation's match count on
        // every row). AUDIT COUNTS deliberately do NOT ride on that
        // assumption (r13 ADVICE): each class count is its own
        // regexp_extract_all over txt — the 12-pass form's exact audit
        // semantics on ANY input (an IPv4 nested inside an email's
        // domain still counts as an IPv4 sighting), at the cost of six
        // short extra scans per row. The oracle SQL keeps the original
        // 12-pass form, so the fusion itself stays oracle-checked.
        val allRe = s"(?:$emailRe)|(?:$phoneRe)|(?:$ip6Re)|(?:$ip4Re)" +
          s"|(?:$ibanRe)|(?:$cardRe)"
        def isEmail(m: Column): Column = m.contains("@")
        def isPhone(m: Column): Column = m.startsWith("+")
        def isIp6(m: Column): Column = m.contains("::")
        def isIban(m: Column): Column = m.startsWith("DE")
        def isCard(m: Column): Column = m.rlike("^\\d{16}$")
        def extr(re: String): Column =
          regexp_extract_all(col("txt"), lit(re), lit(0))
        // Sorted-input form (same rows, same total order): the output
        // order is c_custkey, so the range sort runs FIRST over the
        // three narrow customer columns and the mint + 7 regex scans +
        // redaction fold run ABOVE it, exactly once. The previous shape
        // sorted the REDACTED frame: the range-partitioner's sampling
        // pass drains every child partition, so the whole per-row regex
        // chain executed twice per run (and the exchange carried the
        // redacted text). Catalyst does not push projections below a
        // Sort, so the expensive projection stays post-shuffle.
        sortedByKeys(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
            col("c_custkey"))
          .select(col("c_custkey"), txt.as("txt"))
          .select(col("c_custkey"), col("txt"),
            regexp_extract_all(col("txt"), lit(allRe), lit(0)).as("ms"),
            extr(cardRe).as("cards"), extr(ibanRe).as("ibans"))
          .select(col("c_custkey"),
            aggregate(col("ms"), col("txt"), (acc, m) =>
              when(isEmail(m), replace(acc, m, lit("<EMAIL>")))
                .when(isPhone(m), replace(acc, m, lit("<PHONE>")))
                .when(isIp6(m), replace(acc, m, lit("<IP6>")))
                .when(isIban(m),
                  when(ibanOk(m), replace(acc, m, lit("<IBAN>")))
                    .otherwise(acc))
                .when(isCard(m),
                  when(luhnOk(m), replace(acc, m, lit("<CC>")))
                    .otherwise(acc))
                .otherwise(replace(acc, m, lit("<IP4>")))).as("redacted"),
            size(extr(emailRe)).as("n_emails"),
            size(extr(phoneRe)).as("n_phones"),
            size(extr(ip4Re)).as("n_ip4"),
            size(extr(ip6Re)).as("n_ip6"),
            size(col("cards")).as("n_cards_seen"),
            size(filter(col("cards"), luhnOk(_))).as("n_cards_valid"),
            size(col("ibans")).as("n_ibans_seen"),
            size(filter(col("ibans"), ibanOk(_))).as("n_ibans_valid"))
      },
      Some("""
        WITH base AS (
          SELECT c_custkey, c_name, c_mktsegment,
                 CAST(c_custkey AS BIGINT) AS k,
                 concat('4', lpad(CAST((CAST(c_custkey AS BIGINT) * 13)
                   % 100000000000000 AS VARCHAR), 14, '0')) AS card15,
                 concat(lpad(CAST((CAST(c_custkey AS BIGINT) * 37)
                     % 1000000000 AS VARCHAR), 9, '0'),
                   lpad(CAST((CAST(c_custkey AS BIGINT) * 91)
                     % 1000000000 AS VARCHAR), 9, '0')) AS bban
          FROM customer),
        checked AS (
          SELECT *,
            (10 - list_aggregate(list_transform(generate_series(1, 15),
               i -> CASE WHEN i % 2 = 1
                 THEN CASE WHEN 2 * CAST(substring(card15, i, 1) AS INT) > 9
                   THEN 2 * CAST(substring(card15, i, 1) AS INT) - 9
                   ELSE 2 * CAST(substring(card15, i, 1) AS INT) END
                 ELSE CAST(substring(card15, i, 1) AS INT) END),
               'sum') % 10) % 10 AS lc,
            list_reduce(list_transform(generate_series(1, 24),
               i -> CAST(substring(concat(bban, '131400'), i, 1) AS INT)),
               (a, d) -> (a * 10 + d) % 97) AS m97
          FROM base),
        minted AS (
          SELECT c_custkey,
            concat('reach ', c_name, ' <', lower(replace(c_name, '#', '.')),
              '@example.com> or +49-',
              lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0'), '-',
              lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0'),
              ' re: ', c_mktsegment,
              ' ip 10.', CAST(k % 256 AS VARCHAR), '.',
              CAST((k * 3) % 256 AS VARCHAR), '.',
              CAST((k * 7) % 256 AS VARCHAR),
              ' v6 fe80::', lpad(CAST(k % 9999 AS VARCHAR), 4, '0'), ':',
              lpad(CAST((k * 3) % 9999 AS VARCHAR), 4, '0'),
              CASE WHEN k % 3 = 0
                THEN concat(' card ', card15,
                  CAST((lc + 1) % 10 AS VARCHAR))
                ELSE concat(' card ', card15, CAST(lc AS VARCHAR),
                  ' alt ', card15, CAST((lc + 1) % 10 AS VARCHAR)) END,
              CASE WHEN k % 5 = 0
                THEN concat(' acct DE',
                  lpad(CAST((98 - m97 - 1) % 97 + 2 AS VARCHAR), 2, '0'),
                  bban)
                ELSE concat(' acct DE',
                  lpad(CAST(98 - m97 AS VARCHAR), 2, '0'), bban,
                  ' alt2 DE',
                  lpad(CAST((98 - m97 - 1) % 97 + 2 AS VARCHAR), 2, '0'),
                  bban) END) AS txt
          FROM checked),
        scanned AS (
          SELECT c_custkey, txt,
            list_filter(regexp_extract_all(txt, '\b\d{16}\b'),
              c -> list_aggregate(list_transform(generate_series(1, 16),
                i -> CASE WHEN i % 2 = 1
                  THEN CASE WHEN 2 * CAST(substring(c, i, 1) AS INT) > 9
                    THEN 2 * CAST(substring(c, i, 1) AS INT) - 9
                    ELSE 2 * CAST(substring(c, i, 1) AS INT) END
                  ELSE CAST(substring(c, i, 1) AS INT) END),
                'sum') % 10 = 0) AS vcards,
            list_filter(regexp_extract_all(txt, '\bDE\d{20}\b'),
              c -> list_reduce(list_transform(generate_series(1, 24),
                i -> CAST(substring(concat(substring(c, 5, 18), '1314',
                  substring(c, 3, 2)), i, 1) AS INT)),
                (a, d) -> (a * 10 + d) % 97) = 1) AS vibans
          FROM minted)
        SELECT c_custkey,
          list_reduce(list_prepend(
            list_reduce(list_prepend(
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                txt, '[a-z0-9.]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
                '\+\d{2}-\d{3}-\d{4}', '<PHONE>', 'g'),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP4>', 'g'),
                '[0-9a-f]{1,4}::(?:[0-9a-f]{1,4}:)*[0-9a-f]{1,4}',
                '<IP6>', 'g'),
              vcards), (a, c) -> replace(a, c, '<CC>')),
            vibans), (a, c) -> replace(a, c, '<IBAN>')) AS redacted,
          len(regexp_extract_all(txt, '[a-z0-9.]+@[a-z0-9.-]+')) AS n_emails,
          len(regexp_extract_all(txt, '\+\d{2}-\d{3}-\d{4}')) AS n_phones,
          len(regexp_extract_all(txt,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip4,
          len(regexp_extract_all(txt,
            '[0-9a-f]{1,4}::(?:[0-9a-f]{1,4}:)*[0-9a-f]{1,4}')) AS n_ip6,
          len(regexp_extract_all(txt, '\b\d{16}\b')) AS n_cards_seen,
          len(vcards) AS n_cards_valid,
          len(regexp_extract_all(txt, '\bDE\d{20}\b')) AS n_ibans_seen,
          len(vibans) AS n_ibans_valid
        FROM scanned ORDER BY c_custkey"""),
      doc = "PII redaction tier 1+2: email/phone/IPv4/IPv6 regex masking " +
        "plus checksum-GATED credit-card (Luhn) and IBAN (mod-97) masking " +
        "— integer-exact folds both engines replay; planted checksum-" +
        "broken twins survive, audit counts per reason"),

    // Batch face of the shared batch/streaming curation intake
    // (curateChunks): repetition gate -> chunk explode in one lineage.
    // The streaming face (Incremental.curationIntake) runs the SAME
    // function under AvailableNow — StreamingSpec asserts output parity,
    // and this row gives the transform a value oracle.
    Q(
      "pipe_corpus_intake",
      (s, dir) => curateChunks(th(s, dir, "documents"))
        .orderBy("doc_id", "chunk_start"),
      Some("""
        WITH tk AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
          FROM documents),
        g AS (
          SELECT doc_id, t,
                 CASE WHEN len(t) >= 2
                      THEN list_transform(generate_series(1, len(t) - 1),
                             i -> t[i] || ' ' || t[i + 1])
                      ELSE [] END AS g2
          FROM tk),
        big AS (
          SELECT doc_id, g2w, count(*) AS c
          FROM (SELECT doc_id, unnest(g2) AS g2w FROM g)
          GROUP BY doc_id, g2w),
        top AS (SELECT doc_id, max(c) AS top_c FROM big GROUP BY doc_id),
        keep AS (
          SELECT g.doc_id, t
          FROM g LEFT JOIN top ON g.doc_id = top.doc_id
          WHERE (len(g2) - len(list_distinct(g2))) / greatest(len(g2), 1) <= 0.08
            AND 2.0 * coalesce(top_c, 0) / greatest(len(t), 1) <= 0.2)
        SELECT doc_id, s AS chunk_start,
               least(s + 31, len(t)) - s + 1 AS n_chunk_tokens,
               array_to_string(t[s:least(s + 31, len(t))], ' ') AS chunk
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t), 24)) AS s
              FROM keep)
        WHERE least(s + 31, len(t)) - s + 1 >= 8
        ORDER BY doc_id, chunk_start"""),
      doc = "curation intake composite (repetition gate -> chunking), the " +
        "batch face of the shared batch/streaming transform"),

    // DSIR importance resampling (Data Selection for Language Models via
    // Importance Resampling, Xie et al. 2023): score raw documents by
    // how target-like their hashed-n-gram feature distribution is.
    // Features are bigrams folded into B=64 buckets by a char-level
    // polynomial hash (acc*31+code mod 1000003, then mod B — the same
    // left fold evaluates in DuckDB's list_reduce, keeping the oracle
    // independent); target = the doc_id%10==0 slice standing in for the
    // high-quality domain, raw = the rest. Per doc:
    // logw = Σ_f [ln p̂_target(f) − ln p̂_raw(f)] over its bigram
    // occurrences, add-0.5 smoothed. Selection is then orderBy(logw
    // desc) ∘ limit — kept OUT of this row so the hash-compare never
    // rides on float ordering. Plan shape: TWO corpus passes total —
    // one groupBy("f") with conditional counts builds the single
    // feature-stats frame (bounded by B=64 rows AT ANY CORPUS SIZE, the
    // entire point of feature hashing; nt/nr fold from those 64 rows
    // rather than a third corpus scan, since every occurrence lands in
    // exactly one bucket), and one pass scores map-side against its
    // broadcast — at 100 TB the only keyed shuffle is the final
    // doc_id aggregation.
    Q(
      "pipe_dsir_resample",
      (s, dir) => {
        val bg = th(s, dir, "documents")
          .select(col("doc_id"), toks.as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("doc_id"), explode(bigramPairs(col("t"))).as("p"))
          .select(col("doc_id"),
            concat(col("p.w1"), lit(" "), col("p.w2")).as("bs"))
          .select(col("doc_id"),
            expr("aggregate(transform(sequence(1, char_length(bs)), " +
              "i -> ascii(substring(bs, i, 1))), 0L, " +
              "(acc, c) -> (acc * 31 + c) % 1000003) % 64").as("f"))
        val isT = col("doc_id") % 10 === 0
        val fc = bg.groupBy("f").agg(
          sum(isT.cast("long")).as("ct"),
          sum((!isT).cast("long")).as("cr"))
        val tot = fc.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
        bg.filter(!isT)
          .join(broadcast(fc), Seq("f"))
          .crossJoin(broadcast(tot))
          .groupBy("doc_id")
          .agg(
            round(sum(
              log((col("ct") + lit(0.5)) / (col("nt") + lit(32.0))) -
              log((col("cr") + lit(0.5)) / (col("nr") + lit(32.0)))), 6)
              .as("logw"),
            count(lit(1)).as("n_feats"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tk AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
          FROM documents),
        bg AS (
          SELECT doc_id,
                 list_reduce(
                   [unicode(c) FOR c IN string_split(p[1] || ' ' || p[2], '')],
                   (a, b) -> (a * 31 + b) % 1000003) % 64 AS f
          FROM (SELECT doc_id,
                       unnest([[t[i], t[i+1]] FOR i IN range(1, len(t))]) AS p
                FROM tk WHERE len(t) >= 2)),
        tc AS (SELECT f, count(*) AS ct FROM bg WHERE doc_id % 10 = 0 GROUP BY 1),
        rc AS (SELECT f, count(*) AS cr FROM bg WHERE doc_id % 10 <> 0 GROUP BY 1),
        tot AS (
          SELECT CAST(sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                 CAST(sum(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nr
          FROM bg)
        SELECT bg.doc_id,
               round(sum(ln((COALESCE(tc.ct, 0) + 0.5) / (nt + 32.0))
                       - ln((COALESCE(rc.cr, 0) + 0.5) / (nr + 32.0))), 6) AS logw,
               CAST(count(*) AS BIGINT) AS n_feats
        FROM bg LEFT JOIN tc USING (f) LEFT JOIN rc USING (f), tot
        WHERE bg.doc_id % 10 <> 0
        GROUP BY bg.doc_id
        ORDER BY doc_id"""),
      doc = "DSIR hashed-bigram importance weights (B=64 buckets, add-0.5 " +
        "smoothing); feature tables are B-bounded broadcasts at any scale"))
}
