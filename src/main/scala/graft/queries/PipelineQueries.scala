package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Upsert
import graft.multimodal.Multimodal

/** Pipeline-level operators: the merge sink (K1), the gold
  * customer-characteristics rollup (A6/A7), deterministic sampling (O1),
  * POS-pattern subsequence matching (N5), and the multimodal binary
  * plumbing.
  */
object PipelineQueries extends QueryBase {

  val all: Seq[Q] = Seq(
    // K1 upsert/merge: incoming rows win PK conflicts, survivors keep.
    // reference src/_utils/database.py:140-174 (COPY + ON CONFLICT UPDATE).
    Q(
      "pipe_upsert_merge",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val existing = o.filter(col("o_orderkey") % 3 =!= 0)
        val incoming = o.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        Upsert.merge(existing, incoming, Seq("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice"), 10000L).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""
        WITH existing AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
        incoming AS (SELECT * REPLACE (o_totalprice + 1000.0 AS o_totalprice)
                     FROM orders WHERE o_orderkey % 2 = 0),
        merged AS (
          SELECT * FROM existing
          WHERE o_orderkey NOT IN (SELECT o_orderkey FROM incoming)
          UNION ALL SELECT * FROM incoming)
        SELECT o_orderstatus, count(*) AS n_rows,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS total
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "K1 upsert merge sink semantics; reference database.py:140-174"),

    // A6/A7 gold rollup: the customer_characteristics view shape —
    // per-customer lifetime aggregates from two fact tables plus a
    // most-common (mode) attribute, assembled by left joins.
    // reference migration_032.sql:7-180.
    Q(
      "pipe_customer_gold",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        val oAgg = o.groupBy("o_custkey").agg(
          count(lit(1)).as("order_count"),
          dsum(col("o_totalprice"), 10000L).as("total_spend"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_order_day"))
        val wMode = Window.partitionBy("o_custkey")
          .orderBy(col("cnt").desc, col("o_orderpriority").asc)
        val mode = o.groupBy("o_custkey", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(wMode))
          .filter(col("rn") === 1)
          .select(col("o_custkey").as("m_custkey"),
            col("o_orderpriority").as("most_common_priority"))
        val oKeys = o.select(col("o_orderkey"), col("o_custkey"))
        val liAgg = li.join(oKeys, li("l_orderkey") === oKeys("o_orderkey"))
          .groupBy("o_custkey")
          .agg(dsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("item_count"))
          .withColumnRenamed("o_custkey", "l_custkey")
        c.select(col("c_custkey"), col("c_mktsegment"))
          .join(oAgg, c("c_custkey") === oAgg("o_custkey"), "left")
          .join(mode, c("c_custkey") === mode("m_custkey"), "left")
          .join(liAgg, c("c_custkey") === liAgg("l_custkey"), "left")
          .select(col("c_custkey"), col("c_mktsegment"),
            coalesce(col("order_count"), lit(0)).as("order_count"),
            coalesce(col("total_spend"), lit(0.0)).as("total_spend"),
            col("last_order_day"), col("most_common_priority"),
            coalesce(col("total_qty"), lit(0.0)).as("total_qty"),
            coalesce(col("item_count"), lit(0)).as("item_count"))
          .orderBy("c_custkey")
      },
      Some("""
        WITH o_agg AS (
          SELECT o_custkey, count(*) AS order_count,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS total_spend,
                 strftime(max(o_orderdate), '%Y-%m-%d') AS last_order_day
          FROM orders GROUP BY o_custkey),
        mode AS (
          SELECT o_custkey, o_orderpriority AS most_common_priority FROM (
            SELECT o_custkey, o_orderpriority,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
            FROM orders GROUP BY o_custkey, o_orderpriority)
          WHERE rn = 1),
        li_agg AS (
          SELECT o_custkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS total_qty,
                 count(*) AS item_count
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_custkey)
        SELECT c_custkey, c_mktsegment,
               coalesce(order_count, 0) AS order_count,
               coalesce(total_spend, 0.0) AS total_spend,
               last_order_day, most_common_priority,
               coalesce(total_qty, 0.0) AS total_qty,
               coalesce(item_count, 0) AS item_count
        FROM customer
          LEFT JOIN o_agg ON c_custkey = o_agg.o_custkey
          LEFT JOIN mode ON c_custkey = mode.o_custkey
          LEFT JOIN li_agg ON c_custkey = li_agg.o_custkey
        ORDER BY c_custkey"""),
      doc = "A6/A7 customer_characteristics gold view; reference migration_032.sql:7-180"),

    // O1 deterministic sampling: hash-mod keeps an exact, seed-stable 10%
    // — the distributed replacement for ORDER BY RANDOM() LIMIT n
    // (reference src/_utils/database.py:279-288), which needs a global
    // sort; hash-mod sampling is a pushdown-friendly filter.
    Q(
      "pipe_sample_hash",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val bucket = pmod(conv(substring(md5(col("c_name")), 1, 15), 16, 10)
          .cast("long"), lit(100))
        c.filter(bucket < 10)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_sampled"), round(davg(col("c_acctbal")), 6).as("avg_bal"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_sampled,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) / count(c_acctbal), 6) AS avg_bal
        FROM customer
        WHERE CAST(concat('0x', substr(md5(c_name), 1, 15)) AS BIGINT) % 100 < 10
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      doc = "O1 deterministic hash-mod sampling; reference database.py:279-288"),

    // N5 POS-pattern subsequence match: find ADJ-NOUN bigram positions in
    // the tag sequence, emit the matched word pairs. POS tags synthesized
    // deterministically (token length mod 4) since no tagger model ships
    // in this container — the reference likewise precomputes tags (spaCy)
    // upstream of the pattern matcher.
    // reference src/absa/post_opinion_patterns.py:401-421.
    Q(
      "pipe_pos_pattern",
      (s, dir) => {
        val d = th(s, dir, "documents")
        val tk = split(lower(col("text")), "\\s+")
        val tags = transform(tk, w =>
          when(length(w) % 4 === 0, "NOUN").when(length(w) % 4 === 1, "ADJ")
            .when(length(w) % 4 === 2, "VERB").otherwise("ADV"))
        val hits = filter(sequence(lit(1), size(col("tk")) - 1),
          i => element_at(col("tags"), i) === "ADJ" &&
            element_at(col("tags"), i + 1) === "NOUN")
        d.select(col("doc_id"), tk.as("tk"), tags.as("tags"))
          .select(col("doc_id"), explode(transform(hits,
            i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
            .as("phrase"))
          .groupBy("phrase")
          .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
          .filter(col("n_occ") >= 2)
          .orderBy(col("n_occ").desc, col("phrase").asc)
          .limit(50)
      },
      Some("""
        WITH tagged AS (
          SELECT doc_id, tk,
                 [CASE WHEN length(w) % 4 = 0 THEN 'NOUN'
                       WHEN length(w) % 4 = 1 THEN 'ADJ'
                       WHEN length(w) % 4 = 2 THEN 'VERB'
                       ELSE 'ADV' END FOR w IN tk] AS tags
          FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk
                FROM documents)),
        hits AS (
          SELECT doc_id,
                 unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))
                         IF tags[i] = 'ADJ' AND tags[i+1] = 'NOUN']) AS phrase
          FROM tagged)
        SELECT phrase, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
        FROM hits GROUP BY phrase HAVING count(*) >= 2
        ORDER BY n_occ DESC, phrase ASC LIMIT 50"""),
      doc = "N5 POS-pattern subsequence match; reference post_opinion_patterns.py:401-421"),

    // Multimodal plumbing: text wrapped as opaque binary payloads, batch
    // feature extraction via mapPartitions (stub decoder), integrity
    // checked end-to-end by sha256 over the payload bytes.
    Q(
      "pipe_multimodal_media",
      (s, dir) => {
        val media = Multimodal.asMedia(th(s, dir, "documents"))
        val feats = Multimodal.extractFeatures(media)
        val l1 = expr("aggregate(feature, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))")
        media.select(col("media_id"), col("n_bytes"),
            lower(sha2(col("payload"), 256)).as("payload_sha"))
          .join(feats.select(col("media_id"), round(l1, 3).as("feature_l1")), "media_id")
          .orderBy("media_id")
      },
      Some("""
        SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
               lower(sha256(text)) AS payload_sha,
               -- Mirrors the stub decoder: an empty payload yields the
               -- all-zero histogram (L1 = 0.0); anything else normalizes
               -- to L1 = 1.0 (float accumulation stays inside round(.,3)).
               CASE WHEN octet_length(encode(text)) = 0 THEN 0.0 ELSE 1.0 END
                 AS feature_l1
        FROM documents ORDER BY media_id"""),
      doc = "multimodal binary column + mapPartitions feature extraction (stub decode)"))
}
