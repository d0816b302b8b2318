package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining §2 inventory operators: equality lexicon joins (J7),
  * announcement fuzzy-containment join (J14), term counting (A9),
  * max-with-global-fallback (A12), ordered collect_list aggregation (A16).
  */
object MiscQueries extends QueryBase {

  val all: Seq[Q] = Seq(
    // J7: equality lexicon join through lower() on both sides — the
    // inflection-table join shape (reference post_sentiments.py:189-214,
    // inflection view migration_028.sql:67-80). Lexicon broadcasts.
    Q(
      "join_lexicon_equality",
      (s, dir) => {
        val p = t(s, dir, "part")
        val lex = s.createDataFrame(Seq(
          Tuple1("PROMO"), Tuple1("Economy"), Tuple1("small"), Tuple1("LARGE")))
          .toDF("lex_word")
        val tokens = p.select(col("p_partkey"),
          explode(split(lower(col("p_type")), " ")).as("token"))
        tokens.join(broadcast(lex), col("token") === lower(col("lex_word")))
          .groupBy("lex_word")
          .agg(count(lit(1)).as("n_parts"), countDistinct(col("p_partkey")).as("n_distinct"))
          .orderBy("lex_word")
      },
      Some("""
        SELECT lex_word, count(*) AS n_parts, count(DISTINCT p_partkey) AS n_distinct
        FROM (SELECT p_partkey, unnest(string_split(lower(p_type), ' ')) AS token
              FROM part)
        JOIN (SELECT unnest(['PROMO','Economy','small','LARGE']) AS lex_word) lex
          ON token = lower(lex_word)
        GROUP BY lex_word ORDER BY lex_word"""),
      doc = "J7 equality lexicon join via lower(); reference post_sentiments.py:189-214"),

    // J14: announcement fuzzy-containment join — substring match against a
    // small campaign dim inside a bounded id-window, ambiguous matches
    // (doc matching >1 campaign) dropped.
    // reference exhibition_popularity.py:57-74.
    Q(
      "join_fuzzy_containment",
      (s, dir) => {
        val d = th(s, dir, "documents")
        val camp = s.createDataFrame(Seq(
          ("spark", 0L, 3000L), ("stream", 100L, 4500L), ("vector", 200L, 5000L)))
          .toDF("campaign", "lo", "hi")
        val matched = d.crossJoin(broadcast(camp))
          .filter(col("text").contains(col("campaign")) &&
            col("doc_id").between(col("lo"), col("hi")))
        val w = Window.partitionBy("doc_id")
        matched.withColumn("nm", count(lit(1)).over(w))
          .filter(col("nm") === 1)
          .select(col("doc_id"), col("campaign"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, campaign FROM (
          SELECT doc_id, campaign, count(*) OVER (PARTITION BY doc_id) AS nm
          FROM documents
          JOIN (VALUES ('spark', 0, 3000), ('stream', 100, 4500), ('vector', 200, 5000))
            c(campaign, lo, hi)
            ON contains(text, campaign) AND doc_id BETWEEN lo AND hi)
        WHERE nm = 1 ORDER BY doc_id"""),
      doc = "J14 announcement containment join with ambiguity drop; reference exhibition_popularity.py:57-74"),

    // A9: term counting with at-most-one count per document (the hashtag
    // counting semantics: a term counts once per tweet regardless of
    // repeats). reference keyword_intervals.py:144-201.
    Q(
      "agg_term_count",
      (s, dir) => {
        val d = th(s, dir, "documents")
        val terms = s.createDataFrame(Seq(
          Tuple1("data"), Tuple1("query"), Tuple1("table"), Tuple1("join")))
          .toDF("term")
        d.select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("token"))
          .join(broadcast(terms), col("token") === col("term"))
          .groupBy("term")
          .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_raw"))
          .orderBy("term")
      },
      Some("""
        SELECT term, count(DISTINCT doc_id) AS n_docs, count(*) AS n_raw
        FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
              FROM documents)
        JOIN (SELECT unnest(['data','query','table','join']) AS term)
          ON token = term
        GROUP BY term ORDER BY term"""),
      doc = "A9 once-per-doc term counting; reference keyword_intervals.py:144-201"),

    // A12: per-group max with global-mean fallback for empty groups.
    // reference exhibition_popularity.py:79-92.
    Q(
      "agg_max_fallback",
      (s, dir) => {
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val perNation = c.groupBy("c_nationkey")
          .agg(max(col("c_acctbal")).as("max_bal"))
        val globalMean = c.agg(round(davg(col("c_acctbal")), 6).as("mean_bal"))
        n.join(perNation, n("n_nationkey") === perNation("c_nationkey"), "left")
          .crossJoin(broadcast(globalMean))
          .select(col("n_nationkey"), col("n_name"),
            coalesce(col("max_bal"), col("mean_bal")).as("popularity"))
          .orderBy("n_nationkey")
      },
      Some("""
        SELECT n_nationkey, n_name,
               coalesce(max_bal, (SELECT round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) / count(c_acctbal), 6)
                                  FROM customer WHERE c_mktsegment = 'BUILDING')) AS popularity
        FROM nation LEFT JOIN (
          SELECT c_nationkey, max(c_acctbal) AS max_bal
          FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey)
          ON n_nationkey = c_nationkey
        ORDER BY n_nationkey"""),
      doc = "A12 max with global-mean fallback; reference exhibition_popularity.py:79-92"),

    // A16: grouped aggregation with an ordered collect_list (the
    // aggregated-opinion shape: list of phrases + mean + sum per group).
    // reference post_opinion_patterns.py:140-148.
    Q(
      "agg_collect_list",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_custkey") < 200)
          .groupBy("o_custkey")
          .agg(
            // Joined to one string: the harness's row-sort cannot order
            // list-typed cells, and the string form hash-compares the same.
            array_join(array_sort(collect_list(col("o_orderpriority"))), "|")
              .as("priorities"),
            round(davg(col("o_totalprice"), 10000L), 6).as("avg_price"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey,
               array_to_string(list(o_orderpriority ORDER BY o_orderpriority), '|')
                 AS priorities,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) / count(o_totalprice), 6) AS avg_price,
               count(*) AS n_orders
        FROM orders WHERE o_custkey < 200
        GROUP BY o_custkey ORDER BY o_custkey"""),
      doc = "A16 ordered collect_list aggregation; reference post_opinion_patterns.py:140-148"),

    // One-pass table profiler: per-column null/distinct/min/max — the
    // data-quality summary a pipeline emits before trusting a new drop.
    // ONE aggregation over one scan produces every column's stats (the
    // multi-COUNT(DISTINCT) plans as a single Expand + aggregate — row
    // multiplication by #distinct-columns, the standard trade for a
    // single-pass profile), then the wide 1-row result is exploded into
    // the per-column ledger driver-side-free.
    Q(
      "pipe_profile_table",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val ag = o.agg(
          count(lit(1)).as("n"),
          count(col("o_orderstatus")).as("nn_s"),
          countDistinct(col("o_orderstatus")).as("nd_s"),
          min(col("o_orderstatus")).as("mn_s"),
          max(col("o_orderstatus")).as("mx_s"),
          count(col("o_orderpriority")).as("nn_p"),
          countDistinct(col("o_orderpriority")).as("nd_p"),
          min(col("o_orderpriority")).as("mn_p"),
          max(col("o_orderpriority")).as("mx_p"),
          count(col("o_totalprice")).as("nn_t"),
          countDistinct(col("o_totalprice")).as("nd_t"),
          min(col("o_totalprice")).as("mn_t"),
          max(col("o_totalprice")).as("mx_t"),
          count(col("o_orderdate")).as("nn_d"),
          countDistinct(col("o_orderdate")).as("nd_d"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("mn_d"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("mx_d"))
        val nullD = lit(null).cast("double")
        val nullS = lit(null).cast("string")
        def row(name: String, nn: String, nd: String,
            mnNum: org.apache.spark.sql.Column, mxNum: org.apache.spark.sql.Column,
            mnStr: org.apache.spark.sql.Column, mxStr: org.apache.spark.sql.Column) =
          struct(lit(name).as("col"), col("n").as("n_rows"),
            col(nn).as("n_nonnull"), col(nd).as("n_distinct"),
            mnNum.as("min_num"), mxNum.as("max_num"),
            mnStr.as("min_str"), mxStr.as("max_str"))
        ag.select(explode(array(
            row("o_orderdate", "nn_d", "nd_d", nullD, nullD, col("mn_d"), col("mx_d")),
            row("o_orderpriority", "nn_p", "nd_p", nullD, nullD, col("mn_p"), col("mx_p")),
            row("o_orderstatus", "nn_s", "nd_s", nullD, nullD, col("mn_s"), col("mx_s")),
            row("o_totalprice", "nn_t", "nd_t", col("mn_t"), col("mx_t"), nullS, nullS)))
          .as("p"))
          .select(col("p.*"))
          .orderBy("col")
      },
      Some("""
        SELECT 'o_orderdate' AS col, count(*) AS n_rows,
               count(o_orderdate) AS n_nonnull,
               count(DISTINCT o_orderdate) AS n_distinct,
               CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
               strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_str,
               strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(o_totalprice),
               count(DISTINCT o_totalprice),
               min(o_totalprice), max(o_totalprice),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM orders
        ORDER BY col"""),
      doc = "one-pass per-column table profiler (null/distinct/min/max " +
        "ledger) via single Expand aggregate + explode"))
}
