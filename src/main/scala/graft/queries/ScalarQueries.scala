package graft.queries

import org.apache.spark.sql.functions._

/** Scalar transforms / projections — SURVEY.md §2.3 (P1–P20).
  *
  * All pure codegen'd built-ins: no UDFs, so every expression stays inside
  * whole-stage codegen and the filters around them remain pushdown-eligible.
  */
object ScalarQueries extends QueryBase {

  val all: Seq[Q] = Seq(
    // P3/P14/P15/P16/P17/P11: the string-transform pack on one projection —
    // coalesce fallback, NULLIF(CONCAT_WS), permalink template, short-title
    // regex extract, symbol translation, zero-padding.
    Q(
      "scalar_string_pack",
      (s, dir) => {
        val p = t(s, dir, "part")
        p.select(
            col("p_partkey"),
            // P3 coalesce-style fallback chain
            coalesce(nullif(col("p_brand"), lit("Brand#13")), col("p_type")).as("brand_or_type"),
            // P14 NULLIF(CONCAT_WS(...), '')
            nullif(concat_ws("\n", col("p_name"), col("p_type")), lit("")).as("title_text"),
            // P15 permalink builder
            concat(lit("https://example.org/part/"), col("p_partkey"),
              lit("?b="), regexp_replace(col("p_brand"), "#", "")).as("permalink"),
            // P16 short-title: first token before a separator, else whole
            coalesce(nullif(regexp_extract(col("p_name"), "^(\\S+)\\s", 1), lit("")),
              col("p_name")).as("short_title"),
            // P17 symbol transliteration
            translate(col("p_type"), "AEO", "438").as("leeted_type"),
            // P11 zero-padding normalization
            lpad(col("p_size").cast("string"), 5, "0").as("padded_size"),
            // P18 carriage-return normalization (\r\n? → \n) over a
            // constructed CRLF payload
            regexp_replace(
              regexp_replace(col("p_type"), " ", "\r\n"), "\r\n?", "\n")
              .as("crlf_fixed"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               coalesce(nullif(p_brand, 'Brand#13'), p_type) AS brand_or_type,
               nullif(concat_ws(chr(10), p_name, p_type), '') AS title_text,
               'https://example.org/part/' || p_partkey || '?b=' ||
                 regexp_replace(p_brand, '#', '') AS permalink,
               coalesce(nullif(regexp_extract(p_name, '^(\S+)\s', 1), ''), p_name)
                 AS short_title,
               translate(p_type, 'AEO', '438') AS leeted_type,
               lpad(CAST(p_size AS VARCHAR), 5, '0') AS padded_size,
               regexp_replace(replace(p_type, ' ', chr(13) || chr(10)),
                 '\r\n?', chr(10), 'g') AS crlf_fixed
        FROM part ORDER BY p_partkey"""),
      doc = "P3/P14-P18/P11 string pack; reference extract_bookings.py:56-60, migration_011.sql:169, migration_018.sql:19-21, data_preparation.py:56-74"),

    // P7/P8: Excel-serial-date decode + German dd.MM.yyyy round-trip +
    // duration minutes. reference orders.py:86-87, extract_bookings.py:99-105.
    Q(
      "scalar_date_pack",
      (s, dir) => {
        // Sorted-input form (Finding A, OPTIMIZATION_r14.md).
        val o = sortedByKeys(
          t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("o_orderkey"))
        val serial = (col("o_orderkey") % 40000L) + 10000L
        val german = date_format(col("o_orderdate"), "dd.MM.yyyy HH:mm")
        o.select(
            col("o_orderkey"),
            // P7: Excel serial → date (epoch 1899-12-30)
            date_format(date_add(lit("1899-12-30").cast("date"), serial.cast("int")),
              "yyyy-MM-dd").as("excel_date"),
            // P8: German-format emit + parse round-trip
            german.as("german_dt"),
            date_format(to_timestamp(german, "dd.MM.yyyy HH:mm"), "yyyy-MM-dd HH:mm:ss")
              .as("parsed_back"),
            // P8: duration in whole minutes from year start (epoch-seconds
            // casts are safe — Tables.load normalizes timestamp encodings).
            floor((col("o_orderdate").cast("long") -
              date_trunc("year", col("o_orderdate")).cast("long")) / 60L)
              .as("minutes_into_year"))
      },
      Some("""
        SELECT o_orderkey,
               strftime(DATE '1899-12-30' + CAST(o_orderkey % 40000 + 10000 AS INT),
                        '%Y-%m-%d') AS excel_date,
               strftime(o_orderdate, '%d.%m.%Y %H:%M') AS german_dt,
               strftime(strptime(strftime(o_orderdate, '%d.%m.%Y %H:%M'), '%d.%m.%Y %H:%M'),
                        '%Y-%m-%d %H:%M:%S') AS parsed_back,
               CAST(floor(date_diff('second', date_trunc('year', o_orderdate), o_orderdate)
                    / 60) AS BIGINT) AS minutes_into_year
        FROM orders ORDER BY o_orderkey"""),
      doc = "P7 Excel serial date, P8 dd.MM.yyyy parse; reference orders.py:86-87, extract_bookings.py:99-105"),

    // P5: enum/boolean parsing via when/otherwise maps; star-rating bucket.
    // reference extract_customers.py:104-112, google_maps.py:26-33.
    Q(
      "scalar_enum_map",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val rating = when(col("value") < 40, 1).when(col("value") < 80, 2)
          .when(col("value") < 120, 3).when(col("value") < 160, 4).otherwise(5)
        val isPaid = when(col("event_type") === "purchase", "ja").otherwise("nein")
        ev.select(col("event_id"), rating.as("stars"), isPaid.as("bezahlt"))
          .groupBy("stars", "bezahlt").agg(count(lit(1)).as("n"))
          .orderBy("stars", "bezahlt")
      },
      Some("""
        SELECT CASE WHEN value < 40 THEN 1 WHEN value < 80 THEN 2
                    WHEN value < 120 THEN 3 WHEN value < 160 THEN 4 ELSE 5 END AS stars,
               CASE WHEN event_type = 'purchase' THEN 'ja' ELSE 'nein' END AS bezahlt,
               count(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY stars, bezahlt"""),
      doc = "P5 enum/boolean maps; reference extract_customers.py:104-112, google_maps.py:26-33"),

    // JSON extraction from a string payload column (events.props) —
    // the S6/JSONC analog plus typed cast + exact aggregate.
    Q(
      "scalar_json_extract",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy("event_type")
          .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"),
            max(col("k")).as("max_k"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_k,
               max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type"""),
      doc = "S6/P-json payload extraction; reference json_converters.py:25-32"),

    // P9: higher-order array functions — whitelist tag extraction with
    // filter(lambda) — no explode, no UDF, no shuffle.
    // reference extract_customers.py:122-132 (tourism tags).
    Q(
      "scalar_higher_order_tags",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val whitelist = array(Seq("spark", "stream", "vector", "window", "hash")
          .map(lit): _*)
        d.select(
            col("doc_id"),
            filter(whitelist, kw => col("text").contains(kw)).as("tags_arr"))
          .withColumn("n_tags", size(col("tags_arr")))
          .filter(col("n_tags") > 0)
          // String form: the harness's row-sort cannot order list cells.
          .select(col("doc_id"), array_join(col("tags_arr"), "|").as("tags"),
            col("n_tags"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               array_to_string([kw FOR kw IN ['spark','stream','vector','window','hash']
                   IF contains(text, kw)], '|') AS tags,
               len([kw FOR kw IN ['spark','stream','vector','window','hash']
                   IF contains(text, kw)]) AS n_tags
        FROM documents
        WHERE len([kw FOR kw IN ['spark','stream','vector','window','hash']
                  IF contains(text, kw)]) > 0
        ORDER BY doc_id"""),
      doc = "P9 higher-order filter whitelist; reference extract_customers.py:122-132"),

    // P19/P6: null-safe numeric parsing and trailing-`.0` postal fix on a
    // string-typed numeric column synthesized from acctbal.
    Q(
      "scalar_safe_parse",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val rawCode = concat((col("c_custkey") % 9000 + 1000).cast("string"),
          when(col("c_custkey") % 3 === 0, ".0").otherwise(""))
        c.select(col("c_custkey"), rawCode.as("raw_code"))
          .withColumn("clean_code", regexp_replace(col("raw_code"), "\\.0$", ""))
          .withColumn("as_int", coalesce(col("clean_code").cast("int"), lit(0)))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey,
               CAST(c_custkey % 9000 + 1000 AS VARCHAR) ||
                 CASE WHEN c_custkey % 3 = 0 THEN '.0' ELSE '' END AS raw_code,
               regexp_replace(CAST(c_custkey % 9000 + 1000 AS VARCHAR) ||
                 CASE WHEN c_custkey % 3 = 0 THEN '.0' ELSE '' END, '\.0$', '')
                 AS clean_code,
               coalesce(TRY_CAST(regexp_replace(CAST(c_custkey % 9000 + 1000 AS VARCHAR) ||
                 CASE WHEN c_custkey % 3 = 0 THEN '.0' ELSE '' END, '\.0$', '')
                 AS INT), 0) AS as_int
        FROM customer ORDER BY c_custkey"""),
      doc = "P6/P19 safe numeric parse + .0 strip; reference extract_customers.py:114-120, extract_bookings.py:107-108"))
}
