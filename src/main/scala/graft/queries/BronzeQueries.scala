package graft.queries

import org.apache.spark.sql.functions._
import graft.bronze.Gomus

/** Catalog coverage for the gomus bronze normalizers (SURVEY §2.1 S2 +
  * §2.3 P4–P10, P19/P20) — previously golden-spec-only; here the full
  * extractCustomers path runs over a customer-derived raw frame and is
  * value-checked end-to-end, INCLUDING the seed-666 murmur3 privacy ids:
  * the fixture emails are built at exactly 18 ASCII bytes so the
  * [[Mm3Sql]] unrolled murmur3_x86_32 oracle replays them in DuckDB.
  */
object BronzeQueries extends QueryBase {

  val all: Seq[Q] = Seq(
    // The customer normalizer end-to-end (reference
    // extract_customers.py:21-60): murmur3 email ids with numeric
    // fallback (P4/P20), '.0' postal strip (P6), gender/newsletter enums
    // (P5), dd.MM.yyyy register dates with errors='coerce' drop (P8),
    // any-non-null-email validity (P10), ordered tourism-tag whitelist
    // containment (P9).
    Q(
      "bronze_customers",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val key = col("c_custkey")
        // Two fixed-18-byte email forms + a null third (fallback-id path);
        // the 'kultur...' form exercises the tourism-tag whitelist.
        val email = when(key % 3 === 0, lit(null).cast("string"))
          .when(key % 3 === 1, concat(lit("cust"),
            lpad(key.cast("string"), 9, "0"), lit("@x.de")))
          .otherwise(concat(lit("kultur"),
            lpad(key.cast("string"), 7, "0"), lit("@x.de")))
        val plz = (key % 90000 + 10000).cast("string")
        val raw = c.select(
          key.cast("string").as("Nummer"),
          when(key % 4 === 0, "Frau").when(key % 4 === 1, "Herr")
            .otherwise("").as("Anrede"),
          email.as("E-Mail"),
          // half the rows carry the pandas float artifact (P6)
          when(key % 2 === 0, concat(plz, lit(".0"))).otherwise(plz).as("PLZ"),
          when(key % 5 === 0, "ja").otherwise("nein").as("Newsletter"),
          lit("Privat").as("Kategorie"), lit("de").as("Sprache"),
          lit("DE").as("Land"), lit("Standard").as("Typ"),
          // dd.MM.yyyy; every 50th row unparseable → dropped (coerce)
          when(key % 50 === 0, "bad-date")
            .otherwise(date_format(date_add(lit("2019-01-01").cast("date"),
              (key % 700).cast("int")), "dd.MM.yyyy")).as("Erstellt am"))
        Gomus.extractCustomers(raw)
          .select(col("customer_id"), col("postal_code"), col("newsletter"),
            col("gender"), col("category"), col("language"), col("country"),
            col("type"),
            date_format(col("register_date"), "yyyy-MM-dd").as("register_day"),
            col("valid_mail"),
            array_join(col("tourism_tags"), ",").as("tags"))
          .orderBy("customer_id")
      },
      Some(s"""
        WITH raw AS (
          SELECT c_custkey AS k,
            CASE WHEN c_custkey % 3 = 0 THEN NULL
                 WHEN c_custkey % 3 = 1 THEN concat('cust',
                   lpad(CAST(c_custkey AS VARCHAR), 9, '0'), '@x.de')
                 ELSE concat('kultur',
                   lpad(CAST(c_custkey AS VARCHAR), 7, '0'), '@x.de')
            END AS email
          FROM customer WHERE c_custkey % 50 <> 0),
        ${Mm3Sql.chain("raw", "k", "email", 18, 666L, "m")}
        SELECT
          CASE WHEN r.email IS NULL THEN r.k ELSE m.hash END AS customer_id,
          CAST(r.k % 90000 + 10000 AS VARCHAR) AS postal_code,
          r.k % 5 = 0 AS newsletter,
          CASE WHEN r.k % 4 = 0 THEN 'w' WHEN r.k % 4 = 1 THEN 'm'
               ELSE '' END AS gender,
          'Privat' AS category, 'de' AS language, 'DE' AS country,
          'Standard' AS type,
          strftime(DATE '2019-01-01' + CAST(r.k % 700 AS INT),
                   '%Y-%m-%d') AS register_day,
          r.email IS NOT NULL AS valid_mail,
          CASE WHEN r.email LIKE '%kultur%' THEN 'kultur' ELSE '' END AS tags
        FROM raw r LEFT JOIN m_fin m ON m.k = r.k
        ORDER BY customer_id"""),
      doc = "gomus customer normalizer end-to-end (P4-P10, P19/P20): " +
        "murmur3 ids value-checked via the independent SQL murmur3; " +
        "reference extract_customers.py:21-60"))
}
