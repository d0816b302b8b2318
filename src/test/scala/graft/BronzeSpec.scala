package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.monotonically_increasing_id
import org.apache.spark.unsafe.types.UTF8String

import graft.bronze.Gomus
import graft.functions.Murmur3Ops

/** Golden tests for the bronze gomus normalizers — input rows mirror the
  * raw report shapes documented in FIXTURES.md (German headers), expected
  * outputs follow the reference transforms cited in [[graft.bronze.Gomus]].
  */
class BronzeSpec extends SparkSpec {
  import spark.implicits._

  private def mm(s: String): Int =
    Murmur3Ops.hashString(UTF8String.fromString(s), 666)

  test("extractBookings: guide hash, duration, coalesce title, start ts") {
    val raw = Seq(
      ("101", "Führung", "12", "Max Mustermann, Erika Beispiel",
        "05.03.2021", "10:30", "11:45", "Impressionismus",
        "Öffentliche Führung", null.asInstanceOf[String], "bestätigt"),
      ("102", "Workshop", null.asInstanceOf[String], null.asInstanceOf[String],
        "06.03.2021", "23:30", "00:15", "Moderne",
        null.asInstanceOf[String], "Termin X", "storniert"))
      .toDF("Buchung", "Angebotskategorie", "Anzahl Teilnehmende", "Guide",
        "Datum", "Uhrzeit von", "Uhrzeit bis", "Ausstellung", "Angebot",
        "Termin", "Status")
    val out = Gomus.extractBookings(raw).orderBy("booking_id").collect()

    assert(out(0) === Row(101, "Führung", 12, mm("maxmustermann"), 75,
      "Impressionismus", "Öffentliche Führung", "bestätigt",
      Timestamp.valueOf("2021-03-05 10:30:00")))
    // Missing guide → 0; missing participants → 0; over-midnight duration
    // wraps (+24 h, Python timedelta.seconds semantics); title falls back
    // to Termin.
    assert(out(1) === Row(102, "Workshop", 0, 0, 45, "Moderne", "Termin X",
      "storniert", Timestamp.valueOf("2021-03-06 23:30:00")))
  }

  test("extractCustomers: email hash + fallback id, parsing, tags, date drop") {
    val raw = Seq(
      ("1001", "Frau", "anna@kultur-reise.de", "14467.0", "ja", "Privat",
        "de", "Deutschland", "Standard", "01.02.2020"),
      ("1002", "Herr", null.asInstanceOf[String], "10115", "nein", "Firma",
        "en", "UK", "Firma", "15.07.2019"),
      ("1003", "", "bad@mail.com", "99999", "nein", "Privat", "de", "DE",
        "Standard", "not-a-date"),
      ("1004", "Herr", "malformed-no-at-sign", "10117", "nein", "Privat",
        "de", "DE", "Standard", "20.05.2021"))
      .toDF("Nummer", "Anrede", "E-Mail", "PLZ", "Newsletter", "Kategorie",
        "Sprache", "Land", "Typ", "Erstellt am")
    val out = Gomus.extractCustomers(raw).orderBy("register_date").collect()

    // Row with unparseable register date is dropped.
    assert(out.length === 3)
    // Reference parity: ANY non-null email counts as valid (the reference
    // checks isinstance(email, str), not an address shape).
    val r4 = out(2)
    assert(r4.getAs[Boolean]("valid_mail") === true)
    assert(r4.getAs[Int]("customer_id") === mm("malformed-no-at-sign"))
    val r2 = out(0) // 2019 row: null email → numeric fallback id
    assert(r2.getAs[Int]("customer_id") === 1002)
    assert(r2.getAs[String]("gender") === "m")
    assert(r2.getAs[Boolean]("newsletter") === false)
    assert(r2.getAs[Boolean]("valid_mail") === false)
    assert(r2.getAs[Seq[String]]("tourism_tags") === Seq.empty)
    val r1 = out(1)
    assert(r1.getAs[Int]("customer_id") === mm("anna@kultur-reise.de"))
    assert(r1.getAs[String]("postal_code") === "14467")
    assert(r1.getAs[Boolean]("newsletter") === true)
    assert(r1.getAs[String]("gender") === "w")
    assert(r1.getAs[Boolean]("valid_mail") === true)
    // Whitelist order preserved: reise before kultur.
    assert(r1.getAs[Seq[String]]("tourism_tags") === Seq("reise", "kultur"))
    assert(r1.getAs[Date]("register_date") === Date.valueOf("2020-02-01"))
  }

  test("dedupKeepLast keeps the highest-ordinal row per key") {
    val df = Seq((1, "old"), (1, "new"), (2, "only"))
      .toDF("customer_id", "v")
      .withColumn("ord", monotonically_increasing_id())
    val out = Gomus.dedupKeepLast(df, "customer_id", "ord")
      .select("customer_id", "v").as[(Int, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1, "new"), (2, "only")))
  }

  test("extractOrders: excel serial date, mapping join, boolean parse") {
    val raw = Seq(
      ("5001", "43840.96875", "77", "Ja", "bezahlt", "web"),
      ("5002", "44000.5", null.asInstanceOf[String], "Nein", "offen", "kasse"))
      .toDF("Bestellnummer", "Erstellt", "Kundennummer", "ist gültig?",
        "Bezahlstatus", "Herkunft")
    val mapping = Seq((77, 424242)).toDF("gomus_id", "customer_id")
    val out = Gomus.extractOrders(raw, mapping).orderBy("order_id").collect()

    // 43840 days after 1899-12-30 = 2020-01-10 (xldate epoch).
    assert(out(0) === Row(5001, Date.valueOf("2020-01-10"), 424242, true,
      true, "web"))
    // Missing Kundennummer → gomus_id 0 → unmapped → null customer.
    assert(out(1).getAs[Integer]("customer_id") === null)
    assert(out(1).getAs[Date]("order_date") === Date.valueOf("2020-06-18"))
    assert(out(1).getAs[Boolean]("valid") === false)
    assert(out(1).getAs[Boolean]("paid") === false)
  }

  test("daily entries: 24-column unpivot + actual/expected natural join") {
    val hoursActual = (0 until 24).map(h => s"$h.0")
    val hoursExpected = (0 until 24).map(h => s"$h:00")
    val mkRow = (id: String, ticket: String, c10: String) => Row.fromSeq(
      Seq(id, ticket) ++ (0 until 24).map(h => if (h == 10) c10 else "0"))
    val schemaA = org.apache.spark.sql.types.StructType(
      (Seq("ID", "Ticket") ++ hoursActual).map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType)))
    val schemaE = org.apache.spark.sql.types.StructType(
      (Seq("ID", "Ticket") ++ hoursExpected).map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType)))
    val actualRaw = spark.createDataFrame(
      java.util.Arrays.asList(mkRow("7", "Tagesticket", "5")), schemaA)
    val expectedRaw = spark.createDataFrame(
      java.util.Arrays.asList(mkRow("7", "Tagesticket", "8")), schemaE)

    val actual = Gomus.unpivotDailyEntries(actualRaw, hoursActual,
      "2021-03-05", "count")
    val expected = Gomus.unpivotDailyEntries(expectedRaw, hoursExpected,
      "2021-03-05", "unique_count")
    val combined = Gomus.combineDailyEntries(actual, expected)

    assert(combined.count() === 24)
    val at10 = combined
      .filter($"datetime" === Timestamp.valueOf("2021-03-05 10:00:00"))
      .select("id", "ticket", "count", "unique_count")
      .collect()
    assert(at10.toSeq === Seq(Row(7, "Tagesticket", 5, 8)))
  }
}
