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
    // Missing Kundennummer short-circuits to literal 0 with NO mapping
    // lookup (orders.py:90-91 — pinned by the GomusGoldenSpec fixture
    // pair; a present-but-unmapped id is the null case instead).
    assert(out(1).getAs[Integer]("customer_id") === 0)
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

  test("extractEvents: latest-2 window with tiebreak, parity status, " +
      "hash fallback, serial dates, umlaut path key") {
    val bookings = Seq(
      // category Führung: 3 bookings — id 1 is OLDEST and must drop;
      // ids 2 and 3 tie on start_datetime → both kept (desc-id tiebreak
      // only orders them, n=2 keeps both)
      (1, "Führung", "2022-01-01 10:00:00"),
      (2, "Führung", "2022-06-01 10:00:00"),
      (3, "Führung", "2022-06-01 10:00:00"),
      (4, "Workshop", "2022-03-01 09:00:00"))
      .toDF("booking_id", "category", "s")
      .withColumn("start_datetime", $"s".cast("timestamp")).drop("s")
    val sheets = Seq(
      // booking 1's sheet must NOT survive (booking dropped)
      (1, "10", "a@b.c", "3.0", "44000.5", false),
      (2, "20", "mail@example.de", "2.0", "44000.5", false),
      (2, "21", null, "1.0", "44001.9", true),
      (3, "30", null, "5.0", "44002.0", false),
      (4, "40", "x@y.zz", "0.0", "44003.25", true))
      .toDF("booking_id", "ID", "E-Mail", "Plätze", "gebucht am", "cancelled")
    val out = Gomus.extractEvents(bookings, sheets)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(20L, 21L, 30L, 40L))
    val r20 = out(0)
    assert(r20.getAs[Long]("event_id") === 2L)
    assert(r20.getAs[Long]("customer_id") ===
      graft.functions.Murmur3Ops.hashBytes("mail@example.de".getBytes("UTF-8"), 666).toLong)
    assert(r20.getAs[Int]("reservation_count") === 2)
    // xldate epoch 1899-12-30: serial 44000 → 2020-06-18; .5 floors away
    assert(r20.getAs[java.sql.Date]("order_date").toString === "2020-06-18")
    assert(r20.getAs[String]("status") === "Gebucht")
    assert(r20.getAs[String]("path_key") === "Fuehrung")
    // null email → hash fallback 0; cancelled sheet → Storniert
    assert(out(1).getAs[Long]("customer_id") === 0L)
    assert(out(1).getAs[String]("status") === "Storniert")
  }

  test("exhibitions + exhibitionTimes: optional picture, literal dates " +
      "(no timezone conversion)") {
    val json =
      """{"exhibitions":[
        |{"title":"A","picture":{"original":"https://img/a.jpg"},
        | "time_frames":[{"start_at":"2020-03-01T00:30:00+02:00",
        |                 "end_at":"2020-05-31T00:30:00+02:00"}]},
        |{"title":"B",
        | "time_frames":[{"start_at":"2021-01-15T10:00:00+01:00",
        |                 "end_at":"2021-02-15T10:00:00+01:00"},
        |                {"start_at":"2021-06-01T00:30:00+02:00",
        |                 "end_at":"2021-07-01T00:30:00+02:00"}]}]}""".stripMargin
    val schema = "STRUCT<exhibitions: ARRAY<STRUCT<title: STRING, " +
      "picture: STRUCT<original: STRING>, " +
      "time_frames: ARRAY<STRUCT<start_at: STRING, end_at: STRING>>>>>"
    val pages = Seq(json).toDF("payload")
      .select(org.apache.spark.sql.functions.from_json(
        $"payload", schema, Map.empty[String, String]).as("p"))
      .select("p.*")
    val ex = Gomus.exhibitions(pages).orderBy("title").collect()
    assert(ex.map(r => (r.getAs[String]("title"),
      r.getAs[String]("picture_url"))).toSeq ===
      Seq(("A", "https://img/a.jpg"), ("B", null)))
    val times = Gomus.exhibitionTimes(pages)
      .orderBy("title", "start_date").collect()
    // 2020-03-01T00:30+02:00 is 2020-02-29T22:30 UTC — the literal-date
    // contract keeps 03-01, a timezone-converting parse would not
    assert(times.map(_.getAs[java.sql.Date]("start_date").toString).toSeq
      === Seq("2020-03-01", "2021-01-15", "2021-06-01"))
    assert(times.map(_.getAs[java.sql.Date]("end_date").toString).toSeq
      === Seq("2020-05-31", "2021-02-15", "2021-07-01"))
  }
}
