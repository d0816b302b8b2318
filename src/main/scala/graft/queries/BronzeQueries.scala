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
        "reference extract_customers.py:21-60"),

    // Booking-report normalizer end-to-end (reference
    // extract_bookings.py:35-108): first-guide murmur3 with 0 fallback,
    // dd.MM.yyyy+HH:mm start timestamp, wrap-at-midnight duration
    // (timedelta.seconds semantics), Angebot/Termin coalesce, NaN→0
    // participants. Guides are built so the TRANSFORMED first name
    // ('guide' + 3 digits after lowercase/de-space/split) is fixed
    // 8 bytes — the SQL murmur3 replays the hash.
    Q(
      "bronze_bookings",
      (s, dir) => {
        // Sorted-input form (same rows, same total order): booking_id is
        // o_orderkey, so sort the bare key first and run the report mint
        // + extractBookings projection above it, once — the previous
        // final orderBy re-executed the whole normalizer in the range
        // partitioner's sampling pass (see OPTIMIZATION_r14.md Finding A).
        val o = sortedByKeys(
          t(s, dir, "orders").select("o_orderkey"), col("o_orderkey"))
        val key = col("o_orderkey")
        val raw = o.select(
          key.cast("string").as("Buchung"),
          when(key % 6 === 0, "Führung").when(key % 6 === 1, "Workshop")
            .otherwise("Event").as("Angebotskategorie"),
          when(key % 10 === 0, lit(null).cast("string"))
            .otherwise(concat((key % 30).cast("string"), lit(".0")))
            .as("Anzahl Teilnehmende"),
          when(key % 4 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("Gui De"), lpad((key % 100).cast("string"),
              3, "0"), lit(", Second Guide"))).as("Guide"),
          date_format(date_add(lit("2022-01-01").cast("date"),
            (key % 400).cast("int")), "dd.MM.yyyy").as("Datum"),
          concat(lpad((key % 24).cast("string"), 2, "0"), lit(":30"))
            .as("Uhrzeit von"),
          concat(lpad(((key * 7) % 24).cast("string"), 2, "0"), lit(":15"))
            .as("Uhrzeit bis"),
          when(key % 5 === 0, "Moderne").otherwise("Impressionismus")
            .as("Ausstellung"),
          when(key % 3 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("Angebot "), key)).as("Angebot"),
          concat(lit("Termin "), key).as("Termin"),
          when(key % 11 === 0, "storniert").otherwise("bestätigt")
            .as("Status"))
        Gomus.extractBookings(raw)
          .select(col("booking_id"), col("category"), col("participants"),
            col("guide_id"), col("duration"), col("exhibition"),
            col("title"), col("status"),
            date_format(col("start_datetime"), "yyyy-MM-dd HH:mm")
              .as("start_dt"))
      },
      Some(s"""
        WITH raw AS (
          SELECT o_orderkey AS k,
            CASE WHEN o_orderkey % 4 = 0 THEN NULL
                 ELSE concat('guide',
                   lpad(CAST(o_orderkey % 100 AS VARCHAR), 3, '0'))
            END AS gname,
            (o_orderkey % 24) * 60 + 30 AS von_min,
            ((o_orderkey * 7) % 24) * 60 + 15 AS bis_min
          FROM orders),
        ${Mm3Sql.chain("raw", "k", "gname", 8, 666L, "g")}
        SELECT r.k AS booking_id,
          CASE WHEN r.k % 6 = 0 THEN 'Führung' WHEN r.k % 6 = 1 THEN 'Workshop'
               ELSE 'Event' END AS category,
          CASE WHEN r.k % 10 = 0 THEN 0 ELSE CAST(r.k % 30 AS INT) END
            AS participants,
          coalesce(g.hash, 0) AS guide_id,
          CASE WHEN r.bis_min - r.von_min < 0 THEN r.bis_min - r.von_min + 1440
               ELSE r.bis_min - r.von_min END AS duration,
          CASE WHEN r.k % 5 = 0 THEN 'Moderne' ELSE 'Impressionismus' END
            AS exhibition,
          CASE WHEN r.k % 3 = 0 THEN concat('Termin ', r.k)
               ELSE concat('Angebot ', r.k) END AS title,
          CASE WHEN r.k % 11 = 0 THEN 'storniert' ELSE 'bestätigt' END
            AS status,
          concat(strftime(DATE '2022-01-01' + CAST(r.k % 400 AS INT),
                          '%Y-%m-%d'),
                 ' ', lpad(CAST(r.k % 24 AS VARCHAR), 2, '0'), ':30')
            AS start_dt
        FROM raw r LEFT JOIN g_fin g ON g.k = r.k
        ORDER BY booking_id"""),
      doc = "gomus booking normalizer end-to-end (guide murmur3, start " +
        "timestamp, midnight-wrap duration, coalesce title); reference " +
        "extract_bookings.py:35-108"),

    // Order-report normalizer end-to-end (reference orders.py:54-104):
    // Excel-serial order dates (epoch 1899-12-30), gomus→customer id
    // resolution as ONE broadcast join (vs the reference's per-row SQL
    // lookup), case-insensitive valid/paid flags, NaN→0 gomus ids.
    Q(
      "bronze_orders",
      (s, dir) => {
        // Sorted-input form: order_id = o_orderkey (Finding A); the
        // mapping join stays an explicit left BHJ above the sort, which
        // streams the sorted side in order.
        val o = sortedByKeys(
          t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("o_orderkey"))
        val c = t(s, dir, "customer")
        val key = col("o_orderkey")
        val raw = o.select(
          key.cast("string").as("Bestellnummer"),
          // Excel serial with a fractional time part → floor to the day
          (key % 2000 + 40000 + 0.5).cast("string").as("Erstellt"),
          when(key % 7 === 0, lit(null).cast("string"))
            .otherwise(concat(col("o_custkey").cast("string"), lit(".0")))
            .as("Kundennummer"),
          when(key % 3 === 0, "JA").when(key % 3 === 1, "ja")
            .otherwise("nein").as("ist gültig?"),
          when(key % 4 === 0, "BEZAHLT").when(key % 4 === 1, "bezahlt")
            .otherwise("offen").as("Bezahlstatus"),
          when(key % 2 === 0, "online").otherwise("kasse").as("Herkunft"))
        // gomus→customer mapping: even customer keys map, odd are unknown
        val mapping = c.filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey").as("gomus_id"),
            (col("c_custkey") * 2 + 1).cast("long").as("customer_id"))
        Gomus.extractOrders(raw, mapping)
          .select(col("order_id"),
            date_format(col("order_date"), "yyyy-MM-dd").as("order_day"),
            col("customer_id"), col("valid"), col("paid"), col("origin"))
      },
      Some("""
        SELECT o_orderkey AS order_id,
          strftime(DATE '1899-12-30'
                   + CAST(floor(o_orderkey % 2000 + 40000 + 0.5) AS INT),
                   '%Y-%m-%d') AS order_day,
          -- Missing gomus ids SHORT-CIRCUIT to literal 0 with NO mapping
          -- lookup (orders.py:90-91 'if np.isnan: return 0' — proven by
          -- the golden fixture pair in GomusGoldenSpec); only present ids
          -- go through the mapping, where odd keys are unmapped -> NULL.
          CASE WHEN o_orderkey % 7 = 0 THEN 0
               WHEN o_custkey % 2 = 0 THEN CAST(o_custkey * 2 + 1 AS BIGINT)
          END AS customer_id,
          o_orderkey % 3 IN (0, 1) AS valid,
          o_orderkey % 4 IN (0, 1) AS paid,
          CASE WHEN o_orderkey % 2 = 0 THEN 'online' ELSE 'kasse' END
            AS origin
        FROM orders ORDER BY order_id"""),
      doc = "gomus order normalizer end-to-end (Excel serial dates, " +
        "broadcast id-mapping join, case-insensitive flags); reference " +
        "orders.py:54-104"),

    // Daily-entries matrix unpivot end-to-end (reference
    // daily_entries.py:85-126): a 24-hour-column sheet stacked long via
    // one posexplode projection; the oracle rebuilds the same long form
    // directly from the count formula — the unpivot must agree.
    Q(
      "bronze_daily_entries",
      (s, dir) => {
        val n = t(s, dir, "nation")
        val key = col("n_nationkey")
        val hourCols = (0 until 24).map(h => s"$h.0")
        val sheet = n.select(
          (key.cast("string")).as("ID") +:
          concat(lit("Ticket-"), key % 3).as("Ticket") +:
          hourCols.zipWithIndex.map { case (name, h) =>
            when((key + h) % 9 === 0, lit(null).cast("string"))
              .otherwise(concat(((key * 13 + h * 7) % 50).cast("string"),
                lit(".0"))).as(name)
          }: _*)
        Gomus.unpivotDailyEntries(sheet, hourCols, "2023-06-01", "count")
          .select(col("id"), col("ticket"),
            date_format(col("datetime"), "yyyy-MM-dd HH:mm").as("dt"),
            col("count"))
          .orderBy("id", "ticket", "dt")
      },
      Some("""
        SELECT n_nationkey AS id,
               concat('Ticket-', n_nationkey % 3) AS ticket,
               concat('2023-06-01 ', lpad(CAST(h AS VARCHAR), 2, '0'), ':00')
                 AS dt,
               CASE WHEN (n_nationkey + h) % 9 = 0 THEN 0
                    ELSE CAST((n_nationkey * 13 + h * 7) % 50 AS INT) END
                 AS count
        FROM nation, LATERAL (SELECT unnest(range(24)) AS h)
        ORDER BY id, ticket, dt"""),
      doc = "gomus daily-entries 24-column matrix unpivot (posexplode " +
        "projection); reference daily_entries.py:85-126"),

    // The facebook comments normalizer end-to-end (reference
    // facebook.py:392-463): nested toplevel+reply payloads are minted
    // per order FROM EXPRESSIONS (collect_list of structs → to_json — no
    // driver loop), then graft.bronze.Social.fbComments parses, explodes
    // both levels, tags museum authorship, and dedups on (comment_id,
    // post_id). The oracle replays the whole nested flatten relationally
    // from lineitem, so a wrong id split, reply scoping, or museum flag
    // cannot hash-match. (Fixture-level fidelity against the reference's
    // own expected CSVs is SocialBronzeSpec.)
    Q(
      "bronze_fb_comments",
      (s, dir) => {
        // The synthetic lineitem repeats (orderkey, linenumber), so
        // comment ids mint from a per-order ordinal (ties share ln+sd →
        // the row SET is order-independent); every reply is planted
        // TWICE in its array so the (comment_id, post_id) dedup provably
        // collapses exact duplicates — the reference's repeated-fetch
        // workaround (facebook.py:358-361) — deterministically.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("ok").orderBy("ln", "sd")
        val li = t(s, dir, "lineitem")
          .filter(pmod(col("l_orderkey"), lit(1000L)) === 0)
          .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
            col("l_shipdate").as("sd"))
          .withColumn("ord", row_number().over(w))
        val cid = col("ok") * 100 + col("ord")
        val reply = struct(
          concat(lit("pg_"), (cid + 50).cast("string")).as("id"),
          concat(lit("reply to c"), col("ln").cast("string")).as("message"),
          date_format(col("sd"), "yyyy-MM-dd'T'HH:mm:ss+0000")
            .as("created_time"),
          when(col("ord") % 4 === 0, struct(lit("Museum Barberini")
            .as("name"))).otherwise(lit(null).cast("struct<name:string>"))
            .as("from"))
        val toplevel = struct(
          concat(lit("pg_"), cid.cast("string")).as("id"),
          concat(lit("comment c"), col("ln").cast("string")).as("message"),
          date_format(col("sd"), "yyyy-MM-dd'T'HH:mm:ss+0000")
            .as("created_time"),
          lit(null).cast("struct<name:string>").as("from"),
          when(col("ord") % 2 === 0, lit(2L)).otherwise(lit(0L))
            .as("comment_count"),
          when(col("ord") % 2 === 0, struct(array(reply, reply).as("data")))
            .otherwise(lit(null)
              .cast("struct<data:array<struct<id:string,message:string," +
                "created_time:string,from:struct<name:string>>>>"))
            .as("comments"))
        val batches = li.groupBy(col("ok"))
          .agg(collect_list(toplevel).as("data"))
          .select(lit("777").as("page_id"), col("ok").cast("string")
            .as("post_id"), to_json(struct(col("data"))).as("payload"))
        graft.bronze.Social.fbComments(batches, "Museum Barberini")
          .groupBy("is_from_museum")
          .agg(count(lit(1)).as("n_comments"),
            wsum(col("comment_id").cast("long"))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0))
              .cast("string").as("sum_cid"),
            max(col("post_date")).as("max_date"),
            sum(when(col("response_to").isNotNull, 1L).otherwise(0L))
              .as("n_replies"))
          .orderBy("is_from_museum")
      },
      Some("""
        WITH li AS (
          SELECT l_orderkey AS ok, l_shipdate AS sd,
                 row_number() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber, l_shipdate)
                   AS ord
          FROM lineitem WHERE l_orderkey % 1000 = 0),
        comments AS (
          SELECT ok * 100 + ord AS cid,
                 strftime(sd, '%Y-%m-%dT%H:%M:%S+0000') AS post_date,
                 FALSE AS is_from_museum, FALSE AS is_reply
          FROM li
          UNION ALL
          -- the duplicate planted reply collapses in the dedup: one row
          SELECT ok * 100 + ord + 50 AS cid,
                 strftime(sd, '%Y-%m-%dT%H:%M:%S+0000') AS post_date,
                 (ord % 4 = 0) AS is_from_museum, TRUE AS is_reply
          FROM li WHERE ord % 2 = 0)
        SELECT is_from_museum, count(*) AS n_comments,
               CAST(sum(cid) AS VARCHAR) AS sum_cid,
               max(post_date) AS max_date,
               CAST(sum(CASE WHEN is_reply THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_replies
        FROM comments GROUP BY is_from_museum ORDER BY is_from_museum"""),
      doc = "facebook comments normalizer (nested toplevel+reply flatten, " +
        "museum-author tag, composite-key dedup) over expression-minted " +
        "payloads; reference facebook.py:392-463"),

    // Event-reservation composite end-to-end (reference events.py:40-129):
    // per-category latest-2 bookings (ORDER BY start_datetime DESC
    // LIMIT 2), approved+cancelled sheet attach with parity status text,
    // Excel-serial order dates, seed-666 murmur3 customer ids (18-byte
    // emails so the SQL murmur3 replays them), umlaut path keys,
    // category-ordered output. The oracle replays the window pick, the
    // sheet mint, and the hash — a wrong tiebreak, serial epoch, or
    // transliteration all change the value hash.
    Q(
      "bronze_events",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val key = col("o_orderkey")
        val bookings = o.select(
          key.cast("long").as("booking_id"),
          when(key % 4 === 0, "Führung")
            .when(key % 4 === 1, "Öffentliche Führung")
            .when(key % 4 === 2, "Workshop")
            .otherwise("Abendveranstaltung").as("category"),
          to_timestamp(concat(
            date_format(date_add(lit("2022-01-01").cast("date"),
              ((key * 13) % 500).cast("int")), "yyyy-MM-dd"),
            lit(" "), lpad((key % 24).cast("string"), 2, "0"), lit(":00")))
            .as("start_datetime"))
        // two sheets (approved r∈{0,2} / cancelled r∈{1,3}) × 2 rows per
        // booking, minted from expressions — German report headers
        val sheets = o.select(key.as("bk"),
            explode(sequence(lit(0), lit(3))).as("r"))
          .select(
            col("bk").cast("long").as("booking_id"),
            (col("bk") * 10 + col("r")).cast("string").as("ID"),
            when((col("bk") * 10 + col("r")) % 3 === 0,
              lit(null).cast("string"))
              .otherwise(concat(lit("resv"),
                lpad((col("bk") * 10 + col("r")).cast("string"), 9, "0"),
                lit("@x.de"))).as("E-Mail"),
            concat(((col("bk") + col("r")) % 7).cast("string"), lit(".0"))
              .as("Plätze"),
            (col("bk") % 2000 + 40000 + col("r") * 0.25).cast("string")
              .as("gebucht am"),
            (col("r") % 2 === 1).as("cancelled"))
        Gomus.extractEvents(bookings, sheets)
          .select(col("id"), col("event_id"), col("customer_id"),
            col("reservation_count"),
            date_format(col("order_date"), "yyyy-MM-dd").as("order_day"),
            col("status"), col("category"), col("path_key"))
          .orderBy("category", "event_id", "id")
      },
      Some(s"""
        WITH bk AS (
          SELECT o_orderkey AS k,
            CASE WHEN o_orderkey % 4 = 0 THEN 'Führung'
                 WHEN o_orderkey % 4 = 1 THEN 'Öffentliche Führung'
                 WHEN o_orderkey % 4 = 2 THEN 'Workshop'
                 ELSE 'Abendveranstaltung' END AS category,
            DATE '2022-01-01' + CAST((o_orderkey * 13) % 500 AS INT)
              AS start_day,
            o_orderkey % 24 AS start_hour
          FROM orders),
        kept AS (
          SELECT k, category FROM (
            SELECT k, category, row_number() OVER (PARTITION BY category
              ORDER BY start_day DESC, start_hour DESC, k DESC) AS rn
            FROM bk) WHERE rn <= 2),
        raw AS (
          SELECT s.k, s.category, s.k * 10 + r.r AS rid, r.r,
            CASE WHEN (s.k * 10 + r.r) % 3 = 0 THEN NULL
                 ELSE concat('resv',
                   lpad(CAST(s.k * 10 + r.r AS VARCHAR), 9, '0'), '@x.de')
            END AS email
          FROM kept s, LATERAL (SELECT unnest(range(0, 4)) AS r) r),
        ${Mm3Sql.chain("raw", "rid", "email", 18, 666L, "m")}
        SELECT CAST(r.rid AS BIGINT) AS id, CAST(r.k AS BIGINT) AS event_id,
          coalesce(m.hash, 0) AS customer_id,
          CAST((r.k + r.r) % 7 AS INT) AS reservation_count,
          strftime(DATE '1899-12-30' + CAST(r.k % 2000 + 40000 AS INT),
                   '%Y-%m-%d') AS order_day,
          CASE WHEN r.r % 2 = 1 THEN 'Storniert' ELSE 'Gebucht' END
            AS status,
          r.category,
          CASE r.category WHEN 'Führung' THEN 'Fuehrung'
               WHEN 'Öffentliche Führung' THEN 'Oeffentliche Fuehrung'
               ELSE r.category END AS path_key
        FROM raw r LEFT JOIN m_fin m ON m.k = r.rid
        ORDER BY category, event_id, id"""),
      doc = "gomus event-reservation composite (latest-2 window, sheet " +
        "parity status, serial dates, murmur3 ids, umlaut path keys); " +
        "reference events.py:40-129"),

    // Exhibition + time-frame extract (reference exhibitions.py:57-115):
    // API payloads are minted as JSON TEXT (to_json over expression
    // structs), parsed back with an explicit schema, and flattened —
    // optional picture handling and the literal-date semantics of
    // dateparser.parse(...).date() included. The +02:00 offset at
    // T00:30 makes the literal-date contract sharp: a timezone-converting
    // parse would land on the previous day.
    Q(
      "bronze_exhibitions",
      (s, dir) => {
        val n = t(s, dir, "nation")
        val key = col("n_nationkey")
        val tf = (startOff: org.apache.spark.sql.Column,
            endOff: org.apache.spark.sql.Column) => struct(
          concat(date_format(date_add(lit("2020-01-01").cast("date"),
            startOff.cast("int")), "yyyy-MM-dd"), lit("T00:30:00+02:00"))
            .as("start_at"),
          concat(date_format(date_add(lit("2020-01-01").cast("date"),
            endOff.cast("int")), "yyyy-MM-dd"), lit("T00:30:00+02:00"))
            .as("end_at"))
        val base = (key * 11) % 800
        val exhibition = struct(
          concat(lit("Ausstellung "), col("n_name")).as("title"),
          when(key % 3 === 0,
            lit(null).cast("struct<original:string>"))
            .otherwise(struct(concat(lit("https://img.example/"),
              key.cast("string"), lit(".jpg")).as("original"))).as("picture"),
          when(key % 2 === 0, array(tf(base, base + 90)))
            .otherwise(array(tf(base, base + 90),
              tf(base + 100, base + 200))).as("time_frames"))
        val payloads = n.select(
          to_json(struct(array(exhibition).as("exhibitions"))).as("payload"))
        val schema = "STRUCT<exhibitions: ARRAY<STRUCT<title: STRING, " +
          "picture: STRUCT<original: STRING>, " +
          "time_frames: ARRAY<STRUCT<start_at: STRING, end_at: STRING>>>>>"
        val pages = payloads
          .select(from_json(col("payload"), schema,
            Map.empty[String, String]).as("p"))
          .select(col("p.*"))
        Gomus.exhibitions(pages)
          .join(Gomus.exhibitionTimes(pages), Seq("title"))
          .select(col("title"), col("picture_url"),
            date_format(col("start_date"), "yyyy-MM-dd").as("start_day"),
            date_format(col("end_date"), "yyyy-MM-dd").as("end_day"))
          .orderBy("title", "start_day")
      },
      Some("""
        WITH n AS (
          SELECT n_nationkey AS k,
                 concat('Ausstellung ', n_name) AS title,
                 CASE WHEN n_nationkey % 3 = 0 THEN NULL
                      ELSE concat('https://img.example/', n_nationkey, '.jpg')
                 END AS picture_url,
                 DATE '2020-01-01' + CAST((n_nationkey * 11) % 800 AS INT)
                   AS s1
          FROM nation),
        frames AS (
          SELECT title, picture_url, s1 AS s, s1 + 90 AS e FROM n
          UNION ALL
          SELECT title, picture_url, s1 + 100, s1 + 200 FROM n WHERE k % 2 = 1)
        SELECT title, picture_url,
               strftime(s, '%Y-%m-%d') AS start_day,
               strftime(e, '%Y-%m-%d') AS end_day
        FROM frames ORDER BY title, start_day"""),
      doc = "gomus exhibition + time-frame extract over JSON payloads " +
        "(optional picture, literal-date time frames); reference " +
        "exhibitions.py:57-115"))
}
