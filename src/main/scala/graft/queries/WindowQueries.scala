package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / ordered computation — SURVEY.md §2.6 (W1–W5).
  *
  * Every window partitions by a key that the data is keyed on naturally
  * (user_id, customer), so at scale each partition's state fits one task;
  * there is no global unpartitioned window except over already-aggregated
  * small frames (daily rollups).
  */
object WindowQueries extends QueryBase {

  val all: Seq[Q] = Seq(
    // Offline changepoint detection via BINARY SEGMENTATION (Scott &
    // Knott 1974's split step — the classic first stage of offline
    // changepoint methods): for every candidate split of the ordered
    // daily series, the variance-reduction gain SSE_total − (SSE_left +
    // SSE_right) comes closed-form from cumulative sums of x and x²
    // (SSE = Σx² − (Σx)²/n), so scoring all N−1 splits is one window
    // pass over the ALREADY-AGGREGATED daily frame (tens of rows by
    // construction; the corpus-sized work is the daily rollup's ordinary
    // partial-agg shuffle). Centi-unit exact sums keep every cumulative
    // value an integer-exact double, so both engines score splits
    // identically. Complements `window_cusum_shift` (sequential/online)
    // with the offline argmax estimator; top-3 splits reported.
    Q(
      "window_changepoint",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(wsum(round(col("value") * 100).cast("long"))
            .cast("double").as("x"))
        val w = Window.orderBy("day")
        // x² sums accumulate in exact DECIMAL (x² alone is ~3e14 and the
        // centi-unit total brushes 2^53 at sf0.1 — a double sum would go
        // order-dependent at the very next scale-up), then widen to
        // double ONCE from the exact total on both faces.
        val x2 = (col("x") * col("x")).cast("decimal(38,0)")
        val cum = daily
          .withColumn("i", row_number().over(w).cast("double"))
          .withColumn("s1", sum(col("x")).over(w))
          .withColumn("s2", sum(x2).over(w).cast("double"))
        val tot = daily.agg(count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("t1"), sum(x2).cast("double").as("t2"))
        val scored = cum.crossJoin(broadcast(tot))
          .filter(col("i") < col("n"))
          .withColumn("sse_tot",
            col("t2") - col("t1") * col("t1") / col("n"))
          .withColumn("sse_l",
            col("s2") - col("s1") * col("s1") / col("i"))
          .withColumn("sse_r",
            (col("t2") - col("s2")) -
              (col("t1") - col("s1")) * (col("t1") - col("s1")) /
              (col("n") - col("i")))
          .withColumn("gain", col("sse_tot") - col("sse_l") - col("sse_r"))
        scored
          .withColumn("rank", row_number().over(
            Window.orderBy(col("gain").desc, col("day").asc)))
          .filter(col("rank") <= 3)
          .select(col("rank"), col("day").as("split_day"),
            round(col("s1") / col("i") / 100d, 4).as("mean_left"),
            round((col("t1") - col("s1")) / (col("n") - col("i")) / 100d, 4)
              .as("mean_right"),
            round(col("gain") / 10000d, 4).as("gain"))
          .orderBy("rank")
      },
      Some("""
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 CAST(CAST(sum(CAST(round(value * 100) AS BIGINT))
                   AS BIGINT) AS DOUBLE) AS x
          FROM events GROUP BY 1),
        cum AS (
          SELECT day, x,
                 CAST(row_number() OVER (ORDER BY day) AS DOUBLE) AS i,
                 CAST(sum(x) OVER (ORDER BY day) AS DOUBLE) AS s1,
                 CAST(sum(CAST(x * x AS HUGEINT)) OVER (ORDER BY day)
                   AS DOUBLE) AS s2
          FROM daily),
        tot AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(x) AS DOUBLE) AS t1,
                 CAST(sum(CAST(x * x AS HUGEINT)) AS DOUBLE) AS t2
          FROM daily),
        scored AS (
          SELECT day, i, s1, n, t1,
                 (t2 - t1 * t1 / n)
                   - (s2 - s1 * s1 / i)
                   - ((t2 - s2) - (t1 - s1) * (t1 - s1) / (n - i)) AS gain
          FROM cum, tot WHERE i < n)
        SELECT rank, day AS split_day,
               round(s1 / i / 100, 4) AS mean_left,
               round((t1 - s1) / (n - i) / 100, 4) AS mean_right,
               round(gain / 10000, 4) AS gain
        FROM (SELECT *, row_number() OVER (ORDER BY gain DESC, day ASC)
                AS rank
              FROM scored)
        WHERE rank <= 3 ORDER BY rank"""),
      doc = "offline changepoint via binary segmentation: closed-form " +
        "SSE gain from cumulative sums over the daily frame, top-3 " +
        "splits; the offline complement of window_cusum_shift"),

    // W1: lag feature columns for the prediction input.
    // reference src/visitor_prediction/predict.py:163-164 (entries.shift(i)).
    Q(
      "window_lag_features",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(dsum(col("value")).as("total"))
        val w = Window.orderBy("day")
        daily
          .withColumn("lag_1", lag(col("total"), 1).over(w))
          .withColumn("lag_7", lag(col("total"), 7).over(w))
          .orderBy("day")
      },
      Some("""
        SELECT day, total,
               lag(total, 1) OVER (ORDER BY day) AS lag_1,
               lag(total, 7) OVER (ORDER BY day) AS lag_7
        FROM (SELECT strftime(ts, '%Y-%m-%d') AS day,
                     CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total
              FROM events GROUP BY 1)
        ORDER BY day"""),
      doc = "W1 lag features; reference predict.py:163-164"),

    // W2: gap-based sessionization (gaps-and-islands): a >30 min silence
    // starts a new session. reference keyword_intervals.py:117-141.
    Q(
      "window_sessionize",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gapSec = col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long")
        val newSession = when(gapSec.isNull || gapSec > 1800, 1).otherwise(0)
        ev.withColumn("new_s", newSession)
          .withColumn("session_id", sum(col("new_s")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("longest_session"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id, count(*) AS n_sessions, max(n_events) AS longest_session
        FROM (
          SELECT user_id, session_id, count(*) AS n_events
          FROM (
            SELECT user_id,
                   sum(CASE WHEN gap_sec IS NULL OR gap_sec > 1800 THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (SELECT user_id, ts, event_id,
                         date_diff('second',
                                   lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                   ts) AS gap_sec
                  FROM events))
          GROUP BY user_id, session_id)
        GROUP BY user_id ORDER BY user_id"""),
      doc = "W2 gaps-and-islands sessionization; reference keyword_intervals.py:117-141"),

    // W3: top-k per group with deterministic tiebreak.
    // reference events.py:125-129 (ORDER BY ... DESC LIMIT 2).
    Q(
      "window_topk_per_group",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 2)
          .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_custkey", "rk")
      },
      Some("""
        SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          FROM orders)
        WHERE rk <= 2 ORDER BY o_custkey, rk"""),
      doc = "W3 top-k per group; reference events.py:125-129"),

    // Running cumulative total per customer over order history — decimal
    // accumulation so the running values are exact at any parallelism.
    Q(
      "window_running_total",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.withColumn("running_spend",
            sum(round(col("o_totalprice") * 10000).cast("long")).over(w) / lit(1e4))
          .select(col("o_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
            col("running_spend"))
          .orderBy("o_custkey", "order_day", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,4)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
        FROM orders ORDER BY o_custkey, order_day, o_orderkey"""),
      doc = "running total frame window; §2.6 frame-spec"),

    // Moving average over an explicit ROWS frame on the (small) daily
    // rollup — frame-spec window (§2.6 note on rowsBetween).
    Q(
      "window_moving_avg",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 4)))
            .as("total_dec"))
        val w = Window.orderBy("day").rowsBetween(-6, 0)
        daily
          .withColumn("ma_7", round(avg(col("total_dec")).over(w).cast("double"), 6))
          .select(col("day"), col("total_dec").cast("double").as("total"), col("ma_7"))
          .orderBy("day")
      },
      Some("""
        SELECT day, CAST(total_dec AS DOUBLE) AS total,
               round(CAST(avg(total_dec) OVER (ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS ma_7
        FROM (SELECT strftime(ts, '%Y-%m-%d') AS day,
                     sum(CAST(value AS DECIMAL(30,4))) AS total_dec
              FROM events GROUP BY 1)
        ORDER BY day"""),
      doc = "frame-spec moving average; §2.6"),

    // W5: ordinal row positions — ntile quartiles of customers by balance
    // within nation (ordered-computation bucket assignment).
    Q(
      "window_ntile_bucket",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        c.withColumn("quartile", ntile(4).over(w))
          .groupBy("c_nationkey", "quartile")
          .agg(count(lit(1)).as("n"), round(davg(col("c_acctbal")), 6).as("avg_bal"))
          .orderBy("c_nationkey", "quartile")
      },
      Some("""
        SELECT c_nationkey, quartile, count(*) AS n,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) / count(c_acctbal), 6) AS avg_bal
        FROM (SELECT c_nationkey, c_acctbal,
                     ntile(4) OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
              FROM customer)
        GROUP BY c_nationkey, quartile ORDER BY c_nationkey, quartile"""),
      doc = "W5 ordinal bucketing via ntile; §2.6"),

    // Time-series gap fill + forward fill (LOCF): densify each user's
    // observed purchase days to a full daily grid, carrying the last
    // observation across gaps — the resampling step a forecasting
    // pipeline runs before feature extraction. Plan shape: the grid is
    // an explode of per-user (min,max) spans (rows ∝ users × days, never
    // a calendar cross join), the fill is one window per user ordered by
    // day; at scale both shuffle once on user_id and the window state is
    // a single value.
    Q(
      "window_forward_fill",
      (s, dir) => {
        val e = t(s, dir, "events")
          .filter(col("user_id") < 20 && col("event_type") === "purchase")
        val daily = e.groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(round(max(col("value")), 6).as("v"))
        val span = daily.groupBy("user_id")
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val grid = span.select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
            col("v").isNull.as("was_gap"))
          .orderBy("user_id", "day")
      },
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day, round(max(value), 6) AS v
          FROM events WHERE user_id < 20 AND event_type = 'purchase'
          GROUP BY 1, 2),
        span AS (
          SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        grid AS (
          SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                   CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
          FROM span)
        SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
               last_value(d.v IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.day
                 ROWS UNBOUNDED PRECEDING) AS v_filled,
               d.v IS NULL AS was_gap
        FROM grid g LEFT JOIN daily d
          ON g.user_id = d.user_id AND g.day = d.day
        ORDER BY g.user_id, day"""),
      doc = "time-series densify + LOCF forward fill (per-user day grid " +
        "from span explode, one window per user)"),

    // Linear interpolation over the same per-user day grid — LOCF's
    // sibling for metrics that trend between observations: each gap day
    // gets prev + (next - prev) * elapsed/gap_len from the surrounding
    // observed days (two windows over one per-user sort: last-non-null
    // backward, first-non-null forward). Same densify plan as
    // window_forward_fill; identical expression order on both engines
    // keeps the double math bit-stable under round(6).
    Q(
      "window_interpolate",
      (s, dir) => {
        val e = t(s, dir, "events")
          .filter(col("user_id") < 20 && col("event_type") === "purchase")
        val daily = e.groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(round(max(col("value")), 6).as("v"))
        val span = daily.groupBy("user_id")
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val grid = span.select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
        val wB = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wF = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val j = grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"), col("v"),
            last(col("v"), ignoreNulls = true).over(wB).as("vp"),
            last(when(col("v").isNotNull, col("day")), ignoreNulls = true)
              .over(wB).as("dp"),
            first(col("v"), ignoreNulls = true).over(wF).as("vn"),
            first(when(col("v").isNotNull, col("day")), ignoreNulls = true)
              .over(wF).as("dn"))
        j.select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            when(col("v").isNotNull, col("v"))
              .when(col("vp").isNull, col("vn"))
              .when(col("vn").isNull, col("vp"))
              .otherwise(round(
                col("vp") + (col("vn") - col("vp")) *
                  (datediff(col("day"), col("dp")).cast("double") /
                    datediff(col("dn"), col("dp")).cast("double")), 6))
              .as("v_interp"),
            col("v").isNull.as("was_gap"))
          .orderBy("user_id", "day")
      },
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day, round(max(value), 6) AS v
          FROM events WHERE user_id < 20 AND event_type = 'purchase'
          GROUP BY 1, 2),
        span AS (
          SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        grid AS (
          SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                   CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
          FROM span),
        j AS (
          SELECT g.user_id, g.day, d.v,
                 last_value(d.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS UNBOUNDED PRECEDING) AS vp,
                 last_value(CASE WHEN d.v IS NOT NULL THEN g.day END
                     IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS UNBOUNDED PRECEDING) AS dp,
                 first_value(d.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
                 first_value(CASE WHEN d.v IS NOT NULL THEN g.day END
                     IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS dn
          FROM grid g LEFT JOIN daily d
            ON g.user_id = d.user_id AND g.day = d.day)
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN vp IS NULL THEN vn
                    WHEN vn IS NULL THEN vp
                    ELSE round(vp + (vn - vp) *
                      (CAST(date_diff('day', dp, day) AS DOUBLE) /
                       CAST(date_diff('day', dp, dn) AS DOUBLE)), 6)
               END AS v_interp,
               v IS NULL AS was_gap
        FROM j ORDER BY user_id, day"""),
      doc = "time-series linear interpolation over the densified day " +
        "grid: backward/forward non-null windows bracket each gap, " +
        "value = prev + slope * elapsed"),

    // Ordered conversion funnel view -> click -> purchase: a user counts
    // for stage N only with an event STRICTLY after their stage-(N-1)
    // time (the product-analytics "windowFunnel" semantics). Plan shape:
    // three chained unordered windows over the SAME user_id partitioning
    // (one exchange, no sort — conditional min needs no order), then the
    // per-user collapse reuses that partitioning, then a 1-row global
    // aggregate; per-user state is three timestamps, so the operator is
    // one shuffle at any event count.
    Q(
      "window_funnel",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id")
        val perRow = ev
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("ts") > col("t1"),
              col("ts"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
              col("ts"))).over(w))
        val perUser = perRow.groupBy("user_id")
          .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
            max(col("t3")).as("t3"))
        val c = perUser.agg(
          count(col("t1")).as("n1"), count(col("t2")).as("n2"),
          count(col("t3")).as("n3"))
        c.select(
            expr("stack(3, 1, 'view', n1, CAST(NULL AS BIGINT)," +
              " 2, 'click', n2, n1, 3, 'purchase', n3, n2)")
              .as(Seq("stage_ord", "stage", "n_users", "n_prev")))
          .select(col("stage_ord"), col("stage"), col("n_users"),
            when(col("n_prev").isNull, lit(1.0))
              .otherwise(round(col("n_users").cast("double") / col("n_prev"), 6))
              .as("conv"))
          .orderBy("stage_ord")
      },
      Some("""
        WITH t1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1),
        t2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
          WHERE e.event_type = 'click' GROUP BY 1),
        t3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
          WHERE e.event_type = 'purchase' GROUP BY 1),
        c AS (SELECT (SELECT count(*) FROM t1) AS n1,
                     (SELECT count(*) FROM t2) AS n2,
                     (SELECT count(*) FROM t3) AS n3)
        SELECT stage_ord, stage, n_users, conv FROM (
          SELECT 1 AS stage_ord, 'view' AS stage, n1 AS n_users, 1.0 AS conv
          FROM c
          UNION ALL
          SELECT 2, 'click', n2, round(n2 * 1.0 / n1, 6) FROM c
          UNION ALL
          SELECT 3, 'purchase', n3, round(n3 * 1.0 / n2, 6) FROM c)
        ORDER BY stage_ord"""),
      doc = "ordered event funnel (strictly-after stage gating): three " +
        "chained conditional-min windows over one user_id exchange; " +
        "per-user state is 3 timestamps regardless of event volume"),

    // First-order Markov transition matrix over each user's event
    // sequence: count consecutive (from, to) event-type pairs and the
    // per-from transition probability. One shuffle on user_id (the lag
    // window), then a 25-row aggregate; row-probability normalization
    // happens on the tiny aggregated frame, not the event stream.
    Q(
      "window_markov_transitions",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = ev
          .withColumn("from_type", lag(col("event_type"), 1).over(w))
          .filter(col("from_type").isNotNull)
        val counts = pairs.groupBy(col("from_type"),
            col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val wf = Window.partitionBy("from_type")
        counts
          .withColumn("p",
            round(col("n").cast("double") / sum(col("n")).over(wf), 6))
          .orderBy("from_type", "to_type")
      },
      Some("""
        SELECT from_type, to_type, n,
               round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
        FROM (
          SELECT from_type, event_type AS to_type, count(*) AS n
          FROM (
            SELECT user_id, event_type,
                   lag(event_type, 1) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS from_type
            FROM events)
          WHERE from_type IS NOT NULL
          GROUP BY 1, 2)
        ORDER BY from_type, to_type"""),
      doc = "first-order Markov transition counts + row-normalized " +
        "probabilities over per-user event sequences; one user_id " +
        "shuffle, normalization on the O(types^2) aggregate"),

    // RFM customer segmentation: recency / frequency / monetary
    // quintiles over the per-customer order rollup. Plan shape: the
    // corpus-sized work is ONE groupBy(custkey) with exact decimal
    // money sums; each quintile score is an exact ntile(5) computed
    // DISTRIBUTED via RangeWindow — a GK quantile sketch of the score
    // key yields range-group bounds broadcast back as literals, per-group
    // rank offsets are O(groups) driver work, and the only window is
    // PARTITIONED by range group. No unpartitioned WindowExec anywhere
    // (UnpartitionedWindowSpec pins it), so scoring holds at ANY customer
    // cardinality; the DuckDB oracle replays plain ntile(5) and
    // hash-matches because RangeWindow ranks are exact, not value-cut.
    Q(
      "window_rfm_scores",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val maxDay = o.agg(max(to_date(col("o_orderdate"))).as("max_d"))
        val cust = o.groupBy("o_custkey")
          .agg(max(to_date(col("o_orderdate"))).as("last_d"),
            count(lit(1)).as("f"),
            dsum(col("o_totalprice"), 10000L).as("m"))
          .crossJoin(broadcast(maxDay))
          .withColumn("r_days", datediff(col("max_d"), col("last_d")))
        // Each dimension: exact global rank over (key asc, custkey asc)
        // (recency negated: ntile order was r_days DESC), then the
        // literal ntile formula — map-side once ranks exist. ONE
        // withRanks call on a persisted base: chaining three single-spec
        // calls re-executes every earlier level's window inside each
        // later level's sketch/count actions (measured 0.44 → 1.57 s at
        // sf0.1, caught by Bench --gate in r10); the multi-spec form
        // runs 3 sketches + 3 tiny counts against the cached
        // customer-cardinality frame and chains the 3 windows in one
        // plan. Tracked in CacheLedger (the lazy result references the
        // persisted frame; drivers release after materializing).
        val c = graft.core.CacheLedger.track(cust.persist())
        val (r3, n) = graft.plans.RangeWindow.withRanks(c, Seq(
          graft.plans.RangeWindow.Spec(
            -col("r_days"), Seq(col("o_custkey")), "__rrk"),
          graft.plans.RangeWindow.Spec(
            col("f"), Seq(col("o_custkey")), "__frk"),
          graft.plans.RangeWindow.Spec(
            col("m"), Seq(col("o_custkey")), "__mrk")), 32)
        def tile(c: String) =
          graft.plans.RangeWindow.ntileFromRank(col(c), n, 5)
        r3.withColumn("r_score", tile("__rrk"))
          .withColumn("f_score", tile("__frk"))
          .withColumn("m_score", tile("__mrk"))
          .select(col("o_custkey"), col("r_days"), col("f"), col("m"),
            col("r_score"), col("f_score"), col("m_score"),
            concat(col("r_score"), col("f_score"), col("m_score"))
              .as("segment"))
          .orderBy("o_custkey")
      },
      Some("""
        WITH cust AS (
          SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d,
                 count(*) AS f,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS m
          FROM orders GROUP BY 1),
        mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
        base AS (
          SELECT o_custkey, date_diff('day', last_d, max_d) AS r_days, f, m
          FROM cust CROSS JOIN mx),
        scored AS (
          SELECT o_custkey, r_days, f, m,
                 ntile(5) OVER (ORDER BY r_days DESC, o_custkey ASC) AS r_score,
                 ntile(5) OVER (ORDER BY f ASC, o_custkey ASC) AS f_score,
                 ntile(5) OVER (ORDER BY m ASC, o_custkey ASC) AS m_score
          FROM base)
        SELECT o_custkey, r_days, f, m, r_score, f_score, m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
                 CAST(m_score AS VARCHAR) AS segment
        FROM scored ORDER BY o_custkey"""),
      doc = "RFM quintile segmentation over the per-customer order " +
        "rollup: one custkey aggregate with exact decimal sums, then " +
        "exact distributed ntile(5) per dimension via RangeWindow " +
        "(sketch-bounded range groups, no unpartitioned window)"),

    // EWMA smoothing of per-user daily value series (time-series
    // denoising / trend features). alpha is fixed at 0.5 so every
    // recurrence step is `0.5*acc + 0.5*x` — multiplication by a power
    // of two, EXACT in IEEE binary FP, and applied in the same order by
    // both engines, so the result is bit-identical with no pow/ulp
    // hazard — emitted UNROUNDED (a decimal round would reintroduce the
    // tie-break divergence the power-of-two alpha avoids: EWMA values
    // are binary fractions that can land exactly on .xxxxxx5).
    // Determinism contract: s_1 = x_1 (first observation seeds the
    // filter), fold order is day-ascending.
    //
    // Scale posture: ONE user_id shuffle builds per-user day-sorted
    // arrays (per-key state = series length, calendar-bounded — a year
    // of daily points is 365 entries regardless of event volume); the
    // running EWMA at every position is then computed map-side by
    // prefix folds (O(series²) per key with series ≤ calendar days — a
    // constant, not a data-scale term). Daily totals use the exact
    // scaled-long sum so the fold inputs are already bit-stable.
    Q(
      "window_ewma_smooth",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(dsum(col("value")).as("x"))
        daily.groupBy("user_id")
          .agg(array_sort(collect_list(struct(col("day"), col("x"))))
            .as("xs"))
          .select(col("user_id"), explode(expr(
            "transform(xs, (e, j) -> struct(e.day AS day, e.x AS x, " +
              "aggregate(slice(xs, 2, j), xs[0].x, " +
              "(acc, e2) -> 0.5D * acc + 0.5D * e2.x) AS ewma))"))
            .as("r"))
          .select(col("user_id"), col("r.day").as("day"),
            col("r.x").as("x"), col("r.ewma").as("ewma"))
          .orderBy("user_id", "day")
      },
      Some("""
        WITH daily AS (
          SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                 CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS x
          FROM events GROUP BY user_id, day),
        series AS (
          SELECT user_id,
                 list(struct_pack(day := day, x := x) ORDER BY day) AS xs
          FROM daily GROUP BY user_id)
        SELECT user_id, xs[j].day AS day, xs[j].x AS x,
               list_reduce(list_transform(xs[1:j], e -> e.x),
                     (a, b) -> 0.5 * a + 0.5 * b) AS ewma
        FROM (SELECT user_id, xs, unnest(range(1, len(xs) + 1)) AS j
              FROM series)
        ORDER BY user_id, day"""),
      doc = "EWMA (alpha=0.5) smoothing of per-user daily series: one " +
        "keyed shuffle + calendar-bounded per-key arrays; power-of-two " +
        "alpha makes the recurrence bit-exact in both engines"),

    // Holt double-exponential smoothing (level + trend, alpha=beta=0.5)
    // with a 1-step forecast — the trend-aware sibling of
    // window_ewma_smooth, same bit-exactness contract: both smoothing
    // constants are powers of two and the (level, trend) recurrence is
    // folded over structs in the SAME order by Spark's aggregate() and
    // DuckDB's list_reduce (whose accumulator must share the element
    // type — hence the series is lifted to {l, b} structs with b=0, and
    // the first element seeds the fold: l_1 = x_1, b_1 = 0).
    // l_t = 0.5·x_t + 0.5·(l+b);  b_t = 0.5·(l_t − l) + 0.5·b;
    // forecast = l_t + b_t. Emitted unrounded.
    Q(
      "window_holt_trend",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(dsum(col("value")).as("x"))
        val lt = "0.5D * e.l + 0.5D * (acc.l + acc.b)"
        daily.groupBy("user_id")
          .agg(array_sort(collect_list(struct(col("day"), col("x"))))
            .as("ds"))
          .withColumn("xs", expr(
            "transform(ds, d -> named_struct('l', d.x, 'b', 0.0D))"))
          .select(col("user_id"), explode(expr(
            s"""transform(ds, (d, j) -> named_struct(
                'day', d.day, 'x', d.x,
                'st', aggregate(slice(xs, 2, j), xs[0],
                  (acc, e) -> named_struct(
                    'l', $lt,
                    'b', 0.5D * (($lt) - acc.l) + 0.5D * acc.b))))"""))
            .as("r"))
          .select(col("user_id"), col("r.day").as("day"),
            col("r.x").as("x"), col("r.st.l").as("level"),
            col("r.st.b").as("trend"),
            (col("r.st.l") + col("r.st.b")).as("forecast1"))
          .orderBy("user_id", "day")
      },
      // NOTE the oracle recursion is a WITH RECURSIVE scalar walk, not a
      // list_reduce: DuckDB 1.0's list_reduce mis-evaluates STRUCT-typed
      // accumulators when vectorized over multiple rows (minimal repro:
      // folding [{1,0},{3,0},{5,0}] with the Holt lambda returns
      // b=0.6875 across 8 rows where the true fold gives 1.125; the same
      // call over one row is correct). Scalar-typed accumulators (the
      // EWMA oracle) are unaffected.
      Some("""
        WITH RECURSIVE daily AS (
          SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                 CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS x
          FROM events GROUP BY user_id, day),
        series AS (
          SELECT user_id,
                 list(struct_pack(day := day, x := x) ORDER BY day) AS ds
          FROM daily GROUP BY user_id),
        f AS (
          SELECT user_id, 1 AS j, ds,
                 ds[1].x AS l, CAST(0.0 AS DOUBLE) AS b
          FROM series
          UNION ALL
          SELECT user_id, j + 1, ds,
                 0.5 * ds[j + 1].x + 0.5 * (l + b),
                 0.5 * ((0.5 * ds[j + 1].x + 0.5 * (l + b)) - l) + 0.5 * b
          FROM f WHERE j < len(ds))
        SELECT user_id, ds[j].day AS day, ds[j].x AS x, l AS level,
               b AS trend, l + b AS forecast1
        FROM f ORDER BY user_id, day"""),
      doc = "Holt level+trend smoothing (alpha=beta=0.5) with 1-step " +
        "forecast: struct-typed fold, power-of-two constants, " +
        "bit-identical in both engines; calendar-bounded per-key state"),

    // Longest consecutive-day activity streak per user — the classic
    // gaps-and-islands shape (engagement metric; also the pattern behind
    // retention-window features). Island id = day − row_number (constant
    // within a run of consecutive days), entirely windowed: one user_id
    // shuffle, O(1) running state, no self-join against shifted copies.
    Q(
      "window_streak_days",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val days = ev.select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        days.withColumn("grp",
            datediff(col("day"), lit("2024-01-01").cast("date")) -
              row_number().over(w))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"),
            date_format(min(col("day")), "yyyy-MM-dd").as("streak_start"))
          .groupBy("user_id")
          .agg(max(struct(col("len"), col("streak_start"))).as("best"),
            count(lit(1)).as("n_streaks"))
          .select(col("user_id"), col("best.len").as("longest_streak"),
            col("best.streak_start"), col("n_streaks"))
          .orderBy("user_id")
      },
      Some("""
        WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        grps AS (
          SELECT user_id, day,
                 datediff('day', DATE '2024-01-01', day) -
                   row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS grp
          FROM days),
        streaks AS (
          SELECT user_id, grp, count(*) AS len,
                 strftime(min(day), '%Y-%m-%d') AS streak_start
          FROM grps GROUP BY user_id, grp)
        SELECT user_id,
               (max(struct_pack(len := len, s := streak_start))).len
                 AS longest_streak,
               (max(struct_pack(len := len, s := streak_start))).s
                 AS streak_start,
               count(*) AS n_streaks
        FROM streaks GROUP BY user_id ORDER BY user_id"""),
      doc = "gaps-and-islands longest-streak per user (day - row_number " +
        "island id): one keyed shuffle, O(1) window state, no shifted " +
        "self-join"),

    // W3 again, through the engine's own physical operator: the custom
    // TopKPerKey LogicalPlan + Strategy + SparkPlan (graft.plans.TopK)
    // replaces Window's full per-group sort with bounded per-key heaps
    // AND pre-reduces map-side, so the exchange moves at most
    // partitions × keys × k rows instead of the whole table. Same
    // result set as window_topk_per_group (minus the rank column);
    // TopKOperatorSpec asserts the plan shape (two TopKPerKeyExec
    // nodes around one exchange, no Window) and result parity.
    Q(
      "pipe_topk_operator",
      (s, dir) => {
        val o = t(s, dir, "orders")
        graft.plans.TopK.perKey(o, Seq("o_custkey"),
            Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("o_totalprice").desc,
            col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          FROM orders)
        WHERE rk <= 2
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey"""),
      doc = "top-k per key via the custom TopKPerKey physical operator " +
        "(bounded heaps + map-side partial reduction instead of a " +
        "windowed full sort); row_number oracle"),

    // Pareto / ABC classification of customers by revenue contribution:
    // cumulative share over the revenue-ranked customer frame, classes
    // cut at 80% / 95%. The class decision is INTEGER-EXACT — instead of
    // comparing a floating cumulative ratio against 0.8 (where an ulp
    // decides the class), the comparison cross-multiplies exact cents:
    // cum·100 ≤ total·80. The corpus-sized work is one custkey
    // aggregate; the running revenue sum is computed DISTRIBUTED via
    // RangeWindow.withRunningSum — range groups from a GK sketch of
    // (-cents), per-group long-sum prefix offsets (O(groups) driver
    // work), local running sum under a window PARTITIONED by range group
    // — so there is no SinglePartition WindowExec at any customer
    // cardinality (UnpartitionedWindowSpec pins it) and the result is
    // still the exact ROWS-frame cumulative the oracle replays.
    Q(
      "window_pareto_abc",
      (s, dir) => {
        val o = t(s, dir, "orders")
        // Persisted: withRunningSum's sketch + group-sum actions plus the
        // main pass each execute this aggregate otherwise (3×); tracked
        // in CacheLedger, released by drivers after materialization.
        val cust = graft.core.CacheLedger.track(
          o.groupBy("o_custkey")
            .agg(wsum(round(col("o_totalprice") * 100).cast("long"))
              .cast("long").as("cents"))
            .persist())
        // Grand total comes back from withRunningSum for free (last
        // prefix offset) — a separate aggregate + crossJoin(broadcast)
        // recomputed it with an extra job per execution (review r10).
        val (withCum, _, total) = graft.plans.RangeWindow.withRunningSum(
          cust, -col("cents"), Seq(col("o_custkey")), 32,
          col("cents"), "cum")
        withCum
          .withColumn("cls",
            when(col("cum") * 100 <= lit(total) * 80, "A")
              .when(col("cum") * 100 <= lit(total) * 95, "B")
              .otherwise(lit("C")))
          .groupBy("cls")
          .agg(count(lit(1)).as("n_customers"),
            (sum(col("cents")).cast("double") / 100.0).as("revenue"),
            min(col("o_custkey")).as("first_key"))
          .orderBy("cls")
      },
      Some("""
        WITH cust AS (
          SELECT o_custkey,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS cents
          FROM orders GROUP BY o_custkey),
        tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM cust),
        ranked AS (
          SELECT o_custkey, cents,
                 CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
          FROM cust)
        SELECT cls, count(*) AS n_customers,
               CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0
                 AS revenue,
               min(o_custkey) AS first_key
        FROM (SELECT o_custkey, cents,
                     CASE WHEN cum * 100 <= total * 80 THEN 'A'
                          WHEN cum * 100 <= total * 95 THEN 'B'
                          ELSE 'C' END AS cls
              FROM ranked CROSS JOIN tot)
        GROUP BY cls ORDER BY cls"""),
      doc = "Pareto/ABC revenue classification with integer-exact class " +
        "cuts (cross-multiplied cents, no FP threshold hazard); running " +
        "revenue via RangeWindow's distributed exact cumulative sum " +
        "(no unpartitioned window at any customer cardinality)"),

    // Gini coefficient of revenue concentration per market segment (the
    // inequality readout behind the ABC cut): sorted-formula Gini
    // G = (2·Σ i·x_i) / (n·Σx) − (n+1)/n over the revenue-ranked
    // customers of each segment. Σ i·x_i and Σx are exact integers
    // (rank from a unique-tiebreak window, cents through the long-sum
    // path); the final G is a fixed-order double chain. Work: one
    // custkey aggregate + one per-segment window + an O(segments)
    // rollup.
    Q(
      "agg_gini_concentration",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
        val cust = o.groupBy("c_mktsegment", "o_custkey")
          .agg(wsum(round(col("o_totalprice") * 100).cast("long"))
            .cast("long").as("cents"))
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("cents").asc, col("o_custkey").asc)
        cust.withColumn("i", row_number().over(w).cast("long"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            wsum(col("cents")).cast("double").as("sx"),
            wsum(col("i") * col("cents")).cast("double").as("six"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("gini",
            lit(2.0) * col("six") / (col("nd") * col("sx")) -
              (col("nd") + 1.0) / col("nd"))
          .select(col("c_mktsegment"), col("n"),
            (col("sx") / 100.0).as("revenue"), col("gini"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH cust AS (
          SELECT c_mktsegment, o_custkey,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        ranked AS (
          SELECT c_mktsegment, cents,
                 CAST(row_number() OVER (PARTITION BY c_mktsegment
                   ORDER BY cents ASC, o_custkey ASC) AS BIGINT) AS i
          FROM cust),
        g AS (
          SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS DOUBLE) AS sx,
                 CAST(sum(i * cents) AS DOUBLE) AS six
          FROM ranked GROUP BY c_mktsegment)
        SELECT c_mktsegment, n, sx / 100.0 AS revenue,
               2.0 * six / (CAST(n AS DOUBLE) * sx) -
                 (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
        FROM g ORDER BY c_mktsegment"""),
      doc = "sorted-formula Gini concentration per segment from exact " +
        "integer rank-weighted sums; one keyed window + O(segments) " +
        "rollup"),

    // CUSUM change-point detection on the daily total series (the
    // monitoring op behind "did the metric shift?"): one-sided upper
    // CUSUM S_t = max(0, S_{t-1} + (x_t − μ − slack)) with μ the exact
    // global daily mean and slack = μ/10; alarm when S_t > 5·μ. The
    // recursion is a scalar-accumulator fold over the day-sorted array
    // (the EWMA machinery — scalar list_reduce is safe in DuckDB; the
    // struct-accumulator bug does not apply) with every input an exact
    // cents double and both engines applying the identical op chain.
    // One global aggregate (1-row broadcast) + one calendar-bounded
    // fold; per-day outputs emitted unrounded.
    Q(
      "window_cusum_shift",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(wsum(round(col("value") * 100).cast("long"))
            .cast("double").as("x"))
        val mu = daily.agg(
          (sum(col("x")) / count(lit(1))).as("mu"))
        daily.crossJoin(broadcast(mu))
          .groupBy("mu")
          .agg(array_sort(collect_list(struct(col("day"), col("x"))))
            .as("xs"))
          .select(col("mu"), explode(expr(
            "transform(xs, (e, j) -> struct(e.day AS day, e.x AS x, " +
              "aggregate(slice(xs, 2, j), " +
              "greatest(0.0D, xs[0].x - (mu + mu / 10.0D)), " +
              "(acc, e2) -> greatest(0.0D, acc + (e2.x - (mu + mu / 10.0D))))" +
              " AS s))")).as("r"))
          .select(col("r.day").as("day"), (col("r.x") / 100.0).as("x"),
            (col("r.s") / 100.0).as("cusum"),
            (col("r.s") > lit(5.0) * col("mu")).as("alarm"))
          .orderBy("day")
      },
      Some("""
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 CAST(CAST(sum(CAST(round(value * 100) AS BIGINT))
                   AS BIGINT) AS DOUBLE) AS x
          FROM events GROUP BY 1),
        mu AS (SELECT CAST(sum(x) AS DOUBLE) / count(*) AS mu FROM daily),
        series AS (
          SELECT mu, list(struct_pack(day := day, x := x) ORDER BY day)
                   AS xs
          FROM daily CROSS JOIN mu GROUP BY mu)
        SELECT xs[j].day AS day, xs[j].x / 100.0 AS x,
               s / 100.0 AS cusum, s > 5.0 * mu AS alarm
        FROM (
          SELECT mu, xs, j,
                 list_reduce(
                   list_prepend(greatest(0.0, xs[1].x - (mu + mu / 10.0)),
                     list_transform(xs[2:j], e -> e.x)),
                   (a, b) -> greatest(0.0, a + (b - (mu + mu / 10.0)))) AS s
          FROM series, LATERAL (SELECT unnest(range(1, len(xs) + 1)) AS j))
        ORDER BY day"""),
      doc = "one-sided CUSUM change detection over the daily series: " +
        "exact-cents inputs, scalar-accumulator ordered fold, identical " +
        "op chain both engines; alarm at 5 sigma-ish threshold"),

    // Maximum drawdown of the cumulative revenue series per market
    // segment (the running-extremes pattern): cum_t (running exact
    // cents), peak_t = running max of cum, drawdown_t = peak − cum;
    // report each segment's max drawdown and when it bottomed. ENTIRELY
    // integer arithmetic — running sums, running maxes, differences and
    // the argmax tiebreak are all exact, no FP anywhere until the final
    // cents→currency display division. One segment-keyed window pass.
    Q(
      "window_max_drawdown",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
        // Signed daily "pnl": alternate sign by order parity so the
        // cumulative series actually draws down (raw revenue is
        // monotone — drawdown would be constant 0).
        val daily = o.groupBy(col("c_mktsegment"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
          .agg(wsum(when(col("o_orderkey") % 2 === 0,
              round(col("o_totalprice") * 100).cast("long"))
            .otherwise(-round(col("o_totalprice") * 100).cast("long")))
            .cast("long").as("pnl"))
        val w = Window.partitionBy("c_mktsegment").orderBy("day")
        val cum = daily
          .withColumn("cum", sum(col("pnl")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("peak", max(col("cum")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("dd", col("peak") - col("cum"))
        cum.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_days"),
            (max(col("dd")).cast("double") / 100.0).as("max_drawdown"),
            max(struct(col("dd"), col("day"))).getField("day")
              .as("trough_day"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH daily AS (
          SELECT c_mktsegment, strftime(o_orderdate, '%Y-%m-%d') AS day,
                 CAST(sum(CASE WHEN o_orderkey % 2 = 0
                     THEN CAST(round(o_totalprice * 100) AS BIGINT)
                     ELSE -CAST(round(o_totalprice * 100) AS BIGINT) END)
                   AS BIGINT) AS pnl
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        c AS (
          SELECT c_mktsegment, day,
                 CAST(sum(pnl) OVER (PARTITION BY c_mktsegment ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
          FROM daily),
        p AS (
          SELECT c_mktsegment, day, cum,
                 max(cum) OVER (PARTITION BY c_mktsegment ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
          FROM c)
        SELECT c_mktsegment, count(*) AS n_days,
               CAST(max(peak - cum) AS DOUBLE) / 100.0 AS max_drawdown,
               (max(struct_pack(dd := peak - cum, day := day))).day
                 AS trough_day
        FROM p GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      doc = "max drawdown per segment (running sum + running max + " +
        "argmax, all integer-exact); one keyed window pass"),

    // Additive seasonal decomposition of the daily series:
    // x = trend + seasonal + residual. Trend is a centered 7-day moving
    // average (explicit sum/count over the frame — both engines divide
    // the same exact integer frame-sum, so no avg()-implementation
    // ambiguity); the weekday seasonal index is derived from EXACT
    // integer sums only (mean of the weekday minus the global mean —
    // a sum of DETRENDED doubles would be shuffle-order-dependent, the
    // one FP hazard this formulation avoids); the residual is the
    // per-row fixed chain x − trend − seasonal. Output unrounded.
    Q(
      "window_seasonal_decompose",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(
            date_format(col("ts"), "yyyy-MM-dd").as("day"),
            ((dayofweek(to_date(col("ts"))) + lit(5)) % 7).as("dow"))
          .agg(wsum(round(col("value") * 100).cast("long"))
            .cast("long").as("cents"))
        val w = Window.orderBy("day").rowsBetween(-3, 3)
        val dowStats = daily.groupBy("dow")
          .agg(sum("cents").as("sc"), count(lit(1)).as("nc"))
        val tot = daily.agg(sum("cents").as("st"), count(lit(1)).as("nt"))
        val seasonal = dowStats.crossJoin(broadcast(tot))
          .withColumn("seasonal",
            col("sc").cast("double") / col("nc").cast("double") -
              col("st").cast("double") / col("nt").cast("double"))
          .select("dow", "seasonal")
        daily
          .withColumn("trend",
            sum(col("cents")).over(w).cast("double") /
              count(lit(1)).over(w).cast("double"))
          .join(broadcast(seasonal), "dow")
          .withColumn("x", col("cents").cast("double"))
          .withColumn("residual",
            col("x") - col("trend") - col("seasonal"))
          .select(col("day"), col("dow"), (col("x") / 100.0).as("x"),
            (col("trend") / 100.0).as("trend"),
            (col("seasonal") / 100.0).as("seasonal"),
            (col("residual") / 100.0).as("residual"))
          .orderBy("day")
      },
      Some("""
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 CAST(isodow(CAST(ts AS DATE)) - 1 AS BIGINT) AS dow,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events GROUP BY 1, 2),
        ds AS (SELECT dow, CAST(sum(cents) AS BIGINT) AS sc,
                      CAST(count(*) AS BIGINT) AS nc
               FROM daily GROUP BY dow),
        tot AS (SELECT CAST(sum(cents) AS BIGINT) AS st,
                       CAST(count(*) AS BIGINT) AS nt
                FROM daily),
        seasonal AS (
          SELECT dow, CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) -
                      CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS seasonal
          FROM ds CROSS JOIN tot),
        tr AS (
          SELECT day, dow, cents,
                 CAST(CAST(sum(cents) OVER fr AS BIGINT) AS DOUBLE) /
                   CAST(count(*) OVER fr AS DOUBLE) AS trend
          FROM daily
          WINDOW fr AS (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        SELECT day, dow, CAST(cents AS DOUBLE) / 100.0 AS x,
               trend / 100.0 AS trend, seasonal / 100.0 AS seasonal,
               (CAST(cents AS DOUBLE) - trend - seasonal) / 100.0
                 AS residual
        FROM tr JOIN seasonal USING (dow)
        ORDER BY day"""),
      doc = "additive seasonal decomposition (centered 7-day trend, " +
        "exact-integer weekday index, per-row residual chain) — no " +
        "shuffle-order-dependent float sums anywhere"),

    // Sweep-line concurrency: how many intervals are active at once
    // (peak-load / occupancy analysis — the reference's capacity-grid
    // family asks exactly this of museum slots). Each order becomes an
    // active interval [orderdate, orderdate + (key%5 + 1) days); the
    // sweep emits +1/−1 DELTA events, pre-aggregates them per day
    // (days-sized frame), and a running sum over the day order is the
    // concurrency — O(days) window state, never materializing
    // interval × day rows (the grid-join alternative explodes exactly
    // that). Running max tracks the high-water mark. Integer-exact
    // end-to-end.
    Q(
      "window_concurrency_sweep",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(to_date(col("o_orderdate")).as("d0"),
            (col("o_orderkey") % 5 + 1).cast("int").as("len"))
        val deltas = o.select(col("d0").as("day"), lit(1L).as("delta"))
          .unionByName(o.select(expr("date_add(d0, len)").as("day"),
            lit(-1L).as("delta")))
        val perDay = deltas
          .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
          .agg(sum("delta").cast("long").as("net"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        perDay.withColumn("active", sum(col("net")).over(w))
          .withColumn("peak", max(col("active")).over(w))
          .select(col("day"), col("net"), col("active"), col("peak"))
          .orderBy("day")
      },
      Some("""
        WITH o AS (
          SELECT CAST(o_orderdate AS DATE) AS d0,
                 CAST(o_orderkey % 5 + 1 AS INT) AS len
          FROM orders),
        deltas AS (
          SELECT d0 AS day, CAST(1 AS BIGINT) AS delta FROM o
          UNION ALL
          SELECT d0 + to_days(len), -1 FROM o),
        per_day AS (
          SELECT strftime(day, '%Y-%m-%d') AS day,
                 CAST(sum(delta) AS BIGINT) AS net
          FROM deltas GROUP BY 1)
        SELECT day, net, active,
               CAST(max(active) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS peak
        FROM (SELECT day, net,
                     CAST(sum(net) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS active
              FROM per_day)
        ORDER BY day"""),
      doc = "sweep-line interval concurrency (+1/-1 deltas, day " +
        "pre-aggregation, running sum + running peak): O(days) state, " +
        "no interval x day explosion"),

    // Theil–Sen robust trend (Theil 1950 / Sen 1968): per event_type,
    // the median of all pairwise slopes of the daily series — the
    // outlier-robust complement of ml_ols_trend's least-squares slope
    // (breakdown point 29% vs 0%). Pair generation is per-series
    // O(days²) — bounded by the time horizon, NOT the corpus (the daily
    // pre-aggregation is the only corpus-sized pass; a 100 TB events
    // table still yields ~days² ≈ thousands of pairs per series; for
    // multi-year horizons the documented fallback is ml_ols_trend).
    // Determinism: y is an exact centi-unit long, slopes are one IEEE
    // division of exact ints (bit-identical cross-engine), the median
    // is the LOWER median — a selected element, never an average of
    // two — so ties and float averaging cannot diverge.
    Q(
      "window_theil_sen",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
              .cast("long").as("x"))
          .agg(wsum(round(col("value") * 100).cast("long"))
            .cast("long").as("yc"))
        val slopes = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.x") < col("b.x"))
          .select(col("a.event_type").as("event_type"),
            ((col("b.yc") - col("a.yc")).cast("double") /
              (col("b.x") - col("a.x")).cast("double")).as("slope"))
        val w = Window.partitionBy("event_type").orderBy("slope")
        val ranked = slopes
          .withColumn("rk", row_number().over(w))
          .withColumn("np", count(lit(1)).over(
            Window.partitionBy("event_type")))
        ranked.filter(col("rk") === expr("(np + 1) div 2"))
          .select(col("event_type"), col("np").as("n_pairs"),
            round(col("slope") / 100.0, 6).as("slope_per_day"))
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type,
                 datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
          FROM events GROUP BY 1, 2),
        slopes AS (
          SELECT a.event_type,
                 CAST(b.yc - a.yc AS DOUBLE) / (b.x - a.x) AS slope
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.x < b.x),
        ranked AS (
          SELECT event_type, slope,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY slope) AS rk,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
          FROM slopes)
        SELECT event_type, np AS n_pairs,
               round(slope / 100.0, 6) AS slope_per_day
        FROM ranked WHERE rk = (np + 1) // 2
        ORDER BY event_type"""),
      doc = "Theil-Sen robust trend: median-of-pairwise-slopes per " +
        "series, lower-median selection (no averaging), exact centi " +
        "daily sums; pair fan-out bounded by the time horizon"),

    // Lag-1 autocorrelation per daily series — the seasonality/
    // persistence diagnostic next to window_ewma_smooth and
    // window_seasonal_decompose. Pearson r over (yₜ, yₜ₊₁) computed
    // from five EXACT integer moments (n, Σx, Σy, Σx², Σy², Σxy in
    // DECIMAL — centi² terms pass 2^53 at sf0.1, a double sum would go
    // order-dependent), widened to double once; sqrt/division are
    // single correctly-rounded IEEE ops, so both faces agree bitwise
    // before the final round(.,6).
    Q(
      "window_autocorr",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val daily = ev.groupBy(col("event_type"),
            to_date(col("ts")).as("day"))
          .agg(wsum(round(col("value") * 100).cast("long"))
            .cast("long").as("yc"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val pairs = daily
          .withColumn("ynext", lead(col("yc"), 1).over(w))
          .filter(col("ynext").isNotNull)
        val m = pairs.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(col("yc").cast(dec)).as("sx"),
          sum(col("ynext").cast(dec)).as("sy"),
          sum((col("yc").cast(dec) * col("yc").cast(dec))).as("sxx"),
          sum((col("ynext").cast(dec) * col("ynext").cast(dec))).as("syy"),
          sum((col("yc").cast(dec) * col("ynext").cast(dec))).as("sxy"))
        m.filter(col("n").cast(dec) * col("sxx") - col("sx") * col("sx") > 0 &&
            col("n").cast(dec) * col("syy") - col("sy") * col("sy") > 0)
          .select(col("event_type"), col("n"),
            round(
              ((col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
                .cast("double")) /
              sqrt(((col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
                ((col("n").cast(dec) * col("syy") - col("sy") * col("sy"))
                  .cast("double"))), 6).as("r_lag1"))
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS yc
          FROM events GROUP BY 1, 2),
        pairs AS (
          SELECT event_type, yc,
                 lead(yc) OVER (PARTITION BY event_type ORDER BY day) AS ynext
          FROM daily),
        m AS (
          SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(yc) AS HUGEINT) AS sx,
                 CAST(sum(ynext) AS HUGEINT) AS sy,
                 CAST(sum(yc * yc) AS HUGEINT) AS sxx,
                 CAST(sum(ynext * ynext) AS HUGEINT) AS syy,
                 CAST(sum(yc * ynext) AS HUGEINT) AS sxy
          FROM pairs WHERE ynext IS NOT NULL GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               round(CAST(n * sxy - sx * sy AS DOUBLE) /
                     sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                          CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r_lag1
        FROM m
        WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        ORDER BY event_type"""),
      doc = "lag-1 autocorrelation per daily series from five exact " +
        "DECIMAL moments widened to double once; single-pass lead " +
        "window + one tiny aggregate"),

    // Additive Holt–Winters (Winters 1960): level + trend + weekly
    // seasonality (m=7) — the seasonal extension of window_holt_trend.
    // α=1/2, β=γ=3/10 as EXACT rational updates on centi-unit longs
    // with truncating division, so the whole recursion is integer
    // arithmetic — bit-reproducible on any engine (the double-typed
    // Holt query relies on power-of-two constants; the integer form
    // frees the smoothing weights from that restriction). One fold per
    // series (O(n), state = level + trend + 7 seasonal slots + counter
    // — bounded), vs the oracle's recursive-CTE scalar walk with the
    // seasonal ring as 7 columns. First observation initializes the
    // level; observation t (0-based) reads/updates seasonal slot t%7.
    Q(
      "window_holt_winters",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(wsum(round(col("value") * 100).cast("long"))
            .cast("long").as("yc"))
        val lexpr = "((e.yc - element_at(acc.s, CAST(acc.i % 7 AS INT) + 1))" +
          " * 5 + (acc.l + acc.b) * 5) div 10"
        daily.groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("day"), col("yc"))))
            .as("ds"))
          .withColumn("st", expr(s"""
            aggregate(ds,
              named_struct('l', 0L, 'b', 0L,
                's', array(0L, 0L, 0L, 0L, 0L, 0L, 0L), 'i', 0L),
              (acc, e) -> CASE WHEN acc.i = 0L THEN
                named_struct('l', e.yc, 'b', 0L, 's', acc.s, 'i', 1L)
              ELSE named_struct(
                'l', $lexpr,
                'b', ((($lexpr) - acc.l) * 3 + acc.b * 7) div 10,
                's', transform(acc.s, (v, j) ->
                  CASE WHEN j = CAST(acc.i % 7 AS INT)
                    THEN ((e.yc - acc.l - acc.b) * 3 + v * 7) div 10
                    ELSE v END),
                'i', acc.i + 1L) END)"""))
          .select(col("event_type"), col("st.i").as("n"),
            col("st.l").as("level_c"), col("st.b").as("trend_c"),
            (col("st.l") + col("st.b") + expr(
              "element_at(st.s, CAST(st.i % 7 AS INT) + 1)"))
              .as("forecast_c"))
          .orderBy("event_type")
      },
      Some {
        val sm = "CASE j % 7 WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2" +
          " WHEN 3 THEN s3 WHEN 4 THEN s4 WHEN 5 THEN s5 ELSE s6 END"
        val lp = s"((ys[j + 1] - ($sm)) * 5 + (l + b) * 5) // 10"
        val sUpd = (0 to 6).map(k =>
          s"CASE WHEN j % 7 = $k THEN ((ys[j + 1] - l - b) * 3 + s$k * 7)" +
            s" // 10 ELSE s$k END").mkString(",\n                 ")
        s"""
        WITH RECURSIVE daily AS (
          SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
          FROM events GROUP BY 1, 2),
        series AS (
          SELECT event_type, list(yc ORDER BY day) AS ys,
                 CAST(count(*) AS BIGINT) AS n
          FROM daily GROUP BY 1),
        f AS (
          SELECT event_type, ys, n, CAST(1 AS BIGINT) AS j,
                 CAST(ys[1] AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
                 CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS s1,
                 CAST(0 AS BIGINT) AS s2, CAST(0 AS BIGINT) AS s3,
                 CAST(0 AS BIGINT) AS s4, CAST(0 AS BIGINT) AS s5,
                 CAST(0 AS BIGINT) AS s6
          FROM series
          UNION ALL
          SELECT event_type, ys, n, j + 1,
                 $lp,
                 ((($lp) - l) * 3 + b * 7) // 10,
                 $sUpd
          FROM f WHERE j < n)
        SELECT event_type, n, l AS level_c, b AS trend_c,
               l + b + ($sm) AS forecast_c
        FROM (SELECT *, j AS jj FROM f WHERE j = n)
        ORDER BY event_type"""
      },
      doc = "additive Holt-Winters with weekly seasonality: exact " +
        "rational smoothing (alpha=1/2, beta=gamma=3/10) on centi-unit " +
        "longs with truncating division — one O(n) fold per series, " +
        "bounded state (level+trend+7 slots); recursive-CTE oracle " +
        "walks the identical integer recursion"),

    // Rolling z-score anomaly detection: each day scored against the
    // TRAILING 7-day window (current day excluded — no self-masking),
    // flagged at |z| > 2 — the online complement of agg_outlier_mad's
    // global robust screen. Window sums of x and x² stay exact
    // integers (centi / centi² in DECIMAL); the z formula is one
    // shared double expression string evaluated by both engines, so
    // IEEE order is identical before round(.,6). Windows shorter than
    // 3 days or with zero variance are unscoreable and filtered on
    // both faces.
    Q(
      "window_zscore_anomaly",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val daily = ev.groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(wsum(round(col("value") * 100).cast("long"))
            .cast("long").as("yc"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-7, -1)
        val scored = daily
          .withColumn("n", count(col("yc")).over(w))
          .withColumn("sm", sum(col("yc").cast(dec)).over(w))
          .withColumn("qm",
            sum(col("yc").cast(dec) * col("yc").cast(dec)).over(w))
          .filter(col("n") >= 3)
          .selectExpr("event_type", "day", "yc", "n",
            "CAST(yc AS DOUBLE) AS xd", "CAST(n AS DOUBLE) AS nd",
            "CAST(sm AS DOUBLE) AS sd", "CAST(qm AS DOUBLE) AS qd")
          .selectExpr("event_type", "day", "yc", "n",
            zExpr + " AS z", varExpr + " AS vr")
        scored.filter(col("vr") > 0)
          .withColumn("z", round(col("z"), 6))
          .filter(abs(col("z")) > 2)
          .select(col("event_type"), col("day"), col("yc"), col("n"),
            col("z"))
          .orderBy("event_type", "day")
      },
      Some(s"""
        WITH daily AS (
          SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
          FROM events GROUP BY 1, 2),
        win AS (
          SELECT event_type, day, yc,
                 CAST(count(yc) OVER tw AS BIGINT) AS n,
                 CAST(sum(CAST(yc AS HUGEINT)) OVER tw AS HUGEINT) AS sm,
                 CAST(sum(CAST(yc AS HUGEINT) * yc) OVER tw AS HUGEINT) AS qm
          FROM daily
          WINDOW tw AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        scored AS (
          SELECT event_type, day, yc, n, $zExpr AS z, $varExpr AS vr
          FROM (SELECT event_type, day, yc, n,
                       CAST(yc AS DOUBLE) AS xd, CAST(n AS DOUBLE) AS nd,
                       CAST(sm AS DOUBLE) AS sd, CAST(qm AS DOUBLE) AS qd
                FROM win WHERE n >= 3))
        SELECT event_type, day, yc, n, round(z, 6) AS z
        FROM scored WHERE vr > 0 AND abs(round(z, 6)) > 2
        ORDER BY event_type, day"""),
      doc = "trailing-7-day rolling z-score anomaly flags (|z|>2, " +
        "current day excluded): exact integer window moments, shared " +
        "double z formula; the online complement of the global MAD " +
        "screen"))

  /** Shared z-score fragments over (xd, nd, sd, qd) double columns —
    * identical text on both faces keeps IEEE evaluation order equal. */
  private def varExpr: String = "(qd / nd - (sd / nd) * (sd / nd))"
  private def zExpr: String =
    s"(CASE WHEN $varExpr > 0 THEN (xd - sd / nd) / sqrt($varExpr) " +
      "ELSE 0.0 END)"
}
