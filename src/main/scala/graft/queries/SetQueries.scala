package graft.queries

import org.apache.spark.sql.functions._

/** Set operations & incremental predicates — SURVEY.md §2.8 (U1–U5).
  *
  * U1's deduplicating UNION with NULL-padded heterogeneous branches is the
  * reference's `post` view pattern (migration_015.sql:140-186); the 3VL
  * watermark (U5) is its incremental-batch driver. Anti/semi membership
  * run as {left_anti, left_semi} joins so they shuffle once on the probe
  * key and never materialize the NOT-IN list.
  */
object SetQueries extends QueryBase {

  val all: Seq[Q] = Seq(
    // U1: deduplicating UNION across heterogeneous branches with typed
    // NULL padding — PG UNION semantics (dedup across and within branches).
    Q(
      "set_union_dedup",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_nationkey").as("nationkey"), lit("customer").as("kind"),
            col("c_mktsegment").as("segment"))
        val sup = t(s, dir, "supplier")
          .select(col("s_nationkey").as("nationkey"), lit("supplier").as("kind"),
            lit(null).cast("string").as("segment"))
        c.unionByName(sup).distinct()
          .orderBy("nationkey", "kind", "segment")
      },
      Some("""
        SELECT DISTINCT * FROM (
          SELECT c_nationkey AS nationkey, 'customer' AS kind, c_mktsegment AS segment
          FROM customer
          UNION
          SELECT s_nationkey, 'supplier', NULL FROM supplier)
        ORDER BY nationkey, kind, segment"""),
      doc = "U1 dedup UNION with NULL padding; reference migration_015.sql:140-186"),

    // U2: UNION ALL (pd.concat equivalent) with per-branch constants.
    Q(
      "set_union_all",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_nationkey").as("nationkey"), lit("customer").as("kind"))
        val sup = t(s, dir, "supplier")
          .select(col("s_nationkey").as("nationkey"), lit("supplier").as("kind"))
        c.unionByName(sup)
          .groupBy("nationkey").agg(count(lit(1)).as("n_entities"))
          .orderBy("nationkey")
      },
      Some("""
        SELECT nationkey, count(*) AS n_entities FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL
          SELECT s_nationkey FROM supplier) t(nationkey)
        GROUP BY nationkey ORDER BY nationkey"""),
      doc = "U2 UNION ALL concat; reference data_preparation.py:221-239"),

    // U3: anti-membership — parts never shipped. Shuffles once on partkey;
    // no NOT IN materialization. reference post_ngrams.py:146-153.
    Q(
      "set_anti_membership",
      (s, dir) => {
        val p = t(s, dir, "part")
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
        p.join(li.select("l_partkey").distinct(),
            p("p_partkey") === col("l_partkey"), "left_anti")
          .groupBy("p_brand").agg(count(lit(1)).as("n_unsold"))
          .orderBy("p_brand")
      },
      Some("""
        SELECT p_brand, count(*) AS n_unsold
        FROM part WHERE p_partkey NOT IN
          (SELECT l_partkey FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '2001-01-01')
        GROUP BY p_brand ORDER BY p_brand"""),
      doc = "U3 anti-membership; reference post_ngrams.py:146-153"),

    // U4: semi-membership — customers having orders in a window.
    Q(
      "set_semi_membership",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        c.join(o.select("o_custkey"), c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_active"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_active
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '1997-01-01')
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      doc = "U4 semi-membership; reference phrase_matching.py:33-36"),

    // U5: 3VL high-watermark incremental — `ts > max(done) IS NOT FALSE`
    // must pass everything through when the watermark is NULL (empty
    // target). Spark form: explicit coalesce over the scalar watermark.
    // reference src/absa/post_words.py:106-115.
    Q(
      "set_watermark_3vl",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val wm = ev.filter(col("event_type") === "signup" && col("user_id") < 5)
          .agg(max(col("ts")).as("wm"))
        ev.crossJoin(broadcast(wm))
          .filter(coalesce(col("ts") > col("wm"), lit(true)))
          .groupBy("event_type").agg(count(lit(1)).as("n_new"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(*) AS n_new
        FROM events
        WHERE (ts > (SELECT max(ts) FROM events
                     WHERE event_type = 'signup' AND user_id < 5)) IS NOT FALSE
        GROUP BY event_type ORDER BY event_type"""),
      doc = "U5 3VL watermark; reference post_words.py:106-115"),

    // INTERSECT: users who both purchased and hit an error.
    Q(
      "set_intersect",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.filter(col("event_type") === "purchase").select("user_id")
          .intersect(ev.filter(col("event_type") === "error").select("user_id"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
        ORDER BY user_id"""),
      doc = "INTERSECT set op; §2.8"),

    // EXCEPT: purchasers who never hit an error.
    Q(
      "set_except",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.filter(col("event_type") === "purchase").select("user_id")
          .except(ev.filter(col("event_type") === "error" &&
            col("ts") < lit("2024-01-03").cast("timestamp")).select("user_id"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT user_id FROM events
        WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03'
        ORDER BY user_id"""),
      doc = "EXCEPT set op; §2.8"))
}
