package graft

import graft.queries.Catalog
import org.apache.spark.sql.functions._

/** Semantic property checks for the round-5 analytics operators — each
  * asserts an invariant the DuckDB oracle cannot (the oracle replays the
  * same formula; these recompute through an independent route or check a
  * mathematical property of the result).
  */
class AnalyticsOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def q(name: String) = Catalog.byName(name).spark(spark, dir)

  test("window_funnel stages are monotone non-increasing") {
    val rows = q("window_funnel").collect().sortBy(_.getInt(0))
    assert(rows.length == 3)
    val ns = rows.map(_.getLong(2))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2),
      s"funnel counts must shrink stage to stage: ${ns.mkString(",")}")
    assert(ns(0) > 0, "no user reached the first stage at sf0.01")
    rows.foreach { r =>
      val conv = r.getDouble(3)
      assert(conv >= 0.0 && conv <= 1.0, s"conversion out of [0,1]: $conv")
    }
  }

  test("window_funnel strictly-after gating: stage times advance per user") {
    // Independent recomputation for a sample of users via local replay.
    val ev = graft.core.Tables.events(spark, dir)
      .select("user_id", "event_type", "ts")
      .collect()
      .groupBy(_.getLong(0))
    val reached = ev.values.map { rows =>
      val byType = rows.groupBy(_.getString(1))
      def ts(t: String) = byType.getOrElse(t, Array.empty).map(_.getTimestamp(2).getTime)
      val t1 = ts("view").minOption
      val t2 = t1.flatMap(a => ts("click").filter(_ > a).minOption)
      val t3 = t2.flatMap(a => ts("purchase").filter(_ > a).minOption)
      (t1.isDefined, t2.isDefined, t3.isDefined)
    }
    val expected = Seq(
      reached.count(_._1).toLong, reached.count(_._2).toLong,
      reached.count(_._3).toLong)
    val got = q("window_funnel").collect().sortBy(_.getInt(0)).map(_.getLong(2)).toSeq
    assert(got == expected, s"funnel counts $got != locally replayed $expected")
  }

  test("window_markov_transitions rows are a proper distribution per from_type") {
    val rows = q("window_markov_transitions").collect()
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (from, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$from transition probs sum to $p")
    }
    // Total transition count = events - one per user (no lag for first).
    val ev = graft.core.Tables.events(spark, dir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("pipe_scd2_dimension ranges partition each customer's history") {
    val rows = q("pipe_scd2_dimension")
      .select("o_custkey", "status", "valid_from", "valid_to", "is_current")
      .collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (cust, rs) =>
      val sorted = rs.sortBy(_.getString(2))
      // Exactly one open range, and it is the last.
      assert(sorted.count(_.getBoolean(4)) == 1, s"cust $cust: != 1 current row")
      assert(sorted.last.getBoolean(4), s"cust $cust: current row not last")
      // Ranges are adjacent: valid_to = next valid_from - 1 day.
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val aTo = java.time.LocalDate.parse(a.getString(3))
          val bFrom = java.time.LocalDate.parse(b.getString(2))
          assert(aTo.plusDays(1) == bFrom,
            s"cust $cust: gap/overlap between ${a.getString(3)} and ${b.getString(2)}")
          // Consecutive versions must differ (that's what SCD2 stores).
          assert(a.getString(1) != b.getString(1),
            s"cust $cust: consecutive rows carry the same status")
        case _ => ()
      }
    }
  }

  test("ml_triangle_count matches a local brute-force recount") {
    // Rebuild the blocked co-interaction graph locally and enumerate
    // triangles by set intersection — an independent algorithm (adjacency
    // sets, not oriented joins).
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val topPerK = ev.groupBy(_._2).map { case (k, rows) =>
      val counts = rows.groupBy(_._1).view.mapValues(_.size).toSeq
      k -> counts.sortBy { case (u, n) => (-n, u) }.take(8).map(_._1)
    }
    val edges = topPerK.values.flatMap { us =>
      for (a <- us; b <- us if a < b) yield (a, b)
    }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
    for ((a, b) <- edges; c <- adj(a).intersect(adj(b)) if b < c) {
      triCount(a) = triCount.getOrElse(a, 0L) + 1
      triCount(b) = triCount.getOrElse(b, 0L) + 1
      triCount(c) = triCount.getOrElse(c, 0L) + 1
    }
    val expectedTop = triCount.toSeq.sortBy { case (n, t) => (-t, n) }.take(25)
    val got = q("ml_triangle_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expectedTop, s"triangle top-25 mismatch:\n$got\n$expectedTop")
  }

  test("ml_kmeans_lloyd objective is non-increasing over Lloyd iterations") {
    val v = graft.ml.KMeans.quantize(
      graft.core.Tables.load(spark, dir, "embeddings")).localCheckpoint()
    def inertia(iters: Int): BigDecimal = {
      val cent = graft.ml.KMeans.fit(v, 8, iters)
      BigDecimal(graft.ml.KMeans.assign(v, cent)
        .agg(sum(col("dist"))).first().getLong(0))
    }
    val seq = (0 to 3).map(inertia)
    info(s"inertia by iteration: ${seq.mkString(" -> ")}")
    seq.sliding(2).foreach { case Seq(a, b) =>
      // Truncating-division centroids can be off the true mean by <1
      // micro-unit per dim; allow that slack while still catching any
      // real divergence.
      assert(b <= a * BigDecimal("1.000001"), s"objective rose: $a -> $b")
    }
    // Cluster sizes must partition the corpus.
    val sizes = q("ml_kmeans_lloyd").collect().map(_.getLong(1))
    assert(sizes.sum == v.count())
  }

  test("agg_retention_cohorts: offset 0 is always 1.0 and activity never exceeds cohort") {
    val rows = q("agg_retention_cohorts").collect()
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (cw, rs) =>
      val zero = rs.find(_.getInt(1) == 0)
        .getOrElse(fail(s"cohort $cw missing offset 0"))
      assert(zero.getDouble(3) == 1.0, s"cohort $cw offset-0 retention != 1")
      val size = zero.getLong(2)
      rs.foreach(r => assert(r.getLong(2) <= size,
        s"cohort $cw offset ${r.getInt(1)} active > cohort size"))
    }
  }

  test("window_rfm_scores: quintiles are balanced and every customer is scored") {
    val rows = q("window_rfm_scores").collect()
    val n = rows.length
    Seq(4, 5, 6).foreach { ci =>
      val sizes = rows.groupBy(_.getInt(ci)).view.mapValues(_.size)
      assert(sizes.keySet == Set(1, 2, 3, 4, 5), s"col $ci missing a quintile")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"col $ci ntile buckets unbalanced: $sizes")
    }
    assert(rows.map(_.getLong(0)).distinct.length == n, "duplicate customers")
  }

  test("dedup_incremental_bloom equals the exact anti-join (bloom repairs FPs)") {
    // Independent recomputation WITHOUT the bloom fast-path: plain
    // fingerprint anti-join of batch vs history.
    val d = graft.core.Tables.load(spark, dir, "documents")
    val fp = expr("CAST(conv(substring(md5(trim(regexp_replace(" +
      "regexp_replace(lower(text), '[^a-z0-9\\\\s]', ''), " +
      "'\\\\s+', ' '))), 1, 15), 16, 10) AS BIGINT)")
    val hist = d.filter(col("doc_id") % 5 =!= 0).withColumn("fp", fp)
    val batch = d.filter(col("doc_id") % 5 === 0).withColumn("fp", fp)
      .unionByName(d.filter(col("doc_id") % 10 === 3)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("fp", fp))
    val expected = batch.join(hist.select("fp").distinct(), Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val got = q("dedup_incremental_bloom")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expected))
    // Every planted re-send (id >= 100000) must be dropped.
    assert(!got.exists(_ >= 100000), "a cross-batch duplicate survived")
  }

  test("text_bpe_train matches a plain-Scala BPE trainer") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val words = docs.flatMap(t => "[a-z]+".r.findAllIn(t.toLowerCase))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var syms: Map[String, (Long, String)] = words.map { case (w, f) =>
      (w, (f, "·" + w.map(c => s"${c}·").mkString))
    }
    def pairCounts: Map[(String, String), Long] = {
      val m = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.values.foreach { case (f, sym) =>
        val toks = sym.split("·").filter(_.nonEmpty)
        toks.sliding(2).foreach {
          case Array(a, b) => m((a, b)) = m.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      m.toMap
    }
    val merges = scala.collection.mutable.Buffer.empty[(String, Long)]
    for (_ <- 1 to 6) {
      val ((a, b), n) = pairCounts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head
      merges += (s"$a+$b" -> n)
      // Same literal-replace primitive as both engines (left-to-right,
      // non-overlapping, shared delimiter consumed).
      syms = syms.map { case (w, (f, sym)) =>
        (w, (f, sym.replace(s"·${a}·${b}·", s"·${a}${b}·")))
      }
    }
    val tokCounts = scala.collection.mutable.Map.empty[String, Long]
    syms.values.foreach { case (f, sym) =>
      sym.split("·").filter(_.nonEmpty).foreach(t =>
        tokCounts(t) = tokCounts.getOrElse(t, 0L) + f)
    }
    val topTokens = tokCounts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    val got = q("text_bpe_train").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val gotMerges = got.filter(_._1 == "merge").sortBy(_._2).map(r => (r._3, r._4))
    val gotTokens = got.filter(_._1 == "token").sortBy(_._2).map(r => (r._3, r._4))
    assert(gotMerges.toSeq == merges.toSeq,
      s"merge table mismatch:\n${gotMerges.toSeq}\n${merges.toSeq}")
    assert(gotTokens.toSeq == topTokens,
      s"vocab mismatch:\n${gotTokens.toSeq}\n$topTokens")
  }

  test("sim_ann_ivf_sq8 agrees with uncompressed IVF (quantization noise only)") {
    def topk(name: String): Map[Long, Set[Long]] =
      Catalog.byName(name).spark(spark, dir)
        .select("qid", "vec_id").collect()
        .groupBy(_.getLong(0))
        .map { case (qk, rows) => qk -> rows.map(_.getLong(1)).toSet }
    val ivf = topk("sim_ann_ivf")
    val sq = topk("sim_ann_ivf_sq8")
    val per = ivf.map { case (qk, ids) =>
      sq.getOrElse(qk, Set.empty).intersect(ids).size.toDouble / ids.size
    }
    val agree = per.sum / per.size
    info(f"IVF+SQ8 vs IVF agreement@5: $agree%.2f")
    // Same cells are probed; the only divergence is int8 rounding.
    assert(agree >= 0.8, f"IVF+SQ8 diverged from IVF beyond quantization noise: $agree%.2f")
    assert(sq.values.forall(_.size == 5))
  }
}
