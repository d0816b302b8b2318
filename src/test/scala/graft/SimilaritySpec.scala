package graft

import graft.queries.Catalog

/** ANN quality gate: the approximate variants must actually FIND the
  * neighbors the exact baseline finds — a bucketing/probing bug that
  * still returns k plausible rows would pass every row-count and
  * hash-vs-own-oracle check, but not this.
  */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def topk(name: String): Map[Long, Set[Long]] =
    Catalog.byName(name).spark(spark, dir)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  test("IVF and LSH recall@5 against the exact baseline") {
    val exact = topk("sim_ann_bruteforce")
    def recall(name: String): Double = {
      val approx = topk(name)
      val per = exact.map { case (q, ids) =>
        approx.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
      }
      per.sum / per.size
    }
    val ivf = recall("sim_ann_ivf")
    val lsh = recall("sim_ann_lsh")
    info(f"recall@5: ivf=$ivf%.2f lsh=$lsh%.2f")
    // Measured on this corpus: ivf=0.32, lsh=0.80. The fixture embeddings
    // are STRUCTURELESS (same-label avg cosine ≈ 0.0007 vs −0.0008
    // across labels — pure noise), so cell-probing IVF is fundamentally
    // bounded near nprobe/ncells = 0.2 here, while hyperplane LSH keys on
    // actual angular proximity and stays high. The thresholds guard the
    // failure modes (dead buckets, wrong-cell probing → recall ≈ 0), not
    // a quality bar the data cannot support; on clustered corpora IVF
    // recall tracks the cluster structure instead.
    assert(ivf >= 0.2, f"IVF recall collapsed below the probe floor: $ivf%.2f")
    assert(lsh >= 0.5, f"LSH recall collapsed: $lsh%.2f")
    // Both must return exactly 5 ranked rows for every query.
    assert(topk("sim_ann_ivf").values.forall(_.size == 5))
    assert(topk("sim_ann_lsh").values.forall(_.size == 5))
  }

  test("PQ codes are 2-bit per subspace and ADC ranks are well-formed") {
    val df = graft.SparkEntry.queries("sim_ann_pq")(spark, dir)
    val rows = df.collect()
    assert(rows.length === 25, "5 ranked rows per query vector")
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 5)
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to 5))
      val adcs = sorted.map(_.getAs[Double]("adc"))
      assert(adcs.forall(_ >= 0d), "squared ADC distances are non-negative")
      assert(adcs.sameElements(adcs.sorted),
        "ADC must be non-decreasing down the ranking")
    }
    // the two argmin stages (Lloyd assign + encode) run through the
    // custom operator; AQE hides children from collect(), assert on the
    // rendered plan
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "PQ assignment/encode must use TopKPerKeyExec")
    // deterministic: identical plan re-run yields identical rows
    val again = graft.SparkEntry.queries("sim_ann_pq")(spark, dir).collect()
    assert(again.map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
  }

  test("SQ8 scalar-quantized search recall@5 against the exact baseline") {
    // SQ8 scans the whole corpus (it compresses memory, not candidates),
    // so unlike IVF/LSH its only error source is quantization noise —
    // recall must be near-perfect, not merely above a probe floor.
    val exact = topk("sim_ann_bruteforce")
    val sq = topk("sim_ann_sq8")
    val per = exact.map { case (q, ids) =>
      sq.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
    }
    val recall = per.sum / per.size
    info(f"recall@5: sq8=$recall%.2f")
    assert(recall >= 0.8, f"SQ8 recall below quantization-noise bound: $recall%.2f")
    assert(sq.values.forall(_.size == 5))
  }
}
