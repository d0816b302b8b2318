package graft

import graft.ml.{Dbscan, Gsdmm}

class MlSpec extends SparkSpec {

  test("DBSCAN separates tight clusters and marks noise") {
    def v(a: Double, b: Double) = Array(a, b)
    val pts = Array(
      v(1, 0), v(0.99, 0.01), v(0.98, 0.02), // cluster 0 (near 0°)
      v(0, 1), v(0.01, 0.99), v(0.02, 0.98), // cluster 1 (near 90°)
      v(-1, -1))                             // noise
    val labels = Dbscan.fit(pts, eps = 0.01, minPts = 2)
    assert(labels.take(3).distinct === Array(0))
    assert(labels.slice(3, 6).distinct === Array(1))
    assert(labels(6) === -1)
  }

  test("weighted DBSCAN: a multiplicity-2 singleton vertex is a cluster") {
    // Two far-apart distinct vectors; the first stands for 2 identical
    // points (weight 2), the second is a true singleton. minPts=2:
    // the weighted vertex must form a cluster, the singleton is noise.
    def far(i: Int, j: Int) = false
    val labels = Dbscan.fitGraph(2, far, minPts = 2,
      weight = i => if (i == 0) 2 else 1)
    assert(labels(0) === 0)
    assert(labels(1) === -1)
  }

  test("GSDMM assign routes unseen docs to the matching fitted topic") {
    val docsA = Array.fill(20)(Array("apple", "banana", "cherry"))
    val docsB = Array.fill(20)(Array("xray", "yankee", "zulu"))
    val model = Gsdmm.fit(docsA ++ docsB, k = 8, alpha = 0.1, beta = 0.1,
      iters = 15, seed = 7)
    val zA = Gsdmm.assign(model, Array("apple", "cherry"))
    val zB = Gsdmm.assign(model, Array("zulu", "zulu", "xray"))
    // each unseen doc lands in a cluster its vocabulary dominates
    assert(model.wordCounts(zA).getOrElse("apple", 0) > 0)
    assert(model.wordCounts(zB).getOrElse("zulu", 0) > 0)
    assert(zA !== zB)
    // deterministic
    assert(Gsdmm.assign(model, Array("apple", "cherry")) === zA)
  }

  test("decision stump: histogram split beats the root and uses TopKPerKey") {
    val sfDir = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("ml_decision_stump")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length === 3, "one best split per feature")
    rows.foreach { r =>
      val nl = r.getAs[Long]("nl"); val pl = r.getAs[Long]("pl")
      val nr = r.getAs[Long]("nr"); val pr = r.getAs[Long]("pr")
      val n = nl + nr; val p = pl + pr
      val rootGini = 1d - math.pow(p.toDouble / n, 2) -
        math.pow((n - p).toDouble / n, 2)
      assert(r.getAs[Double]("gini") <= rootGini + 1e-9,
        s"split must not be worse than the root for ${r.getAs[String]("feature")}")
      assert(nl > 0 || nr > 0)
    }
    // the argmin runs through the custom operator (AdaptiveSparkPlanExec
    // hides children from collect(), so assert on the rendered plan)
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "best-split selection must use TopKPerKeyExec")
  }

  test("svd power iteration: unit direction, positive sigma, deterministic") {
    val sfDir = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("ml_svd_power")
    val rows = q(spark, sfDir).collect()
    assert(rows.length === 64)
    val v = rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Long]("v_micro"))
    val norm2 = v.map(x => (x / 1e6) * (x / 1e6)).sum
    assert(math.abs(norm2 - 1d) < 1e-3,
      s"direction must be unit-norm in micro-units, got $norm2")
    assert(rows.head.getAs[Long]("sigma_micro") > 0L)
    // order-independent micro-quantized trajectory: re-running yields
    // identical longs
    val again = q(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("dim")).map(_.getAs[Long]("v_micro"))
    assert(again.toSeq === v.toSeq)
  }

  test("GSDMM groups disjoint-vocabulary docs and is seed-deterministic") {
    val docsA = Array.fill(20)(Array("apple", "banana", "cherry"))
    val docsB = Array.fill(20)(Array("xray", "yankee", "zulu"))
    val docs = docsA ++ docsB
    val r1 = Gsdmm.fit(docs, k = 8, alpha = 0.1, beta = 0.1, iters = 15, seed = 7)
    val r2 = Gsdmm.fit(docs, k = 8, alpha = 0.1, beta = 0.1, iters = 15, seed = 7)
    assert(r1.labels.toSeq === r2.labels.toSeq)
    assert(r1.clusterDocCount.sum === 40)
    // the two vocabularies must not share a cluster
    val aClusters = r1.labels.take(20).toSet
    val bClusters = r1.labels.drop(20).toSet
    assert(aClusters.intersect(bClusters).isEmpty)
  }
}
