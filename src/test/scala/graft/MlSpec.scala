package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{Dbscan, Gsdmm, Knn}

class MlSpec extends AnyFunSuite {

  test("KNN predicts the mean of the k nearest targets") {
    val x = Array(Array(0.0), Array(1.0), Array(2.0), Array(10.0))
    val y = Array(0.0, 1.0, 2.0, 10.0)
    val m = Knn.fit(x, y, k = 3)
    // nearest 3 of 1.1 are {1.0, 2.0, 0.0} → mean 1.0
    assert(m.predict(Array(1.1)) === 1.0)
    // k=1 exact recall
    val m1 = Knn.fit(x, y, k = 1)
    assert(m1.predict(Array(10.2)) === 10.0)
  }

  test("KNN autoregressive forecast feeds predictions into lags") {
    val hist = Vector(1.0, 2.0, 3.0, 4.0)
    val m = Knn.fit(Array(Array(1.0), Array(2.0), Array(3.0)), Array(2.0, 3.0, 4.0), 1)
    val preds = Knn.forecast(m, hist, horizon = 3, (d, lags) => Array(lags.last))
    assert(preds.length === 3)
    // lag of 4.0 → nearest feature 3.0 → predicts 4.0; then stays there
    assert(preds === Vector(4.0, 4.0, 4.0))
  }

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
