package graft.ml

import scala.collection.mutable

/** Driver-side DBSCAN over cosine distance (N7; reference
  * src/absa/post_opinion_patterns.py:169-210: eps=0.37, minPts=2, noise
  * dropped). The reference clusters a few hundred aspect-phrase vectors —
  * small enough that the documented design (SURVEY §7.3) is a driver-side
  * port behind an "ml stage" boundary; the embedding corpus reaching this
  * stage is always the OUTPUT of a distributed aggregation, never raw
  * data.
  *
  * Deterministic: points are visited in input order, neighbor lists are
  * ordered, so labels are reproducible run to run.
  */
object Dbscan {

  /** Returns cluster label per point: -1 = noise, clusters numbered from 0
    * in discovery order. */
  def fit(vecs: Array[Array[Double]], eps: Double, minPts: Int): Array[Int] = {
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    def cosDist(i: Int, j: Int): Double = {
      var dot = 0.0
      var d = 0
      val a = vecs(i); val b = vecs(j)
      while (d < a.length) { dot += a(d) * b(d); d += 1 }
      val den = norms(i) * norms(j)
      if (den == 0) 1.0 else 1.0 - dot / den
    }
    fitGraph(vecs.length, (i, j) => cosDist(i, j) <= eps, minPts)
  }

  /** Generalized (weighted) DBSCAN over an arbitrary neighbor predicate.
    *
    * `weight(i)` = how many identical points the vertex stands for — the
    * post-aggregation distinct-vector frame collapses duplicates, and a
    * vertex of multiplicity w contributes w to its own core test (its
    * duplicates are at distance 0). With per-point weight 1 this is
    * textbook DBSCAN. Deterministic: vertices visited in input order,
    * neighbor lists ordered.
    */
  def fitGraph(n: Int, isNeighbor: (Int, Int) => Boolean, minPts: Int,
      weight: Int => Int = _ => 1): Array[Int] = {

    def neighbors(i: Int): mutable.ArrayBuffer[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var j = 0
      while (j < n) {
        if (j != i && isNeighbor(i, j)) out += j
        j += 1
      }
      out
    }
    def coreMass(i: Int, nb: mutable.ArrayBuffer[Int]): Int =
      weight(i) + nb.iterator.map(weight).sum

    val labels = Array.fill(n)(-2) // -2 unvisited, -1 noise
    var cluster = -1
    var i = 0
    while (i < n) {
      if (labels(i) == -2) {
        val nb = neighbors(i)
        if (coreMass(i, nb) < minPts) labels(i) = -1
        else {
          cluster += 1
          labels(i) = cluster
          val queue = mutable.Queue(nb.toSeq: _*)
          while (queue.nonEmpty) {
            val q = queue.dequeue()
            if (labels(q) == -1) labels(q) = cluster
            if (labels(q) == -2) {
              labels(q) = cluster
              val qnb = neighbors(q)
              if (coreMass(q, qnb) >= minPts) queue ++= qnb
            }
          }
        }
      }
      i += 1
    }
    labels
  }
}
