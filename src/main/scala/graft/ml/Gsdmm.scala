package graft.ml

/** GSDMM short-text topic modeling (N8; reference
  * src/topic_modeling.py:181-245: movie-group process, K=10/12,
  * alpha=beta=0.1, 30 iterations). Spark's LDA is not
  * semantics-equivalent for short texts (SURVEY §2.10), so the collapsed
  * Gibbs sampler is ported directly; the corpus reaching it is the
  * already-tokenized, already-filtered output of the distributed text
  * pipeline and is collected once.
  *
  * Deterministic for a fixed seed: documents are swept in order with a
  * seeded RNG.
  */
object Gsdmm {

  /** Fitted model. Carries the word-topic counts so a distributed stage
    * can assign topics to unseen documents via [[assign]] — the fit may
    * run on a bounded sample while label assignment streams over the full
    * corpus (broadcast model, no driver collect of the corpus). */
  final case class Result(labels: Array[Int], clusterDocCount: Array[Int],
      topWords: Map[Int, Seq[(String, Int)]],
      wordCounts: Array[Map[String, Int]], clusterWordTotal: Array[Int],
      vocab: Int, k: Int, alpha: Double, beta: Double)

  def fit(docs: Array[Array[String]], k: Int, alpha: Double, beta: Double,
      iters: Int, seed: Long = 42L): Result = {
    val rnd = new scala.util.Random(seed)
    val n = docs.length
    val vocab = docs.flatten.distinct.length.max(1)

    val mz = new Array[Int](k)                 // docs per cluster
    val nz = new Array[Int](k)                 // words per cluster
    val nzw = Array.fill(k)(collection.mutable.HashMap.empty[String, Int]) // word counts per cluster

    val labels = new Array[Int](n)
    // init: random assignment
    var i = 0
    while (i < n) {
      val z = rnd.nextInt(k)
      labels(i) = z
      mz(z) += 1
      nz(z) += docs(i).length
      docs(i).foreach(w => nzw(z)(w) = nzw(z).getOrElse(w, 0) + 1)
      i += 1
    }

    def unassign(d: Int): Unit = {
      val z = labels(d)
      mz(z) -= 1
      nz(z) -= docs(d).length
      docs(d).foreach { w =>
        val c = nzw(z)(w) - 1
        if (c == 0) nzw(z).remove(w) else nzw(z)(w) = c
      }
    }

    def score(d: Int, z: Int): Double = {
      // log p(z | rest) per the movie-group process (Yin & Wang 2014 eq. 4)
      var s = math.log(mz(z) + alpha)
      var j = 0
      val seen = collection.mutable.HashMap.empty[String, Int]
      while (j < docs(d).length) {
        val w = docs(d)(j)
        val prior = seen.getOrElse(w, 0)
        s += math.log(nzw(z).getOrElse(w, 0) + beta + prior)
        s -= math.log(nz(z) + vocab * beta + j)
        seen(w) = prior + 1
        j += 1
      }
      s
    }

    var it = 0
    while (it < iters) {
      var d = 0
      while (d < n) {
        unassign(d)
        val logs = Array.tabulate(k)(score(d, _))
        val mx = logs.max
        val ps = logs.map(l => math.exp(l - mx))
        val total = ps.sum
        var r = rnd.nextDouble() * total
        var z = 0
        while (z < k - 1 && r > ps(z)) { r -= ps(z); z += 1 }
        labels(d) = z
        mz(z) += 1
        nz(z) += docs(d).length
        docs(d).foreach(w => nzw(z)(w) = nzw(z).getOrElse(w, 0) + 1)
        d += 1
      }
      it += 1
    }

    val top = (0 until k).map { z =>
      z -> nzw(z).toSeq.sortBy { case (w, c) => (-c, w) }.take(10)
    }.toMap
    Result(labels, mz, top, nzw.map(_.toMap), nz, vocab, k, alpha, beta)
  }

  /** Deterministic topic assignment for an unseen document: argmax over
    * the fitted counts of the same movie-group score used during the
    * Gibbs sweep (new-doc form — the doc's own counts are not in the
    * model). Ties break to the lowest topic id. */
  def assign(model: Result, doc: Array[String]): Int = {
    var best = 0
    var bestS = Double.NegativeInfinity
    var z = 0
    while (z < model.k) {
      var s = math.log(model.clusterDocCount(z) + model.alpha)
      val wc = model.wordCounts(z)
      val seen = collection.mutable.HashMap.empty[String, Int]
      var j = 0
      while (j < doc.length) {
        val w = doc(j)
        val prior = seen.getOrElse(w, 0)
        s += math.log(wc.getOrElse(w, 0) + model.beta + prior)
        s -= math.log(model.clusterWordTotal(z) + model.vocab * model.beta + j)
        seen(w) = prior + 1
        j += 1
      }
      if (s > bestS) { bestS = s; best = z }
      z += 1
    }
    best
  }
}
