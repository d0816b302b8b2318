package graft.ml

/** GSDMM short-text topic modeling (N8; reference
  * src/topic_modeling.py:181-245: movie-group process, K=10/12,
  * alpha=beta=0.1, 30 iterations). Spark's LDA is not
  * semantics-equivalent for short texts (SURVEY §2.10), so the collapsed
  * Gibbs sampler is ported directly; the corpus reaching it is the
  * already-tokenized, already-filtered output of the distributed text
  * pipeline and is collected once.
  *
  * Deterministic for a fixed seed — and REPLAYABLE by the DuckDB oracle:
  * randomness is COUNTER-BASED (SplitMix64 finalizer over `seed + step`,
  * the stateless-stream discipline of Salmon et al. 2011 "Parallel
  * random numbers: as easy as 1, 2, 3"), so every draw is a pure integer
  * function of its position, expressible in SQL with wrap-mod 64-bit
  * arithmetic — no sequential LCG state to thread through an oracle.
  * Floating-point accumulation is pinned to one rounding order (one
  * fused `log(a) - log(b)` term per token, left-fold sum) that the
  * oracle's list_reduce replays operation-for-operation.
  *
  * KNOWN ASSUMPTION at the primitive level: +,-,*,/ are IEEE-exact, but
  * `log`/`exp` are only ~1-ulp accurate with NO cross-implementation
  * bit guarantee — the replay relies on the JVM's Math.log/exp agreeing
  * with DuckDB's libm on the inputs this corpus exercises (verified
  * empirically at sf0.001/0.01/0.1 and x10). A JDK/libm/architecture
  * change could flip one sampled topic by 1 ulp and diverge the
  * trajectory; if the gate ever fails here with a full-output mismatch,
  * suspect transcendental rounding FIRST, not the replay logic.
  */
object Gsdmm {

  /** SplitMix64 finalizer (Steele/Lea/Flood 2014, public domain
    * constants) — the per-counter mixing function behind every draw. */
  def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0, 1) from counter `ctr`: top 53 bits / 2^53 —
    * exact in both engines (the dividend is an exact double < 2^53). */
  def u01(ctr: Long): Double =
    (mix64(ctr) >>> 11).toDouble / 9007199254740992.0

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
    val n = docs.length
    val vocab = docs.flatten.distinct.length.max(1)

    val mz = new Array[Int](k)                 // docs per cluster
    val nz = new Array[Int](k)                 // words per cluster
    val nzw = Array.fill(k)(collection.mutable.HashMap.empty[String, Int]) // word counts per cluster

    val labels = new Array[Int](n)
    // init: counter-based random assignment (counters seed..seed+n-1)
    var i = 0
    while (i < n) {
      val z = ((mix64(seed + i) >>> 1) % k).toInt
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
      // log p(z | rest) per the movie-group process (Yin & Wang 2014
      // eq. 4). ONE fused `log(a) - log(b)` term per token added to a
      // left-fold — the oracle replays this exact rounding sequence.
      var s = math.log(mz(z) + alpha)
      var j = 0
      val seen = collection.mutable.HashMap.empty[String, Int]
      while (j < docs(d).length) {
        val w = docs(d)(j)
        val prior = seen.getOrElse(w, 0)
        s += math.log(nzw(z).getOrElse(w, 0) + beta + prior) -
          math.log(nz(z) + vocab * beta + j)
        seen(w) = prior + 1
        j += 1
      }
      s
    }

    var it = 0
    var step = 0L // global sweep position; draw counter = seed + n + step
    while (it < iters) {
      var d = 0
      while (d < n) {
        unassign(d)
        val logs = Array.tabulate(k)(score(d, _))
        val mx = logs.max
        val ps = logs.map(l => math.exp(l - mx))
        val total = ps.sum
        var r = u01(seed + n + step) * total
        step += 1
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

  /** Movie-group log-score of `doc` under topic `z` (new-doc form — the
    * doc's own counts are not in the model). Fused ln(a)-ln(b) terms in
    * token order, left-fold sum: the exact arithmetic the DuckDB replay
    * computes, so scores are bit-identical across engines. */
  def score(model: Result, doc: Array[String], z: Int): Double = {
    var s = math.log(model.clusterDocCount(z) + model.alpha)
    val wc = model.wordCounts(z)
    val seen = collection.mutable.HashMap.empty[String, Int]
    var j = 0
    while (j < doc.length) {
      val w = doc(j)
      val prior = seen.getOrElse(w, 0)
      // same fused-term rounding order as the fit sweep (oracle parity)
      s += math.log(wc.getOrElse(w, 0) + model.beta + prior) -
        math.log(model.clusterWordTotal(z) + model.vocab * model.beta + j)
      seen(w) = prior + 1
      j += 1
    }
    s
  }

  /** Deterministic topic assignment for an unseen document: argmax of
    * [[score]] over topics. Ties break to the lowest topic id. */
  def assign(model: Result, doc: Array[String]): Int = {
    var best = 0
    var bestS = Double.NegativeInfinity
    var z = 0
    while (z < model.k) {
      val s = score(model, doc, z)
      if (s > bestS) { bestS = s; best = z }
      z += 1
    }
    best
  }

  /** Max of [[score]] over topics — the held-out fit-quality term
    * (ml_gsdmm_topics' `heldout_ll` column). */
  def bestScore(model: Result, doc: Array[String]): Double = {
    var bestS = Double.NegativeInfinity
    var z = 0
    while (z < model.k) {
      val s = score(model, doc, z)
      if (s > bestS) bestS = s
      z += 1
    }
    bestS
  }
}
