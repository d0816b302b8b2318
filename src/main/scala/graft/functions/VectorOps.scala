package graft.functions

/** Compiled kernels for the vector / hashing inner loops of the dedup and
  * similarity operators.
  *
  * Spark's higher-order array functions (`transform`/`aggregate` lambdas)
  * run INTERPRETED — fine for occasional array surgery, ~100x too slow for
  * a 64-dim dot product evaluated millions of times. These helpers are
  * plain Scala (primitive loops, no boxing inside) wrapped as UDFs at the
  * query layer: the one place where a UDF beats expressions. All folds are
  * sequential left-to-right so results are bit-identical to the DuckDB
  * oracle's list_sum replication.
  */
object VectorOps {

  /** Per-thread reusable digest: `MessageDigest.getInstance` dominates the
    * hash cost when called once per shingle (millions of times per task). */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 as a non-negative long — the compiled twin of
    * the SQL `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`. */
  def md5Long(s: String): Long = md5LongBytes(s.getBytes("UTF-8"))

  /** [[md5Long]] over raw UTF-8 bytes (UTF8String.getBytes produces the
    * identical encoding, so the expression kernels hash bit-for-bit the
    * same values as the String path and the SQL oracle). */
  def md5LongBytes(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    // first 15 hex chars = 7.5 bytes: take 8 bytes big-endian, drop low nibble
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** SimHash-32 over token md5s: bit j of the signature is the sign of the
    * balance of bit j across all token hashes (near-identical token sets →
    * identical signature). One md5 per token, primitive-loop aggregation. */
  def simhash32(toks: Seq[String]): Long = {
    val hs = toks.map(md5Long)
    var sig = 0L
    var j = 0
    while (j < 32) {
      var bal = 0L
      hs.foreach(h => bal += (if (((h >> j) & 1L) == 1L) 1L else -1L))
      if (bal > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Sequential-fold cosine (dot and norms each folded left-to-right). */
  def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val n = a.length
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i) * b(i); i += 1 }
    i = 0
    while (i < n) { na += a(i) * a(i); i += 1 }
    i = 0
    while (i < n) { nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Float-input cosine: embeddings stay raw `array<float>` in the plan
    * (an interpreted `transform(_.cast("double"))` per use was the single
    * largest cost of the embedding queries); each element widens to double
    * inside the loop, which is exact, so the result is bit-identical to
    * casting the whole array first. */
  def cosineFF(a: Seq[Float], b: Seq[Float]): Double = {
    val n = a.length
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    i = 0
    while (i < n) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    i = 0
    while (i < n) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Mixed float/double cosine (query vector vs double centroid). */
  def cosineFD(a: Seq[Float], b: Seq[Double]): Double = {
    val n = a.length
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i).toDouble * b(i); i += 1 }
    i = 0
    while (i < n) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    i = 0
    while (i < n) { nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** MinHash signature: seed j hashes shingle x as
    * ((2j+1) * (md5Long(x) mod 2^28) + 7919 j) mod (2^31 - 1) — one md5
    * per shingle total, the per-seed family is overflow-free affine
    * arithmetic reproducible in any SQL engine. */
  def minhashSig(sh: Seq[String], nSeeds: Int): Array[Long] = {
    if (sh.isEmpty) return Array.fill(nSeeds)(-1L)
    val hs = sh.map(x => md5Long(x) % 268435456L).toArray
    Array.tabulate(nSeeds) { j =>
      var mn = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = ((2L * j + 1L) * hs(i) + 7919L * j) % 2147483647L
        if (v < mn) mn = v
        i += 1
      }
      mn
    }
  }

  /** Random-hyperplane coefficients, md5-derived (plane p, dim d →
    * md5Long("p_d") % 2001 - 1000) — computed once per JVM, identical to
    * the oracle's per-row SQL derivation. */
  lazy val planes: Array[Array[Double]] = Array.tabulate(32, 64) { (p, d) =>
    ((md5Long(s"${p}_$d") % 2001L) - 1000L).toDouble
  }

  /** Distinct character 3-grams of a string (compiled; the HOF-lambda
    * substr loop is interpreted and ~50x slower at corpus scale). */
  def charTrigrams(s: String): Array[String] = {
    if (s.length < 3) return Array.empty
    val set = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 3 <= s.length) { set.add(s.substring(i, i + 3)); i += 1 }
    set.toArray(new Array[String](set.size))
  }

  /** Set-Jaccard of two string arrays (inputs need not be distinct). */
  def jaccard(a: Seq[String], b: Seq[String]): Double = {
    val sa = new java.util.HashSet[String]()
    a.foreach(sa.add)
    val sb = new java.util.HashSet[String]()
    b.foreach(sb.add)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Float-input twin of [[bandKeys]] (float→double widening is exact). */
  def bandKeysF(vv: Seq[Float]): Array[Long] = {
    val v = new Array[Double](vv.length)
    var i = 0
    while (i < v.length) { v(i) = vv(i).toDouble; i += 1 }
    bandKeysArr(v)
  }

  /** 8 banded 4-bit hyperplane bucket keys for a 64-dim vector. */
  def bandKeys(vv: Seq[Double]): Array[Long] = bandKeysArr(vv.toArray)

  private def bandKeysArr(v: Array[Double]): Array[Long] = {
    Array.tabulate(8) { bd =>
      var key = 0L
      var j = 0
      while (j < 4) {
        val plane = planes(bd * 4 + j)
        var dot = 0.0
        var d = 0
        while (d < 64) { dot += v(d) * plane(d); d += 1 }
        if (dot > 0) key |= (1L << j)
        j += 1
      }
      key
    }
  }
}
