package graft

import graft.multimodal.Multimodal

/** dHash perceptual hashing for image near-dup: the encode→decode→hash
  * chain must match the closed-form pixel formula (the SQL oracle's
  * replay), planted red-bumped variants must land inside the Hamming
  * ball, and the catalog query must deliver the LSH recall guarantee
  * (every pair within radius 3 shares a band — pigeonhole over 4 bands).
  */
class ImagePhashSpec extends SparkSpec {

  /** Formula-side dHash bands for the TEXTURED mint, computed WITHOUT
    * any codec — the same arithmetic the DuckDB oracle runs. */
  private def formulaBands(k: Long, bump: Int): Array[Int] = {
    val w = 9 + java.lang.Math.floorMod(k, 5L)
    val h = 8 + java.lang.Math.floorMod(k, 3L)
    def lum(x: Int, y: Int): Long = {
      val sx = x * w / 9
      val sy = y * h / 8
      val r = (java.lang.Math.floorMod(
        k * 31 + sx * 7 + sy * 13 + (java.lang.Math.floorMod(k, 7L) + 1) * sx * sx,
        256L) + bump) % 256
      val g = java.lang.Math.floorMod(
        k * 17 + sx * 11 + sy * 5 + (java.lang.Math.floorMod(k, 11L) + 1) * sx * sy,
        256L)
      val b = java.lang.Math.floorMod(
        k * 29 + sx * 3 + sy * 19 + (java.lang.Math.floorMod(k, 13L) + 1) * sy * sy,
        256L)
      (r + g + b) / 3
    }
    val bands = new Array[Int](4)
    for (y <- 0 until 8; x <- 0 until 8)
      if (lum(x + 1, y) > lum(x, y)) bands(y / 2) |= 1 << ((y % 2) * 8 + x)
    bands
  }

  private def hamming(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum

  test("decoded dHash equals the closed-form pixel formula (oracle parity)") {
    for (k <- 0L until 200L) {
      val dec = Multimodal.dHashBands(Multimodal.mintPngTextured(k, 0))
      assert(dec.isDefined, s"PNG $k failed to decode")
      assert(dec.get.toSeq == formulaBands(k, 0).toSeq, s"base mismatch at k=$k")
      val decB = Multimodal.dHashBands(Multimodal.mintPngTextured(k, 1))
      assert(decB.get.toSeq == formulaBands(k, 1).toSeq, s"bumped mismatch at k=$k")
    }
  }

  test("textured hashes are diverse (LSH buckets do not saturate)") {
    val hashes = (0L until 500L).map(k => formulaBands(k, 0).toSeq)
    assert(hashes.distinct.size >= 495,
      s"expected diverse dHashes, got ${hashes.distinct.size} distinct of 500")
  }

  test("planted bumped variants sit inside the Hamming ball (<= 3)") {
    val dists = (0L until 500L).map { k =>
      hamming(formulaBands(k, 0), formulaBands(k, 1))
    }
    // The +1 red bump moves luminance by at most one level; most hashes
    // are identical or within a couple of gradient-sign flips.
    assert(dists.count(_ <= 3) >= 450,
      s"too many escaped the ball: ${dists.count(_ > 3)} of 500")
  }

  test("undecodable payloads are dropped, not failed") {
    assert(Multimodal.dHashBands(null).isEmpty)
    assert(Multimodal.dHashBands(Array[Byte]()).isEmpty)
    assert(Multimodal.dHashBands("not a png".getBytes).isEmpty)
  }

  test("catalog query finds every planted pair within the guarantee radius") {
    val df = graft.queries.Catalog.byName("dedup_image_phash")
      .spark(spark, "/root/testdata/sf0.001")
    val pairs = df.collect().map(r =>
      (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 10 == 0)
    assert(docs.nonEmpty)
    // LSH contract: radius-3 pairs MUST share a band; with diverse
    // hashes the probe cap must not truncate any planted bucket here.
    val expected = docs.filter(k =>
      hamming(formulaBands(k, 0), formulaBands(k, 1)) <= 3)
    assert(expected.nonEmpty)
    val missed = expected.filterNot(k => pairs.contains((k, k + 100000L)))
    assert(missed.isEmpty, s"planted near-dups missed: ${missed.take(10).toSeq}")
  }
}
