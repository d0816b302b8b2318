package graft

import graft.multimodal.Multimodal

/** Audio fingerprint dedup: the WAV encode→decode→sample chain must match
  * the closed-form PCM formula (the SQL oracle's replay), planted
  * sample-shifted variants must share most fingerprints, and the catalog
  * query must return exactly the planted near-dups at the contract
  * threshold.
  */
class AudioFingerprintSpec extends SparkSpec {

  private def formulaSamples(k: Long, bump: Int): Array[Int] = {
    val n = (64 + java.lang.Math.floorMod(k, 65L)).toInt
    Array.tabulate(n) { i =>
      (java.lang.Math.floorMod(
        k * 24097 + i * 17 + (java.lang.Math.floorMod(k, 251L) + 3) * i * i + bump,
        65536L) - 32768L).toInt
    }
  }

  /** Formula-side fingerprint set — the arithmetic the oracle runs. */
  private def fingerprints(samples: Array[Int]): Set[Long] = {
    val q = samples.map(s => ((s + 32768) / 256).toLong)
    val g = (0 to q.length - 4).map(i =>
      ((q(i) * 256 + q(i + 1)) * 256 + q(i + 2)) * 256 + q(i + 3))
      .filter(_ % 16843009L != 0)
    if (g.length < 4) Set.empty
    else (0 to g.length - 4).map(j => g.slice(j, j + 4).min).toSet
  }

  test("decoded samples equal the closed-form PCM formula (oracle parity)") {
    for (k <- 0L until 200L; bump <- Seq(0, 1)) {
      val dec = Multimodal.decodeAudioSamples(Multimodal.mintWavTextured(k, bump))
      assert(dec.isDefined, s"WAV $k/$bump failed to decode")
      assert(dec.get.toSeq == formulaSamples(k, bump).toSeq,
        s"sample mismatch at k=$k bump=$bump")
    }
  }

  test("planted variants share most fingerprints; distinct seeds almost none") {
    var plantedBelow = 0
    for (k <- 0L until 300L) {
      val a = fingerprints(formulaSamples(k, 0))
      val b = fingerprints(formulaSamples(k, 1))
      if ((a & b).size < 20) plantedBelow += 1
    }
    assert(plantedBelow == 0,
      s"$plantedBelow planted pairs fell below the 20-shared contract")
    val cross = for (k <- 0L until 50L; j <- k + 1 until 50L)
      yield (fingerprints(formulaSamples(k, 0)) &
        fingerprints(formulaSamples(j, 0))).size
    assert(cross.count(_ >= 20) == 0,
      s"distinct-seed pairs crossed the threshold: ${cross.max} shared")
  }

  test("undecodable payloads are dropped, not failed") {
    assert(Multimodal.decodeAudioSamples(null).isEmpty)
    assert(Multimodal.decodeAudioSamples(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeAudioSamples("not a wav".getBytes).isEmpty)
  }

  test("catalog query returns exactly the planted pairs at sf0.001") {
    val df = graft.queries.Catalog.byName("dedup_audio_fingerprint")
      .spark(spark, "/root/testdata/sf0.001")
    val pairs = df.collect().map(r =>
      (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 10 == 0)
    assert(docs.nonEmpty)
    val expected = docs.map(k => (k, k + 100000L)).toSet
    assert(pairs == expected,
      s"missing=${(expected -- pairs).take(5)} extra=${(pairs -- expected).take(5)}")
  }
}
