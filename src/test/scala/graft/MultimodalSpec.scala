package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("stubDecode: 16-bin byte histogram, L1-normalized, deterministic") {
    val f = Multimodal.stubDecode("AAAA".getBytes("UTF-8")) // 'A' = 65 → bin 4
    assert(f.length === Multimodal.featureDim)
    assert(f(4) === 1.0f)
    assert(f.sum === 1.0f)
    assert(Multimodal.stubDecode(Array.empty[Byte]).forall(_ === 0f))
  }

  test("asMedia + extractFeatures: schema contract and payload round-trip") {
    val docs = Seq((1L, "hello world"), (2L, "AAAA")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    assert(media.schema.fieldNames.toSeq === Seq("media_id", "kind", "payload", "n_bytes"))
    val feats = Multimodal.extractFeatures(media)
      .orderBy("media_id").collect()
    assert(feats.length === 2)
    val r2 = feats(1)
    assert(r2.getAs[Long]("media_id") === 2L)
    assert(r2.getAs[Int]("n_bytes") === 4)
    val f2 = r2.getSeq[Float](r2.fieldIndex("feature"))
    assert(f2(4) === 1.0f && f2.sum === 1.0f)
  }

  test("frameSample: fixed-size frames, stride keeps every Nth, exact slices") {
    // 10-byte payload, frameSize 4 → frames 0..2; stride 2 keeps 0 and 2.
    val docs = Seq((1L, "0123456789")).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(Multimodal.asMedia(docs), 4, 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2))
    assert(new String(frames(0).getAs[Array[Byte]]("frame"), "UTF-8") === "0123")
    // Last frame is a short tail slice.
    assert(new String(frames(1).getAs[Array[Byte]]("frame"), "UTF-8") === "89")
  }

  test("mintPng -> decodeImage: real PNG round-trip reproduces the " +
      "pixel-formula histogram exactly") {
    for (k <- Seq(0L, 1L, 7L, 123L, 4999L)) {
      val png = Multimodal.mintPng(k)
      // a real PNG container, not a stub payload
      assert(png.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      val f = Multimodal.decodeImage(png).get
      val (w, h) = ((4 + k % 5).toInt, (4 + k % 3).toInt)
      assert(f.width === w && f.height === h)
      // independent model of the formula
      val expected = new Array[Long](Multimodal.featureDim)
      for (y <- 0 until h; x <- 0 until w) {
        val r = ((k * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((k * 17 + x * 11 + y * 5) % 256).toInt
        val b = ((k * 29 + x * 3 + y * 19) % 256).toInt
        expected(((r + g + b) / 3) / 16) += 1L
      }
      assert(f.lumHist.toSeq === expected.toSeq, s"seed $k")
      assert(f.lumHist.sum === w.toLong * h)
    }
  }

  test("decodeImage: empty and corrupt payloads return None") {
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImage("definitely not a png".getBytes).isEmpty)
  }

  test("decodeMedia: image/* takes the real path, others and corrupt " +
      "images fall back to the stub byte histogram") {
    val rows = Seq(
      (1L, "image/png", Multimodal.mintPng(1L)),
      (2L, "text/plain", "AAAA".getBytes("UTF-8")),
      (3L, "image/png", "corrupt".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes",
        org.apache.spark.sql.functions.length($"payload").cast("int"))
    val out = Multimodal.decodeMedia(rows).orderBy("media_id").collect()
    val img = out(0)
    assert(img.getAs[Int]("width") === 5 && img.getAs[Int]("height") === 5)
    assert(img.getSeq[Long](img.fieldIndex("hist")).sum === 25L)
    val txt = out(1)
    assert(txt.getAs[Int]("width") === -1)
    // 'A' = 65 -> byte-hist bin 4, stub fallback
    assert(txt.getSeq[Long](txt.fieldIndex("hist"))(4) === 4L)
    assert(txt.getSeq[Float](txt.fieldIndex("feature"))(4) === 1.0f)
    val bad = out(2)
    assert(bad.getAs[Int]("width") === -1,
      "corrupt image payload must fall back to the stub, not fail")
    assert(bad.getSeq[Long](bad.fieldIndex("hist")).sum === 7L)
  }

  test("mintWav -> decodeAudio: real WAV round-trip reproduces the " +
      "sample-formula statistics exactly") {
    for (k <- Seq(0L, 1L, 7L, 123L, 4999L)) {
      val wav = Multimodal.mintWav(k)
      // a real RIFF/WAVE container, not a stub payload
      assert(wav.take(4).toSeq === "RIFF".getBytes("US-ASCII").toSeq)
      assert(wav.slice(8, 12).toSeq === "WAVE".getBytes("US-ASCII").toSeq)
      val f = Multimodal.decodeAudio(wav).get
      val n = (64 + k % 65).toInt
      assert(f.nSamples === n && f.sampleRate === 8000)
      // independent model of the formula
      val expected = new Array[Long](Multimodal.featureDim)
      var sumAbs = 0L
      for (i <- 0 until n) {
        val s = ((k * 131 + i * 17) % 65536 - 32768).toInt
        expected((s + 32768) / 4096) += 1L
        sumAbs += math.abs(s)
      }
      assert(f.ampHist.toSeq === expected.toSeq, s"seed $k")
      assert(f.sumAbs === sumAbs, s"seed $k")
      assert(f.ampHist.sum === n.toLong)
    }
  }

  test("mintWav: hand-rolled RIFF header is byte-identical to the JDK " +
      "WAV writer's output on every seed shape") {
    // n = 64 + k % 65, so cover both length extremes plus odd/even and
    // large seeds; equality here is what licenses the cheap mint path
    // (n_bytes = length(payload) is oracle-checked downstream).
    for (k <- Seq(0L, 1L, 63L, 64L, 65L, 129L, 4999L, 123456789L)) {
      assert(Multimodal.mintWav(k).toSeq ===
        Multimodal.mintWavViaAudioSystem(k).toSeq, s"seed $k")
    }
  }

  test("decodeAudio: empty, corrupt, and non-PCM-16 payloads return None") {
    assert(Multimodal.decodeAudio(null).isEmpty)
    assert(Multimodal.decodeAudio(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeAudio("definitely not a wav".getBytes).isEmpty)
    // a valid PNG is not a valid audio container
    assert(Multimodal.decodeAudio(Multimodal.mintPng(1L)).isEmpty)
  }

  test("decodeAudioMedia: audio/* takes the real path, others fall back " +
      "to the stub byte histogram") {
    val rows = Seq(
      (1L, "audio/wav", Multimodal.mintWav(1L)),
      (2L, "text/plain", "AAAA".getBytes("UTF-8")),
      (3L, "audio/wav", "corrupt".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes",
        org.apache.spark.sql.functions.length($"payload").cast("int"))
    val out = Multimodal.decodeAudioMedia(rows).orderBy("media_id").collect()
    val wav = out(0)
    assert(wav.getAs[Int]("n_samples") === 65)
    assert(wav.getAs[Int]("sample_rate") === 8000)
    assert(wav.getSeq[Long](wav.fieldIndex("amp_hist")).sum === 65L)
    val txt = out(1)
    assert(txt.getAs[Int]("n_samples") === -1 &&
      txt.getAs[Long]("sum_abs") === -1L)
    assert(txt.getSeq[Long](txt.fieldIndex("amp_hist"))(4) === 4L)
    val bad = out(2)
    assert(bad.getAs[Int]("n_samples") === -1,
      "corrupt audio payload must fall back to the stub, not fail")
  }

  test("resize: every factor-th byte kept, metadata updated") {
    val docs = Seq((1L, "abcdef")).toDF("doc_id", "text")
    val out = Multimodal.resize(Multimodal.asMedia(docs), 2).collect().head
    assert(new String(out.getAs[Array[Byte]]("payload"), "UTF-8") === "ace")
    assert(out.getAs[Int]("n_bytes") === 3)
  }
}
