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

  test("resize: every factor-th byte kept, metadata updated") {
    val docs = Seq((1L, "abcdef")).toDF("doc_id", "text")
    val out = Multimodal.resize(Multimodal.asMedia(docs), 2).collect().head
    assert(new String(out.getAs[Array[Byte]]("payload"), "UTF-8") === "ace")
    assert(out.getAs[Int]("n_bytes") === 3)
  }
}
