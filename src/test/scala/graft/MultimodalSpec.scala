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
}
