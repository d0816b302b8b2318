package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{Dbscan, Gsdmm, Knn}
import graft.multimodal.Multimodal

/** Driver-side ML stages (SURVEY §2.10 N7/N8/N9, §7.3 decision table):
  * the distributed plan does every heavy step (rollups, tokenization,
  * feature extraction); only a small aggregated frame is collected for
  * the model, exactly mirroring the reference's sklearn/gensim boundary.
  * No SQL oracle exists for these (rows-only driver check); semantics are
  * unit-tested in MlSpec.
  */
object MlQueries extends QueryBase {

  val all: Seq[Q] = Seq(
    // N9: KNN visitor prediction — daily rollup (distributed) → lag/
    // weekday features → K=5 KNN → 14-day autoregressive forecast.
    // reference src/visitor_prediction/predict.py:95-206.
    Q(
      "ml_knn_forecast",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(dsum(col("value")).as("total"))
          .orderBy("day")
          .collect()
          .map(r => r.getAs[Double]("total"))
          .toVector
        def features(dayIdx: Int, lags: Vector[Double]): Array[Double] = {
          val dow = new Array[Double](7)
          dow(dayIdx % 7) = 1.0
          dow ++ Array(lags(dayIdx - 1), lags(dayIdx - 7))
        }
        val trainIdx = (7 until daily.length).toArray
        val model = Knn.fit(
          trainIdx.map(i => features(i, daily)),
          trainIdx.map(daily(_)), k = 5)
        val preds = Knn.forecast(model, daily, horizon = 14,
          (d, lags) => features(daily.length + d, lags))
        import s.implicits._
        preds.zipWithIndex
          .map { case (p, i) => (i + 1, math.rint(p * 1e6) / 1e6) }
          .toDF("day_ahead", "predicted")
          .orderBy("day_ahead")
      },
      None,
      doc = "N9 KNN autoregressive visitor forecast; reference predict.py:95-206"),

    // N7: DBSCAN over the multimodal feature vectors (cosine distance,
    // minPts=2, noise dropped) — near-identical byte-histograms cluster,
    // i.e. the near-dup groups resurface as density clusters.
    // reference src/absa/post_opinion_patterns.py:169-210.
    Q(
      "ml_dbscan_clusters",
      (s, dir) => {
        val feats = Multimodal.extractFeatures(
            Multimodal.asMedia(th(s, dir, "documents")))
          .select(col("media_id"), col("feature"))
          .orderBy("media_id")
          .collect()
        val ids = feats.map(_.getAs[Long]("media_id"))
        val vecs = feats.map(_.getSeq[Float](1).map(_.toDouble).toArray)
        val labels = Dbscan.fit(vecs, eps = 1e-4, minPts = 2)
        import s.implicits._
        ids.zip(labels).toSeq.toDF("media_id", "cluster")
          .filter(col("cluster") >= 0)
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_members"), min(col("media_id")).as("min_doc"))
          .orderBy("min_doc")
          .select(col("n_members"), col("min_doc"))
      },
      None,
      doc = "N7 DBSCAN density clustering (cosine, minPts=2); reference post_opinion_patterns.py:169-210"),

    // N8: GSDMM short-text topic model (K=10, alpha=beta=0.1) over the
    // distributed-tokenized corpus. reference src/topic_modeling.py:181-245.
    Q(
      "ml_gsdmm_topics",
      (s, dir) => {
        val docs = th(s, dir, "documents")
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
          .orderBy("doc_id")
          .collect()
          .map(_.getSeq[String](1).toArray)
        val res = Gsdmm.fit(docs, k = 10, alpha = 0.1, beta = 0.1, iters = 10)
        import s.implicits._
        res.clusterDocCount.zipWithIndex
          .filter(_._1 > 0)
          .map { case (n, z) =>
            (z, n, res.topWords(z).take(3).map(_._1).mkString(" "))
          }.toSeq
          .toDF("topic", "n_docs", "top_words")
          .orderBy("topic")
      },
      None,
      doc = "N8 GSDMM movie-group topic modeling; reference topic_modeling.py:181-245"))
}
