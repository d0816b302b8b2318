package graft.ml

/** KNN regression + autoregressive forecasting (N9; reference
  * src/visitor_prediction/predict.py:95-206): MinMax-scaled features,
  * K-nearest mean prediction, and a day-by-day forecast loop that feeds
  * each prediction back into the lag features of the next day — exactly
  * the reference's sklearn KNeighborsRegressor usage, ported to plain
  * Scala because the fitted frame is tiny (the heavy feature engineering
  * stays in DataFrames; only the final ≤ a-few-thousand-row matrix ever
  * reaches the driver).
  */
object Knn {

  final case class Model(k: Int, x: Array[Array[Double]], y: Array[Double],
      lo: Array[Double], hi: Array[Double]) {

    def scale(row: Array[Double]): Array[Double] = {
      val out = new Array[Double](row.length)
      var j = 0
      while (j < row.length) {
        val span = hi(j) - lo(j)
        out(j) = if (span == 0) 0.0 else (row(j) - lo(j)) / span
        j += 1
      }
      out
    }

    def predict(raw: Array[Double]): Double = {
      val q = scale(raw)
      val dists = x.indices.map { i =>
        var d = 0.0
        var j = 0
        while (j < q.length) { val t = x(i)(j) - q(j); d += t * t; j += 1 }
        (d, i)
      }.sorted
      val kk = math.min(k, dists.length)
      var s = 0.0
      var i = 0
      while (i < kk) { s += y(dists(i)._2); i += 1 }
      if (kk == 0) 0.0 else s / kk
    }
  }

  /** Fit = remember the MinMax-scaled training matrix. */
  def fit(features: Array[Array[Double]], target: Array[Double], k: Int): Model = {
    require(features.nonEmpty, "empty training set")
    val dim = features.head.length
    val lo = Array.fill(dim)(Double.MaxValue)
    val hi = Array.fill(dim)(Double.MinValue)
    features.foreach { row =>
      var j = 0
      while (j < dim) {
        if (row(j) < lo(j)) lo(j) = row(j)
        if (row(j) > hi(j)) hi(j) = row(j)
        j += 1
      }
    }
    val m = Model(k, null, target, lo, hi)
    Model(k, features.map(m.scale), target, lo, hi)
  }

  /** Autoregressive forecast: `mkFeatures(dayIndex, lags)` builds the
    * feature row for each future day from the (prediction-extended) lag
    * window, mirroring predict.py:176-190. */
  def forecast(model: Model, history: Vector[Double], horizon: Int,
      mkFeatures: (Int, Vector[Double]) => Array[Double]): Vector[Double] = {
    var lags = history
    var out = Vector.empty[Double]
    var d = 0
    while (d < horizon) {
      val pred = model.predict(mkFeatures(d, lags))
      out :+= pred
      lags :+= pred
      d += 1
    }
    out
  }
}
