package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J4 batch form — the reference's `condense_performance_values`
  * (src/_utils/data_preparation.py:242-365): drop incoming snapshot rows
  * whose metric vector is row-equal (null-safe) to the latest stored row
  * for the key, and optionally append per-metric deltas
  * `new - old` with missing-prior → 0 (`linear_delta` :363-365).
  *
  * One broadcast-or-shuffle join on the key; the streaming twin keeping
  * the latest row as keyed state is [[graft.streaming.Condenser]].
  */
object Condense {

  def withDeltas(incoming: DataFrame, latest: DataFrame, key: Seq[String],
      metrics: Seq[String], deltas: Boolean = true): DataFrame = {
    val old = metrics.foldLeft(
        latest.select((key ++ metrics).map(col): _*)) {
      (df, m) => df.withColumnRenamed(m, s"__old_$m")
    }
    val changed = incoming.join(old, key, "left")
      .filter(!metrics.map(m => col(m) <=> col(s"__old_$m")).reduce(_ && _))
    val out =
      if (!deltas) changed
      else metrics.foldLeft(changed) { (df, m) =>
        df.withColumn(s"delta_$m",
          coalesce(col(m) - col(s"__old_$m"), lit(0)))
      }
    out.drop(metrics.map(m => s"__old_$m"): _*)
  }
}
