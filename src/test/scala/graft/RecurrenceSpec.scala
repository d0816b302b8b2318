package graft

import java.time.ZoneOffset
import org.apache.spark.sql.functions._

import graft.queries.Catalog

/** Third-face checks for the integer-recursion operators: the catalog
  * query (Spark fold) and the DuckDB oracle (recursive CTE) are two
  * faces the gate compares; this spec adds an INDEPENDENT plain-Scala
  * reimplementation of each recurrence over the same fixture and pins
  * the query output to it — so a bug shared by structurally-similar
  * SQL on both faces can't hide.
  */
class RecurrenceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def centi(x: Double): Long =
    (math.signum(x) * math.round(math.abs(x) * 100)).toLong

  test("window_holt_winters equals a plain-Scala fold of the recursion") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toInstant.atOffset(ZoneOffset.UTC).toLocalDate,
        r.getDouble(2)))
    val daily = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(e => centi(e._3)).sum).toMap
    val want = daily.keys.map(_._1).toSeq.distinct.sorted.map { et =>
      val ys = daily.filter(_._1._1 == et).toSeq.sortBy(_._1._2.toString)
        .map(_._2)
      var l = 0L; var b = 0L; val s = Array.fill(7)(0L); var i = 0L
      ys.foreach { y =>
        if (i == 0L) { l = y; b = 0L }
        else {
          val slot = (i % 7).toInt
          val nl = ((y - s(slot)) * 5 + (l + b) * 5) / 10
          val nb = ((nl - l) * 3 + b * 7) / 10
          s(slot) = ((y - l - b) * 3 + s(slot) * 7) / 10
          l = nl; b = nb
        }
        i += 1
      }
      (et, i, l, b, l + b + s((i % 7).toInt))
    }
    val got = Catalog.byName("window_holt_winters").spark(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"HW mismatch:\n got=$got\nwant=$want")
  }

  test("pipe_rate_limit equals a plain-Scala fold of the token bucket") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, rows) =>
      val seq = rows.map(r => (r._2, r._3)).sorted
      var tok = 5000L; var last = -1L; var adm = 0L
      seq.foreach { case (us, _) =>
        if (last < 0L) { tok = 4000L; adm = 1L; last = us }
        else {
          val refilled = math.min(5000L, tok + (us - last) * 1000 / 86400000000L)
          if (refilled >= 1000L) { tok = refilled - 1000L; adm += 1 }
          else tok = refilled
          last = us
        }
      }
      (u, seq.length.toLong, adm, tok)
    }
    val got = Catalog.byName("pipe_rate_limit").spark(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"rate-limit mismatch on ${got.diff(want).take(3)}")
    // The fixture must actually exercise the limiter (some rejection).
    assert(want.exists(w => w._3 < w._2), "no user ever hit the rate cap")
  }
}
