package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the performance condenser (SURVEY.md §2.4 J4 /
  * §2.9 #2; reference src/_utils/data_preparation.py:242-365): keep one
  * snapshot row per key in state, emit an incoming row ONLY when its
  * metric values differ from the stored snapshot, together with the
  * per-metric delta (`new - old`, reference `linear_delta` :363-365).
  *
  * This is the engine's `flatMapGroupsWithState` showcase: the reference
  * resolves "latest stored row" with a max-timestamp subquery against the
  * whole table on every hourly run; keyed state makes that O(changed keys)
  * per micro-batch, restartable from the checkpoint, and identical in
  * output to the batch window formulation (tested in CondenserSpec).
  *
  * Scale posture: state holds one fixed-size row per key (not history);
  * keys partition across executors; no shuffle beyond the groupByKey
  * exchange.
  */
object Condenser {

  /** One hourly performance observation (timestamp-ordered per key). */
  final case class Snapshot(key: String, ts: Timestamp, likes: Long,
      comments: Long)

  /** A kept (changed) observation with deltas vs the previous kept row. */
  final case class Changed(key: String, ts: Timestamp, likes: Long,
      comments: Long, dLikes: Long, dComments: Long)

  private def fold(key: String, rows: Iterator[Snapshot],
      state: GroupState[Snapshot]): Iterator[Changed] = {
    val out = Seq.newBuilder[Changed]
    var last = state.getOption
    // Micro-batches are unordered within a key — impose event-time order
    // (ties by insertion) before the change scan.
    rows.toSeq.sortBy(_.ts.getTime).foreach { s =>
      val changed = last match {
        case Some(p) => p.likes != s.likes || p.comments != s.comments
        case None => true
      }
      if (changed) {
        val (dl, dc) = last match {
          case Some(p) => (s.likes - p.likes, s.comments - p.comments)
          case None => (0L, 0L)
        }
        out += Changed(key, s.ts, s.likes, s.comments, dl, dc)
        last = Some(s)
      }
    }
    last.foreach(state.update)
    out.result().iterator
  }

  /** Works identically over a streaming or batch Dataset[Snapshot]
    * (batch = single micro-batch with empty initial state). */
  def condense(snapshots: Dataset[Snapshot]): Dataset[Changed] = {
    implicit val encS = Encoders.product[Snapshot]
    implicit val encC = Encoders.product[Changed]
    snapshots.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
  }
}
