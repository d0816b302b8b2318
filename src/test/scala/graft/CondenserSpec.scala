package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Condenser
import graft.streaming.Condenser.{Changed, Snapshot}

/** The streaming condenser must (a) drop unchanged snapshots, (b) emit
  * deltas vs the previous KEPT row, and (c) carry state across
  * micro-batches — an unchanged value arriving in a later batch is still
  * recognized as unchanged.
  */
class CondenserSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2021-01-01 10:$m%02d:00")

  test("batch: unchanged rows dropped, deltas vs previous kept row") {
    val in = Seq(
      Snapshot("p1", ts(0), 10, 1),
      Snapshot("p1", ts(1), 10, 1), // unchanged → dropped
      Snapshot("p1", ts(2), 13, 2), // changed → delta (3, 1)
      Snapshot("p2", ts(0), 5, 0)).toDS()
    val out = Condenser.condense(in).collect().sortBy(c => (c.key, c.ts.getTime))
    assert(out.toSeq === Seq(
      Changed("p1", ts(0), 10, 1, 0, 0),
      Changed("p1", ts(2), 13, 2, 3, 1),
      Changed("p2", ts(0), 5, 0, 0, 0)))
  }

  test("streaming: state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Snapshot]
    val query = Condenser.condense(mem.toDS())
      .writeStream.format("memory").queryName("condensed")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Snapshot("p1", ts(0), 10, 1))
      query.processAllAvailable()
      // Batch 2: same values again — state must suppress it; then a change.
      mem.addData(Snapshot("p1", ts(5), 10, 1), Snapshot("p1", ts(6), 11, 1))
      query.processAllAvailable()
      val rows = spark.table("condensed").as[Changed].collect()
        .sortBy(_.ts.getTime)
      assert(rows.toSeq === Seq(
        Changed("p1", ts(0), 10, 1, 0, 0),
        Changed("p1", ts(6), 11, 1, 1, 0)))
    } finally query.stop()
  }
}
