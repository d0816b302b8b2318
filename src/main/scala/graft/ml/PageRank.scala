package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank over a (src, dst) edge frame.
  *
  * Arithmetic is defined so ANY engine reproduces ranks bit-for-bit, at
  * any partitioning — the same determinism discipline as the rest of the
  * catalog (no float accumulation order hazards):
  *  - ranks live in micro-units (initial rank = 1_000_000);
  *  - per-edge contribution = `(85 * r) div (100 * outdeg)` in integer
  *    floor division (damping 0.85);
  *  - new rank = 150_000 + sum of in-contributions (teleport 0.15);
  *  - dangling-node mass is dropped, not redistributed (the common
  *    simplification; documented engine contract).
  *
  * Scale posture: each iteration is ONE hash shuffle (groupBy dst) plus
  * a key join back to the static node list; edges/nodes/ranks are
  * `localCheckpoint`ed so the plan stays O(1) deep across iterations —
  * the same O(iters) × O(E/p) pattern as
  * [[graft.ml.ConnectedComponents]], no driver-side graph state.
  */
object PageRank {

  /** @param edges (src: bigint, dst: bigint) frame; duplicates collapsed.
    * @return (id, r) — final micro-unit ranks, one row per node. */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    // (r15) Hoist the static per-round work out of the loop: each
    // iteration used to rebuild deg (scan + aggregate of e) and re-join
    // e ⋈ deg from scratch — per-round checkpoints are separate jobs,
    // so no exchange reuse can dedupe across rounds (guide §2.4). ed
    // carries every edge with its out-degree, partitioned by src ONCE;
    // localCheckpoint's LogicalRDD keeps outputPartitioning, so the
    // per-round ranks join needs no edge-side exchange even past the
    // broadcast threshold. Arithmetic and results are bit-identical.
    val ed = e.join(deg, "src")
      .select(col("src"), col("dst"), col("d"))
      .repartition(col("src")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().repartition(col("id")).localCheckpoint()
    var ranks = nodes.withColumn("r", lit(1000000L))
    var i = 0
    while (i < iters) {
      val contrib = ed
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("(85 * r) div (100 * d)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), (lit(150000L) + coalesce(col("s"), lit(0L))).as("r"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }
}
