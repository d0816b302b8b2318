package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Integer-exact HITS (Kleinberg 1999) over a bipartite (src, dst) edge
  * frame: hubs live on `src`, authorities on `dst`.
  *
  * Same determinism discipline as [[PageRank]] — every score is a
  * micro-unit long, every reduction an exact integer sum, every
  * normalization one truncating division, so any engine reproduces the
  * trajectory bit-for-bit at any partitioning:
  *
  *  - h₀(u) = 1_000_000 for every hub;
  *  - authority pass: araw(i) = Σ_{u→i} h(u), then SUM-normalized back
  *    to micro units, a(i) = (araw(i)·10⁶) div Σ araw (classic HITS
  *    normalizes in L2; sum normalization keeps the arithmetic integral
  *    and the ranking identical — scores are a positive scalar multiple
  *    either way, documented engine contract);
  *  - hub pass: hraw(u) = Σ_{u→i} a(i), normalized the same way.
  *
  * All sums run through DECIMAL(38,0) ([[graft.queries.QueryBase.wsum]]
  * rationale): araw·10⁶ reaches ~10¹⁶ on the fixture and ~|E|·10¹²
  * in the worst case, far past int64 at 100 TB — the oracle's HUGEINT
  * matches exactly. Scale posture: per half-iteration ONE edge-sized
  * hash shuffle plus a broadcast 1-row global sum; score state is
  * O(nodes), localCheckpointed so plan depth stays O(1).
  */
object Hits {

  private val dec = DecimalType(38, 0)

  private def normalize(raw: DataFrame, idCol: String, rawCol: String,
      outCol: String): DataFrame = {
    val total = raw.agg(sum(col(rawCol).cast(dec)).as("_tot"))
    raw.crossJoin(broadcast(total))
      .select(col(idCol),
        expr(s"CAST($rawCol * 1000000 AS DECIMAL(38,0)) div _tot")
          .as(outCol))
  }

  /** @param edges (src, dst) bigint frame; duplicates collapsed.
    * @param iters full hub+authority iterations.
    * @return (kind: 'hub'|'auth', id, score) micro-unit scores. */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    // (r15) The two half-iterations join e on DIFFERENT keys (src for
    // the authority pass, dst for the hub pass), and per-round
    // checkpoints are separate jobs — no exchange reuse can dedupe
    // across rounds, so each half-iteration used to re-exchange the
    // full edge table at scale. Two pre-partitioned checkpointed copies
    // (LogicalRDD keeps outputPartitioning) make every round's edge
    // side exchange-free for the price of storing e twice — cheaper
    // than iters×2 edge shuffles for any iters ≥ 1 (guide §2.4).
    val eSrc = e.repartition(col("src")).localCheckpoint()
    val eDst = e.repartition(col("dst")).localCheckpoint()
    val hubs0 = e.select(col("src").as("id")).distinct()
      .withColumn("h", lit(1000000L))
    var hubs = hubs0
    var auths: DataFrame = null
    var i = 0
    while (i < iters) {
      val araw = eSrc.join(hubs.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("h").cast(dec)).as("ar"))
      auths = normalize(araw, "id", "ar", "a").localCheckpoint()
      val hraw = eDst.join(auths.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(sum(col("a").cast(dec)).as("hr"))
      hubs = normalize(hraw, "id", "hr", "h").localCheckpoint()
      i += 1
    }
    auths.select(lit("auth").as("kind"), col("id"), col("a").as("score"))
      .union(hubs.select(lit("hub").as("kind"), col("id"),
        col("h").as("score")))
  }
}
