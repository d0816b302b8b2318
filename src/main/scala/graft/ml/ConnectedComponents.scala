package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative minimum-label
  * propagation — the clustering step of a near-duplicate pipeline: the
  * LSH stages (dedup_minhash_lsh / dedup_ngram_jaccard /
  * dedup_embedding_cosine) emit verified PAIRS; this turns pairs into
  * duplicate CLUSTERS (transitive closure) so a curation job can keep
  * exactly one document per component.
  *
  * Algorithm: every vertex starts labeled with its own id; each round
  * every vertex takes the minimum label among itself and its neighbors.
  * Converges in O(graph diameter) rounds — near-dup graphs are unions of
  * small cliques and short chains, so a handful. Each round is two hash
  * shuffles (edge join + min-agg); labels are `localCheckpoint`ed per
  * round so the plan does not grow with the iteration count, and the
  * convergence check is one bounded count per round. Nothing ever
  * collects vertex or edge data to the driver.
  *
  * (The reference's only clustering needs are driver-sized — DBSCAN over
  * aspect vectors, post_opinion_patterns.py:169-210; this operator is the
  * 100 TB-posture generalization for corpus-scale dedup.)
  */
object ConnectedComponents {

  /** @param edges two-column frame (`src`, `dst`) of undirected edges.
    * @param maxIter upper bound on propagation rounds. A component whose
    *        diameter exceeds this would come back SPLIT into several
    *        labels — silently wrong for dedup (split clusters keep extra
    *        copies) — so non-convergence is never silent: it throws by
    *        default, or logs a warning when `failOnNonConvergence=false`.
    * @return (`id`, `label`) — `label` is the minimum vertex id reachable
    *         from `id`; equal labels = same component. */
  def run(edges: DataFrame, maxIter: Int = 20,
      failOnNonConvergence: Boolean = true): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("label").as("nbr_min"))
      // The left join carries BOTH the previous label and the neighbor
      // minimum, so the per-row "did this label shrink" flag is computed
      // here — the convergence check is then a single count over the
      // checkpointed rows instead of a second join+isEmpty job per round
      // (halves the driver round-trips; the count scans cached partitions,
      // no shuffle).
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"),
          (coalesce(col("nbr_min"), col("label")) < col("label"))
            .cast("long").as("chg"))
        .localCheckpoint()
      converged = next.agg(coalesce(sum("chg"), lit(0L))).first().getLong(0) == 0L
      labels = next.drop("chg")
      i += 1
    }
    if (!converged) {
      val msg = s"ConnectedComponents did not converge within $maxIter " +
        "rounds — a component with a longer diameter exists and its labels " +
        "are split; raise maxIter (rounds needed = graph diameter)"
      if (failOnNonConvergence) throw new IllegalStateException(msg)
      else org.apache.log4j.Logger.getLogger(getClass).warn(msg)
    }
    labels
  }
}
