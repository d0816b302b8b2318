package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact Lloyd k-means over an `array<float>` embedding column.
  *
  * Determinism contract (same discipline as [[PageRank]] /
  * [[ConnectedComponents]]): any engine, at any partitioning, reproduces
  * the assignments bit-for-bit —
  *  - vectors are quantized to micro-units (`round(x * 1e6)` as long);
  *  - distances are integer squared-L2 (exact, order-free sums);
  *  - centroid updates use truncating integer division (Spark `div` ==
  *    DuckDB `//` on positives and negatives alike);
  *  - argmin ties break to the lowest centroid id via struct-min.
  *
  * Scale posture: per iteration ONE broadcast of the k-row centroid
  * frame, one partial-aggregable argmin `groupBy(vec_id)` (map-side
  * combine — the shuffle carries one row per vector, not per
  * vector×centroid), and a (k × dims)-row centroid aggregate. No driver
  * state; the identical loop at a 100 TB corpus still broadcasts k rows
  * per round. (The reference's only clustering is driver-sized DBSCAN,
  * post_opinion_patterns.py:169-210; this is the corpus-scale partner
  * operator, and the training stage an IVF coarse quantizer needs.)
  */
object KMeans {

  /** Quantize an embedding frame to micro-unit long vectors.
    * @return (vec_id, xq: array<long>) */
  def quantize(v: DataFrame): DataFrame =
    v.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long")).as("xq"))

  /** Assign each vector to its nearest centroid (integer squared-L2,
    * ties to lowest cid). `cent` is (cid, cv: array<long>), broadcast.
    * @return (vec_id, cid, dist) */
  def assign(v: DataFrame, cent: DataFrame): DataFrame =
    v.crossJoin(broadcast(cent))
      .withColumn("dist",
        expr("aggregate(zip_with(xq, cv, (a, b) -> (a-b)*(a-b)), " +
          "0L, (acc, p) -> acc + p)"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist"))

  /** Run `iters` Lloyd updates from the deterministic seed (the k lowest
    * vec_ids) and return the final centroid frame (cid, cv). */
  def fit(v: DataFrame, k: Int, iters: Int): DataFrame = {
    var cent = v.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("xq").as("cv"))
    var it = 0
    while (it < iters) {
      cent = assign(v, cent).join(v, "vec_id")
        .select(col("cid"), posexplode(col("xq")).as(Seq("d", "x")))
        .groupBy("cid", "d")
        .agg(expr("sum(x) div count(1)").as("cx"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("d"), col("cx")))),
          t => t.getField("cx")).as("cv"))
      it += 1
    }
    cent
  }
}
