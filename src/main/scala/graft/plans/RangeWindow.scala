package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking / running totals WITHOUT a single-partition sort.
  *
  * `Window.orderBy(...)` with no `partitionBy` plans as a WindowExec over
  * SinglePartition: the whole corpus through one task — the one plan shape
  * that cannot survive a 100x scale-up. These helpers produce the SAME
  * exact results (`row_number`, `ntile`, running `sum`) with a fully
  * partitioned plan:
  *
  *  1. a GK quantile sketch of the range key
  *     (`DataFrameStatFunctions.approxQuantile` — one parallel pass)
  *     yields up to `parts-1` boundary values, collected ONCE on the
  *     driver and embedded as literals → a deterministic, monotone range
  *     group `__rw_pid = #(bounds below key)`. Rows equal on the range
  *     key always share a group, so group-major order == total order.
  *  2. one tiny aggregate per group (≤ `parts` rows collected — O(parts)
  *     driver work, never O(rows)) gives per-group row counts / sums,
  *     prefix-summed into exclusive offsets shipped back as a literal
  *     map lookup (join-free).
  *  3. a window PARTITIONED by `__rw_pid` computes the local rank /
  *     running sum; global = group offset + local.
  *
  * Exactness does NOT depend on sketch quality: the sketch only balances
  * the groups (skewed bounds → skewed partitions, never wrong ranks), and
  * because the bounds are literals both passes assign identical groups
  * even though `approxQuantile`'s merge order varies run to run. The
  * double cast used for sketching is monotone (never order-inverting), and
  * the in-group sort uses the ORIGINAL key column, so long keys past 2^53
  * still rank exactly.
  *
  * Contract: `rangeKey` must be non-null and numeric, ascending (negate
  * for descending); `tieKeys` must complete a total order. Plan cost: two
  * extra parallel passes over `df` (sketch + group counts) instead of the
  * corpus-sized single-node sort.
  */
object RangeWindow {

  /** `df` plus an exact global `row_number` over
    * `(rangeKey asc, tieKeys asc)` in `rankCol`; also returns the total
    * row count (free — it is the last prefix offset).
    */
  def withRank(df: DataFrame, rangeKey: Column, tieKeys: Seq[Column],
      parts: Int, rankCol: String): (DataFrame, Long) =
    withRankAndSum(df, rangeKey, tieKeys, parts, rankCol, None) match {
      case (out, n, _) => (out, n)
    }

  /** `df` plus an exact global running long-sum of `sumCol` over
    * `(rangeKey asc, tieKeys asc)` in `cumCol` (ROWS UNBOUNDED PRECEDING
    * .. CURRENT ROW); also returns (total rows, grand total of `sumCol`).
    * `sumCol` must be integral — the per-group prefix totals stay exact
    * longs.
    */
  def withRunningSum(df: DataFrame, rangeKey: Column, tieKeys: Seq[Column],
      parts: Int, sumCol: Column, cumCol: String): (DataFrame, Long, Long) =
    withRankAndSum(df, rangeKey, tieKeys, parts, cumCol, Some(sumCol)) match {
      case (out, n, tot) => (out, n, tot)
    }

  private def withRankAndSum(df: DataFrame, rangeKey: Column,
      tieKeys: Seq[Column], parts: Int, outCol: String,
      sumCol: Option[Column]): (DataFrame, Long, Long) = {
    require(parts >= 1, s"parts must be >= 1, got $parts")
    val keyed = df.withColumn("__rw_key", rangeKey)
    // Driver-side sketch → boundary literals. distinct+sorted because GK
    // can emit duplicate quantiles on heavy-tied keys; fewer bounds just
    // means fewer (larger) groups, never wrong output.
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val bounds =
      if (parts == 1) Array.empty[Double]
      else keyed.stat
        .approxQuantile(Array("__rw_key"), probs, 1.0 / (4.0 * parts))(0)
        .distinct.sorted
    // Group id as a codegen'd when-chain, deliberately NOT a higher-order
    // filter(...) lambda: Spark 4.1's InferFiltersFromConstraints
    // substitutes a join-key alias into inferred constraints, and a
    // lambda inside the substituted expression mis-computes its attribute
    // references — the inferred filter then lands on the wrong join side
    // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at ConvertToLocalRelation).
    // A plain when-chain keeps references exact AND stays inside
    // whole-stage codegen; bounds stay <= a few hundred literals.
    val pid = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__rw_key").cast("double") > lit(b), 1).otherwise(0)
    }
    val grouped = keyed.withColumn("__rw_pid", pid)
    // O(parts) driver work: per-group counts (and sums), prefix-summed
    // into EXCLUSIVE offsets. Deterministic across this job and the main
    // pass because the bounds are literals.
    val aggs = Seq(count(lit(1)).as("__rw_n")) ++
      sumCol.map(c => sum(c.cast("long")).cast("long").as("__rw_s"))
    val perGroup = grouped.groupBy("__rw_pid").agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (sumCol.isDefined) r.getLong(2) else 0L))
      .sortBy(_._1)
    var nOff = 0L
    var sOff = 0L
    val offsets = perGroup.map { case (p, n, sTot) =>
      val row = (p, nOff, sOff)
      nOff += n; sOff += sTot
      row
    }
    // Offsets ship as a LITERAL map lookup, not a broadcast join: the
    // offset table is O(parts), so embedding it keeps the plan join-free
    // — the only non-map-side step in the whole helper is the one window
    // exchange PARTITIONED by group id.
    val noffMap: Map[Int, Long] =
      if (offsets.isEmpty) Map(0 -> 0L)
      else offsets.map { case (p, n, _) => p -> n }.toMap
    val soffMap: Map[Int, Long] =
      if (offsets.isEmpty) Map(0 -> 0L)
      else offsets.map { case (p, _, sO) => p -> sO }.toMap
    val order = (col("__rw_key") +: tieKeys).map(_.asc)
    val w = Window.partitionBy(col("__rw_pid")).orderBy(order: _*)
    val local = sumCol match {
      case Some(c) => element_at(typedLit(soffMap), col("__rw_pid")) +
        sum(c.cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      case None =>
        element_at(typedLit(noffMap), col("__rw_pid")) +
          row_number().over(w)
    }
    val out = grouped
      .withColumn(outCol, local.cast("long"))
      .drop("__rw_pid", "__rw_key")
    (out, nOff, sOff)
  }

  /** SQL-standard `ntile(buckets)` bucket id from an exact 1-based global
    * rank over `nRows` rows: the first `nRows % buckets` buckets take
    * `nRows/buckets + 1` rows, the rest `nRows/buckets` — identical to
    * Spark's and DuckDB's ntile. Driver-side `nRows` (from [[withRank]])
    * keeps the expression pure literals + one floor-div, map-side at any
    * cardinality. Double floor-div is exact here: correctly-rounded
    * division of <2^53 integers lands exactly on integral quotients.
    */
  def ntileFromRank(rank: Column, nRows: Long, buckets: Int): Column = {
    val q = nRows / buckets
    val r = nRows % buckets
    val cut = (q + 1) * r
    val big = floor((rank - 1) / lit((q + 1).toDouble)).cast("int") + 1
    if (q == 0) rank.cast("int")
    else when(rank <= cut, big)
      .otherwise(floor((rank - 1 - cut) / lit(q.toDouble)).cast("int") +
        r.toInt + 1)
  }
}
