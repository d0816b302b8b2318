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
  * Contract: each range key must be non-null and numeric, ascending
  * (negate for descending); tie keys must complete a total order. Plan
  * cost per spec: two extra parallel passes over `df` (sketch + group
  * counts) instead of the corpus-sized single-node sort — CALLERS RANKING
  * MORE THAN ONE DIMENSION of the same frame must use [[withRanks]] on a
  * PERSISTED input: chaining single-spec calls re-executes every upstream
  * level's window inside each later level's sketch/count actions (the
  * window_rfm_scores r10 regression: 3 chained levels ran the level-1
  * window 6 times, 0.44 s → 1.57 s).
  */
object RangeWindow {

  /** One ranking dimension over the shared frame: ascending numeric range
    * key, tie keys completing a total order, output rank column name. */
  final case class Spec(rangeKey: Column, tieKeys: Seq[Column],
      rankCol: String)

  /** `df` plus an exact global `row_number` over
    * `(rangeKey asc, tieKeys asc)` in `rankCol`; also returns the total
    * row count (free — it is the last prefix offset).
    */
  def withRank(df: DataFrame, rangeKey: Column, tieKeys: Seq[Column],
      parts: Int, rankCol: String): (DataFrame, Long) = {
    val (out, n, _) = build(df, Seq(Spec(rangeKey, tieKeys, rankCol)),
      parts, None)
    (out, n)
  }

  /** Exact global row_numbers for SEVERAL independent orderings of the
    * SAME frame in one output plan. Per spec: one sketch pass + one
    * O(parts) count aggregate against `df` (2·N actions total — persist
    * `df` first; the caller owns the persist lifecycle), then all N
    * windows chain on one frame, each partitioned by its own range
    * group. Returns the frame plus the total row count. */
  def withRanks(df: DataFrame, specs: Seq[Spec], parts: Int)
      : (DataFrame, Long) = {
    val (out, n, _) = build(df, specs, parts, None)
    (out, n)
  }

  /** `df` plus an exact global running long-sum of `sumCol` over
    * `(rangeKey asc, tieKeys asc)` in `cumCol` (ROWS UNBOUNDED PRECEDING
    * .. CURRENT ROW); also returns (total rows, grand total of `sumCol`).
    * `sumCol` must be integral — the per-group prefix totals stay exact
    * longs.
    */
  def withRunningSum(df: DataFrame, rangeKey: Column, tieKeys: Seq[Column],
      parts: Int, sumCol: Column, cumCol: String): (DataFrame, Long, Long) =
    build(df, Seq(Spec(rangeKey, tieKeys, cumCol)), parts, Some(sumCol))

  private def build(df: DataFrame, specs: Seq[Spec], parts: Int,
      sumCol: Option[Column]): (DataFrame, Long, Long) = {
    require(parts >= 1, s"parts must be >= 1, got $parts")
    require(specs.nonEmpty, "at least one spec")
    require(sumCol.isEmpty || specs.size == 1,
      "running sum supports exactly one spec")
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    def keyCol(i: Int) = s"__rw_key$i"
    def pidCol(i: Int) = s"__rw_pid$i"
    val keyed = specs.zipWithIndex.foldLeft(df) { case (acc, (spec, i)) =>
      acc.withColumn(keyCol(i), spec.rangeKey)
    }
    // Driver-side sketch → boundary literals, ONE multi-column
    // approxQuantile pass for every spec (per-spec passes dominated the
    // r10 rfm rebuild with job overhead). distinct+sorted because GK can
    // emit duplicate quantiles on heavy-tied keys; fewer bounds just
    // means fewer (larger) groups, never wrong output.
    val allBounds: Seq[Array[Double]] =
      if (parts == 1) specs.map(_ => Array.empty[Double])
      else keyed.stat
        .approxQuantile(specs.indices.map(keyCol).toArray, probs,
          1.0 / (4.0 * parts))
        .map(_.distinct.sorted).toSeq
    // Group id as a codegen'd when-chain, deliberately NOT a higher-order
    // filter(...) lambda: Spark 4.1's InferFiltersFromConstraints
    // substitutes a join-key alias into inferred constraints, and a
    // lambda inside the substituted expression mis-computes its attribute
    // references — the inferred filter then lands on the wrong join side
    // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at ConvertToLocalRelation).
    // A plain when-chain keeps references exact AND stays inside
    // whole-stage codegen; bounds stay <= a few hundred literals.
    def pidOf(i: Int, key: Column) = allBounds(i).foldLeft(lit(0)) {
      (acc, b) => acc + when(key.cast("double") > lit(b), 1).otherwise(0)
    }
    // O(specs · parts) driver work in ONE job: every spec's per-group
    // counts (and the single running-sum spec's per-group sums) via one
    // exploded (spec, group) aggregate, prefix-summed into EXCLUSIVE
    // offsets. Deterministic across this job and the main pass because
    // the bounds are literals.
    val pidStructs = specs.indices.map { i =>
      // coalesce: a group whose sumCol values are all NULL would produce
      // a NULL sql sum and NPE the driver-side getLong — NULLs count as
      // 0 here, matching the window's own null-skipping sum.
      struct(lit(i).as("si"), pidOf(i, col(keyCol(i))).as("pid"),
        coalesce(sumCol.getOrElse(lit(0L)).cast("long"), lit(0L)).as("sv"))
    }
    val perGroup = keyed
      .select(explode(array(pidStructs: _*)).as("g"))
      .groupBy(col("g.si"), col("g.pid"))
      .agg(count(lit(1)).as("__rw_n"), sum(col("g.sv")).as("__rw_s"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    var nTotal = 0L
    var sTotal = 0L
    // Offsets ship as a LITERAL map lookup, not a broadcast join: the
    // offset table is O(parts), so embedding it keeps the plan join-free
    // — the only non-map-side step per spec is the one window exchange
    // PARTITIONED by its group id.
    val out = specs.zipWithIndex.foldLeft(keyed) { case (acc, (spec, i)) =>
      var nOff = 0L
      var sOff = 0L
      val offsets = perGroup.getOrElse(i, Array.empty).sortBy(_._2).map {
        case (_, p, n, sTot) =>
          val row = (p, nOff, sOff)
          nOff += n; sOff += sTot
          row
      }
      nTotal = nOff
      sTotal = sOff
      val noffMap: Map[Int, Long] =
        if (offsets.isEmpty) Map(0 -> 0L)
        else offsets.map { case (p, n, _) => p -> n }.toMap
      val soffMap: Map[Int, Long] =
        if (offsets.isEmpty) Map(0 -> 0L)
        else offsets.map { case (p, _, sO) => p -> sO }.toMap
      val withPid = acc.withColumn(pidCol(i), pidOf(i, col(keyCol(i))))
      val order = (col(keyCol(i)) +: spec.tieKeys).map(_.asc)
      val w = Window.partitionBy(col(pidCol(i))).orderBy(order: _*)
      // Loud contract enforcement (r10 ADVICE): the offsets map was built
      // from the count job over THIS frame. If the deterministic-input /
      // persisted contract is broken (an unpersisted nondeterministic
      // frame recomputed between the two passes), a row can compute a pid
      // the map never saw; element_at would return NULL and ranks would
      // silently go NULL downstream. Fail the task instead.
      def offAt(m: Map[Int, Long]): Column = coalesce(
        element_at(typedLit(m), col(pidCol(i))),
        raise_error(concat(
          lit(s"RangeWindow: group id for spec '${spec.rankCol}' = "),
          col(pidCol(i)).cast("string"),
          lit(" is absent from the offsets map — the input frame changed " +
            "between the count job and the main pass (nondeterministic " +
            "unpersisted input violates the RangeWindow contract)")))
          .cast("long"))
      val local = sumCol match {
        case Some(c) => offAt(soffMap) +
          sum(coalesce(c.cast("long"), lit(0L))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        case None =>
          offAt(noffMap) + row_number().over(w)
      }
      withPid
        .withColumn(spec.rankCol, local.cast("long"))
        .drop(pidCol(i), keyCol(i))
    }
    (out, nTotal, sTotal)
  }

  /** SQL-standard `ntile(buckets)` bucket id from an exact 1-based global
    * rank over `nRows` rows: the first `nRows % buckets` buckets take
    * `nRows/buckets + 1` rows, the rest `nRows/buckets` — identical to
    * Spark's and DuckDB's ntile. Driver-side `nRows` (from [[withRank]])
    * keeps the expression pure literals + one floor-div, map-side at any
    * cardinality.
    *
    * The floor-div is PURE LONG arithmetic (`(x - x mod b) / b`: the
    * numerator is exactly divisible, so the one double division lands on
    * an integral quotient < 2^53, which doubles represent exactly). A
    * plain `floor(x / b)` over doubles would be exact for every
    * realistic frame but has a theoretical floor-boundary hazard when
    * `1/b` shrinks below half an ulp of the quotient (b approaching
    * 2^53-scale group sizes) — integer form costs nothing and removes
    * the caveat. */
  def ntileFromRank(rank: Column, nRows: Long, buckets: Int): Column = {
    val q = nRows / buckets
    val r = nRows % buckets
    val cut = (q + 1) * r
    def longDiv(x: Column, b: Long): Column =
      ((x - pmod(x, lit(b))) / lit(b)).cast("long")
    if (q == 0) rank.cast("int")
    else when(rank <= cut,
        (longDiv(rank - 1, q + 1) + 1).cast("int"))
      .otherwise((longDiv(rank - 1 - cut, q) + r + 1).cast("int"))
  }
}
