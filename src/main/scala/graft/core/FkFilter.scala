package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Foreign-key violation filtering (SURVEY.md §2.4 J2; reference
  * src/_utils/data_preparation.py:76-159), the guard every ingest task
  * runs before its upsert. Faithful semantics:
  *
  *  - a row with a NULL FK value is KEPT (the null-reference escape);
  *  - a self-referencing FK also accepts keys present in the incoming
  *    batch itself (the reference appends incoming keys to the lookup);
  *  - dropped rows are counted per constraint and surfaced to an optional
  *    handler (the metrics/log sink);
  *  - if after a constraint NO row at all survives (null-FK escapees count
  *    as survivors, matching the reference's `valid_values.empty` check —
  *    its per-row 'Null reference' branch keeps them), the batch aborts —
  *    "all data has been skipped, something is fishy".
  *
  * Plan shape at scale: one broadcast left-join per FK against the
  * referenced table's distinct key projection (the reference instead ran
  * a full-table SELECT per constraint into the driver). Key sets of
  * dimension tables broadcast; the incoming fact never collects.
  *
  * Cost shape: each constraint persists its marked frame once and derives
  * all three counts (non-null total, kept, null-escape) from ONE
  * aggregation over it, so the chain is linear — no repeated recompute of
  * prior constraints' joins per count action, and the counted rows are
  * exactly the rows returned even under a nondeterministic source. The
  * previous iteration's cache is dropped as soon as the next constraint
  * materializes on top of it; the final frame is unpersisted on return
  * (the caller's single materialization then re-runs the chain once —
  * same cost as an uncached single-pass pipeline, nothing left resident).
  */
object FkFilter {

  /** One FK constraint: incoming `columns` must exist in
    * `refTable(refColumns)` (or be NULL). */
  final case class Fk(columns: Seq[String], refName: String,
      refTable: DataFrame, refColumns: Seq[String],
      selfReferencing: Boolean = false)

  final case class Dropped(constraint: String, nDropped: Long)

  /** Apply all constraints in order; returns the surviving rows and the
    * per-constraint drop counts. */
  def filter(incoming: DataFrame, fks: Seq[Fk],
      onDropped: Dropped => Unit = _ => ()): DataFrame = {
    var prevCached: Option[DataFrame] = None
    val out = fks.foldLeft(incoming) { (df, fk) =>
      val refKeys0 = fk.refTable
        .select(fk.refColumns.map(col): _*).toDF(fk.columns: _*).distinct()
      val refKeys =
        if (fk.selfReferencing)
          refKeys0.unionByName(df.select(fk.columns.map(col): _*).distinct())
            .distinct()
        else refKeys0
      val anyNull = fk.columns.map(col(_).isNull).reduce(_ || _)
      // Left join against the (distinct, broadcast) key set with a hit
      // marker: one persisted frame yields the survivors AND every count
      // in a single aggregation pass.
      val marked = df.join(
          broadcast(refKeys.withColumn("__fk_hit", lit(true))),
          fk.columns, "left")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val counts = marked.agg(
        count(when(!anyNull, 1)).as("non_null"),
        count(when(!anyNull && col("__fk_hit"), 1)).as("kept"),
        count(when(anyNull, 1)).as("null_escape")).head()
      prevCached.foreach(_.unpersist())
      prevCached = Some(marked)
      val (total, keptN, nullN) =
        (counts.getLong(0), counts.getLong(1), counts.getLong(2))
      val droppedN = total - keptN
      if (droppedN > 0) {
        onDropped(Dropped(s"${fk.columns.mkString(",")} -> ${fk.refName}", droppedN))
        if (keptN == 0 && nullN == 0)
          throw new IllegalStateException(
            s"All values have been discarded due to foreign key violation: " +
              s"${fk.columns.mkString(",")} -> ${fk.refName}")
      }
      marked.filter(anyNull || col("__fk_hit")).drop("__fk_hit")
    }
    prevCached.foreach(_.unpersist())
    out
  }

  /** The `ON UPDATE CASCADE` rewrite (SURVEY.md §7.4; reference
    * scrape_gomus.py:229-256): customer ids discovered to have changed are
    * remapped in every referencing table via one broadcast join —
    * `remap` rows are (oldId, newId); unmatched rows pass through. */
  def remapIds(table: DataFrame, idColumn: String,
      remap: DataFrame): DataFrame = {
    val m = broadcast(remap.toDF("__old", "__new"))
    table.join(m, table(idColumn) === col("__old"), "left")
      .withColumn(idColumn, coalesce(col("__new"), col(idColumn)))
      .drop("__old", "__new")
  }
}
