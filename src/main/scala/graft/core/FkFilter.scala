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
  *  - if a constraint discards EVERY non-empty incoming row, the batch
  *    aborts — "all data has been skipped, something is fishy".
  *
  * Plan shape at scale: one broadcast left-join per FK against the
  * referenced table's distinct key projection (the reference instead ran
  * a full-table SELECT per constraint into the driver). Key sets of
  * dimension tables broadcast; the incoming fact never collects.
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
    fks.foldLeft(incoming) { (df, fk) =>
      val refKeys0 = fk.refTable
        .select(fk.refColumns.map(col): _*).toDF(fk.columns: _*).distinct()
      val refKeys =
        if (fk.selfReferencing)
          refKeys0.unionByName(df.select(fk.columns.map(col): _*).distinct())
            .distinct()
        else refKeys0
      val anyNull = fk.columns.map(col(_).isNull).reduce(_ || _)
      val nullEscape = df.filter(anyNull)
      val nonNull = df.filter(!anyNull)
      val kept = nonNull.join(broadcast(refKeys), fk.columns, "left_semi")
      val total = nonNull.count()
      val keptN = kept.count()
      val droppedN = total - keptN
      if (droppedN > 0) {
        onDropped(Dropped(s"${fk.columns.mkString(",")} -> ${fk.refName}", droppedN))
        if (keptN == 0 && total > 0)
          throw new IllegalStateException(
            s"All values have been discarded due to foreign key violation: " +
              s"${fk.columns.mkString(",")} -> ${fk.refName}")
      }
      kept.unionByName(nullEscape)
    }
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
