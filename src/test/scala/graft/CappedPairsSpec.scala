package graft

import org.apache.spark.sql.functions._

/** `TopK.pairsPerKey` (r15) fuses the per-key probe cap and the
  * within-group pair enumeration that replaced the capped LSH
  * self-joins. This spec pins row-for-row equality against the exact
  * form it replaced — TopKPerKey cap followed by a self-join on the
  * keys with an `<` id predicate — including the edge cases where a
  * naive grouping would diverge from an equi-join: null keys (joins
  * drop them), singleton groups (no pairs), payload columns carried per
  * side, multi-column keys, and a selection order DIFFERENT from the
  * pair-id order (the coEdges shape: top-by-count, pair-by-id).
  */
class CappedPairsSpec extends SparkSpec {
  import spark.implicits._

  test("fused pairs equal TopK cap + self-join, payload carried") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(400) { i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(5).toLong,
        rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("id", "k1", "k2", "payload")
    val capped = graft.plans.TopK.perKey(
      df, Seq("k1", "k2"), Seq(("id", true)), 8)
    val viaJoin = capped.as("a").join(capped.as("b"),
        col("a.k1") === col("b.k1") && col("a.k2") === col("b.k2") &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), col("a.payload"), col("b.payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq

    val viaPairs = graft.plans.TopK.pairsPerKey(df, Seq("k1", "k2"),
        Seq(("id", true)), Seq("id", "payload"), 8)
      .select(col("x_id"), col("y_id"), col("x_payload"), col("y_payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq

    assert(viaPairs.nonEmpty, "fixture must generate pairs")
    assert(viaPairs == viaJoin)
  }

  test("selection order may differ from the pair-id order (coEdges shape)") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(300) { i =>
      (i.toLong, rnd.nextInt(9).toLong, rnd.nextInt(50).toLong)
    }
    val df = rows.toDF("u", "k", "n")
    // reference: row_number window capped at 4 by (n desc, u asc), then
    // self-join pairing by u — the old coEdges form
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("n").desc, col("u").asc)
    val top = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 4).select("k", "u")
    val viaJoin = top.as("x").join(top.as("y"),
        col("x.k") === col("y.k") && col("x.u") < col("y.u"))
      .select(col("x.u"), col("y.u"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaPairs = graft.plans.TopK.pairsPerKey(df, Seq("k"),
        Seq(("n", false), ("u", true)), Seq("u"), 4)
      .select(col("x_u"), col("y_u"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaPairs.nonEmpty)
    assert(viaPairs == viaJoin)
  }

  test("null keys are dropped exactly like the equi-join drops them") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, 10L), (3L, null), (4L, null), (5L, 20L))
      .toDF("id", "k")
    val viaPairs = graft.plans.TopK.pairsPerKey(df, Seq("k"),
        Seq(("id", true)), Seq("id"), 8)
      .select(col("x_id"), col("y_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaPairs == Seq((1L, 2L)))
  }

  test("singleton groups produce no pairs; cap binds like the window cap") {
    val df = (Seq((100L, 7L)) ++ Seq.tabulate(10)(i => (i.toLong, 1L)))
      .toDF("id", "k")
    val pairs = graft.plans.TopK.pairsPerKey(df, Seq("k"),
        Seq(("id", true)), Seq("id"), 3)
      .select(col("x_id"), col("y_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // k=7 group is a singleton -> nothing; k=1 group capped to ids 0,1,2
    assert(pairs == Seq((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("one exchange total: the pair stage sits on the cap's shuffle") {
    val df = Seq.tabulate(100)(i => (i.toLong, (i % 7).toLong))
      .toDF("id", "k")
    val plan = graft.plans.TopK.pairsPerKey(df, Seq("k"),
        Seq(("id", true)), Seq("id"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
    assert(plan.contains("TopKPairsExec") || plan.contains("TopKPairs"), plan)
  }
}
