package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mint a larger scale-factor copy of the driver's test tables by
  * unioning K re-keyed copies of the sf0.1 facts (docs/SCALE.md's
  * measured scale curve uses K=10 → "sf1").
  *
  * - Dimension tables (region/nation/customer/supplier/part) copy
  *   through unchanged — at 100 TB the dims stay broadcast-sized, so
  *   growing them would distort the join shapes being measured.
  * - Fact tables (orders/lineitem/events/documents/embeddings) get K
  *   copies with primary keys shifted by copy*1e9 so keys stay unique;
  *   fact-to-fact keys (l_orderkey) shift with their parent so join
  *   cardinality per key is preserved. Dim FKs (o_custkey, l_partkey,
  *   l_suppkey) are left alone: each customer simply has K× orders,
  *   which is exactly what a bigger fact against a fixed dim looks like.
  * - Payload columns (text, embedding) are NOT perturbed: copy k of a
  *   document is content-identical to copy 0, so every LSH/SimHash/
  *   Jaccard bucket gets K× denser. That is deliberate — it stress-tests
  *   the per-bucket probe caps that keep near-dup candidate generation
  *   linear (a cap-less implementation would go quadratic here).
  *
  * SKEW MODE (`--skew` or `--skew=<alpha>`, default alpha 1.2): the
  * uniform re-key above leaves every dim FK uniformly loaded, so no
  * artifact ever showed a plan surviving a HOT key. With --skew the dim
  * FKs are redrawn from a Zipf(alpha) law over the full dim-key domain
  * (`o_custkey` over the 15k customers, `events.user_id` over its user
  * domain) via the truncated-Pareto inverse CDF
  * `rank = (1 + u·(N^(1-a) - 1))^(1/(1-a))`, with `u` a deterministic
  * hash of the row's primary key — at alpha 1.2 the hottest customer
  * takes ~15% of ALL orders (a genuinely pathological partition under a
  * key-hash shuffle). Row counts, primary keys and payloads are
  * untouched, so the DuckDB oracle gate runs on the skewed dir
  * unchanged — correctness and skew survival are checked on the SAME
  * artifact. SkewJoinSpec asserts AQE's OptimizeSkewedJoin actually
  * splits these partitions; docs/SCALE.md carries the measured
  * uniform-vs-skew table.
  *
  * Usage: runMain graft.MintScale <srcDir> <outDir> [K=10] [--skew[=a]]
  */
object MintScale {
  private val KeyOffset = 1000000000L

  /** Deterministic Zipf(s)-distributed rank in [0, n) drawn from a hash
    * of `idCol` — truncated-Pareto inverse CDF, closed-form, so the
    * minted parquet is reproducible and oracle-friendly. */
  def zipfKey(idCol: Column, n: Long, s: Double): Column = {
    val m = 1000000007L
    val u = (pmod(xxhash64(idCol), lit(m)).cast("double") + 0.5) / m.toDouble
    val t = lit(1.0) + u * (pow(lit(n.toDouble), lit(1.0 - s)) - lit(1.0))
    least(lit(n - 1), greatest(lit(0L),
      (floor(pow(t, lit(1.0 / (1.0 - s)))).cast("long") - 1L)))
  }

  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--"))
    val pos = args.filterNot(_.startsWith("--"))
    val skew: Option[Double] = flags.collectFirst {
      case f if f.startsWith("--skew") =>
        f.split("=").lift(1).map(_.toDouble).getOrElse(1.2)
    }
    val src = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val out = pos.lift(1).getOrElse("/tmp/sf1")
    val k = pos.lift(2).map(_.toInt).getOrElse(if (skew.isDefined) 1 else 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rekey: Map[String, Seq[String]] = Map(
      "orders" -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey"),
      "events" -> Seq("event_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    def copies(df: DataFrame, keys: Seq[String]): DataFrame =
      (0 until k).map { c =>
        keys.foldLeft(df)((d, key) =>
          d.withColumn(key, col(key) + lit(c.toLong * KeyOffset)))
      }.reduce(_.unionAll(_))

    graft.core.Tables.names.foreach { name =>
      val base =
        if (name == "events") graft.core.Tables.events(spark, src)
        else graft.core.Tables.load(spark, src, name)
      val scaled0 = rekey.get(name) match {
        case Some(keys) =>
          // Repartition so the output lands as multiple row groups —
          // the measured dir should scan in parallel like a production
          // table, not serialize on one K-file-concat row group.
          copies(base, keys).repartition(cpus.toInt)
        case None => base
      }
      // Skew mode: redraw the dim FKs Zipf(alpha) over their domain.
      val scaled = skew match {
        case Some(a) if name == "orders" =>
          val n = graft.core.Tables.load(spark, src, "customer").count()
          scaled0.withColumn("o_custkey", zipfKey(col("o_orderkey"), n, a))
        case Some(a) if name == "events" =>
          val n = base.agg(max(col("user_id"))).head().getLong(0) + 1
          scaled0.withColumn("user_id", zipfKey(col("event_id"), n, a))
        case _ => scaled0
      }
      scaled.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[mint] $name -> $out/$name.parquet" +
        (if (rekey.contains(name)) s" (x$k)" else " (dim copy)"))
    }
    spark.stop()
  }
}
