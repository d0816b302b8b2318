package graft

import graft.queries.Catalog

/** Executes EVERY catalog query with whole-stage-codegen fallback
  * DISABLED (`spark.sql.codegen.fallback=false`).
  *
  * A generated class that fails to compile (Janino's 64 KB method
  * limit, constant-pool overflow) normally demotes the stage to
  * INTERPRETED evaluation with nothing but a log line — results stay
  * correct while a corpus-sized stage quietly runs ~10-100× slower at
  * scale. The ×10 gate caught exactly that on the N7 band-key stage
  * (1,024 inline mul-add terms in one Project; fixed by the compiled
  * `band_keys_l` kernel — SCALE.md §whole-stage-codegen-guard). This
  * sweep makes the failure loud forever: with fallback off, a compile
  * failure throws instead of demoting, so a config-scaled expression
  * chain cannot re-enter the catalog unnoticed.
  *
  * Execution (not just planning) is required — codegen compiles lazily
  * at first execute. sf0.001 keeps the sweep to ~2-4 min; the noop sink
  * forces the full plan like Bench does.
  */
class CodegenStrictSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every catalog query executes with codegen fallback disabled") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val failures = Catalog.all.flatMap { q =>
        val r =
          try {
            q.spark(spark, dir).write.format("noop").mode("overwrite").save()
            None
          } catch {
            case e: Throwable =>
              Some(q.name -> e.toString.linesIterator.take(3).mkString(" "))
          }
        graft.core.CacheLedger.release()
        r
      }
      assert(failures.isEmpty,
        s"${failures.size} queries cannot run without codegen fallback " +
          "(a generated class failed to compile — move the offending " +
          "expression chain into a compiled kernel):\n" +
          failures.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
