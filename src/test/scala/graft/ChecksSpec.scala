package graft

import graft.core.Checks

/** CHECK-constraint filter-with-metric (SURVEY §1.2): PG 3VL pass rules
  * and the violation counter. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("violating rows drop and count; NULL passes like PG CHECK") {
    val df = Seq(
      (1, Some(0.5)), (2, Some(1.5)), (3, None),
      (4, Some(-0.3)), (5, Some(-2.0)))
      .toDF("id", "weight")
    // migration_028.sql:10: weight BETWEEN -1 AND 1
    val checked = Checks.enforce(df,
      col("weight").between(-1.0, 1.0), "weight_bounds")
    val kept = checked.df.select("id").as[Int].collect().sorted
    assert(kept.toSeq === Seq(1, 3, 4)) // NULL weight passes (PG 3VL)
    assert(checked.violations.value === 2L)

    // strict form: NULL counts as violation
    val strict = Checks.enforce(df,
      col("weight").between(-1.0, 1.0), "weight_strict", nullPasses = false)
    assert(strict.df.select("id").as[Int].collect().sorted.toSeq
      === Seq(1, 4))
    assert(strict.violations.value === 3L)
  }

  test("capacity identity check: max - sold - reserved = available") {
    // migration_052.sql:21
    val df = Seq((10, 3, 2, 5), (10, 3, 2, 4)).toDF(
      "max", "sold", "reserved", "available")
    val checked = Checks.enforce(df,
      col("max") - col("sold") - col("reserved") === col("available"),
      "capacity_identity")
    assert(checked.df.count() === 1L)
    assert(checked.violations.value === 1L)
  }
}
