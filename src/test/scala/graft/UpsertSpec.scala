package graft

import java.nio.file.Files
import graft.core.Upsert

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("merge: incoming wins PK conflicts, existing survivors kept") {
    val existing = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val incoming = Seq((2, "B2"), (4, "d")).toDF("id", "v")
    val merged = Upsert.merge(existing, incoming, Seq("id"))
      .as[(Int, String)].collect().sortBy(_._1)
    assert(merged.toSeq === Seq((1, "a"), (2, "B2"), (3, "c"), (4, "d")))
  }

  test("merge with composite PK") {
    val existing = Seq((1, "x", 10), (1, "y", 20)).toDF("k1", "k2", "v")
    val incoming = Seq((1, "y", 99)).toDF("k1", "k2", "v")
    val merged = Upsert.merge(existing, incoming, Seq("k1", "k2"))
      .as[(Int, String, Int)].collect().sortBy(r => (r._1, r._2))
    assert(merged.toSeq === Seq((1, "x", 10), (1, "y", 99)))
  }

  test("upsertWrite: creates, merges, swaps atomically; replaceWrite overwrites") {
    val dir = Files.createTempDirectory("graft-upsert").toString
    val table = s"$dir/t"
    Upsert.upsertWrite(spark, table, Seq((1, "a"), (2, "b")).toDF("id", "v"), Seq("id"))
    Upsert.upsertWrite(spark, table, Seq((2, "B2"), (3, "c")).toDF("id", "v"), Seq("id"))
    val after = spark.read.parquet(table).as[(Int, String)].collect().sortBy(_._1)
    assert(after.toSeq === Seq((1, "a"), (2, "B2"), (3, "c")))
    Upsert.replaceWrite(spark, table, Seq((9, "z")).toDF("id", "v"))
    val replaced = spark.read.parquet(table).as[(Int, String)].collect()
    assert(replaced.toSeq === Seq((9, "z")))
  }
}
