package graft

import org.apache.spark.sql.types._
import graft.core.Tables

/** Fixture-schema guard: the driver re-mints `/root/testdata` between
  * rounds and has already changed timestamp encodings twice
  * (TIMESTAMP(NANOS) → TIMESTAMP_MICROS NTZ). Every encoding drift must
  * fail HERE, in one named test, instead of as collateral damage across
  * the catalog/plan/streaming suites. The contract under test is
  * [[graft.core.Tables]]'s normalized surface, not the raw parquet bytes:
  * whatever the mint wrote, consumers must see TimestampType.
  */
class FixtureSchemaSpec extends SparkSpec {
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("events.ts surfaces as TimestampType in every test sf dir") {
    for (dir <- sfDirs) {
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt === TimestampType,
        s"$dir/events.parquet ts surfaced as $dt — extend Tables.events/normalizeNtz")
    }
  }

  test("events key columns are non-null (typed-fold Dataset contract)") {
    // ml_hmm_viterbi / pipe_rate_limit decode (user_id, ts, event_id)
    // into primitive Longs (flatMapSortedGroups) — a NULL there fails
    // the query loudly. Pin the contract at the fixture boundary so a
    // null-introducing re-mint fails HERE with a named column.
    for (dir <- sfDirs) {
      val ev = Tables.events(spark, dir)
      val nulls = ev.selectExpr(
        "sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS user_id",
        "sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS ts",
        "sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS event_id")
        .collect()(0)
      for (i <- 0 until 3)
        assert(nulls.getLong(i) === 0L,
          s"$dir/events.parquet has NULLs in ${nulls.schema(i).name}")
    }
  }

  test("all loaded timestamp columns are TimestampType (no NTZ leaks)") {
    for (dir <- sfDirs; name <- Tables.names) {
      val df = if (name == "events") Tables.events(spark, dir)
               else Tables.load(spark, dir, name)
      val leaks = df.schema.fields.collect {
        case f if f.dataType == TimestampNTZType || f.dataType == LongType &&
            Seq("ts", "o_orderdate", "l_shipdate").contains(f.name) =>
          s"${f.name}: ${f.dataType}"
      }
      assert(leaks.isEmpty, s"$dir/$name.parquet leaks raw encodings: ${leaks.mkString(", ")}")
    }
  }

  test("key fixture columns keep their contracted types") {
    val dir = sfDirs.head
    val docs = Tables.load(spark, dir, "documents")
    assert(docs.schema("text").dataType === StringType)
    Tables.load(spark, dir, "embeddings").schema("embedding").dataType match {
      case ArrayType(FloatType, _) => // contracted element type
      case other => fail(s"embeddings.embedding surfaced as $other, expected array<float>")
    }
  }
}
