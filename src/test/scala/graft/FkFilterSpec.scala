package graft

import scala.collection.mutable

import graft.core.FkFilter
import graft.core.FkFilter.{Dropped, Fk}

class FkFilterSpec extends SparkSpec {
  import spark.implicits._

  test("violations dropped with metrics, null FKs escape, valid rows kept") {
    val ref = Seq(1, 2).toDF("id")
    val incoming = Seq(
      (10, Some(1)), (11, Some(2)), (12, Some(99)), (13, None))
      .toDF("row_id", "cust")
    val drops = mutable.Buffer[Dropped]()
    val out = FkFilter.filter(incoming,
        Seq(Fk(Seq("cust"), "customer", ref, Seq("id"))), drops.append(_))
      .select("row_id").as[Int].collect().sorted
    assert(out.toSeq === Seq(10, 11, 13)) // 12 dropped, 13 null-escapes
    assert(drops.toSeq === Seq(Dropped("cust -> customer", 1)))
  }

  test("self-referencing FK accepts keys from the incoming batch") {
    val existing = Seq(1).toDF("id")
    // 21 references 20, which only exists in this batch.
    val incoming = Seq((20, Some(1)), (21, Some(20)))
      .toDF("id", "parent")
    val out = FkFilter.filter(incoming,
        Seq(Fk(Seq("parent"), "self", existing.toDF("parent"), Seq("parent"))))
      .select("id").as[Int].collect().sorted
    // Without self-reference support, 21 would be dropped.
    val outSelf = FkFilter.filter(incoming,
        Seq(Fk(Seq("parent"), "self",
          incoming.select($"id".as("parent")), Seq("parent"),
          selfReferencing = true)))
      .select("id").as[Int].collect().sorted
    assert(out.toSeq === Seq(20))
    assert(outSelf.toSeq === Seq(20, 21))
  }

  test("does not abort when only null-FK rows survive (reference parity)") {
    // Reference raises only when the ENTIRE surviving set is empty —
    // null-FK escapees count as valid there ('Null reference' branch).
    val ref = Seq(1).toDF("id")
    val incoming = Seq((10, Some(99)), (11, None), (12, None))
      .toDF("row_id", "cust")
    val drops = mutable.Buffer[Dropped]()
    val out = FkFilter.filter(incoming,
        Seq(Fk(Seq("cust"), "customer", ref, Seq("id"))), drops.append(_))
      .select("row_id").as[Int].collect().sorted
    assert(out.toSeq === Seq(11, 12))
    assert(drops.toSeq === Seq(Dropped("cust -> customer", 1)))
  }

  test("aborts when a constraint discards every row") {
    val ref = Seq(1).toDF("id")
    val incoming = Seq((10, 99), (11, 98)).toDF("row_id", "cust")
    val e = intercept[IllegalStateException] {
      FkFilter.filter(incoming, Seq(Fk(Seq("cust"), "customer", ref, Seq("id"))))
        .count()
    }
    assert(e.getMessage.contains("All values have been discarded"))
  }

  test("remapIds rewrites matched ids, passes others through") {
    val orders = Seq((1, 100), (2, 200), (3, 300)).toDF("oid", "customer_id")
    val remap = Seq((200, 999)).toDF("old", "new")
    val out = FkFilter.remapIds(orders, "customer_id", remap)
      .as[(Int, Int)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1, 100), (2, 999), (3, 300)))
  }
}
