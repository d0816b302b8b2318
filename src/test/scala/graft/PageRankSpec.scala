package graft

import graft.ml.PageRank

/** Integer-exact PageRank vs an independent plain-Scala model, plus
  * partitioning invariance and structural sanity (hubs outrank leaves).
  */
class PageRankSpec extends SparkSpec {

  /** Reference model: same integer arithmetic, adjacency-map form. */
  private def model(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map { case (s, _) => 85L * r(s) / (100L * deg(s)) }.sum
      }
      r = nodes.map(n => n -> (150000L + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst").repartition(parts)
    PageRank.run(df, iters).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the independent model exactly on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val expected = model(edges, 8)
    for (parts <- Seq(1, 5)) {
      assert(run(edges, 8, parts) == expected, s"parts=$parts")
    }
  }

  test("star graph: the hub outranks every leaf; leaves tie") {
    val edges = (1L to 9L).map(i => (i, 0L))
    val got = run(edges, 8, 3)
    val hub = got(0L)
    val leaves = (1L to 9L).map(got)
    assert(leaves.toSet.size == 1, "leaves must tie exactly")
    assert(hub > leaves.head * 5, s"hub $hub vs leaf ${leaves.head}")
    // leaves have no in-edges: rank = pure teleport base
    assert(leaves.head == 150000L)
    assert(got == model(edges, 8))
  }

  test("dangling mass is dropped, not redistributed (engine contract)") {
    // 1 -> 2, 2 has no out-edges; node 2's rank never flows anywhere
    val edges = Seq((1L, 2L))
    val got = run(edges, 3, 1)
    assert(got(1L) == 150000L) // no in-edges after iter 1
    assert(got == model(edges, 3))
  }
}
