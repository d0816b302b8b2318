package graft

import org.scalacheck.Gen
import graft.ml.ConnectedComponents

/** Connected components vs a brute-force union-find model: fixed shapes
  * (chain, star, cycle, disjoint cliques) plus seeded random graphs. */
class CcSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  /** Brute-force model: repeated relaxation over an edge list. */
  private def model(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var lab = verts.map(v => v -> v).toMap
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (a, b) =>
        val m = math.min(lab(a), lab(b))
        if (lab(a) != m || lab(b) != m) {
          lab = lab + (a -> m) + (b -> m); changed = true
        }
      }
    }
    lab
  }

  test("chain, star, cycle, disjoint cliques resolve to min-id labels") {
    // chain 1-2-3-4-5 (diameter > 1 forces multiple rounds)
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
      === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // star + separate cycle + isolated edge
    val g = Seq((10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (22L, 20L), (30L, 31L))
    assert(cc(g) === model(g))
  }

  test("non-convergence within maxIter throws by default, warns when opted out") {
    // chain of diameter 9 cannot converge in 2 rounds
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.run(chain, maxIter = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
    // opt-out path returns (possibly split) labels without throwing
    val labels = ConnectedComponents
      .run(chain, maxIter = 2, failOnNonConvergence = false)
      .as[(Long, Long)].collect().toMap
    assert(labels.size === 10)
    // and the default converges fine when maxIter covers the diameter
    assert(ConnectedComponents.run(chain).as[(Long, Long)].collect().toMap
      === (1L to 10L).map(_ -> 1L).toMap)
  }

  test("random graphs match the union-find model") {
    val edgeGen = for {
      a <- Gen.choose(0L, 29L); b <- Gen.choose(0L, 29L) if a != b
    } yield (a, b)
    val graphGen = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, edgeGen))
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(7L)
    (0 until 12).foreach { _ =>
      graphGen.apply(params, seed).foreach { edges =>
        assert(cc(edges) === model(edges), s"graph $edges")
      }
      seed = seed.next
    }
  }
}
