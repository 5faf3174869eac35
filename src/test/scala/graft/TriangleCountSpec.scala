package graft

import graft.operators.TriangleCount
import org.scalatest.funsuite.AnyFunSuite

/** The degree-ordered wedge join must count triangles exactly — checked
  * against hand-counted structures and a brute-force O(n³) enumeration on a
  * deterministic random graph, plus input-hygiene cases (duplicate edges,
  * reversed duplicates, self-loops). */
class TriangleCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val r = TriangleCount.census(edges.toDF("u", "v")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private def bruteTriangles(edges: Seq[(Long, Long)]): Long = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && canon((a, b))
      c <- nodes if b < c && canon((b, c)) && canon((a, c))
    } yield 1).size.toLong
  }

  test("hand graphs: triangle, square, K4, star") {
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == ((3L, 3L, 1L, 1L)))
    // square: 4 edges, no triangle; exactly one wedge survives orientation
    // per apex pair but none closes
    val sq = census(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(sq._1 == 4L && sq._2 == 4L && sq._4 == 0L)
    // K4: C(4,3) = 4 triangles
    val k4 = census(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(k4._2 == 6L && k4._4 == 4L)
    // star: hub with 5 leaves — zero triangles, and the orientation must
    // point every edge INTO the hub (leaves have degree 1), so zero wedges:
    // the naive apex-at-hub formulation would pay C(5,2).
    val star = census(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (10L, 5L)))
    assert(star == ((6L, 5L, 0L, 0L)))
  }

  test("duplicate / reversed / self-loop edges are canonicalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(census(messy) == ((3L, 3L, 1L, 1L)))
  }

  test("deterministic random graph matches brute force") {
    val rng = new scala.util.Random(7)
    val n = 40
    val edges = (0 until 260).map { _ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
    }
    val (_, nEdges, _, nTri) = census(edges)
    assert(nTri == bruteTriangles(edges))
    assert(nEdges > 100, "graph dense enough to be a real check")
    assert(nTri > 10, s"triangle count $nTri too small to be a real check")
  }
}
