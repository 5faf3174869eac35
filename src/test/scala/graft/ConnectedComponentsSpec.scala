package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** The CC fixpoint must equal a reference union-find on arbitrary shapes:
  * long chains (forcing multiple propagation rounds and exercising path
  * compression), stars, isolated nodes, and cycles. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def unionFind(n: Seq[Long], e: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    e.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  // threshold 0 forces the distributed propagation path; the default takes
  // the driver union-find path — both must reach the same fixpoint.
  private val paths = Seq("local" -> (1L << 20), "distributed" -> 0L)

  test("chain + star + cycle + isolates match union-find (both paths)") {
    import spark.implicits._
    val nodes = (0L to 30L)
    // chain 0..9, star centered 20, triangle 11-12-13, isolates elsewhere
    val edges = (0L to 8L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (20L, 22L), (20L, 23L), (24L, 20L)) ++
      Seq((11L, 12L), (12L, 13L), (13L, 11L))
    val expected = unionFind(nodes, edges)
    for ((name, threshold) <- paths) {
      val got = ConnectedComponents
        .run(nodes.toDF("id"), edges.toDF("src", "dst"),
          localEdgeThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"path=$name")
    }
  }

  test("labels are the component minimum and cover every node (both paths)") {
    import spark.implicits._
    // two components whose min ids arrive only through multi-hop paths
    val edges = Seq((5L, 9L), (9L, 2L), (7L, 8L), (8L, 6L), (6L, 1L))
    val nodes = Seq(1L, 2L, 5L, 6L, 7L, 8L, 9L, 42L)
    val expected = Map(5L -> 2L, 9L -> 2L, 2L -> 2L,
      7L -> 1L, 8L -> 1L, 6L -> 1L, 1L -> 1L, 42L -> 42L)
    for ((name, threshold) <- paths) {
      val got = ConnectedComponents
        .run(nodes.toDF("id"), edges.toDF("src", "dst"),
          localEdgeThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"path=$name")
    }
  }
}
