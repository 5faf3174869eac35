package graft

import graft.operators.PageRankInt
import org.scalatest.funsuite.AnyFunSuite

/** PageRankInt against a plain-Scala reference implementing the same
  * integer contract (ppb scaling, floor division at each stage, parallel
  * edges as weight, dropped dangling mass). */
class PageRankIntSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (15L * 1000000000L / 100L) / n
    var r = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to iters) {
      val acc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (u, v) => acc(v) += r(u) / outdeg(u) }
      r = nodes.map(v => v -> (base + (85L * acc(v)) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Unit = {
    import spark.implicits._
    val got = PageRankInt.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(edges, iters))
  }

  test("hub graph: rank concentrates on the hub, exact integers match") {
    // star: everyone links the hub, hub links node 1; plus a parallel edge
    val edges = (2L to 10L).map(i => i -> 1L) ++ Seq(1L -> 2L, 3L -> 1L)
    run(edges, 3)
    val r = reference(edges, 3)
    assert(r(1L) > r(5L), "hub must outrank a leaf")
  }

  test("random multigraphs match the reference (3 seeds, 1-4 iterations)") {
    for (seed <- Seq(5, 17, 99); iters <- Seq(1, 4)) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(60)((rng.nextInt(12).toLong, rng.nextInt(12).toLong))
        .filter { case (a, b) => a != b }
      run(edges, iters)
    }
  }

  test("degenerate iteration count is rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      PageRankInt.run(Seq((1L, 2L)).toDF("src", "dst"), 0)
    }
  }

  test("run leaves at most its own result pinned (no block-manager residue)") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    // 7 iterations with interval 2 → three intermediate checkpoints that
    // must all be released; only the final rank frame's blocks may remain.
    val out = PageRankInt.run(edges.toDF("src", "dst"), 7, checkpointInterval = 2)
    assert(out.count() == 3)
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.size <= 1,
      s"PageRank left ${leaked.size} persistent RDDs pinned: $leaked")
  }
}
