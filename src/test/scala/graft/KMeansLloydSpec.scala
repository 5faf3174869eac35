package graft

import graft.operators.KMeansLloyd
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd invariants on the real embedding table: refinement never increases
  * inertia, assignment is to the true nearest centroid, and the whole fit
  * is run-deterministic (the oracle replay depends on it). */
class KMeansLloydSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def inertia(iters: Int): Long =
    KMeansLloyd.fit(Tables.embeddings(spark, dir), "vec_id", "embedding",
      k = 8, iters = iters)
      .agg(sum(col("d2"))).head().getLong(0)

  test("one Lloyd refinement never increases inertia") {
    val i1 = inertia(1)
    val i2 = inertia(2)
    assert(i2 <= i1, s"refinement worsened inertia: $i1 -> $i2")
  }

  test("every vector lands in a nonempty cluster; k respected") {
    val assigned = KMeansLloyd.fit(Tables.embeddings(spark, dir),
      "vec_id", "embedding", k = 8, iters = 2)
    val n = Tables.embeddings(spark, dir).count()
    assert(assigned.count() == n, "every vector assigned exactly once")
    val k = assigned.select("cid").distinct().count()
    assert(k >= 1 && k <= 8)
  }

  test("fit is deterministic across runs") {
    def census = KMeansLloyd.fit(Tables.embeddings(spark, dir),
        "vec_id", "embedding", k = 8, iters = 2)
      .groupBy("cid").agg(count(lit(1)).as("n"), sum("d2").as("i"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val first = census
    val second = census
    assert(first == second)
  }
}
