package graft

import graft.operators.IvfAnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN on the sf0.001 embeddings: structural invariants + recall@10
  * against the brute-force oracle (deterministic: fixed data, strided
  * centroids). */
class IvfAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("IVF probes only its lists and reaches useful recall vs brute force") {
    val e = Tables.embeddings(spark, dir)
    val (assigned, cents) = IvfAnn.build(e, "vec_id", "embedding", k = 16)
    assert(cents.count() == 16)
    // every vector gets exactly one list
    assert(assigned.count() == e.count())
    assert(assigned.select("cid").distinct().count() <= 16)

    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val ivf = IvfAnn.search(assigned, cents, qs,
      "q_id", "q_emb", "vec_id", "embedding", nprobe = 4, topK = 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute-force ground truth (same ranking rules as q41)
    val brute = graft.queries.SimilarityQueries.queries("q41_ann_bruteforce_topk")(spark, dir)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall@10 too low: $recall")
    assert(ivf.size == 50, "5 queries x top-10")
  }
}
