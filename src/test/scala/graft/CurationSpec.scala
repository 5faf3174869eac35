package graft

import graft.queries.CurationQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation-operator invariants beyond the oracle runs: the skyline
  * prefilter must be lossless against brute force on adversarial synthetic
  * corpora (ties, dominated clusters, staircase frontiers), and the
  * q173-style multi-block candidate union must emit each pair at most
  * once. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("skyline survivors contain exactly the brute-force skyline") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    // synthetic documents whose (diversity, length) plane has planted
    // shapes: a dominated blob, an anti-chain staircase, and exact ties
    def mkText(distinct: Int, total: Int): String =
      ((0 until distinct).map(i => s"w$i") ++
        Seq.fill(total - distinct)("w0")).mkString(" ")
    val blob = (0L until 120L).map { i =>
      val total = 20 + rng.nextInt(20)
      (i, mkText(5 + rng.nextInt(10), total), total * 7L)
    }
    val stairs = (0L until 8L).map { k =>
      // increasing diversity, decreasing length: a pure anti-chain
      (200L + k, mkText(30 + 8 * k.toInt, 80), (900L - 60 * k))
    }
    // low-diversity but longest documents: survive without dominating the
    // staircase (their x is below every stair's)
    val ties = Seq((300L, mkText(2, 80), 905L), (301L, mkText(2, 80), 905L))
    val docs = (blob ++ stairs ++ ties)
      .map { case (id, t, n) => (id, t, n, "en", "src") }
      .toDF("doc_id", "text", "n_chars", "lang", "source")

    val dm = docs.select(col("doc_id"),
      expr("1000000L * size(array_distinct(split(text, ' '))) div size(split(text, ' '))")
        .as("x"), col("n_chars").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = dm.filter { case (_, x, y) =>
      !dm.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._1).toSet

    val survivors = CurationQueries.skylineSurvivors(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(brute.subsetOf(survivors),
      s"prefilter dropped skyline members: ${brute -- survivors}")

    // the query's own bucket-partitioned window finish over the survivors
    val got = CurationQueries.skylineFinish(CurationQueries.skylineSurvivors(docs))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == brute, s"skyline mismatch: extra=${got -- brute} missing=${brute -- got}")
    // the planted shapes actually exercise the operator
    assert((200L until 208L).forall(brute), "staircase must be on the frontier")
    assert(brute(300L) && brute(301L), "exact ties both survive")
    assert(brute.size < dm.length / 2, "blob must be mostly dominated")
  }

  test("multi-block candidate union emits each pair at most once") {
    import spark.implicits._
    // records engineered so many pairs match BOTH blocking keys
    val recs = (0L until 40L).map { i =>
      (i, s"k${i % 5}", s"g${i % 5}") // b1 and b2 perfectly correlated
    } ++ (40L until 60L).map { i =>
      (i, s"k${i % 5}", s"h${i % 7}") // b2 differs -> some block2-only pairs
    }
    val df = recs.toDF("rec_id", "b1", "b2")
    def pairs(key: String) = df.as("a").join(df.as("b"),
        col(s"a.$key") === col(s"b.$key") && col("a.rec_id") < col("b.rec_id"))
      .select(col("a.rec_id").as("ra"), col("b.rec_id").as("rb"),
        col("a.b1").as("b1a"), col("b.b1").as("b1b"))
    val cand = pairs("b1")
      .unionByName(pairs("b2").filter(col("b1a") =!= col("b1b")))
      .select("ra", "rb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.length == cand.toSet.size,
      "first-matching-block rule emitted a duplicate pair")
    // and the union is complete: every pair matching either key appears
    val want = (for {
      (ia, b1a, b2a) <- recs; (ib, b1b, b2b) <- recs
      if ia < ib && (b1a == b1b || b2a == b2b)
    } yield (ia, ib)).toSet
    assert(cand.toSet == want)
  }
}
