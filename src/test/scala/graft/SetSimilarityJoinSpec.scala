package graft

import graft.operators.SetSimilarityJoin
import org.scalatest.funsuite.AnyFunSuite

/** Prefix filtering must be lossless: the filtered join returns EXACTLY the
  * brute-force all-pairs result on a generated corpus with planted dups,
  * near-dups, and unrelated sets, across several thresholds. */
class SetSimilarityJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def brute(sets: Seq[(Long, Set[String])], t: Double): Set[(Long, Long)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= t
    } yield (ia, ib)).toSet

  test("prefix-filtered join == brute force at t = 0.3 / 0.5 / 0.8") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vocab = (0 until 120).map(i => s"tok$i")
    // 60 random sets + planted exact dup + near dup
    val base = (0L until 60L).map { id =>
      id -> (0 until (8 + rng.nextInt(20))).map(_ => vocab(rng.nextInt(vocab.size))).toSet
    }
    val sets = base ++ Seq(
      100L -> base(3)._2,                               // exact dup of id 3
      101L -> (base(5)._2 + "tokX" - base(5)._2.head))  // near dup of id 5
    val df = sets.map { case (id, s) => (id, s.toArray) }.toDF("id", "toks")

    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = SetSimilarityJoin.jaccardJoin(df, "id", "toks", t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = brute(sets, t)
      assert(got == want, s"threshold $t: got ${got.size} pairs, want ${want.size}")
      assert(want.nonEmpty || t > 0.9, s"vacuous check at $t")
    }
  }
}
