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

  test("positional filter stays lossless on adversarial random corpora (10 seeds x 4 thresholds)") {
    import spark.implicits._
    // Skewed Zipf-ish vocab + tiny sets + exact-threshold pairs: the shapes
    // most likely to expose an off-by-one in the prefix length, the ceil'd
    // length bound, or the first-common-token positional argument.
    for (seed <- 1 to 10) {
      val rng = new scala.util.Random(seed)
      val vocab = (0 until 40).map(i => s"w$i")
      def zipf(): String = vocab(math.min(vocab.size - 1, (math.pow(rng.nextDouble(), 2.5) * vocab.size).toInt))
      val base = (0L until 40L).map { id =>
        // sizes 1..12: tiny sets make ceil boundaries bite hardest
        id -> (0 until (1 + rng.nextInt(12))).map(_ => zipf()).toSet
      }
      // planted exact-threshold geometry: |a∩b|=1, |a∪b|=2 → J=0.5 exactly,
      // and |a∩b|=2, |a∪b|=4 → J=0.5 exactly
      val sets = base ++ Seq(
        200L -> Set("e1", "e2"), 201L -> Set("e2", "e3"),
        202L -> Set("f1", "f2", "f3"), 203L -> Set("f2", "f3", "f4"))
      val df = sets.map { case (id, s) => (id, s.toArray) }.toDF("id", "toks")
      for (t <- Seq(0.25, 0.5, 2.0 / 3.0, 0.9)) {
        val got = SetSimilarityJoin.jaccardJoin(df, "id", "toks", t)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = brute(sets, t)
        assert(got == want, s"seed $seed threshold $t: got ${got.size}, want ${want.size}, " +
          s"missing=${(want -- got).take(5)}, extra=${(got -- want).take(5)}")
      }
    }
  }

  test("duplicate tokens in the input cannot cause false negatives") {
    import spark.implicits._
    // Raw arrays with heavy duplication: the length/prefix bounds are only
    // valid on distinct cardinalities, so jaccardJoin must normalize first
    // (a regression here silently drops qualifying pairs).
    val sets = Seq(
      1L -> Array("a", "a", "a", "a", "a", "b"),          // distinct {a,b}
      2L -> Array("a", "b", "b", "b", "b", "b", "b", "c"), // distinct {a,b,c}
      3L -> Array("x", "x", "y"),                          // distinct {x,y}
      4L -> Array("y", "x", "x", "x", "x", "x", "x", "x")) // distinct {x,y}
    val df = sets.toDF("id", "toks")
    val got = SetSimilarityJoin.jaccardJoin(df, "id", "toks", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // distinct-set Jaccards: (1,2): 2/3 >= .5 keep; (3,4): 2/2 = 1.0 keep
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 4L)))
    assert(got.find(p => p._1 == 3L).get._3 == 1.0, "duplicates must not dilute jaccard")
  }

  test("each qualifying pair appears exactly once even when candidates collide") {
    import spark.implicits._
    // The verify stage consumes the RAW candidate stream (one row per shared
    // prefix token) and dedups the verified output; the other tests compare
    // collected Sets, which would hide a duplicate-row regression. Identical
    // large sets maximize prefix sharing (at t=0.5, |prefix| = n/2 + 1
    // shared tokens → the same pair enters verify many times), so a missing
    // output dedup turns up here as extra rows, not just equal sets.
    val toks = (0 until 10).map(i => s"c$i").toArray
    val df = Seq(1L -> toks, 2L -> toks, 3L -> toks).toDF("id", "toks")
    val jac = SetSimilarityJoin.jaccardJoin(df, "id", "toks", 0.5).collect()
    assert(jac.length == 3, s"expected 3 unordered pair rows, got ${jac.length}")
    val con = SetSimilarityJoin.containmentJoin(df, "id", "toks", 0.5).collect()
    assert(con.length == 6, s"expected 6 ordered pair rows, got ${con.length}")
  }

  private def bruteContainment(sets: Seq[(Long, Set[String])], t: Double): Set[(Long, Long)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      c = sa.intersect(sb).size.toDouble / sa.size
      if c >= t - 1e-9
    } yield (ia, ib)).toSet

  test("containment join == brute force, and catches what Jaccard misses") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vocab = (0 until 120).map(i => s"tok$i")
    val base = (0L until 50L).map { id =>
      id -> (0 until (6 + rng.nextInt(18))).map(_ => vocab(rng.nextInt(vocab.size))).toSet
    }
    // the decontamination shape: a small doc fully embedded in a big one —
    // high containment (1.0), low Jaccard (small/union)
    val small = Set("tokA", "tokB", "tokC", "tokD")
    val big = small ++ (0 until 60).map(i => s"big$i")
    val sets = base ++ Seq(200L -> small, 201L -> big)
    val df = sets.map { case (id, s) => (id, s.toArray) }.toDF("id", "toks")
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val got = SetSimilarityJoin.containmentJoin(df, "id", "toks", t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteContainment(sets, t)
      assert(got == want, s"threshold $t: got ${got.size} pairs, want ${want.size}")
      assert(got.contains((200L, 201L)), s"embedded doc must be flagged at t=$t")
    }
    // …and the Jaccard join (union-normalized) structurally cannot see it
    val jac = SetSimilarityJoin.jaccardJoin(df, "id", "toks", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((200L, 201L)),
      "fixture must be a true Jaccard miss for the test to mean anything")
  }
}
