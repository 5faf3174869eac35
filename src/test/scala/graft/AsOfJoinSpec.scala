package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics on handcrafted data: newest right row at-or-before
  * each left row per key; no match → null; equal timestamps match. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asof picks the newest right row <= left time, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 15L, "p3")).toDF("k", "t", "pname")
    val right = Seq(
      (1L, 8L, "c_a"), (1L, 10L, "c_b"), (1L, 19L, "c_c"),
      (2L, 99L, "c_z")).toDF("k", "t", "cname")

    val out = AsOfJoin.asof(left, right, "k", "t", "t", Seq("cname"))
      .select("k", "pname", "cname").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    assert(out == Set(
      (1L, "p0", null),   // nothing at or before t=5
      (1L, "p1", "c_b"),  // equal timestamp matches (>= semantics)
      (1L, "p2", "c_c"),  // newest of {8,10,19}
      (2L, "p3", null)))  // right row at t=99 is in the future
  }

  test("asof equals the brute-force definition on generated data") {
    import spark.implicits._
    // deterministic pseudo-random fixture: many keys, colliding timestamps
    val rng = new scala.util.Random(7)
    val leftRows = (0 until 300).map(i =>
      (rng.nextInt(10).toLong, rng.nextInt(50).toLong, i.toLong))
    val rightRaw = (0 until 200).map(_ =>
      (rng.nextInt(10).toLong, rng.nextInt(50).toLong, rng.nextInt(1000).toLong))
    // contract: at most one right row per (key, time) — keep the max payload
    val rightRows = rightRaw.groupBy(r => (r._1, r._2))
      .map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }.toSeq
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "t", "payload")

    val got = AsOfJoin.asof(left, right, "k", "t", "t", Seq("payload"))
      .select("lid", "payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val expected = leftRows.map { case (k, t, lid) =>
      val candidates = rightRows.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (candidates.isEmpty) None
              else Some(candidates.maxBy(_._2)._3))
    }.toMap
    assert(got == expected)
  }
}
