package graft

import graft.operators.SaltedJoin
import org.scalatest.funsuite.AnyFunSuite

/** Salted join must equal the plain join, row-for-row, on skewed input. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join == plain join on a hot-key distribution") {
    import spark.implicits._
    // 90% of left rows share key 1 (the hot key)
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, s"l$i"))
      .toDF("k", "lv")
    val right = Seq((1L, "hot"), (2L, "r2"), (3L, "r3"), (6L, "r6")).toDF("k", "rv")

    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = SaltedJoin.saltedJoin(left, right, "k", salts = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size > 900, "hot key rows all present")
  }

  test("left_outer salted join preserves unmatched left rows") {
    import spark.implicits._
    val left = Seq((1L, "a"), (9L, "no-match")).toDF("k", "lv")
    val right = Seq((1L, "r1")).toDF("k", "rv")
    val out = SaltedJoin.saltedJoin(left, right, "k", salts = 4, joinType = "left_outer")
      .select("k", "lv", "rv").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((1L, "a", "r1"), (9L, "no-match", null)))
  }
}
