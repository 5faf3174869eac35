package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Warehouse-operator invariants: the Morton interleave used by q160's
  * z-order layout must equal the bit-by-bit definition; the grid interval
  * join must return exactly the brute-force theta-join pairs, with no
  * duplicates, including touch-at-boundary and cell-straddling cases. */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Morton spread/interleave equals the bit-by-bit definition") {
    import spark.implicits._
    // Reference: interleave x's bits at even positions, y's at odd.
    def mortonRef(x: Int, y: Int): Long =
      (0 until 8).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1).toLong << (2 * i)) |
          (((y >> i) & 1).toLong << (2 * i + 1))
      }
    val cases = Seq((0, 0), (255, 255), (255, 0), (0, 255), (1, 2), (170, 85),
      (123, 45), (200, 7))
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        expr("((( (x | (x << 4)) & 3855) | ((((x | (x << 4)) & 3855)) << 2)) & 13107)").as("xa"),
        expr("((( (y | (y << 4)) & 3855) | ((((y | (y << 4)) & 3855)) << 2)) & 13107)").as("ya"))
      .select(col("x"), col("y"),
        expr("cast(((xa | (xa << 1)) & 21845) | (((ya | (ya << 1)) & 21845) << 1) as bigint)").as("z"))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getInt(0), r.getInt(1), r.getLong(2))
      assert(z == mortonRef(x, y), s"morton($x, $y)")
    }
  }

  test("grid interval join == brute force, once per pair") {
    import spark.implicits._
    val cell = 10L
    val rng = new scala.util.Random(13)
    // Random closed intervals, lengths 0..35 (0 to >3 cells), plus
    // hand-placed edge cases: exact touch at a cell boundary, exact touch
    // mid-cell, containment, identical intervals.
    val lhs = (0L until 40L).map { i =>
      val s = rng.nextInt(100).toLong; (i, s, s + rng.nextInt(36))
    } ++ Seq((100L, 20L, 30L), (101L, 5L, 9L), (102L, 0L, 99L), (103L, 55L, 55L))
    val rhs = (0L until 25L).map { j =>
      val s = rng.nextInt(100).toLong; (j, s, s + rng.nextInt(36))
    } ++ Seq((200L, 30L, 40L), (201L, 9L, 9L), (202L, 55L, 55L), (203L, 56L, 60L))
    val l = lhs.toDF("lid", "ls", "le")
    val r = rhs.toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(l, r, cell)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val want = for {
      (li, ls, le) <- lhs; (ri, rs, re) <- rhs
      if ls <= re && rs <= le
    } yield (li, ri)
    assert(got.size == got.toSet.size, "grid join emitted a duplicate pair")
    assert(got.toSet == want.toSet,
      s"got ${got.size} pairs, want ${want.size}")
    assert(want.toSet(100L -> 200L), "touch case missing from witness")
    assert(want.size > 50, "vacuous witness")
  }

  test("incremental agg merge is exact under arbitrary split points") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val rows = (0 until 500).map { i =>
      (rng.nextInt(40).toLong, rng.nextInt(100000).toLong, i.toLong)
    }.toDF("k", "cents", "seq")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum("cents").as("s"),
        max("cents").as("m"))
    for (cut <- Seq(0L, 1L, 250L, 499L, 500L)) {
      val merged = agg(rows.filter(col("seq") < cut))
        .unionByName(agg(rows.filter(col("seq") >= cut)))
        .groupBy("k").agg(sum("n").as("n"), sum("s").as("s"), max("m").as("m"))
      val full = agg(rows)
      val diff = merged.join(full, Seq("k"), "full_outer")
        .filter(merged("n") =!= full("n") || merged("s") =!= full("s") ||
          merged("m") =!= full("m") ||
          merged("n").isNull || full("n").isNull)
      assert(diff.count() == 0, s"merge at cut=$cut diverged from recompute")
    }
  }
}
