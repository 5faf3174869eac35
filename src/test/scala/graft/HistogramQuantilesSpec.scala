package graft

import graft.operators.HistogramQuantiles
import org.scalatest.funsuite.AnyFunSuite

/** Histogram-refinement order statistics must equal the sorted-multiset
  * definition exactly — including ties, extreme ranks, negative values,
  * single-element and all-equal columns — at any bucket width. */
class HistogramQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(xs: Seq[Long], ranks: Seq[Long], buckets: Int = 16): Unit = {
    import spark.implicits._
    val sorted = xs.sorted
    val expect = ranks.map(k => sorted((k - 1).toInt))
    val got = HistogramQuantiles.orderStatistics(
      xs.toDF("x"), "x", ranks, buckets)
    assert(got == expect, s"xs=$xs ranks=$ranks buckets=$buckets")
  }

  test("matches sorted-multiset k-th smallest on a seeded multiset with heavy ties") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(500)(rnd.nextInt(40).toLong - 20L) // ties everywhere, negatives
    check(xs, Seq(1L, 13L, 125L, 250L, 375L, 499L, 500L))
  }

  test("wide range forces multiple refinement passes") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(300)(rnd.nextLong() % 1000000000L)
    check(xs, Seq(1L, 75L, 150L, 225L, 300L), buckets = 4) // tiny B => many passes
  }

  test("degenerate columns: all equal, single element") {
    check(Seq.fill(9)(42L), Seq(1L, 5L, 9L))
    check(Seq(-3L), Seq(1L))
  }

  test("empty input returns empty; out-of-range rank throws") {
    import spark.implicits._
    assert(HistogramQuantiles.orderStatistics(
      Seq.empty[Long].toDF("x"), "x", Seq(1L)) == Seq.empty)
    intercept[IllegalArgumentException] {
      HistogramQuantiles.orderStatistics(Seq(1L, 2L).toDF("x"), "x", Seq(3L))
    }
  }

  test("agrees with the q81 window formulation's rank arithmetic on cents") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val cents = Seq.fill(101)((rnd.nextInt(49000) + 100).toLong)
    val n = cents.length.toLong
    val ranks = Seq((n + 3) / 4, (n + 1) / 2, (3 * n + 3) / 4)
    check(cents, ranks, buckets = 32)
  }
}
