package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drift-monitor invariants on constructed distributions: KS is 0 for
  * identical samples, 10⁶ ppm for disjoint ones, and matches the direct
  * definition on a hand case; the PSI term arithmetic is non-negative and
  * zero for identical populations. (The full queries are oracle-checked;
  * these pin the operator math on inputs with known answers.) */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ks(aVals: Seq[Long], bVals: Seq[Long]): Long = {
    import spark.implicits._
    val rows = aVals.map(v => ("t", v, true)) ++ bVals.map(v => ("t", v, false))
    val pts = rows.toDF("event_type", "cents", "is_a")
      .groupBy("event_type", "cents")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("b"))
    val w = Window.partitionBy(col("event_type"))
    pts
      .withColumn("ca", sum(col("a")).over(w.orderBy(col("cents"))))
      .withColumn("cb", sum(col("b")).over(w.orderBy(col("cents"))))
      .withColumn("na", sum(col("a")).over(w))
      .withColumn("nb", sum(col("b")).over(w))
      .groupBy(col("event_type"))
      .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
        max(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("d_max"))
      .select(expr("d_max * 1000000 div (n_a * n_b)"))
      .head().getLong(0)
  }

  test("KS: identical samples 0, disjoint 1e6, hand case exact") {
    val xs = Seq(1L, 2L, 3L, 5L, 8L, 13L)
    assert(ks(xs, xs) == 0L)
    assert(ks(Seq(1L, 2L, 3L), Seq(10L, 11L, 12L)) == 1000000L)
    // A = {1,2}, B = {2,4}: CDFs cross at v=1 (1/2 vs 0) and v=2 (1 vs 1/2)
    // -> D = 1/2 -> 500000 ppm
    assert(ks(Seq(1L, 2L), Seq(2L, 4L)) == 500000L)
  }

  test("PSI term: identical populations sum to zero, shifted ones positive") {
    // replicate the q171 term arithmetic on two hand distributions
    def psi(aBins: Seq[Long], bBins: Seq[Long]): Long = {
      val na = aBins.map(_ + 1).sum
      val nb = bBins.map(_ + 1).sum
      aBins.zip(bBins).map { case (a, b) =>
        val a1 = a + 1; val b1 = b + 1
        val diff = a1 * nb - b1 * na
        val lnMicro = math.floor(1000000.0 *
          math.log((a1.toDouble * nb.toDouble) / (b1.toDouble * na.toDouble))).toLong
        diff * lnMicro / (na * nb)
      }.sum
    }
    assert(psi(Seq(50L, 30L, 20L), Seq(50L, 30L, 20L)) == 0L)
    val drifted = psi(Seq(80L, 15L, 5L), Seq(20L, 30L, 50L))
    assert(drifted > 100000L, s"strong shift must register, got $drifted")
    // near-symmetry: PSI(a,b) ≈ PSI(b,a) — exact in real arithmetic; the
    // floor-ln discretization perturbs each term by ≤ 1 micro-nat
    val swapped = psi(Seq(20L, 30L, 50L), Seq(80L, 15L, 5L))
    assert(math.abs(drifted - swapped) <= 10L,
      s"PSI should be near-symmetric: $drifted vs $swapped")
  }
}
