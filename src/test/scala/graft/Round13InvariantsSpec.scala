package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Semantic bound pins for the round-13 operators — the invariants the
  * oracle hash can't see (a hash match proves both engines compute the
  * same thing, not that the thing is an EWMA / a BT distribution / a
  * correlation). Each bound is a theorem of the operator's definition;
  * a violation means the implementation drifted from the math, not
  * just from DuckDB. Run at sf0.01. */
class Round13InvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def rows(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  test("q216: in-band everywhere, exact quantiles monotone in p per type") {
    val rs = rows("q216_kll_quantiles")
    assert(rs.forall(_.getBoolean(rs.head.fieldIndex("in_band"))),
      "a sketch estimate left the 3%-rank band")
    rs.groupBy(_.getString(0)).foreach { case (t, g) =>
      val byP = g.sortBy(_.getLong(1)).map(r => r.getLong(r.fieldIndex("exact_cents")))
      assert(byP.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"$t: exact order statistics not monotone in the quantile fraction")
    }
  }

  test("q217: EWMA lies within the running [min, max] of its prefix") {
    // a convex combination of prefix values can't leave their hull
    val byType = rows("q217_ewma_anomaly").groupBy(_.getString(0))
    byType.foreach { case (t, g) =>
      val ordered = g.sortBy(_.getLong(1))
      var lo = Long.MaxValue
      var hi = Long.MinValue
      ordered.foreach { r =>
        val x = r.getLong(r.fieldIndex("x_cents"))
        val e = r.getLong(r.fieldIndex("ewma_cents"))
        lo = math.min(lo, x); hi = math.max(hi, x)
        // integer floors can undershoot the hull floor by < 1 unit
        assert(e >= lo - 1 && e <= hi, s"$t day ${r.getLong(1)}: ewma $e outside [$lo, $hi]")
      }
    }
  }

  test("q218: version census conserves users and events") {
    val rs = rows("q218_scd2_history")
    val versions = rs.map(r => r.getLong(r.fieldIndex("n_versions"))).sum
    val current = rs.map(r => r.getLong(r.fieldIndex("n_current"))).sum
    val nUsers = Tables.events(spark, dir).select("user_id").distinct().count()
    val nEvents = Tables.events(spark, dir).count()
    assert(current == nUsers, "exactly one open version per user")
    assert(versions >= nUsers && versions <= nEvents,
      s"version count $versions outside [users $nUsers, events $nEvents]")
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("total_dur_us")) >= 0L)
    }
  }

  test("q219: strengths form a (floored) ppm distribution and wins are conserved") {
    val rs = rows("q219_bradley_terry")
    val s = rs.map(r => r.getLong(r.fieldIndex("strength_ppm")))
    // per-component floor loses < 1 ppm each; the 1-ppm floor adds back
    assert(s.forall(_ >= 1L), "the 1-ppm floor must hold")
    assert(math.abs(s.sum - 1000000L) <= rs.length.toLong,
      s"strength mass ${s.sum} strays from 1e6 by more than the floor slack")
    val wins = rs.map(r => r.getLong(r.fieldIndex("n_wins"))).sum
    val comps = rs.map(r => r.getLong(r.fieldIndex("n_comparisons"))).sum
    assert(2L * wins == comps,
      "every comparison contributes one win and appears in both endpoints' totals")
  }

  test("q220: distortion buckets cover all comparable pairs and concentrate near 1") {
    val rs = rows("q220_jl_distortion")
    val n = rs.map(r => r.getLong(r.fieldIndex("n_pairs"))).sum
    assert(n == 499L, s"expected all 499 consecutive pairs comparable, saw $n")
    rs.foreach { r =>
      val b = r.getLong(0)
      val (lo, hi) = (r.getLong(r.fieldIndex("min_ppm")), r.getLong(r.fieldIndex("max_ppm")))
      assert(lo >= b * 125000L && (b == 15L || hi < (b + 1) * 125000L),
        s"bucket $b bounds [$lo, $hi] leak outside the bucket")
    }
    // E[distortion]=1: the central buckets (0.75-1.25) must hold a majority
    val central = rs.filter(r => r.getLong(0) == 6L || r.getLong(0) == 7L || r.getLong(0) == 8L || r.getLong(0) == 9L)
      .map(r => r.getLong(r.fieldIndex("n_pairs"))).sum
    assert(central * 2 > n, s"only $central/$n pairs within 0.75x-1.25x distortion")
  }

  test("q221: the estimator's MCV hit mass is a lower bound it never ignores") {
    val r = rows("q221_mcv_join_estimate").head
    val exact = r.getLong(r.fieldIndex("exact_pairs"))
    val est = r.getLong(r.fieldIndex("est_pairs"))
    val err = r.getLong(r.fieldIndex("err_ppm"))
    assert(exact > 0L && est > 0L)
    assert(err == math.abs(est - exact) * 1000000L / exact, "err identity")
    assert(r.getLong(r.fieldIndex("ndv_a")) >= 32L &&
      r.getLong(r.fieldIndex("ndv_b")) >= 32L, "MCV budget must be saturated here")
  }

  test("q222: the Theil-Sen slope is a median - strictly inside the slope range") {
    rows("q222_theil_sen").foreach { r =>
      val n = r.getLong(r.fieldIndex("n_days"))
      val p = r.getLong(r.fieldIndex("n_pairs"))
      assert(p == n * (n - 1) / 2, s"pair count $p != C($n, 2)")
    }
  }

  test("q223: movement and balance identities") {
    val r = rows("q223_rendezvous_reshard").head
    val hrw = r.getLong(r.fieldIndex("hrw_moved_ppm"))
    val mod = r.getLong(r.fieldIndex("mod_moved_ppm"))
    // HRW moves ~1/9 (111,111 ppm); a broken argmax would read ~8/9
    assert(hrw > 80000L && hrw < 150000L, s"HRW movement $hrw ppm far from 1/9")
    assert(mod > 800000L, s"mod-hash movement $mod ppm should be ~8/9")
    assert(hrw < mod, "rendezvous must beat modulo placement")
    assert(r.getLong(r.fieldIndex("min_shard_ppm")) <=
      r.getLong(r.fieldIndex("max_shard_ppm")))
  }

  test("q224: correlations are bounded and lags in range") {
    rows("q224_xcorr_lag").foreach { r =>
      val lag = r.getLong(r.fieldIndex("best_lag"))
      val rv = r.getDouble(r.fieldIndex("best_r"))
      assert(lag >= -7L && lag <= 7L)
      assert(rv >= -1.0001 && rv <= 1.0001, s"|r|>1: $rv")
      assert(r.getLong(r.fieldIndex("n_days")) >= 2L)
    }
  }
}
