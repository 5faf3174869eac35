package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Semantic bound pins for the round-12 operators — the invariants the
  * oracle hash can't see (a hash match proves both engines compute the
  * same thing, not that the thing is a JSD / an AUC / a survival curve).
  * Each bound below is a theorem of the operator's definition; a
  * violation means the implementation drifted from the math, not just
  * from DuckDB. Run at sf0.01 (sf0.001 degenerates several of them). */
class Round12InvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def rows(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  test("q198: JSD lies in [0, ln 2] micro-nats for every type") {
    val ln2Micro = 693147L
    rows("q198_jsd_drift").foreach { r =>
      val jsd = r.getLong(r.fieldIndex("jsd_micro"))
      // floor-ln truncation can undershoot 0 by at most the per-term
      // floors (bins * 1 micro-nat); allow that exact slack, no more
      assert(jsd >= -40L && jsd <= ln2Micro,
        s"${r.getString(0)}: jsd_micro=$jsd outside [0-ε, ln2]")
    }
  }

  test("q204: the stationary vector stays a (truncating) distribution") {
    val pis = rows("q204_markov_stationary").map(_.getLong(2))
    // per-term floor loses mass, never creates it: sum ≤ 1e6, and with
    // 5 states x 5 rounds of truncation the loss is bounded well under 1%
    assert(pis.sum <= 1000000L && pis.sum >= 990000L,
      s"pi mass ${pis.sum} outside [0.99e6, 1e6]")
    assert(pis.forall(_ >= 0L))
  }

  test("q205: decay never exceeds raw revenue and retained_ppm is consistent") {
    rows("q205_decayed_popularity").foreach { r =>
      val raw = r.getLong(r.fieldIndex("raw_cents"))
      val dec = r.getLong(r.fieldIndex("decayed_cents"))
      val ret = r.getLong(r.fieldIndex("retained_ppm"))
      assert(dec >= 0L && dec <= raw, s"part ${r.getLong(0)}: decayed $dec > raw $raw")
      assert(ret == dec * 1000000L / raw)
    }
  }

  test("q209: at-risk counts and -ln S(t) are both monotone") {
    val rs = rows("q209_survival_curve")
    val byDay = rs.sortBy(_.getLong(0))
    byDay.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(a.fieldIndex("n_risk")) >= b.getLong(b.fieldIndex("n_risk")),
          "n_risk must be non-increasing in t")
        assert(a.getLong(a.fieldIndex("nls_micro")) <= b.getLong(b.fieldIndex("nls_micro")),
          "-ln S(t) must be non-decreasing in t")
      case _ => ()
    }
    // every at-risk count is bounded by the user universe
    val nUsers = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(byDay.head.getLong(byDay.head.fieldIndex("n_risk")) <= nUsers)
  }

  test("q211: spectrum identities — docs, clusters, singletons, excess") {
    val r = rows("q211_dup_spectrum").head
    val (docs, clusters, singles, excess) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(docs == clusters + excess, "n_docs = n_clusters + dup_excess")
    assert(singles <= clusters && excess >= 0L)
    assert(docs == Tables.documents(spark, dir).count())
  }

  test("q214: CV² is non-negative and mean*n never exceeds the observation span") {
    rows("q214_burstiness").foreach { r =>
      assert(r.getLong(r.fieldIndex("cv2_ppm")) >= 0L)
      assert(r.getLong(r.fieldIndex("min_gap_us")) <=
        r.getLong(r.fieldIndex("max_gap_us")))
    }
  }

  test("q215: AUC lies in [0, 1e6] and the label split covers the corpus") {
    val r = rows("q215_auc_ranksum").head
    val (np, nn, auc) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(auc >= 0L && auc <= 1000000L, s"auc_ppm=$auc outside [0, 1e6]")
    assert(np + nn == Tables.documents(spark, dir).count())
    assert(np > 0L && nn > 0L, "both classes must be non-empty for AUC to mean anything")
  }

  test("q202: Luby census conserves the active set") {
    val rs = rows("q202_luby_mis").sortBy(_.getLong(0))
    rs.sliding(2).foreach {
      case Array(a, b) =>
        // next round's active-before equals this round's active-after
        assert(a.getLong(a.fieldIndex("n_active_after")) ==
          b.getLong(b.fieldIndex("n_removed")) +
            b.getLong(b.fieldIndex("n_active_after")),
          s"round ${b.getLong(0)}: removed+after != previous after")
      case _ => ()
    }
    rs.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_selected")) <=
        r.getLong(r.fieldIndex("n_removed")),
        "winners are a subset of removals")
    }
  }
}
