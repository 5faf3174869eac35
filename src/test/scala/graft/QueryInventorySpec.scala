package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Inventory-wide guards: every registered query must (a) execute at
  * sf0.001, (b) have an oracle entry or be a documented approx/no-oracle op,
  * and (c) contain no single-partition global window — the scale-killer
  * pattern (`Window.orderBy` with no partitionBy) that VERDICT r1 flagged.
  */
class QueryInventorySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Ops intentionally without DuckDB oracle — the driver records a weaker
    * rows-only check for these. EMPTY since round 5: even the HLL sketch
    * (q44) is oracle-verified now, via exact counts plus a deterministic
    * error-band boolean (HLL registers merge by max, so the estimate is
    * partition-invariant; the band either holds for this dataset or the
    * sketch is broken). The xxhash fast twins q37/q38 live in
    * SparkEntry.perfQueries (bench-only, proven via q66/q67). */
  private val noOracleByDesign = Set.empty[String]

  test("every query executes at sf0.001 (perf-only queries included)") {
    val failures = (SparkEntry.queries ++ SparkEntry.perfQueries).toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("perf-only queries never overlap the correctness inventory") {
    val overlap = SparkEntry.perfQueries.keySet intersect SparkEntry.queries.keySet
    assert(overlap.isEmpty, s"perf queries shadowing correctness entries: $overlap")
  }

  test("oracle coverage is complete (modulo documented approx ops)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracleByDesign
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle entries without query: $orphaned")
  }

  test("no query plans a CartesianProduct (unbounded pair explosion)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      // BroadcastNestedLoopJoin (bounded build side) is the intended ANN
      // shape; CartesianProductExec (shuffle x shuffle) never is.
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("q107's correlated aggregate predicate is decorrelated (no per-row subquery)") {
    val fn = SparkEntry.queries("q107_correlated_agg_predicate")
    val qe = fn(spark, dir).queryExecution
    // Decorrelation must leave NO subquery expression in the optimized
    // plan: the correlated aggregates become an aggregate-below-join.
    // A surviving scalar-subquery would re-run an aggregation per outer
    // row — the pattern this query exists to prove Catalyst removes.
    val subqueries = qe.optimizedPlan.collect {
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])) => p
    }
    assert(subqueries.isEmpty,
      s"q107 kept per-row subqueries:\n${qe.optimizedPlan.treeString.take(2000)}")
    // and the rewrite's signature: an aggregate on the inner lineitem scan
    // feeding a join (the single re-scan + hash agg + join shape)
    val hasAggregate = qe.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(hasAggregate.size >= 2, "expected the decorrelated per-partkey aggregate " +
      "plus the final group-by in the optimized plan")
  }

  test("q158's EXISTS/NOT-EXISTS chain decorrelates to one LeftSemi + one LeftAnti join") {
    import org.apache.spark.sql.catalyst.plans.{LeftSemi, LeftAnti}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val qe = SparkEntry.queries("q158_semi_anti_chain")(spark, dir).queryExecution
    // Same no-surviving-subquery contract as q107 — here over TWO existence
    // predicates correlated on (equality, inequality) against one child.
    val subqueries = qe.optimizedPlan.collect {
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])) => p
    }
    assert(subqueries.isEmpty,
      s"q158 kept per-row subqueries:\n${qe.optimizedPlan.treeString.take(2000)}")
    val joinTypes = qe.optimizedPlan.collect { case j: Join => j.joinType }
    assert(joinTypes.contains(LeftSemi) && joinTypes.contains(LeftAnti),
      s"expected the Q21 semi+anti pair, got joins: $joinTypes\n" +
        qe.optimizedPlan.treeString.take(2000))
  }

  test("every iterative query keeps a bounded executed plan (checkpoint discipline)") {
    // The lineage blowup was rediscovered three separate times (q179, q184,
    // q187: round-r frames embedding round r−1 four-to-five times → 5^r
    // subtrees, 22k formatted lines, per-consumer re-execution). This pins
    // the discipline for EVERY query built on an iterative operator:
    //  - ConnectedComponents (q101/q115/q193): per-round lazy ckpt in propagate
    //  - PageRankInt (q126): inline tracked lazy ckpt per interval
    //  - BFS/LPA/k-core (q179/q184/q187): CheckpointTracker per round
    //  - KMeansLloyd (q98/q108): flat — centroids localized per round
    //  - HistogramQuantiles (q129/q174): flat — per-pass state is driver longs
    // Bound chosen at ~4× the largest healthy plan observed (q187 ≈ 25k
    // chars checkpointed vs ~1.4M un-checkpointed at 3 rounds).
    val iterative = Seq(
      "q98_kmeans_clusters", "q101_dedup_clusters", "q108_semdedup",
      "q115_canonical_dedup", "q126_pagerank", "q129_quantiles_histogram",
      "q174_equidepth_histogram", "q179_bfs_distance_census",
      "q184_label_propagation", "q187_kcore_peel", "q193_cluster_safe_split",
      "q194_bpe_vocab_trainer", "q195_bpe_tokenize_audit", "q196_ktruss_peel",
      "q199_adamic_adar", "q201_apriori_triples", "q202_luby_mis",
      "q204_markov_stationary", "q211_dup_spectrum", "q219_bradley_terry")
    val oversize = iterative.flatMap { name =>
      val len = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString.length
      if (len >= 100000) Some(s"$name: $len chars") else None
    }
    assert(oversize.isEmpty,
      s"iterative plans blew past the 100k-char bound (per-round checkpoint " +
        s"lost?):\n${oversize.mkString("\n")}")
  }

  test("q187's peel keeps a linear plan chain (checkpointed node lists, no SortAggregate)") {
    val qe = SparkEntry.queries("q187_kcore_peel")(spark, dir).queryExecution
    val exec = qe.executedPlan.toString
    // Without the per-round localCheckpoint the round-r frame embeds round
    // r-1 five times (5^r subtree blowup — the un-checkpointed plan
    // measured 22,508 formatted lines vs 905 after). A bounded plan string
    // is the cheap regression pin for that discipline.
    assert(exec.length < 100000,
      s"q187 plan blew up to ${exec.length} chars — per-round localCheckpoint lost?")
    assert(!exec.contains("SortAggregate"),
      "q187 degree/census aggregation fell off the hash path")
  }

  test("q188's Hamming stage rides the bounded-heap aggregate, not a corpus window") {
    val qe = SparkEntry.queries("q188_bq_hamming_rerank")(spark, dir).queryExecution
    val exec = qe.executedPlan.toString
    // Stage 1 (corpus-sized) must be the topk_pair ObjectHashAggregate —
    // map-side combined, <=20 rows per (query x split) through the
    // exchange. The only window allowed is the rerank over the <=100-row
    // shortlist.
    assert(exec.contains("ObjectHashAggregate"),
      "q188 stage-1 top-20 is not on the topk_pair aggregate path")
    assert(exec.contains("topk_pair"), "topk_pair missing from the executed plan")
    val windows = qe.optimizedPlan.collect { case w: LogicalWindow => w }
    assert(windows.size == 1,
      s"expected exactly the shortlist-rerank window, got ${windows.size}")
  }

  test("q189 touches the corpus exactly once (downstream runs on the checkpointed counts)") {
    val qe = SparkEntry.queries("q189_chapman_kolmogorov")(spark, dir).queryExecution
    val exec = qe.executedPlan.toString
    // The corpus pass (window + tagged hash agg) runs ONCE at construction
    // and is materialized via eager localCheckpoint; the returned plan —
    // matmul, ppm windows, full-outer diff — must therefore contain NO
    // parquet scan at all (a surviving scan would mean a branch replanned
    // the corpus window, the 3×-scan shape this query was rewritten away
    // from).
    assert(!exec.contains("Scan parquet"),
      s"q189 returned plan re-reads the corpus:\n${exec.take(2000)}")
    assert(!exec.contains("SortAggregate"),
      "q189 matrix aggregation fell off the hash path")
  }

  test("q201's surviving triples satisfy the A-Priori monotonicity bound") {
    // Downward closure is the operator's whole point: a triple's support
    // can never exceed any sub-pair's. The INNER joins enforce presence;
    // this pins the inequality (run at sf0.01 — sf0.001 has no frequent
    // triples, which would vacuously pass).
    val rows = SparkEntry.queries("q201_apriori_triples")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "expected frequent triples at sf0.01")
    val bad = rows.filter { r =>
      val sup = r.getLong(r.fieldIndex("sup"))
      sup > math.min(r.getLong(r.fieldIndex("sup_xy")),
        math.min(r.getLong(r.fieldIndex("sup_xz")),
          r.getLong(r.fieldIndex("sup_yz"))))
    }
    assert(bad.isEmpty, s"triples violating downward closure: ${bad.mkString(";")}")
  }

  test("no query plans a global (partition-less) window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"single-partition global windows (scale-killers) in: $offenders")
  }
}
