package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank over a directed multigraph — the third member of
  * the iterative family (ConnectedComponents: label propagation;
  * KMeansLloyd: centroid refinement; here: rank flow), built on the same
  * cross-engine exactness discipline: every quantity is a Long in
  * parts-per-billion, every step is integer division on non-negative
  * operands (`div` in Spark == `//` in DuckDB), so a fixed iteration count
  * replays bit-for-bit in the oracle with NO float tolerance anywhere.
  *
  * Semantics (documented deltas from textbook PageRank, chosen for exact
  * replayability):
  *  - ranks are scaled by 10⁹; init r₀(v) = 10⁹ div N;
  *  - one step: r'(v) = (15·10⁹ div 100) div N  +  (85 · Σ_{u→v} (r(u) div
  *    outdeg(u))) div 100 — floor division at each stage, applied in the
  *    SAME order in both engines;
  *  - parallel edges are kept (a customer ordering twice from a supplier
  *    contributes twice — edge multiplicity IS the weight);
  *  - dangling mass is dropped, not redistributed (every node of the
  *    symmetrized transaction graph has out-edges anyway), and floor
  *    truncation slowly leaks mass: totals are NOT conserved and nobody
  *    here pretends otherwise — ranks are an ordering signal, not a
  *    probability vector.
  *
  * Scale shape: one iteration = join(ranks, edges) on src (shuffle keyed
  * on the node id) + hash-aggregate on dst — the canonical distributed
  * PageRank step, 2 bounded-key shuffles per round, nothing driver-side.
  * `edges` and the out-degree frame are computed once and localCheckpointed
  * (the ConnectedComponents discipline: eager materialization so the k-th
  * iteration's plan does not embed k join trees), each iteration's rank
  * frame replaces the last, and every intermediate block this call pinned
  * is unpersisted explicitly before returning — only the final rank
  * frame's own checkpoint survives.
  */
object PageRankInt {

  /** Ranks after `iters` exact-integer steps. `edges`: (src, dst) Long
    * columns, parallel edges meaningful. Returns (node, rank_ppb).
    *
    * `checkpointInterval`: lineage is truncated every k-th iteration (and
    * always on the last). Short runs (the q126 default of 3) pay zero
    * intermediate checkpoints — honest benching showed the per-iteration
    * eager materialization jobs, not the joins, dominating at sf1 — while
    * long runs keep the bounded-lineage guarantee that makes 20+ rounds
    * plannable. */
  def run(edges: DataFrame, iters: Int, checkpointInterval: Int = 5): DataFrame = {
    require(iters >= 1, s"need >=1 iteration, got $iters")
    require(checkpointInterval >= 1, s"bad checkpointInterval $checkpointInterval")
    // Track which block-manager entries THIS call creates, so every
    // intermediate checkpoint (edge list, node list, mid-run rank frames)
    // can be released explicitly before returning — the ConnectedComponents
    // persist/unpersist discipline. Waiting for GC + ContextCleaner is not
    // enough: sf1 honest benching measured back-to-back q126 passes
    // degrading 5 s → 40 s as ~GBs of dead checkpoint blocks from earlier
    // passes crowded the block manager before the cleaner caught up.
    val sc = edges.sparkSession.sparkContext
    val pinnedBefore = sc.getPersistentRDDs.keySet
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    // distinct column names per frame: the per-iteration plan re-joins
    // frames that all descend from `e`, and Spark's self-join ambiguity
    // check (correctly) rejects attribute-by-lineage references there.
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("deg_node"), col("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val base = (15L * 1000000000L / 100L) / n // both divisors exact: plan literal
    var ranks = nodes.select(col("node"), lit(1000000000L / n).as("rank_ppb"))
    for (it <- 1 to iters) {
      val contrib = ranks
        .join(outdeg, col("node") === col("deg_node"))
        .select(col("node").as("u"), expr("rank_ppb div outdeg").as("c"))
      val acc = e.select(col("src").as("msg_src"), col("dst"))
        .join(contrib, col("msg_src") === col("u"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("acc"))
        .select(col("dst").as("node"), col("acc"))
      val next = nodes
        .join(acc, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"(85 * coalesce(acc, 0L)) div 100")).as("rank_ppb"))
      ranks =
        if (it % checkpointInterval == 0 || it == iters) next.localCheckpoint(true)
        else next
    }
    // `ranks` was checkpointed on the last iteration and is created last,
    // so its blocks carry the HIGHEST new RDD id; release every other
    // block this call pinned (single-threaded operator execution — no
    // concurrent persists to misattribute).
    val keep = sc.getPersistentRDDs.keySet.diff(pinnedBefore)
      .reduceOption(_ max _)
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinnedBefore.contains(id) && !keep.contains(id)) rdd.unpersist(false)
    }
    ranks
  }
}
