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
  * `edges` and the node list are localCheckpointed LAZILY (plan truncation
  * without a standalone materialization job — blocks fill in during the one
  * convergence action), each iteration's rank frame replaces the last, and
  * every intermediate block this call pinned is unpersisted explicitly
  * before returning — only the final rank frame's own checkpoint survives.
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
    // Track EXACTLY which block-manager entries THIS call creates (delta of
    // getPersistentRDDs around each localCheckpoint, not one global diff at
    // the end), so every intermediate block (edge list, node list, mid-run
    // rank frames) can be released explicitly before returning without ever
    // touching an RDD some other computation on the shared context pinned.
    // Waiting for GC + ContextCleaner is not enough: sf1 honest benching
    // measured back-to-back q126 passes degrading 5 s → 40 s as ~GBs of
    // dead checkpoint blocks crowded the block manager before the cleaner
    // caught up.
    val sc = edges.sparkSession.sparkContext
    val mine = scala.collection.mutable.LinkedHashSet[Int]()
    var lastCkpt: Set[Int] = Set.empty
    // Lazy (eager = false) checkpoints: the plan is truncated to a
    // LogicalRDD immediately (bounded plan depth + self-join safety), but
    // materialization folds into whatever action consumes the frame — no
    // standalone eager job per truncation. At q126's iteration count the
    // whole run is therefore nodes.count() plus ONE convergence job (the
    // final eager checkpoint); honest benching showed those extra eager
    // materialization jobs, not the joins, dominating sf1 wall time.
    def ckpt(df: DataFrame, eager: Boolean): DataFrame = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(eager)
      lastCkpt = sc.getPersistentRDDs.keySet.diff(before).toSet
      mine ++= lastCkpt
      out
    }
    val e = ckpt(edges.select(col("src").cast("long"), col("dst").cast("long")), eager = false)
    // distinct column names per frame: the per-iteration plan re-joins
    // frames that all descend from `e`, and Spark's self-join ambiguity
    // check (correctly) rejects attribute-by-lineage references there.
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("deg_node"), col("outdeg"))
    val nodes = ckpt(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct(), eager = false)
    val n = nodes.count() // materializes the lazy `nodes` blocks as a side effect
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
        if (it % checkpointInterval == 0 || it == iters)
          // only the FINAL checkpoint is eager — it is the convergence
          // action, and computing it materializes every lazy intermediate
          // checkpoint (e, nodes, mid-run ranks) within the same job.
          ckpt(next, eager = it == iters)
        else next
    }
    // Release every block this call pinned except the final ranks
    // checkpoint (`lastCkpt` — recorded as the delta of that exact call,
    // so a concurrent foreign persist is never misattributed or touched).
    val persisted = sc.getPersistentRDDs
    (mine.toSet -- lastCkpt).foreach { id =>
      persisted.get(id).foreach(_.unpersist(false))
    }
    ranks
  }
}
