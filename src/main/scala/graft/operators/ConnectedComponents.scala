package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the operator that turns pairwise
  * near-duplicate evidence (LSH/SimHash/set-similarity pairs) into dedup
  * CLUSTERS, so a pipeline can keep one canonical document per group
  * instead of dropping both ends of every pair.
  *
  * Hybrid execution, chosen by measured edge count (the count also pins the
  * persisted edge list, which is typically an expensive upstream pipeline):
  *
  *  - **small edge sets** (≤ `localEdgeThreshold`, default 2²⁰ pairs ≈ a
  *    few MB) run union-find on the driver. Even at 100 TB of corpus the
  *    EDGE list after LSH verification is tiny relative to the corpus, and
  *    a distributed iteration would be pure scheduler latency; this is the
  *    same algorithm-switch GraphFrames applies.
  *  - **large edge sets** run iterative min-label propagation with one-hop
  *    path compression (label := label(label)), collapsing chains
  *    geometrically: O(log diameter) rounds of equi-joins and hash
  *    aggregates keyed on node ids — shuffle-partitioned, no driver state
  *    beyond one sum per round.
  *
  * Isolated nodes never enter either path: in a dedup graph they are the
  * overwhelming majority of the corpus, so the working set is O(nodes
  * touching an edge), not O(corpus); they rejoin as self-labeled
  * singletons at the end.
  *
  * Both paths reach the identical unique fixpoint (min id per component) —
  * labels only decrease, so `sum(label)` is a strictly decreasing
  * convergence metric and the result does not depend on round count.
  * ConnectedComponentsSpec pins both paths to a reference union-find.
  */
object ConnectedComponents {

  /** Label every node with the smallest id reachable from it.
    *
    * @param nodes single-column frame of node ids (isolated nodes become
    *              singleton clusters)
    * @param edges (src, dst) undirected pairs, each given once
    * @return (node, label) — label = min id of the node's component
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIters: Int = 20,
      localEdgeThreshold: Long = 1L << 20): DataFrame = {
    val idCol = nodes.columns.head
    val allNodes = nodes.select(col(idCol).cast("long").as("node"))
    // Persist and materialize the projected edge list ONCE, eagerly: the
    // edge input is typically an expensive pipeline (q101 feeds the whole
    // LSH near-dup chain in here), and without this every downstream
    // join/broadcast — plus the mirrored union branch — would walk that
    // lineage again. The count both pins the cache and sizes the plan.
    // Edges are restricted to endpoints present in `nodes` so both
    // execution paths see the identical graph (the driver path would
    // otherwise happily propagate through ids the caller filtered out).
    val sym = edges
      .select(col(edges.columns(0)).cast("long").as("src"),
        col(edges.columns(1)).cast("long").as("dst"))
      .join(allNodes.select(col("node").as("src")), Seq("src"), "left_semi")
      .join(allNodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = sym.count()
    val both = sym.union(sym.select(col("dst").as("src"), col("src").as("dst")))
    val touched = both.select(col("src").as("node")).distinct()
    // core labels cover touched nodes only and are fully materialized (a
    // local relation, or the loop's persisted final frame) before `sym` is
    // released below — the returned frame's lineage must NOT reach back
    // into the edge pipeline, or the caller's first action re-runs it.
    val core =
      if (edgeCount <= localEdgeThreshold) localUnionFind(nodes, sym)
      else propagate(both, allNodes, touched, maxIters)
    val result = allNodes
      .join(core.select(col("node"), col("label")), Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    // Honest + leak-free: without this, the cached edge list both
    // accumulates across calls AND gets silently REUSED by later identical
    // plans (Spark's CacheManager matches canonicalized plans), making
    // repeat timings look ~4x faster than a fresh run actually is.
    sym.unpersist()
    result
  }

  /** Driver-side union-find with path compression over a collected edge
    * list — exact same fixpoint as [[propagate]], none of its per-round
    * scheduling latency. Bounded by `localEdgeThreshold` (edges only; the
    * corpus itself never leaves the executors). */
  private def localUnionFind(nodes: DataFrame, sym: DataFrame): DataFrame = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent.getOrElse(root, root)
      var cur = x // compress the walked path
      while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    val endpoints = scala.collection.mutable.SortedSet.empty[Long]
    sym.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      endpoints += a += b
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // every edge endpoint gets a label — roots never appear as keys in
    // `parent`, so iterate the endpoint set, not the parent map
    val rows: java.util.List[Row] =
      java.util.Arrays.asList(endpoints.toSeq.map(n => Row(n, find(n))): _*)
    nodes.sparkSession.createDataFrame(rows, StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("label", LongType, nullable = false))))
  }

  /** Distributed min-label propagation + one-hop compression.
    *
    * Per-round frames go through [[CheckpointTracker.lazyCkpt]], not
    * `.persist`: persist caches EXECUTION but the round-r logical plan
    * still embeds round r−1 four-to-five times (two joins + the
    * compression self-join), so analysis/canonicalization cost grows
    * geometrically with rounds — the q187/q179/q184 lineage blowup, here
    * one layer down. The lazy checkpoint truncates the plan to a
    * LogicalRDD immediately; each round's convergence action (the label
    * sum) materializes its blocks, after which the PREVIOUS round's
    * blocks are dead and released — bounded plan depth AND bounded
    * block-manager footprint at any round count. */
  private def propagate(both: DataFrame, allNodes: DataFrame,
      touched: DataFrame, maxIters: Int): DataFrame = {
    val tracker = new CheckpointTracker(both)
    def release(dead: Set[Int]): Unit = {
      val live = both.sparkSession.sparkContext.getPersistentRDDs
      dead.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
    }
    var labels = tracker.lazyCkpt(allNodes.join(touched, Seq("node"), "left_semi")
      .select(col("node"), col("node").as("label")))
    var prevBlocks = tracker.lastCkpt
    // Sentinel, not a measured sum: label sums are non-negative, so -1
    // never matches and the first round runs unconditionally.
    var prevSum = -1L
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val nbrMin = both
        .join(labels.select(col("node").as("dst"), col("label").as("nl")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("nl")).as("nmin"))
      val stepped = labels
        .join(nbrMin.select(col("src").as("node"), col("nmin")), Seq("node"), "left")
        .select(col("node"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // one-hop compression: label := label(label). label(x) <= x, so the
      // looked-up value can only be smaller.
      val next = tracker.lazyCkpt(stepped.as("a")
        .join(stepped.select(col("node").as("l2node"), col("label").as("l2")).as("b"),
          col("a.label") === col("l2node"))
        .select(col("a.node").as("node"), col("l2").as("label")))
      val thisBlocks = tracker.lastCkpt
      // The sum is the convergence metric AND the action that materializes
      // this round's lazy blocks; only after it returns is the previous
      // round's frame dead (next no longer recomputes through it).
      val s = next.agg(sum(col("label"))).head().getLong(0)
      release(prevBlocks)
      prevBlocks = thisBlocks
      labels = next
      converged = s == prevSum
      prevSum = s
      it += 1
    }
    // The docstring's fixpoint guarantee only holds if the loop actually
    // converged; silently returning mid-propagation labels would hand the
    // caller WRONG components. Fail fast like Bench's prefix-collision
    // require — maxIters is a runaway bound, not an accuracy dial.
    if (!converged) {
      tracker.releaseAll()
      throw new IllegalStateException(
        s"connected components did not reach the min-label fixpoint in $maxIters rounds; " +
          "raise maxIters (rounds needed ~ log2 of the largest component's diameter)")
    }
    // Hand back the final labels WITHOUT leaving tracked blocks behind:
    // the eager localCheckpoint copies the (already materialized) final
    // round out of the tracker's blocks, truncates its lineage (so the
    // releaseAll below cannot trigger a recompute), its blocks are
    // released by GC/ContextCleaner when the caller drops the frame, and —
    // unlike .persist — it is never silently substituted into later
    // identical plans by CacheManager (the bench-honesty trap the eager
    // edge-list unpersist in run() guards).
    val out = labels.localCheckpoint(true)
    tracker.releaseAll()
    out
  }
}
