package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation with one-hop
  * path compression — the operator that turns pairwise near-duplicate
  * evidence (LSH/SimHash/set-similarity pairs) into dedup CLUSTERS, so a
  * pipeline can keep one canonical document per group instead of dropping
  * both ends of every pair.
  *
  * Each round: every node takes the min label over itself and its
  * neighbors, then jumps one hop through the label table
  * (label := label(label)) — the path-compression step that collapses
  * chains geometrically, so convergence is O(log diameter) rounds, not
  * O(diameter). All work is equi-joins and hash aggregates keyed on node
  * ids: shuffle-partitioned, no driver state beyond one sum per round.
  * Labels are monotonically non-increasing integers, so `sum(label)` is a
  * strictly decreasing convergence metric and the fixpoint (min id per
  * component) is unique — the result does not depend on round count.
  */
object ConnectedComponents {

  /** Label every node with the smallest id reachable from it.
    *
    * @param nodes single-column frame of node ids (isolated nodes become
    *              singleton clusters)
    * @param edges (src, dst) undirected pairs, each given once
    * @return (node, label) — label = min id of the node's component
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val idCol = nodes.columns.head
    val sym = edges.select(col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst"))
    val both = sym.union(sym.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes
      .select(col(idCol).cast("long").as("node"), col(idCol).cast("long").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var prevSum = labels.agg(sum(col("label"))).head().getLong(0)
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
      val next = stepped.as("a")
        .join(stepped.select(col("node").as("l2node"), col("label").as("l2")).as("b"),
          col("a.label") === col("l2node"))
        .select(col("a.node").as("node"), col("l2").as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val s = next.agg(sum(col("label"))).head().getLong(0)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      it += 1
    }
    both.unpersist()
    labels
  }
}
