package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered wedge join — the
  * MapReduce-era classic (Suri & Vassilvitskii, WWW'11, "Counting Triangles
  * and the Curse of the Last Reducer"), which is still the right Spark shape
  * because it kills the hub-node blowup that makes the naive wedge join
  * quadratic in the max degree:
  *
  *  1. degree census — one hash aggregate over the edge list;
  *  2. orient every undirected edge from its LOWER endpoint to its higher
  *     one under the total order (degree, node): every out-neighborhood is
  *     then O(√|E|), so total wedge volume is O(|E|^{3/2}) — without the
  *     orientation a single hub of degree d contributes C(d,2) wedges and
  *     its reducer is the job's straggler;
  *  3. wedges — self-join oriented edges on the shared source (one shuffle
  *     keyed by the apex node); each wedge's two heads are a candidate
  *     closing edge;
  *  4. close — join candidates against the canonical edge set. Each
  *     triangle has exactly ONE apex that precedes both other corners in
  *     the (degree, node) order, so every triangle is counted exactly once
  *     with no /3 correction and no duplicate elimination.
  *
  * The reference (`/root/reference/lambda_function.py:1-148`) has no graph
  * surface at all; this is engine-surface work mandated by the north star.
  * Wedge and edge counts ride in-band as the operator's own scaling probe:
  * they are exact functions of the data, immune to wall-clock noise.
  */
object TriangleCount {

  /** `edges`: undirected edge list with long columns `u`, `v` (any order,
    * duplicates allowed — canonicalized and deduplicated here, self-loops
    * dropped). Returns one row:
    * (n_nodes, n_edges, n_wedges, n_triangles). */
  def census(edges: DataFrame): DataFrame =
    censusCanonical(edges
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("x"),
        greatest(col("u"), col("v")).as("y"))
      .distinct(), null)

  /** [[census]] over an ALREADY-canonical edge list (x < y, distinct,
    * self-loop-free — e.g. [[CoPurchaseGraph.edges]]). When `ck` is
    * non-null, the multi-consumer intermediates (degree table: 3 readers;
    * oriented edges: both wedge-join sides) are lazily checkpointed
    * through it — round-16 measurement showed the UN-checkpointed census
    * re-executing the whole edge derivation once per consumer because
    * static ReuseExchange does not unify the structurally-identical
    * subtrees (plans/r16/q162_*_before.txt: four lineitem self-join +
    * distinct executions in one query). The caller owns the tracker
    * contract (one eager action on the final frame, then releaseAll). */
  def censusCanonical(canon0: DataFrame, ck: CheckpointTracker): DataFrame = {
    val ckpt: DataFrame => DataFrame =
      if (ck == null) identity else ck.lazyCkpt
    val canon = canon0

    // Degree census. The degree table is |V| rows — shuffle-joined by node
    // key below, never broadcast: at 100 TB |V| can be billions. Three
    // consumers (both orientation joins + the node/edge census) ⇒
    // checkpointed when a tracker is supplied.
    val deg = ckpt(canon.select(col("x").as("node"))
      .unionAll(canon.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg")))

    // Orient by the (deg, node) total order. Two node-keyed shuffle joins;
    // AQE is free to pick broadcast when the graph is actually small.
    // Two consumers (both wedge-join sides) ⇒ checkpointed when tracked.
    val oriented = ckpt(canon
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
      .select(
        when(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")), col("x"))
          .otherwise(col("y")).as("src"),
        when(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")), col("y"))
          .otherwise(col("x")).as("dst")))

    // Wedges: both heads of an apex's out-neighborhood, ordered dst1 < dst2
    // so each unordered head pair appears once.
    val wedges = oriented.as("a")
      .join(oriented.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .select(col("a.dst").as("x"), col("b.dst").as("y"))

    // Node and edge counts ride ONE pass over the degree table (handshake
    // lemma: Σdeg = 2|E|), and wedge + triangle counts ride ONE left join
    // of the wedges against the canonical edge set — each wedge row is
    // counted, and it closes a triangle iff the edge marker matched.
    // (Wedge (x, y) pairs are distinct per apex and the edge set is
    // distinct, so join multiplicity IS triangle multiplicity.) Two
    // aggregate branches total, instead of the naive four census passes
    // that would re-derive the edge list four times.
    val nodeEdge = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("deg")) / 2).cast("long").as("n_edges"))
    val wedgeTri = wedges
      .join(canon.withColumn("hit", lit(1L)), Seq("x", "y"), "left")
      .agg(count(lit(1)).as("n_wedges"),
        coalesce(sum(col("hit")), lit(0L)).as("n_triangles"))

    nodeEdge.crossJoin(wedgeTri)
  }
}
