package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-shaped engine surface beyond q101's connected components and
  * q126's PageRank: triangle counting over a data-derived co-purchase
  * graph. The reference (`lambda_function.py:1-148`) has no graph
  * capability; this is north-star engine-surface work.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q162
  /** Triangle census of the part co-purchase graph — the clustering/
    * community signal (and the classic "curse of the last reducer"
    * benchmark). Nodes are parts; an undirected edge connects two parts
    * that appear in the same order. Edges are derived from the first three
    * lineitems of each order (l_linenumber ≤ 3), so pair fan-out per order
    * is ≤ C(3,2) = 3 and the edge list grows LINEARLY with orders — the
    * unrestricted per-order pair explosion would grow with Σ C(items,2).
    *
    * Counting runs on [[graft.operators.TriangleCount]]: degree-ordered
    * orientation caps every out-neighborhood at O(√|E|), the wedge join
    * shuffles on the apex key, and each triangle is counted at its unique
    * (degree, node)-minimal apex — no /3 correction, no dedup pass.
    * Measured probe surface rides in the result row itself: n_edges and
    * n_wedges are exact work-volume counters (ScalingProbe discipline —
    * measured edges 21,594 at sf0.01 → 220,677 at sf0.1, 10.2× at 10×
    * data; degree stays bounded by co-purchase frequency, so wedge volume
    * tracks edges, not degree²).
    *
    * Oracle: brute-force 3-way self-join over the same canonical edge set
    * (a<b<c) — the quadratic witness that proves the oriented wedge join
    * result-invariant. */
  private val q162: Q = (s, d) => {
    // Round 16: the edge derivation + census intermediates are derived ONCE
    // through the shared CoPurchaseGraph/CheckpointTracker path — the old
    // un-checkpointed plan executed the lineitem self-join + DISTINCT four
    // times (once per census consumer; static ReuseExchange does not unify
    // the identical subtrees — plans/r16/q162_*_before.txt vs _after.txt).
    // The derivation already yields canonical x < y distinct pairs, so the
    // census skips its own canonicalization pass. Oracle SQL unchanged.
    val ck = new graft.operators.CheckpointTracker(Tables.lineitem(s, d))
    val canon = graft.operators.CoPurchaseGraph.edges(s, d, ck)
    // One eager action runs the census while the lazy blocks are alive;
    // the 1-row result outlives them (CheckpointTracker contract).
    val out = graft.operators.TriangleCount.censusCanonical(canon, ck)
      .localCheckpoint(true)
    ck.releaseAll()
    out
  }

  private val q162Sql =
    """WITH e0 AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
      |            WHERE l_linenumber <= 3),
      |ed AS (SELECT DISTINCT a.p AS x, b.p AS y
      |       FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p),
      |deg AS (SELECT node, COUNT(*) AS deg FROM (
      |          SELECT x AS node FROM ed UNION ALL SELECT y AS node FROM ed)
      |        GROUP BY node),
      |ori AS (SELECT CASE WHEN (dx.deg, e.x) < (dy.deg, e.y) THEN e.x ELSE e.y END AS src,
      |               CASE WHEN (dx.deg, e.x) < (dy.deg, e.y) THEN e.y ELSE e.x END AS dst
      |        FROM ed e JOIN deg dx ON dx.node = e.x JOIN deg dy ON dy.node = e.y),
      |wed AS (SELECT a.dst AS x, b.dst AS y FROM ori a JOIN ori b
      |        ON a.src = b.src AND a.dst < b.dst)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM ed) AS n_edges,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM wed) AS n_wedges,
      |       (SELECT CAST(COUNT(*) AS BIGINT)
      |        FROM ed e1 JOIN ed e2 ON e1.y = e2.x
      |                   JOIN ed e3 ON e3.x = e1.x AND e3.y = e2.y) AS n_triangles""".stripMargin

  // ---------------------------------------------------------------- q179
  /** Multi-source BFS distance census — the reachability-DEPTH operator
    * completing the graph family (q101's connected components answer
    * "same cluster?", q126's PageRank "how central?", q162's triangles
    * "how clustered?"; this answers "how FAR from a seed set?"). Seeds
    * are the p_size = 1 parts; the graph is q162's part co-purchase graph
    * (same derivation, same l_linenumber ≤ 3 linear-growth bound, here
    * symmetrized since distance is undirected). Three rounds of
    * min-distance relaxation — dist_{r+1}(v) = min(dist_r(v),
    * 1 + min over neighbors u of dist_r(u)) — then a census per distance:
    * node count and the min/max part key as exact witnesses, with
    * unreached parts in the −1 bucket (the part TABLE is the node
    * universe, so isolated parts are counted, not silently dropped).
    *
    * Scale shape: each round is one shuffle join (frontier ⋈ edges, keyed
    * on the node id) + one min-aggregate — the canonical distributed BFS
    * step, state bounded by one (node, dist) row per node; nothing
    * driver-side anywhere. A fixed round count is the portable contract
    * (q126 precedent): 3 rounds = "within 3 hops", the decontamination
    * radius a curation pipeline actually queries ("everything within k
    * co-purchase hops of a poisoned part"). The oracle replays the rounds
    * as unrolled CTEs over the same edge relation. */
  private val q179: Q = (s, d) => {
    // round r references dist_{r-1} TWICE (union arm + relaxation join),
    // so without truncation the plan doubles per round and the final
    // census re-executes the whole chain (measured 11.0 s → 0.9 s
    // isolated at sf1); the tracked release below keeps those blocks
    // from outliving construction and evicting neighbours' working sets
    // (the CheckpointTracker contract). Round 16: the edge list itself is
    // ALSO checkpointed (CoPurchaseGraph.edges) — each of the three
    // relaxation rounds joins `sym`, and the un-checkpointed plan
    // re-derived the lineitem self-join + DISTINCT once per round.
    val ck = new graft.operators.CheckpointTracker(Tables.lineitem(s, d))
    val ed = graft.operators.CoPurchaseGraph.edges(s, d, ck)
    val sym = ed.select(col("x"), col("y"))
      .unionByName(ed.select(col("y").as("x"), col("x").as("y")))
    val part = Tables.part(s, d)
    var dist = part.filter(col("p_size") === 1)
      .select(col("p_partkey").as("node"), lit(0L).as("dist"))
    for (_ <- 1 to 3) {
      val step = dist.join(sym, col("node") === col("x"))
        .select(col("y").as("node"), (col("dist") + 1L).as("dist"))
      dist = ck.lazyCkpt(dist.unionByName(step).groupBy(col("node"))
        .agg(min(col("dist")).as("dist")))
    }
    val census = part.select(col("p_partkey").as("node"))
      .join(dist, Seq("node"), "left")
      .select(col("node"), coalesce(col("dist"), lit(-1L)).as("dist"))
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("node")).as("min_part"), max(col("node")).as("max_part"))
      .localCheckpoint(true)   // one action runs the whole relaxation
    ck.releaseAll()
    census.orderBy(col("dist"))
  }

  private val q179Sql = {
    def round(prev: String, out: String): String =
      s"""$out AS (SELECT node, MIN(dist) AS dist FROM (
         |    SELECT node, dist FROM $prev
         |    UNION ALL
         |    SELECT sym.y AS node, $prev.dist + 1 AS dist
         |    FROM $prev JOIN sym ON sym.x = $prev.node)
         |  GROUP BY node)""".stripMargin
    s"""WITH e0 AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
       |            WHERE l_linenumber <= 3),
       |ed AS (SELECT DISTINCT a.p AS x, b.p AS y
       |       FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p),
       |sym AS (SELECT x, y FROM ed UNION ALL SELECT y, x FROM ed),
       |d0 AS (SELECT p_partkey AS node, CAST(0 AS BIGINT) AS dist
       |       FROM part WHERE p_size = 1),
       |${round("d0", "d1")},
       |${round("d1", "d2")},
       |${round("d2", "d3")}
       |SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |       MIN(node) AS min_part, MAX(node) AS max_part
       |FROM (SELECT p.p_partkey AS node, COALESCE(d3.dist, -1) AS dist
       |      FROM part p LEFT JOIN d3 ON d3.node = p.p_partkey)
       |GROUP BY dist ORDER BY dist""".stripMargin
  }

  // ---------------------------------------------------------------- q184
  /** Label-propagation communities — the COMMUNITY member completing the
    * graph family: q101's components answer "connected at all?", q126's
    * PageRank "how central?", q162's triangles "how clustered?", q179's
    * BFS "how far?"; this answers "which densely-linked group?" —
    * components merge through any single bridge edge, LPA does not.
    * Raghavan et al.'s algorithm made deterministic for the oracle
    * contract: labels start as node ids; each SYNCHRONOUS round every
    * node adopts the MODE of its neighbors' labels (ties → smallest
    * label — q115's argmax-with-tiebreak packed into ONE BIGINT via
    * [[graft.functions.PackedArgMin]] (`-cnt * 2^40 + label`), so the
    * per-node winner rides `min(long)` on the true HashAggregate path:
    * a struct-typed min would fall back to SortAggregate and pay two
    * sorts of the |E| vote rows per round — the round-10 verdict
    * measured that as this query's dominant cost), isolated
    * nodes keep their own label; 3 fixed rounds (the q126/q179
    * portable-round contract). Bounds guarded per PackedArgMin.guard:
    * labels are part keys (< 2^40), vote counts are degrees (≤ 2^22).
    * Census: community-size histogram with min/max
    * label witnesses — bounded by the number of DISTINCT sizes, not
    * communities.
    *
    * Scale shape per round: one shuffle join (labels ⋈ edges, node key)
    * producing |E| vote rows, two hash aggregations (vote count, argmax),
    * one left join back to the node universe — all linear in edges, the
    * same posture as q179; nothing driver-side. Round 1 skips its join
    * outright: the initial labeling is the identity over the part
    * universe, so lab⋈sym IS sym with x as the label. */
  private val q184: Q = (s, d) => {
    // Round 16: edge list checkpointed once (CoPurchaseGraph.edges) — the
    // vote joins of rounds 2-3 each re-derived the lineitem self-join +
    // DISTINCT before (round 1 skips its join by the identity argument).
    val ck = new graft.operators.CheckpointTracker(Tables.lineitem(s, d))
    val ed = graft.operators.CoPurchaseGraph.edges(s, d, ck)
    val sym = ed.select(col("x"), col("y"))
      .unionByName(ed.select(col("y").as("x"), col("x").as("y")))
    var lab = Tables.part(s, d)
      .select(col("p_partkey").as("node"), col("p_partkey").as("label"))
    for (round <- 1 to 3) {
      import graft.functions.PackedArgMin
      // Round 1's labels are the IDENTITY map over the part universe (and
      // every edge endpoint is a part key), so lab⋈sym degenerates to sym
      // itself with x as the label — skip the |E|-row shuffle join
      // entirely; rounds 2-3 join as usual. The oracle keeps the generic
      // join in its CTE (same rows by the identity argument).
      val voteRows =
        if (round == 1) sym.select(col("y").as("node"), col("x").as("label"))
        else lab.join(sym, col("node") === col("x"))
          .select(col("y").as("node"), col("label"))
      val votes = voteRows
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val won = PackedArgMin.guard(votes, -col("c"), col("label"), 40, "q184 LPA vote")
        .groupBy(col("node"))
        .agg(min(PackedArgMin.pack(-col("c"), col("label"), 40)).as("w"))
        .select(col("node"), PackedArgMin.payload(col("w"), 40).as("won"))
      // same truncation discipline as q179/q187: round r references
      // lab_{r-1} twice (vote join + fallback coalesce join), so the
      // un-checkpointed chain grows geometrically and re-executes per
      // consumer (measured 14.1 s → 0.9 s isolated at sf1); tracked and
      // released below per the CheckpointTracker contract. One (node,
      // label) row per part through the block manager per round.
      lab = ck.lazyCkpt(lab.join(won, Seq("node"), "left")
        .select(col("node"), coalesce(col("won"), col("label")).as("label")))
    }
    val census = lab.groupBy(col("label")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz"))
      .agg(count(lit(1)).as("n_communities"),
        min(col("label")).as("min_label"), max(col("label")).as("max_label"))
      .localCheckpoint(true)   // one action runs the three rounds
    ck.releaseAll()
    census.orderBy(col("sz"))
  }

  private val q184Sql = {
    def round(prev: String, out: String): String =
      s"""$out AS (SELECT a.node, COALESCE(w.label, a.label) AS label
         |  FROM $prev a LEFT JOIN (
         |    SELECT node, label FROM (
         |      SELECT v.node, v.label,
         |             ROW_NUMBER() OVER (PARTITION BY v.node
         |                                ORDER BY v.c DESC, v.label) AS rn
         |      FROM (SELECT sym.y AS node, p.label, COUNT(*) AS c
         |            FROM $prev p JOIN sym ON sym.x = p.node
         |            GROUP BY 1, 2) v) WHERE rn = 1) w
         |  ON w.node = a.node)""".stripMargin
    s"""WITH e0 AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
       |            WHERE l_linenumber <= 3),
       |ed AS (SELECT DISTINCT a.p AS x, b.p AS y
       |       FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p),
       |sym AS (SELECT x, y FROM ed UNION ALL SELECT y, x FROM ed),
       |l0 AS (SELECT p_partkey AS node, p_partkey AS label FROM part),
       |${round("l0", "l1")},
       |${round("l1", "l2")},
       |${round("l2", "l3")}
       |SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_communities,
       |       MIN(label) AS min_label, MAX(label) AS max_label
       |FROM (SELECT label, CAST(COUNT(*) AS BIGINT) AS sz FROM l3 GROUP BY label)
       |GROUP BY sz ORDER BY sz""".stripMargin
  }

  // ---------------------------------------------------------------- q187
  /** k-core peel — the DENSITY-FLOOR member of the graph family: q101's
    * components answer "connected at all?", q126's PageRank "how
    * central?", q162's triangles "how clustered?", q179's BFS "how far?",
    * q184's LPA "which group?"; this answers "which nodes survive a
    * minimum-engagement floor?" — the standard spam/fringe filter before
    * any community or centrality pass (a node with 30 co-purchase
    * neighbors that all hang off degree-1 stragglers is not a hub). The
    * graph is q162's part co-purchase graph (same l_linenumber ≤ 3
    * linear-growth derivation). Matula–Beck peeling made portable: each
    * SYNCHRONOUS round keeps the nodes whose degree in the CURRENT
    * surviving subgraph is ≥ k = 16 (≈ the corpus median degree, so the
    * peel bites at every SF), then restricts edges to kept×kept; 3 fixed
    * rounds (the q126/q179/q184 portable-round contract — full
    * convergence is a fixpoint, the bounded-round prefix is the
    * replayable artifact). Census per round: surviving node count, edge
    * count, min/max node witnesses — 3 rows total.
    *
    * Scale shape per round: one degree hash-agg over the edge list (|E|
    * rows, map-side combined) + two LEFT SEMI joins keyed on the node id
    * (the canonical "restrict edges to a node set" shape — no row
    * multiplication, shuffle bounded by |E|; AQE broadcasts the kept-node
    * list while it fits, falls back to shuffled semi joins beyond). Each
    * round's kept-node list is localCheckpointed LAZILY (the PageRankInt
    * discipline): without it the round-r frame embeds round r−1 FIVE
    * times (left side + twice in each of the two semi-join build sides),
    * a 5^r plan-tree blowup; with it the edge chain is linear and the
    * node-list blocks are computed once and re-read by every census
    * branch. The edge derivation's distinct() exchange is likewise
    * planned once and re-read via ReusedExchange — all three rounds live
    * in one plan tree, nothing driver-side. The oracle replays the peel
    * as unrolled CTEs. */
  private val q187: Q = (s, d) => {
    val K = 16
    // Round 16: the round-1 edge list is checkpointed (CoPurchaseGraph
    // .edges) — it has three consumers (both degree-union arms + the
    // semi-join restriction), each of which re-derived the lineitem
    // self-join + DISTINCT before.
    val ck = new graft.operators.CheckpointTracker(Tables.lineitem(s, d))
    val ed = graft.operators.CoPurchaseGraph.edges(s, d, ck)
    var edges = ed
    val rounds = (1 to 3).map { r =>
      val keep = ck.lazyCkpt(edges.select(col("x").as("node"))
        .unionByName(edges.select(col("y").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= K)
        .select(col("node")))
      // the surviving edge list is ALSO lazily checkpointed: round r's
      // census and round r+1's degree agg both read it, and without the
      // truncation the round-3 census re-executes all six semi joins of
      // the chain (measured 4.3 s → 1.1 s isolated at sf1; blocks are
      // ≤|E| (x, y) pairs per round — ~50 MB at sf1, tracked and
      // released below per the CheckpointTracker contract)
      val e2 = ck.lazyCkpt(edges
        .join(keep.select(col("node").as("kx")),
          col("x") === col("kx"), "left_semi")
        .join(keep.select(col("node").as("ky")),
          col("y") === col("ky"), "left_semi"))
      edges = e2
      keep.agg(count(lit(1)).as("n_nodes"),
          min(col("node")).as("min_node"), max(col("node")).as("max_node"))
        .crossJoin(e2.agg(count(lit(1)).as("n_edges")))
        .select(lit(r.toLong).as("round"), col("n_nodes"), col("n_edges"),
          col("min_node"), col("max_node"))
    }
    val census = rounds.reduce(_ unionByName _)
      .localCheckpoint(true)   // one action runs the whole peel
    ck.releaseAll()
    census.orderBy(col("round"))
  }

  private val q187Sql = {
    def round(prevE: String, n: String, e: String): String =
      s"""$n AS (SELECT node FROM (
         |    SELECT x AS node FROM $prevE UNION ALL SELECT y FROM $prevE)
         |  GROUP BY node HAVING COUNT(*) >= 16),
         |$e AS (SELECT x, y FROM $prevE
         |  WHERE x IN (SELECT node FROM $n) AND y IN (SELECT node FROM $n))""".stripMargin
    def census(r: Int, n: String, e: String): String =
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $n) AS n_nodes,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $e) AS n_edges,
         |  (SELECT MIN(node) FROM $n) AS min_node,
         |  (SELECT MAX(node) FROM $n) AS max_node""".stripMargin
    s"""WITH e0 AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
       |            WHERE l_linenumber <= 3),
       |ed AS (SELECT DISTINCT a.p AS x, b.p AS y
       |       FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p),
       |${round("ed", "n1", "e1")},
       |${round("e1", "n2", "e2")},
       |${round("e2", "n3", "e3")}
       |${census(1, "n1", "e1")}
       |UNION ALL ${census(2, "n2", "e2")}
       |UNION ALL ${census(3, "n3", "e3")}
       |ORDER BY round""".stripMargin
  }

  // ---------------------------------------------------------------- q196
  /** k-truss peel (Cohen 2008) — the EDGE-strength refinement of q187's
    * node-degree k-core and the seventh graph operator: each synchronous
    * round computes every edge's triangle SUPPORT (how many triangles of
    * the current surviving subgraph contain it) and keeps edges with
    * support ≥ 2 (k-truss with k = 4 — the peel bites at every SF:
    * measured 12,272→11,027→10,901 surviving edges at sf0.01,
    * 114,489→112,857→112,843 at sf0.1). Where k-core keeps nodes with
    * many neighbors, k-truss keeps edges EMBEDDED IN TRIANGLES — the
    * community-backbone filter that survives degree-1 stragglers and
    * hub-and-spoke noise alike. 3 fixed rounds (the q126/q179/q184/q187
    * portable-round contract). Census per round: surviving edges, their
    * distinct endpoints, pre-peel triangle count, pre-peel max support.
    *
    * Scale shape (round-15 delta rewrite): round 1 enumerates triangles
    * ONCE via [[graft.operators.TriangleCount]]'s degree-ordered
    * orientation — the wedge join is keyed on the apex and every
    * out-neighborhood is O(√|E|), so wedge volume is O(|E|^{3/2}) with
    * no hub blowup; the closing check is one LEFT SEMI join against the
    * canonical edge set on a packed u·2²¹+v BIGINT key; support is a
    * hash agg over 3·|triangles| exploded PACKED edge keys (the q201
    * single-long-shuffle-key lever; the [0, 2^21) guard rides the edge
    * frame in-band, struct-key fallback documented past 2M parts).
    * Rounds 2-3 then recompute NOTHING from scratch: an edge's support
    * changes only if a triangle through it lost an edge, so each delta
    * round (a) marks DEAD triangles — those containing a peeled
    * (support < k−2) edge — by one semi-join of the (tk, ek) frame
    * against the peeled set plus a DISTINCT on the 63-bit packed
    * triangle id tk = apex·2⁴² + wx·2²¹ + wy (a triangle holding 2+
    * peeled edges dies once), (b) subtracts each dead triangle's 3
    * edge-key contributions from the surviving supports — the loss agg
    * and the subtract join are DELTA-sized — and (c) prunes the
    * triangle list by LEFT ANTI on tk, skipped entirely for the final
    * round because the census triangle count follows arithmetically
    * (|tri_{r+1}| = |tri_r| − |dead|, a 1-row lazy frame) — textbook
    * k-truss maintenance (the r14 verdict's prescription; the old form
    * redid the full wedge join on an edge set that shrinks only
    * ~10%/round, 12,272→11,027→10,901 at sf0.01). The census is
    * set-identical to the recompute-from-scratch peel: tri_{r+1} =
    * tri_r minus dead (a no-triangle peeled edge kills nothing, and the
    * triangle SET is orientation-invariant even though degrees change
    * across rounds), and sup_{r+1} = sup_r − loss on surviving edges —
    * 0-support rows affect neither the max (coalesce handles the empty
    * case) nor the keep-filter. Round frames ((tk, ek) lists, supports,
    * dead ids) are lazily checkpointed (the round-12 iterative
    * discipline). The oracle
    * replays the peel as unrolled MATERIALIZED CTEs (DuckDB re-inlines
    * multiply-referenced CTEs otherwise — 242 s → 0.1 s at sf0.01) with
    * the q162 brute 3-way-join triangle enumeration as the per-round
    * witness — deliberately the full recompute, so it also witnesses the
    * delta identity. */
  private val q196: Q = (s, d) => {
    val MinSup = 2
    val P = 2097152L
    // Round 16: the shared CoPurchaseGraph derivation (packed-key distinct,
    // checkpointed once) replaces the inline one; its in-band Guard pins
    // the same [0, 2^21) bound the packed keys below rely on.
    val ck = new graft.operators.CheckpointTracker(Tables.lineitem(s, d))
    val edges = graft.operators.CoPurchaseGraph.edges(s, d, ck)
    // ---- round 1: the one full enumeration ----
    val deg = edges.select(col("x").as("node"))
      .unionByName(edges.select(col("y").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val lower = col("dx") < col("dy") ||
      (col("dx") === col("dy") && col("x") < col("y"))
    // checkpointed: the wedge self-join reads it TWICE, and each rebuild
    // would redo the degree agg plus both degree joins
    val oriented = ck.lazyCkpt(edges
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
      .select(when(lower, col("x")).otherwise(col("y")).as("src"),
        when(lower, col("y")).otherwise(col("x")).as("dst")))
    // One row per (triangle, edge): the triangle at its unique
    // (deg, node)-minimal apex, packed into a 63-bit id
    // tk = apex·2⁴² + wx·2²¹ + wy, exploded over its 3 packed edge keys
    // ek = u·2²¹ + v (u < v). This (tk, ek) frame IS the round state:
    // every delta join below is keyed on ONE long (the struct keys of
    // the first cut pushed estimated build sides over the broadcast
    // threshold and forced full shuffles), |triE| = 3·|tri| exactly, so
    // the census triangle count is count(triE) div 3.
    var triE = ck.lazyCkpt(oriented.as("a")
      .join(oriented.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .select(col("a.src").as("apex"), col("a.dst").as("wx"), col("b.dst").as("wy"))
      .join(edges.select((col("x") * lit(P) + col("y")).as("wk")),
        (col("wx") * lit(P) + col("wy")) === col("wk"), "left_semi")
      .select((col("apex") * lit(P * P) + col("wx") * lit(P) + col("wy")).as("tk"),
        explode(array(
          least(col("apex"), col("wx")) * lit(P) + greatest(col("apex"), col("wx")),
          least(col("apex"), col("wy")) * lit(P) + greatest(col("apex"), col("wy")),
          col("wx") * lit(P) + col("wy"))).as("ek")))
    var sup = ck.lazyCkpt(
      triE.groupBy(col("ek")).agg(count(lit(1)).as("sup")))
    // the triangle count rides ARITHMETIC across rounds (|tri_{r+1}| =
    // |tri_r| − |dead|, a 1-row lazy frame), so the last round never
    // materializes its pruned triangle list at all
    var nTri = triE.agg(expr("count(1) div 3").as("n_triangles"))
    def censusRow(r: Int, nTriR: DataFrame, supR: DataFrame): DataFrame = {
      val kept = supR.filter(col("sup") >= MinSup)
      kept.agg(count(lit(1)).as("n_edges"))
        .crossJoin(kept.select(explode(array(
            expr("shiftright(ek, 21)"), expr("ek % 2097152L"))).as("node"))
          .agg(count_distinct(col("node")).as("n_nodes")))
        .crossJoin(nTriR)
        .crossJoin(supR.agg(coalesce(max(col("sup")), lit(0L)).as("max_support")))
        .select(lit(r.toLong).as("round"), col("n_edges"), col("n_nodes"),
          col("n_triangles"), col("max_support"))
    }
    var rounds = Vector(censusRow(1, nTri, sup))
    // ---- rounds 2-3: delta maintenance ----
    for (r <- 2 to 3) {
      val peeled = sup.filter(col("sup") < MinSup).select(col("ek"))
      // dead = triangles containing a peeled edge; the distinct rides a
      // single-long id (a triangle holding 2+ peeled edges dies once)
      val dead = ck.lazyCkpt(triE
        .join(peeled, Seq("ek"), "left_semi")
        .select(col("tk")).distinct())
      // each dead triangle takes 1 support from each of its 3 edges —
      // recover the edge keys by unpacking the id, so the loss agg and
      // the support subtract stay DELTA-sized (the r14 verdict's point:
      // never redo wedge-join work for a ~1-10% peel)
      val loss = dead.select(explode(array(
          least(expr("shiftright(tk, 42)"), expr("shiftright(tk, 21) % 2097152L"))
            * lit(P) + greatest(expr("shiftright(tk, 42)"),
              expr("shiftright(tk, 21) % 2097152L")),
          least(expr("shiftright(tk, 42)"), expr("tk % 2097152L")) * lit(P)
            + greatest(expr("shiftright(tk, 42)"), expr("tk % 2097152L")),
          expr("shiftright(tk, 21) % 2097152L") * lit(P) + expr("tk % 2097152L")))
          .as("ek"))
        .groupBy(col("ek")).agg(count(lit(1)).as("loss"))
      val supNext = ck.lazyCkpt(sup.filter(col("sup") >= MinSup)
        .join(loss, Seq("ek"), "left")
        .select(col("ek"),
          (col("sup") - coalesce(col("loss"), lit(0L))).as("sup")))
      // the pruned triangle list only exists to serve the NEXT round's
      // dead-mark; the final round skips it and counts arithmetically
      if (r < 3) triE = ck.lazyCkpt(triE.join(dead, Seq("tk"), "left_anti"))
      nTri = nTri.crossJoin(dead.agg(count(lit(1)).as("n_dead")))
        .select((col("n_triangles") - col("n_dead")).as("n_triangles"))
      sup = supNext
      rounds :+= censusRow(r, nTri, sup)
    }
    val census = rounds.reduce(_ unionByName _)
      .localCheckpoint(true)   // one action runs the whole peel
    ck.releaseAll()
    census.orderBy(col("round"))
  }

  private val q196Sql = {
    def round(r: Int, prev: String): String =
      s"""tr$r AS MATERIALIZED (SELECT e1.x AS a, e1.y AS b, e2.y AS c
         |  FROM $prev e1 JOIN $prev e2 ON e2.x = e1.y
         |                JOIN $prev e3 ON e3.x = e1.x AND e3.y = e2.y),
         |sup$r AS MATERIALIZED (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS sup FROM (
         |    SELECT a AS x, b AS y FROM tr$r
         |    UNION ALL SELECT a AS x, c AS y FROM tr$r
         |    UNION ALL SELECT b AS x, c AS y FROM tr$r) GROUP BY x, y),
         |e$r AS MATERIALIZED (SELECT s.x, s.y FROM sup$r s WHERE s.sup >= 2)""".stripMargin
    def census(r: Int): String =
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e$r) AS n_edges,
         |  (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) FROM (
         |     SELECT x AS node FROM e$r UNION ALL SELECT y FROM e$r)) AS n_nodes,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM tr$r) AS n_triangles,
         |  (SELECT CAST(COALESCE(MAX(sup), 0) AS BIGINT) FROM sup$r) AS max_support""".stripMargin
    s"""WITH e00 AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
       |            WHERE l_linenumber <= 3),
       |e0 AS MATERIALIZED (SELECT DISTINCT a.p AS x, b.p AS y
       |       FROM e00 a JOIN e00 b ON a.o = b.o AND a.p < b.p),
       |${round(1, "e0")},
       |${round(2, "e1")},
       |${round(3, "e2")}
       |${census(1)}
       |UNION ALL ${census(2)}
       |UNION ALL ${census(3)}
       |ORDER BY round""".stripMargin
  }

  // ---------------------------------------------------------------- q191
  /** Degree assortativity (Newman 2002) — the STRUCTURE-SHAPE metric over
    * the same co-purchase graph the six graph operators walk: do
    * high-degree parts co-purchase with other hubs (r > 0, social-network
    * shape) or with leaves (r < 0, hub-and-spoke shape)? The answer
    * decides which operators are safe — hub-and-spoke graphs are where
    * LPA flood and triangle skew live. Pearson correlation of the degree
    * pairs at the two ends of every directed arc of the symmetrized edge
    * list, in exact integer ppm:
    * r = (M·Σdxdy − (Σdx)²) / (M·Σdx² − (Σdx)²), floor-divided after a
    * den div 10⁶ rescale (1 ppm granularity) because 10⁶·num would
    * exceed even 38-digit integers at the documented bounds.
    *
    * Exactness: products ride DECIMAL(38,0) in Spark and HUGEINT in
    * DuckDB (the q182 discipline — identical exact integers, identical
    * floors). Documented bounds, enforced by the Guard riding the 1-row
    * sums frame: max_deg ≤ 10⁶ and M ≤ 2·10¹⁰ keep m·Σdxdy ≤ 4·10³²
    * (38-digit-safe); den ≥ 10⁶ rejects the degenerate regular graph
    * where assortativity is undefined at ppm precision.
    *
    * Scale shape: one degree hash agg over the arc list + two shuffle
    * joins keyed on the node id to attach (dx, dy) per arc + ONE
    * map-side-combined 1-row aggregate of the moment sums — the same
    * |E|-linear posture as q179/q184; nothing driver-side. */
  private val q191: Q = (s, d) => {
    // Round 16: edge list + degree table checkpointed once — `sym` is
    // consumed by the degree agg AND the arc attach, and `deg` by both
    // orientation joins; the un-checkpointed plan re-derived the lineitem
    // self-join + DISTINCT once per consumer (4 SortMergeJoin arms in
    // plans/r16/q191_*_before.txt collapse to one derivation).
    val ck = new graft.operators.CheckpointTracker(Tables.lineitem(s, d))
    val ed = graft.operators.CoPurchaseGraph.edges(s, d, ck)
    val sym = ed.select(col("x"), col("y"))
      .unionByName(ed.select(col("y").as("x"), col("x").as("y")))
    val deg = ck.lazyCkpt(
      sym.groupBy(col("x").as("node")).agg(count(lit(1)).as("deg")))
    val arcs = sym
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
    val sums = arcs.agg(
      count(lit(1)).as("m_arcs"),
      sum(col("dx")).as("sum_dx"),
      min(col("dx")).as("min_deg"),
      max(col("dx")).as("max_deg"),
      sum(expr("CAST(dx AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0))")).as("sdxdy"),
      sum(expr("CAST(dx AS DECIMAL(19,0)) * CAST(dx AS DECIMAL(19,0))")).as("sdx2"))
    val out = graft.functions.Guard.require(sums,
        col("max_deg") <= lit(1000000L) &&
          col("m_arcs") <= lit(20000000000L) &&
          expr("CAST(m_arcs AS DECIMAL(38,0)) * sdx2" +
            " - CAST(sum_dx AS DECIMAL(38,0)) * CAST(sum_dx AS DECIMAL(38,0))")
            >= lit(1000000L),
        "q191: assortativity bounds exceeded (deg > 1e6, arcs > 2e10, or a " +
          "degenerate near-regular graph) - promote to wider arithmetic or " +
          "report r as undefined")
      .select(col("m_arcs"), col("sum_dx"), col("min_deg"), col("max_deg"),
        expr(
          """CAST((CAST(m_arcs AS DECIMAL(38,0)) * sdxdy
            |       - CAST(sum_dx AS DECIMAL(38,0)) * CAST(sum_dx AS DECIMAL(38,0)))
            |  div ((CAST(m_arcs AS DECIMAL(38,0)) * sdx2
            |       - CAST(sum_dx AS DECIMAL(38,0)) * CAST(sum_dx AS DECIMAL(38,0)))
            |       div 1000000) AS BIGINT)""".stripMargin).as("r_ppm"))
      // One eager action runs the pipeline while the lazy blocks are
      // alive; the 1-row result outlives them (CheckpointTracker contract).
      .localCheckpoint(true)
    ck.releaseAll()
    out
  }

  private val q191Sql =
    """WITH e0 AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
      |            WHERE l_linenumber <= 3),
      |ed AS (SELECT DISTINCT a.p AS x, b.p AS y
      |       FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p),
      |sym AS (SELECT x, y FROM ed UNION ALL SELECT y, x FROM ed),
      |deg AS (SELECT x AS node, COUNT(*) AS deg FROM sym GROUP BY x),
      |arcs AS (SELECT dx.deg AS dx, dy.deg AS dy FROM sym
      |         JOIN deg dx ON dx.node = sym.x JOIN deg dy ON dy.node = sym.y),
      |s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m,
      |        CAST(SUM(dx) AS HUGEINT) AS sdx,
      |        CAST(MIN(dx) AS BIGINT) AS min_deg,
      |        CAST(MAX(dx) AS BIGINT) AS max_deg,
      |        CAST(SUM(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sdxdy,
      |        CAST(SUM(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sdx2
      |      FROM arcs)
      |SELECT CAST(m AS BIGINT) AS m_arcs, CAST(sdx AS BIGINT) AS sum_dx,
      |  min_deg, max_deg,
      |  CAST((m * sdxdy - sdx * sdx)
      |    // ((m * sdx2 - sdx * sdx) // 1000000) AS BIGINT) AS r_ppm
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q199
  /** Adamic–Adar link prediction — the MISSING-EDGE operator completing
    * the graph family (the other seven score nodes, communities, or
    * existing edges; this scores pairs that are NOT yet edges): for every
    * non-adjacent pair (u, v) with at least one common neighbor, the
    * Adamic–Adar index Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w) — rare shared
    * neighbors are strong evidence, hub co-membership is weak. Top-20
    * predicted links over the part co-purchase graph (q162's derivation,
    * same l_linenumber ≤ 3 linear-growth bound).
    *
    * Integer-exactness: each apex contributes the double-floored
    * t(w) = 10¹² div floor(10⁶·ln(deg w)) micro-score (floor-ln of an
    * identical double in both engines, then a pure integer division —
    * everything non-negative, so Spark `div`/DuckDB `//` agree); the
    * per-pair score is an order-free integer SUM. deg w ≥ 2 always (a
    * wedge apex has two distinct neighbors), so ln ≥ ln 2 > 0 — no
    * division by zero by construction; the deg ≥ 2 filter makes that
    * bound explicit and prunes leaf apexes before the self-join.
    *
    * Scale shape: the apex score attaches to the adjacency list BEFORE
    * the self-join (node-linear join), the wedge self-join shuffles ONCE
    * on the apex key and its volume is Σ C(deg w, 2) — wedge-bounded
    * exactly like q162 (measured there: wedges track edges 10.2× at 10×
    * data because co-purchase degree is bounded; on heavy-hub graphs the
    * standard mitigation is an apex-degree cap, which drops only
    * hub-mediated near-zero AA terms). The candidate set then collapses
    * by one hash agg whose key is the (u, v) pair PACKED into a single
    * guarded BIGINT u·2²¹+v (the q201 lever, round 15: the 52.5M-row
    * wedge stream and the 49.8M-row candidate aggregate each move 1 long
    * instead of a 2-field struct; packed order == (u, v) lexicographic
    * order for non-negative 21-bit fields, so the final total order is
    * stated on the packed key and unpacked after the LIMIT), existing
    * edges leave via a broadcast LEFT ANTI on the same packed key BELOW
    * the aggregate (round 16 — drops edge-owned wedge rows map-side and
    * removes the post-agg anti exchange; equivalent because the anti
    * removes whole uv groups), and the top-20
    * rides TakeOrderedAndProject under the (aa_micro DESC, uv) ==
    * (aa_micro DESC, u, v) total order — never a global sort. Past 2M
    * parts the in-band guard fires and the documented fallback is the
    * struct key (same plan shape, wider rows). */
  private val q199: Q = (s, d) => {
    // The edge derivation has FIVE downstream consumers (both sym arms,
    // the degree agg via sym, both sides of the wedge self-join, the
    // LEFT ANTI) — without the tracked checkpoint it re-executed per
    // consumer (measured 22.4 s at sf1, 2.9 s after). The q201
    // basket-explode derivation was A/B'd here in round 15 and REJECTED:
    // its mandatory order-keyed groupBy shuffle costs what the self-join
    // costs at sf1 and LOSES at small SF, where Catalyst broadcasts one
    // fact side of this join and skips the shuffle entirely (isolated
    // sf0.1: 3.9 s self-join vs 6.5 s baskets).
    val tracker = new graft.operators.CheckpointTracker(Tables.lineitem(s, d))
    // Round 16: shared CoPurchaseGraph derivation (packed-key distinct,
    // same in-band [0, 2^21) Guard the packed (u, v) key below relies on).
    val ed = graft.operators.CoPurchaseGraph.edges(s, d, tracker)
    val sym = ed.select(col("x").as("w"), col("y").as("n"))
      .unionByName(ed.select(col("y").as("w"), col("x").as("n")))
    val score = sym.groupBy(col("w")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2)
      .select(col("w"), expr("1000000000000L div CAST(floor(1000000.0 * " +
        "ln(CAST(deg AS DOUBLE))) AS BIGINT)").as("t"))
    val nbrs = tracker.lazyCkpt(sym.join(score, Seq("w")))
    // Round 16 (the r15 verdict's prescribed lever, guide §3.2): the
    // existing-edge LEFT ANTI moves BELOW the aggregate as a broadcast
    // anti on the packed edge list — wedge rows belonging to an existing
    // edge are dropped map-side before the candidate hash agg, so the
    // post-agg anti join's own exchange (|cand| rows against |E|)
    // disappears from the plan entirely. Dropping whole uv groups before
    // vs after a per-uv aggregate is result-identical; the oracle keeps
    // its NOT EXISTS after grouping.
    //
    // Round 17 (the r16 verdict's item #3): the broadcast hint is GATED on
    // the measured edge count instead of being unconditional — the edge
    // list is linear in orders, and at 100 TB a forced hint would OOM the
    // driver rather than degrade. `ed.count()` materializes the tracked
    // checkpoint (work every consumer pays for anyway — the blocks are
    // then reused, so the gate costs one count over cached blocks), and
    // past the gate the SAME anti join runs unhinted: the checkpointed
    // frame carries no stats, so the planner falls back to the shuffle
    // anti — exactly the pre-round-16 plan. 2e7 packed longs ≈ 160 MB of
    // payload (~600 MB as a built LongHashedRelation) — comfortably inside
    // executor/driver budgets that a production deployment sizes in GB,
    // and ~10× sf1's measured 2.2M edges.
    val edPacked = ed.select((col("x") * lit(2097152L) + col("y")).as("uv"))
    val antiSide = if (ed.count() <= 20000000L) broadcast(edPacked) else edPacked
    val cand = nbrs.as("a").join(nbrs.as("b"),
        col("a.w") === col("b.w") && col("a.n") < col("b.n"))
      .select((col("a.n") * lit(2097152L) + col("b.n")).as("uv"),
        col("a.t").as("t"))
      .join(antiSide, Seq("uv"), "left_anti")
      .groupBy(col("uv"))
      .agg(count(lit(1)).as("n_common"), sum(col("t")).as("aa_micro"))
    val out = cand
      .orderBy(col("aa_micro").desc, col("uv"))
      .limit(20)
      .select(expr("shiftright(uv, 21)").as("u"),
        expr("uv % 2097152L").as("v"), col("n_common"), col("aa_micro"))
      // One eager action runs the pipeline while the lazy blocks are
      // alive; the 20-row result outlives them (CheckpointTracker contract).
      .localCheckpoint(true)
    tracker.releaseAll()
    out
  }

  private val q199Sql =
    """WITH e0 AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
      |            WHERE l_linenumber <= 3),
      |ed AS (SELECT DISTINCT a.p AS x, b.p AS y
      |       FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p),
      |sym AS (SELECT x AS w, y AS n FROM ed UNION ALL SELECT y, x FROM ed),
      |score AS (SELECT w,
      |    1000000000000 // CAST(floor(1000000.0 * ln(CAST(COUNT(*) AS DOUBLE)))
      |      AS BIGINT) AS t
      |  FROM sym GROUP BY w HAVING COUNT(*) >= 2),
      |nbrs AS (SELECT sym.w, sym.n, score.t FROM sym JOIN score ON score.w = sym.w),
      |cand AS (SELECT a.n AS u, b.n AS v,
      |    CAST(COUNT(*) AS BIGINT) AS n_common, CAST(SUM(a.t) AS BIGINT) AS aa_micro
      |  FROM nbrs a JOIN nbrs b ON a.w = b.w AND a.n < b.n
      |  GROUP BY a.n, b.n)
      |SELECT u, v, n_common, aa_micro FROM cand
      |WHERE NOT EXISTS (SELECT 1 FROM ed WHERE ed.x = cand.u AND ed.y = cand.v)
      |ORDER BY aa_micro DESC, u, v LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q202
  /** Luby maximal-independent-set rounds — the SYMMETRY-BREAKING operator
    * class the graph family was missing (components/PageRank/LPA/k-core/
    * k-truss all propagate or peel; MIS must break ties between
    * neighbors that look identical, the primitive under distributed
    * coloring, scheduling, and pick-at-most-one-per-neighborhood
    * curation rules — e.g. "keep a maximal set of mutually
    * non-co-purchased parts"). Three rounds of Luby's algorithm with
    * DETERMINISTIC priorities (prio = md5Bucket60(node) — both engines
    * replay the identical 60-bit hash, the q171 split discipline, so the
    * "random" draw needs no RNG): a node joins the MIS when its priority
    * is STRICTLY below every active neighbor's (isolated actives always
    * join); winners and their neighbors then leave the active set.
    * Strict < makes hash ties SAFE for independence — equal-priority
    * neighbors block each other and retry next round — so a collision
    * costs a round, never correctness. Census per round: selections,
    * removals, survivors.
    *
    * Scale shape per round: one arc-keyed min-aggregate (the neighbor
    * minimum — map-side combined), one anti-join and two LEFT SEMI joins,
    * all keyed on the node id; per-round frames ride the
    * CheckpointTracker lazy-checkpoint discipline (without it round r
    * embeds round r−1 five times — the q179/q184/q187 5^r blowup), the
    * 3-row census is eagerly checkpointed by ONE action, and every
    * tracked block is released before returning. */
  private val q202: Q = (s, d) => {
    val tracker = new graft.operators.CheckpointTracker(Tables.lineitem(s, d))
    // Round 16: shared checkpointed derivation — both arms of the `arcs`
    // union re-derived the lineitem self-join + DISTINCT before.
    val ed = graft.operators.CoPurchaseGraph.edges(s, d, tracker)
    var arcs = tracker.lazyCkpt(ed.select(col("x").as("u"), col("y").as("v"))
      .unionByName(ed.select(col("y").as("u"), col("x").as("v"))))
    var act = tracker.lazyCkpt(graft.operators.LubyMis.init(arcs))
    var rounds = Vector.empty[DataFrame]
    for (r <- 1 to 3) {
      val lr = graft.operators.LubyMis.round(act, arcs, tracker)
      rounds :+= lr.win.agg(count(lit(1)).as("n_selected"))
        .crossJoin(lr.removed.agg(count(lit(1)).as("n_removed")))
        .crossJoin(lr.active.agg(count(lit(1)).as("n_active_after")))
        .select(lit(r.toLong).as("round"), col("n_selected"),
          col("n_removed"), col("n_active_after"))
      act = lr.active
      arcs = lr.arcs
    }
    // One eager action runs all three rounds while the lazy blocks are
    // alive; the 3-row census outlives them (CheckpointTracker contract).
    val out = rounds.reduce(_ unionByName _).orderBy(col("round"))
      .localCheckpoint(true)
    tracker.releaseAll()
    out
  }

  private val q202Sql = {
    def round(r: Int): String =
      s"""win$r AS MATERIALIZED (SELECT a.node FROM act$r a LEFT JOIN (
         |    SELECT e.u AS node, MIN(p.prio) AS mp
         |    FROM arcs$r e JOIN act$r p ON p.node = e.v GROUP BY e.u) m
         |  ON m.node = a.node WHERE m.mp IS NULL OR a.prio < m.mp),
         |rm$r AS MATERIALIZED (SELECT node FROM win$r
         |  UNION SELECT e.v FROM arcs$r e JOIN win$r w ON w.node = e.u),
         |act${r + 1} AS MATERIALIZED (SELECT a.node, a.prio FROM act$r a
         |  WHERE a.node NOT IN (SELECT node FROM rm$r)),
         |arcs${r + 1} AS MATERIALIZED (SELECT e.u, e.v FROM arcs$r e
         |  WHERE e.u IN (SELECT node FROM act${r + 1})
         |    AND e.v IN (SELECT node FROM act${r + 1}))""".stripMargin
    def census(r: Int): String =
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM win$r) AS n_selected,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM rm$r) AS n_removed,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM act${r + 1}) AS n_active_after""".stripMargin
    s"""WITH e0 AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
       |            WHERE l_linenumber <= 3),
       |ed AS MATERIALIZED (SELECT DISTINCT a.p AS x, b.p AS y
       |       FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p),
       |arcs1 AS MATERIALIZED (SELECT x AS u, y AS v FROM ed
       |                       UNION ALL SELECT y, x FROM ed),
       |act1 AS MATERIALIZED (SELECT node,
       |    CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15)) AS BIGINT) AS prio
       |  FROM (SELECT DISTINCT u AS node FROM arcs1)),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |${census(1)}
       |UNION ALL ${census(2)}
       |UNION ALL ${census(3)}
       |ORDER BY round""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q162_triangle_census" -> q162,
    "q179_bfs_distance_census" -> q179,
    "q184_label_propagation" -> q184,
    "q187_kcore_peel" -> q187,
    "q191_degree_assortativity" -> q191,
    "q196_ktruss_peel" -> q196,
    "q199_adamic_adar" -> q199,
    "q202_luby_mis" -> q202)

  val oracle: Map[String, String] = Map(
    "q162_triangle_census" -> q162Sql,
    "q179_bfs_distance_census" -> q179Sql,
    "q184_label_propagation" -> q184Sql,
    "q187_kcore_peel" -> q187Sql,
    "q191_degree_assortativity" -> q191Sql,
    "q196_ktruss_peel" -> q196Sql,
    "q199_adamic_adar" -> q199Sql,
    "q202_luby_mis" -> q202Sql)
}
