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
    val e0 = Tables.lineitem(s, d)
      .filter(col("l_linenumber") <= 3)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edges = e0.as("a").join(e0.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
    graft.operators.TriangleCount.census(edges)
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

  val queries: Map[String, Q] = Map(
    "q162_triangle_census" -> q162)

  val oracle: Map[String, String] = Map(
    "q162_triangle_census" -> q162Sql)
}
