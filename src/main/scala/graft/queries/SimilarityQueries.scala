package graft.queries

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2b).
  *
  * The scoring kernel is the codegen'd `dot_f` Catalyst expression
  * (graft.functions.DotProductF): a primitive loop inside whole-stage
  * codegen, no per-pair allocation. Embeddings are L2-normalized in the test
  * data, so dot product == cosine similarity.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and
  * scans the corpus once — a BroadcastNestedLoopJoin that parallelizes
  * per split; the per-query top-k is a bounded window, never a global sort.
  * The LSH variant buckets vectors by random-hyperplane sign bits so each
  * query only scores its own bucket (the 100 TB path: bucket count grows
  * with the corpus, per-bucket work stays constant).
  */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Similarities rounded to 4 decimals before ranking so Spark and the
    * oracle rank identically despite last-ulp float noise; vec_id breaks
    * remaining ties totally. */
  private val Scale = 4

  // ---------------------------------------------------------------- q40
  private val q40: Q = (s, d) => {
    VectorOps.register(s)
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(expr("dot_f(embedding, q_emb)"), Scale).as("sim"),
        col("label"))
      .orderBy(col("vec_id"))
  }

  private val q40Sql =
    """WITH u AS (
      | SELECT vec_id, label, UNNEST(embedding) AS x,
      |  UNNEST((SELECT embedding FROM embeddings WHERE vec_id = 0)) AS y
      | FROM embeddings)
      |SELECT vec_id, round(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4) AS sim,
      | MIN(label) AS label
      |FROM u GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q41
  private val q41: Q = (s, d) => {
    VectorOps.register(s)
    val e = Tables.embeddings(s, d)
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(expr("dot_f(embedding, q_emb)"), Scale).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("rank"), col("vec_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q41Sql =
    """WITH qs AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
      | u AS (SELECT q.q_id, e.vec_id, UNNEST(e.embedding) AS x, UNNEST(q.qe) AS y
      |       FROM embeddings e, qs q WHERE e.vec_id <> q.q_id),
      | sims AS (SELECT q_id, vec_id, round(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4) AS sim
      |          FROM u GROUP BY q_id, vec_id),
      | r AS (SELECT q_id, vec_id, sim,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
      |       FROM sims)
      |SELECT q_id, rank, vec_id, sim FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- q42
  private val q42: Q = (s, d) => {
    VectorOps.register(s)
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id"), col("embedding"))
    val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("emb_b"))
    a.join(b, Seq("vec_id"))
      .select(col("vec_id"),
        round(expr("dot_f(embedding, emb_b)"), Scale).as("sim"))
      .withColumn("near_dup", (col("sim") > 0.4).cast("long"))
      .orderBy(col("vec_id"))
  }

  private val q42Sql =
    """WITH p AS (SELECT a.vec_id, a.embedding AS ea, b.embedding AS eb
      |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1),
      | u AS (SELECT vec_id, UNNEST(ea) AS x, UNNEST(eb) AS y FROM p),
      | s AS (SELECT vec_id, round(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4) AS sim
      |       FROM u GROUP BY vec_id)
      |SELECT vec_id, sim, CAST(CASE WHEN sim > 0.4 THEN 1 ELSE 0 END AS BIGINT) AS near_dup
      |FROM s ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q43 (no oracle: LSH-bucketed ANN)
  /** Random-hyperplane LSH via graft.operators.HyperplaneLsh: plane count
    * is the corpus-size knob (2^planes buckets; here 4 planes for the test
    * corpus — see HyperplaneLsh scaladoc for the 100 TB sizing rule).
    * Queries only score vectors in their own bucket. */
  private val q43: Q = (s, d) => {
    VectorOps.register(s)
    val e = graft.operators.HyperplaneLsh.withBucket(
      Tables.embeddings(s, d), "embedding", numPlanes = 4, dim = 64)
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    e.join(broadcast(qs), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("bucket"),
        round(expr("dot_f(embedding, q_emb)"), Scale).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id"), col("bucket"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q51 (no oracle: IVF ANN)
  /** IVF-bucketed ANN (graft.operators.IvfAnn): 16 coarse centroids, 4
    * probed lists per query — the complementary scale path to q43's
    * random-hyperplane LSH. */
  private val q51: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val (assigned, cents) = graft.operators.IvfAnn.build(e, "vec_id", "embedding", k = 16)
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    graft.operators.IvfAnn.search(assigned, cents, qs,
        "q_id", "q_emb", "vec_id", "embedding", nprobe = 4, topK = 10)
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q85
  /** The declarative dot-product formulation — `aggregate(zip_with(a, b,
    * (x, y) -> x*y), 0D, (acc, v) -> acc + v)` — kept as a correctness
    * cross-check against the codegen `dot_f` kernel (q40 computes the same
    * values). Higher-order functions run interpreted with a per-pair
    * intermediate array, which is exactly why the hot path uses the custom
    * Expression; this query documents the trade and proves the two agree. */
  private val q85: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(expr(
          "aggregate(zip_with(embedding, q_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"),
          Scale).as("sim"),
        col("label"))
      .orderBy(col("vec_id"))
  }

  val queries: Map[String, Q] = Map(
    "q40_cosine_vs_query" -> q40,
    "q85_cosine_hof" -> q85,
    "q41_ann_bruteforce_topk" -> q41,
    "q42_embedding_neardup" -> q42,
    "q43_ann_lsh_bucketed" -> q43,
    "q51_ann_ivf" -> q51)

  val oracle: Map[String, String] = Map(
    "q40_cosine_vs_query" -> q40Sql,
    "q85_cosine_hof" -> q40Sql,
    "q41_ann_bruteforce_topk" -> q41Sql,
    "q42_embedding_neardup" -> q42Sql)
}
