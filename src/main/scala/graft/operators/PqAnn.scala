package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN over an `array<float>` embedding column — the
  * memory-side scale path that complements [[HyperplaneLsh]] (bucketing) and
  * [[IvfAnn]] (list pruning): PQ compresses every vector to `m` small codes,
  * so the corpus fits where raw floats cannot, and query scoring becomes
  * table lookups + integer adds.
  *
  * The whole pipeline is INTEGER arithmetic: subvector components are
  * quantized to 1e-6 fixed-point on entry (exactly how production PQ ships
  * int8/int16 codebooks), so centroid means, distances, argmins, and ADC
  * sums are exact, shuffle-order-independent, and bit-reproducible in any
  * engine — the DuckDB oracle replays build + refine + search verbatim.
  *
  *  - **build**: split `dim` dims into `m` subspaces of `dim/m`. Initial
  *    codebook = the subvectors of a deterministic strided corpus sample
  *    (same cheap seeding as IvfAnn), then `iters` Lloyd refinement steps:
  *    assign every subvector to its nearest centroid (ties → lower code),
  *    recompute centroids as the element-wise integer mean of their
  *    members (empty codes keep their previous centroid). Assignment is a
  *    broadcast of the (m·k) codebook against the corpus — embarrassingly
  *    parallel; refinement is two hash aggregates on (s, code[, pos]).
  *  - **search (ADC)**: each query computes its (m·k) distance table
  *    (tiny, broadcast); approximate distance to a corpus vector is the
  *    SUM over subspaces of table[s, code(v, s)] — a join of the codes
  *    table against the query table on (subspace, code) plus a hash
  *    aggregate. No raw corpus floats are touched at query time.
  */
object PqAnn {

  /** fixed-point scale: 1e-6 per unit, applied to raw float components. */
  private val Q = 1000000L

  private def quantSlice(vecCol: String, sub: Int): String =
    s"transform(slice($vecCol, s * $sub + 1, $sub), x -> CAST(round(x * $Q) AS BIGINT))"

  /** exact integer squared L2 between two quantized subvectors — the
    * codegen [[graft.functions.L2Dist2L]] kernel (the HOF
    * `aggregate(zip_with(...))` form runs interpreted and measured ~3×
    * slower on the n·m·k assignment join). */
  private val IntDist = "l2dist2_l(xu, cu)"

  /** Nearest-centroid assignment of every (vector, subspace) row: a
    * broadcast join + `min_by` hash aggregate (struct ordering gives the
    * ties → lower code rule) — partial-aggregable and cheaper than a
    * sort-based window over the n·m·k rows. Keeps `xu` (constant per
    * group) for the refinement step. */
  private def assign(xu: DataFrame, codebook: DataFrame, idCol: String): DataFrame =
    xu.join(broadcast(codebook), Seq("s"))
      .withColumn("d_u", expr(IntDist))
      .groupBy(col(idCol), col("s"))
      .agg(min_by(col("code"), struct(col("d_u"), col("code"))).as("code"),
        first(col("xu")).as("xu"))

  /** Returns (codes, codebook): codes = (idCol, s, code) — m rows per
    * vector; codebook = (s, code, cu: array<bigint>) in 1e-6 units. */
  def build(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, dim: Int, iters: Int = 1): (DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    graft.functions.VectorOps.register(vectors.sparkSession)
    val sub = dim / m
    val n = vectors.count()
    val stride = math.max(1L, n / k)
    val xu = vectors
      .select(col(idCol), explode(array((0 until m).map(lit): _*)).as("s"), col(vecCol).as("__v"))
      .select(col(idCol), col("s"), expr(quantSlice("__v", sub)).as("xu"))
    var codebook = xu
      .filter((col(idCol) % stride === 0) && (col(idCol) / stride < k))
      .select(col("s"), (col(idCol) / stride).cast("int").as("code"), col("xu").as("cu"))
    for (_ <- 0 until iters) {
      val members = assign(xu, codebook, idCol)
      // element-wise integer mean per (s, code); cnt is constant across pos
      val refined = members
        .select(col("s"), col("code"), posexplode(col("xu")).as(Seq("pos", "v")))
        .groupBy(col("s"), col("code"), col("pos"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
        .withColumn("mv", expr("sv div cnt"))
        .groupBy(col("s"), col("code"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, mv))), p -> p.mv)").as("cu"))
      // codes that attracted no members keep their previous centroid
      val kept = codebook.join(refined.select("s", "code"), Seq("s", "code"), "left_anti")
      codebook = refined.unionByName(kept)
    }
    // The codebook is m×k rows of short integer arrays — the deliberately
    // tiny side (like IvfAnn's coarse quantizer). Materialize it ONCE to
    // the driver and hand back a LocalTableScan: both downstream uses
    // (final assign + search's broadcast) read the local relation instead
    // of re-running the Lloyd lineage, and nothing stays persisted on the
    // executors afterwards (a cache() here leaked across bench reruns).
    val localRows = java.util.Arrays.asList(codebook.collect(): _*)
    val localCodebook =
      vectors.sparkSession.createDataFrame(localRows, codebook.schema)
    val codes = assign(xu, localCodebook, idCol).select(col(idCol), col("s"), col("code"))
    (codes, localCodebook)
  }

  /** Asymmetric-distance top-`topK` per query over the encoded corpus. */
  def search(codes: DataFrame, codebook: DataFrame, queries: DataFrame,
      qIdCol: String, qVecCol: String, idCol: String,
      m: Int, dim: Int, topK: Int): DataFrame = {
    graft.functions.VectorOps.register(codes.sparkSession)
    val sub = dim / m
    val qTable = queries
      .select(col(qIdCol), explode(array((0 until m).map(lit): _*)).as("s"), col(qVecCol).as("__v"))
      .select(col(qIdCol), col("s"), expr(quantSlice("__v", sub)).as("xu"))
      .join(broadcast(codebook), Seq("s"))
      .select(col(qIdCol), col("s"), col("code"), expr(IntDist).as("d_u"))
    val wTop = Window.partitionBy(col(qIdCol)).orderBy(col("adist_u"), col(idCol))
    codes.join(broadcast(qTable), Seq("s", "code"))
      .filter(col(qIdCol) =!= col(idCol))
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum(col("d_u")).as("adist_u"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= topK)
      .select(col(qIdCol), col("rank"), col(idCol), col("adist_u"))
  }
}
