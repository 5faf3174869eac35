package graft

import org.apache.spark.sql.functions._

/** Isolated stage decomposition of q199 (Adamic–Adar link prediction) —
  * the round-15 verdict's prescribed profiling companion (same protocol
  * as [[Q196Decompose]] / [[Q201Decompose]]): each stage eagerly
  * materialized so the next stage's timer starts from its predecessor's
  * output.
  *
  *   edges   — lineitem scan -> co-purchase DISTINCT edge list (guarded)
  *   score   — degree agg + 1/ln micro-score + attach to adjacency (nbrs)
  *   wedges  — apex-keyed self-join -> packed (uv, t) stream -> map-side
  *             broadcast LEFT ANTI on the packed edge list (round 16:
  *             below the aggregate) -> hash agg (n_common, aa_micro per
  *             packed pair)  [the bulk]
  *   anti    — gone since round 16 (folded into wedges as the broadcast
  *             anti; reported as 0.0 for key compatibility)
  *   topk    — TakeOrderedAndProject top-20 + unpack
  *
  * DELIBERATE DUPLICATION PIN: restates GraphQueries.q199's stages
  * verbatim (packing constant 2097152L, the [0, 2^21) guard, the deg ≥ 2
  * filter, the double-floored 10¹² div floor(10⁶·ln deg) score); if q199
  * changes shape, port the change HERE TOO (q199's body carries the
  * mirror of this pin).
  *
  * Output: ONE JSON line (stage seconds + work volumes), run fresh-JVM
  * via `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Q199Decompose"`.
  */
object Q199Decompose {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val P = 2097152L

    // round 16: q199 now derives edges via the shared CoPurchaseGraph
    // (packed-key distinct) — restated here BY CALL, so the pin holds.
    val (edges, tEdges) = timed {
      graft.operators.CoPurchaseGraph.derive(spark, sfDir).localCheckpoint(true)
    }
    val (nbrs, tScore) = timed {
      val sym = edges.select(col("x").as("w"), col("y").as("n"))
        .unionByName(edges.select(col("y").as("w"), col("x").as("n")))
      val score = sym.groupBy(col("w")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2)
        .select(col("w"), expr("1000000000000L div CAST(floor(1000000.0 * " +
          "ln(CAST(deg AS DOUBLE))) AS BIGINT)").as("t"))
      sym.join(score, Seq("w")).localCheckpoint(true)
    }
    // round 16: the anti join rides BELOW the aggregate as a broadcast
    // anti on the packed edge list (ported from q199 — the pin). The
    // wedge stage therefore includes the map-side edge filter; the old
    // post-agg anti stage is gone from the pipeline.
    // round 17 (ported from q199 — the pin): the broadcast hint is gated
    // on the measured edge count; past 2e7 edges the same anti runs
    // unhinted (shuffle anti fallback).
    val (cand, tWedge) = timed {
      val edPacked = edges.select((col("x") * lit(P) + col("y")).as("uv"))
      val antiSide = if (edges.count() <= 20000000L) broadcast(edPacked) else edPacked
      nbrs.as("a").join(nbrs.as("b"),
          col("a.w") === col("b.w") && col("a.n") < col("b.n"))
        .select((col("a.n") * lit(P) + col("b.n")).as("uv"),
          col("a.t").as("t"))
        .join(antiSide, Seq("uv"), "left_anti")
        .groupBy(col("uv"))
        .agg(count(lit(1)).as("n_common"), sum(col("t")).as("aa_micro"))
        .localCheckpoint(true)
    }
    val (kept, tAnti) = (cand, 0.0)
    val (top, tTopk) = timed {
      kept.orderBy(col("aa_micro").desc, col("uv")).limit(20)
        .select(expr("shiftright(uv, 21)").as("u"),
          expr("uv % 2097152L").as("v"), col("n_common"), col("aa_micro"))
        .localCheckpoint(true)
    }
    val nEdges = edges.count()
    val nNbrs = nbrs.count()
    val nCand = cand.count()
    val nKept = kept.count()
    // interference-immune scale counter: wedge-stream volume Σ C(deg w, 2)
    // over scored apexes — exactly the rows the self-join emits
    val wedgeVolume = nbrs.groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2")).as("wv"))
      .collect()(0).getLong(0)
    val topRows = top.count()
    spark.stop()
    val stages = Seq("edges" -> tEdges, "score" -> tScore,
      "wedges_agg" -> tWedge, "anti" -> tAnti, "topk" -> tTopk)
    val stageJson = stages.map { case (n, t) =>
      s""""$n":${"%.3f".format(t)}""" }.mkString(",")
    println(s"""{"metric":"q199_stage_seconds","sf":"$sfDir",""" +
      s""""edges_rows":$nEdges,"nbrs_rows":$nNbrs,""" +
      s""""wedge_volume":$wedgeVolume,"cand_rows":$nCand,""" +
      s""""kept_rows":$nKept,"top_rows":$topRows,""" +
      s""""stages":{$stageJson}}""")
  }
}
