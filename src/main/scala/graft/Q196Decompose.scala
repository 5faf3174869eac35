package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolated stage decomposition of q196 (delta k-truss peel) — the
  * round-15 rewrite's profiling companion, same protocol as
  * [[Q201Decompose]]: each stage eagerly materialized so the next
  * stage's timer starts from its predecessor's output.
  *
  *   edges    — lineitem scan -> co-purchase DISTINCT edge list (guarded)
  *   orient   — degree agg + two degree joins -> (src, dst)
  *   triangles— apex-keyed wedge self-join + packed-key LEFT SEMI close
  *   support  — 3·|tri| packed-key explode -> hash count
  *   delta2/3 — dead-mark + loss-subtract + anti-join maintenance rounds
  *   census   — the 3 census rows (counts over checkpointed frames)
  *
  * DELIBERATE DUPLICATION PIN: restates GraphQueries.q196's stages
  * verbatim (packing constant 2097152L, the [0, 2^21) guard, the delta
  * maintenance) for per-stage timing; if q196 changes shape, port the
  * change HERE TOO (q196's body carries the mirror of this pin).
  *
  * Output: ONE JSON line (stage seconds + work volumes), run fresh-JVM
  * via `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Q196Decompose"`.
  */
object Q196Decompose {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
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
    val MinSup = 2

    // round 16: q196 now derives edges via the shared CoPurchaseGraph
    // (packed-key distinct) — restated here BY CALL, so the pin holds.
    val (edges, tEdges) = timed {
      graft.operators.CoPurchaseGraph.derive(spark, sfDir).localCheckpoint(true)
    }
    val (oriented, tOrient) = timed {
      val deg = edges.select(col("x").as("node"))
        .unionByName(edges.select(col("y").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val lower = col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y"))
      edges
        .join(deg.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
        .join(deg.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
        .select(when(lower, col("x")).otherwise(col("y")).as("src"),
          when(lower, col("y")).otherwise(col("x")).as("dst"))
        .localCheckpoint(true)
    }
    val (triE1, tTri) = timed {
      oriented.as("a")
        .join(oriented.as("b"),
          col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
        .select(col("a.src").as("apex"), col("a.dst").as("wx"),
          col("b.dst").as("wy"))
        .join(edges.select((col("x") * lit(P) + col("y")).as("wk")),
          (col("wx") * lit(P) + col("wy")) === col("wk"), "left_semi")
        .select((col("apex") * lit(P * P) + col("wx") * lit(P) + col("wy")).as("tk"),
          explode(array(
            least(col("apex"), col("wx")) * lit(P) + greatest(col("apex"), col("wx")),
            least(col("apex"), col("wy")) * lit(P) + greatest(col("apex"), col("wy")),
            col("wx") * lit(P) + col("wy"))).as("ek"))
        .localCheckpoint(true)
    }
    val (sup1, tSup) = timed {
      triE1.groupBy(col("ek")).agg(count(lit(1)).as("sup"))
        .localCheckpoint(true)
    }
    def delta(tag: String, triE: DataFrame, sup: DataFrame,
        materializeTri: Boolean): (DataFrame, DataFrame, Long) = {
      val peeled = sup.filter(col("sup") < MinSup).select(col("ek"))
      val (dead, tDead) = timed {
        triE.join(peeled, Seq("ek"), "left_semi")
          .select(col("tk")).distinct()
          .localCheckpoint(true)
      }
      val (supNext, tSup) = timed {
        val loss = dead.select(explode(array(
            least(expr("shiftright(tk, 42)"), expr("shiftright(tk, 21) % 2097152L"))
              * lit(P) + greatest(expr("shiftright(tk, 42)"),
                expr("shiftright(tk, 21) % 2097152L")),
            least(expr("shiftright(tk, 42)"), expr("tk % 2097152L")) * lit(P)
              + greatest(expr("shiftright(tk, 42)"), expr("tk % 2097152L")),
            expr("shiftright(tk, 21) % 2097152L") * lit(P) + expr("tk % 2097152L")))
            .as("ek"))
          .groupBy(col("ek")).agg(count(lit(1)).as("loss"))
        sup.filter(col("sup") >= MinSup)
          .join(loss, Seq("ek"), "left")
          .select(col("ek"),
            (col("sup") - coalesce(col("loss"), lit(0L))).as("sup"))
          .localCheckpoint(true)
      }
      // production (and so the probe) materializes the pruned triangle
      // list only when a NEXT round will probe it; the last round's
      // triangle census count is |tri_r| − |dead| arithmetically
      val (triENext, tAnti) = timed {
        if (materializeTri)
          triE.join(dead, Seq("tk"), "left_anti").localCheckpoint(true)
        else dead // unused sentinel; only deadCount rides forward
      }
      System.err.println(f"[$tag] dead=$tDead%.3f supNext=$tSup%.3f anti=$tAnti%.3f")
      (triENext, supNext, dead.count())
    }
    val ((triE2, sup2, _), tDelta2) =
      timed(delta("delta2", triE1, sup1, materializeTri = true))
    val ((_, sup3, dead3), tDelta3) =
      timed(delta("delta3", triE2, sup2, materializeTri = false))
    val (vols, tCensus) = timed {
      val t1 = triE1.count() / 3
      val t2 = triE2.count() / 3
      val t3 = t2 - dead3
      Seq((t1, sup1), (t2, sup2), (t3, sup3)).map { case (t, sp) =>
        (t, sp.count(), sp.filter(col("sup") >= MinSup).count())
      }
    }
    val nEdges = edges.count()
    val nWedgeSide = oriented.count()
    // Interference-immune scale counter: the apex-keyed wedge-join volume
    // Σ C(outdeg, 2) — the r14 form paid this stream THREE times (once per
    // peel round); the delta form pays it exactly ONCE, so the avoided
    // work is 2× this number regardless of host noise.
    val wedgeVolume = oriented.groupBy(col("src"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2")).as("w"))
      .collect()(0).getLong(0)
    spark.stop()
    val stages = Seq(
      "edges" -> tEdges, "orient" -> tOrient, "triangles" -> tTri,
      "support" -> tSup, "delta2" -> tDelta2, "delta3" -> tDelta3,
      "census" -> tCensus)
    val stageJson = stages.map { case (n, t) =>
      s""""$n":${"%.3f".format(t)}""" }.mkString(",")
    val volJson = vols.zipWithIndex.map { case ((t, sp, k), i) =>
      s""""round${i + 1}":{"triangles":$t,"sup_rows":$sp,"kept":$k}"""
    }.mkString(",")
    println(s"""{"metric":"q196_stage_seconds","sf":"$sfDir",""" +
      s""""edges_rows":$nEdges,"oriented_rows":$nWedgeSide,""" +
      s""""wedge_volume":$wedgeVolume,""" +
      s""""stages":{$stageJson},"volumes":{$volJson}}""")
  }
}
