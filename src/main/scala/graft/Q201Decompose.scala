package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Isolated stage decomposition of q201 (A-Priori triples) — the round-13
  * verdict's ask: q201 is the most expensive query in the sf1 suite, so
  * pin WHERE the time goes in a fresh JVM, split into the four stages the
  * scaladoc argues about, with each stage eagerly materialized so the
  * next stage's timer starts from its predecessor's output:
  *
  *   baskets  — lineitem scan -> per-order sorted DISTINCT part arrays
  *   pairs    — C(w,2) packed explode -> hash count
  *   triples  — C(w,3) packed explode -> hash count (the predicted floor)
  *   quantile — support histogram + two-level prefix sum -> minsup
  *   witness  — top-20 + three broadcast pair-support joins
  *
  * Protocol: same warm-up as Bench (table footers + one scan), then each
  * stage timed around its own eager localCheckpoint/collect. Output is
  * ONE JSON line (stage seconds + work volumes), run fresh-JVM via
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Q201Decompose"`.
  *
  * DELIBERATE DUPLICATION PIN: the five stage builders below restate
  * `WarehouseQueries.q201`'s production stages verbatim (packing
  * constants 2097152L / 4398046511104L, the [0, 2^21) guard, the
  * block-4096 two-level prefix-sum quantile, the three witness joins)
  * because the probe must time each stage around its OWN eager
  * materialization — production's single lazy pipeline cannot be timed
  * per-stage without restructuring it. If q201 changes shape, port the
  * change HERE TOO or this decomposition silently measures a different
  * pipeline (q201's body carries the mirror of this pin).
  */
object Q201Decompose {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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

    val (bk, tBaskets) = timed {
      graft.functions.Guard.require(
        Tables.lineitem(spark, sfDir)
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps")),
        expr("element_at(ps, 1) >= 0L AND element_at(ps, -1) < 2097152L"),
        "q201 decompose: partkey outside packed range").localCheckpoint(true)
    }
    val (pairCounts, tPairs) = timed {
      bk.filter(size(col("ps")) >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(0, size(ps) - 2), i -> " +
            "transform(sequence(i + 1, size(ps) - 1), j -> " +
            "ps[i] * 2097152L + ps[j])))")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("sup"))
        .localCheckpoint(true)
    }
    val (tripleCounts, tTriples) = timed {
      bk.filter(size(col("ps")) >= 3)
        .select(explode(expr(
          "flatten(flatten(transform(sequence(0, size(ps) - 3), i -> " +
            "transform(sequence(i + 1, size(ps) - 2), j -> " +
            "transform(sequence(j + 1, size(ps) - 1), k -> " +
            "ps[i] * 4398046511104L + ps[j] * 2097152L + ps[k])))))")).as("tk"))
        .groupBy(col("tk")).agg(count(lit(1)).as("sup"))
        .localCheckpoint(true)
    }
    val (minsupDf, tQuantile) = timed {
      val hist = tripleCounts.groupBy(col("sup"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("blk", expr("sup div 4096"))
        .localCheckpoint(true)
      val wB = Window.partitionBy(col("blk")).orderBy(col("sup"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withCum = hist.withColumn("cumw", sum(col("cnt")).over(wB))
      val blkTot = hist.groupBy(col("blk")).agg(sum(col("cnt")).as("bn"))
      val off = blkTot.as("a")
        .join(broadcast(blkTot.as("b")), col("b.blk") < col("a.blk"), "left")
        .groupBy(col("a.blk").as("blk"))
        .agg(coalesce(sum(col("b.bn")), lit(0L)).as("off"))
      val nTr = hist.agg(sum(col("cnt")).as("n_tr"))
      withCum.join(broadcast(off), Seq("blk"))
        .crossJoin(broadcast(nTr))
        .filter(col("off") + col("cumw") >=
          expr("greatest(1L, (n_tr * 99995L) div 100000L)"))
        .agg(min(col("sup")).as("minsup"))
        .localCheckpoint(true)
    }
    val (rows, tWitness) = timed {
      val top = tripleCounts.crossJoin(broadcast(minsupDf))
        .filter(col("sup") >= col("minsup"))
        .orderBy(col("sup").desc, col("tk"))
        .limit(20)
        .select(expr("shiftright(tk, 42)").as("x"),
          expr("shiftright(tk, 21) % 2097152L").as("y"),
          expr("tk % 2097152L").as("z"), col("sup"), col("minsup"))
      broadcast(top)
        .join(pairCounts.select(col("pk"), col("sup").as("sup_xy")),
          expr("pk = x * 2097152L + y"))
        .join(pairCounts.select(col("pk").as("pk2"), col("sup").as("sup_xz")),
          expr("pk2 = x * 2097152L + z"))
        .join(pairCounts.select(col("pk").as("pk3"), col("sup").as("sup_yz")),
          expr("pk3 = y * 2097152L + z"))
        .select(col("x"), col("y"), col("z"), col("sup"),
          col("sup_xy"), col("sup_xz"), col("sup_yz"), col("minsup"))
        .orderBy(col("sup").desc, col("x"), col("y"), col("z"))
        .collect()
    }
    val nBaskets = bk.count()
    val nPairs = pairCounts.count()
    val nTriples = tripleCounts.count()
    val minsup = minsupDf.collect()(0).getLong(0)
    def f3(v: Double): String = f"$v%.3f"
    spark.stop()
    println(s"""{"metric":"q201_decompose","sf":"$sfDir","cpus":$cpus,""" +
      s""""baskets_s":${f3(tBaskets)},"pairs_s":${f3(tPairs)},""" +
      s""""triples_s":${f3(tTriples)},"quantile_s":${f3(tQuantile)},""" +
      s""""witness_s":${f3(tWitness)},"n_baskets":$nBaskets,""" +
      s""""n_pair_keys":$nPairs,"n_triple_keys":$nTriples,""" +
      s""""minsup":$minsup,"rows":${rows.length}}""")
  }
}
