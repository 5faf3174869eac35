package graft
import org.apache.spark.sql.SparkSession

/** Suite benchmark. One timed `toRdd.count()` per query, median of N
  * consecutive passes, headline total + per-query map as JSON on stdout.
  *
  * READ THIS before citing a number (canonical statement — PLANS.md's
  * header points here): bench medians are CONSTRUCTION-inclusive for the
  * iterative/tracker queries (q179, q184, q194, q196, q199, q202, …) —
  * their driver-side loops (BFS rounds, BPE merges, k-truss peels) run
  * while the query FRAME is being built, so each bench pass pays the
  * full pipeline again. ExecPlan walls for the same queries are
  * MATERIALIZATION-only (the returned frame is LogicalRDD-rooted — the
  * loop already ran). Both numbers are honest; they measure different
  * things. Cross-round comparisons must compare like with like: bench
  * median vs bench median, ExecPlan wall vs ExecPlan wall. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: session/codegen/IO init and parquet footer reads land
    // here, not on whichever query happens to touch a table first — timings
    // below are steady-state.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "events", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
      // One untimed pass of the deepest iterative plan (q126 PageRank).
      // Its codegen+JIT warm-up decays over MORE than 3 passes (sf1
      // fresh-JVM probe: 21.8 → 8.7 → 5.7 → 5.8 → 5.4 s, BASELINE.md
      // round 11), so even the median of 3 consecutive timed passes
      // still carried ~60% warm-up tax — the only suite query where JVM
      // warm-up, not the plan, dominated the in-suite number. On a
      // long-lived cluster this cost amortizes to zero; paying it here
      // untimed makes the per-query medians measure the plan, not the
      // JIT. (Protocol change documented in BASELINE.md round 12.)
      SparkEntry.queries.get("q126_pagerank")
        .foreach(_(spark, sfDir).queryExecution.toRdd.count())
    } catch { case _: Throwable => () }
    // Optional comma-separated query-name filter for local profiling runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val all = SparkEntry.queries ++ SparkEntry.perfQueries
    val selected = only match {
      case Some(names) => all.filter { case (n, _) => names(n) }
      case None        => all
    }
    // Median of N consecutive passes per query (default 3): single-pass
    // timings in one shared JVM are load-order artifacts — GC/codegen
    // pressure from whichever query ran before bleeds into the next
    // (round-3 measured q29 at 9.0s loaded vs 1.9s isolated). The median
    // absorbs the one-off outlier; per-query consecutive passes keep each
    // query's own code/data caches warm so the number is steady-state.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt.max(1)
    // fail fast, BEFORE hours of timing work: a prefix collision would
    // otherwise throw after the loop and lose the whole run's JSON line
    def shortKey(name: String): String = {
      val cut = name.indexOf('_')
      if (cut > 0) name.substring(0, cut) else name
    }
    require(selected.keySet.map(shortKey).size == selected.size,
      "short bench keys must stay unique")
    // Contention evidence (VERDICT r5: a loaded box inflated BENCH_r05 ~3×
    // and cost a full re-measure to adjudicate): record the 1/5/15-min load
    // averages before and after the run, plus each query's min→max spread
    // across its passes. A large load or a wide spread marks the number as
    // contention-polluted without anyone having to re-run the suite.
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }
    val loadStart = loadavg()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        // toRdd.count(), NOT count(): count() prunes every column, which
        // lets Catalyst eliminate unique-key left joins (q123's census
        // count executed ZERO of its 4 joins — 1.3 s vs 4.2 s honest at
        // sf0.1) and skip per-row kernels (a map-only md5 query "benched"
        // as a bare scan count). Executing the query's own physical plan
        // and materializing its UnsafeRows measures the work a real
        // consumer (writer, collector) pays; nothing reaches the driver
        // but the partition counts.
        val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val median =
        if (times.contains(-1.0)) -1.0
        else times.sorted.apply(times.size / 2)
      val spread = if (times.contains(-1.0)) 0.0 else times.max - times.min
      (name, median, spread)
    }
    // One JSON line, headline total first, values at 3-decimal precision.
    // Query keys are compacted to their "qNN" prefix: the driver captures
    // only a ~3 KB tail of stdout, and with 70+ full-length names the line
    // exceeded that (BENCH_r04 `parsed: null` — the head holding the
    // headline metric was cut off). Short keys keep the whole line inside
    // the capture window; the prefix is unique across the inventory.
    def f3(v: Double): String = f"$v%.3f"
    val total = results.map(_._2).filter(_ >= 0).sum
    val qs = results.map { case (k, v, _) => "\"" + shortKey(k) + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // spread stays aggregated (worst query + suite total), not per-query:
    // the driver captures only a ~3 KB stdout tail, so the line must stay
    // small — the aggregate is enough to adjudicate contention.
    val loadEnd = loadavg()
    val spreadTotal = results.map(_._3).sum
    val (worstQ, _, worstSpread) =
      if (results.nonEmpty) results.maxBy(_._3) else ("none", 0.0, 0.0)
    val contention = s""""load_start":"$loadStart","load_end":"$loadEnd",""" +
      s""""spread_total":${f3(spreadTotal)},"spread_max_q":"${shortKey(worstQ)}","spread_max_s":${f3(worstSpread)}"""
    // Stop Spark BEFORE printing: its shutdown logging must not trail the
    // JSON lines the driver tail-parses (build.sbt suppresses sbt's own
    // "[info] " prefix and "[success]" footer for the same reason).
    spark.stop()
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","passes":$passes,$contention,"queries":$qs,"sf":"$sfDir"}""")
    // The driver captures only the ~3 KB TAIL of stdout — and the tail
    // keeps the END. With 208+ short keys the full line above is itself
    // ~3 KB, so the tail now STARTS mid-map and the headline total that
    // round 4 moved to the front scrolled out of the window again
    // (BENCH_r11/BENCH_r12 `parsed: null`). Repeat the headline as a
    // compact FINAL line whose queries map holds only the 5 slowest
    // medians (bounded forever, still schema-complete) so the capture
    // window always ends with complete, parseable JSON. The full line
    // above stays for humans and the calm-pair archives.
    val top5 = results.sortBy(-_._2).take(5)
      .map { case (k, v, _) => "\"" + shortKey(k) + "\":" + f3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","passes":$passes,$contention,"queries":$top5,"sf":"$sfDir"}""")
  }
}
