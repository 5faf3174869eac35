package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Machine-noise-immune work measurement: runs each named query exactly the
  * way the bench does (`fn(spark, sfDir).queryExecution.toRdd.count()` —
  * construction-inclusive) with a SparkListener accumulating the executed
  * work: task count, input bytes/records read from the source scans,
  * shuffle bytes/records written, and peak-ish spill. Wall-clock on this
  * sandbox carries ~40% hypervisor CPU steal (OPTIMIZATION_r16.md §Method),
  * so before/after deltas in THESE counters — bytes that were or were not
  * read and shuffled — are the round's primary optimization evidence;
  * seconds are corroboration only.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.WorkProbe <q1,q2,..> [sfDir]"`
  * Prints one JSON line per query:
  *   {"query":..., "tasks":N, "input_mb":X, "input_rows":N,
  *    "shuffle_write_mb":X, "shuffle_rows":N, "spill_mb":X, "wall_s":X}
  */
object WorkProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: WorkProbe <q1,q2,..> [sfDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tasks = new LongAdder; val inB = new LongAdder; val inR = new LongAdder
    val swB = new LongAdder; val swR = new LongAdder; val spB = new LongAdder
    val cpuNs = new LongAdder; val runMs = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          tasks.increment()
          inB.add(m.inputMetrics.bytesRead)
          inR.add(m.inputMetrics.recordsRead)
          swB.add(m.shuffleWriteMetrics.bytesWritten)
          swR.add(m.shuffleWriteMetrics.recordsWritten)
          spB.add(m.diskBytesSpilled + m.memoryBytesSpilled)
          // round 17: CPU-time proxy for per-task kernel-constant changes
          // (input/shuffle counters are blind to map-side CPU; cpu time is
          // steal-resistant — interference delays wall, not cycles consumed)
          cpuNs.add(m.executorCpuTime)
          runMs.add(m.executorRunTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // Untimed warm-up (the bench's): table footers + one deep iterative plan.
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
    } catch { case _: Throwable => () }
    val all = SparkEntry.queries ++ SparkEntry.perfQueries
    // SPARK_GRAFT_PROBE_PASSES > 1 (round 17): run the query N times and
    // report counters for the LAST pass only — a single fresh-JVM pass
    // charges JIT compilation of the generated code to executorCpuTime,
    // which swamps per-task kernel deltas; the last of N passes is
    // steady-state (same reasoning as the bench's median-of-3).
    val probePasses = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "1").toInt.max(1)
    val out = names.map { name =>
      var wall = 0.0
      (1 to probePasses).foreach { _ =>
        Thread.sleep(500) // listener bus drain (waitUntilEmpty is private[spark])
        tasks.reset(); inB.reset(); inR.reset(); swB.reset(); swR.reset(); spB.reset()
        cpuNs.reset(); runMs.reset()
        val t0 = System.nanoTime()
        all(name)(spark, sfDir).queryExecution.toRdd.count()
        wall = (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(500) // listener bus drain (waitUntilEmpty is private[spark])
      def mb(l: LongAdder): String = f"${l.sum() / 1048576.0}%.1f"
      s"""{"query":"$name","tasks":${tasks.sum()},"input_mb":${mb(inB)},""" +
        s""""input_rows":${inR.sum()},"shuffle_write_mb":${mb(swB)},""" +
        s""""shuffle_rows":${swR.sum()},"spill_mb":${mb(spB)},""" +
        s""""cpu_s":${f"${cpuNs.sum() / 1e9}%.2f"},"run_s":${f"${runMs.sum() / 1e3}%.2f"},""" +
        s""""wall_s":${f"$wall%.2f"}}"""
    }
    spark.stop()
    out.foreach(println)
  }
}
