package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FormattedMode, QueryExecution}
import org.apache.spark.sql.util.QueryExecutionListener

/** Batch executed-plan snapshot: for each named query, materialize its
  * physical plan (`toRdd.count()`, the bench action) and write the post-AQE
  * `explain("formatted")` to `<outDir>/<name>_<tag>.txt` — one JVM for the
  * whole list (ExecPlan pays a fresh session per query, which at 40 s of
  * JVM+warm-up each makes a 20-query sweep impractical). The round-16
  * optimization evidence under `plans/r16/` is produced by this tool.
  *
  * Round 17 (the r16 verdict's item #4): queries that end in an EAGER
  * `.localCheckpoint(true)` inside their constructor dump as a one-line
  * `Scan ExistingRDD` stub — the real pipeline executes during
  * CONSTRUCTION, before the bench action ever sees the frame. A
  * QueryExecutionListener now captures the executed plan of every
  * construction-time action (eager checkpoints fire `onSuccess` with the
  * pre-checkpoint QueryExecution; construction-time counts/collects
  * likewise), and the dump concatenates those plans ahead of the final
  * frame's own — so `plans/r17/` shows the actual shapes (broadcast antis,
  * single derivations) instead of stubs.
  *
  * Usage: `sbt "runMain graft.PlanSnap <outDir> <tag> <q1,q2,...> [sfDir]"`.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <tag> <q1,q2,..> [sfDir]")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    val captured = new scala.collection.mutable.ArrayBuffer[(String, String)]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        captured.synchronized {
          captured += ((funcName, qe.explainString(FormattedMode)))
        }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val all = SparkEntry.queries ++ SparkEntry.perfQueries
    names.foreach { name =>
      captured.synchronized(captured.clear())
      val df = all(name)(spark, sfDir)
      val t0 = System.nanoTime()
      val rows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // execution-listener bus drain (no public waitUntilEmpty)
      val header = f"-- $name rows=$rows wall=$sec%.2f s at $sfDir (post-AQE executed plan)%n"
      val snaps = captured.synchronized(captured.toVector)
      val construction = snaps.zipWithIndex.map { case ((fn, plan), i) =>
        f"%n-- construction action ${i + 1}/${snaps.size} [$fn] --%n$plan"
      }.mkString
      Files.write(outDir.resolve(s"${name}_$tag.txt"),
        (header + construction +
          f"%n-- final frame --%n" +
          df.queryExecution.explainString(FormattedMode)).getBytes("UTF-8"))
      println(f"[plansnap] $name rows=$rows wall=$sec%.2f s -> ${name}_$tag.txt")
    }
    spark.listenerManager.unregister(listener)
    spark.stop()
  }
}
