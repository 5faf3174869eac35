package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Batch executed-plan snapshot: for each named query, materialize its
  * physical plan (`toRdd.count()`, the bench action) and write the post-AQE
  * `explain("formatted")` to `<outDir>/<name>_<tag>.txt` — one JVM for the
  * whole list (ExecPlan pays a fresh session per query, which at 40 s of
  * JVM+warm-up each makes a 20-query sweep impractical). The round-16
  * optimization evidence under `plans/r16/` is produced by this tool.
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
    val all = SparkEntry.queries ++ SparkEntry.perfQueries
    names.foreach { name =>
      val df = all(name)(spark, sfDir)
      val t0 = System.nanoTime()
      val rows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val header = f"-- $name rows=$rows wall=$sec%.2f s at $sfDir (post-AQE executed plan)%n"
      Files.write(outDir.resolve(s"${name}_$tag.txt"),
        (header + df.queryExecution.explainString(FormattedMode)).getBytes("UTF-8"))
      println(f"[plansnap] $name rows=$rows wall=$sec%.2f s -> ${name}_$tag.txt")
    }
    spark.stop()
  }
}
