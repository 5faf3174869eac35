package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Executed-plan dump for ONE query: materializes the query's own physical
  * plan (`toRdd.count()`, the bench's full-materialization discipline) and
  * prints the post-AQE formatted plan (`isFinalPlan=true`) — the evidence
  * PLANS.md's hand-audited sections cite when a claim depends on a runtime
  * re-plan (ReusedExchange, AQE coalescing, broadcast demotion) that a
  * compile-time `explain` cannot show.
  *
  * Usage: `sbt "runMain graft.ExecPlan q162_triangle_census /tmp/sf1"`.
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: ExecPlan <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = SparkEntry.queries ++ SparkEntry.perfQueries
    val df = all(name)(spark, sfDir)
    val t0 = System.nanoTime()
    val rows = df.queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[execplan] $name rows=$rows wall=$sec%.2f s at $sfDir")
    println(df.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
