package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Head-to-head exchange-volume measurement for plan-shape claims — built
  * for the q09 (stock per-group `row_number` window) vs q139 (`topk_pair`
  * bounded-heap aggregate) pair, usable for any registered queries.
  *
  * The scale claim under test: the window shape must shuffle EVERY row of
  * the corpus to sort each group, while the TypedImperativeAggregate sends
  * ≤k pairs per (group × input split) through the exchange — at 100 TB
  * the difference is "the exchange carries the table" vs "the exchange
  * carries KBs". Wall-clock alone cannot adjudicate that on a noisy box
  * (bench-noise protocol), so this harness reads the executed plan's OWN
  * shuffle-write metrics — rows and bytes through every
  * ShuffleExchangeExec — which are exact functions of the data and plan,
  * contention-immune like the ScalingProbe counters.
  *
  * AQE is disabled for the measurement session so exchanges appear as
  * plain ShuffleExchangeExec nodes (no query-stage reuse hiding metrics);
  * the shapes under comparison do not depend on AQE.
  *
  * Usage: `runMain graft.ExchangeDuel <sfDir> <queryName> [queryName…]`;
  * prints one JSON line per query:
  * `{"query":…,"wall_s":…,"shuffle_rows":…,"shuffle_bytes":…}`.
  */
object ExchangeDuel {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExchangeDuel <sfDir> <queryName> [queryName…]")
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt.max(1)
    names.foreach { name =>
      val fn = (SparkEntry.queries ++ SparkEntry.perfQueries)(name)
      // warm-up pass unmeasured (codegen + IO init), then timed passes on
      // a FRESH DataFrame each so metrics belong to that pass alone
      fn(spark, sfDir).queryExecution.toRdd.count()
      val runs = (1 to passes).map { _ =>
        val df = fn(spark, sfDir)
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        var rows = 0L; var bytes = 0L
        def walk(p: SparkPlan): Unit = {
          p match {
            case ex: ShuffleExchangeExec =>
              rows += ex.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
              bytes += ex.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
            case _ => ()
          }
          p.children.foreach(walk)
        }
        walk(df.queryExecution.executedPlan)
        (wall, rows, bytes)
      }
      val wall = runs.map(_._1).sorted.apply(runs.size / 2)
      // shuffle volumes are deterministic across passes; take the first
      val (_, rows, bytes) = runs.head
      println(f"""{"query":"$name","wall_s":$wall%.3f,"shuffle_rows":$rows,"shuffle_bytes":$bytes}""")
    }
    spark.stop()
  }
}
