package graft

import java.sql.Timestamp

import graft.streaming.{CountEvent, StatefulCounts}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState keeps per-key state across micro-batches. */
class StatefulCountsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2026-02-18 10:$m%02d:00")

  test("per-user running counts accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val stream = MemoryStream[(Long, Timestamp)]
    val counts = StatefulCounts.perUserCounts(
      stream.toDS().map { case (u, t) => CountEvent(u, t) })

    val q = counts.writeStream
      .format("memory").queryName("counts_out").outputMode("update").start()
    stream.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(2)))
    q.processAllAvailable()
    stream.addData((1L, ts(5)), (3L, ts(6)))
    q.processAllAvailable()
    q.stop()

    // last emitted update per user carries the cross-batch total
    val last = spark.table("counts_out")
      .groupBy("user_id").max("n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(last == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }
}
