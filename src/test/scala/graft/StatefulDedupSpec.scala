package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming dedup (SURVEY.md §2b "stateful"): duplicates of the
  * reference's `random_id` idempotency key are dropped ACROSS micro-batches
  * within the watermark horizon — `dropDuplicatesWithinWatermark`, the
  * bounded-state generalization of `_id`-upsert that works on 100 TB streams
  * (state expires with the watermark instead of growing forever).
  */
class StatefulDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2026-02-18 10:$m%02d:00")

  test("dropDuplicatesWithinWatermark dedups across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, Timestamp)]
    val deduped = stream.toDF().toDF("random_id", "event_time")
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("random_id")

    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    // batch 1: a, b, and a duplicate a
    stream.addData(("a", ts(0)), ("b", ts(1)), ("a", ts(2)))
    q.processAllAvailable()
    // batch 2: redelivered a/b inside the watermark + new c
    stream.addData(("a", ts(3)), ("b", ts(4)), ("c", ts(5)))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").select("random_id")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("a", "b", "c"))
  }
}
