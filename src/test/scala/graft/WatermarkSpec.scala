package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time windowed aggregation with a watermark (SURVEY.md §2b
  * "streaming"): tumbling windows finalize in append mode once the watermark
  * passes their end, and data later than the watermark is dropped — the
  * bounded-state behavior that lets the aggregation run forever on an
  * unbounded stream.
  */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2026-02-18 $h%02d:$m%02d:00")

  test("windowed agg + watermark finalizes windows and drops late data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val agg = stream.toDF().toDF("event_time", "v")
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .select(col("window.start").cast("string").as("w"), col("n"), col("sum_v"))

    val q = agg.writeStream
      .format("memory").queryName("wm_out").outputMode("append").start()

    // hour-10 window gets three events
    stream.addData((ts(10, 5), 1L), (ts(10, 20), 2L), (ts(10, 40), 3L))
    q.processAllAvailable()
    // nothing final yet: watermark (max 10:40 - 10m) hasn't passed 11:00
    assert(spark.table("wm_out").count() == 0)

    // event at 12:30 pushes the watermark past 11:00 → hour-10 window emits
    stream.addData((ts(12, 30), 10L))
    q.processAllAvailable()
    val out1 = spark.table("wm_out").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out1.toSeq == Seq(("2026-02-18 10:00:00", 3L, 6L)))

    // an event at 10:59 is now far behind the watermark (12:20) → dropped,
    // the finalized hour-10 window never changes
    stream.addData((ts(10, 59), 100L))
    q.processAllAvailable()
    assert(spark.table("wm_out").count() == 1, "late data must not reopen the window")
    q.stop()
  }
}
