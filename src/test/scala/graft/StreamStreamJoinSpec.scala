package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join (SURVEY.md §2b "streaming"): clicks joined to
  * purchases of the same user within the following 30 minutes. Both sides
  * carry watermarks and the join condition bounds event time on both sides,
  * so Spark can expire join state — the only formulation that runs forever
  * on two unbounded streams with bounded memory.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2026-02-18 $h%02d:$m%02d:00")

  test("interval join matches within-window pairs and expires state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]

    val c = clicks.toDF().toDF("user_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_user_id", "purchase_ts", "amount")
      .withWatermark("purchase_ts", "10 minutes")

    val joined = c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_ts").cast("string").as("c"),
        col("purchase_ts").cast("string").as("p"), col("amount"))

    val q = joined.writeStream
      .format("memory").queryName("ssj_out").outputMode("append").start()

    // user 1 clicks at 10:00, purchases at 10:20 (within 30m) -> match
    // user 2 clicks at 10:00, purchases at 11:30 (outside 30m) -> no match
    clicks.addData((1L, ts(10, 0)), (2L, ts(10, 0)))
    purchases.addData((1L, ts(10, 20), 42L), (2L, ts(11, 30), 7L))
    q.processAllAvailable()
    val out = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(out == Set((1L, "2026-02-18 10:00:00", "2026-02-18 10:20:00", 42L)))

    // push watermarks far ahead so the 10:00 click state expires...
    clicks.addData((9L, ts(13, 0)))
    purchases.addData((9L, ts(13, 1), 1L))
    q.processAllAvailable()
    // ...then a purchase that WOULD have matched user 1's click arrives too
    // late (behind the click-state retention) and must not produce a row
    purchases.addData((1L, ts(10, 25), 99L))
    q.processAllAvailable()
    val after = spark.table("ssj_out").collect().map(_.getLong(3)).toSet
    assert(!after.contains(99L), "late purchase must not match expired click state")
    q.stop()
  }
}
