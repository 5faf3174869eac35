package graft

import graft.streaming.{SessionEvent, StreamingSessionize}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming sessionizer twin of q136 must (a) continue an open
  * session across micro-batch boundaries, (b) break sessions on the gap
  * predicate exactly as the batch lag+running-sum does, and (c) match the
  * batch formulation event-for-event on replayed history. */
class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Gap = 1800L * 1000000L // 30 min in microseconds

  private def run(batches: Seq[Seq[SessionEvent]],
      name: String): Map[Long, Long] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[SessionEvent]
      val q = StreamingSessionize.assign(stream.toDS(), Gap)
        .toDF("user_id", "event_id", "session_id")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("a session open at a batch boundary continues; a gap starts a new one") {
    val m = 60L * 1000000L // one minute
    val got = run(Seq(
      Seq(SessionEvent(1L, 0 * m, 1L), SessionEvent(1L, 10 * m, 2L)),
      // 10 min after the last event of batch 1: SAME session
      Seq(SessionEvent(1L, 20 * m, 3L)),
      // 40 min gap: NEW session
      Seq(SessionEvent(1L, 60 * m, 4L))), "sess_span")
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("intra-batch arrival shuffle is repaired; users independent") {
    val m = 60L * 1000000L
    val got = run(Seq(Seq(
      SessionEvent(2L, 90 * m, 13L), SessionEvent(2L, 0 * m, 11L),
      SessionEvent(2L, 10 * m, 12L),
      SessionEvent(3L, 0 * m, 21L))), "sess_order")
    // user 2 sorted: 11(t0),12(t10) session 1; 13(t90) session 2
    assert(got == Map(11L -> 1L, 12L -> 1L, 13L -> 2L, 21L -> 1L))
  }

  test("streaming assignments equal the q136 batch window on replayed history") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val m = 60L * 1000000L
    // deterministic history: 3 users, gaps alternating under/over 30 min
    val hist = (0 until 30).map { i =>
      SessionEvent(i % 3L, (i / 3L) * ((i % 3) + 1) * 20 * m, i.toLong)
    }
    val wOrd = Window.partitionBy(col("userId")).orderBy(col("us"), col("eventId"))
    val expected = hist.toDF()
      .withColumn("prev", lag(col("us"), 1).over(wOrd))
      .withColumn("is_new",
        (col("prev").isNull || col("us") - col("prev") > Gap).cast("long"))
      .withColumn("sid", sum(col("is_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("eventId"), col("sid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(hist.grouped(7).toSeq, "sess_parity")
    assert(got == expected)
  }
}
