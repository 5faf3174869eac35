package graft

import graft.streaming.{FunnelEvent, StreamingFunnel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming funnel twin of q128 must (a) mine exactly the batch
  * query's trigrams on the same data, (b) CONTINUE sequences across
  * micro-batch boundaries via the carried tail, and (c) repair intra-batch
  * arrival shuffles with the (us, event_id) sort. */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(batches: Seq[Seq[FunnelEvent]], name: String): Set[(Long, String)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[FunnelEvent]
      val q = StreamingFunnel.trigrams(stream.toDS())
        .toDF("user_id", "trigram")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("trigrams continue across micro-batch boundaries (tail carries in state)") {
    // user 1: login, browse | cart, buy  -> the spanning trigrams
    // login>browse>cart and browse>cart>buy exist ONLY if state carries.
    val got = run(Seq(
      Seq(FunnelEvent(1L, 1000L, 1L, "login"), FunnelEvent(1L, 2000L, 2L, "browse")),
      Seq(FunnelEvent(1L, 3000L, 3L, "cart"), FunnelEvent(1L, 4000L, 4L, "buy"))),
      "funnel_span")
    assert(got == Set((1L, "login>browse>cart"), (1L, "browse>cart>buy")))
  }

  test("intra-batch arrival shuffle is repaired by the (us, event_id) sort; users independent") {
    val got = run(Seq(Seq(
      // user 2 arrives out of order: c(3000), a(1000), b(2000)
      FunnelEvent(2L, 3000L, 13L, "c"), FunnelEvent(2L, 1000L, 11L, "a"),
      FunnelEvent(2L, 2000L, 12L, "b"),
      // user 3 has only two events: no trigram
      FunnelEvent(3L, 1000L, 21L, "x"), FunnelEvent(3L, 2000L, 22L, "y"))),
      "funnel_order")
    assert(got == Set((2L, "a>b>c")))
  }

  test("equal timestamps break by event_id — the q128 total order") {
    val got = run(Seq(Seq(
      FunnelEvent(4L, 1000L, 32L, "second"), FunnelEvent(4L, 1000L, 31L, "first"),
      FunnelEvent(4L, 1000L, 33L, "third"))),
      "funnel_ties")
    assert(got == Set((4L, "first>second>third")))
  }

  test("streaming trigram multiset matches the q128 batch window on replayed history") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // small deterministic history: 4 users x 6 events with a seeded cycle
    val hist = (0 until 24).map { i =>
      FunnelEvent(i % 4L, 1000L * (i / 4) , i.toLong,
        Seq("view", "click", "cart", "buy")((i * 7 + i / 4) % 4))
    }
    // batch formulation = q128's window shape on the same projection
    val w = Window.partitionBy(col("userId")).orderBy(col("us"), col("eventId"))
    val expected = hist.toDF()
      .withColumn("e2", lead(col("eventType"), 1).over(w))
      .withColumn("e3", lead(col("eventType"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(col("userId"),
        concat_ws(">", col("eventType"), col("e2"), col("e3")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    // stream the same history in 3 arbitrary batches
    val got = run(hist.grouped(10).toSeq, "funnel_parity")
    // append-mode memory table holds the full multiset; compare as counts
    val gotCounts = spark.table("funnel_parity").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(gotCounts == expected)
    assert(got.nonEmpty)
  }
}
