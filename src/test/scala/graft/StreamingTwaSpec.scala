package graft

import graft.streaming.StreamingTwa
import graft.streaming.StreamingTwa.{In, Seg}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming TWA segmenter must reproduce the batch lead() segment
  * decomposition (q180's) segment-for-segment on replayed history, emit
  * each segment exactly once across micro-batch boundaries, and keep state
  * bounded by the out-of-orderness window — not the stream length. */
class StreamingTwaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runStream(batches: Seq[Seq[In]], name: String): Seq[Seg] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[In]
      val q = StreamingTwa.segments(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"twa_$name").toString)
        .outputMode("append")
        .start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[Seg].collect().toSeq
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** The batch operator's segment decomposition (q180's lead window). */
  private def batchSegments(events: Seq[In]): Set[Seg] = {
    import spark.implicits._
    val w = Window.partitionBy(col("userId")).orderBy(col("tUs"), col("eventId"))
    events.toDF("userId", "eventId", "tUs", "cents")
      .withColumn("nextUs", lead(col("tUs"), 1).over(w))
      .filter(col("nextUs").isNotNull)
      .select(col("userId"), col("tUs"), col("nextUs"), col("cents"),
        expr("(nextUs - tUs) div 1000").as("dtMs"))
      .as[Seg].collect().toSet
  }

  test("cross-batch parity with the batch lead() decomposition") {
    val s = 1000000L
    val b1 = Seq(In(1, 10, 10 * s, 500), In(1, 11, 11 * s, 700),
      In(2, 20, 10 * s + 300, 900))
    // user 1's segment (11s -> 12s) crosses the batch boundary; user 2 goes
    // quiet then resumes; a timestamp TIE (same ts, ids 31/32) must order
    // by eventId and emit a zero-length segment
    val b2 = Seq(In(1, 12, 12 * s, 300), In(2, 21, 15 * s, 100),
      In(3, 31, 14 * s, 50), In(3, 32, 14 * s, 80))
    val epilogue = Seq(In(9, 99, 1000 * s, 1))
    val all = b1 ++ b2 ++ epilogue
    val streamed = runStream(Seq(b1, b2, epilogue), "twa_parity")
    assert(streamed.size == streamed.toSet.size, "a segment emitted twice")
    val expected = batchSegments(all)
      .filter(_.nextUs < 1000 * s) // the epilogue's own open segment never seals
    assert(streamed.toSet == expected,
      s"stream-only=${streamed.toSet -- expected} batch-only=${expected -- streamed.toSet}")
    // the tie case really was a zero-length, id-ordered segment
    val tie = streamed.filter(_.userId == 3)
    assert(tie == Seq(Seg(3, 14 * s, 14 * s, 50, 0)),
      s"tie decomposition wrong: $tie")
  }

  test("replayed history aggregates to the batch TWA") {
    val s = 1000000L
    // deterministic pseudo-random history on 3 users
    val events = (0 until 60).map { i =>
      val u = i % 3 + 1L
      In(u, i.toLong, (10 + i) * s + (i * 37 % 500) * 1000L, (i * 53 % 1000) + 1L)
    }
    val epilogue = Seq(In(7, 999, 10000 * s, 1))
    val streamed = runStream((events :+ epilogue.head).grouped(7).toSeq, "twa_agg")
    val twa = streamed.filter(_.userId <= 3).groupBy(_.userId).map { case (u, segs) =>
      u -> segs.map(g => g.cents * g.dtMs).sum / segs.map(_.dtMs).sum
    }
    val expected = batchSegments(events).groupBy(_.userId).map { case (u, segs) =>
      u -> segs.toSeq.map(g => g.cents * g.dtMs).sum / segs.toSeq.map(_.dtMs).sum
    }
    assert(twa == expected)
  }

  test("state stays bounded by the lateness window under a long flood") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val s = 1000000L
    // 40 batches x 20 events on one key: state must plateau at the open
    // tail (one sealed endpoint + in-flight events), not grow with history
    val batches = (0 until 40).map { i =>
      (0 until 20).map(j => In(5, i * 100L + j, (10 + i) * s + j * 50000L,
        j + 1L))
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[In]
      val q = StreamingTwa.segments(stream.toDS())
        .writeStream.format("memory").queryName("twa_flood")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("twa_flood").toString)
        .outputMode("append")
        .start()
      val rowsTotal = batches.map { b =>
        stream.addData(b: _*); q.processAllAvailable()
        Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum)
          .getOrElse(0L)
      }
      q.stop()
      val early = rowsTotal(9)
      val late = rowsTotal.last
      assert(early > 0, s"state metric must be observable: $rowsTotal")
      assert(late <= early * 2 && late <= 64,
        s"state grew with history (batch10=$early batch40=$late)\n$rowsTotal")
      // every sealed segment arrived exactly once
      val streamed = spark.table("twa_flood").as[Seg].collect().toSeq
      assert(streamed.size == streamed.toSet.size)
      val all = batches.flatten
      val expected = batchSegments(all).filter(_.nextUs < all.map(_.tUs).max)
      assert(expected.subsetOf(streamed.toSet),
        s"flood lost sealed segments: ${expected -- streamed.toSet}")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
