package graft

import graft.operators.NearestEventJoin
import graft.streaming.StreamingNearestAlign
import graft.streaming.StreamingNearestAlign.{In, Out}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming nearest-event aligner must agree event-for-event with the
  * batch operator (q176's NearestEventJoin) on replayed history — including
  * matches that cross micro-batch boundaries in BOTH directions, the
  * earlier-right tie rule, and tolerance cutoffs. Lefts finalize only when
  * the watermark closes their tolerance window, so the final epilogue event
  * plays the role of time passing. */
class StreamingNearestAlignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tol = 200000L // 200 ms in micros

  private def runStream(batches: Seq[Seq[In]], name: String): Set[Out] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[In]
      val q = StreamingNearestAlign.align(stream.toDS(), tol)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"align_$name").toString)
        .outputMode("append")
        .start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[Out].collect().toSet
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private def runBatch(events: Seq[In]): Set[Out] = {
    import spark.implicits._
    val lefts = events.filterNot(_.isRight).map(e => (e.key, e.tUs))
      .toDF("key", "t")
    val rights = events.filter(_.isRight).map(e => (e.key, e.tUs, e.payload))
      .toDF("key", "t", "payload")
    NearestEventJoin.nearest(lefts, rights, "key", "t", "t", "payload", tol)
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        Out(r.getString(0), r.getLong(1),
          opt(r.fieldIndex("match_t")), opt(r.fieldIndex("match_payload")),
          opt(r.fieldIndex("dt_us")))
      }.toSet
  }

  test("cross-batch parity with the batch nearest-event join on replayed history") {
    val s = 1000000L // 1 second in micros
    // Replayed history: batches respect global event-time order (the
    // watermark is global — disorder beyond the lateness budget is late
    // data by contract, not a parity case).
    val batch1 = Seq(
      // key a: left whose BEST match arrives in the NEXT batch (forward
      // across the boundary); the batch-1 right is in range but farther
      In("a", 10 * s, isRight = true, payload = 1),
      In("a", 10 * s + 150000, isRight = false, payload = 0),
      // key b: right that a batch-2 left will match BACKWARD
      In("b", 10 * s, isRight = true, payload = 7))
    val batch2 = Seq(
      // backward match across the batch boundary (right seen in batch 1)
      In("b", 10 * s + 180000, isRight = false, payload = 0),
      // the closer forward right for a's pending left (50 ms vs 150 ms)
      In("a", 10 * s + 200000, isRight = true, payload = 2),
      // b: left exactly between two rights -> tie goes to the EARLIER;
      // rights equidistant at 50 ms
      In("b", 20 * s, isRight = true, payload = 8),
      In("b", 20 * s + 50000, isRight = false, payload = 0),
      In("b", 20 * s + 100000, isRight = true, payload = 9),
      // a left with NOTHING in tolerance
      In("a", 50 * s, isRight = false, payload = 0))
    val epilogue = Seq(In("a", 1000 * s, isRight = true, payload = 99))

    val all = batch1 ++ batch2 ++ epilogue
    val streamed = runStream(Seq(batch1, batch2, epilogue), "align_parity")
    val batched = runBatch(all)
    assert(streamed == batched,
      s"stream/batch divergence:\n stream-only=${streamed -- batched}\n batch-only=${batched -- streamed}")

    // the scenarios actually happened as designed:
    val byLeft = streamed.map(o => (o.key, o.leftT) -> o).toMap
    // forward match crossed the boundary and beat the same-batch right
    assert(byLeft(("a", 10 * s + 150000)).matchPayload.contains(2L))
    assert(byLeft(("a", 10 * s + 150000)).dtUs.contains(50000L))
    // backward match used batch-1 state
    assert(byLeft(("b", 10 * s + 180000)).matchPayload.contains(7L))
    // equidistant tie resolved to the EARLIER right (payload 8 at 20s,
    // 50 ms before, vs payload 9 at 20.1s, 50 ms after)
    assert(byLeft(("b", 20 * s + 50000)).matchPayload.contains(8L))
    // tolerance cutoff yields an explicit no-match row, not silence
    assert(byLeft(("a", 50 * s)) ==
      Out("a", 50 * s, None, None, None))
  }

  test("state stays O(rate x tolerance) under a many-batch flood") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val s = 1000000L
    // 40 batches, each one second of stream time: 20 rights (every 50 ms)
    // + 2 lefts per batch on one key. The tolerance window holds ~8 rights
    // (2·tol = 400 ms at 20 rights/s) + ~2 pending lefts, so state must
    // plateau within the first few batches and stay flat to batch 40 —
    // growth with batch count would mean the buffers are not pruning.
    val batches = (0 until 40).map { i =>
      val base = (i + 10) * s
      (0 until 20).map(j => In("k", base + j * 50000L, isRight = true,
        payload = i * 100L + j)) ++
        Seq(In("k", base + 310000L, isRight = false, payload = 0),
          In("k", base + 710000L, isRight = false, payload = 0))
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[In]
      val q = StreamingNearestAlign.align(stream.toDS(), tol)
        .writeStream.format("memory").queryName("align_flood")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("align_flood").toString)
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
        s"state grew with batch count (batch10=$early batch40=$late): " +
          s"the tolerance-window prune is not holding\n$rowsTotal")
      // and the flood's answers are still exactly the batch operator's
      val streamed = spark.table("align_flood").as[Out].collect().toSet
      val all = batches.flatten
      val finalized = runBatch(all)
        .filter(o => o.leftT + tol < all.map(_.tUs).max) // wm never passed the tail
      assert(finalized.subsetOf(streamed),
        s"flood lost finalized lefts: ${finalized -- streamed}")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("every left finalizes exactly once across many small batches") {
    val s = 1000000L
    // rights every second, lefts 100 ms after each right, one event per
    // batch — maximal boundary crossing
    val events = (1 to 8).flatMap { i =>
      Seq(In("k", i * s, isRight = true, payload = i.toLong),
        In("k", i * s + 100000, isRight = false, payload = 0))
    } :+ In("k", 100 * s, isRight = true, payload = 99)
    val streamed = runStream(events.map(Seq(_)), "align_single")
    assert(streamed == runBatch(events))
    assert(streamed.count(_.key == "k") == 8)
    assert(streamed.filter(_.matchPayload.isDefined).forall(o =>
      o.dtUs.contains(100000L)), s"each left matches its preceding right: $streamed")
  }
}
