package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous EWMA monitor's twin contract is DIGIT parity with batch
  * q217: after replaying any prefix, the last emitted row per
  * (event_type, t) must be bit-identical to the batch query run over the
  * same prefix — including gap-day 0-fill rows — with one documented
  * restriction: the twin is causal per key (it emits a key only up to
  * that key's own latest day), while the batch spine pads every type to
  * the GLOBAL max day, so the comparison clips batch rows to each key's
  * emitted range. State must be exactly one bounded row per key. */
class StreamingEwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Run the twin over `batches`, return (last row per (key, t), state rows). */
  private def runStream(batches: Seq[Seq[(String, Long, Long)]])
      : (Map[(String, Long), (Long, Long, Option[Long], Boolean)], Long) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val last = scala.collection.mutable.Map
        .empty[(String, Long), (Long, Long, Option[Long], Boolean)]
      val stream = MemoryStream[(String, Long, Long)]
      val q = graft.streaming.StreamingEwma.monitor(stream.toDS())
        .writeStream.outputMode("append")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[graft.streaming.EwmaPoint], _: Long) =>
            df.collect().foreach(p => last((p.event_type, p.t)) =
              (p.x_cents, p.ewma_cents, p.ratio_ppm, p.is_anomaly))
            ()
        }
        .start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      q.stop()
      (last.toMap, stateRows)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** Batch q217 on an (event_type, ts, value) frame written as a one-table
    * testdata dir — the strongest possible oracle for the twin. */
  private def batchRows(events: org.apache.spark.sql.DataFrame)
      : Map[(String, Long), (Long, Long, Option[Long], Boolean)] = {
    val dir = java.nio.file.Files.createTempDirectory("ewma_batch").toString
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries("q217_ewma_anomaly")(spark, dir).collect().map { r =>
      (r.getString(r.fieldIndex("event_type")), r.getLong(r.fieldIndex("t"))) ->
        ((r.getLong(r.fieldIndex("x_cents")),
          r.getLong(r.fieldIndex("ewma_cents")),
          if (r.isNullAt(r.fieldIndex("ratio_ppm"))) None
          else Some(r.getLong(r.fieldIndex("ratio_ppm"))),
          r.getBoolean(r.fieldIndex("is_anomaly"))))
    }.toMap
  }

  /** Day-monotone batches that still exercise cross-trigger same-day
    * top-ups: each day's events split in half, the second half riding in
    * the NEXT trigger together with the following day's first half. */
  private def staggeredBatches(evs: Seq[(String, Long, Long)])
      : Seq[Seq[(String, Long, Long)]] = {
    val byDay = evs.groupBy(_._2).toSeq.sortBy(_._1).map(_._2)
    val halves = byDay.flatMap { day =>
      val (a, b) = day.splitAt(math.max(1, day.size / 2))
      Seq(a, b).filter(_.nonEmpty)
    }
    // offset pairing [a0], [b0,a1], [b1,a2], …: each day's tail lands one
    // trigger AFTER its head, forcing the cross-trigger top-up path
    Seq(halves.head) ++ halves.tail.sliding(2, 2).map(_.flatten).toSeq
  }

  test("digit parity with batch q217 over two prefixes of real events") {
    val dir = "/root/testdata/sf0.001"
    val base = Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("value"))
    val d0 = base.agg(min(to_date(col("ts")))).collect()(0).getDate(0)
    val span = base.agg(datediff(max(to_date(col("ts"))),
      min(to_date(col("ts"))))).collect()(0).getInt(0)
    for (cutoff <- Seq(span.toLong / 2, span.toLong)) {
      val prefix = base.filter(
        datediff(to_date(col("ts")), lit(d0)) <= cutoff)
      val expected = batchRows(prefix)
      val evs = prefix
        .select(col("event_type"),
          datediff(to_date(col("ts")), lit(d0)).cast("long").as("t"),
          expr("CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT)").as("cents"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        .sortBy(e => (e._2, e._1))
      val (got, stateRows) = runStream(staggeredBatches(evs))
      val lastDay = evs.groupBy(_._1).map { case (k, es) => k -> es.map(_._2).max }
      // twin == batch on every (key, t <= key's own last day), every field
      val clipped = expected.filter { case ((k, t), _) => t <= lastDay(k) }
      assert(got == clipped,
        s"cutoff=$cutoff: twin rows diverge from batch (twin=${got.size}, " +
          s"batch-clipped=${clipped.size})")
      assert(stateRows == lastDay.size.toLong,
        s"expected one state row per key, saw $stateRows")
    }
  }

  test("gap-day boundary: 0-fill rows appear with the batch's exact levels") {
    import spark.implicits._
    // key g: days 0 and 5 (gap 1-4); key h: day 0 only. Batch pads h to
    // the global horizon t=5; the causal twin stops h at t=0 — the
    // documented divergence, pinned here alongside g's full parity.
    val rows = Seq(
      ("g", java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), "41.25"),
      ("g", java.sql.Timestamp.valueOf("2026-01-01 16:00:00"), "8.75"),
      ("h", java.sql.Timestamp.valueOf("2026-01-01 12:00:00"), "3.00"),
      ("g", java.sql.Timestamp.valueOf("2026-01-06 09:00:00"), "200.00"))
      .toDF("event_type", "ts", "value")
    val expected = batchRows(rows)
    val evs = Seq(("g", 0L, 4125L), ("g", 0L, 875L), ("h", 0L, 300L),
      ("g", 5L, 20000L))
    // day-0 rows split across two triggers: the same-day top-up path
    val (got, stateRows) = runStream(Seq(evs.take(1), evs.slice(1, 3), evs.drop(3)))
    assert(got.keySet == Set(("g", 0L), ("g", 1L), ("g", 2L), ("g", 3L),
      ("g", 4L), ("g", 5L), ("h", 0L)))
    got.foreach { case (k, v) =>
      assert(expected(k) == v, s"$k: twin $v vs batch ${expected(k)}")
    }
    // the gap days really decayed: x=0, level halves day over day
    assert(got(("g", 1L))._1 == 0L && got(("g", 4L))._1 == 0L)
    assert(got(("g", 1L))._2 < got(("g", 0L))._2)
    // day 5's ratio compares against day 4's decayed level and flags
    assert(got(("g", 5L))._4, "a 20000-cent day against a decayed level must flag")
    assert(stateRows == 2L)
  }

  test("out-of-order arrival behind the open day fails loudly") {
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream(Seq(Seq(("k", 3L, 100L)), Seq(("k", 1L, 50L))))
    }
    val msg = Option(thrown.getCause).map(_.toString).getOrElse(thrown.toString)
    assert(msg.contains("day-monotone") || thrown.toString.contains("day-monotone"))
  }
}
