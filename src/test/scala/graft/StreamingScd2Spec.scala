package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The online SCD2 twin's contract is DIGIT parity with batch q218 on any
  * prefix, with NO causal clipping: the latest emitted row per
  * (user_id, valid_from_us) is the batch version stream — closed
  * versions final at type-change time, the open version's duration
  * always last-event-anchored — so the PUBLISHED q218 census recomputed
  * over the twin's rows must equal the batch query's output to the
  * digit. State must be exactly one bounded row per user. */
class StreamingScd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Run the twin over `batches`, return (latest row per (user, start),
    * state rows). */
  private def runStream(batches: Seq[Seq[(Long, Long, Long, String)]])
      : (Map[(Long, Long), (String, Long, Boolean, Long)], Long) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val last = scala.collection.mutable.Map
        .empty[(Long, Long), (String, Long, Boolean, Long)]
      val stream = MemoryStream[(Long, Long, Long, String)]
      val q = graft.streaming.StreamingScd2.history(stream.toDS())
        .writeStream.outputMode("append")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[graft.streaming.Scd2Version],
              _: Long) =>
            df.collect().foreach(v => last((v.user_id, v.valid_from_us)) =
              (v.event_type, v.dur_us, v.cur, v.n_events))
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

  /** The published batch census on an events frame written as a one-table
    * testdata dir — the strongest possible oracle for the twin. */
  private def batchCensus(events: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("scd2_batch").toString
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries("q218_scd2_history")(spark, dir).collect().map { r =>
      r.getString(r.fieldIndex("event_type")) ->
        ((r.getLong(r.fieldIndex("n_versions")),
          r.getLong(r.fieldIndex("n_current")),
          r.getLong(r.fieldIndex("total_dur_us")),
          r.getLong(r.fieldIndex("mean_dur_us"))))
    }.toMap
  }

  /** The q218 census recomputed from the twin's latest version rows. */
  private def censusOf(rows: Map[(Long, Long), (String, Long, Boolean, Long)])
      : Map[String, (Long, Long, Long, Long)] =
    rows.values.groupBy(_._1).map { case (tpe, vs) =>
      val n = vs.size.toLong
      val tot = vs.map(_._2).sum
      tpe -> ((n, vs.count(_._3).toLong, tot, Math.floorDiv(tot, n)))
    }

  test("census digit parity with batch q218 over two prefixes of real events") {
    val dir = "/root/testdata/sf0.001"
    val base = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val cut = base.agg(expr("percentile_approx(unix_micros(ts), 0.5)"))
      .collect()(0).getLong(0)
    for (prefix <- Seq(base.filter(unix_micros(col("ts")) <= cut), base)) {
      val expected = batchCensus(prefix)
      val evs = prefix
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq.sortBy(e => (e._3, e._2)) // global time order => per-user monotone
      // three uneven triggers: version opens/closes crossing trigger edges
      val batches = Seq(evs.take(evs.size / 3),
        evs.slice(evs.size / 3, 2 * evs.size / 3),
        evs.drop(2 * evs.size / 3))
      val (got, stateRows) = runStream(batches)
      assert(censusOf(got) == expected,
        s"twin census diverges from batch q218 (${got.size} version rows)")
      val users = evs.map(_._1).distinct.size.toLong
      assert(stateRows == users,
        s"expected one state row per user, saw $stateRows vs $users users")
    }
  }

  test("version boundaries: close-at-change, open-extends, n_events exact") {
    // user 7: A(t=10,20) -> B(t=30) -> A(t=45,50); user 9: C(t=15) only.
    def e(u: Long, eid: Long, us: Long, t: String) = (u, eid, us, t)
    val evs = Seq(e(7, 1, 10, "A"), e(7, 2, 20, "A"), e(9, 3, 15, "C"),
      e(7, 4, 30, "B"), e(7, 5, 45, "A"), e(7, 6, 50, "A"))
    // split mid-version: A's second event and B ride later triggers
    val (got, stateRows) = runStream(Seq(evs.take(1), evs.slice(1, 4),
      evs.drop(4)))
    assert(got == Map(
      (7L, 10L) -> (("A", 20L, false, 2L)),  // closed by B at us=30
      (7L, 30L) -> (("B", 15L, false, 1L)),  // closed by A at us=45
      (7L, 45L) -> (("A", 5L, true, 2L)),    // open, extended to us=50
      (9L, 15L) -> (("C", 0L, true, 1L))),   // open singleton, zero dur
      s"version rows wrong: $got")
    assert(stateRows == 2L)
  }

  test("out-of-order arrival behind the user cursor fails loudly") {
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream(Seq(Seq((1L, 10L, 100L, "A")), Seq((1L, 11L, 90L, "A"))))
    }
    val msg = Option(thrown.getCause).map(_.toString).getOrElse(thrown.toString)
    assert(msg.contains("monotone") || thrown.toString.contains("monotone"))
  }

  test("duplicate (ts, event_id) arrival fails loudly") {
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream(Seq(Seq((1L, 10L, 100L, "A")), Seq((1L, 10L, 100L, "A"))))
    }
    val msg = Option(thrown.getCause).map(_.toString).getOrElse(thrown.toString)
    assert(msg.contains("monotone") || thrown.toString.contains("monotone"))
  }

  test("type change at the open version's start microsecond fails loudly") {
    // Round-15 advisor finding: (us=100, eid=10, A) then (us=100, eid=11, B)
    // passes the monotone cursor but would close a zero-duration A version
    // keyed (user, 100) AND open B at the same (user, 100) — downstream
    // latest-per-key would drop the closed version batch q218 counts. The
    // contract excludes it loudly; same-us events of the SAME type stay
    // legal (version extension, no new key).
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream(Seq(Seq((1L, 10L, 100L, "A")), Seq((1L, 11L, 100L, "B"))))
    }
    val all = Iterator.iterate[Throwable](thrown)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("\n")
    assert(all.contains("valid_from_us"), s"expected the key-collision message, got: $all")
    // same microsecond, same type: legal extension (eid advances the cursor)
    val (got, _) = runStream(Seq(Seq((2L, 1L, 100L, "A")), Seq((2L, 2L, 100L, "A"))))
    assert(got == Map((2L, 100L) -> (("A", 0L, true, 2L))), s"got: $got")
  }
}
