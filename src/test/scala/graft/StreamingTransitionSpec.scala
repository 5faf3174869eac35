package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous transition monitor must emit, over any stream prefix,
  * exactly the lead-1 pairs of q185's (ts, event_id)-ordered per-user
  * window over that prefix; after full replay the cumulative matrix must
  * equal the BATCH q185 operator row-for-row (counts and floor-div ppm);
  * and state must stay at one row per user regardless of batch count —
  * the O(1)-per-key story that distinguishes the twin from re-windowing
  * history. */
class StreamingTransitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runStream(batches: Seq[Seq[(Long, Long, Long, String)]])
      : (Seq[(String, String)], Long) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val stream = MemoryStream[(Long, Long, Long, String)]
      val q = graft.streaming.StreamingTransition.pairs(stream.toDS())
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[(String, String)], _: Long) =>
          got ++= df.collect()
          ()
        }
        .start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      q.stop()
      (got.toSeq, stateRows)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** Reference lead-1 pairs of a prefix: per user, (ts, event_id) order. */
  private def refPairs(rows: Seq[(Long, Long, Long, String)]): Seq[(String, String)] =
    rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (r._2, r._3)).map(_._4).sliding(2)
        .collect { case Seq(a, b) => (a, b) }.toSeq
    }

  test("full replay equals the batch q185 matrix; state is one row per user") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long"), col("event_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    // globally time-ordered chunks keep each user's stream monotone across
    // batches — the documented arrive-in-order twin contract
    val (pairs, stateRows) = runStream(rows.grouped(rows.size / 4 + 1).toSeq)
    val got = graft.streaming.StreamingTransition.matrix(pairs)
    val batch = SparkEntry.queries("q185_transition_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == batch, s"cumulative matrix diverged: got ${got.take(3)}…")
    val users = rows.map(_._1).distinct.size.toLong
    assert(stateRows == users,
      s"state must be exactly one tail row per user ($users), got $stateRows")
  }

  test("every prefix emits exactly the prefix's lead-1 pairs (order-insensitive multiset)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      ((i % 13).toLong, 1000L * i, i.toLong, s"t${rnd.nextInt(4)}")
    }
    val batches = rows.grouped(90).toSeq
    batches.indices.foreach { i =>
      val prefix = batches.take(i + 1).flatten
      val (pairs, _) = runStream(batches.take(i + 1))
      assert(pairs.sorted == refPairs(prefix).sorted, s"prefix ${i + 1}")
    }
  }

  test("a user whose events split across many batches chains across the boundary") {
    val one = (0 until 10).map(i => (1L, 100L * i, i.toLong, s"t${i % 3}"))
    val (pairs, stateRows) = runStream(one.map(Seq(_)))   // one event per batch
    assert(pairs == refPairs(one), "cross-batch chaining broke")
    assert(stateRows == 1L)
  }
}
