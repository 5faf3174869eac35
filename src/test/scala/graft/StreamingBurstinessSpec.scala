package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous burstiness monitor must equal the BATCH q214 operator
  * value-for-value after full replay — n, min/max/mean gap, and the
  * exact-ppm CV² floor division — while holding ONE state row per event
  * type regardless of batch count (the O(1)-per-key story vs re-deriving
  * every gap per run). Micro-batch boundaries must not create or lose
  * gaps: the boundary gap is carried by the state tuple's (lastTs,
  * lastId). */
class StreamingBurstinessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runStream(batches: Seq[Seq[(String, Long, Long)]])
      : (Map[String, (Long, Long, Long, Long, Long)], Long) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // running rows re-emit per trigger; keep the LAST per type
      val last = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long, Long)]
      val stream = MemoryStream[(String, Long, Long)]
      val q = graft.streaming.StreamingBurstiness.stats(stream.toDS())
        .writeStream.outputMode("append")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[(String, Long, Long, Long, Long, Long)],
           _: Long) =>
            df.collect().foreach(r => last(r._1) = (r._2, r._3, r._4, r._5, r._6))
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

  test("full replay equals batch q214 value-for-value; state is one row per type") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")), col("event_id"))
      .orderBy(col("ts"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // globally time-ordered chunks keep each type's stream monotone across
    // batches — the documented arrive-in-order twin contract; 5 batches
    // ensure several per-type boundary gaps cross micro-batches
    val (got, stateRows) = runStream(rows.grouped(rows.size / 5 + 1).toSeq)
    val batch = SparkEntry.queries("q214_burstiness")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4), r.getLong(2),
        r.getLong(3), r.getLong(5))).toMap
    // batch row: (event_type, n_gaps, min, max, mean, cv2)
    val batchShaped = batch.map { case (t, (n, mean, mn, mx, cv2)) =>
      t -> (n, mn, mx, mean, cv2)
    }
    assert(got == batchShaped,
      s"running stats diverged from batch q214:\n got=$got\n exp=$batchShaped")
    assert(stateRows == got.size.toLong,
      s"expected one state row per type, saw $stateRows for ${got.size} types")
  }

  test("a one-event batch carries the boundary gap through state") {
    // 3 events, one per batch, same type: 2 gaps must be counted and the
    // final CV2 must match the closed-form over exactly those gaps.
    val rows = Seq(("x", 1000000L, 1L), ("x", 4000000L, 2L), ("x", 13000000L, 3L))
    val (got, _) = runStream(rows.map(Seq(_)))
    val gaps = Seq(3000000L, 9000000L)
    val n = gaps.size.toLong
    val sg = gaps.sum
    val sg2 = gaps.map(g => BigInt(g) * BigInt(g)).sum
    val cv2 = (BigInt(1000000) * (BigInt(n) * sg2 - BigInt(sg) * BigInt(sg)) /
      (BigInt(sg) * BigInt(sg))).toLong
    assert(got("x") == ((n, gaps.min, gaps.max, sg / n, cv2)))
  }
}
