package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous vocabulary-coverage monitor must equal the BATCH q203
  * operator value-for-value after full replay — counts, ppm missing
  * mass, and the Chao1 floor division — while holding state BOUNDED BY
  * THE VOCABULARY (one MapState row per (source, word) plus one moments
  * row per source, never the token count) and touching only the BATCH'S
  * OWN novelty per trigger (MapState point updates — the round-12
  * Kryo'd ValueState[Map] rewrote the whole vocabulary per trigger).
  * Counts are commutative, so unlike the gap/chain twins parity holds
  * for ANY batch split (pinned with an adversarial shuffled split). */
class StreamingVocabCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Runs the batches; returns (last row per source, total state rows,
    * per-trigger (inputRows, updatedStateRows) in order). */
  private def runStream(batches: Seq[Seq[(String, String)]])
      : (Map[String, (Long, Long, Long, Long, Long, Long)], Long, Seq[(Long, Long)]) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val last = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long, Long, Long)]
      val perTrigger = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val stream = MemoryStream[(String, String)]
      val q = graft.streaming.StreamingVocabCoverage.stats(stream.toDS())
        .writeStream.outputMode("append")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[(String, Long, Long, Long, Long, Long, Long)],
           _: Long) =>
            df.collect().foreach(r => last(r._1) = (r._2, r._3, r._4, r._5, r._6, r._7))
            ()
        }
        .start()
      batches.foreach { b =>
        stream.addData(b: _*); q.processAllAvailable()
        Option(q.lastProgress).foreach { p =>
          perTrigger += ((p.numInputRows,
            p.stateOperators.map(_.numRowsUpdated).sum))
        }
      }
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      q.stop()
      (last.toMap, stateRows, perTrigger.toSeq)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("full replay equals batch q203 value-for-value under an arbitrary split") {
    val dir = "/root/testdata/sf0.001"
    val toks = graft.Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // adversarial split: deterministic interleave, NOT time/source-ordered
    // — counts commute, so any split must converge to the same row
    val batches = toks.zipWithIndex.groupBy(_._2 % 7).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    val (got, stateRows, _) = runStream(batches)
    val batch = SparkEntry.queries("q203_vocab_coverage")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == batch,
      s"running coverage diverged from batch q203:\n got=${got.take(3)}\n exp=${batch.take(3)}")
    // State is vocabulary-bounded: one MapState row per (source, word)
    // plus one moments row per source — never the token count.
    val vocabRows = toks.distinct.size.toLong
    assert(stateRows == vocabRows + got.size.toLong,
      s"expected vocab-bounded state ($vocabRows word rows + ${got.size} " +
        s"moment rows), saw $stateRows")
    assert(stateRows < toks.size.toLong,
      s"state ($stateRows rows) must stay below token count (${toks.size})")
  }

  test("a trigger's state-store updates scale with the BATCH, not the vocabulary") {
    // Flood: one big batch establishes a 5000-word vocabulary; a tiny
    // follow-up batch carries 8 distinct words (4 seen, 4 novel). A
    // whole-map rewrite would update ~5000 state rows on the second
    // trigger; MapState point updates touch only the 8 words + 1 moments
    // row. (The exact metric may count a couple of bookkeeping rows, so
    // the bound is «vocab, with headroom: <= 32.)
    val flood = (0 until 5000).map(i => ("src", s"w$i"))
    val trickle = Seq("w0", "w1", "w2", "w3", "new0", "new1", "new2", "new3")
      .map(w => ("src", w))
    val (got, stateRows, perTrigger) = runStream(Seq(flood, trickle))
    assert(perTrigger.size == 2 && perTrigger(1)._1 == 8L,
      s"expected two triggers with 8 rows in the second, saw $perTrigger")
    val updated = perTrigger(1)._2
    assert(updated <= 32L,
      s"second trigger updated $updated state rows - expected ~9 " +
        "(8 words + moments), a whole-vocabulary rewrite would show ~5000")
    assert(stateRows == 5004L + 1L,
      s"expected 5004 word rows + 1 moments row, saw $stateRows")
    // Running moments after the trickle: v=5004, t=5008, n1=5000
    // (w0..w3 left count 1, the 4 novels entered it — net 0), n2=4
    // (w0..w3 entered count 2).
    assert(got("src") == (5004L, 5008L, 5000L, 4L,
      5000L * 1000000L / 5008L, 5004L + 5000L * 4999L / (2L * 5L)),
      s"moment bookkeeping diverged: ${got("src")}")
  }
}
