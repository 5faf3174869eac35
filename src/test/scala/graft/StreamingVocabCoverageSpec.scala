package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous vocabulary-coverage monitor must equal the BATCH q203
  * operator value-for-value after full replay — counts, ppm missing
  * mass, and the Chao1 floor division — while holding one state row per
  * source whose SIZE is the source's vocabulary, not its token count.
  * Counts are commutative, so unlike the gap/chain twins this holds for
  * ANY batch split (pinned with an adversarial shuffled split). */
class StreamingVocabCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runStream(batches: Seq[Seq[(String, String)]])
      : (Map[String, (Long, Long, Long, Long, Long, Long)], Long) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val last = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long, Long, Long)]
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
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      q.stop()
      (last.toMap, stateRows)
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
    val (got, stateRows) = runStream(batches)
    val batch = SparkEntry.queries("q203_vocab_coverage")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == batch,
      s"running coverage diverged from batch q203:\n got=${got.take(3)}\n exp=${batch.take(3)}")
    assert(stateRows == got.size.toLong,
      s"expected one state row per source, saw $stateRows for ${got.size} sources")
  }
}
