package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous quantile monitor must, after replaying any stream
  * prefix, (a) report the EXACT count n per key (weight conservation is
  * fold-order-invariant), (b) emit estimates whose true ranks sit inside
  * the same band the batch q216 witness asserts — under an adversarial
  * interleaved split — and (c) hold exactly one bounded state row per
  * key. Digit parity with batch is deliberately NOT asserted: sketch
  * content depends on the merge tree; the CONTRACT is the band. */
class StreamingKllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 256
  private val PPMS = Seq(250000L, 500000L, 750000L, 900000L, 990000L)

  private def runStream(batches: Seq[Seq[(String, Long)]])
      : (Map[String, (Long, Seq[Long])], Long) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val last = scala.collection.mutable.Map.empty[String, (Long, Seq[Long])]
      val stream = MemoryStream[(String, Long)]
      val q = graft.streaming.StreamingKll.stats(stream.toDS(), K, PPMS)
        .writeStream.outputMode("append")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[(String, Long, Seq[Long])], _: Long) =>
            df.collect().foreach(r => last(r._1) = (r._2, r._3))
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

  test("replayed prefix honors the batch band: exact n, in-band ranks, 1 state row/key") {
    val dir = "/root/testdata/sf0.001"
    val vals = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // adversarial split: deterministic interleave, NOT time-ordered
    val batches = vals.zipWithIndex.groupBy(_._2 % 5).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    val (got, stateRows) = runStream(batches)
    val byKey = vals.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted }
    assert(got.keySet == byKey.keySet)
    byKey.foreach { case (key, sorted) =>
      val n = sorted.size.toLong
      val (gotN, ests) = got(key)
      assert(gotN == n, s"$key: n=$gotN expected $n")
      // the q216 witness band: true rank of est within max(3%*n, 16)
      val tol = math.max(n * 3L / 100L, 16L)
      PPMS.zip(ests).foreach { case (p, est) =>
        val target = math.min(n, math.max(1L, (n * p + 999999L) / 1000000L))
        val rankLe = sorted.count(_ <= est).toLong
        val rankLt = sorted.count(_ < est).toLong
        assert(rankLt < target + tol && rankLe >= target - tol,
          s"$key p=$p: est=$est rank=[${rankLt + 1},$rankLe] target=$target tol=$tol")
      }
    }
    assert(stateRows == got.size.toLong,
      s"expected one state row per key, saw $stateRows for ${got.size} keys")
  }

  test("estimates are exact while a key's stream is shorter than k") {
    val vals = (1L to 100L).map(v => ("g", v))
    val (got, _) = runStream(Seq(vals.take(40), vals.drop(40)))
    val (n, ests) = got("g")
    assert(n == 100L)
    PPMS.zip(ests).foreach { case (p, est) =>
      val target = math.max(1L, (100L * p + 999999L) / 1000000L)
      assert(est == target, s"p=$p: est=$est exact=$target")
    }
  }
}
