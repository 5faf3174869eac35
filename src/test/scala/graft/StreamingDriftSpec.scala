package graft

import graft.streaming.StreamingDrift
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming drift monitor: the running histogram merged across
  * micro-batches must equal the batch histogram of the same history
  * (count-for-count), PSI must agree with a one-shot batch computation on
  * identical data, matching distributions must score ~0, and a drifted
  * stream must register. */
class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("source", "n_chars")
  }

  // reference: two sources with distinct length profiles
  private def refRows: Seq[(String, Long)] =
    (0 until 200).map(i => ("web", (i % 5) * 64L + 10)) ++
      (0 until 200).map(i => ("code", (i % 3) * 128L + 30))

  test("cross-batch running histogram == batch histogram; PSI parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reference = StreamingDrift.prepareReference(docs(refRows))

    // same-distribution arrivals split over 3 micro-batches
    val arrivals = refRows.map { case (s, n) => (s, n) }
    val batches = arrivals.grouped(140).toSeq

    var state = StreamingDrift.prepareReference(docs(Seq.empty[(String, Long)]))
    val stream = MemoryStream[(String, Long)]
    val q = stream.toDF().toDF("source", "n_chars").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state = StreamingDrift.updatedCounts(state, batch)
        // materialize so the next merge doesn't re-plan the whole chain
        state = state.collect().toSeq
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toDF("source", "bin", "n")
        ()
      }
      .start()
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()

    // running histogram equals the one-shot batch histogram
    val oneShot = StreamingDrift.prepareReference(docs(arrivals))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val running = state.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(running == oneShot, "cross-batch merge diverged from batch histogram")

    // identical distributions: PSI must be ~0 (floor-ln leaves ±bins slack)
    val psi = StreamingDrift.psiMicro(reference, state)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(psi.keySet == Set("web", "code"))
    assert(psi.values.forall(v => v >= 0L && v < 100L),
      s"same-distribution PSI must be ~0 micro-nats, got $psi")
  }

  test("n_chars >= 640 lands in the clamped edge bin, batch/stream alike") {
    import spark.implicits._
    // the advisor's round-8 gap: the batch q171 used an unclamped
    // `n_chars div 64` against a 10-bin spine, silently dropping every
    // document past 640 chars from the census while the stream clamped
    // them into bin 9. Both now clamp — pin the parity on the edge bin.
    val long = docs(Seq(("web", 640L), ("web", 1000L), ("web", 64000L),
      ("web", 100L)))
    val hist = StreamingDrift.prepareReference(long)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(hist == Map(9L -> 3L, 1L -> 1L),
      s"edge-bin clamp must capture all >=640-char docs: $hist")
    // the batch query's binning expression agrees bin-for-bin
    val batchBins = long.select(expr("least(n_chars div 64, 9)").as("bin"))
      .groupBy("bin").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(batchBins == hist, "q171 batch binning diverged from the stream's")
    // and a reference/current pair built purely of edge-bin docs scores 0
    val psi = StreamingDrift.psiMicro(
      StreamingDrift.prepareReference(long),
      StreamingDrift.prepareReference(long))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(psi("web") >= 0L && psi("web") < 100L, s"identical edge-heavy " +
      s"histograms must score ~0: $psi")
  }

  test("a drifted stream registers, an in-distribution one does not") {
    val reference = StreamingDrift.prepareReference(docs(refRows))
    // web drifts to much longer documents; code stays on-profile
    val drifted = (0 until 200).map(i => ("web", 500L + (i % 3) * 64L)) ++
      (0 until 200).map(i => ("code", (i % 3) * 128L + 30))
    val cur = StreamingDrift.prepareReference(docs(drifted))
    val psi = StreamingDrift.psiMicro(reference, cur)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(psi("web") > 500000L, s"strong drift must register: $psi")
    assert(psi("code") < 100L, s"on-profile source must stay near 0: $psi")
  }
}
