package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Continuous Misra–Gries heavy hitters: the cross-batch summary must obey
  * the MG guarantee (no heavy item ever missing), report only lower-bound
  * weights, keep ≤ k counters per group, and accumulate items that arrive
  * split across micro-batches — all on an adversarial replay where a flood
  * of singletons tries to evict the heavy items between batches. */
class StreamingTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("MG guarantee, lower bounds, bounded state across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val k = 8
      // group "g": heavy items split ACROSS batches + singleton floods
      val heavy = Seq.fill(60)("alpha") ++ Seq.fill(45)("beta")
      val flood1 = (0 until 80).map(i => s"noise1_$i")
      val flood2 = (0 until 80).map(i => s"noise2_$i")
      val batch1 = (heavy.take(30) ++ flood1 ++ heavy.slice(60, 80)).map(("g", _))
      val batch2 = (heavy.drop(30).take(30) ++ flood2 ++ heavy.drop(80)).map(("g", _))
      val n = batch1.size + batch2.size

      val perBatch = scala.collection.mutable.ArrayBuffer.empty[Map[String, Long]]
      val stream = MemoryStream[(String, String)]
      val q = graft.streaming.StreamingTopK.heavyHitters(stream.toDS(), k)
        .toDF("grp", "item", "w")
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val m = df.collect().map(r => r.getString(1) -> r.getLong(2)).toMap
          if (m.nonEmpty) perBatch += m
          ()
        }
        .start()
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
      q.stop()

      // final summary = the last non-empty batch's full emission (the
      // processor re-emits its whole summary every batch)
      val finalSummary = perBatch.last

      val trueCounts = (batch1 ++ batch2).groupBy(_._2).map { case (i, vs) => i -> vs.size.toLong }
      // guarantee: any item with f > N/(k+1) must be present
      val threshold = n.toDouble / (k + 1)
      trueCounts.filter(_._2 > threshold).keys.foreach { it =>
        assert(finalSummary.contains(it), s"heavy item $it (f=${trueCounts(it)}, " +
          s"N/(k+1)=$threshold) missing from $finalSummary")
      }
      // weights are lower bounds and within the MG error of the truth
      finalSummary.foreach { case (it, w) =>
        val f = trueCounts.getOrElse(it, 0L)
        assert(w <= f, s"$it weight $w exceeds true count $f")
        assert(f - w <= threshold + 1, s"$it weight $w under-counts $f beyond the bound")
      }
      // bounded state: never more than k counters per group in any emission batch
      assert(finalSummary.size <= k)
      // the singleton floods must not survive as heavy
      assert(!finalSummary.keys.exists(_.startsWith("noise")) ||
        finalSummary.filter(_._1.startsWith("noise")).values.forall(_ <= 2),
        s"flood noise promoted to heavy: $finalSummary")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
