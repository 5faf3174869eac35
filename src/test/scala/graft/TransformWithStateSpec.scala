package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState running counts must accumulate across micro-batches
  * (state persists in the RocksDB state store between triggers). */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("running count accumulates across batches via RocksDB state store") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(Long, Long)]
      val q = graft.streaming.RunningCounts.runningCounts(stream.toDS())
        .toDF("user_id", "n")
        .writeStream.format("memory").queryName("tws_out").outputMode("update").start()

      stream.addData((1L, 10L), (1L, 11L), (2L, 20L))
      q.processAllAvailable()
      stream.addData((1L, 12L), (3L, 30L))
      q.processAllAvailable()
      q.stop()

      // last update per user wins: user 1 counted 2 then 3; user 2: 1; user 3: 1
      val last = spark.table("tws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(last == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
