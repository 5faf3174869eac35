package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous OLS monitor must equal the BATCH q183 operator on the
  * same derivation after replaying history (slope/intercept bit-exact,
  * R² within ulps of the decimal→double path), equal the closed-form
  * power-sum formulas on every stream prefix, and degrade to None on a
  * single-x key exactly as q183 degrades to NULL. */
class StreamingOlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runStream(batches: Seq[Seq[(String, Long, Long)]]): Map[String, graft.streaming.StreamingOls.Fit] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val last = scala.collection.mutable.Map.empty[String, graft.streaming.StreamingOls.Fit]
      val stream = MemoryStream[(String, Long, Long)]
      val q = graft.streaming.StreamingOls.trends(stream.toDS())
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.StreamingOls.Fit], _: Long) =>
          df.collect().foreach(f => last(f.key) = f)
          ()
        }
        .start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      q.stop()
      last.toMap
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("replayed history equals the batch q183 operator on the same derivation") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.events(spark, dir).select(
        col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long"),
        (graft.functions.Exact.money(col("value")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = runStream(rows.grouped(rows.size / 4 + 1).toSeq)
    val batch = SparkEntry.queries("q183_ols_trend")(spark, dir).collect()
    assert(batch.nonEmpty && streamed.size == batch.length)
    batch.foreach { r =>
      val f = streamed(r.getString(0))
      assert(f.n == r.getLong(1), s"${r.getString(0)} n")
      assert(f.slopeUcentsDay.contains(r.getLong(2)), s"${r.getString(0)} slope")
      assert(f.iceptCents.contains(r.getLong(3)), s"${r.getString(0)} icept")
      val r2b = r.getDouble(4)
      assert(f.r2.exists(v => math.abs(v - r2b) <= math.ulp(r2b) * 8),
        s"${r.getString(0)} r2 ${f.r2} vs $r2b")
    }
  }

  test("every prefix equals the closed-form fit; single-x keys degrade to None") {
    val mk = (i: Int) => ("k", (i % 37).toLong, (i * 53 % 997 + 1).toLong)
    val rows = (0 until 200).map(mk) ++ (0 until 30).map(i => ("flat", 5L, i + 1L))
    val batches = rows.grouped(45).toSeq
    // replay prefix by prefix, checking the emitted fit after each batch
    var prefix = Seq.empty[(String, Long, Long)]
    batches.indices.foreach { i =>
      prefix ++= batches(i)
      val streamed = runStream(batches.take(i + 1))
      prefix.groupBy(_._1).foreach { case (k, rs) =>
        val s = Array(BigInt(rs.size), BigInt(rs.map(_._2).sum), BigInt(rs.map(_._3).sum),
          rs.map(r => BigInt(r._2) * r._2).sum, rs.map(r => BigInt(r._2) * r._3).sum,
          rs.map(r => BigInt(r._3) * r._3).sum)
        assert(streamed(k) == graft.streaming.StreamingOls.fit(k, s),
          s"prefix ${i + 1}, key $k")
      }
    }
    val fin = runStream(batches)
    assert(fin("flat").slopeUcentsDay.isEmpty && fin("flat").r2.isEmpty,
      "single-x key must degrade to None like q183's NULL")
  }
}
