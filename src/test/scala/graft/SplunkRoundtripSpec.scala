package graft

import java.nio.file.Files

import graft.streaming.{SinkMetrics, Sinks}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Splunk HEC simulator's JSON-lines output must be valid JSON that the
  * engine's own JSON source can re-ingest losslessly — envelope fields
  * intact and every delivered event recoverable. */
class SplunkRoundtripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("splunk sink output re-ingests through spark.read.json losslessly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("splunk_rt").toString
    val events = Seq(
      (1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 0.0)
    ).toDF("event_id", "name", "value")
    val m = SinkMetrics(spark)
    Sinks.writeSplunk(events, dir, index = "audit-rt", m = m, maxBatchSize = 2)
    assert(m.splunkSuccess.value == 3)

    val back = spark.read.json(dir)
    assert(back.count() == 3)
    // envelope shape: {"event": {...}, "sourcetype": "json", "index": ...}
    val rows = back
      .select(col("sourcetype"), col("index"),
        col("event.event_id"), col("event.name"), col("event.value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSet
    assert(rows == Set(
      ("json", "audit-rt", 1L, "alpha", 10.5),
      ("json", "audit-rt", 2L, "beta", 20.25),
      ("json", "audit-rt", 3L, "gamma", 0.0)))
  }
}
