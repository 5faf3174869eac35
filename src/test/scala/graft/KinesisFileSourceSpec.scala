package graft

import java.nio.file.{Files, Paths}
import java.util.Base64

import graft.sources.KinesisFileSource
import graft.streaming.{PipelineConfig, SinkMetrics, Sinks, StreamingFanOut}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end over the file-backed Kinesis stand-in: shard files of base64
  * payloads → readStream → decode → fan-out, one micro-batch per shard file
  * (the Lambda-invocation analogue). */
class KinesisFileSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def rec(id: Int): String =
    s"""{"datetime": "2026-02-18T11:00:0${id % 10}", "random_id": "shard-$id", "kind_id": $id}"""

  test("shard files stream through the full fan-out pipeline") {
    val shardDir = Files.createTempDirectory("shards").toString
    Files.write(Paths.get(shardDir, "shard-0.txt"),
      (1 to 3).map(i => b64(rec(i))).mkString("\n").getBytes)
    Files.write(Paths.get(shardDir, "shard-1.txt"),
      (4 to 5).map(i => b64(rec(i))).mkString("\n").getBytes)

    val (esDir, splunkDir, ckpt) = (
      Files.createTempDirectory("es").toString,
      Files.createTempDirectory("splunk").toString,
      Files.createTempDirectory("ckpt").toString)
    val metrics = SinkMetrics(spark)
    val decoded = graft.pipeline.AuditPipeline.decodeKinesis(
      KinesisFileSource.stream(spark, shardDir), "data")
    val q = StreamingFanOut.start(decoded, esDir, splunkDir, ckpt,
      PipelineConfig(), metrics)
    q.processAllAvailable()
    q.stop()

    val es = Sinks.readEsIndex(spark, esDir)
    assert(es.count() == 5)
    assert(metrics.esSuccess.value == 5)
    assert(metrics.splunkSuccess.value == 5)
    // batch replay sees the same records
    assert(KinesisFileSource.batch(spark, shardDir).count() == 5)
  }

  test("Trigger.AvailableNow drains the backlog and terminates on its own") {
    import org.apache.spark.sql.streaming.Trigger
    val shardDir = Files.createTempDirectory("shards_an").toString
    Files.write(Paths.get(shardDir, "shard-0.txt"),
      (1 to 4).map(i => b64(rec(i))).mkString("\n").getBytes)
    val (esDir, splunkDir, ckpt) = (
      Files.createTempDirectory("es_an").toString,
      Files.createTempDirectory("splunk_an").toString,
      Files.createTempDirectory("ckpt_an").toString)
    val metrics = SinkMetrics(spark)
    val decoded = graft.pipeline.AuditPipeline.decodeKinesis(
      KinesisFileSource.stream(spark, shardDir), "data")
    // the batch-catchup trigger: process everything available, then stop —
    // the production backfill/recovery pattern (vs processAllAvailable,
    // which is test-only API)
    val q = decoded.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamingFanOut.processBatch(batch, esDir, splunkDir, PipelineConfig(), metrics, id)
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    assert(Sinks.readEsIndex(spark, esDir).count() == 4)
    assert(metrics.esSuccess.value == 4)
  }

  test("restart from checkpoint resumes exactly where the stream stopped") {
    val shardDir = Files.createTempDirectory("shards_rs").toString
    val (esDir, splunkDir, ckpt) = (
      Files.createTempDirectory("es_rs").toString,
      Files.createTempDirectory("splunk_rs").toString,
      Files.createTempDirectory("ckpt_rs").toString)

    def run(metrics: SinkMetrics): Unit = {
      val decoded = graft.pipeline.AuditPipeline.decodeKinesis(
        KinesisFileSource.stream(spark, shardDir), "data")
      val q = StreamingFanOut.start(decoded, esDir, splunkDir, ckpt,
        PipelineConfig(), metrics)
      q.processAllAvailable()
      q.stop()
    }

    Files.write(Paths.get(shardDir, "shard-0.txt"),
      (1 to 3).map(i => b64(rec(i))).mkString("\n").getBytes)
    val m1 = SinkMetrics(spark)
    run(m1)
    assert(m1.esSuccess.value == 3)

    // stream is down; two more shards land
    Files.write(Paths.get(shardDir, "shard-1.txt"),
      (4 to 5).map(i => b64(rec(i))).mkString("\n").getBytes)

    // restart against the SAME checkpoint: only the new shard is processed
    val m2 = SinkMetrics(spark)
    run(m2)
    assert(m2.esSuccess.value == 2, "restart must not reprocess committed shards")
    assert(Sinks.readEsIndex(spark, esDir).count() == 5)
    assert(Sinks.readEsIndex(spark, esDir)
      .select("_id").distinct().count() == 5, "no duplicate docs after restart")
  }
}
