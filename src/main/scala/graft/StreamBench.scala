package graft

import java.nio.file.Files

import graft.sources.LoopbackKinesisServer
import graft.streaming.{PipelineConfig, SinkMetrics, StreamingFanOut}
import org.apache.spark.sql.SparkSession

/** Sustained-throughput measurement of the COMPLETE reference job — the
  * DSv2 Kinesis wire source through decode, prune, dead-letter fan-out
  * and both sinks (`StreamingFanOut.startKinesis`) — against
  * [[LoopbackKinesisServer]] at two ingest scales. The streaming twins
  * are parity-SPEC'd elsewhere; this main produces the committed NUMBER
  * (records/s, rows/trigger, batch timings, state rows/bytes from the
  * progress JSON) the round-10 verdict asked for.
  *
  * Method: per scale, seed N shards × M base64 JSON audit records, run
  * the full fan-out until quiescent (`processAllAvailable`), and report
  * wall-clock records/s plus the engine's own StreamingQueryProgress
  * figures. Admission is bounded per trigger (the Lambda poll unit), so
  * "triggers" > 1 and rows/trigger reflects the steady-state batch
  * shape, not one giant catch-up batch. Loopback HTTP means numbers
  * measure the PIPELINE (wire parse, decode, sink writes), not network.
  *
  * Usage: `runMain graft.StreamBench [outPath]` (default
  * STREAMBENCH_r11.json). Prints one JSON line and writes it to outPath.
  */
object StreamBench {

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def auditJson(id: Long): String =
    s"""{"datetime": "2026-02-18T10:30:${"%02d".format(id % 60)}", """ +
      s""""random_id": "sb-$id", "kind_id": ${id % 7}, "account_id": ${id % 1000}, """ +
      s""""ip": "10.${id % 256}.0.1", "request_url": "https://x/$id", "http_method": "GET"}"""

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private final case class RunResult(label: String, shards: Int, records: Long,
      wallSec: Double, recordsPerSec: Double, triggers: Int,
      rowsPerTriggerMean: Double, rowsPerTriggerMax: Long,
      processedRowsPerSecMax: Double, batchDurationMsMean: Double,
      stateRows: Long, stateBytes: Long, esDocs: Long, splunkLines: Long)

  private def runScale(spark: SparkSession, label: String, shards: Int,
      perShard: Int, limitPerPoll: Int, maxPollsPerShard: Int): RunResult = {
    val fixture = (0 until shards).map { s =>
      f"shardId-$s%012d" ->
        (0 until perShard).map(i => b64(auditJson(s.toLong * perShard + i))).toIndexedSeq
    }
    val server = new LoopbackKinesisServer(s"bench-$label", fixture)
    val endpoint = server.start()
    val (esDir, splunkDir, dlqDir, ckpt) =
      (tmp(s"sb_es_$label"), tmp(s"sb_spl_$label"), tmp(s"sb_dlq_$label"),
        tmp(s"sb_ckpt_$label"))
    val metrics = SinkMetrics(spark)
    val t0 = System.nanoTime()
    val q = StreamingFanOut.startKinesis(spark, endpoint, s"bench-$label",
      esDir, splunkDir, dlqDir, ckpt, PipelineConfig(), metrics,
      limitPerPoll = limitPerPoll, maxPollsPerShard = maxPollsPerShard)
    q.processAllAvailable()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    q.stop()
    server.stop()
    val total = shards.toLong * perShard
    val dataBatches = progress.filter(_.numInputRows > 0)
    val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
      .reduceOption(_ max _).getOrElse(0L)
    val stateBytes = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      .reduceOption(_ max _).getOrElse(0L)
    val esDocs = spark.read.parquet(esDir).count()
    val splunkLines = spark.read.json(s"$splunkDir/*.jsonl").count()
    RunResult(label, shards, total, wallSec,
      recordsPerSec = total / wallSec,
      triggers = dataBatches.size,
      rowsPerTriggerMean =
        if (dataBatches.isEmpty) 0.0
        else dataBatches.map(_.numInputRows).sum.toDouble / dataBatches.size,
      rowsPerTriggerMax = dataBatches.map(_.numInputRows).reduceOption(_ max _).getOrElse(0L),
      processedRowsPerSecMax = dataBatches.map(_.processedRowsPerSecond)
        .filterNot(_.isNaN).reduceOption(_ max _).getOrElse(0.0),
      batchDurationMsMean =
        if (dataBatches.isEmpty) 0.0
        else dataBatches.map(_.batchDuration).sum.toDouble / dataBatches.size,
      stateRows = stateRows, stateBytes = stateBytes,
      esDocs = esDocs, splunkLines = splunkLines)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("STREAMBENCH_r11.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM/codegen/sink-path init lands here, not in run 1
    val warm = runScale(spark, "warmup", shards = 2, perShard = 250,
      limitPerPoll = 250, maxPollsPerShard = 2)
    require(warm.esDocs == warm.records && warm.splunkLines == warm.records,
      s"warm-up lost records: ${warm.esDocs}/${warm.splunkLines} of ${warm.records}")
    // two ingest scales, both with bounded per-trigger admission (the
    // Lambda poll unit) so the number reflects steady-state triggers
    val steady = runScale(spark, "steady", shards = 4, perShard = 5000,
      limitPerPoll = 500, maxPollsPerShard = 2)
    val burst = runScale(spark, "burst", shards = 8, perShard = 10000,
      limitPerPoll = 500, maxPollsPerShard = 10)
    def j(r: RunResult): String =
      s"""{"label":"${r.label}","shards":${r.shards},"records":${r.records},""" +
        s""""wall_sec":${"%.3f".format(r.wallSec)},""" +
        s""""records_per_sec":${"%.1f".format(r.recordsPerSec)},""" +
        s""""triggers":${r.triggers},""" +
        s""""rows_per_trigger_mean":${"%.1f".format(r.rowsPerTriggerMean)},""" +
        s""""rows_per_trigger_max":${r.rowsPerTriggerMax},""" +
        s""""processed_rows_per_sec_max":${"%.1f".format(r.processedRowsPerSecMax)},""" +
        s""""batch_duration_ms_mean":${"%.1f".format(r.batchDurationMsMean)},""" +
        s""""state_rows":${r.stateRows},"state_bytes":${r.stateBytes},""" +
        s""""es_docs":${r.esDocs},"splunk_lines":${r.splunkLines}}"""
    require(steady.esDocs == steady.records && steady.splunkLines == steady.records,
      s"steady lost records: es=${steady.esDocs} splunk=${steady.splunkLines} of ${steady.records}")
    require(burst.esDocs == burst.records && burst.splunkLines == burst.records,
      s"burst lost records: es=${burst.esDocs} splunk=${burst.splunkLines} of ${burst.records}")
    val line =
      s"""{"metric":"stream_fanout_throughput","unit":"records_per_sec",""" +
        s""""runs":[${j(steady)},${j(burst)}]}"""
    println(line)
    Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
