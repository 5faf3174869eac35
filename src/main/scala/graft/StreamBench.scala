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
  * Round 12 adds the STATE-BEARING runs ([[runStateful]]): the q185 twin
  * `StreamingTransition` off the same wire source, with RocksDB state,
  * per-trigger `numRowsTotal` flatness asserted (state = one row per
  * user) and the pair-count identity (`records − users`) as the
  * exactly-once check.
  *
  * Usage: `runMain graft.StreamBench [outPath]` (default
  * STREAMBENCH_r12.json). Prints one JSON line and writes it to outPath.
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

  // ------------------------------------------------------------ stateful
  private def eventJson(user: Long, ts: Long, eid: Long, etype: String): String =
    s"""{"user_id": $user, "ts": $ts, "event_id": $eid, "event_type": "$etype"}"""

  private final case class StatefulResult(label: String, shards: Int,
      records: Long, users: Long, wallSec: Double, recordsPerSec: Double,
      triggers: Int, stateRowsPerTrigger: Seq[Long], stateBytesMax: Long,
      pairs: Long, expectedPairs: Long)

  private def ewmaJson(etype: String, t: Long, cents: Long): String =
    s"""{"etype": "$etype", "t": $t, "cents": $cents}"""

  /** Drive the q217 twin ([[graft.streaming.StreamingEwma]], round 14's
    * sixteenth member) through the loopback Kinesis wire with RocksDB
    * state. Fixture: shard-local keys, one event per (key, day) in day
    * order (the wire's per-shard sequence discharges the day-monotone
    * contract exactly as runStateful's shard-local users do), cents
    * deterministic from the event id. Identities asserted by the caller:
    * with no gaps and one event per day, every record closes a day →
    * sink rows == records exactly (exactly-once), and state is FLAT at
    * one 24-byte row per key across every data trigger. */
  private def runEwma(spark: SparkSession, label: String, shards: Int,
      perShard: Int, keysPerShard: Int, limitPerPoll: Int,
      maxPollsPerShard: Int): StatefulResult = {
    import spark.implicits._
    require(perShard % keysPerShard == 0 && perShard / keysPerShard <= 63,
      "one event per (key, day); the day span must stay under the 63-day cap")
    // The state-flat identity (numRowsTotal == shards*keysPerShard at EVERY
    // data trigger) holds only because the FIRST trigger already sees every
    // cycling key — i.e. each shard's first poll window covers a full key
    // cycle. Tie the three constants so retuning any one fails loudly here
    // rather than as a confusing flat-state assertion downstream.
    require(limitPerPoll * maxPollsPerShard >= keysPerShard,
      s"every trigger must see every key for the flat-state identity: " +
        s"limitPerPoll($limitPerPoll) * maxPollsPerShard($maxPollsPerShard) " +
        s"< keysPerShard($keysPerShard)")
    val fixture = (0 until shards).map { s =>
      f"shardId-$s%012d" -> (0 until perShard).map { i =>
        val key = s"s${s}e${i % keysPerShard}"
        b64(ewmaJson(key, t = i.toLong / keysPerShard,
          cents = (s.toLong * perShard + i) * 37L % 9000L + 100L))
      }.toIndexedSeq
    }
    val server = new LoopbackKinesisServer(s"sb-ewma-$label", fixture)
    val endpoint = server.start()
    val (outDir, ckpt) = (tmp(s"sb_ewma_out_$label"), tmp(s"sb_ewma_ckpt_$label"))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val raw = graft.sources.KinesisMicroBatchSource
        .readStream(spark, endpoint, s"sb-ewma-$label", limitPerPoll, maxPollsPerShard)
      val parsed = raw
        .select(org.apache.spark.sql.functions.from_json(
          org.apache.spark.sql.functions.unbase64(
            org.apache.spark.sql.functions.col("data")).cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "etype STRING, t BIGINT, cents BIGINT")).as("j"))
        .select("j.etype", "j.t", "j.cents")
        .as[(String, Long, Long)]
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingEwma.monitor(parsed)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      val wallSec = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      q.stop()
      server.stop()
      val total = shards.toLong * perShard
      val keys = shards.toLong * keysPerShard
      val dataBatches = progress.filter(_.numInputRows > 0)
      val statePerTrigger = dataBatches.map(_.stateOperators.map(_.numRowsTotal).sum)
      val stateBytesMax = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
        .reduceOption(_ max _).getOrElse(0L)
      val rows = spark.read.parquet(outDir).count()
      StatefulResult(label, shards, total, keys, wallSec,
        recordsPerSec = total / wallSec, triggers = dataBatches.size,
        stateRowsPerTrigger = statePerTrigger, stateBytesMax = stateBytesMax,
        pairs = rows, expectedPairs = total)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private def scd2Json(user: Long, eid: Long, us: Long, etype: String): String =
    s"""{"user_id": $user, "eid": $eid, "us": $us, "etype": "$etype"}"""

  /** Drive the q218 twin ([[graft.streaming.StreamingScd2]], round 15's
    * seventeenth member) through the loopback Kinesis wire with RocksDB
    * state. Fixture: shard-local users (discharging the per-user
    * (ts, event_id)-monotone contract exactly as runStateful does), each
    * user's event type alternating every `typeRun` events, so a user
    * with k events closes exactly floor((k−1)/typeRun) versions.
    * Identities asserted by the caller: sink rows == records + closed
    * versions exactly (one open-version row per event plus one closing
    * row per type change — exactly-once), and state FLAT at one row per
    * user across every data trigger. */
  private def runScd2(spark: SparkSession, label: String, shards: Int,
      perShard: Int, usersPerShard: Int, typeRun: Int, limitPerPoll: Int,
      maxPollsPerShard: Int): StatefulResult = {
    import spark.implicits._
    require(perShard % usersPerShard == 0,
      "every user must carry the same event count for the closed-version arithmetic")
    require(limitPerPoll * maxPollsPerShard >= usersPerShard,
      s"every trigger must see every user for the flat-state identity: " +
        s"limitPerPoll($limitPerPoll) * maxPollsPerShard($maxPollsPerShard) " +
        s"< usersPerShard($usersPerShard)")
    val fixture = (0 until shards).map { s =>
      f"shardId-$s%012d" -> (0 until perShard).map { i =>
        val user = s.toLong * usersPerShard + i % usersPerShard
        val step = i.toLong / usersPerShard // per-user event index
        b64(scd2Json(user, eid = s.toLong * perShard + i,
          us = step * 1000000L,
          etype = if ((step / typeRun) % 2 == 0L) "active" else "dormant"))
      }.toIndexedSeq
    }
    val server = new LoopbackKinesisServer(s"sb-scd2-$label", fixture)
    val endpoint = server.start()
    val (outDir, ckpt) = (tmp(s"sb_scd2_out_$label"), tmp(s"sb_scd2_ckpt_$label"))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val raw = graft.sources.KinesisMicroBatchSource
        .readStream(spark, endpoint, s"sb-scd2-$label", limitPerPoll, maxPollsPerShard)
      val parsed = raw
        .select(org.apache.spark.sql.functions.from_json(
          org.apache.spark.sql.functions.unbase64(
            org.apache.spark.sql.functions.col("data")).cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "user_id BIGINT, eid BIGINT, us BIGINT, etype STRING")).as("j"))
        .select("j.user_id", "j.eid", "j.us", "j.etype")
        .as[(Long, Long, Long, String)]
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingScd2.history(parsed)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      val wallSec = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      q.stop()
      server.stop()
      val total = shards.toLong * perShard
      val users = shards.toLong * usersPerShard
      val perUser = perShard.toLong / usersPerShard
      val dataBatches = progress.filter(_.numInputRows > 0)
      val statePerTrigger = dataBatches.map(_.stateOperators.map(_.numRowsTotal).sum)
      val stateBytesMax = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
        .reduceOption(_ max _).getOrElse(0L)
      val rows = spark.read.parquet(outDir).count()
      StatefulResult(label, shards, total, users, wallSec,
        recordsPerSec = total / wallSec, triggers = dataBatches.size,
        stateRowsPerTrigger = statePerTrigger, stateBytesMax = stateBytesMax,
        pairs = rows,
        expectedPairs = total + users * ((perUser - 1) / typeRun))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** Drive the STATE-BEARING twin ([[graft.streaming.StreamingTransition]],
    * q185's continuous journey-flow monitor) through the same loopback
    * Kinesis wire harness as the fan-out runs — the round-11 verdict's
    * missing artifact: the committed throughput number never exercised
    * RocksDB state (`state_rows: 0`, the fan-out job is stateless).
    *
    * Fixture: per shard, `perShard` events round-robined over
    * `usersPerShard` shard-local users with per-user increasing `ts` —
    * shard-local users keep each user's stream inside one shard's
    * sequence order, discharging the twin's documented per-user-monotone
    * arrival contract on the wire (a production deployment discharges it
    * by partition-keying the stream on user). Every user appears in the
    * first poll page, so `numRowsTotal` must be FLAT at shards ×
    * usersPerShard across every data trigger — asserted below: state is
    * O(#users), not O(stream length).
    *
    * Exactly-once check rides the arithmetic: a user with k events emits
    * exactly k−1 transition pairs, so sink rows must equal records −
    * users after quiescence. */
  private def runStateful(spark: SparkSession, label: String, shards: Int,
      perShard: Int, usersPerShard: Int, limitPerPoll: Int,
      maxPollsPerShard: Int): StatefulResult = {
    import spark.implicits._
    require(perShard % usersPerShard == 0, "even events-per-user keeps the pair count exact")
    val fixture = (0 until shards).map { s =>
      f"shardId-$s%012d" -> (0 until perShard).map { i =>
        val user = s.toLong * usersPerShard + i % usersPerShard
        b64(eventJson(user, ts = i.toLong / usersPerShard, eid = s.toLong * perShard + i,
          etype = "t" + (i % 7)))
      }.toIndexedSeq
    }
    val server = new LoopbackKinesisServer(s"sb-state-$label", fixture)
    val endpoint = server.start()
    val (outDir, ckpt) = (tmp(s"sb_state_out_$label"), tmp(s"sb_state_ckpt_$label"))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val raw = graft.sources.KinesisMicroBatchSource
        .readStream(spark, endpoint, s"sb-state-$label", limitPerPoll, maxPollsPerShard)
      val schema = "user_id BIGINT, ts BIGINT, event_id BIGINT, event_type STRING"
      val parsed = raw
        .select(org.apache.spark.sql.functions.from_json(
          org.apache.spark.sql.functions.unbase64(
            org.apache.spark.sql.functions.col("data")).cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL(schema)).as("j"))
        .select("j.user_id", "j.ts", "j.event_id", "j.event_type")
        .as[(Long, Long, Long, String)]
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingTransition.pairs(parsed)
        .toDF("from_type", "to_type")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      val wallSec = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      q.stop()
      server.stop()
      val total = shards.toLong * perShard
      val users = shards.toLong * usersPerShard
      val dataBatches = progress.filter(_.numInputRows > 0)
      val statePerTrigger = dataBatches.map(_.stateOperators.map(_.numRowsTotal).sum)
      val stateBytesMax = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
        .reduceOption(_ max _).getOrElse(0L)
      val pairs = spark.read.parquet(outDir).count()
      StatefulResult(label, shards, total, users, wallSec,
        recordsPerSec = total / wallSec, triggers = dataBatches.size,
        stateRowsPerTrigger = statePerTrigger, stateBytesMax = stateBytesMax,
        pairs = pairs, expectedPairs = total - users)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("STREAMBENCH_r12.json")
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
    // State-bearing runs (RocksDB via transformWithState) at two rates.
    val stateSteady = runStateful(spark, "state_steady", shards = 4,
      perShard = 5000, usersPerShard = 500, limitPerPoll = 500, maxPollsPerShard = 2)
    val stateBurst = runStateful(spark, "state_burst", shards = 8,
      perShard = 10000, usersPerShard = 1000, limitPerPoll = 500, maxPollsPerShard = 10)
    def checkStateful(r: StatefulResult): Unit = {
      require(r.pairs == r.expectedPairs,
        s"${r.label} pair count off: ${r.pairs} vs expected ${r.expectedPairs} " +
          s"(records=${r.records}, users=${r.users}) — lost or duplicated state transitions")
      require(r.stateRowsPerTrigger.nonEmpty &&
          r.stateRowsPerTrigger.forall(_ == r.users),
        s"${r.label} state not flat at one row per user: " +
          s"${r.stateRowsPerTrigger.mkString(",")} vs ${r.users} users")
    }
    checkStateful(stateSteady)
    checkStateful(stateBurst)
    // The q217 EWMA twin (round 14): one event per (key, day) → sink rows
    // must equal records exactly; state flat at one row per key.
    val ewma = runEwma(spark, "ewma_daily", shards = 4, perShard = 5000,
      keysPerShard = 500, limitPerPoll = 500, maxPollsPerShard = 2)
    require(ewma.pairs == ewma.expectedPairs,
      s"ewma row count off: ${ewma.pairs} vs ${ewma.expectedPairs} — " +
        "lost or duplicated day-close emissions")
    require(ewma.stateRowsPerTrigger.nonEmpty &&
        ewma.stateRowsPerTrigger.forall(_ == ewma.users),
      s"ewma state not flat at one row per key: " +
        s"${ewma.stateRowsPerTrigger.mkString(",")} vs ${ewma.users} keys")
    // The q218 SCD2 twin (round 15): 10 events/user alternating type every
    // 5 → exactly 1 closed version/user, so sink rows must equal
    // records + users exactly; state flat at one row per user.
    val scd2 = runScd2(spark, "scd2_history", shards = 4, perShard = 5000,
      usersPerShard = 500, typeRun = 5, limitPerPoll = 500, maxPollsPerShard = 2)
    require(scd2.pairs == scd2.expectedPairs,
      s"scd2 row count off: ${scd2.pairs} vs ${scd2.expectedPairs} — " +
        "lost or duplicated version emissions")
    require(scd2.stateRowsPerTrigger.nonEmpty &&
        scd2.stateRowsPerTrigger.forall(_ == scd2.users),
      s"scd2 state not flat at one row per user: " +
        s"${scd2.stateRowsPerTrigger.mkString(",")} vs ${scd2.users} users")
    def js(r: StatefulResult): String =
      s"""{"label":"${r.label}","shards":${r.shards},"records":${r.records},""" +
        s""""users":${r.users},"wall_sec":${"%.3f".format(r.wallSec)},""" +
        s""""records_per_sec":${"%.1f".format(r.recordsPerSec)},""" +
        s""""triggers":${r.triggers},""" +
        s""""state_rows_per_trigger":[${r.stateRowsPerTrigger.mkString(",")}],""" +
        s""""state_bytes_max":${r.stateBytesMax},""" +
        s""""pairs":${r.pairs},"expected_pairs":${r.expectedPairs}}"""
    val line =
      s"""{"metric":"stream_fanout_throughput","unit":"records_per_sec",""" +
        s""""runs":[${j(steady)},${j(burst)}],""" +
        s""""stateful_runs":[${js(stateSteady)},${js(stateBurst)},${js(ewma)},${js(scd2)}]}"""
    println(line)
    Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
