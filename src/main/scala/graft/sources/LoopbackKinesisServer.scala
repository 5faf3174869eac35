package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** In-process Kinesis wire-protocol emulator (JDK HttpServer, zero new
  * dependencies): an immutable per-shard record store served through the
  * real `X-Amz-Target: Kinesis_20131202.*` JSON frames —
  * ListShards, GetShardIterator (TRIM_HORIZON / AT/AFTER_SEQUENCE_NUMBER
  * / LATEST) and GetRecords with Limit, NextShardIterator pagination and
  * an honest `MillisBehindLatest` report.
  *
  * This is the WIRE twin of [[KinesisFileSource]]: where the file source
  * stands in for the stream as a parquet table, this server stands in for
  * it on the network, so [[KinesisMicroBatchSource]] (offsets,
  * checkpoint resume, executor-side reads) can be exercised — and
  * oracle-verified — end-to-end without AWS. Sequence numbers are the
  * 0-based position within each shard, which makes a served fixture
  * exactly replayable in SQL (`ROW_NUMBER() OVER (PARTITION BY shard
  * ORDER BY …) - 1`); q177 builds its DuckDB oracle on precisely that.
  *
  * Payloads in `shards` are already-base64 strings (what a Kinesis
  * `Record.Data` carries on the wire). The server is bounded by
  * construction — it serves a seeded fixture, it is not a data path.
  */
final class LoopbackKinesisServer(streamName: String,
    shards: Seq[(String, IndexedSeq[String])]) {
  private val mapper = new ObjectMapper()
  private val byShard: Map[String, IndexedSeq[String]] = shards.toMap
  private var server: HttpServer = _

  def start(): String = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}/"
  }

  def stop(): Unit = if (server != null) { server.stop(0); server = null }

  private def handle(ex: HttpExchange): Unit = {
    val target = ex.getRequestHeaders.getFirst("X-Amz-Target")
    val body = mapper.readTree(
      graft.streaming.HttpTransports.readAll(ex.getRequestBody))
    def reply(status: Int, json: String): Unit = {
      val bytes = json.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    }
    target match {
      case "Kinesis_20131202.ListShards" =>
        if (body.path("StreamName").asText() != streamName)
          reply(400, """{"__type":"ResourceNotFoundException"}""")
        else reply(200, byShard.keys.toSeq.sorted
          .map(s => s"""{"ShardId":"$s"}""")
          .mkString("""{"Shards":[""", ",", "]}"))
      case "Kinesis_20131202.GetShardIterator" =>
        val shard = body.path("ShardId").asText()
        val typ = body.path("ShardIteratorType").asText()
        val seq = body.path("StartingSequenceNumber").asText("")
        byShard.get(shard) match {
          case None => reply(400, """{"__type":"ResourceNotFoundException"}""")
          case Some(recs) =>
            val pos = typ match {
              case "TRIM_HORIZON" => 0
              case "AT_SEQUENCE_NUMBER" => seq.toInt
              case "AFTER_SEQUENCE_NUMBER" => seq.toInt + 1
              case "LATEST" => recs.size
              case _ => -1
            }
            if (pos < 0)
              reply(400, s"""{"__type":"InvalidArgumentException","t":"$typ"}""")
            else reply(200, s"""{"ShardIterator":"it|$shard|$pos"}""")
        }
      case "Kinesis_20131202.GetRecords" =>
        val Array(_, shard, posS) = body.path("ShardIterator").asText().split('|')
        val limit = body.path("Limit").asInt(500)
        val pos = posS.toInt
        val all = byShard(shard)
        val recs = all.slice(pos, pos + limit)
        val items = recs.zipWithIndex.map { case (d, i) =>
          s"""{"ShardId":"$shard","PartitionKey":"pk-${pos + i}","SequenceNumber":"${pos + i}","Data":"$d"}"""
        }.mkString(",")
        val behind = math.max(0, all.size - (pos + recs.size)) * 1000L
        reply(200, s"""{"Records":[$items],"NextShardIterator":"it|$shard|${pos + recs.size}","MillisBehindLatest":$behind}""")
      case other =>
        reply(400, s"""{"__type":"UnknownOperationException","target":"$other"}""")
    }
  }
}
