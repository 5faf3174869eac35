package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** In-process Kinesis wire-protocol emulator (JDK HttpServer, zero new
  * dependencies): a per-shard record store served through the real
  * `X-Amz-Target: Kinesis_20131202.*` JSON frames — ListShards (with
  * `ParentShardId`/`AdjacentParentShardId` lineage and a
  * `SequenceNumberRange.EndingSequenceNumber` on closed shards),
  * GetShardIterator (TRIM_HORIZON / AT/AFTER_SEQUENCE_NUMBER / LATEST)
  * and GetRecords with Limit, NextShardIterator pagination, an honest
  * `MillisBehindLatest` report, and a NULL NextShardIterator once a
  * CLOSED shard is read to its end — the wire signal a real stream
  * emits after a split/merge.
  *
  * This is the WIRE twin of [[KinesisFileSource]]: where the file source
  * stands in for the stream as a parquet table, this server stands in for
  * it on the network, so [[KinesisMicroBatchSource]] (offsets,
  * checkpoint resume, executor-side reads, reshard lineage) can be
  * exercised — and oracle-verified — end-to-end without AWS. Sequence
  * numbers are the 0-based position within each shard, which makes a
  * served fixture exactly replayable in SQL (`ROW_NUMBER() OVER
  * (PARTITION BY shard ORDER BY …) - 1`); q177 builds its DuckDB oracle
  * on precisely that.
  *
  * Resharding: [[split]] closes a parent mid-stream and registers two
  * children carrying `ParentShardId`; [[merge]] closes two parents into
  * one child carrying both parent ids — exactly the two lineage shapes
  * UpdateShardCount produces. [[append]] feeds an OPEN shard while
  * streams run (appending to a closed shard is rejected, as the real
  * service would). All mutations and reads synchronize on one lock; the
  * store stays bounded by construction — it serves seeded fixtures, it
  * is not a data path.
  *
  * Payloads are already-base64 strings (what a Kinesis `Record.Data`
  * carries on the wire).
  */
final class LoopbackKinesisServer(streamName: String,
    shards: Seq[(String, IndexedSeq[String])]) {

  private final class ShardState(var records: IndexedSeq[String],
    var closed: Boolean, var parents: Seq[String])

  private val mapper = new ObjectMapper()
  private val lock = new Object
  /** Wire-call log: (operation, shardId-or-empty, detail) — lets specs
    * assert on what actually crossed the socket (e.g. that a drained
    * parent receives ZERO reads after a checkpoint restart). */
  private val callLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]
  def calls: Seq[(String, String, String)] = {
    import scala.jdk.CollectionConverters._
    callLog.asScala.toSeq
  }
  def clearCalls(): Unit = callLog.clear()
  private val byShard = scala.collection.mutable.LinkedHashMap(
    shards.map { case (id, recs) =>
      id -> new ShardState(recs, false, Nil) }: _*)
  private var server: HttpServer = _

  def start(): String = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}/"
  }

  def stop(): Unit = if (server != null) { server.stop(0); server = null }

  /** Append records to an OPEN shard (the live-stream feed). */
  def append(shard: String, payloads: String*): Unit = lock.synchronized {
    val st = byShard.getOrElse(shard,
      throw new IllegalArgumentException(s"no shard $shard"))
    require(!st.closed, s"cannot append to closed shard $shard")
    st.records = st.records ++ payloads
  }

  /** Mid-stream SPLIT: close `parent` at its current last record and
    * register two children carrying `ParentShardId = parent`. */
  def split(parent: String,
      childA: (String, IndexedSeq[String]),
      childB: (String, IndexedSeq[String])): Unit = lock.synchronized {
    val p = byShard.getOrElse(parent,
      throw new IllegalArgumentException(s"no shard $parent"))
    require(!p.closed, s"shard $parent is already closed")
    p.closed = true
    Seq(childA, childB).foreach { case (id, recs) =>
      require(!byShard.contains(id), s"shard $id already exists")
      byShard += id -> new ShardState(recs, false, Seq(parent))
    }
  }

  /** Mid-stream MERGE: close both parents and register one child
    * carrying `ParentShardId`/`AdjacentParentShardId`. */
  def merge(parentA: String, parentB: String,
      child: (String, IndexedSeq[String])): Unit = lock.synchronized {
    Seq(parentA, parentB).foreach { pid =>
      val p = byShard.getOrElse(pid,
        throw new IllegalArgumentException(s"no shard $pid"))
      require(!p.closed, s"shard $pid is already closed")
      p.closed = true
    }
    require(!byShard.contains(child._1), s"shard ${child._1} already exists")
    byShard += child._1 -> new ShardState(child._2, false, Seq(parentA, parentB))
  }

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
        callLog.add(("ListShards", "", ""))
        if (body.path("StreamName").asText() != streamName)
          reply(400, """{"__type":"ResourceNotFoundException"}""")
        else {
          val items = lock.synchronized {
            byShard.toSeq.sortBy(_._1).map { case (id, st) =>
              val parents = st.parents match {
                case Seq() => ""
                case Seq(p) => s""","ParentShardId":"$p""""
                case Seq(p, a) =>
                  s""","ParentShardId":"$p","AdjacentParentShardId":"$a""""
                case more => sys.error(s"shard $id has ${more.size} parents")
              }
              val range =
                if (st.closed)
                  s""","SequenceNumberRange":{"StartingSequenceNumber":"0","EndingSequenceNumber":"${st.records.size - 1}"}"""
                else
                  s""","SequenceNumberRange":{"StartingSequenceNumber":"0"}"""
              s"""{"ShardId":"$id"$parents$range}"""
            }
          }
          reply(200, items.mkString("""{"Shards":[""", ",", "]}"))
        }
      case "Kinesis_20131202.GetShardIterator" =>
        val shard = body.path("ShardId").asText()
        val typ = body.path("ShardIteratorType").asText()
        val seq = body.path("StartingSequenceNumber").asText("")
        callLog.add(("GetShardIterator", shard, s"$typ:$seq"))
        lock.synchronized(byShard.get(shard)) match {
          case None => reply(400, """{"__type":"ResourceNotFoundException"}""")
          case Some(st) =>
            val pos = typ match {
              case "TRIM_HORIZON" => 0
              case "AT_SEQUENCE_NUMBER" => seq.toInt
              case "AFTER_SEQUENCE_NUMBER" => seq.toInt + 1
              case "LATEST" => lock.synchronized(st.records.size)
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
        callLog.add(("GetRecords", shard, posS))
        val (recs, atEnd, closed, behind) = lock.synchronized {
          val st = byShard(shard)
          val r = st.records.slice(pos, pos + limit)
          val end = pos + r.size >= st.records.size
          (r, end, st.closed,
            math.max(0, st.records.size - (pos + r.size)) * 1000L)
        }
        val items = recs.zipWithIndex.map { case (d, i) =>
          s"""{"ShardId":"$shard","PartitionKey":"pk-${pos + i}","SequenceNumber":"${pos + i}","Data":"$d"}"""
        }.mkString(",")
        // a CLOSED shard read to its end returns a NULL next iterator —
        // the real service's end-of-shard signal after a split/merge
        val next =
          if (closed && atEnd) "null"
          else s""""it|$shard|${pos + recs.size}""""
        reply(200, s"""{"Records":[$items],"NextShardIterator":$next,"MillisBehindLatest":$behind}""")
      case other =>
        reply(400, s"""{"__type":"UnknownOperationException","target":"$other"}""")
    }
  }
}
