package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{KinesisHttpClient, KinesisHttpSource}
import graft.streaming.{AuthMode, HttpTransports, SecretsHttpClient}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The remaining network edges from the round-7 "What's missing" list —
  * the Kinesis event source (lambda_function.py:141) and the Secrets
  * Manager config fetch (:25-41) — driven against a loopback server
  * speaking the REAL wire protocols: `X-Amz-Target`-routed JSON frames
  * (`Kinesis_20131202.ListShards/GetShardIterator/GetRecords`,
  * `secretsmanager.GetSecretValue`), iterator pagination, multi-shard
  * drains, and the SecretString-to-config path including the auth-mode
  * branch. */
class AwsHttpProtocolSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val mapper = new ObjectMapper()

  private var server: HttpServer = _
  private def endpoint: String =
    s"http://127.0.0.1:${server.getAddress.getPort}/"

  // a 2-shard stream with 5 + 3 records; Data is base64 of audit JSON
  private def recJson(id: Int): String =
    s"""{"datetime": "2026-02-18T10:30:0${id % 10}", "random_id": "id-$id",
       |"kind_id": $id, "account_id": 1, "ip": "1.2.3.$id",
       |"request_url": "https://x/$id", "http_method": "GET"}"""
      .stripMargin.replace("\n", " ")
  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private val shardData: Map[String, IndexedSeq[String]] = Map(
    "shardId-000000000000" -> (1 to 5).map(i => b64(recJson(i))),
    "shardId-000000000001" -> (6 to 8).map(i => b64(recJson(i))))
  private val getRecordsCalls = new AtomicInteger(0)
  private val lastSigned =
    new java.util.concurrent.atomic.AtomicReference[(Map[String, String], Array[Byte])]()

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val target = ex.getRequestHeaders.getFirst("X-Amz-Target")
      val raw = HttpTransports.readAll(ex.getRequestBody)
      val body = mapper.readTree(raw)
      // capture the signed-request wire data for the SigV4 verifier test
      if (ex.getRequestHeaders.getFirst("Authorization") != null) {
        val h = Map.newBuilder[String, String]
        ex.getRequestHeaders.forEach((k, vs) => h += k.toLowerCase -> vs.get(0))
        lastSigned.set((h.result(), raw))
      }
      def reply(status: Int, json: String): Unit = {
        val bytes = json.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
      target match {
        case "Kinesis_20131202.ListShards" =>
          if (body.path("StreamName").asText() != "audit-stream")
            reply(400, """{"__type":"ResourceNotFoundException"}""")
          else {
            val shards = shardData.keys.toSeq.sorted
              .map(s => s"""{"ShardId":"$s"}""").mkString(",")
            reply(200, s"""{"Shards":[$shards]}""")
          }
        case "Kinesis_20131202.GetShardIterator" =>
          val shard = body.path("ShardId").asText()
          if (!shardData.contains(shard)) reply(400, """{"__type":"ResourceNotFoundException"}""")
          else reply(200, s"""{"ShardIterator":"it|$shard|0"}""")
        case "Kinesis_20131202.GetRecords" =>
          getRecordsCalls.incrementAndGet()
          val Array(_, shard, posS) = body.path("ShardIterator").asText().split('|')
          val limit = body.path("Limit").asInt(500)
          val pos = posS.toInt
          val recs = shardData(shard).slice(pos, pos + limit)
          val items = recs.zipWithIndex.map { case (d, i) =>
            s"""{"ShardId":"$shard","PartitionKey":"pk-${pos + i}","SequenceNumber":"${pos + i}","Data":"$d"}"""
          }.mkString(",")
          reply(200, s"""{"Records":[$items],"NextShardIterator":"it|$shard|${pos + recs.size}"}""")
        case "secretsmanager.GetSecretValue" =>
          val id = body.path("SecretId").asText()
          id match {
            case "audit-secrets-basic" =>
              val inner = """{\"es_index_prefix\":\"audit8-\",\"splunk_index\":\"spl8\",""" +
                """\"splunk_disabled\":\"true\",\"max_batch_size\":\"250\",""" +
                """\"master_user_name\":\"admin\",\"master_user_password\":\"pw\"}"""
              reply(200, s"""{"Name":"$id","SecretString":"$inner"}""")
            case "audit-secrets-iam" =>
              reply(200, s"""{"Name":"$id","SecretString":"{\\"es_index_prefix\\":\\"audit-\\"}"}""")
            case _ => reply(400, """{"__type":"ResourceNotFoundException"}""")
          }
        case other => reply(400, s"""{"__type":"UnknownOperationException","target":"$other"}""")
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("drain walks every shard with iterator pagination until caught up") {
    getRecordsCalls.set(0)
    val client = KinesisHttpClient(endpoint)
    assert(client.listShards("audit-stream").map(_.shardId) ==
      Seq("shardId-000000000000", "shardId-000000000001"))
    // a plain ShardId-only listing parses as open shards with no lineage
    assert(client.listShards("audit-stream").forall(s =>
      s.parents.isEmpty && !s.closed))
    val recs = client.drain("audit-stream", limitPerPoll = 2)
    assert(recs.size == 8)
    assert(recs.map(_.shardId).distinct.size == 2)
    // limit=2 forces pagination: shard0 needs 3 data pages + 1 empty
    // (caught-up) page, shard1 needs 2 + 1 — the iterator round-trip count
    // proves NextShardIterator was followed, not re-fetched from horizon
    assert(getRecordsCalls.get() == 7, s"got ${getRecordsCalls.get()} GetRecords calls")
    // sequence numbers are per-shard monotone from the horizon
    assert(recs.filter(_.shardId.endsWith("0")).map(_.sequenceNumber) ==
      Seq("0", "1", "2", "3", "4"))
  }

  test("the drained batch decodes through the reference pipeline end-to-end") {
    val df = KinesisHttpSource.batch(spark, endpoint, "audit-stream")
    assert(df.columns.toSeq == Seq("data"))
    val decoded = graft.pipeline.AuditPipeline.decodeKinesis(df, "data")
    val enriched = graft.pipeline.AuditPipeline.filterForEs(
      graft.pipeline.AuditPipeline.enrich(decoded))
    val ids = enriched.select("random_id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == (1 to 8).map(i => s"id-$i").sorted)
  }

  test("unknown stream surfaces the service error, not an empty batch") {
    intercept[Exception](KinesisHttpClient(endpoint).drain("no-such-stream"))
  }

  test("GetSecretValue drives the full config path incl. the auth-mode branch") {
    val cfg = SecretsHttpClient.configFrom(endpoint, "audit-secrets-basic")
    assert(cfg.esIndexPrefix == "audit8-" && cfg.splunkIndex == "spl8")
    assert(cfg.splunkDisabled && cfg.maxBatchSize == 250)
    assert(cfg.esAuthMode == AuthMode.Basic, "master-user creds select basic auth")
    val iam = SecretsHttpClient.configFrom(endpoint, "audit-secrets-iam")
    assert(iam.esAuthMode == AuthMode.SigV4 && !iam.splunkDisabled)
    intercept[java.io.IOException](
      SecretsHttpClient(endpoint).getSecretValue("missing"))
  }

  test("SigV4-signed drain: signature verifies over the exact bytes on the wire") {
    import graft.streaming.SigV4
    val secret = "verify-secret-key"
    val creds = SigV4.Credentials("AKIDTEST", secret, Some("SESSION-TOKEN-1"))
    lastSigned.set(null)
    val client = KinesisHttpClient(endpoint,
      auth = Some(SigV4.AwsAuth(creds, "us-east-1", "kinesis")))
    assert(client.listShards("audit-stream").nonEmpty)
    val (headers, rawBody) = lastSigned.get()

    // Independent wire-level verifier: recompute the signature from what
    // actually crossed the socket (captured headers + body bytes), using
    // an inline implementation of the published algorithm — any drift
    // between "bytes signed" and "bytes sent" (wrong payload, missing
    // header, date mismatch) fails here even though client and spec share
    // no code path.
    def hmac(key: Array[Byte], s: String): Array[Byte] = {
      val m = javax.crypto.Mac.getInstance("HmacSHA256")
      m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
      m.doFinal(s.getBytes(StandardCharsets.UTF_8))
    }
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    def sha(b: Array[Byte]): String =
      hex(java.security.MessageDigest.getInstance("SHA-256").digest(b))

    val authHeader = headers("authorization")
    val cred = authHeader.split("Credential=")(1).split(",")(0)
    val Array(akid, date, region, service, term) = cred.split("/")
    assert(akid == "AKIDTEST" && region == "us-east-1" &&
      service == "kinesis" && term == "aws4_request")
    val signedNames = authHeader.split("SignedHeaders=")(1).split(",")(0).trim
    // x-graft-origin is the driver/task observability marker — signed like
    // every header the client sends (unknown x- headers are legal in SigV4
    // as long as they are covered by the signature)
    assert(signedNames ==
      "content-type;host;x-amz-date;x-amz-security-token;x-amz-target;x-graft-origin")
    val gotSig = authHeader.split("Signature=")(1).trim

    val canonicalHeaders = signedNames.split(";")
      .map(n => s"$n:${headers(n).trim}\n").mkString
    val creq = Seq("POST", "/", "", canonicalHeaders, signedNames, sha(rawBody))
      .mkString("\n")
    val sts = Seq("AWS4-HMAC-SHA256", headers("x-amz-date"),
      s"$date/$region/$service/aws4_request", sha(creq.getBytes(StandardCharsets.UTF_8)))
      .mkString("\n")
    val key = hmac(hmac(hmac(hmac(s"AWS4$secret".getBytes(StandardCharsets.UTF_8),
      date), region), service), "aws4_request")
    assert(hex(hmac(key, sts)) == gotSig,
      "wire signature does not verify against the captured request")
    assert(headers("x-amz-security-token") == "SESSION-TOKEN-1")
  }
}
