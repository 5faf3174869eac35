package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.streaming.{HttpBulk, HttpHec, HttpTransports, SinkMetrics, Sinks}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The transport seams against LIVE sockets: a loopback JDK HttpServer
  * plays OpenSearch-bulk and Splunk-HEC, and the fault matrix the
  * simulators model — per-document partial bulk failures retried ≤3
  * times (lambda_function.py:84-86), the HEC read timeout
  * (`timeout=12`, :96), and the at-most-once chunk drop on a 5xx
  * (:100-102) — is exercised over real HTTP rather than injected
  * in-process. */
class LiveSocketTransportSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private var server: HttpServer = _
  private def base: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  // server-side observation state, reset per test
  private val hecBodies = new ConcurrentLinkedQueue[String]()
  private val bulkBodies = new ConcurrentLinkedQueue[String]()
  private val hecCalls = new AtomicInteger(0)
  @volatile private var failOnId: Map[String, Int] = Map.empty // id -> attempts to reject
  private val rejectCount = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
  @volatile private var hecMode: String = "ok" // ok | stall-second | fail-second

  private def body(ex: HttpExchange): String =
    new String(HttpTransports.readAll(ex.getRequestBody), StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, status: Int, text: String): Unit = {
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) { ex.getResponseBody.write(bytes) }
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/services/collector", (ex: HttpExchange) => {
      val b = body(ex)
      val call = hecCalls.getAndIncrement()
      hecMode match {
        case "stall-second" if call == 1 =>
          Thread.sleep(3000) // beyond the client's read timeout
          respond(ex, 200, "late")
        case "fail-second" if call == 1 =>
          respond(ex, 503, "busy")
        case _ =>
          hecBodies.add(b); respond(ex, 200, """{"text":"Success"}""")
      }
    })
    server.createContext("/_bulk", (ex: HttpExchange) => {
      val ids = body(ex).split("\n").toSeq.filter(_.nonEmpty)
      bulkBodies.add(ids.mkString(","))
      val failed = ids.filter { id =>
        val remaining = failOnId.getOrElse(id, 0)
        val seen = rejectCount.computeIfAbsent(id, _ => new AtomicInteger(0))
        seen.incrementAndGet() <= remaining
      }
      respond(ex, 200, failed.mkString("\n"))
    })
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def reset(): Unit = {
    hecBodies.clear(); bulkBodies.clear(); hecCalls.set(0)
    rejectCount.clear(); failOnId = Map.empty; hecMode = "ok"
  }

  test("HEC happy path delivers every chunk over a real socket") {
    reset()
    import spark.implicits._
    val lines = (1 to 7).map(i => s"ev-$i").toDF("line").coalesce(1)
    val m = SinkMetrics(spark)
    Sinks.writeSplunkVia(lines, HttpHec(s"$base/services/collector",
      token = "t0k3n", timeoutMillis = 5000), m, maxBatchSize = 3)
    assert(m.splunkTotal.value == 7 && m.splunkSuccess.value == 7)
    val got = hecBodies.toArray.map(_.toString).flatMap(_.split("\n")).sorted
    assert(got.toSeq == (1 to 7).map(i => s"ev-$i").sorted)
  }

  test("HEC read-timeout expiry drops exactly its own chunk (at-most-once)") {
    reset(); hecMode = "stall-second"
    import spark.implicits._
    // one partition -> chunks [1,2,3],[4,5,6],[7]; the server stalls the
    // second POST past the client's read timeout
    val lines = (1 to 7).map(i => s"ev-$i").toDF("line").coalesce(1)
    val m = SinkMetrics(spark)
    Sinks.writeSplunkVia(lines, HttpHec(s"$base/services/collector",
      timeoutMillis = 500), m, maxBatchSize = 3)
    assert(m.splunkTotal.value == 7, "every event counted as attempted")
    assert(m.splunkSuccess.value == 4, "the timed-out chunk (3 events) dropped")
    val got = hecBodies.toArray.map(_.toString).flatMap(_.split("\n")).sorted
    assert(got.toSeq == Seq("ev-1", "ev-2", "ev-3", "ev-7"),
      "chunks before and after the stalled one delivered, no retry of the dropped one")
  }

  test("HEC 5xx drops exactly its own chunk and later chunks continue") {
    reset(); hecMode = "fail-second"
    import spark.implicits._
    val lines = (1 to 5).map(i => s"ev-$i").toDF("line").coalesce(1)
    val m = SinkMetrics(spark)
    Sinks.writeSplunkVia(lines, HttpHec(s"$base/services/collector",
      timeoutMillis = 5000), m, maxBatchSize = 2)
    assert(m.splunkTotal.value == 5 && m.splunkSuccess.value == 3)
    val got = hecBodies.toArray.map(_.toString).flatMap(_.split("\n")).sorted
    assert(got.toSeq == Seq("ev-1", "ev-2", "ev-5"))
  }

  test("bulk partial failures retry the rejected doc ALONE, <=3 times, then drop") {
    reset()
    // id-2 rejected twice then accepted (must survive); id-3 rejected
    // forever (must drop after the 3 retries)
    import spark.implicits._
    def recJson(id: Int): String =
      s"""{"datetime": "2026-02-18T10:30:0$id", "random_id": "id-$id",
         |"kind_id": $id, "account_id": 1, "ip": "1.2.3.$id",
         |"request_url": "https://x/$id", "http_method": "GET"}"""
        .stripMargin.replace("\n", " ")
    def b64(s: String): String =
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    val batch = graft.pipeline.AuditPipeline.decodeKinesis(
      (1 to 4).map(i => b64(recJson(i))).toDF("data"), "data")
    val enriched = graft.pipeline.AuditPipeline.filterForEs(
      graft.pipeline.AuditPipeline.enrich(batch)).coalesce(1)
    failOnId = Map("id-2" -> 2, "id-3" -> 99)
    val esDir = java.nio.file.Files.createTempDirectory("es_live").toString
    val m = SinkMetrics(spark)
    val delivered = Sinks.writeEsBulk(enriched, esDir, "audit-", m,
      HttpBulk(s"$base/_bulk", timeoutMillis = 5000))
    assert(m.esTotal.value == 4)
    assert(delivered == 3 && m.esSuccess.value == 3, "id-3 dropped, id-2 recovered")
    val index = Sinks.readEsIndex(spark, esDir)
    val ids = index.select("_id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("id-1", "id-2", "id-4"))
    // the wire log proves retries were per-document, not whole-chunk:
    // first POST carries all 4 ids, every later one only the failed subset
    val posts = bulkBodies.toArray.map(_.toString)
    assert(posts.head.split(",").length == 4)
    assert(posts.tail.forall(p => p.split(",").forall(Set("id-2", "id-3"))),
      s"retries re-sent non-failed docs: ${posts.mkString(" | ")}")
    assert(posts.length >= 3, "id-3 required the full retry budget")
  }

  test("bulk transport-level 5xx throws to the caller (whole-chunk failure unit)") {
    reset()
    // no /_down context registered -> 404 from the server root handler
    val t = HttpBulk(s"$base/_down", timeoutMillis = 1000)
    intercept[java.io.IOException](t(Seq("a", "b")))
  }
}
