package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{SinkMetrics, Sinks}
import org.scalatest.funsuite.AnyFunSuite

/** The sink HTTP boundary is a trait (Sinks.BulkTransport / Sinks.HecTransport)
  * so a real OpenSearch bulk client or Splunk HEC poster is plug-compatible
  * with the simulators. These tests drive the delivery semantics through
  * CUSTOM transports — what a deployment would do — and assert the
  * transport-independent parts (chunking, counters, at-most-once drop) hold.
  */
class SinkTransportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("writeSplunkVia: a failing POST drops only its own chunk (at-most-once), counters exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("hec_via").toString
    // single partition -> deterministic chunking: [a,b], [c,d], [e]
    val lines = Seq("a", "b", "c", "d", "e").toDF("line").coalesce(1)
    val m = SinkMetrics(spark)
    val transport = new Sinks.HecTransport {
      override def post(pid: Int, chunkNo: Int, chunk: Seq[String]): Unit = {
        if (chunkNo == 1) throw new RuntimeException("simulated 503")
        Sinks.JsonlFileHec(dir, "t0").post(pid, chunkNo, chunk)
      }
    }
    Sinks.writeSplunkVia(lines, transport, m, maxBatchSize = 2)
    assert(m.splunkTotal.value == 5)
    assert(m.splunkSuccess.value == 3) // chunk 1 (c,d) dropped, not retried
    val delivered = Files.list(Paths.get(dir)).toArray.map(_.toString).sorted
    assert(delivered.length == 2) // posts 0 and 2 landed as files
  }

  test("acceptAllBulk delivers every document through writeEsBulk") {
    import spark.implicits._
    val esDir = Files.createTempDirectory("es_accept").toString
    def recJson(id: Int): String =
      s"""{"datetime": "2026-02-18T10:30:0${id % 10}", "random_id": "id-$id",
         |"kind_id": $id, "account_id": 1, "ip": "1.2.3.$id",
         |"request_url": "https://x/$id", "http_method": "GET"}"""
        .stripMargin.replace("\n", " ")
    def b64(s: String): String =
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    val batch = graft.pipeline.AuditPipeline.decodeKinesis(
      (1 to 3).map(i => b64(recJson(i))).toDF("data"), "data")
    val enriched = graft.pipeline.AuditPipeline.filterForEs(
      graft.pipeline.AuditPipeline.enrich(batch))
    val m = SinkMetrics(spark)
    val delivered = Sinks.writeEsBulk(enriched, esDir, "audit-", m, Sinks.acceptAllBulk)
    assert(delivered == 3)
    assert(m.esSuccess.value == 3 && m.esTotal.value == 3)
    assert(Sinks.readEsIndex(spark, esDir).count() == 3)
  }
}
