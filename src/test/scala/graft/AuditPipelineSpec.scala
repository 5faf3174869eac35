package graft

import java.util.Base64

import graft.pipeline.AuditPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScalaTest port of the reference's behavioral assertions
  * (test_lambda_function.py:70-164): allowlist pruning, value preservation,
  * decode, @timestamp derivation, and the empty-ip drop.
  */
class AuditPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Canonical full 18-field record (test_lambda_function.py:23-45). */
  private val fullJson =
    """{"datetime": "2026-02-18T10:30:00", "random_id": "abc-123-def-456",
      |"kind_id": 1, "account_id": 12345, "performer_id": 67890,
      |"repository_id": 111, "ip": "192.168.1.100",
      |"metadata": {"oauth_token_id": "999"},
      |"request_url": "https://api.example.com/v1/repos",
      |"http_method": "GET", "performer_username": "test-user",
      |"performer_email": "test@example.com", "performer_kind": "user",
      |"auth_type": "oauth", "user_agent": "test-agent/1.0",
      |"request_id": "req-789", "x_forwarded_for": "10.0.0.1"}""".stripMargin.replace("\n", " ")

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def decoded(json: String): DataFrame =
    AuditPipeline.decodeKinesis(Seq(b64(json)).toDF("data"), "data")

  // --- TestProcessKinesisRecord (test_lambda_function.py:126-164) ---------

  test("decodes base64 + JSON payload (lambda_function.py:45)") {
    val row = decoded(fullJson).collect().head
    assert(row.getAs[String]("random_id") == "abc-123-def-456")
    assert(row.getAs[Long]("account_id") == 12345L)
    assert(row.getAs[Map[String, String]]("metadata") == Map("oauth_token_id" -> "999"))
  }

  test("derives @timestamp as a copy of datetime (lambda_function.py:46-47)") {
    val row = AuditPipeline.enrich(decoded(fullJson)).collect().head
    assert(row.getAs[String]("@timestamp") == "2026-02-18T10:30:00")
    assert(row.getAs[String]("@timestamp") == row.getAs[String]("datetime"))
  }

  test("drops empty ip (lambda_function.py:48-49)") {
    val json = fullJson.replace("\"192.168.1.100\"", "\"\"")
    val row = AuditPipeline.enrich(decoded(json)).collect().head
    assert(row.getAs[String]("ip") == null)
  }

  test("keeps non-empty ip (test_lambda_function.py:155-164)") {
    val row = AuditPipeline.enrich(decoded(fullJson)).collect().head
    assert(row.getAs[String]("ip") == "192.168.1.100")
  }

  // --- TestFilterForEs (test_lambda_function.py:70-123) -------------------

  test("allowlist keeps exactly the 9 ES fields (lambda_function.py:16-19,52-54)") {
    val pruned = AuditPipeline.filterForEs(AuditPipeline.enrich(decoded(fullJson)))
    assert(pruned.columns.toSet == AuditPipeline.EsAllowedFields.toSet)
    assert(!pruned.columns.contains("request_url"))
    assert(!pruned.columns.contains("performer_email"))
  }

  test("allowlisted values are preserved (test_lambda_function.py:86-96)") {
    val row = AuditPipeline.filterForEs(AuditPipeline.enrich(decoded(fullJson))).collect().head
    assert(row.getAs[String]("random_id") == "abc-123-def-456")
    assert(row.getAs[Long]("kind_id") == 1L)
    assert(row.getAs[Long]("performer_id") == 67890L)
    assert(row.getAs[Long]("repository_id") == 111L)
    assert(row.getAs[String]("ip") == "192.168.1.100")
  }

  test("identity on already-pruned input (test_lambda_function.py:98-101)") {
    val once = AuditPipeline.filterForEs(AuditPipeline.enrich(decoded(fullJson)))
    val twice = AuditPipeline.filterForEs(once)
    assert(once.columns.toSeq == twice.columns.toSeq)
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("record with absent fields yields nulls, never errors (test_lambda_function.py:103-106)") {
    val row = AuditPipeline.filterForEs(AuditPipeline.enrich(
      decoded("""{"random_id": "only-id"}"""))).collect().head
    assert(row.getAs[String]("random_id") == "only-id")
    assert(row.getAs[String]("datetime") == null)
    assert(row.isNullAt(row.fieldIndex("kind_id")))
  }

  test("malformed JSON becomes null columns (documented divergence from fail-the-batch)") {
    val rows = AuditPipeline.skipNulls(AuditPipeline.enrich(decoded("not json at all")))
    assert(rows.count() == 0)
  }

  // --- Routing keys (lambda_function.py:80-81) ----------------------------

  test("daily index routing + idempotency key") {
    val keyed = AuditPipeline.withRoutingKeys(
      AuditPipeline.enrich(decoded(fullJson)), "audit-")
    val row = keyed.collect().head
    assert(row.getAs[String]("_index") == "audit-2026-02-18")
    assert(row.getAs[String]("_id") == "abc-123-def-456")
  }

  test("null-record skip keeps keyed records only (lambda_function.py:78-79)") {
    val two = Seq(b64(fullJson), b64("""{"kind_id": 7}""")).toDF("data")
    val out = AuditPipeline.skipNulls(AuditPipeline.decodeKinesis(two, "data"))
    assert(out.count() == 1)
  }

  test("dead-letter split quarantines undecodable payloads with their raw form") {
    val mixed = Seq(
      b64(fullJson),                   // valid
      b64("""{"kind_id": 3}"""),       // decodes but misses required fields
      b64("garbage not json")          // undecodable
    ).toDF("data")
    val (valid, dead) = AuditPipeline.partitionValid(
      AuditPipeline.decodeKinesisWithRaw(mixed, "data"))
    assert(valid.count() == 1)
    assert(dead.count() == 2)
    // raw payload survives for replay
    val raws = dead.select("_raw").collect().map(_.getString(0)).toSet
    assert(raws.contains(b64("garbage not json")))
  }

  test("splunk envelope columns (lambda_function.py:121-125)") {
    val env = AuditPipeline.withSplunkEnvelope(decoded(fullJson), "audit-splunk")
    val row = env.select(col("sourcetype"), col("index")).collect().head
    assert(row.getString(0) == "json")
    assert(row.getString(1) == "audit-splunk")
  }
}
