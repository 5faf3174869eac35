package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory

import java.nio.charset.StandardCharsets

/** Minimal client for the REAL Secrets Manager wire protocol — the
  * `secretsmanager.GetSecretValue` JSON frame boto3 sends for the
  * reference's config lookup (lambda_function.py:25-41: fetch the
  * secret, parse its `SecretString` as JSON, read keys with `.get`).
  * Completes the network-edge set next to [[HttpHec]]/[[HttpBulk]] and
  * `graft.sources.KinesisHttpClient`: JDK HTTP + Spark's Jackson, no new
  * dependencies, exercised against a loopback protocol server in
  * AwsHttpProtocolSpec. Requests are SigV4-signed when `auth` is given
  * ([[SigV4]] — the IAM identity the Lambda runtime supplies implicitly);
  * None keeps the unsigned loopback/testing behavior. */
final case class SecretsHttpClient(endpoint: String, timeoutMillis: Int = 12000,
    auth: Option[SigV4.AwsAuth] = None) {
  private val mapper = new ObjectMapper()

  /** Fetch + parse one secret: the flat string-valued JSON object the
    * reference stores (es creds, splunk toggle, index names). Non-string
    * values are carried as their JSON text — the reference's truthiness
    * parse (`splunk_disabled == "true"`) applies downstream unchanged. */
  def getSecretValue(secretId: String): Map[String, String] = {
    val body = JsonNodeFactory.instance.objectNode().put("SecretId", secretId)
    val payload = mapper.writeValueAsBytes(body)
    val baseHeaders = Seq("Content-Type" -> "application/x-amz-json-1.1",
      "X-Amz-Target" -> "secretsmanager.GetSecretValue")
    val authHeaders = auth.toSeq.flatMap(a => SigV4.sign("POST",
      java.net.URI.create(endpoint), baseHeaders, payload, a, SigV4.nowAmzDate()))
    val (status, resp) = HttpTransports.post(endpoint,
      payload, timeoutMillis, baseHeaders ++ authHeaders)
    if (status < 200 || status >= 300)
      throw new java.io.IOException(
        s"GetSecretValue returned HTTP $status: ${new String(resp, StandardCharsets.UTF_8).take(200)}")
    val secretString = mapper.readTree(resp).path("SecretString").asText("")
    require(secretString.nonEmpty, s"secret $secretId has no SecretString")
    val parsed = mapper.readTree(secretString)
    require(parsed.isObject, s"secret $secretId SecretString is not a JSON object")
    val it = parsed.fields()
    val out = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      out += e.getKey -> (if (e.getValue.isTextual) e.getValue.asText()
                          else e.getValue.toString)
    }
    out.result()
  }
}

object SecretsHttpClient {
  /** The reference's whole config path over the real protocol: fetch the
    * secret, resolve [[PipelineConfig]] from it (auth-mode branch,
    * splunk toggle, index names — lambda_function.py:25-41,57-66,105-108). */
  def configFrom(endpoint: String, secretId: String): PipelineConfig =
    PipelineConfig.fromSecrets(SecretsHttpClient(endpoint).getSecretValue(secretId))
}
