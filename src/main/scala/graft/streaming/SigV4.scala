package graft.streaming

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing — the last unsigned edge of the
  * wire-protocol surface (the reference's OpenSearch client signs with
  * `AWSV4SignerAuth`, lambda_function.py:64-66, and its Kinesis trigger +
  * Secrets Manager fetch are signed by the Lambda runtime). Implements the
  * published algorithm (docs.aws.amazon.com, "Signature Version 4 signing
  * process"; also RFC-style described in the public sigv4-test-suite):
  *
  *   1. canonical request  = method \n uri \n query \n canonical-headers
  *                           \n signed-headers \n hex(sha256(payload))
  *   2. string to sign     = algorithm \n amz-date \n scope
  *                           \n hex(sha256(canonical request))
  *   3. signing key        = HMAC-chain("AWS4"+secret, date, region,
  *                           service, "aws4_request")
  *   4. signature          = hex(HMAC(signing key, string to sign))
  *
  * Pure function of (request, credentials, clock) — the caller passes the
  * timestamp, so signing is deterministic and spec-checkable against the
  * documented example vectors (SigV4Spec pins all four intermediates).
  * The `host` header is folded into the signature from the URI; it is NOT
  * returned as a header to set, because JDK HttpURLConnection supplies an
  * identical Host line itself (and restricts overriding it).
  */
object SigV4 {

  final case class Credentials(accessKeyId: String, secretKey: String,
      sessionToken: Option[String] = None)

  /** Everything a client needs to sign: credentials + signing scope. */
  final case class AwsAuth(credentials: Credentials, region: String, service: String)

  private def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** RFC 3986 encoding with AWS's rules: unreserved chars stay, space is
    * %20 (never +), everything else percent-encoded uppercase. `keepSlash`
    * for path segments. */
  private[graft] def awsUriEncode(s: String, keepSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      val unreserved = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~'
      if (unreserved || (keepSlash && c == '/')) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Canonical query string: percent-DECODE each name/value from the raw
    * query first ('+' form-decodes to space), then re-encode with AWS's
    * uri-encode and sort by encoded name then encoded value. The decode
    * step matters: `uri.getRawQuery` is already percent-encoded, so
    * encoding it directly would double-encode every reserved character
    * (`b%2Fc` → `b%252Fc`) and leave '+' unnormalized — both diverge from
    * AWS's canonical form. `query` is the raw query string (no leading
    * '?'), or null/empty. A token with MALFORMED percent-encoding (a raw
    * '%' not followed by two hex digits) is signed as-is instead of
    * crashing the signer: such a request is going to be rejected by the
    * service either way, but the signer must never be the component that
    * throws on caller input. */
  private[graft] def canonicalQuery(query: String): String =
    if (query == null || query.isEmpty) ""
    else query.split("&").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      val (k, v) = if (i < 0) (kv, "") else (kv.substring(0, i), kv.substring(i + 1))
      def dec(s: String): String =
        try java.net.URLDecoder.decode(s, UTF_8)
        catch { case _: IllegalArgumentException => s }
      (awsUriEncode(dec(k), keepSlash = false),
        awsUriEncode(dec(v), keepSlash = false))
    }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  /** The derived signing key (step 3) — exposed for the spec's published
    * example-vector check. `date` is YYYYMMDD. */
  private[graft] def signingKey(secret: String, date: String,
      region: String, service: String): Array[Byte] =
    hmac(hmac(hmac(hmac(s"AWS4$secret".getBytes(UTF_8), date),
      region), service), "aws4_request")

  /** The canonical request string (step 1) — exposed for the spec.
    * `headers` must already include every header to sign (host included). */
  private[graft] def canonicalRequest(method: String, path: String,
      query: String, headers: Seq[(String, String)], payloadSha256: String): String = {
    val canon = headers
      .map { case (k, v) => (k.toLowerCase, v.trim.replaceAll(" +", " ")) }
      .sortBy(_._1)
    val canonicalHeaders = canon.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = canon.map(_._1).mkString(";")
    val canonicalPath =
      if (path == null || path.isEmpty) "/" else awsUriEncode(path, keepSlash = true)
    Seq(method.toUpperCase, canonicalPath, canonicalQuery(query),
      canonicalHeaders, signedHeaders, payloadSha256).mkString("\n")
  }

  /** Sign one request. Returns the headers to ADD: `x-amz-date`,
    * `authorization`, and `x-amz-security-token` when a session token is
    * present. `headers` are the non-host headers the caller will send and
    * wants signed (content-type, x-amz-target, …); `amzDate` is
    * YYYYMMDD'T'HHMMSS'Z'. */
  def sign(method: String, uri: URI, headers: Seq[(String, String)],
      payload: Array[Byte], auth: AwsAuth, amzDate: String): Seq[(String, String)] = {
    require(amzDate.length == 16 && amzDate.charAt(8) == 'T' && amzDate.endsWith("Z"),
      s"amzDate must be YYYYMMDDTHHMMSSZ, got '$amzDate'")
    val date = amzDate.substring(0, 8)
    // The signed host must match the Host line the HTTP stack sends: JDK
    // HttpURLConnection omits an explicitly-given DEFAULT port (e.g.
    // https://host:443) from its Host header, so signing "host:443" would
    // yield SignatureDoesNotMatch from real AWS. Include the port only
    // when it differs from the scheme default.
    val defaultPort = uri.getScheme match {
      case "https" => 443
      case "http"  => 80
      case _       => -1
    }
    val host = uri.getHost +
      (if (uri.getPort > 0 && uri.getPort != defaultPort) s":${uri.getPort}" else "")
    val payloadSha = sha256Hex(payload)
    val tokenHeader = auth.credentials.sessionToken
      .map(t => "x-amz-security-token" -> t).toSeq
    val allSigned = headers ++ tokenHeader ++
      Seq("host" -> host, "x-amz-date" -> amzDate)
    val creq = canonicalRequest(method, uri.getPath, uri.getRawQuery, allSigned, payloadSha)
    val scope = s"$date/${auth.region}/${auth.service}/aws4_request"
    val sts = Seq("AWS4-HMAC-SHA256", amzDate, scope, sha256Hex(creq.getBytes(UTF_8)))
      .mkString("\n")
    val key = signingKey(auth.credentials.secretKey, date, auth.region, auth.service)
    val signature = hmac(key, sts).map(b => f"${b & 0xff}%02x").mkString
    val signedNames = allSigned.map(_._1.toLowerCase).sorted.mkString(";")
    tokenHeader ++ Seq(
      "x-amz-date" -> amzDate,
      "Authorization" -> (s"AWS4-HMAC-SHA256 Credential=${auth.credentials.accessKeyId}/$scope, " +
        s"SignedHeaders=$signedNames, Signature=$signature"))
  }

  /** Current UTC timestamp in the x-amz-date format. */
  def nowAmzDate(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .format(java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC))
}
