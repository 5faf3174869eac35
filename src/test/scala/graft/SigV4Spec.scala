package graft

import graft.streaming.SigV4
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8

/** SigV4 pinned to the published AWS documentation example (the IAM
  * ListUsers GET of the "Signature Version 4 signing process" docs /
  * sigv4-test-suite): canonical request, its SHA-256, the derived signing
  * key, and the final signature are all asserted against the documented
  * hex values, so a regression in any stage is named by the failing
  * intermediate. Plus encoding edge cases and the POST shape the Kinesis /
  * Secrets Manager clients send. */
class SigV4Spec extends AnyFunSuite {

  private val docCreds = SigV4.Credentials(
    "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
  private val docAuth = SigV4.AwsAuth(docCreds, "us-east-1", "iam")

  test("documented example: canonical request and its hash") {
    val creq = SigV4.canonicalRequest(
      "GET", "/", "Action=ListUsers&Version=2010-05-08",
      Seq("content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      sha256Hex(Array.emptyByteArray))
    val expected =
      """GET
        |/
        |Action=ListUsers&Version=2010-05-08
        |content-type:application/x-www-form-urlencoded; charset=utf-8
        |host:iam.amazonaws.com
        |x-amz-date:20150830T123600Z
        |
        |content-type;host;x-amz-date
        |e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855""".stripMargin
    assert(creq == expected)
    assert(sha256Hex(creq.getBytes(UTF_8)) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
  }

  test("documented example: derived signing key") {
    val key = SigV4.signingKey(docCreds.secretKey, "20150830", "us-east-1", "iam")
    assert(key.map(b => f"${b & 0xff}%02x").mkString ==
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("documented example: final signature and Authorization header") {
    val headers = SigV4.sign("GET",
      URI.create("https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"),
      Seq("content-type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      Array.emptyByteArray, docAuth, "20150830T123600Z")
    val auth = headers.collectFirst { case ("Authorization", v) => v }.get
    assert(auth == "AWS4-HMAC-SHA256 " +
      "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
      "SignedHeaders=content-type;host;x-amz-date, " +
      "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    assert(headers.exists { case (k, v) => k == "x-amz-date" && v == "20150830T123600Z" })
  }

  test("uri/query encoding rules: space %20, unreserved kept, sorted query") {
    assert(SigV4.awsUriEncode("a b~c-d._/e", keepSlash = true) == "a%20b~c-d._/e")
    assert(SigV4.awsUriEncode("a/b", keepSlash = false) == "a%2Fb")
    assert(SigV4.awsUriEncode("α", keepSlash = false) == "%CE%B1")
    assert(SigV4.canonicalQuery("b=2&a=1&a=0") == "a=0&a=1&b=2")
    assert(SigV4.canonicalQuery("k=v w&flag") == "flag=&k=v%20w")
    assert(SigV4.canonicalQuery(null) == "")
  }

  test("raw query is decoded before canonical re-encoding (no double-encode)") {
    // an already-percent-encoded reserved char must come out single-encoded
    assert(SigV4.canonicalQuery("a=b%2Fc") == "a=b%2Fc")
    // '+' is form-encoding for space -> canonical %20
    assert(SigV4.canonicalQuery("a=b+c") == "a=b%20c")
    // mixed: decoded non-ASCII round-trips to uppercase percent form
    assert(SigV4.canonicalQuery("a=%ce%b1") == "a=%CE%B1")
  }

  test("explicit scheme-default port is omitted from the signed host") {
    def sig(u: String) = SigV4.sign("POST", URI.create(u),
      Seq("content-type" -> "application/x-amz-json-1.1"),
      "{}".getBytes(UTF_8), docAuth, "20260814T120000Z")
      .collectFirst { case ("Authorization", v) => v }.get
    // JDK HttpURLConnection sends "Host: host" for https://host:443, so
    // the signature must match the bare-URL form
    assert(sig("https://iam.amazonaws.com:443/") == sig("https://iam.amazonaws.com/"))
    assert(sig("http://iam.amazonaws.com:80/") == sig("http://iam.amazonaws.com/"))
    // ...but a genuinely non-default port stays in the signed host
    assert(sig("https://iam.amazonaws.com:8443/") != sig("https://iam.amazonaws.com/"))
  }

  test("session token is signed and returned; port lands in host") {
    val auth = SigV4.AwsAuth(
      SigV4.Credentials("AKID", "secret", Some("TOKEN123")), "us-west-2", "kinesis")
    val headers = SigV4.sign("POST", URI.create("http://localhost:8912/"),
      Seq("content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "Kinesis_20131202.ListShards"),
      """{"StreamName":"s"}""".getBytes(UTF_8), auth, "20260814T120000Z")
    assert(headers.exists { case (k, v) => k == "x-amz-security-token" && v == "TOKEN123" })
    val a = headers.collectFirst { case ("Authorization", v) => v }.get
    assert(a.contains(
      "SignedHeaders=content-type;host;x-amz-date;x-amz-security-token;x-amz-target"))
    assert(a.contains("/20260814/us-west-2/kinesis/aws4_request"))
    // signing must be a pure function: same inputs, same signature
    val again = SigV4.sign("POST", URI.create("http://localhost:8912/"),
      Seq("content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "Kinesis_20131202.ListShards"),
      """{"StreamName":"s"}""".getBytes(UTF_8), auth, "20260814T120000Z")
    assert(again == headers)
    // and payload-sensitive: a different body changes the signature
    val other = SigV4.sign("POST", URI.create("http://localhost:8912/"),
      Seq("content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "Kinesis_20131202.ListShards"),
      """{"StreamName":"t"}""".getBytes(UTF_8), auth, "20260814T120000Z")
    assert(other != headers)
  }

  private def sha256Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString
}
