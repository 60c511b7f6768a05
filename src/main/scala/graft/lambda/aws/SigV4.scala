package graft.lambda.aws

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing, from the public signing
  * specification (docs.aws.amazon.com/IAM/latest/UserGuide/
  * create-signed-request.html): canonical request → string-to-sign →
  * HMAC-SHA256 key chain → hex signature. Implemented over the JDK
  * only, so the AWS control-plane/data-plane bindings
  * ([[AwsControlPlane]], [[AwsFaasClient]]) compile and unit-test
  * in-sandbox with zero added dependencies — the reference gets this
  * from the Go SDK's signer; re-deriving it from the published spec is
  * what lets the binding pin its request shapes in a spec
  * (AwsBindingSpec) instead of trusting an absent jar.
  *
  * Scope: headers-style signing (Authorization header), unsigned
  * streaming/S3 chunked modes are out of scope — the six Lambda/IAM
  * verbs the deploy path drives (reference
  * `/root/reference/internal/pkg/corlambda/client.go:78-126`,
  * `coriam/client.go:163-196`) all sign this way. */
object SigV4 {

  final case class Credentials(
      accessKeyId: String,
      secretAccessKey: String,
      sessionToken: Option[String] = None)

  object Credentials {
    /** The SDK default-chain subset that needs no SDK: the standard
      * AWS environment variables. */
    def fromEnv(env: Map[String, String] = sys.env): Option[Credentials] =
      for {
        ak <- env.get("AWS_ACCESS_KEY_ID")
        sk <- env.get("AWS_SECRET_ACCESS_KEY")
      } yield Credentials(ak, sk, env.get("AWS_SESSION_TOKEN"))
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = HexDigits(b >> 4)
      out(2 * i + 1) = HexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  def sha256Hex(bytes: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(bytes))

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** RFC 3986 URI encoding with the unreserved set AWS specifies:
    * A-Z a-z 0-9 - _ . ~ stay; space is %20 (never '+'); everything
    * else percent-encodes its UTF-8 bytes uppercase. `keepSlash` keeps
    * '/' literal (canonical URI path segments). */
  def uriEncode(s: String, keepSlash: Boolean = false): String = {
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      val unreserved = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~'
      if (unreserved || (keepSlash && c == '/')) sb.append(c)
      else {
        sb.append('%')
        sb.append(HexDigits((b >> 4) & 0xf).toUpper)
        sb.append(HexDigits(b & 0xf).toUpper)
      }
    }
    sb.toString
  }

  /** The canonical request string (spec step 1). `headers` must
    * already include `host` and `x-amz-date`; names are lowercased and
    * values trimmed here. `query` is the DECODED name/value pairs.
    * The canonical path is used as given (Lambda/IAM resource names
    * are URL-safe; the S3/non-S3 double-encoding split is out of
    * scope and documented at the call sites). */
  def canonicalRequest(
      method: String,
      path: String,
      query: Seq[(String, String)],
      headers: Seq[(String, String)],
      payloadSha256Hex: String): String = {
    val canonicalQuery = query
      .map { case (k, v) => (uriEncode(k), uriEncode(v)) }
      .sorted
      .map { case (k, v) => s"$k=$v" }
      .mkString("&")
    val normalized = headers
      .map { case (k, v) => (k.toLowerCase(java.util.Locale.ROOT), v.trim) }
      .sortBy(_._1)
    val canonicalHeaders = normalized.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = normalized.map(_._1).mkString(";")
    val canonicalPath = if (path.isEmpty) "/" else uriEncode(path, keepSlash = true)
    s"$method\n$canonicalPath\n$canonicalQuery\n$canonicalHeaders\n$signedHeaders\n$payloadSha256Hex"
  }

  /** String to sign (spec step 2). `amzDate` is the ISO-basic UTC
    * timestamp (yyyyMMdd'T'HHmmss'Z'); the credential scope derives
    * its date part from it. */
  def stringToSign(
      amzDate: String,
      region: String,
      service: String,
      canonicalRequestStr: String): String = {
    val scope = s"${amzDate.take(8)}/$region/$service/aws4_request"
    s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n" +
      sha256Hex(canonicalRequestStr.getBytes(StandardCharsets.UTF_8))
  }

  /** The derived signing key chain (spec step 3). */
  def signingKey(secretKey: String, date: String, region: String,
      service: String): Array[Byte] = {
    val kDate = hmac(("AWS4" + secretKey).getBytes(StandardCharsets.UTF_8), date)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    hmac(kService, "aws4_request")
  }

  /** Full signing: returns the `Authorization` header value. The
    * caller sends exactly the headers it passed here (plus the
    * returned Authorization); `host` must match what the HTTP stack
    * will put on the wire. */
  def authorizationHeader(
      creds: Credentials,
      method: String,
      path: String,
      query: Seq[(String, String)],
      headers: Seq[(String, String)],
      payloadSha256Hex: String,
      amzDate: String,
      region: String,
      service: String): String = {
    val canonical = canonicalRequest(method, path, query, headers, payloadSha256Hex)
    val sts = stringToSign(amzDate, region, service, canonical)
    val key = signingKey(creds.secretAccessKey, amzDate.take(8), region, service)
    val signature = hex(hmac(key, sts))
    val signedHeaders = headers
      .map(_._1.toLowerCase(java.util.Locale.ROOT)).sorted.mkString(";")
    val scope = s"${amzDate.take(8)}/$region/$service/aws4_request"
    s"AWS4-HMAC-SHA256 Credential=${creds.accessKeyId}/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }

  private val AmzDateFormat = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)

  def amzDate(instant: java.time.Instant): String = AmzDateFormat.format(instant)
}
