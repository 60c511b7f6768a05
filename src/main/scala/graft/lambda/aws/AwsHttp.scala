package graft.lambda.aws

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Instant

/** Minimal signed-request HTTP layer for the AWS bindings: builds the
  * SigV4 headers, sends over `java.net.http`, returns status + body.
  * The endpoint URI is injectable, which is the whole test story —
  * AwsBindingSpec points it at an in-process recording server and
  * asserts the exact wire shapes; production points it at
  * `https://lambda.<region>.amazonaws.com` / `https://iam.amazonaws.com`.
  * The clock is injectable for deterministic signatures in specs. */
final class AwsHttpClient(
    creds: SigV4.Credentials,
    http: HttpClient = AwsHttpClient.sharedHttp,
    clock: () => Instant = () => Instant.now()) {

  final case class Response(status: Int, body: Array[Byte],
      headers: Map[String, String] = Map.empty) {
    def bodyString: String =
      new String(body, java.nio.charset.StandardCharsets.UTF_8)
    /** Case-insensitive header lookup (HTTP header names are). */
    def header(name: String): Option[String] =
      headers.get(name.toLowerCase(java.util.Locale.ROOT))
  }

  /** Send one signed request. `query` is decoded name/value pairs;
    * `headers` are EXTRA headers (content-type etc.) — host and
    * x-amz-date (and x-amz-security-token for session credentials) are
    * added and signed here. */
  def request(
      endpoint: URI,
      region: String,
      service: String,
      method: String,
      path: String,
      query: Seq[(String, String)] = Seq.empty,
      headers: Seq[(String, String)] = Seq.empty,
      body: Array[Byte] = Array.emptyByteArray): Response = {
    val amzDate = SigV4.amzDate(clock())
    // sign the authority exactly as the JDK client puts it on the
    // wire: host:port for non-default ports (the spec fake), bare host
    // otherwise
    val hostHeader = {
      val p = endpoint.getPort
      if (p == -1) endpoint.getHost else s"${endpoint.getHost}:$p"
    }
    val payloadHash = SigV4.sha256Hex(body)
    val signedHeaderSet: Seq[(String, String)] =
      headers ++ Seq("host" -> hostHeader, "x-amz-date" -> amzDate,
        "x-amz-content-sha256" -> payloadHash) ++
        creds.sessionToken.map("x-amz-security-token" -> _).toSeq
    val auth = SigV4.authorizationHeader(creds, method, path, query,
      signedHeaderSet, payloadHash, amzDate, region, service)

    val qs = query.map { case (k, v) =>
      s"${SigV4.uriEncode(k)}=${SigV4.uriEncode(v)}"
    }.mkString("&")
    // build the raw URI string: the multi-arg URI constructor would
    // re-quote '%' in the already-encoded query (double-encoding)
    val uri = URI.create(s"${endpoint.getScheme}://${endpoint.getAuthority}" +
      SigV4.uriEncode(path, keepSlash = true) +
      (if (qs.isEmpty) "" else s"?$qs"))
    var b = HttpRequest.newBuilder(uri).method(method,
      if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
      else HttpRequest.BodyPublishers.ofByteArray(body))
    // the JDK client owns the Host header; everything else we signed
    // must go on the wire verbatim
    (signedHeaderSet.filterNot(_._1 == "host") :+ ("Authorization" -> auth))
      .foreach { case (k, v) => b = b.header(k, v) }
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    Response(resp.statusCode(), resp.body(), flattenHeaders(resp))
  }

  /** Unsigned GET — the pre-signed `Code.Location` package download
    * (the URL carries its own query-string signature). */
  def getUnsigned(uri: URI): Response = {
    val resp = http.send(HttpRequest.newBuilder(uri).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    Response(resp.statusCode(), resp.body(), flattenHeaders(resp))
  }

  private def flattenHeaders(resp: HttpResponse[Array[Byte]]): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    resp.headers().map().asScala.collect {
      case (k, vs) if !vs.isEmpty =>
        k.toLowerCase(java.util.Locale.ROOT) -> vs.get(0)
    }.toMap
  }
}

object AwsHttpClient {
  /** One JDK client for every default-constructed AwsHttpClient.
    * HttpClient is thread-safe and holds a selector thread + pool;
    * per-instance clients leak those (a Hadoop FS with the cache
    * disabled constructs hundreds of [[graft.s3.S3SigV4Fs]] instances
    * per job, which showed up as hundreds of
    * HttpClient-N-SelectorManager threads in a bench run). */
  lazy val sharedHttp: HttpClient = HttpClient.newHttpClient()
}
