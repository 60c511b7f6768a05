package graft.s3

import java.net.URI
import java.nio.charset.StandardCharsets

import graft.lambda.aws.{AwsHttpClient, SigV4}

/** Object metadata as S3 reports it. */
final case class S3ObjectMeta(key: String, size: Long, mtimeMs: Long)

/** Minimal S3 REST client — the verbs the reference's S3 backend
  * drives through the Go SDK (`/root/reference/internal/pkg/corfs/
  * s3.go:28-225` ListObjectsV2/HeadObject/DeleteObject, `s3_io.go:
  * 22-119` ranged GET reader + multipart-upload writer), re-expressed
  * as the public S3 REST API over [[AwsHttpClient]]'s SigV4 signing —
  * in-sandbox testable against a stateful fake (S3FsSpec), production
  * needs credentials + an endpoint.
  *
  * Path-style addressing (`/{bucket}/{key}`) so one endpoint serves
  * every bucket — what local fakes and most S3-compatible stores
  * speak; virtual-host style differs only in endpoint construction.
  * S3's SigV4 profile: canonical URI is single-URI-encoded (SigV4's
  * non-S3 double-encode rule does NOT apply), payload hash always in
  * `x-amz-content-sha256` — both already [[AwsHttpClient]]'s behavior.
  */
final class S3Client(
    http: AwsHttpClient,
    endpoint: URI,
    region: String) {

  private def req(method: String, bucket: String, key: String,
      query: Seq[(String, String)] = Seq.empty,
      headers: Seq[(String, String)] = Seq.empty,
      body: Array[Byte] = Array.emptyByteArray) =
    http.request(endpoint, region, "s3", method,
      s"/$bucket/$key", query, headers, body)

  private def fail(what: String, r: AwsHttpClient#Response): Nothing =
    throw new java.io.IOException(
      s"S3 $what failed: HTTP ${r.status} ${r.bodyString.take(300)}")

  /** HeadObject: Some(size, mtime) or None on 404. Real S3 always
    * answers HEAD with Content-Length; when a test double cannot (JDK
    * HttpServer strips Content-Length from HEAD responses), the size
    * comes from a 1-byte ranged GET's Content-Range total instead —
    * one extra round-trip on fakes, zero on S3. */
  def head(bucket: String, key: String): Option[(Long, Long)] = {
    val r = req("HEAD", bucket, key)
    r.status match {
      case 200 =>
        val size = r.header("content-length").map(_.toLong)
          .getOrElse(sizeViaRange(bucket, key))
        Some((size, parseHttpDate(r.header("last-modified"))))
      case 404 => None
      case _ => fail(s"HeadObject($bucket/$key)", r)
    }
  }

  /** Object size from `Content-Range: bytes a-b/TOTAL` of a 1-byte
    * ranged GET; a 416 (any range of a zero-byte object) is size 0. */
  private def sizeViaRange(bucket: String, key: String): Long = {
    val r = req("GET", bucket, key, headers = Seq("range" -> "bytes=0-0"))
    r.status match {
      case 200 => r.body.length.toLong
      case 206 =>
        r.header("content-range").flatMap(cr =>
          cr.split("/").lastOption.filter(_ != "*").map(_.toLong))
          .getOrElse(fail(s"GetObject($bucket/$key): no Content-Range total", r))
      case 416 => 0L
      case _ => fail(s"GetObject($bucket/$key size probe)", r)
    }
  }

  /** Ranged GetObject: bytes [start, end] inclusive. 416 (requested
    * range not satisfiable — e.g. any range of a zero-byte object)
    * returns empty. */
  def getRange(bucket: String, key: String, start: Long, end: Long): Array[Byte] = {
    val r = req("GET", bucket, key,
      headers = Seq("range" -> s"bytes=$start-$end"))
    r.status match {
      case 200 | 206 => r.body
      case 416 => Array.emptyByteArray
      case 404 => throw new java.io.FileNotFoundException(s"s3://$bucket/$key")
      case _ => fail(s"GetObject($bucket/$key range=$start-$end)", r)
    }
  }

  /** Single-request PutObject (the ≤ 5 GB path). */
  def put(bucket: String, key: String, bytes: Array[Byte]): Unit = {
    val r = req("PUT", bucket, key, body = bytes)
    if (r.status != 200) fail(s"PutObject($bucket/$key)", r)
  }

  /** Server-side CopyObject. */
  def copy(srcBucket: String, srcKey: String,
      dstBucket: String, dstKey: String): Unit = {
    val r = req("PUT", dstBucket, dstKey, headers = Seq(
      "x-amz-copy-source" -> SigV4.uriEncode(s"/$srcBucket/$srcKey", keepSlash = true)))
    if (r.status != 200) fail(s"CopyObject($srcBucket/$srcKey -> $dstBucket/$dstKey)", r)
  }

  /** DeleteObject — S3 returns 204 whether or not the key existed. */
  def delete(bucket: String, key: String): Unit = {
    val r = req("DELETE", bucket, key)
    if (r.status != 204 && r.status != 200) fail(s"DeleteObject($bucket/$key)", r)
  }

  // -- multipart upload (s3_io.go:62-119's writer shape) ------------------

  def initiateMultipart(bucket: String, key: String): String = {
    val r = req("POST", bucket, key, query = Seq("uploads" -> ""))
    if (r.status != 200) fail(s"CreateMultipartUpload($bucket/$key)", r)
    xmlFirst(r.bodyString, "UploadId").getOrElse(
      fail(s"CreateMultipartUpload($bucket/$key): no UploadId", r))
  }

  /** Returns the part's ETag (needed to complete). */
  def uploadPart(bucket: String, key: String, uploadId: String,
      partNumber: Int, bytes: Array[Byte]): String = {
    val r = req("PUT", bucket, key,
      query = Seq("partNumber" -> partNumber.toString, "uploadId" -> uploadId),
      body = bytes)
    if (r.status != 200) fail(s"UploadPart($bucket/$key#$partNumber)", r)
    r.header("etag").getOrElse("\"\"")
  }

  def completeMultipart(bucket: String, key: String, uploadId: String,
      parts: Seq[(Int, String)]): Unit = {
    val xml = parts.sortBy(_._1).map { case (n, etag) =>
      s"<Part><PartNumber>$n</PartNumber><ETag>$etag</ETag></Part>"
    }.mkString("<CompleteMultipartUpload>", "", "</CompleteMultipartUpload>")
    val r = req("POST", bucket, key, query = Seq("uploadId" -> uploadId),
      body = xml.getBytes(StandardCharsets.UTF_8))
    if (r.status != 200) fail(s"CompleteMultipartUpload($bucket/$key)", r)
  }

  // -- listing ------------------------------------------------------------

  /** ListObjectsV2 under `prefix` with `/` delimiter: (objects,
    * common prefixes). Follows continuation tokens, so > 1000-key
    * prefixes list completely (the truncation loop corfs relies on
    * the SDK for, `s3.go:61-84`). */
  def list(bucket: String, prefix: String): (Seq[S3ObjectMeta], Seq[String]) = {
    val objs = Vector.newBuilder[S3ObjectMeta]
    val prefixes = Vector.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val q = Seq("list-type" -> "2", "prefix" -> prefix, "delimiter" -> "/") ++
        token.map("continuation-token" -> _).toSeq
      val r = http.request(endpoint, region, "s3", "GET", s"/$bucket", q)
      if (r.status != 200) fail(s"ListObjectsV2($bucket, $prefix)", r)
      val xml = r.bodyString
      xmlAll(xml, "Contents").foreach { c =>
        objs += S3ObjectMeta(
          xmlFirst(c, "Key").getOrElse(""),
          xmlFirst(c, "Size").map(_.toLong).getOrElse(0L),
          xmlFirst(c, "LastModified").map(parseIsoDate).getOrElse(0L))
      }
      xmlAll(xml, "CommonPrefixes").foreach { p =>
        xmlFirst(p, "Prefix").foreach(prefixes += _)
      }
      token = xmlFirst(xml, "NextContinuationToken")
      more = token.isDefined &&
        xmlFirst(xml, "IsTruncated").contains("true")
    }
    (objs.result(), prefixes.result())
  }

  // -- tiny XML scalar extraction (flat S3 response shapes) ---------------

  private def unescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")

  private[s3] def xmlFirst(xml: String, tag: String): Option[String] =
    xmlAll(xml, tag).headOption

  private[s3] def xmlAll(xml: String, tag: String): Seq[String] = {
    val open = s"<$tag>"
    val close = s"</$tag>"
    val out = Vector.newBuilder[String]
    var i = xml.indexOf(open)
    while (i >= 0) {
      val j = xml.indexOf(close, i + open.length)
      if (j < 0) return out.result()
      out += unescape(xml.substring(i + open.length, j))
      i = xml.indexOf(open, j + close.length)
    }
    out.result()
  }

  private def parseHttpDate(v: Option[String]): Long =
    v.flatMap { s =>
      try Some(java.time.ZonedDateTime.parse(s,
        java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
        .toInstant.toEpochMilli)
      catch { case _: Exception => None }
    }.getOrElse(0L)

  private def parseIsoDate(s: String): Long =
    try java.time.Instant.parse(s).toEpochMilli
    catch { case _: Exception => 0L }
}
