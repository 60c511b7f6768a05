package graft.s3

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Stateful in-process S3 fake: objects in a map, the REST verbs the
  * [[S3SigV4Fs]] binding drives — PutObject, ranged GetObject,
  * HeadObject, DeleteObject, CopyObject, the multipart-upload
  * protocol, and ListObjectsV2 with prefix/delimiter grouping and
  * continuation tokens (`pageSize` forces truncation so the client's
  * continuation loop is exercised). Used by S3FsSpec and
  * GraftShuffleS3Spec; lives in MAIN sources (the GraftObjectFs
  * precedent) so `graft.Bench` can run the shuffle leg over the
  * actual S3 wire protocol in a sandbox with no real endpoint
  * (`SPARK_GRAFT_SHUFFLE_DIR=s3g://...` — Bench.withShuffleEnv). */
final class FakeS3(pageSize: Int = 1000) extends AutoCloseable {

  /** "bucket/key" -> bytes. */
  val objects = new ConcurrentHashMap[String, Array[Byte]]()
  private val uploads =
    new ConcurrentHashMap[String, ConcurrentHashMap[Int, Array[Byte]]]()
  private val uploadSeq = new AtomicInteger(0)
  /** Counters for spec assertions. */
  val partPuts = new AtomicLong(0)
  val listCalls = new AtomicLong(0)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handleSafely(ex))
  // daemon workers: a measurement main that forgets close() must
  // still be able to exit the JVM
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8, r => {
    val t = new Thread(r, "fake-s3-worker")
    t.setDaemon(true)
    t
  }))
  // start() from a daemon thread: the JDK server's internal
  // HTTP-Dispatcher thread is non-daemon and not configurable, but
  // daemon status is inherited from the creating thread — without
  // this, a main that returns with the server still up never exits
  // (its close() shutdown hook only fires once non-daemon threads are
  // gone, which the dispatcher itself prevents)
  locally {
    val starter = new Thread(() => server.start(), "fake-s3-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
  }

  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"
  override def close(): Unit = server.stop(0)

  private def handleSafely(ex: HttpExchange): Unit =
    try handle(ex)
    catch {
      case e: Throwable =>
        System.err.println(s"[fake-s3] ${ex.getRequestMethod} ${ex.getRequestURI}: $e")
        respond(ex, 500, s"<Error>$e</Error>".getBytes(StandardCharsets.UTF_8))
    } finally ex.close()

  private def respond(ex: HttpExchange, status: Int, body: Array[Byte],
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val head = ex.getRequestMethod == "HEAD"
    // JDK HttpServer strips Content-Length from HEAD responses no
    // matter what we pass (S3Client sizes via a ranged-GET fallback),
    // and warn-logs once per HEAD given a non-negative length — pass
    // -1 for identical wire behavior without the log spam
    ex.sendResponseHeaders(status, if (head || body.isEmpty) -1 else body.length)
    if (!head && body.nonEmpty) ex.getResponseBody.write(body)
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.nonEmpty).map { kv =>
        kv.split("=", 2) match {
          case Array(k) => dec(k) -> ""
          case Array(k, v) => dec(k) -> dec(v)
        }
      }.toMap

  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripPrefix("/")
    val q = query(ex)
    val slash = path.indexOf('/')
    val (bucket, key) =
      if (slash < 0) (path, "") else (path.take(slash), path.drop(slash + 1))
    val full = s"$bucket/$key"
    val body = ex.getRequestBody.readAllBytes()

    ex.getRequestMethod match {
      case "PUT" if q.contains("partNumber") && q.contains("uploadId") =>
        val parts = uploads.get(q("uploadId"))
        if (parts == null) { respond(ex, 404, err("NoSuchUpload")); return }
        parts.put(q("partNumber").toInt, body)
        partPuts.incrementAndGet()
        respond(ex, 200, Array.emptyByteArray,
          Map("ETag" -> s""""p${q("partNumber")}""""))

      case "PUT" =>
        Option(ex.getRequestHeaders.getFirst("x-amz-copy-source")) match {
          case Some(src) =>
            val srcFull = dec(src).stripPrefix("/")
            val data = objects.get(srcFull)
            if (data == null) respond(ex, 404, err("NoSuchKey"))
            else {
              objects.put(full, data)
              respond(ex, 200,
                "<CopyObjectResult><ETag>\"c\"</ETag></CopyObjectResult>"
                  .getBytes(StandardCharsets.UTF_8))
            }
          case None =>
            objects.put(full, body)
            respond(ex, 200, Array.emptyByteArray, Map("ETag" -> "\"e\""))
        }

      case "POST" if q.contains("uploads") =>
        val id = s"upload-${uploadSeq.incrementAndGet()}"
        uploads.put(id, new ConcurrentHashMap[Int, Array[Byte]]())
        respond(ex, 200,
          (s"<InitiateMultipartUploadResult><Bucket>$bucket</Bucket>" +
            s"<Key>$key</Key><UploadId>$id</UploadId>" +
            "</InitiateMultipartUploadResult>").getBytes(StandardCharsets.UTF_8))

      case "POST" if q.contains("uploadId") =>
        val parts = uploads.remove(q("uploadId"))
        if (parts == null) { respond(ex, 404, err("NoSuchUpload")); return }
        val assembled = parts.asScala.toSeq.sortBy(_._1).map(_._2)
          .foldLeft(Array.emptyByteArray)(_ ++ _)
        objects.put(full, assembled)
        respond(ex, 200,
          (s"<CompleteMultipartUploadResult><Key>$key</Key>" +
            "</CompleteMultipartUploadResult>").getBytes(StandardCharsets.UTF_8))

      case "GET" if key.isEmpty || q.get("list-type").contains("2") =>
        listCalls.incrementAndGet()
        respond(ex, 200, listXml(bucket, q))

      case "GET" | "HEAD" =>
        val data = objects.get(full)
        if (data == null) { respond(ex, 404, err("NoSuchKey")); return }
        Option(ex.getRequestHeaders.getFirst("Range")) match {
          case Some(r) =>
            val m = "bytes=(\\d+)-(\\d+)".r.findFirstMatchIn(r)
            val (a, b) = (m.get.group(1).toLong, m.get.group(2).toLong)
            if (a >= data.length)
              respond(ex, 416, Array.emptyByteArray,
                Map("Content-Range" -> s"bytes */${data.length}"))
            else {
              val hi = math.min(b, data.length - 1L)
              respond(ex, 206, data.slice(a.toInt, hi.toInt + 1),
                Map("Content-Range" -> s"bytes $a-$hi/${data.length}",
                  "Last-Modified" -> HttpDate))
            }
          case None =>
            respond(ex, 200, data, Map("Last-Modified" -> HttpDate))
        }

      case "DELETE" =>
        objects.remove(full)
        respond(ex, 204, Array.emptyByteArray)

      case other =>
        respond(ex, 405, err(s"MethodNotAllowed: $other"))
    }
  }

  private val HttpDate = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
    .format(java.time.ZonedDateTime.of(2026, 1, 2, 3, 4, 5, 0,
      java.time.ZoneOffset.UTC))

  private def err(code: String): Array[Byte] =
    s"<Error><Code>$code</Code></Error>".getBytes(StandardCharsets.UTF_8)

  private def xmlEscape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def listXml(bucket: String, q: Map[String, String]): Array[Byte] = {
    val prefix = q.getOrElse("prefix", "")
    val delimiter = q.getOrElse("delimiter", "")
    val after = q.getOrElse("continuation-token", "")
    val all = objects.keySet().asScala.toSeq
      .filter(_.startsWith(s"$bucket/"))
      .map(_.stripPrefix(s"$bucket/"))
      .filter(_.startsWith(prefix))
      .sorted
    // delimiter grouping over the FULL key set, then paging over the
    // emitted entries (keys + rolled-up prefixes), like real S3
    val entries: Seq[Either[String, String]] = // Left=prefix, Right=key
      if (delimiter.isEmpty) all.map(Right(_))
      else {
        val seen = scala.collection.mutable.LinkedHashSet[Either[String, String]]()
        all.foreach { k =>
          val rest = k.stripPrefix(prefix)
          val d = rest.indexOf(delimiter)
          if (d >= 0) seen += Left(prefix + rest.take(d + delimiter.length))
          else seen += Right(k)
        }
        seen.toSeq
      }
    val sortedEntries = entries.sortBy {
      case Left(p) => p
      case Right(k) => k
    }
    val fromIdx =
      if (after.isEmpty) 0
      else sortedEntries.indexWhere(e => e.merge > after) match {
        case -1 => sortedEntries.size
        case i => i
      }
    val page = sortedEntries.slice(fromIdx, fromIdx + pageSize)
    val truncated = fromIdx + pageSize < sortedEntries.size
    val nextToken = if (truncated) page.lastOption.map(_.merge) else None
    val sb = new StringBuilder
    sb ++= "<ListBucketResult>"
    sb ++= s"<IsTruncated>$truncated</IsTruncated>"
    nextToken.foreach(t =>
      sb ++= s"<NextContinuationToken>${xmlEscape(t)}</NextContinuationToken>")
    page.foreach {
      case Right(k) =>
        val size = objects.get(s"$bucket/$k").length
        sb ++= s"<Contents><Key>${xmlEscape(k)}</Key><Size>$size</Size>" +
          "<LastModified>2026-01-02T03:04:05Z</LastModified></Contents>"
      case Left(p) =>
        sb ++= s"<CommonPrefixes><Prefix>${xmlEscape(p)}</Prefix></CommonPrefixes>"
    }
    sb ++= "</ListBucketResult>"
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }
}
