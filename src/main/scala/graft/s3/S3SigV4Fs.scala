package graft.s3

import java.io.{ByteArrayInputStream, FileNotFoundException, IOException, OutputStream}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import graft.lambda.aws.{AwsHttpClient, SigV4}

/** Hadoop FileSystem speaking the real S3 REST protocol through
  * [[S3Client]] — the engine's production object-store backend
  * (reference `/root/reference/internal/pkg/corfs/s3.go` +
  * `s3_io.go`), implemented over the repo's own SigV4 signer so it
  * carries no hadoop-aws/SDK dependency and unit-tests in-sandbox
  * against a stateful fake server (S3FsSpec, which also runs the
  * object-store SHUFFLE over this FS — the full S3 wire path).
  *
  * Semantics (the standard object-store mapping, same as s3a):
  *  - objects are files; directories are implicit (a key exists under
  *    the prefix) — `mkdirs` is a no-op success, empty dirs don't
  *    persist;
  *  - `create` buffers to a local temp file and uploads on close —
  *    single PUT up to the part size, multipart beyond it (S3's 5 GB
  *    single-PUT limit; part size conf'able, spec exercises the
  *    multipart path with a small one);
  *  - `open` reads via ranged GETs with a fixed readahead chunk;
  *    seeks re-position without network until the chunk is left;
  *  - `rename` is server-side copy + delete (no atomic rename exists
  *    on S3 — callers that need atomic publish use manifest files,
  *    which is exactly why the asset lifecycle and the shuffle layout
  *    publish via marker/manifest, not rename).
  *
  * Conf (scheme-parameterized, so one class can back any scheme):
  * `fs.<scheme>.endpoint` (required), `fs.<scheme>.region`,
  * `fs.<scheme>.access.key` / `.secret.key` / `.session.token`
  * (fall back to the standard AWS env vars), `fs.<scheme>.part.size`.
  */
class S3SigV4Fs extends FileSystem {

  private var fsUri: URI = _
  private var bucket: String = _
  private var client: S3Client = _
  private var partSize: Int = _
  private var workingDir: Path = _

  override def getScheme: String = "s3g"

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = URI.create(s"${uri.getScheme}://${uri.getAuthority}")
    bucket = uri.getAuthority
    require(bucket != null && bucket.nonEmpty,
      s"S3 URI needs a bucket authority: $uri")
    val scheme = uri.getScheme
    val endpoint = conf.get(s"fs.$scheme.endpoint")
    require(endpoint != null,
      s"fs.$scheme.endpoint is required (e.g. https://s3.us-east-1.amazonaws.com)")
    val region = conf.get(s"fs.$scheme.region", "us-east-1")
    val creds = (Option(conf.get(s"fs.$scheme.access.key")),
        Option(conf.get(s"fs.$scheme.secret.key"))) match {
      case (Some(ak), Some(sk)) =>
        SigV4.Credentials(ak, sk, Option(conf.get(s"fs.$scheme.session.token")))
      case _ => SigV4.Credentials.fromEnv().getOrElse(
        throw new IllegalArgumentException(
          s"no S3 credentials: set fs.$scheme.access.key/.secret.key " +
            "or AWS_ACCESS_KEY_ID/AWS_SECRET_ACCESS_KEY"))
    }
    partSize = conf.getInt(s"fs.$scheme.part.size", 64 * 1024 * 1024)
    require(partSize >= 1024, s"fs.$scheme.part.size too small: $partSize")
    client = new S3Client(new AwsHttpClient(creds), URI.create(endpoint), region)
    workingDir = new Path(s"$scheme://$bucket/")
  }

  override def getUri: URI = fsUri

  /** bucket-relative object key ('' for the root). */
  private def keyOf(path: Path): String = {
    val p = makeQualified(path).toUri.getPath
    p.stripPrefix("/")
  }

  private def qualify(key: String): Path =
    new Path(s"${fsUri.getScheme}://$bucket/$key")

  // -- status / listing ---------------------------------------------------

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) // the bucket root is a directory
      return new FileStatus(0, true, 1, blockSize, 0, makeQualified(f))
    client.head(bucket, key) match {
      case Some((size, mtime)) =>
        new FileStatus(size, false, 1, blockSize, mtime, makeQualified(f))
      case None =>
        // implicit directory iff anything exists under the prefix
        val (objs, prefixes) = client.list(bucket, key + "/")
        if (objs.nonEmpty || prefixes.nonEmpty)
          new FileStatus(0, true, 1, blockSize, 0, makeQualified(f))
        else throw new FileNotFoundException(f.toString)
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    if (key.nonEmpty) {
      // a FILE lists as itself (Hadoop contract)
      client.head(bucket, key) match {
        case Some((size, mtime)) =>
          return Array(new FileStatus(size, false, 1, blockSize, mtime, makeQualified(f)))
        case None => ()
      }
    }
    val prefix = if (key.isEmpty) "" else key + "/"
    val (objs, prefixes) = client.list(bucket, prefix)
    if (objs.isEmpty && prefixes.isEmpty && key.nonEmpty)
      throw new FileNotFoundException(f.toString)
    val files = objs
      .filter(o => o.key != prefix) // a zero-byte dir marker isn't a child
      .map(o => new FileStatus(o.size, false, 1, blockSize, o.mtimeMs, qualify(o.key)))
    val dirs = prefixes.map(p =>
      new FileStatus(0, true, 1, blockSize, 0, qualify(p.stripSuffix("/"))))
    (files ++ dirs).toArray
  }

  // -- read ---------------------------------------------------------------

  /** Readahead chunk for ranged GETs: large enough to amortize
    * request overhead on sequential scans, small enough that a
    * point-read (a parquet footer, a shuffle segment) doesn't drag
    * the whole object. */
  private val ReadChunk = 4 * 1024 * 1024

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(f)
    val size = client.head(bucket, key) match {
      case Some((s, _)) => s
      case None => throw new FileNotFoundException(f.toString)
    }
    new FSDataInputStream(new S3InputStream(key, size))
  }

  private final class S3InputStream(key: String, size: Long)
      extends FSInputStream {
    private var pos = 0L
    private var chunk: Array[Byte] = Array.emptyByteArray
    private var chunkStart = 0L

    override def seek(newPos: Long): Unit = {
      if (newPos < 0 || newPos > size)
        throw new java.io.EOFException(s"seek($newPos) outside [0, $size] of $key")
      pos = newPos
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false

    private def ensureChunk(): Boolean = {
      if (pos >= size) return false
      val inChunk = pos >= chunkStart && pos < chunkStart + chunk.length
      if (!inChunk) {
        val end = math.min(size - 1, pos + ReadChunk - 1)
        chunk = client.getRange(bucket, key, pos, end)
        chunkStart = pos
      }
      true
    }

    override def read(): Int = {
      if (!ensureChunk()) return -1
      val b = chunk((pos - chunkStart).toInt) & 0xff
      pos += 1
      b
    }

    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      if (!ensureChunk()) return -1
      val offInChunk = (pos - chunkStart).toInt
      val n = math.min(len, chunk.length - offInChunk)
      System.arraycopy(chunk, offInChunk, buf, off, n)
      pos += n
      n
    }
  }

  // -- write --------------------------------------------------------------

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blkSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (!overwrite && client.head(bucket, key).isDefined)
      throw new FileAlreadyExistsException(f.toString)
    new FSDataOutputStream(new S3OutputStream(key), statistics)
  }

  /** Buffers to a local temp file; on close, a single PUT when the
    * bytes fit one part, else the multipart protocol with parts read
    * back from the temp file — memory stays bounded by the part size
    * (the reference's writer shape, `s3_io.go:62-119`). */
  private final class S3OutputStream(key: String) extends OutputStream {
    private val tmp = java.nio.file.Files.createTempFile("s3g-upload-", ".tmp")
    private val out = java.nio.file.Files.newOutputStream(tmp)
    private var closed = false

    override def write(b: Int): Unit = out.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      out.write(b, off, len)

    override def close(): Unit = {
      if (closed) return
      closed = true
      out.close()
      try {
        val total = java.nio.file.Files.size(tmp)
        if (total <= partSize) {
          client.put(bucket, key, java.nio.file.Files.readAllBytes(tmp))
        } else {
          val uploadId = client.initiateMultipart(bucket, key)
          val in = java.nio.file.Files.newInputStream(tmp)
          try {
            val parts = Vector.newBuilder[(Int, String)]
            var n = 1
            var remaining = total
            while (remaining > 0) {
              val len = math.min(partSize.toLong, remaining).toInt
              val buf = in.readNBytes(len)
              parts += ((n, client.uploadPart(bucket, key, uploadId, n, buf)))
              n += 1
              remaining -= len
            }
            client.completeMultipart(bucket, key, uploadId, parts.result())
          } finally in.close()
        }
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("S3 objects are immutable; no append")

  // -- namespace ops ------------------------------------------------------

  override def rename(src: Path, dst: Path): Boolean = {
    val st =
      try getFileStatus(src)
      catch { case _: FileNotFoundException => return false }
    // renaming INTO an existing directory targets dst/srcName
    val target =
      try {
        if (getFileStatus(dst).isDirectory) new Path(dst, src.getName) else dst
      } catch { case _: FileNotFoundException => dst }
    if (st.isDirectory) {
      val srcKey = keyOf(src)
      val dstKey = keyOf(target)
      deepList(srcKey + "/").foreach { o =>
        val rel = o.key.stripPrefix(srcKey + "/")
        client.copy(bucket, o.key, bucket, s"$dstKey/$rel")
        client.delete(bucket, o.key)
      }
      true
    } else {
      client.copy(bucket, keyOf(src), bucket, keyOf(target))
      client.delete(bucket, keyOf(src))
      true
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val st =
      try getFileStatus(f)
      catch { case _: FileNotFoundException => return false }
    if (!st.isDirectory) {
      client.delete(bucket, keyOf(f))
      true
    } else {
      val key = keyOf(f)
      val children = deepList(if (key.isEmpty) "" else key + "/")
      if (children.nonEmpty && !recursive)
        throw new IOException(s"directory not empty: $f")
      children.foreach(o => client.delete(bucket, o.key))
      true
    }
  }

  /** Delimiter-recursive deep listing of every object under `prefix`. */
  private def deepList(prefix: String): Seq[S3ObjectMeta] = {
    val (objs, prefixes) = client.list(bucket, prefix)
    objs ++ prefixes.flatMap(deepList)
  }

  /** Object stores have no directories to make: success if no FILE
    * occupies the path (a marker-free implicit-dir model, like s3a
    * without magic markers). */
  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val key = keyOf(f)
    if (key.nonEmpty && client.head(bucket, key).isDefined)
      throw new FileAlreadyExistsException(s"file exists at $f")
    true
  }

  override def setWorkingDirectory(dir: Path): Unit = workingDir = dir
  override def getWorkingDirectory: Path = workingDir

  private def blockSize: Long = 32L * 1024 * 1024
  override def getDefaultBlockSize(f: Path): Long = blockSize
}
