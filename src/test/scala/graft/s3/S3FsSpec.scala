package graft.s3

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The S3-protocol FileSystem against the stateful fake: round-trips,
  * ranged reads, multipart uploads, implicit directories, rename,
  * recursive delete, and ListObjectsV2 continuation — the Hadoop
  * surface Spark drives, over the real S3 wire shapes (reference
  * `corfs/s3.go` + `s3_io.go` re-expressed REST-first). A Spark
  * parquet write/read over `s3g://` closes the loop in
  * S3SparkSpec/GraftShuffleS3Spec. */
class S3FsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var fake: FakeS3 = _
  private var fs: FileSystem = _

  // pageSize 3 forces continuation tokens; part size 8 KB forces the
  // multipart path on a 50 KB write
  override def beforeAll(): Unit = {
    fake = new FakeS3(pageSize = 3)
    val conf = new Configuration(false)
    conf.set("fs.s3g.impl", classOf[S3SigV4Fs].getName)
    conf.set("fs.s3g.impl.disable.cache", "true")
    conf.set("fs.s3g.endpoint", fake.endpoint)
    conf.set("fs.s3g.region", "us-east-1")
    conf.set("fs.s3g.access.key", "AKIDTEST")
    conf.set("fs.s3g.secret.key", "secret")
    conf.setInt("fs.s3g.part.size", 8 * 1024)
    fs = FileSystem.get(java.net.URI.create("s3g://test-bucket/"), conf)
  }

  override def afterAll(): Unit = {
    if (fs != null) fs.close()
    if (fake != null) fake.close()
  }

  private def write(path: String, content: Array[Byte]): Unit = {
    val out = fs.create(new Path(path), true)
    out.write(content)
    out.close()
  }

  private def readAll(path: String): Array[Byte] = {
    val in = fs.open(new Path(path))
    try in.readAllBytes() finally in.close()
  }

  test("small object round-trips through a single PUT") {
    val data = "hello object store".getBytes(StandardCharsets.UTF_8)
    write("s3g://test-bucket/dir/a.txt", data)
    assert(readAll("s3g://test-bucket/dir/a.txt").sameElements(data))
    val st = fs.getFileStatus(new Path("s3g://test-bucket/dir/a.txt"))
    assert(!st.isDirectory && st.getLen == data.length)
    assert(fake.partPuts.get() == 0, "small write must not go multipart")
  }

  test("a 50KB write with 8KB parts goes through the multipart protocol intact") {
    val data = Array.tabulate(50 * 1024)(i => (i * 31 % 251).toByte)
    write("s3g://test-bucket/big/blob.bin", data)
    assert(fake.partPuts.get() >= 7, s"expected >=7 parts, saw ${fake.partPuts.get()}")
    assert(readAll("s3g://test-bucket/big/blob.bin").sameElements(data))
    assert(fs.getFileStatus(new Path("s3g://test-bucket/big/blob.bin")).getLen == data.length)
  }

  test("seek + ranged reads return exact slices") {
    val data = Array.tabulate(10000)(i => (i % 256).toByte)
    write("s3g://test-bucket/rng/r.bin", data)
    val in = fs.open(new Path("s3g://test-bucket/rng/r.bin"))
    try {
      in.seek(7000)
      val buf = new Array[Byte](100)
      in.readFully(buf)
      assert(buf.sameElements(data.slice(7000, 7100)))
      in.seek(3)
      assert(in.read() == (3 & 0xff))
      // positioned read (pread path parquet uses)
      val buf2 = new Array[Byte](50)
      in.readFully(9950, buf2)
      assert(buf2.sameElements(data.slice(9950, 10000)))
    } finally in.close()
  }

  test("implicit directories: status, listing, and FileNotFound") {
    write("s3g://test-bucket/imp/x/1.txt", "one".getBytes)
    write("s3g://test-bucket/imp/x/2.txt", "two".getBytes)
    write("s3g://test-bucket/imp/y.txt", "y".getBytes)
    val dir = fs.getFileStatus(new Path("s3g://test-bucket/imp"))
    assert(dir.isDirectory)
    val ls = fs.listStatus(new Path("s3g://test-bucket/imp")).map(_.getPath.getName).toSet
    assert(ls == Set("x", "y.txt"), s"got $ls")
    intercept[java.io.FileNotFoundException] {
      fs.getFileStatus(new Path("s3g://test-bucket/imp/nope"))
    }
    assert(fs.mkdirs(new Path("s3g://test-bucket/imp/new")))
  }

  test("listing follows continuation tokens past the page size") {
    (1 to 8).foreach(i => write(s"s3g://test-bucket/many/f$i.txt", s"v$i".getBytes))
    val before = fake.listCalls.get()
    val names = fs.listStatus(new Path("s3g://test-bucket/many"))
      .map(_.getPath.getName).toSet
    assert(names == (1 to 8).map(i => s"f$i.txt").toSet, s"got $names")
    assert(fake.listCalls.get() - before >= 3,
      "8 entries at pageSize 3 must take >= 3 list calls")
  }

  test("rename moves files and whole directory trees (copy + delete)") {
    write("s3g://test-bucket/mv/src.txt", "payload".getBytes)
    assert(fs.rename(new Path("s3g://test-bucket/mv/src.txt"),
      new Path("s3g://test-bucket/mv/dst.txt")))
    assert(!fs.exists(new Path("s3g://test-bucket/mv/src.txt")))
    assert(readAll("s3g://test-bucket/mv/dst.txt").sameElements("payload".getBytes))

    write("s3g://test-bucket/tree/a/1.txt", "1".getBytes)
    write("s3g://test-bucket/tree/a/b/2.txt", "2".getBytes)
    assert(fs.rename(new Path("s3g://test-bucket/tree"),
      new Path("s3g://test-bucket/moved")))
    assert(readAll("s3g://test-bucket/moved/a/b/2.txt").sameElements("2".getBytes))
    assert(!fs.exists(new Path("s3g://test-bucket/tree/a/1.txt")))
  }

  test("delete: file, recursive tree, and absent path semantics") {
    write("s3g://test-bucket/del/f.txt", "x".getBytes)
    write("s3g://test-bucket/del/sub/g.txt", "y".getBytes)
    assert(fs.delete(new Path("s3g://test-bucket/del/f.txt"), false))
    intercept[java.io.IOException] {
      fs.delete(new Path("s3g://test-bucket/del"), false) // non-empty, non-recursive
    }
    assert(fs.delete(new Path("s3g://test-bucket/del"), true))
    assert(!fs.exists(new Path("s3g://test-bucket/del/sub/g.txt")))
    assert(!fs.delete(new Path("s3g://test-bucket/del"), true)) // already gone
  }
}
