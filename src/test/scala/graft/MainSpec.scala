package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference driver's end-to-end behavior test
  * (`/root/reference/driver_test.go:82-116`): run the wordcount job via
  * the CLI front door over a real temp directory of text files, then
  * assert the exact KV multiset read back from `output-part-*`. */
class MainSpec extends AnyFunSuite with SparkSpec {

  private def readOutputKVs(dir: java.io.File): Seq[(String, String)] =
    dir.listFiles().filter(_.getName.startsWith("output-part-")).toSeq
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
      .map { line =>
        val s = line.split("\t")
        assert(s.length == 2, s"malformed output line: $line")
        (s(0), s(1))
      }

  test("wordcount e2e over a temp dir of text files (driver_test.go:82-116)") {
    val tmp = Files.createTempDirectory("graft-main").toFile
    Files.writeString(tmp.toPath.resolve("test_input"),
      "the test input\nthe input test\nfoo bar baz")
    val outDir = tmp.toPath.resolve("out").toFile

    val conf = Main.parseArgs(Seq(
      "--job", "wordcount", "-o", outDir.toString, tmp.toPath.resolve("test_input").toString))
    val files = Main.run(spark, conf)

    assert(files.nonEmpty)
    assert(outDir.listFiles().exists(_.getName == "output-part-0"))
    val kvs = readOutputKVs(outDir)
    val expected = Set(
      "the" -> "2", "test" -> "2", "input" -> "2",
      "foo" -> "1", "bar" -> "1", "baz" -> "1")
    assert(kvs.length == 6)
    assert(kvs.toSet == expected)
  }

  test("multi-stage pipeline materializes job0 and chains into the final output") {
    val tmp = Files.createTempDirectory("graft-main-multi").toFile
    Files.writeString(tmp.toPath.resolve("in.txt"), "a b a\nb a b")
    val outDir = tmp.toPath.resolve("out").toFile

    val conf = Main.parseArgs(Seq(
      "--job", "wordcount,identity", "-o", outDir.toString,
      tmp.toPath.resolve("in.txt").toString))
    Main.run(spark, conf)

    // intermediate stage exists (reference driver.go:195-216 layout)
    assert(new java.io.File(outDir, "job0").exists())
    assert(readOutputKVs(outDir).toSet == Set("a" -> "3", "b" -> "3"))
  }

  test("parseArgs validates inputs, out, and job names") {
    intercept[IllegalArgumentException](Main.parseArgs(Seq("-o", "/tmp/x")))
    intercept[IllegalArgumentException](Main.parseArgs(Seq("in.txt")))
    intercept[IllegalArgumentException](
      Main.parseArgs(Seq("--job", "nope", "-o", "/tmp/x", "in.txt")))
    intercept[IllegalArgumentException](
      Main.parseArgs(Seq("--frobnicate", "-o", "/tmp/x", "in.txt")))
    val c = Main.parseArgs(Seq("--bins", "3", "-o", "/tmp/x", "a.txt", "b.txt"))
    assert(c.inputs == Seq("a.txt", "b.txt") && c.bins.contains(3))
  }
}
