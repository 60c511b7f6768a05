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

  test("amplab1 e2e: scan filter keeps pageRank > 50 (amplab1.go:15-33)") {
    val tmp = Files.createTempDirectory("graft-amplab1").toFile
    Files.writeString(tmp.toPath.resolve("rankings.csv"),
      "url1,55,3\nurl2,10,1\nurl3,80,9\nurl4,junk,2\nmalformed-line")
    val outDir = tmp.toPath.resolve("out").toFile
    Main.run(spark, Main.parseArgs(Seq("--job", "amplab1",
      "-o", outDir.toString, tmp.toPath.resolve("rankings.csv").toString)))
    assert(readOutputKVs(outDir).toSet == Set("url1" -> "55", "url3" -> "80"))
  }

  test("amplab2 e2e: 8-char source-IP prefix revenue sum (amplab2.go:22-43)") {
    val tmp = Files.createTempDirectory("graft-amplab2").toFile
    // 9-field uservisits rows; ip prefix "10.0.0.1" groups rows 1+3
    Files.writeString(tmp.toPath.resolve("visits.csv"), Seq(
      "10.0.0.11,url1,1999-05-01,1.5,a,b,c,d,e",
      "10.9.8.7,url2,1999-06-01,2.25,a,b,c,d,e",
      "10.0.0.12,url3,2001-01-01,0.25,a,b,c,d,e",
      "short,row").mkString("\n"))
    val outDir = tmp.toPath.resolve("out").toFile
    Main.run(spark, Main.parseArgs(Seq("--job", "amplab2",
      "-o", outDir.toString, tmp.toPath.resolve("visits.csv").toString)))
    assert(readOutputKVs(outDir).toSet == Set(
      "10.0.0.1" -> "1.750000", "10.9.8.7" -> "2.250000"))
  }

  test("amplab3 e2e: two-stage join + per-IP averages (amplab3.go:36-131)") {
    val tmp = Files.createTempDirectory("graft-amplab3").toFile
    Files.writeString(tmp.toPath.resolve("rankings.csv"),
      "url1,55,3\nurl2,30,1\nurl3,99,2")
    // visits: only pre-2000 rows join; ip1 hits url1 and url2
    Files.writeString(tmp.toPath.resolve("visits.csv"), Seq(
      "ip1,url1,1999-05-01,1.5,a,b,c,d,e",
      "ip1,url2,1999-06-01,2.5,a,b,c,d,e",
      "ip2,url3,1999-07-01,4.0,a,b,c,d,e",
      "ip3,url1,2001-01-01,9.9,a,b,c,d,e").mkString("\n"))
    val outDir = tmp.toPath.resolve("out").toFile
    Main.run(spark, Main.parseArgs(Seq("--job", "amplab3",
      "-o", outDir.toString,
      tmp.toPath.resolve("rankings.csv").toString,
      tmp.toPath.resolve("visits.csv").toString)))
    // stage-0 intermediate follows the reference's out/job<i> layout
    assert(new java.io.File(outDir, "job0").exists())
    // the value itself carries a tab ("%f\t%f") — read raw lines
    val lines = outDir.listFiles().filter(_.getName.startsWith("output-part-"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    val got = lines.map { l =>
      val f = l.split("\t"); assert(f.length == 3, s"bad line: $l"); (f(0), f(1), f(2))
    }.toSet
    assert(got == Set(
      ("ip1", "42.500000", "2.000000"), // ranks (55+30)/2, revs (1.5+2.5)/2
      ("ip2", "99.000000", "4.000000")))
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
