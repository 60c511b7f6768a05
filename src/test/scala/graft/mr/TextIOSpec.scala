package graft.mr

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Text-source semantics (reference F1 glob listing, F4 line
  * rectification, F5 KV decode): globs expand, lines decode with the
  * single-tab convention, TSV output round-trips. */
class TextIOSpec extends AnyFunSuite with SparkSpec {
  import MapReduce._

  private def writeFiles(dir: Path): Unit = {
    Files.writeString(dir.resolve("a.txt"), "k1\tv1\nplain line\n")
    Files.writeString(dir.resolve("b.txt"), "k2\tv2\n")
    Files.writeString(dir.resolve("c.dat"), "ignored\tby glob\n")
  }

  test("glob listing + tab-KV decode (corfs local.go:14-59, job.go:52-63)") {
    val dir = Files.createTempDirectory("graft-txt")
    writeFiles(dir)
    val kvs = TextKV.read(spark, s"$dir/*.txt").collect().toSet
    assert(kvs == Set(("k1", "v1"), ("", "plain line"), ("k2", "v2")))
  }

  test("malformed CSV rows drop silently (amplab1.go:23-26 skip-on-error)") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("r.csv"),
      "url1,51,1.5\nurl2,notanint,2.0\nurl3,99,0.1\nshort\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pageURL",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("pageRank",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("avgDuration",
        org.apache.spark.sql.types.DoubleType)))
    val df = spark.read.schema(schema).option("mode", "DROPMALFORMED")
      .csv(dir.toString)
      .filter(org.apache.spark.sql.functions.col("pageRank") > 50)
    val urls = df.select("pageURL").collect().map(_.getString(0)).toSet
    assert(urls == Set("url1", "url3"))
  }

  test("TSV write → read round-trips the KV convention (emitter.go:39-46)") {
    val s = spark
    val dir = Files.createTempDirectory("graft-tsv").resolve("out").toString
    val in = s.createDataset(Seq(("x", "1"), ("", "bare"), ("y", "2")))(kvEncoder)
    TextKV.writeTsv(in, dir)
    val back = TextKV.readTsv(s, dir).collect().toSet
    // ("", "bare") serializes as "\tbare"? concat_ws drops nothing; a
    // bare value round-trips as ("", "bare") via the one-tab rule
    assert(back == Set(("x", "1"), ("", "bare"), ("y", "2")))
  }
}
