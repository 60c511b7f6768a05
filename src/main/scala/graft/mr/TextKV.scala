package graft.mr

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Line-oriented KV text I/O with the reference's wire conventions.
  *
  *  - input decode (`splitInputRecord`, `/root/reference/job.go:52-63`):
  *    a line with exactly one tab is `key\tvalue`; anything else is a
  *    value with empty key;
  *  - output encode (TSV `key\tvalue\n`,
  *    `/root/reference/emitter.go:39-46`), which is what lets stage N+1
  *    re-read stage N's output (`/root/reference/driver.go:212`).
  *
  * Byte-range splitting, line rectification at split boundaries, and
  * glob listing (reference F1/F2/F4) are Hadoop TextInputFormat
  * behaviors that `spark.read.text` provides natively.
  */
object TextKV {
  import MapReduce._

  def splitInputRecord(line: String): KV = {
    val parts = line.split("\t", -1)
    if (parts.length == 2) (parts(0), parts(1)) else ("", line)
  }

  /** Read text files (glob/dir/file) as KV records. */
  def read(spark: SparkSession, path: String): Dataset[KV] = {
    import MapReduce.kvEncoder
    spark.read.textFile(path).map(splitInputRecord(_))(kvEncoder)
  }

  /** Read a TSV stage output back as KV (same decode — round-trips). */
  def readTsv(spark: SparkSession, path: String): Dataset[KV] = read(spark, path)

  /** Write KV as `key\tvalue` lines; one file per partition, matching
    * corral's one output file per reduce bin (`/root/reference/job.go:113`). */
  def writeTsv(ds: Dataset[KV], path: String): Unit =
    ds.select(concat_ws("\t", col("_1"), col("_2")).as("value"))
      .write.mode("overwrite").text(path)
}
