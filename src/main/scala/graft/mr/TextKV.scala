package graft.mr

import org.apache.hadoop.fs.Path
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

  /** Read text files (globs/dirs/files, any Hadoop FS scheme) as KV
    * records. Paths are URIs: the filesystem is resolved per path from
    * its scheme, exactly as the reference infers local-vs-S3 backends
    * (`/root/reference/internal/pkg/corfs/filesys.go:51-65`). */
  def read(spark: SparkSession, paths: String*): Dataset[KV] = {
    import MapReduce.kvEncoder
    spark.read.textFile(paths: _*).map(splitInputRecord(_))(kvEncoder)
  }

  /** Read a TSV stage output back as KV (same decode — round-trips). */
  def readTsv(spark: SparkSession, path: String): Dataset[KV] = read(spark, path)

  /** Write KV as `key\tvalue` lines; one file per partition, matching
    * corral's one output file per reduce bin (`/root/reference/job.go:113`). */
  def writeTsv(ds: Dataset[KV], path: String): Unit =
    ds.select(concat_ws("\t", col("_1"), col("_2")).as("value"))
      .write.mode("overwrite").text(path)

  /** Write KV as the reference's user-facing output layout:
    * `output-part-<i>` files directly in `outDir`
    * (`/root/reference/job.go:110-117`'s per-bin naming). Spark writes
    * its own part files to a staging subdir; the rename to the
    * reference naming goes through the path's Hadoop FileSystem, so any
    * scheme (file:, s3a:, hdfs:) works unmodified. Returns the final
    * file paths. */
  def writeTsvNumbered(ds: Dataset[KV], outDir: String): Seq[String] = {
    val spark = ds.sparkSession
    val out = new Path(outDir)
    val staging = new Path(out, "_graft_staging")
    writeTsv(ds, staging.toString)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.globStatus(new Path(staging, "part-*")).sortBy(_.getPath.getName)
    val named = parts.zipWithIndex.map { case (st, i) =>
      val dst = new Path(out, s"output-part-$i")
      if (fs.exists(dst)) fs.delete(dst, false)
      // rename signals failure by returning false (e.g. cross-device or
      // object stores without atomic rename) — an output part must
      // never silently vanish
      if (!fs.rename(st.getPath, dst))
        throw new java.io.IOException(
          s"failed to rename ${st.getPath} to $dst")
      dst.toString
    }.toSeq
    fs.delete(staging, true)
    named
  }
}
