package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned parquet layout + partition pruning: the other half of
  * the 100 TB read path. A date-partitioned sink means a day-bounded
  * query opens only that day's files — the scan must show a
  * PartitionFilter and touch a strict subset of files. */
class PartitionedSinkSpec extends AnyFunSuite with SparkSpec {

  test("date-partitioned write prunes partitions at the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(out)

    val all = spark.read.parquet(out)
    val oneDay = all.filter(col("day") === "2024-01-05")

    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filter in:\n$plan")
    assert(oneDay.count() > 0)
    // the scan's runtime metric reports files actually opened post-pruning
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def findScan(p: SparkPlan): Option[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
      case f: FileSourceScanExec => Some(f)
      case other => other.children.view.flatMap(findScan).headOption
    }
    val scan = findScan(oneDay.queryExecution.executedPlan).get
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead < all.inputFiles.length,
      s"read $filesRead of ${all.inputFiles.length} files — pruning didn't engage")
    // the filter never reaches row-level evaluation: pruning is enough
    val dayCount = all.groupBy(col("day")).count()
      .filter(col("day") === "2024-01-05").head().getLong(1)
    assert(dayCount == oneDay.count())
  }
}
