package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Scan.widen]] — the r20 scale-adaptive parallelism floor for
  * kernel inputs over single-row-group fixture scans. Pins the three
  * contract points an optimization must not drift on: rows are
  * IDENTICAL through the widen (it is a pure repartition), the floor
  * actually widens a narrow input to the session parallelism, and it
  * is a no-op both on already-wide inputs (the production case) and
  * under the `off` A/B conf. */
class ScanSpec extends AnyFunSuite with SparkSpec {

  private def docs = graft.Tables.documents(spark, sf0001)

  test("widen floors a narrow scan at the session default parallelism") {
    val p = spark.sparkContext.defaultParallelism
    val narrow = docs.select(col("doc_id"))
    assert(narrow.rdd.getNumPartitions < p) // single-row-group fixture
    val wide = Scan.widen(narrow, col("doc_id"))
    assert(wide.rdd.getNumPartitions == p)
  }

  test("widen preserves the exact row multiset") {
    val base = docs.select(col("doc_id"), col("text"))
    val wide = Scan.widen(base, col("doc_id"))
    assert(wide.count() == base.count())
    assert(wide.exceptAll(base).isEmpty && base.exceptAll(wide).isEmpty)
  }

  test("widen is a no-op on an input at or above the parallelism floor") {
    val p = spark.sparkContext.defaultParallelism
    val already = docs.select(col("doc_id")).repartition(p + 2, col("doc_id"))
    val out = Scan.widen(already, col("doc_id"))
    assert(out.rdd.getNumPartitions == p + 2) // unchanged, no extra exchange
  }

  test("the off conf disables the floor (A/B measurement seam)") {
    spark.conf.set(Scan.WidenConfKey, "off")
    try {
      val narrow = docs.select(col("doc_id"))
      val out = Scan.widen(narrow, col("doc_id"))
      assert(out.rdd.getNumPartitions == narrow.rdd.getNumPartitions)
    } finally spark.conf.unset(Scan.WidenConfKey)
  }
}
