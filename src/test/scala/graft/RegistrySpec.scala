package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and returns rows; contract
  * invariants of the SparkEntry maps. */
class RegistrySpec extends AnyFunSuite with SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key is a query key") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("bench names are query keys") {
    assert(SparkEntry.benchQueries.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  test("approx_count_distinct tracks the exact distinct count within 5%") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf0001)
    val row = li.agg(
      count_distinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  Registry.defs.foreach { d =>
    test(s"${d.name} runs and returns rows") {
      val n = d.run(spark, sf0001).count()
      assert(n > 0, s"${d.name} returned 0 rows")
    }
  }
}
