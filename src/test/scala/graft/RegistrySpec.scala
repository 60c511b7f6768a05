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

  Registry.defs.foreach { d =>
    test(s"${d.name} runs and returns rows") {
      val n = d.run(spark, sf0001).count()
      assert(n > 0, s"${d.name} returned 0 rows")
    }
  }
}
