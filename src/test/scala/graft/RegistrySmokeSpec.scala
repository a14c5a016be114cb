package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and the driver contract holds.
  * (Value-level correctness is the DuckDB oracle gate — tools/compare.py.)
  */
class RegistrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracles exist for the declared set") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.run(spark, TestSpark.sfDir).count()
      assert(n >= 0)
    }
  }
}
