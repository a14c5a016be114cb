package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical scale discipline: physical plans of every registered query are
  * checked for patterns that degrade catastrophically at 100 TB.
  */
class PlanLintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String = {
    val q = SparkEntry.registry.find(_.name == name).get
    q.run(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
  }

  test("no query plans a CartesianProduct (unbroadcast cross join)") {
    SparkEntry.registry.foreach { q =>
      assert(!plan(q.name).contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
    }
  }

  test("dimension joins in the geo rollup are broadcast, not shuffled") {
    val p = plan("q_a2_geo_rollup")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("projection+range query prunes columns and pushes the filter") {
    val p = plan("q_p1_projection_range")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate filter did not reach the parquet scan")
    assert(!p.contains("l_comment") && !p.contains("l_suppkey"),
      "scan reads columns the query never uses")
  }

  test("top-k is TakeOrderedAndProject, not a global sort") {
    assert(plan("q_o2_topk").contains("TakeOrderedAndProject"))
  }
}
