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

  test("dedup/LSH family never plans an all-pairs join (the 100 TB claim)") {
    // candidate pairs must come from shared shingles/bands/buckets — a
    // nested-loop join anywhere in these plans means the bound is gone
    Seq("q_dedup_exact", "q_dedup_ngram_jaccard", "q_dedup_minhash_lsh",
        "q_dedup_simhash", "q_dedup_embedding", "q_ann_lsh_topk")
      .foreach { name =>
        val p = plan(name)
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"$name plans an all-pairs join")
      }
  }

  test("no ETL loader plans a single-partition global window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def emptyPartWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
    val staging = Seq(("101", "x"), ("abc-7", "y")).toDF("id", "junk")
    val existing = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.airbnb.Schemas.dimListingIdMap)
    // the id-map loader was THE scale-killer (VERDICT r1 #2): its id
    // assignment must not be a Window with no partitioning
    assert(emptyPartWindows(graft.airbnb.Loaders.appendIdMap(staging, existing)).isEmpty)
    val listings = Seq((1L, "h", "c", "co", java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
      .toDF("host_id", "host_name", "host_city", "host_country", "updated_date")
    assert(emptyPartWindows(graft.airbnb.Loaders.loadHosts(listings)).isEmpty)
  }
}
