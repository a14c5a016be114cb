package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the window row_number formulation exactly") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select($"user_id", $"event_id", $"value")
    val got = TopKPerGroup.topK(ev, Seq("user_id"),
        Seq(("value", true), ("event_id", false)), 3)
      .select($"user_id", $"event_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    val expected = ev.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"user_id", $"event_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("physical plan uses TopKPerGroupExec with a single hash exchange, no sort") {
    val ev = Tables.events(spark, TestSpark.sfDir).select($"user_id", $"event_id", $"value")
    val plan = TopKPerGroup.topK(ev, Seq("user_id"), Seq(("value", true)), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ["))
    assert(!plan.contains("WindowExec"))
    assert(!plan.toLowerCase.contains("sortexec"), plan)
  }

  test("empty groupCols = GLOBAL top-k: exactly k rows, ranks 1..k, two-phase") {
    // many input partitions so the old per-partition bug (k·numPartitions
    // rows with duplicate ranks) would be exposed
    val df = spark.range(0, 1000, 1, 16)
      .select($"id".as("v"), ($"id" % 7).as("g"))
    val got = TopKPerGroup.topK(df, Nil, Seq(("v", true)), 5)
      .select($"v", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    assert(got.toSeq == Seq((999L, 1L), (998L, 2L), (997L, 3L), (996L, 4L), (995L, 5L)))
  }

  test("SQL metrics report output rows and groups") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("g", "v")
    val out = TopKPerGroup.topK(df, Seq("g"), Seq(("v", true)), 1)
    assert(out.collect().length == 2) // collect: metrics accrue on THIS execution
    // AQE hides stages behind leaf wrappers; walk through them
    def findAll(p: SparkPlan): Seq[graft.plans.TopKPerGroupExec] = {
      val here = p match { case t: graft.plans.TopKPerGroupExec => Seq(t); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(findAll)
    }
    val root = out.queryExecution.executedPlan
    val exec = findAll(root)
    assert(exec.nonEmpty, root.toString)
    assert(exec.head.metrics.keySet == Set("numOutputRows", "numGroups"))
    assert(exec.head.metrics("numOutputRows").value == 2L)
    assert(exec.head.metrics("numGroups").value == 2L)
  }

  test("handles k larger than group size and empty input") {
    val df = Seq((1L, 10.0), (1L, 20.0)).toDF("g", "v")
    val out = TopKPerGroup.topK(df, Seq("g"), Seq(("v", true)), 5).collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L))
    val empty = TopKPerGroup.topK(df.filter($"g" > 100), Seq("g"), Seq(("v", true)), 3)
    assert(empty.count() == 0)
  }
}
