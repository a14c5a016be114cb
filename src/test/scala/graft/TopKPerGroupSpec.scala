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

  test("handles k larger than group size and empty input") {
    val df = Seq((1L, 10.0), (1L, 20.0)).toDF("g", "v")
    val out = TopKPerGroup.topK(df, Seq("g"), Seq(("v", true)), 5).collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L))
    val empty = TopKPerGroup.topK(df.filter($"g" > 100), Seq("g"), Seq(("v", true)), 3)
    assert(empty.count() == 0)
  }
}
