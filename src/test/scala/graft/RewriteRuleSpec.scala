package graft

import graft.plans.{RewriteRowNumberTopK, TopKPerGroup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RewriteRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    TopKPerGroup.register(spark)
    val prev = s.experimental.extraOptimizations
    s.experimental.extraOptimizations = prev :+ RewriteRowNumberTopK
    try f finally s.experimental.extraOptimizations = prev
  }

  test("row_number<=k filter is rewritten to TopKPerGroup and results match") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select($"user_id", $"event_id", $"value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    def q = ev.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)

    val baseline = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val (plan, rewritten) = withRule {
      val df = q
      (df.queryExecution.executedPlan.toString,
       df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet)
    }
    assert(plan.contains("TopKPerGroup ["), plan)
    assert(!plan.contains("WindowExec"), plan)
    assert(rewritten == baseline)
  }

  test("rn = 1 dedup idiom is rewritten too") {
    val ev = Tables.events(spark, TestSpark.sfDir).select($"user_id", $"ts", $"event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    def q = ev.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val baseline = q.drop("rn").collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val (plan, rewritten) = withRule {
      (q.queryExecution.executedPlan.toString,
       q.drop("rn").collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    }
    assert(plan.contains("TopKPerGroup ["), plan)
    assert(rewritten == baseline)
  }

  test("reversed and long-literal spellings of the filter are recognized") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select($"user_id", $"event_id", $"value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    // rn <= 2L inserts a cast on rn; 2 >= rn reverses the comparison
    def qLong = ev.withColumn("rn", row_number().over(w)).filter($"rn" <= 2L)
    def qRev = ev.withColumn("rn", row_number().over(w)).filter(lit(2) >= $"rn")
    def qEqRev = ev.withColumn("rn", row_number().over(w)).filter(lit(1) === $"rn")
    withRule {
      for (q <- Seq(qLong, qRev, qEqRev)) {
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains("TopKPerGroup ["), plan)
      }
      assert(qLong.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        qRev.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
  }

  test("GLOBAL row_number (empty partition by) rewrites to two-phase top-k") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select($"user_id", $"event_id", $"value")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"value".desc, $"event_id")
    def q = ev.withColumn("rn", row_number().over(w)).filter($"rn" <= 4)
    val baseline = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val (plan, rewritten) = withRule {
      (q.queryExecution.executedPlan.toString,
       q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet)
    }
    assert(plan.contains("TopKPerGroup ["), plan)
    // exactly k rows with unique ranks 1..k — NOT k·numPartitions rows
    assert(rewritten.size == 4, rewritten.toString)
    assert(rewritten.map(_._3) == baseline.map(_._3))
    assert(rewritten == baseline)
  }

  test("windows other than row_number are left alone") {
    val ev = Tables.events(spark, TestSpark.sfDir).select($"user_id", $"value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"value")
    def q = ev.withColumn("s", sum($"value").over(w)).filter($"s" > 0)
    val plan = withRule { q.queryExecution.executedPlan.toString }
    assert(!plan.contains("TopKPerGroup ["), plan)
  }
}
