package graft

import graft.airbnb.Warehouse
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("co-bucketed tables join with zero exchanges") {
    val wh = Warehouse(spark, java.nio.file.Files.createTempDirectory("wh").toString)
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
    wh.writeBucketed("b_lineitem", li, Seq("l_orderkey"), 4)
    wh.writeBucketed("b_orders",
      o.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
