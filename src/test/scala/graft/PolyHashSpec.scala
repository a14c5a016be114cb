package graft

import graft.functions.TextFns
import graft.plans.PolyHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PolyHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native expression matches the higher-order-function form") {
    PolyHash.register(spark)
    val words = Seq("spark", "the quick brown fox", "a", "merge join sort", "x y z 123")
    val df = words.toDF("s")
      .withColumn("hof", TextFns.polyHash("s"))
      .withColumn("native", PolyHash.poly_hash($"s"))
    df.collect().foreach(r => assert(r.getLong(1) == r.getLong(2), r.getString(0)))
  }

  test("interpreted and codegen paths agree with the Scala reference") {
    PolyHash.register(spark)
    val samples = Seq("abc", "", "hello world", "Zz9 ~!")
    val df = samples.toDF("s").withColumn("h", PolyHash.poly_hash($"s"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach(s => assert(got(s) == PolyHash.hash(s), s))
    assert(PolyHash.hash("abc") == 304891L) // pinned: matches the DuckDB oracle form
  }

  test("GraftExtensions wires up and poly_hash is SQL-callable") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions()(exts) // builder wiring itself must not throw
    PolyHash.register(spark)
    assert(spark.sql("SELECT poly_hash('abc')").collect().head.getLong(0) == 304891L)
  }
}
