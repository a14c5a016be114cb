package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = (0 until 300)
    .map(i => (s"g${i % 5}", (i % 23) + 0.25)).toDF("grp", "v")

  test("merge(partials(A), partials(B)) equals partials(A u B) exactly") {
    val a = rows.filter(col("v") < 11)
    val b = rows.filter(col("v") >= 11)
    val merged = IncrementalAgg.merge(
        IncrementalAgg.partials(a, Seq("grp"), "v"),
        IncrementalAgg.partials(b, Seq("grp"), "v"), Seq("grp"))
      .orderBy("grp").collect().toSeq
    val whole = IncrementalAgg.partials(rows, Seq("grp"), "v")
      .orderBy("grp").collect().toSeq
    assert(merged == whole)
  }

  test("merge is associative across batching orders") {
    val slices = (0 until 3).map(k => rows.filter(col("v") % 3 === k))
      .map(IncrementalAgg.partials(_, Seq("grp"), "v"))
    val leftFold = IncrementalAgg.merge(
      IncrementalAgg.merge(slices(0), slices(1), Seq("grp")), slices(2), Seq("grp"))
    val rightFold = IncrementalAgg.merge(
      slices(0), IncrementalAgg.merge(slices(1), slices(2), Seq("grp")), Seq("grp"))
    assert(leftFold.orderBy("grp").collect().toSeq ==
      rightFold.orderBy("grp").collect().toSeq)
  }

  test("finalize derives sum and average from the exact decimal state") {
    val one = Seq(("g", 1.5), ("g", 2.5)).toDF("grp", "v")
    val out = IncrementalAgg.finalize(
        IncrementalAgg.partials(one, Seq("grp"), "v"))
      .select("grp", "n", "mn", "mx", "sum_v", "avg_v").collect()(0)
    assert(out.getLong(1) == 2L && out.getDouble(2) == 1.5 &&
      out.getDouble(3) == 2.5 && out.getDouble(4) == 4.0 &&
      out.getDouble(5) == 2.0)
  }

  test("a group present in only one batch merges through unchanged") {
    val a = Seq(("only_a", 1.0)).toDF("grp", "v")
    val b = Seq(("only_b", 2.0)).toDF("grp", "v")
    val m = IncrementalAgg.merge(
        IncrementalAgg.partials(a, Seq("grp"), "v"),
        IncrementalAgg.partials(b, Seq("grp"), "v"), Seq("grp"))
      .orderBy("grp").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(m.toSeq == Seq(("only_a", 1L), ("only_b", 1L)))
  }
}
