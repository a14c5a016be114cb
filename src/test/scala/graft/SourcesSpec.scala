package graft

import graft.airbnb.Sources
import graft.operators.Aggregators
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jsonl sink/source round-trips hostile content byte-exact") {
    // quotes, backslashes, embedded newlines/tabs, non-ASCII, emoji, empty
    // and null — everything a real web corpus throws at a JSONL writer
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/out"
    val rows = Seq(
      (1L, "plain ascii"),
      (2L, "he said \"quote\" and used a \\ backslash"),
      (3L, "line one\nline two\ttabbed"),
      (4L, "Cécile in Zürich — naïve façade é́"),
      (5L, "emoji 😀 and CJK 中文"),
      (6L, ""),
      (7L, null))
    val df = rows.toDF("id", "t")
    graft.airbnb.Sources.writeJsonl(df, dir)
    val back = graft.airbnb.Sources.readJsonl(spark, df.schema, dir + "/*.json.gz")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
    assert(back.toSeq == rows.sortBy(_._1))
  }

  test("pipe-separated gz sink/scan round-trips (S4/S7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe").toString + "/out"
    val df = Seq(("1", "a|b was escaped? no — use clean values", "x"),
                 ("2", "plain", "y")).toDF("id", "t", "u")
      .select($"id", regexp_replace($"t", "\\|", "/").as("t"), $"u")
    Sources.writePipeCsv(df, dir)
    val back = Sources.readPipeCsv(spark, dir)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("id", "t", "u"))
    // gzip actually applied
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".csv.gz")))
  }

  test("tolerant projection keeps intersection and backfills missing (P2)") {
    val df = Seq(("1", "x")).toDF("id", "extra")
    val out = Sources.tolerantProject(df, Seq("id", "missing_col"))
    assert(out.columns.toSeq == Seq("id", "missing_col"))
    assert(out.collect().head.isNullAt(1))
  }

  test("quarantine splits valid rows from rejects incl. null predicates (S6)") {
    val df = Seq("1", "2", "oops", null).toDF("id")
    val (ok, bad) = Sources.quarantine(df, $"id".try_cast("long").isNotNull)
    assert(ok.count() == 2)
    assert(bad.count() == 2) // 'oops' and null both quarantined
  }

  test("availability histogram aggregator matches a groupBy count") {
    val days = Seq(0L, 7L, 7L, 3L, 3L, 3L, 9L, -1L).toDS() // out-of-range clamped
    val hist = days.select(Aggregators.AvailabilityHistogram.toColumn).collect().head
    assert(hist(0) == 2) // 0 and clamped -1
    assert(hist(3) == 3)
    assert(hist(7) == 3) // two 7s and clamped 9
    assert(hist.sum == 8)
  }

  test("price stats aggregator computes min/max/avg in one pass") {
    val ps = Seq(10.0, 20.0, 30.0).toDS()
      .select(Aggregators.PriceStatsAgg.toColumn).collect().head
    assert(ps.n == 3 && ps.min == 10.0 && ps.max == 30.0 && math.abs(ps.avg - 20.0) < 1e-12)
  }
}
