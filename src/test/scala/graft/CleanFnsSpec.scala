package graft

import graft.functions.CleanFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CleanFnsSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("F1 price clean strips $, commas, CR and casts to DECIMAL(10,2)") {
    val df = Seq("$1,234.00", "  $99.50 ", "1\r,000", "bad").toDF("p")
      .select(CleanFns.priceClean($"p").cast("string").as("v"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("1234.00", "99.50", "1000.00", null))
  }

  test("F3 week truncation: Monday start, Sunday end (SQL Server parity)") {
    // 2024-01-01 is a Monday; edge dates near year boundaries
    val df = Seq("2024-01-01", "2024-01-07", "2023-12-31", "2025-03-05").toDF("d")
      .select(CleanFns.weekStart($"d".cast("date")).cast("string").as("ws"),
              CleanFns.weekEnd($"d".cast("date")).cast("string").as("we"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("2024-01-01", "2024-01-07"),
      ("2024-01-01", "2024-01-07"),
      ("2023-12-25", "2023-12-31"),
      ("2025-03-03", "2025-03-09")))
  }

  test("F4 is_weekend marks exactly Sat/Sun") {
    val df = Seq("2024-01-05", "2024-01-06", "2024-01-07", "2024-01-08").toDF("d")
    val parts = CleanFns.dateParts($"d".cast("date")).toMap
    val got = df.select(parts("is_weekend").as("w")).collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(false, true, true, false))
  }

  test("F5 boolean normalization truth table") {
    val df = Seq("t", " True ", "1", "y", "YES", "f", "false", "0", "n", "No", "maybe")
      .toDF("b").select(CleanFns.normBool($"b").as("v"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    assert(got == Seq(Some(true), Some(true), Some(true), Some(true), Some(true),
      Some(false), Some(false), Some(false), Some(false), Some(false), None))
  }

  test("F6 id split parts recompose the prefix (sampled property)") {
    val raws = (0 until 50).map(_ =>
      math.abs(rnd.nextLong() % 1000000000000L).toString.reverse.padTo(18, '0').reverse.mkString)
    val df = raws.toDF("r")
    val parts = CleanFns.idParts($"r").toMap
    val rows = df.select($"r", parts("part1"), parts("part2"), parts("part3")).collect()
    rows.foreach(r =>
      assert(r.getString(1) + r.getString(2) + r.getString(3) == r.getString(0)))
  }

  test("F8 numeric-string normalize round-trips longs with commas and .0 (sampled)") {
    val vals = (0 until 50).map(_ => math.abs(rnd.nextInt()).toLong)
    val df = vals.map(v => (v, f"$v%,d.0")).toDF("v", "s")
      .select($"v", CleanFns.sanitizeNumStr($"s").try_cast("long").as("c"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("F10 location parse: two-part, one-part, messy spacing") {
    val df = Seq("San Francisco, United States", "France", "A, B, C", " X ,  Y ")
      .toDF("loc")
      .select(CleanFns.locationCity($"loc").as("city"),
              CleanFns.locationCountry($"loc").as("country"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("San Francisco", "United States"),
      ("Unknown", "France"),
      ("A, B", "C"),
      ("X", "Y")))
  }

  test("F12/F13 normalize + is_local") {
    val df = Seq(("CA", "United States"), ("United States", "United States"),
                 ("France", "United States")).toDF("host", "prop")
      .select(CleanFns.isLocal(
        CleanFns.normalizeIn($"host", Seq("CA", "NY", "TX"), "United States"),
        $"prop").as("local"))
    assert(df.collect().map(_.getBoolean(0)).toSeq == Seq(true, true, false))
  }
}
