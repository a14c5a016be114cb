package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, TimestampNTZType}
import org.apache.spark.sql.functions._

/** Pins the post-load shape of the fixture tables — in particular that
  * `events.ts` is TIMESTAMP_NTZ no matter which physical parquet type the
  * driver generated (the fixture has shipped as both TIMESTAMP(NANOS) and
  * timestamp[us] across rounds; round 9 broke on the flip).
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("events.ts loads as TIMESTAMP_NTZ regardless of parquet physical type") {
    val ev = Tables.events(spark, TestSpark.sfDir)
    assert(ev.schema("ts").dataType == TimestampNTZType,
      s"ts loaded as ${ev.schema("ts").dataType}, expected TIMESTAMP_NTZ")
    // And the values are usable: non-null, within a sane epoch range.
    val row = ev.agg(
      count(when(col("ts").isNull, 1)).as("nulls"),
      min(year(col("ts"))).as("ymin"),
      max(year(col("ts"))).as("ymax")).head()
    assert(row.getLong(0) == 0L, "ts must be fully non-null")
    assert(row.getInt(1) >= 1990 && row.getInt(2) <= 2100,
      s"ts years out of range: ${row.getInt(1)}..${row.getInt(2)}")
  }

  test("nanos-as-long fixture branch truncates to micros") {
    // Synthesize the legacy shape: a long column named ts interpreted as
    // nanos. The branch in Tables.events keys off LongType — verify the
    // same expression it uses truncates nanos → micros exactly.
    import spark.implicits._
    val df = Seq(1700000000123456789L).toDF("ts")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val micros = df.select(unix_micros(col("ts").cast("timestamp"))).head().getLong(0)
    assert(micros == 1700000000123456L)
  }

  test("all fixture tables load and are non-empty at sf0.001") {
    Tables.names.foreach { n =>
      val df = Tables.load(spark, TestSpark.sfDir, n)
      assert(df.limit(1).count() == 1L, s"table $n is empty")
    }
  }
}
