package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's source layer (SURVEY §2.1 S1–S5): the reference
  * globs csv.gz feeds (/root/reference/modules/data_analyzer.py:57-74) and
  * reads them schema-on-read; here the fixtures are parquet so the scan is a
  * columnar vectorized read with filter pushdown + column pruning for free.
  *
  * Scale note: a plain `spark.read.parquet(dir)` is already the right shape
  * for 100 TB — file listing and row-group pruning are distributed; nothing
  * here collects to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot read natively
    * (PARQUET_TYPE_ILLEGAL). Read nanos as long and truncate to micros —
    * exactly what DuckDB does when casting ns → TIMESTAMP — then expose as
    * TIMESTAMP_NTZ so it behaves like the other fixture timestamps.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
}
