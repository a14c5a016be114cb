package graft.airbnb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source layer (SURVEY §2.1): csv.gz scans with the reference's
  * schema-on-read discipline — header row, every column string, no
  * inference — plus the tolerant-projection and rejects-quarantine behaviors.
  *
  * Scale: glob paths are expanded by the distributed file index;
  * gzip csv is non-splittable, so at 100 TB ingest parallelism = number of
  * feed files (the reference's layout: thousands of per-city files — fine);
  * the first thing the pipeline does is rewrite to columnar parquet.
  */
object Sources {

  /** S1+S2/S3 — glob scan of raw feeds, all-string (inferSchema=false as in
    * modules/data_analyzer.py:136-139). Comma-separated, gzip auto-detected.
    *
    * multiLine: review comments and listing descriptions routinely embed
    * newlines inside quoted fields — without it the parser splits such rows
    * into corrupt records. (It disables input splitting, but gzip feeds are
    * non-splittable anyway: parallelism = number of feed files either way.)
    * escape='"' = RFC-4180 doubled quotes, what the feeds (and DuckDB) use.
    */
  def readRawCsv(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.option("header", "true")
      .option("multiLine", "true").option("escape", "\"")
      .csv(pathGlob)

  /** S4 — pipe-delimited cleaned intermediates (modules/data_loader.py:133). */
  def readPipeCsv(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.option("header", "true").option("sep", "|")
      .option("multiLine", "true").option("escape", "\"")
      .csv(pathGlob)

  /** S7 — cleaned csv.gz sink: pipe-separated, gzip, no index column
    * (modules/data_cleaner.py:146). escape='"' writes RFC-4180 doubled
    * quotes so [[readPipeCsv]] and DuckDB read_csv re-read the sink exactly.
    */
  def writePipeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").option("sep", "|")
      .option("escape", "\"")
      .option("compression", "gzip").csv(path)

  /** (beyond ref) JSONL sink — one JSON object per line, gzip: the
    * interchange format LLM training corpora actually ship in. Spark's
    * writer emits canonical JSON escaping that DuckDB's `read_json`
    * (newline_delimited) re-reads exactly — the roundtrip is oracle-gated.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** (beyond ref) JSONL source with a pinned schema (schema-on-read like the
    * csv feeds — never inference over the full corpus at scale).
    */
  def readJsonl(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
                pathGlob: String): DataFrame =
    spark.read.schema(schema).json(pathGlob)

  /** P2 — tolerant projection: keep expected∩actual, backfill missing
    * expected columns with NULL (modules/data_cleaner.py:87-91 +
    * modules/data_loader.py:136-145).
    */
  def tolerantProject(df: DataFrame, expected: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(expected.map(c =>
      if (present(c)) col(c) else lit(null).cast("string").as(c)): _*)
  }

  /** S6 — rejects side-channel: rows failing `validity` are quarantined (the
    * reference appends failed rows to logs/listings_skipped_rows.csv,
    * modules/data_loader.py:203-228). Returns (valid, rejected).
    */
  def quarantine(df: DataFrame, validity: org.apache.spark.sql.Column)
      : (DataFrame, DataFrame) =
    (df.filter(validity), df.filter(!coalesce(validity, lit(false))))

  /** P9 — empty-file guard (modules/data_cleaner.py:138-142). */
  def nonEmpty(df: DataFrame): Boolean = !df.isEmpty
}
