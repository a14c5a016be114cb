package graft.airbnb

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet-backed warehouse replacing SQL Server (SURVEY §2.11, S9/S10):
  * tables are parquet directories under a root; facts are written partitioned
  * so date-dim joins get dynamic partition pruning; "truncate in FK order"
  * becomes overwrite order (facts before dims).
  */
final case class Warehouse(spark: SparkSession, root: String) {

  private def path(name: String) = s"$root/$name"

  /** Write-to-temp-then-swap: upserts read the current table while producing
    * its replacement, and Spark (correctly) refuses to overwrite a path it is
    * reading from — so materialize beside it, then atomically swap.
    */
  def write(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val tmp = path(name) + "__tmp"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp)
    val dest = new java.io.File(path(name))
    if (dest.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dest)
    if (!new java.io.File(tmp).renameTo(dest))
      throw new java.io.IOException(s"swap failed for $name")
  }

  def read(name: String): DataFrame = spark.read.parquet(path(name))

  def readOrEmpty(name: String, schema: StructType): DataFrame =
    if (exists(name)) read(name)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def exists(name: String): Boolean =
    new java.io.File(path(name)).exists()

  /** S10 — clear in FK order (facts → dims), like 00_prepare_tables.sql:5-10. */
  def truncateAll(): Unit =
    Seq("fact_calendar", "fact_reviews", "dim_listing_id_map", "dim_hosts",
        "dim_dates", "dim_listings")
      .foreach { t =>
        val d = new java.io.File(path(t))
        if (d.exists()) { org.apache.commons.io.FileUtils.deleteDirectory(d) }
      }

  /** Bucketed catalog table (SURVEY §4: bucketing co-locates repeated joins
    * on the same key — both sides pre-hashed into the same bucket layout join
    * with NO exchange). Requires the session catalog (bucketBy is
    * saveAsTable-only); use for hot join keys like listing_id.
    */
  def writeBucketed(name: String, df: DataFrame, bucketCols: Seq[String],
                    nBuckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a table dropped in a previous session leaves its managed location
    // behind; saveAsTable refuses to reuse it (LOCATION_ALREADY_EXISTS)
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet").saveAsTable(name)
  }

  /** S11 — SQL script runner (modules/data_loader.py:532-568): split on ';',
    * execute each statement, tolerate failures only on DROP statements.
    */
  def runScript(sqlText: String): Unit =
    sqlText.split(";").map(_.trim).filter(_.nonEmpty).foreach { stmt =>
      try spark.sql(stmt).collect()
      catch {
        case e: Exception if stmt.toUpperCase.startsWith("DROP") => // idempotent drops
        case e: Exception => throw e
      }
    }

  /** A6/F16 — the reference's post-load statistics
    * (modules/data_loader.py:570-578): table → row count.
    */
  def stats(): Map[String, Long] =
    Seq("dim_listings", "dim_listing_id_map", "dim_hosts", "dim_dates",
        "fact_calendar", "fact_reviews")
      .filter(exists).map(t => t -> read(t).count()).toMap
}
