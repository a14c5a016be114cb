package graft.airbnb

import graft.functions.CleanFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cleaning stage (SURVEY §3.1 step 2 / modules/data_cleaner.py:67-161):
  * prune to the kept columns, derive host geo from `host_location` and
  * property geo from the *filename*, then drop the parsed sources.
  *
  * Runs distributed: filename geography uses `input_file_name()` so a single
  * cleaned DataFrame can span thousands of per-city feed files — no
  * per-file driver loop like the reference.
  */
object Cleaner {

  /** F11 — geography from `Country_City_listings_date.csv.gz`.
    *
    * Faithful to the code as written (data_cleaner.py:24-46): it splits the
    * basename on '_' and takes parts[0] as country, parts[1] as city when
    * there are >= 4 parts — so "United_States_Hawaii_listings_x.csv.gz"
    * yields country "United", city "States" (the docstring claims otherwise;
    * the code wins). < 4 parts → Unknown/Unknown.
    */
  def filenameGeo(df: DataFrame): DataFrame = {
    val base = element_at(split(input_file_name(), "/"), -1)
    val noExt = regexp_replace(base, "\\.csv\\.gz$", "")
    val parts = split(noExt, "_")
    val ok = size(parts) >= 4
    df.withColumn("property_country",
        when(ok, element_at(parts, 1)).otherwise("Unknown"))
      .withColumn("property_city",
        when(ok, element_at(parts, 2)).otherwise("Unknown"))
  }

  /** Listings: prune (P1) → host_location parse (F10) → filename geo (F11)
    * → neighbourhood default → drop parsed sources (P3).
    */
  def cleanListings(raw: DataFrame): DataFrame = {
    val projected = Sources.tolerantProject(raw, Schemas.keptColumns("listings"))
    // blank = whitespace-only of ANY kind (wsTrim): a tab-padded
    // host_location must yield Unknown like Python strip(), not a tab city
    val blank = col("host_location").isNull ||
      CleanFns.wsTrim(col("host_location")) === ""
    val withHostGeo = projected
      .withColumn("host_city",
        when(blank, "Unknown")
          .otherwise(CleanFns.locationCity(col("host_location"))))
      .withColumn("host_country",
        when(blank, "Unknown")
          .otherwise(CleanFns.locationCountry(col("host_location"))))
    filenameGeo(withHostGeo)
      .withColumn("property_neighbourhood",
        coalesce(col("neighbourhood_cleansed"), lit("Unknown")))
      .drop("host_location", "neighbourhood_cleansed")
      .select(Schemas.cleanedListingsColumns.map(col): _*)
  }

  def cleanReviews(raw: DataFrame): DataFrame =
    Sources.tolerantProject(raw, Schemas.keptColumns("reviews"))

  def cleanCalendar(raw: DataFrame): DataFrame =
    Sources.tolerantProject(raw, Schemas.keptColumns("calendar"))
}
