package graft.operators

import graft.functions.CleanFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** dim_dates generator (SURVEY §7.2 step 4). The reference builds the date
  * dimension row-by-row in Python (modules/data_loader.py:484-522); here it
  * is `sequence` + `explode` — the engine's one generator — with the F4
  * date-part family and a deterministic surrogate key.
  *
  * The single-partition window for date_id is fine at any scale: a date
  * dimension is bounded (~36k rows per century), never fact-sized.
  */
object DatesDim {

  /** Dates spanning [min(dateCol), max(dateCol)] of `src`. */
  def fromSpan(src: DataFrame, dateCol: String): DataFrame =
    build(src.agg(
      min(col(dateCol).cast(DateType)).as("lo"),
      max(col(dateCol).cast(DateType)).as("hi")))

  private def build(span: DataFrame): DataFrame = {
    val days = span.select(explode(sequence(col("lo"), col("hi"))).as("full_date"))
    val w = Window.orderBy(col("full_date"))
    CleanFns.dateParts(col("full_date"))
      .foldLeft(days.withColumn("date_id", row_number().over(w).cast(LongType))) {
        case (df, (n, c)) => df.withColumn(n, c)
      }
  }
}
