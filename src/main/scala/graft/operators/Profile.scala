package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EDA profiling (SURVEY A8/P7): the reference's pandas profile —
  * `isnull().sum()`, missing %, `duplicated().sum()`, per-column describe
  * (/root/reference/modules/data_analyzer.py:109-125) — as one distributed
  * aggregation pass (no per-column jobs, no driver-side loops).
  */
object Profile {

  /** Long-format profile: one row per column with count/nulls/distinct and
    * min/max rendered as strings (schema-stable across column types).
    */
  def profile(df: DataFrame): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val total = df.agg(count(lit(1)).as("__n"), aggs.toSeq: _*)
    val stacked = df.columns.map { c =>
      s"'$c', __n - ${c}__nonnull, ${c}__distinct, ${c}__min, ${c}__max"
    }.mkString(", ")
    total.selectExpr("__n as n_rows",
        s"stack(${df.columns.length}, $stacked) as (column, n_nulls, n_distinct, min_value, max_value)")
      .select(col("column"), col("n_rows"), col("n_nulls"),
              (col("n_nulls").cast("double") / col("n_rows")).as("null_ratio"),
              col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** P7 — columns whose null ratio exceeds `threshold` (the reference's
    * drop-recommendation rule, modules/data_analyzer.py:196-207).
    */
  def highNullColumns(df: DataFrame, threshold: Double = 0.5): Seq[String] =
    profile(df).filter(col("null_ratio") > threshold)
      .select("column").collect().map(_.getString(0)).toSeq

  /** Duplicate full-row count (pandas `duplicated().sum()`). */
  def duplicateRowCount(df: DataFrame): Long =
    df.count() - df.dropDuplicates().count()
}
