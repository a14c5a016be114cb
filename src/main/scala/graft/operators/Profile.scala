package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EDA profiling (SURVEY A8/P7): the reference's pandas profile —
  * `isnull().sum()`, missing %, `duplicated().sum()`, per-column describe
  * (/root/reference/modules/data_analyzer.py:109-125) — as one distributed
  * aggregation pass (no per-column jobs, no driver-side loops).
  */
object Profile {

  /** Backtick-quoted identifier reference — spaces, dots, keywords and
    * embedded backticks in a column name all survive generated SQL.
    */
  private def qi(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Spark-SQL string literal — backslash escaping, NOT SQL-standard quote
    * doubling: Spark's parser concatenates adjacent string literals, so
    * 'o''hare' would silently become 'ohare'.
    */
  private def ql(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Long-format profile: one row per column with count/nulls/distinct and
    * min/max rendered as strings (schema-stable across column types).
    */
  def profile(df: DataFrame): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(col(qi(c))).as(s"${c}__nonnull"),
        countDistinct(col(qi(c))).as(s"${c}__distinct"),
        min(col(qi(c))).cast("string").as(s"${c}__min"),
        max(col(qi(c))).cast("string").as(s"${c}__max"))
    }
    val total = df.agg(count(lit(1)).as("__n"), aggs.toSeq: _*)
    val stacked = df.columns.map { c =>
      s"${ql(c)}, __n - ${qi(c + "__nonnull")}, ${qi(c + "__distinct")}, " +
        s"${qi(c + "__min")}, ${qi(c + "__max")}"
    }.mkString(", ")
    total.selectExpr("__n as n_rows",
        s"stack(${df.columns.length}, $stacked) as (column, n_nulls, n_distinct, min_value, max_value)")
      .select(col("column"), col("n_rows"), col("n_nulls"),
              (col("n_nulls").cast("double") / col("n_rows")).as("null_ratio"),
              col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** pandas `describe()` for numeric columns (modules/data_analyzer.py:109-125,
    * utils/utility.py:179-194): count / mean / std / min / 25% / 50% / 75% /
    * max, one row per column, ONE aggregation pass over the data.
    *
    * mean and (sample, ddof=1) std aggregate decimal-exact sums — order-
    * independent and engine-portable — with only the final divide/sqrt in
    * double; quartiles use percentile_approx (a t-digest-style mergeable
    * sketch: one pass, no per-column sort, the 100 TB path).
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val aggs = cols.flatMap { c =>
      val src = col(qi(c))
      val d = src.cast(DoubleType)
      val n = count(src)
      val sm = sum(src.cast(DecimalType(25, 4))).cast(DoubleType)
      val sq = sum(src.cast(DecimalType(18, 4)) * src.cast(DecimalType(18, 4)))
        .cast(DoubleType)
      Seq(
        n.cast("double").as(s"${c}__n"),
        (sm / n).as(s"${c}__mean"),
        sqrt((sq - sm * sm / n) / (n - lit(1))).as(s"${c}__std"),
        min(d).as(s"${c}__min"),
        percentile_approx(d, lit(0.25), lit(10000)).as(s"${c}__q25"),
        percentile_approx(d, lit(0.5), lit(10000)).as(s"${c}__q50"),
        percentile_approx(d, lit(0.75), lit(10000)).as(s"${c}__q75"),
        max(d).as(s"${c}__max"))
    }
    val total = df.agg(aggs.head, aggs.tail: _*)
    // quote generated refs and the label so non-identifier column names
    // (spaces, dots, keywords, quotes, backticks) survive the stack() SQL
    val stacked = cols.map { c =>
      val fields = Seq("n", "mean", "std", "min", "q25", "q50", "q75", "max")
        .map(f => qi(s"${c}__$f")).mkString(", ")
      s"${ql(c)}, $fields"
    }.mkString(", ")
    total.selectExpr(
      s"stack(${cols.length}, $stacked) as " +
        "(column, n_nonnull, mean, std, min_value, q25, median, q75, max_value)")
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
