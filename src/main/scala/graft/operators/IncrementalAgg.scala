package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental aggregate maintenance (materialized-rollup upkeep): keep a
  * small table of per-group PARTIAL aggregates, fold each new ingest batch
  * in by merging partials, and never rescan history. count/sum/min/max are
  * the classic self-mergeable states (sum carried as exact DECIMAL so the
  * merge is order- and batching-independent — the same discipline the
  * oracle arithmetic uses everywhere else); avg is derived at read time.
  *
  * The reference's nearest analogue is the nightly full-table view rebuild
  * (sql/marts/10_build_marts.sql) — this operator is what that becomes
  * when history no longer fits a rescan: merge(partials(A), partials(B)) =
  * partials(A ∪ B) exactly, so daily batches compose associatively.
  *
  * Scale: one map-side-combining groupBy per batch over the batch only;
  * the merge shuffles group-cardinality rows, never data rows.
  */
object IncrementalAgg {

  /** Per-group partial state of `valueCol`: (groups..., n, sum_dec, mn, mx). */
  def partials(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol).cast(DecimalType(25, 4))).as("sum_dec"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))

  /** Merge two partial-state tables with the same group columns. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_dec")).cast(DecimalType(25, 4)).as("sum_dec"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Read-time finalization: exact DECIMAL sum surfaced as DOUBLE plus the
    * derived average (order-independent, so oracle hash-exact).
    */
  def finalize(partials: DataFrame): DataFrame =
    partials
      .withColumn("sum_v", col("sum_dec").cast(DoubleType))
      // double division of the exact sum (not decimal division): matches
      // the oracle's davg discipline bit-for-bit across engines
      .withColumn("avg_v", col("sum_dec").cast(DoubleType) / col("n"))
      .drop("sum_dec")
}
