package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history built from a change log: collapse
  * consecutive duplicate states per key, then derive each version's validity
  * interval. The standard warehouse companion to the reference's MERGE upsert
  * (SURVEY J7, sql/data/02_load_hosts.sql) — where J7 keeps only the latest
  * row per key, SCD2 keeps every distinct state with [valid_from, valid_to).
  *
  * Scale: two window passes over the same (key ordered-by time) partitioning
  * — one shuffle total, reused by both windows; no self-join, no global
  * window. Exactly the shape a 100 TB change log needs.
  */
object Scd2 {

  /** @param df        change log
    * @param keyCol    entity key (window partition — never global)
    * @param tsCol     event time
    * @param tieCol    deterministic tie-break within equal timestamps
    * @param stateCol  the tracked attribute
    * @return (key, state, valid_from, valid_to, is_current, tieCol): one row
    *         per state VERSION — consecutive identical states collapse into
    *         the earliest row; valid_to is the next version's valid_from
    *         (null for the open current version). The tie-break column rides
    *         along so callers have a total output order even when several
    *         versions share a timestamp.
    */
  def fromChangeLog(df: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val versions = df
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      // a version starts where the state differs from the previous row
      // (null-safe: the first row always starts a version)
      .filter(col("__prev").isNull || !(col("__prev") <=> col(stateCol)))
      .drop("__prev")
    versions
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(stateCol), col("valid_from"), col("valid_to"),
        col("is_current"), col(tieCol))
  }
}
