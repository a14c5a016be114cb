package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of a table — the CDC export a
  * warehouse emits for downstream consumers after each load (the reference
  * reloads in place and has no changelog; any subscriber must re-read the
  * world — this is the operator that fixes that).
  *
  * `change` ∈ insert (key only in new), delete (key only in old), update
  * (key in both, any non-key column differs under null-safe comparison).
  * Unchanged keys produce no row.
  *
  * Scale: ONE full-outer shuffle on the key columns; the column comparison
  * is a map-side null-safe (`<=>`) conjunction, no hashing of row content
  * and no second pass. At 100 TB both snapshots are bucketed on the key so
  * the join is exchange-free.
  */
object TableDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshots disagree on columns: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val valCols = oldDf.columns.filterNot(keyCols.contains).toSeq
    // presence markers distinguish an absent side from a row of data nulls
    val o = oldDf.select(keyCols.map(col) ++ valCols.map(c => col(c).as("o_" + c)): _*)
      .withColumn("__o", lit(1))
    val n = newDf.select(keyCols.map(col) ++ valCols.map(c => col(c).as("n_" + c)): _*)
      .withColumn("__n", lit(1))
    val changed = valCols.map(c => !(col("o_" + c) <=> col("n_" + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("__o").isNull, "insert")
          .when(col("__n").isNull, "delete")
          .when(changed, "update"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
