package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Z-order (Morton-curve) clustering for multi-dimensional data-skipping:
  * interleaving the bits of per-dimension bin ids gives a 1-D sort key under
  * which ALL dimensions stay spatially local, so parquet row-group/file
  * min/max stats prune on every z dimension — a single-column sort only ever
  * prunes its own column. This is the lakehouse answer to the reference's
  * multi-column B-tree indexes (sql/schema/04_create_indexes.sql) for
  * append-only columnar storage.
  *
  * Scale: one min/max aggregate (driver gets 2 doubles per dimension), then
  * the z value is a pure codegen expression — no shuffle beyond the final
  * range partition that the write needs anyway. Equal-width binning keeps it
  * collect-free; heavily skewed dimensions want a pre-transform (e.g. log)
  * or the bucketed layout instead.
  */
object ZOrder {

  /** Morton z-value over `cols` (numeric), `bits` per dimension (≤ 16;
    * dims·bits ≤ 63). NULLs bin to 0 — they cluster together at the curve's
    * origin rather than scattering.
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.nonEmpty && bits >= 1 && bits <= 16 && cols.length * bits <= 63,
      s"need 1..16 bits and dims*bits <= 63, got ${cols.length} dims x $bits")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast(DoubleType), max(col(c)).cast(DoubleType)))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nBuckets = 1 << bits
    val binCols: Seq[Column] = cols.zipWithIndex.map { case (c, i) =>
      // empty input / all-NULL dimension → min/max are NULL; a constant (or
      // collapsed) range degenerates to one bin, never an NPE
      val degenerate = row.isNullAt(2 * i) || row.isNullAt(2 * i + 1) ||
        row.getDouble(2 * i + 1) <= row.getDouble(2 * i)
      if (degenerate) lit(0L)
      else {
        val lo = row.getDouble(2 * i); val hi = row.getDouble(2 * i + 1)
        val raw = floor((col(c).cast(DoubleType) - lit(lo)) / lit((hi - lo) / nBuckets))
        coalesce(least(lit(nBuckets - 1L), greatest(lit(0L), raw.cast(LongType))), lit(0L))
      }
    }
    (0 until bits).flatMap { b =>
      binCols.zipWithIndex.map { case (bc, i) =>
        shiftleft(shiftright(bc, b).bitwiseAND(lit(1L)), b * cols.length + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Returns `df` re-clustered along the z-curve of `cols` (the z column
    * itself is dropped — the clustering lives in the physical row order).
    * `numPartitions` = output files; explicit so AQE's small-data coalescing
    * can't collapse the curve into one file (0 = planner default).
    */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 8,
              numPartitions: Int = 0): DataFrame = {
    val z = df.withColumn("__z", zValue(df, cols, bits))
    val parts =
      if (numPartitions > 0) z.repartitionByRange(numPartitions, col("__z"))
      else z.repartitionByRange(col("__z"))
    parts.sortWithinPartitions(col("__z")).drop("__z")
  }
}
