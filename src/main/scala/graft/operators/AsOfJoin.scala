package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join): for each left row, the most recent right
  * row with the same key and right.time <= left.time (backward, the
  * default), or the earliest right row with right.time >= left.time
  * (forward), optionally within a staleness `tolerance` — the full
  * pandas-merge_asof surface. Spark has no native operator; per the
  * extension ladder this is tier (a) — composed from built-ins: tag both
  * sides, union on (key, time), and carry the matched right row along a
  * running window with `last(_, ignoreNulls)`.
  *
  * Cost: ONE shuffle on the key (the union sorts within partitions) — same
  * price as a plain equi-join, versus the naive inequality-join formulation
  * which is a per-key cross product filtered after the fact. Direction only
  * flips the window's sort; tolerance is a map-side post-filter on the
  * carried right time. This is the shape that survives fact-scale on both
  * sides.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns are kept
    * @param right     reference side
    * @param key       equi-key column name (same on both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param valueCols right columns to carry (emitted as `asof_<name>`)
    * @param inner     drop left rows with no match (true) or keep with nulls
    * @param forward   false = most recent right at-or-before left (default);
    *                  true = earliest right at-or-after left
    * @param tolerance max staleness |left.time - right.time| for a match to
    *                  count (e.g. `expr("INTERVAL 30 MINUTE")` for
    *                  timestamps, `lit(5L)` for numeric times); None = any
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           valueCols: Seq[String], inner: Boolean = true,
           forward: Boolean = false,
           tolerance: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val lCols = left.columns
    // ALL right value columns travel as ONE struct so `last(_, ignoreNulls)`
    // selects the matched right row atomically — carrying each column
    // independently would backfill a NULL value column from an OLDER right
    // row, emitting a mix of two right rows (and inner-ness derived from
    // value non-nullness would drop legitimate NULL-valued matches). The
    // struct also carries the matched right TIME (`__rt`) so tolerance can
    // be evaluated map-side after the carry.
    val structType = StructType(
      StructField("__rt", right.schema(rightTime).dataType, nullable = true) +:
      valueCols.map(c =>
        StructField(s"asof_$c", right.schema(c).dataType, nullable = true)))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        lCols.filter(_ != key).map(c => col(c)) :+
        lit(null).cast(structType).as("__asof"): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        lCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTime).as("__rt") +:
          valueCols.map(c => col(c).as(s"asof_$c")): _*).as("__asof"): _*)
    // right rows sort before left rows at equal time IN TRAVERSAL ORDER —
    // backward walks time ascending, forward descending; either way the
    // equal-time right row is seen first, so the boundary is inclusive
    // (<= / >=), like DuckDB/pandas ASOF semantics
    val ord = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col(key)).orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    // a left row matched iff SOME right row preceded it in traversal AND the
    // match is within tolerance; the struct (never null on right rows) is
    // the match marker
    val staleness =
      if (forward) col("__asof.__rt") - col("__t") else col("__t") - col("__asof.__rt")
    val valid = tolerance match {
      case Some(tol) => col("__asof").isNotNull && staleness <= tol
      case None      => col("__asof").isNotNull
    }
    val probes = carried.filter(col("__side") === 1)
      .withColumn("__asof", when(valid, col("__asof")))
    val kept = if (inner) probes.filter(col("__asof").isNotNull) else probes
    kept.select(col(key) +: lCols.filter(_ != key).map(c => col(c)) ++:
      valueCols.map(c => col(s"__asof.asof_$c").as(s"asof_$c")): _*)
  }
}
