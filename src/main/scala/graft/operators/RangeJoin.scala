package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Point-in-interval range join via banding — the scale-correct alternative
  * to an inequality join (which Spark plans as a nested-loop / cartesian
  * filter): intervals are exploded into the coarse day-bands they cover,
  * points map to exactly one band, and the match becomes a hash equi-join on
  * the band plus an exact range filter. One shuffle on the band key; fan-out
  * bounded by interval length / band width.
  */
object RangeJoin {

  /** @param points    rows with a timestamp column `ptCol`
    * @param intervals rows with [startCol, endCol] timestamp bounds
    * @return points ⋈ intervals where start <= pt <= end (all columns kept)
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String): DataFrame = {
    val banded = intervals.withColumn("__band",
      explode(sequence(col(startCol).cast(DateType), col(endCol).cast(DateType))))
    points.withColumn("__band", col(ptCol).cast(DateType))
      .join(banded, "__band")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__band")
  }
}
