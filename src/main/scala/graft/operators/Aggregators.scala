package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY §7.2 step 9 — the reference has no UDAF,
  * all its aggregates are built-ins; this covers the engine's
  * Aggregator[IN,BUF,OUT] surface).
  *
  * Aggregators merge associatively, so Spark runs them with map-side partial
  * aggregation — the same two-phase shape as built-in aggregates, safe at any
  * key cardinality.
  */
object Aggregators {

  /** Histogram of weekly availability-day counts (0..7) — the distribution
    * behind fact_calendar.available_days_per_week.
    */
  object AvailabilityHistogram extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](8)
    override def reduce(b: Array[Long], days: Long): Array[Long] = {
      val i = math.min(math.max(days, 0L), 7L).toInt
      b(i) += 1; b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < 8) { a(i) += b(i); i += 1 }; a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.javaSerialization[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  final case class PriceStats(n: Long, min: Double, max: Double, sum: Double) {
    def avg: Double = if (n == 0) Double.NaN else sum / n
  }

  /** Single-pass min/max/avg over a double column (the reference computes
    * these as separate queries, scripts/analysis/staging_stats.py).
    */
  object PriceStatsAgg extends Aggregator[Double, PriceStats, PriceStats] {
    override def zero: PriceStats =
      PriceStats(0L, Double.PositiveInfinity, Double.NegativeInfinity, 0.0)
    override def reduce(b: PriceStats, v: Double): PriceStats =
      PriceStats(b.n + 1, math.min(b.min, v), math.max(b.max, v), b.sum + v)
    override def merge(a: PriceStats, b: PriceStats): PriceStats =
      PriceStats(a.n + b.n, math.min(a.min, b.min), math.max(a.max, b.max), a.sum + b.sum)
    override def finish(b: PriceStats): PriceStats = b
    override def bufferEncoder: Encoder[PriceStats] = Encoders.product[PriceStats]
    override def outputEncoder: Encoder[PriceStats] = Encoders.product[PriceStats]
  }
}
