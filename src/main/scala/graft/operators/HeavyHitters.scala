package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Bounded-memory heavy hitters: the two-phase exact top-k frequent tokens.
  *
  * `q_a9_value_counts` / `q_text_vocab` compute exact top-k with a full
  * token-keyed hash-agg — correct, but at 100 TB that shuffle carries the
  * WHOLE token stream. This operator is the scale path with the SAME exact
  * answer (the decontaminate/decontaminateBloom relationship):
  *
  *   1. candidate phase — each partition runs a Misra–Gries summary of
  *      `capacity` counters over its tokens, map-side, O(capacity) memory,
  *      no shuffle. MG's deficit bound: an item's per-partition undercount
  *      is ≤ n_p/capacity, so summed over partitions every token with
  *      GLOBAL count > n/capacity survives in at least one partition's
  *      summary — the union of survivors (≤ capacity·partitions strings,
  *      collected bounded) is a SUPERSET of every such token.
  *   2. verify phase — exact counts of the candidates only: the token
  *      stream is filtered against the broadcast candidate set before the
  *      count shuffle, so the exchange carries candidate occurrences, not
  *      the full stream (heavy-tailed corpora: a tiny fraction).
  *
  * Exactness condition: the true k-th count must exceed n/capacity (size
  * `capacity` to k · the inverse heavy-hitter threshold; HeavyHittersSpec
  * pins both the guarantee case and partition-independence under it). The
  * result is then EXACTLY the full-shuffle answer — ties at the cut break
  * on the token string, a total order both engines reproduce.
  */
object HeavyHitters {

  /** Hard ceiling on `capacity · partitions` for the candidate collect:
    * beyond this the "bounded" driver set stops being bounded in practice
    * (10⁵ partitions × capacity 10⁴ would be 10⁹ strings — a driver OOM).
    * Inputs wider than `MaxCandidates / capacity` partitions are coalesced
    * down to fit, not rejected: the MG result is partition-layout-independent
    * under the exactness condition (HeavyHittersSpec pins this), so the
    * coalesce changes cost shape only, never the answer.
    */
  val MaxCandidates: Long = 4L * 1000 * 1000

  /** Per-partition Misra–Gries survivors, unioned (distinct, bounded by
    * capacity · partitions) and collected to the driver. When the input has
    * more than `MaxCandidates / capacity` partitions the candidate phase runs
    * on a coalesced (narrower, no-shuffle) copy so the worst-case collect
    * stays bounded — each coalesced task streams more rows through the same
    * O(capacity) summary, trading task parallelism for a bounded driver set.
    */
  def mgCandidates(tokens: Dataset[String], capacity: Int): Array[String] = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val maxParts = (MaxCandidates / capacity).toInt.max(1)
    import tokens.sparkSession.implicits._
    // coalesce(n) with n >= current partition count is a no-op, so the common
    // (narrow-input) case pays nothing and we never materialize an RDD just
    // to inspect the partition count.
    tokens.coalesce(maxParts).mapPartitions { it =>
      val m = new java.util.HashMap[String, Long]()
      it.foreach { t =>
        val c = m.getOrDefault(t, 0L) // tracked items always have count >= 1
        if (c > 0L) m.put(t, c + 1)
        else if (m.size < capacity) m.put(t, 1L)
        else {
          // decrement-all: the MG step that charges one occurrence of every
          // tracked item against the untracked newcomer
          val e = m.entrySet().iterator()
          while (e.hasNext) {
            val en = e.next()
            if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1)
          }
        }
      }
      m.keySet().iterator().asScala
    }.distinct().collect()
  }

  /** Exact top-`k` most frequent tokens of `textCol` (count DESC, token ASC)
    * via the two-phase sketch-then-verify plan. Returns (tok, n).
    */
  def topTokens(df: DataFrame, textCol: String, k: Int, capacity: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val tokens = df.select(explode(TextFns.tokens(col(textCol))).as("tok")).as[String]
    val cands = mgCandidates(tokens, capacity)
    val cdf = spark.createDataset(cands).toDF("tok")
    tokens.toDF().join(broadcast(cdf), "tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(k)
  }
}
