package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>): brute-force cosine top-k as the exact baseline, and a
  * sign-random-projection LSH variant as the scale path.
  *
  * The hot-path arithmetic here is plain double `aggregate`/`zip_with`
  * (codegen'd, no decimal lattice) — fast, and fine when results are consumed
  * as rankings. The oracle-checked queries use VectorFns' exact-decimal
  * variant instead; both shapes share the same plans.
  *
  * Scale design: the query side is broadcast (top-k against a fixed probe set
  * never shuffles the 100 TB candidate side); the LSH variant turns O(Q·N)
  * scoring into a bucket-equi-join, and the bucket id doubles as a write
  * partition key for probe-time partition pruning.
  */
object Similarity {

  /** Fast double dot product (sequential fold, codegen'd). */
  def dotFast(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
         s"CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  def cosine(a: String, b: String): Column =
    dotFast(a, b) / (sqrt(dotFast(a, a)) * sqrt(dotFast(b, b)))

  /** Deterministic sign-random-projection LSH bucket id (nBits <= 30). */
  def lshBucket(embCol: String, nBits: Int): Column =
    (0 until nBits)
      .map(j => when(VectorFns.signProjection(embCol, j) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Exact brute-force cosine top-k.
    * @param queries    (q_id, qe) probe set — must be broadcast-small
    * @param candidates (c_id, ce) corpus
    * @return (q_id, c_id, similarity, rank), rank 1..k per query
    */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("similarity").desc, col("c_id"))
    candidates.crossJoin(broadcast(queries))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("similarity", cosine("qe", "ce"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }

  /** [[cosineTopK]] on the custom bounded-heap operator
    * (graft.plans.TopKPerGroup) instead of a window: same results, but the
    * per-query ranking is O(n log k) with O(queries·k) state — no full sort,
    * no window spill. The shape of choice when candidates are fact-scale.
    */
  def cosineTopKFast(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val scored = candidates.crossJoin(broadcast(queries))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("similarity", cosine("qe", "ce"))
      .select(col("q_id"), col("c_id"), col("similarity"))
    graft.plans.TopKPerGroup.topK(scored, Seq("q_id"),
      Seq(("similarity", true), ("c_id", false)), k)
  }

  /** LSH-bucketed ANN top-k: candidates are scored only inside the query's
    * bucket. Recall < 1 by construction; nBits trades recall for speed.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, nBits: Int, k: Int): DataFrame = {
    val q = queries.withColumn("bucket", lshBucket("qe", nBits))
    val c = candidates.withColumn("bucket", lshBucket("ce", nBits))
    val w = Window.partitionBy(col("q_id")).orderBy(col("similarity").desc, col("c_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("similarity", cosine("qe", "ce"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }
}
