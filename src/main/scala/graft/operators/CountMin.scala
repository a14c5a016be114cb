package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over a token stream —
  * the fixed-size frequency summary a 100 TB pipeline keeps when exact
  * per-token counts are too wide to materialize. `depth` independent
  * affine hash rows of `width` buckets; a token's estimate is the MINIMUM
  * of its `depth` bucket counters, which can only OVER-estimate the true
  * count (by at most eN/width with probability 1-(1/2)^depth).
  *
  * The hash family is the engine-portable MinHash affine family
  * (TextFns.minhashPerms over the 31-bit polyhash), so a DuckDB oracle
  * replays the sketch bit-for-bit and the overestimate property is
  * asserted per row, not eyeballed.
  *
  * Scale posture: the sketch build is ONE groupBy over (row, bucket) —
  * depth×width cells total (a few KB regardless of corpus size), with
  * map-side partial aggregation doing the heavy lifting; the estimate
  * side broadcasts the cells. Nothing here grows with the corpus.
  */
object CountMin {

  /** (row, bucket) for hash row `r` of a 31-bit token hash column. */
  private def bucket(h: Column, r: Int, width: Int): Column = {
    val (a, b) = TextFns.minhashPerms(r)
    ((h * a + b) % TextFns.minhashP % width).cast(LongType)
  }

  /** DuckDB rendering of [[bucket]] over a hash expression. */
  def bucketSql(h: String, r: Int, width: Int): String = {
    val (a, b) = TextFns.minhashPerms(r)
    s"(($h * $a + $b) % ${TextFns.minhashP} % $width)"
  }

  /** The sketch: one row per non-empty (row, bucket) cell with its counter.
    * Input: a DataFrame with a string `tokenCol` (one token per row).
    */
  def sketch(tokens: DataFrame, tokenCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= TextFns.minhashPerms.size,
      s"depth must be in [1, ${TextFns.minhashPerms.size}]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    val hashed = tokens.select(TextFns.polyHash(tokenCol).as("__h"))
    hashed
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r.toLong).as("r"), bucket(col("__h"), r, width).as("bucket"))): _*))
        .as("__c"))
      .groupBy(col("__c")("r").as("r"), col("__c")("bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built over disjoint corpus slices (same depth/width and
    * hash family): cells add. This distributivity is WHY a 1000-executor /
    * multi-day pipeline can keep one sketch per shard or per ingest batch
    * and combine them later without touching the data again —
    * sketch(A ∪ B) = merge(sketch(A), sketch(B)) exactly (spec'd).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).cast(LongType).as("cnt"))

  /** Equi-join cardinality estimation from two sketches (Cormode &
    * Muthukrishnan 2005 §4.2): |A ⋈ B| = Σ_k fA(k)·fB(k), estimated as the
    * MINIMUM over rows of the cell-wise inner product Σ_b A_r[b]·B_r[b].
    * Every product is non-negative and the true diagonal terms are all
    * present, so the estimate can only OVER-count — the planner-side
    * "how big is this join" question answered from two fixed-size
    * summaries without touching either table.
    */
  def joinCardinality(aCells: DataFrame, bCells: DataFrame): DataFrame =
    aCells.select(col("r"), col("bucket"), col("cnt").as("__ca"))
      .join(bCells.select(col("r"), col("bucket"), col("cnt").as("__cb")),
        Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum(col("__ca") * col("__cb")).cast(LongType).as("__ip"))
      .agg(min(col("__ip")).cast(LongType).as("est"))

  /** Point estimates for each distinct token in `tokens`, alongside the
    * exact count: (token, exact, est, over). `over = est - exact >= 0` is
    * the sketch's structural guarantee.
    */
  def estimateAll(tokens: DataFrame, tokenCol: String, depth: Int, width: Int): DataFrame = {
    val exact = tokens.groupBy(col(tokenCol).as("token"))
      .agg(count(lit(1)).as("exact"))
      .withColumn("__h", TextFns.polyHash("token"))
    val probes = exact.select(col("token"), col("exact"),
      explode(array((0 until depth).map(r =>
        struct(lit(r.toLong).as("r"), bucket(col("__h"), r, width).as("bucket"))): _*))
        .as("__c"))
      .select(col("token"), col("exact"),
        col("__c")("r").as("r"), col("__c")("bucket").as("bucket"))
    // Cells derived from the exact vocab aggregate: cell(r,b) = Σ exact over
    // tokens landing there — identical to [[sketch]] by construction
    // (CorpusOpsSpec pins the parity), but the CORPUS is aggregated exactly
    // once; everything after the per-token groupBy is vocabulary-scale.
    val cells = probes.groupBy(col("r"), col("bucket"))
      .agg(sum(col("exact")).as("cnt"))
    probes.join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(col("token"), col("exact"))
      .agg(min(col("cnt")).as("est"))
      // "overcount", not "over": the column name must render verbatim in the
      // DuckDB oracle, where OVER is a reserved word
      .withColumn("overcount", col("est") - col("exact"))
  }
}
