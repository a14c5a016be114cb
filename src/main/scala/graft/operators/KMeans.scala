package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Lloyd k-means over an embedding column, in FIXED-POINT
  * arithmetic so the whole fit is engine-exact: vectors are quantized to
  * 1e-6 units (the QuantizeVec kernel — integer longs), distances are exact
  * integer sums of squared unit differences, and centroids are per-dim
  * means rounded toward zero to whole units (deviation from the real mean
  * ≤ 1e-6 per coordinate — numerically immaterial, semantically pinned so a
  * DuckDB oracle reproduces every assignment bit-for-bit; a float k-means
  * would drift in the last ulps of the summation order).
  *
  * This is the full-corpus counterpart of [[Similarity.ivfIndex]]'s sampled
  * training: the sampled fit prices the index; THIS is the operator a
  * pipeline runs when cluster assignments are the product (semantic data
  * mixing, per-cluster quotas, curriculum buckets).
  *
  * Scale shape per pass: the assignment is a pure map-side projection (the
  * k×dim centroid matrix rides into the plan as a literal — KBs; the corpus
  * never shuffles to be assigned), and the update is one (cluster, dim)
  * hash-agg — partial map-side combine, at most k·dim·partitions rows on
  * the exchange, never the vector stream. The k×dim driver collect between
  * passes is the same bounded scalar the IVF trainer pays. Init is the k
  * lowest-id vectors (deterministic; a TakeOrdered heap, no sort).
  *
  * Empty-cluster rule: a cluster that captures no vectors keeps its previous
  * centroid (the standard Lloyd fallback; cannot occur when init points are
  * distinct corpus vectors and k ≪ n, which the fixture gate relies on).
  *
  * Scan count: `passes + 1` scans of the input (seed, one per update, one
  * for the returned assignment) — each a narrow parquet read + the quantize
  * projection. When the raw READ dominates (wide rows, remote storage),
  * persist the (id, quantized) projection upstream and pass that in; the
  * operator deliberately does not cache internally so callers keep the
  * release responsibility explicit (the CorpusPipeline lesson).
  *
  * Reference lineage: the reference has no clustering operator; this extends
  * its aggregate family (sql/analysis/04_summary_stats.sql) the way a
  * training-data pipeline needs.
  */
object KMeans {

  /** Final (idCol, cluster, dist) after `passes` assignment passes with a
    * centroid update between consecutive passes. `dist` is the exact squared
    * distance in units² to the winning centroid; ties go to the lowest
    * cluster index. Requires every vector non-null and of equal dimension
    * (the QuantizeVec contract).
    */
  def assignments(df: DataFrame, idCol: String, embCol: String, k: Int,
                  passes: Int): DataFrame =
    assignmentsQ(df, idCol, embCol, k, passes).drop("__u")

  /** [[assignments]] retaining the quantized vector as `__u` — callers
    * that need the vector alongside the assignment (SemDeDup's pair
    * cosines) stay map-side instead of re-joining the corpus on id.
    * Column pruning removes `__u` for callers that drop it, so
    * [[assignments]] pays nothing for the wider intermediate.
    */
  def assignmentsQ(df: DataFrame, idCol: String, embCol: String, k: Int,
                   passes: Int): DataFrame =
    assignWith(df, idCol, embCol, train(df, idCol, embCol, k, passes))

  /** The Lloyd TRAINING step alone: the fitted k×dim unit-long centroid
    * matrix after `passes − 1` update rounds (EAGER — the seed heap and
    * one bounded k×dim collect per round). Persist via [[centroidsToDf]]
    * and assign later batches with [[assignWith]] — the incremental shape
    * for the semantic family: a daily crawl is clustered map-side against
    * yesterday's fit, never re-trained per batch.
    */
  def train(df: DataFrame, idCol: String, embCol: String, k: Int,
            passes: Int): Array[Array[Long]] = {
    require(k > 0, s"k must be positive: $k")
    require(passes >= 1, s"need at least one assignment pass: $passes")
    val q = df.select(col(idCol), VectorFns.quantize(col(embCol)).as("__u"))
    // deterministic seeding: the k lowest-id vectors ARE the initial
    // centroids (TakeOrderedAndProject — bounded heap, no global sort)
    val init: Array[Array[Long]] = q.orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(init.length == k, s"need >= $k vectors to seed, got ${init.length}")
    var cents = init
    for (_ <- 1 until passes) {
      // one (cluster, dim) hash-agg; k×dim rows back to the driver
      val rows = assignTo(q, cents)
        .select(col("cluster"), posexplode(col("__u")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        // mean rounded toward zero, matching integer DIV on both engines
        .withColumn("c", expr("CASE WHEN s >= 0 THEN s DIV n ELSE -((-s) DIV n) END"))
        .select(col("cluster"), col("pos"), col("c"))
        .collect()
      val next = cents.map(_.clone())
      rows.foreach(r => next(r.getLong(0).toInt)(r.getInt(1)) = r.getLong(2))
      cents = next
    }
    cents
  }

  /** Assign a batch against an ALREADY-TRAINED centroid matrix — a pure
    * LAZY map-side plan (quantize + CellDistsQ kernel; the matrix rides as
    * a codegen reference object). Returns (idCol, cluster, dist, __u).
    */
  def assignWith(df: DataFrame, idCol: String, embCol: String,
                 cents: Array[Array[Long]]): DataFrame = {
    require(cents.nonEmpty, "empty centroid matrix")
    val q = df.select(col(idCol), VectorFns.quantize(col(embCol)).as("__u"))
    assignTo(q, cents)
      .select(col(idCol), col("cluster"), col("dist"), col("__u"))
  }

  /** The fitted centroid matrix as a (cluster, pos, c, k, dim) frame for
    * warehouse persistence; [[centroidsFromDf]] inverts it, failing loudly
    * on holes (a partial matrix would silently mis-assign every vector).
    * `k` and `dim` are the declared matrix shape carried IN the data:
    * deriving both from max()+1 has a tail blind spot — a frame that lost
    * ALL rows of the highest cluster id still satisfies
    * rows.size == k*dim with the shrunken k.
    */
  def centroidsToDf(spark: org.apache.spark.sql.SparkSession,
                    cents: Array[Array[Long]]): DataFrame = {
    import spark.implicits._
    val (k, dim) = (cents.length.toLong, cents.head.length.toLong)
    cents.zipWithIndex.flatMap { case (cu, j) =>
      cu.zipWithIndex.map { case (c, p) => (j.toLong, p.toLong, c, k, dim) }
    }.toSeq.toDF("cluster", "pos", "c", "k", "dim")
  }

  /** Inverse of [[centroidsToDf]]. The expected shape comes from the
    * frame's (k, dim) columns or the explicit parameters; a legacy frame
    * with neither still rejects interior holes but cannot detect the loss
    * of an entire trailing cluster (or trailing dimension).
    */
  def centroidsFromDf(df: DataFrame, expectedK: Int = -1,
                      expectedDim: Int = -1): Array[Array[Long]] = {
    // the shape columns ride the ONE bounded collect (FitFrames contract)
    val hasShape = df.columns.contains("k") && df.columns.contains("dim")
    val base = Seq(col("cluster").cast(LongType), col("pos").cast(LongType),
      col("c").cast(LongType))
    val sel = if (hasShape)
      base ++ Seq(col("k").cast(LongType), col("dim").cast(LongType)) else base
    val collected = df.select(sel: _*).collect()
    require(collected.nonEmpty, "empty centroid frame")
    val rows = collected.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    FitFrames.requireNoDuplicates("centroid frame", collected.length, rows.size)
    val k = FitFrames.declared("k", expectedK,
      if (hasShape) Some(collected.map(_.getLong(3))) else None,
      rows.keys.map(_._1).max.toInt + 1)
    val dim = FitFrames.declared("dim", expectedDim,
      if (hasShape) Some(collected.map(_.getLong(4))) else None,
      rows.keys.map(_._2).max.toInt + 1)
    require(rows.keys.map(_._1).max.toInt + 1 == k &&
        rows.keys.map(_._2).max.toInt + 1 == dim && rows.size == k * dim,
      s"centroid frame holes: ${rows.size} rows, max cluster " +
        s"${rows.keys.map(_._1).max}, max pos ${rows.keys.map(_._2).max}, " +
        s"expected ${k}x$dim")
    Array.tabulate(k, dim)((j, p) => rows((j.toLong, p.toLong)))
  }

  /** Per-cluster fit report — the elbow-method statistic, engine-exact:
    * member count, total inertia (sum of exact unit² distances), and the
    * truncated integer mean distance. One k-row aggregate over
    * [[assignments]]'s map-side output.
    */
  def inertia(df: DataFrame, idCol: String, embCol: String, k: Int,
              passes: Int): DataFrame =
    assignments(df, idCol, embCol, k, passes)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).cast(LongType).as("n_vectors"),
        sum(col("dist")).cast(LongType).as("inertia"),
        expr("CAST(SUM(dist) DIV COUNT(1) AS BIGINT)").as("mean_dist"))

  /** Per-cluster quota cap — [[Curation.diverseSample]]'s selection with
    * SEMANTIC clusters instead of LSH buckets: keep `perCluster` members of
    * every k-means cluster in a portable pseudo-random order (Knuth
    * multiplicative hash of the id), the cluster-balanced subsample a
    * training mix draws once assignments exist. The cap runs on the
    * bounded-heap TopKPerGroup operator: one cluster-keyed exchange,
    * O(n log perCluster), no per-cluster sort.
    */
  def clusterCap(df: DataFrame, idCol: String, embCol: String, k: Int,
                 passes: Int, perCluster: Int): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive: $perCluster")
    val assigned = assignments(df, idCol, embCol, k, passes)
      // id is reduced mod 2^31-1 BEFORE the Knuth multiply so the product
      // stays under Long.MaxValue for any id (a raw id above ~3.5e9 would
      // wrap Spark's multiply and diverge from the oracle's arithmetic).
      .withColumn("__ord", pmod(pmod(col(idCol), lit(2147483647L)) * lit(2654435761L),
        lit(2147483647L)))
      .select(col(idCol), col("cluster"), col("__ord"))
    graft.plans.TopKPerGroup.topK(assigned, Seq("cluster"),
        Seq(("__ord", false), (idCol, false)), perCluster)
      .select(col("cluster"), col(idCol), col("rank"))
  }

  /** Map-side assignment against the centroid matrix: exact integer
    * squared distances to all k centroids (the CellDistsQ codegen kernel —
    * a reference-object array walk, so per-row cost is k·dim long ops, not
    * k·dim HOF closure calls; same arithmetic bit-for-bit as the
    * `aggregate(zip_with(...))` lattice it replaces), argmin with
    * lowest-index ties.
    */
  private def assignTo(q: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val dists = org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.CellDistsQ(
        org.apache.spark.sql.GraftColumnBridge.expression(col("__u")),
        cents.map(_.toSeq).toSeq))
    q.withColumn("__d", dists)
      .withColumn("cluster",
        (expr("array_position(__d, array_min(__d))") - 1).cast(LongType))
      .withColumn("dist", expr("array_min(__d)").cast(LongType))
      .drop("__d")
  }

  /** MULTI-PROBE assignment against the matrix: one row per
    * (id, probed cluster) for the `nProbe` NEAREST centroids, ties to the
    * lowest index — the IVF probe-list shape. Entirely map-side (the
    * per-row (dist, index) struct array sorts and slices inside the
    * projection; no exchange), so probe lists fuse into whatever scan
    * carries the ids. Returns (idCol, cluster, __u).
    */
  def assignProbes(df: DataFrame, idCol: String, embCol: String,
                   cents: Array[Array[Long]], nProbe: Int): DataFrame = {
    require(cents.nonEmpty, "empty centroid matrix")
    require(nProbe >= 1, s"nProbe must be >= 1: $nProbe")
    val dists = org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.CellDistsQ(
        org.apache.spark.sql.GraftColumnBridge.expression(col("__u")),
        cents.map(_.toSeq).toSeq))
    df.select(col(idCol), VectorFns.quantize(col(embCol)).as("__u"))
      .withColumn("__d", dists)
      .withColumn("__probe", explode(expr(
        s"slice(array_sort(transform(__d, (d, i) -> " +
          s"named_struct('d', d, 'i', CAST(i AS LONG)))), 1, $nProbe)")))
      .select(col(idCol), col("__probe.i").as("cluster"), col("__u"))
  }
}
