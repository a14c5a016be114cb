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

  /** Fast double dot product — the DotFloat codegen kernel; bit-identical to
    * the HOF fold `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)` it
    * replaced (same sequential summation order), minus the interpreted
    * per-element lambda dispatch.
    */
  def dotFast(a: String, b: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.DotFloat(
      org.apache.spark.sql.GraftColumnBridge.expression(col(a)),
      org.apache.spark.sql.GraftColumnBridge.expression(col(b))))

  /** Per-pair cosine recomputing both norms — O(3d) per pair. Fine for a
    * handful of pairs; JOIN paths must use [[withNorm]] + [[cosinePre]]
    * instead (norms once per ROW, not once per pair — 3× less work on the
    * dominant term).
    */
  def cosine(a: String, b: String): Column =
    dotFast(a, b) / (sqrt(dotFast(a, a)) * sqrt(dotFast(b, b)))

  /** Adds the L2 norm of `embCol` as `normCol` (computed once per row). */
  def withNorm(df: DataFrame, embCol: String, normCol: String): DataFrame =
    df.withColumn(normCol, sqrt(dotFast(embCol, embCol)))

  /** Cosine from a fresh dot and two PREcomputed norm columns. */
  def cosinePre(a: String, b: String, an: Column, bn: Column): Column =
    dotFast(a, b) / (an * bn)

  /** Deterministic sign-random-projection LSH bucket id (nBits <= 30).
    * Quantize-then-bucket on the scaled-long kernel: the projection sums are
    * exact, so buckets equal the decimal `signProjection(_, j) > 0` stack.
    */
  def lshBucket(embCol: String, nBits: Int): Column =
    VectorFns.lshBucketQ(VectorFns.quantize(col(embCol)), nBits)

  /** Exact brute-force cosine top-k.
    * @param queries    (q_id, qe) probe set — must be broadcast-small
    * @param candidates (c_id, ce) corpus
    * @return (q_id, c_id, similarity, rank), rank 1..k per query
    */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("similarity").desc, col("c_id"))
    withNorm(candidates, "ce", "cn")
      .crossJoin(broadcast(withNorm(queries, "qe", "qn")))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("similarity", cosinePre("qe", "ce", col("qn"), col("cn")))
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
    val scored = withNorm(candidates, "ce", "cn")
      .crossJoin(broadcast(withNorm(queries, "qe", "qn")))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("similarity", cosinePre("qe", "ce", col("qn"), col("cn")))
      .select(col("q_id"), col("c_id"), col("similarity"))
    graft.plans.TopKPerGroup.topK(scored, Seq("q_id"),
      Seq(("similarity", true), ("c_id", false)), k)
  }

  /** IVF (inverted-file) ANN: a deterministic coarse quantizer — centroids
    * from a fixed-seed k-means run over a sample — partitions the corpus into
    * `nLists` cells; probes score only the `nProbe` nearest cells.
    *
    * Scale: the corpus is assigned once (one narrow pass + a broadcast of
    * centroids — at 100 TB you persist `cell` as the write-partition key);
    * each probe touches nProbe/nLists of the data. Training samples to the
    * driver deliberately: `nLists·dim` floats is KBs, and k-means over a
    * bounded sample is the standard IVF recipe (FAISS-style) — the corpus
    * itself is never collected.
    */
  def ivfIndex(candidates: DataFrame, embCol: String, nLists: Int,
               sampleSize: Int = 2000, iters: Int = 5): Array[Array[Double]] = {
    // Deterministic UNIFORM sample: order by a hash of the vector and take
    // the top sampleSize (TakeOrderedAndProject — bounded heap, no full
    // sort). Ordering by coordinate values instead would train k-means on
    // one extreme corner of the space and collapse the cells.
    val sample = candidates.select(col(embCol))
      .orderBy(xxhash64(col(embCol)), col(embCol).getItem(0))
      .limit(sampleSize)
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= nLists, s"need >= $nLists vectors to train")
    var centroids = sample.take(nLists).map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(nLists)(new Array[Double](centroids(0).length))
      val counts = new Array[Long](nLists)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0; while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  private def nearestCentroid(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Squared distances to every centroid — the CellDists codegen kernel
    * (identical math to the HOF transform/zip_with/aggregate stack it
    * replaced; the centroid matrix rides as a codegen reference object).
    */
  def cellDists(embCol: String, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.CellDists(
      org.apache.spark.sql.GraftColumnBridge.expression(col(embCol)),
      centroids.toIndexedSeq.map(_.toIndexedSeq)))

  /** Cell assignment as a column (argmin over the broadcast centroid list). */
  def ivfCell(embCol: String, centroids: Array[Array[Double]]): Column = {
    val dists = cellDists(embCol, centroids)
    array_position(dists, array_min(dists)).cast("long") - 1
  }

  /** The trained IVF coarse quantizer as a (list, pos, c, n_lists, dim)
    * frame for warehouse persistence; [[ivfCentroidsFromDf]] inverts it.
    * The declared shape rides IN the data: deriving it from max()+1 cannot
    * see the loss of an entire trailing list or dimension (the same
    * contract as `KMeans.centroidsToDf` and `Curation.weightsToDf`).
    */
  def ivfCentroidsToDf(spark: org.apache.spark.sql.SparkSession,
                       cents: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    val (nl, dim) = (cents.length.toLong, cents.head.length.toLong)
    cents.zipWithIndex.flatMap { case (cu, j) =>
      cu.zipWithIndex.map { case (c, p) => (j.toLong, p.toLong, c, nl, dim) }
    }.toSeq.toDF("list", "pos", "c", "n_lists", "dim")
  }

  /** Inverse of [[ivfCentroidsToDf]] — bounded collect (nLists·dim
    * doubles), failing loudly on ANY hole including trailing ones.
    */
  def ivfCentroidsFromDf(df: DataFrame, expectedLists: Int = -1,
                         expectedDim: Int = -1): Array[Array[Double]] = {
    // the shape columns ride the ONE bounded collect (FitFrames contract)
    val hasShape = df.columns.contains("n_lists") && df.columns.contains("dim")
    val base = Seq(col("list").cast(LongType), col("pos").cast(LongType),
      col("c").cast("double"))
    val sel = if (hasShape)
      base ++ Seq(col("n_lists").cast(LongType), col("dim").cast(LongType)) else base
    val collected = df.select(sel: _*).collect()
    require(collected.nonEmpty, "empty IVF centroid frame")
    val rows = collected.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    FitFrames.requireNoDuplicates("IVF centroid frame", collected.length, rows.size)
    val nl = FitFrames.declared("n_lists", expectedLists,
      if (hasShape) Some(collected.map(_.getLong(3))) else None,
      rows.keys.map(_._1).max.toInt + 1)
    val dim = FitFrames.declared("dim", expectedDim,
      if (hasShape) Some(collected.map(_.getLong(4))) else None,
      rows.keys.map(_._2).max.toInt + 1)
    require(rows.keys.map(_._1).max.toInt + 1 == nl &&
        rows.keys.map(_._2).max.toInt + 1 == dim && rows.size == nl * dim,
      s"IVF centroid frame holes: ${rows.size} rows, expected ${nl}x$dim")
    Array.tabulate(nl, dim)((j, p) => rows((j.toLong, p.toLong)))
  }

  /** IVF ANN top-k: probes score only candidates in their `nProbe` nearest
    * cells. Trains the coarse quantizer inline — the one-shot form; the
    * operational daily-batch shape trains once ([[ivfIndex]]), persists
    * ([[ivfCentroidsToDf]] through any warehouse table), and serves every
    * query batch via [[ivfTopKWith]] with zero training jobs.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, nLists: Int,
              nProbe: Int, k: Int): DataFrame =
    ivfTopKWith(queries, candidates,
      ivfIndex(candidates.select(col("ce").as("embedding")), "embedding", nLists),
      nProbe, k)

  /** [[ivfTopK]] against an ALREADY-TRAINED coarse quantizer — the serving
    * half of the train/persist/serve split. Pure lazy plan builder.
    */
  def ivfTopKWith(queries: DataFrame, candidates: DataFrame,
                  cents: Array[Array[Double]], nProbe: Int, k: Int): DataFrame = {
    require(cents.nonEmpty, "empty IVF centroid matrix")
    val c = candidates.withColumn("cell", ivfCell("ce", cents))
    // probe lists: the nProbe nearest cells per query
    val qq = queries.withColumn("qd", cellDists("qe", cents))
      .withColumn("cell_structs", expr(
        s"slice(array_sort(transform(qd, (d, i) -> named_struct('d', d, 'i', CAST(i AS LONG))), " +
        s"(a, b) -> CASE WHEN a.d < b.d THEN -1 WHEN a.d > b.d THEN 1 ELSE 0 END), 1, $nProbe)"))
      .withColumn("cell", explode(expr("transform(cell_structs, s -> s.i)")))
      .drop("qd", "cell_structs")
    val w = Window.partitionBy(col("q_id")).orderBy(col("similarity").desc, col("c_id"))
    withNorm(c, "ce", "cn").join(broadcast(withNorm(qq, "qe", "qn")), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("similarity", cosinePre("qe", "ce", col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }

  /** Product-quantization codebooks: `m` contiguous subspaces, `kCent`
    * centroids each, trained by the same deterministic sampled k-means as
    * [[ivfIndex]]. Returned as [subspace][centroid][subdim].
    *
    * PQ is the MEMORY side of the ANN scale story (IVF bounds compute):
    * a candidate vector becomes `m` small codes (+1 stored norm) instead of
    * `dim` floats — 128-d float32 → 8 bytes at m=8, a 64× compression — so
    * a billion-vector index fits executor memory where raw vectors cannot.
    */
  def pqTrain(candidates: DataFrame, embCol: String, m: Int, kCent: Int,
              sampleSize: Int = 2000, iters: Int = 5): Array[Array[Array[Double]]] = {
    val sample = candidates.select(col(embCol))
      .orderBy(xxhash64(col(embCol)), col(embCol).getItem(0))
      .limit(sampleSize)
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    (0 until m).toArray.map { j =>
      val slice = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      require(slice.length >= kCent, s"need >= $kCent vectors to train subspace $j")
      var cents = slice.take(kCent).map(_.clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(kCent)(new Array[Double](sub))
        val counts = new Array[Long](kCent)
        slice.foreach { v =>
          val c = nearestCentroid(v, cents)
          counts(c) += 1
          var i = 0; while (i < sub) { sums(c)(i) += v(i); i += 1 }
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents
    }
  }

  /** PQ code assignment: array<long> of per-subspace nearest-centroid ids —
    * a pure map-side projection (slice + CellDists argmin per subspace).
    */
  def pqEncode(embCol: String, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    array((0 until m).map { j =>
      val dists = org.apache.spark.sql.GraftColumnBridge.column(graft.plans.CellDists(
        org.apache.spark.sql.GraftColumnBridge.expression(
          slice(col(embCol), j * sub + 1, sub)),
        codebooks(j).toIndexedSeq.map(_.toIndexedSeq)))
      (array_position(dists, array_min(dists)) - 1).cast(LongType)
    }: _*)
  }

  /** The PQ index frame for a candidate set: (c_id, codes, cn) — the
    * production index layout (bytes per vector, not floats). PERSIST THIS
    * (with [[pqCodebooksDf]]) via `Warehouse.write`: the index is built
    * once and served to every query session; re-encoding the corpus per
    * query would defeat PQ's purpose.
    */
  def pqIndex(candidates: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame =
    withNorm(candidates, "ce", "cn")
      .select(col("c_id"), pqEncode("ce", codebooks).as("codes"), col("cn"))

  /** Codebooks as a persistable frame: (subspace, centroid, dim, value) —
    * m·kCent·subdim rows, KBs. The inverse of [[pqCodebooksFromDf]].
    */
  def pqCodebooksDf(spark: org.apache.spark.sql.SparkSession,
                    codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    // declared shape rides IN the data (m, k_cent, subdim): a frame that
    // lost its trailing subspace/centroid/dim rows is otherwise
    // indistinguishable from a smaller complete codebook (the round-12
    // persisted-state contract, same as the k-means/DSIR/IVF frames)
    val (m, kc, sd) = (codebooks.length, codebooks.head.length,
      codebooks.head.head.length)
    codebooks.indices.flatMap { j =>
      codebooks(j).indices.flatMap { c =>
        codebooks(j)(c).indices.map { d =>
          (j, c, d, codebooks(j)(c)(d), m, kc, sd)
        }
      }
    }.toDF("subspace", "centroid", "dim", "value", "m", "k_cent", "subdim")
  }

  /** Rebuild driver-side codebooks from a persisted [[pqCodebooksDf]] frame.
    * Bounded collect by construction: the frame is m·kCent·subdim doubles.
    * Holes — INCLUDING trailing ones — fail loudly against the frame's
    * declared (m, k_cent, subdim) shape (or the explicit parameters for a
    * legacy frame without those columns, which otherwise only rejects
    * interior holes).
    */
  def pqCodebooksFromDf(df: DataFrame, expectedM: Int = -1,
                        expectedKCent: Int = -1,
                        expectedSubdim: Int = -1): Array[Array[Array[Double]]] = {
    // the shape columns ride the ONE bounded collect (FitFrames contract)
    val hasShape = df.columns.contains("m") && df.columns.contains("k_cent") &&
      df.columns.contains("subdim")
    val base = Seq(col("subspace"), col("centroid"), col("dim"), col("value"))
    val sel = if (hasShape)
      base ++ Seq(col("m").cast(LongType), col("k_cent").cast(LongType),
        col("subdim").cast(LongType)) else base
    val collected = df.select(sel: _*).collect()
    require(collected.nonEmpty, "empty PQ codebook frame")
    val rows = collected.map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val m = FitFrames.declared("m", expectedM,
      if (hasShape) Some(collected.map(_.getLong(4))) else None,
      rows.map(_._1).max + 1)
    val kc = FitFrames.declared("k_cent", expectedKCent,
      if (hasShape) Some(collected.map(_.getLong(5))) else None,
      rows.map(_._2).max + 1)
    val sd = FitFrames.declared("subdim", expectedSubdim,
      if (hasShape) Some(collected.map(_.getLong(6))) else None,
      rows.map(_._3).max + 1)
    require(rows.map(_._1).max + 1 == m && rows.map(_._2).max + 1 == kc &&
        rows.map(_._3).max + 1 == sd && rows.length == m * kc * sd &&
        rows.map(t => (t._1, t._2, t._3)).distinct.length == rows.length,
      s"PQ codebook frame holes: ${rows.length} rows, expected ${m}x${kc}x$sd")
    rows.groupBy(_._1).toArray.sortBy(_._1).map { case (_, bySub) =>
      bySub.groupBy(_._2).toArray.sortBy(_._1).map { case (_, byCent) =>
        byCent.sortBy(_._3).map(_._4)
      }
    }
  }

  /** [[pqTopK]] against a pre-built (typically warehouse-persisted) index
    * frame — the serving path: the scan side touches codes + norm only;
    * true embeddings are fetched for the shortlist re-rank alone.
    */
  def pqTopKWithIndex(queries: DataFrame, index: DataFrame, candidates: DataFrame,
                      codebooks: Array[Array[Array[Double]]], k: Int,
                      rerank: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val cIdx = index.select(col("c_id"), col("codes"), col("cn"))
    // query side: ADC tables as one flat array — lut[j*kCent + code]
    val lutCol = array(codebooks.indices.flatMap { j =>
      codebooks(j).indices.map { c =>
        val cent = codebooks(j)(c)
        val centLit = array(cent.map(lit): _*)
        org.apache.spark.sql.GraftColumnBridge.column(graft.plans.DotFloat(
          org.apache.spark.sql.GraftColumnBridge.expression(
            slice(col("qe"), j * sub + 1, sub).cast(ArrayType(FloatType))),
          org.apache.spark.sql.GraftColumnBridge.expression(
            centLit.cast(ArrayType(FloatType)))))
      }
    }: _*)
    val kCent = codebooks(0).length
    val q = withNorm(queries, "qe", "qn").withColumn("lut", lutCol)
    val adcTerms = (0 until m).map(j =>
      element_at(col("lut"), (col("codes").getItem(j) + lit(j.toLong * kCent) + 1L).cast(IntegerType)))
    val approx = cIdx.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("approx_sim", adcTerms.reduce(_ + _) / (col("qn") * col("cn")))
      .select(col("q_id"), col("c_id"), col("approx_sim"))
    val shortlist = graft.plans.TopKPerGroup.topK(approx, Seq("q_id"),
      Seq(("approx_sim", true), ("c_id", false)), rerank)
    // exact re-rank of the shortlist only
    val w = Window.partitionBy(col("q_id")).orderBy(col("similarity").desc, col("c_id"))
    shortlist
      .join(withNorm(candidates, "ce", "cn"), Seq("c_id"))
      .join(broadcast(withNorm(queries, "qe", "qn")), Seq("q_id"))
      .withColumn("similarity", cosinePre("qe", "ce", col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }

  /** PQ + ADC ANN top-k with exact re-rank (index built inline).
    *
    * Candidates carry only (id, codes, norm); each query builds its
    * asymmetric-distance lookup tables (dot of the query sub-vector with
    * every centroid — m·kCent doubles, map-side from the broadcast
    * codebooks), approximates dot(q,c) as the sum of table lookups at the
    * candidate's codes, heap-selects `rerank` candidates per query on the
    * approximate cosine, and re-scores ONLY those against true embeddings
    * for the final exact top-k ranking.
    *
    * Scale: the scan side touches codes+norm (bytes, not vectors); true
    * embeddings are fetched by an equi-join on the ~queries·rerank
    * surviving ids. Recall is a parameter (rerank/kCent trade): spec-bounded
    * rather than oracle-gated, because ADC is lossy by construction. In
    * production, build the index once ([[pqIndex]] + [[pqCodebooksDf]]
    * through the warehouse) and serve via [[pqTopKWithIndex]].
    */
  def pqTopK(queries: DataFrame, candidates: DataFrame,
             codebooks: Array[Array[Array[Double]]], k: Int, rerank: Int): DataFrame =
    pqTopKWithIndex(queries, pqIndex(candidates, codebooks), candidates,
      codebooks, k, rerank)

  /** FIXED-POINT PQ training — the k-means discipline applied to codebook
    * fitting so a DuckDB oracle replays every centroid bit-for-bit:
    * vectors quantize to 1e-6-unit longs, the training sample is the
    * `sampleSize` LOWEST ids (deterministic; `ORDER BY id LIMIT n` on both
    * engines — a bounded heap, not a sort), each subspace seeds with its
    * first `kCent` sample slices, assignment is exact integer squared
    * distance with ties to the lowest centroid, and the update is the
    * truncated-toward-zero integer mean (matching SQL's sign-adjusted `//`;
    * an empty centroid keeps its previous value). Codebooks are unit-long
    * counts (values × 1e6).
    *
    * Float [[pqTrain]] remains the throughput path (float accumulation,
    * hashed sampling); THIS is the auditable one — same scale shape (one
    * bounded driver sample, KB-sized codebooks).
    */
  def pqTrainUnits(candidates: DataFrame, idCol: String, embCol: String,
                   m: Int, kCent: Int, sampleSize: Int = 256,
                   iters: Int = 2): Array[Array[Array[Long]]] = {
    val sample: Array[Array[Long]] = candidates
      .select(col(idCol), VectorFns.quantize(col(embCol)).as("__u"))
      .orderBy(col(idCol)).limit(sampleSize)
      .collect().map(_.getSeq[Long](1).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    (0 until m).toArray.map { j =>
      val slice = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      require(slice.length >= kCent, s"need >= $kCent vectors to train subspace $j")
      var cents: Array[Array[Long]] = slice.take(kCent).map(_.clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(kCent)(new Array[Long](sub))
        val counts = new Array[Long](kCent)
        slice.foreach { v =>
          var best = 0; var bestD = Long.MaxValue
          var c = 0
          while (c < kCent) {
            var d = 0L; var i = 0
            while (i < sub) { val x = v(i) - cents(c)(i); d += x * x; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0; while (i < sub) { sums(best)(i) += v(i); i += 1 }
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          // Long division truncates toward zero — the oracle renders it as
          // CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) (DuckDB // floors)
          else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents
    }
  }

  /** PQ code assignment against unit-long codebooks: per subspace, argmin
    * of EXACT integer squared distance (CellDistsQ kernel), ties to the
    * lowest centroid id — replayable as BIGINT arithmetic in SQL.
    * `quantCol` must be a [[VectorFns.quantize]]d column.
    */
  def pqEncodeUnits(quantCol: Column, codebooks: Array[Array[Array[Long]]]): Column = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    array((0 until m).map { j =>
      val dists = org.apache.spark.sql.GraftColumnBridge.column(graft.plans.CellDistsQ(
        org.apache.spark.sql.GraftColumnBridge.expression(
          slice(quantCol, j * sub + 1, sub)),
        codebooks(j).toIndexedSeq.map(_.toIndexedSeq)))
      (array_position(dists, array_min(dists)) - 1).cast(LongType)
    }: _*)
  }

  /** Oracle-replayable PQ ANN top-k: integer ADC-dot shortlist + exact
    * cosine re-rank.
    *
    * The shortlist is selected on the APPROXIMATE INNER PRODUCT — the sum
    * over subspaces of dot(query-slice, centroid-at-code), all in exact
    * unit-long arithmetic (CellDotsQ lookup tables, map-side from the
    * broadcast codebooks) — ordered (dot DESC, c_id ASC). Integer scores
    * mean the shortlist cut is bit-deterministic, so the WHOLE pipeline
    * (train → encode → ADC → shortlist → exact re-rank) replays in a
    * DuckDB oracle; the float path's shortlist ([[pqTopK]]) is
    * approximate-cosine and only spec-bounded. Same scale shape: the scan
    * side carries codes only; true embeddings join back for the ~q·rerank
    * shortlist rows alone.
    */
  def pqTopKUnits(queries: DataFrame, candidates: DataFrame,
                  codebooks: Array[Array[Array[Long]]], k: Int,
                  rerank: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val kCent = codebooks(0).length
    val cIdx = candidates
      .select(col("c_id"), pqEncodeUnits(VectorFns.quantize(col("ce")), codebooks).as("codes"))
    // query side: per-subspace integer ADC tables concatenated into one
    // flat lut — lut[j*kCent + code]
    val lutCol = concat((0 until m).map { j =>
      org.apache.spark.sql.GraftColumnBridge.column(graft.plans.CellDotsQ(
        org.apache.spark.sql.GraftColumnBridge.expression(
          slice(VectorFns.quantize(col("qe")), j * sub + 1, sub)),
        codebooks(j).toIndexedSeq.map(_.toIndexedSeq)))
    }: _*)
    val q = queries.select(col("q_id"), col("qe")).withColumn("lut", lutCol)
    val adcTerms = (0 until m).map(j =>
      element_at(col("lut"), (col("codes").getItem(j) + lit(j.toLong * kCent) + 1L).cast(IntegerType)))
    val approx = cIdx.crossJoin(broadcast(q.select(col("q_id"), col("lut"))))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("approx_dot", adcTerms.reduce(_ + _))
      .select(col("q_id"), col("c_id"), col("approx_dot"))
    val shortlist = graft.plans.TopKPerGroup.topK(approx, Seq("q_id"),
      Seq(("approx_dot", true), ("c_id", false)), rerank)
    val w = Window.partitionBy(col("q_id")).orderBy(col("similarity").desc, col("c_id"))
    shortlist
      .join(withNorm(candidates, "ce", "cn"), Seq("c_id"))
      .join(broadcast(withNorm(queries, "qe", "qn")), Seq("q_id"))
      .withColumn("similarity", cosinePre("qe", "ce", col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }

  // ---------------------------------------------------------------- IVF-PQ

  private def kernelCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def kernelExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** One integer Lloyd run over a driver-side sample — the shared trainer
    * of the fixed-point IVF-PQ path: seeds are the first `k` vectors,
    * assignment is exact integer squared distance with ties to the lowest
    * centroid, the update is the truncated-toward-zero integer mean, and an
    * empty centroid keeps its previous value (the pqTrainUnits discipline,
    * factored so the coarse quantizer and the residual codebooks train
    * identically).
    */
  private def lloydUnits(vs: Array[Array[Long]], k: Int,
                         iters: Int): Array[Array[Long]] = {
    require(vs.length >= k, s"need >= $k vectors to train")
    val dim = vs(0).length
    var cents: Array[Array[Long]] = vs.take(k).map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Long](dim))
      val counts = new Array[Long](k)
      vs.foreach { v =>
        val c = nearestCentroidUnits(v, cents)
        counts(c) += 1
        var i = 0; while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(s => if (s >= 0) s / counts(c) else -((-s) / counts(c)))
      }.toArray
    }
    cents
  }

  private def nearestCentroidUnits(v: Array[Long], cs: Array[Array[Long]]): Int = {
    var best = 0; var bestD = Long.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0L; var i = 0
      while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Fixed-point IVF-PQ training (the FAISS IndexIVFPQ recipe, Jégou et al.
    * 2011, under the engine's oracle-replayable integer discipline): one
    * bounded driver sample (`sampleSize` LOWEST ids — `ORDER BY id LIMIT n`
    * on both engines) trains BOTH the coarse quantizer (`nLists` full-dim
    * cells) and the per-subspace codebooks — the codebooks on the sample's
    * RESIDUALS (v − assigned coarse centroid), which is the whole point of
    * the combined index: residuals are small, so `kCent` centroids quantize
    * them far better than they would raw vectors.
    *
    * Returns (coarse [nLists][dim], books [m][kCent][dim/m]) in 1e-6 units.
    * Scale: the collect is the bounded `sampleSize·dim` longs every trainer
    * here pays; the corpus is never collected.
    */
  def ivfpqTrainUnits(candidates: DataFrame, idCol: String, embCol: String,
                      nLists: Int, m: Int, kCent: Int, sampleSize: Int = 256,
                      iters: Int = 2): (Array[Array[Long]], Array[Array[Array[Long]]]) = {
    val sample: Array[Array[Long]] = candidates
      .select(col(idCol), VectorFns.quantize(col(embCol)).as("__u"))
      .orderBy(col(idCol)).limit(sampleSize)
      .collect().map(_.getSeq[Long](1).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val coarse = lloydUnits(sample, nLists, iters)
    val residuals = sample.map { v =>
      val cv = coarse(nearestCentroidUnits(v, coarse))
      val r = new Array[Long](dim)
      var i = 0; while (i < dim) { r(i) = v(i) - cv(i); i += 1 }
      r
    }
    val books = (0 until m).toArray.map { j =>
      lloydUnits(residuals.map(v =>
        java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub)), kCent, iters)
    }
    (coarse, books)
  }

  /** The IVF-PQ candidate index: (c_id, cell, codes) — cell from the coarse
    * quantizer (exact integer argmin, ties to the lowest cell), codes from
    * the RESIDUAL against that cell's centroid (SubVecQ kernel, then the
    * shared pqEncodeUnits argmin per subspace). Entirely map-side; persist
    * it through the warehouse like the flat-PQ index (bytes per vector).
    */
  def ivfpqIndex(candidates: DataFrame, coarse: Array[Array[Long]],
                 books: Array[Array[Array[Long]]]): DataFrame = {
    val coarseArr = array(coarse.map(cv => array(cv.map(lit): _*)): _*)
    candidates
      .withColumn("__u", VectorFns.quantize(col("ce")))
      .withColumn("__cd", kernelCol(graft.plans.CellDistsQ(
        kernelExpr(col("__u")), coarse.toIndexedSeq.map(_.toIndexedSeq))))
      .withColumn("cell",
        (array_position(col("__cd"), array_min(col("__cd"))) - 1).cast(LongType))
      .withColumn("__r", kernelCol(graft.plans.SubVecQ(
        kernelExpr(col("__u")),
        kernelExpr(element_at(coarseArr, (col("cell") + 1).cast(IntegerType))))))
      .select(col("c_id"), col("cell"), pqEncodeUnits(col("__r"), books).as("codes"))
  }

  /** Unit-long codebooks as a persistable frame — the fixed-point twin of
    * [[pqCodebooksDf]] (same layout and declared-shape contract, BIGINT
    * values): (subspace, centroid, dim, value, m, k_cent, subdim).
    */
  def pqCodebooksUnitsDf(spark: org.apache.spark.sql.SparkSession,
                         books: Array[Array[Array[Long]]]): DataFrame = {
    import spark.implicits._
    val (m, kc, sd) = (books.length, books.head.length, books.head.head.length)
    books.indices.flatMap { j =>
      books(j).indices.flatMap { c =>
        books(j)(c).indices.map { d => (j, c, d, books(j)(c)(d), m, kc, sd) }
      }
    }.toDF("subspace", "centroid", "dim", "value", "m", "k_cent", "subdim")
  }

  /** Inverse of [[pqCodebooksUnitsDf]]; the [[pqCodebooksFromDf]] hole
    * contract (declared shape beats max()+1 tail blind spot).
    */
  def pqCodebooksUnitsFromDf(df: DataFrame, expectedM: Int = -1,
                             expectedKCent: Int = -1,
                             expectedSubdim: Int = -1): Array[Array[Array[Long]]] = {
    val hasShape = df.columns.contains("m") && df.columns.contains("k_cent") &&
      df.columns.contains("subdim")
    val base = Seq(col("subspace"), col("centroid"), col("dim"),
      col("value").cast(LongType))
    val sel = if (hasShape)
      base ++ Seq(col("m").cast(LongType), col("k_cent").cast(LongType),
        col("subdim").cast(LongType)) else base
    val collected = df.select(sel: _*).collect()
    require(collected.nonEmpty, "empty PQ codebook frame")
    val rows = collected.map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val m = FitFrames.declared("m", expectedM,
      if (hasShape) Some(collected.map(_.getLong(4))) else None,
      rows.map(_._1).max + 1)
    val kc = FitFrames.declared("k_cent", expectedKCent,
      if (hasShape) Some(collected.map(_.getLong(5))) else None,
      rows.map(_._2).max + 1)
    val sd = FitFrames.declared("subdim", expectedSubdim,
      if (hasShape) Some(collected.map(_.getLong(6))) else None,
      rows.map(_._3).max + 1)
    require(rows.map(_._1).max + 1 == m && rows.map(_._2).max + 1 == kc &&
        rows.map(_._3).max + 1 == sd && rows.length == m * kc * sd &&
        rows.map(t => (t._1, t._2, t._3)).distinct.length == rows.length,
      s"PQ codebook frame holes: ${rows.length} rows, expected ${m}x${kc}x$sd")
    rows.groupBy(_._1).toArray.sortBy(_._1).map { case (_, bySub) =>
      bySub.groupBy(_._2).toArray.sortBy(_._1).map { case (_, byCent) =>
        byCent.sortBy(_._3).map(_._4)
      }
    }
  }

  /** Oracle-replayable IVF-PQ ANN top-k — the production billion-vector
    * index shape: the coarse quantizer bounds COMPUTE (each query scores
    * only the `nProbe` nearest of `nLists` cells) and the residual PQ codes
    * bound MEMORY (the scan side carries m small codes per vector, never
    * the embedding). approx_dot(q, c) = dot(q, coarse[cell_c]) +
    * Σ_j lut_j[code_cj] with lut_j = dot(q_sub_j, book_j[·]) — all in exact
    * unit-long arithmetic (CellDotsQ tables), so the shortlist cut is
    * bit-deterministic and DuckDB replays train → assign → residual-encode
    * → probe → ADC → shortlist → exact cosine re-rank end to end.
    *
    * Scale: candidates shuffle-free (cell is map-side; at 100 TB persist
    * [[ivfpqIndex]] partitioned BY cell so probes prune partitions); the
    * probe side is broadcast (queries × nProbe rows); the shortlist heap is
    * the bounded TopKPerGroup operator; only ~queries·rerank ids fetch true
    * embeddings for the re-rank.
    */
  def ivfpqTopKUnits(queries: DataFrame, candidates: DataFrame,
                     coarse: Array[Array[Long]],
                     books: Array[Array[Array[Long]]],
                     nProbe: Int, k: Int, rerank: Int): DataFrame =
    ivfpqTopKWithIndex(queries, ivfpqIndex(candidates, coarse, books),
      candidates, coarse, books, nProbe, k, rerank)

  /** [[ivfpqTopKUnits]] against a pre-built (typically warehouse-persisted)
    * (c_id, cell, codes) index frame — the serving path of the build-once/
    * serve-many split: the scan side touches the code table only; true
    * embeddings are fetched for the shortlist re-rank alone. Persist the
    * index with [[ivfpqIndex]] + [[KMeans.centroidsToDf]] (coarse) +
    * [[pqCodebooksUnitsDf]] (books) through the warehouse.
    */
  def ivfpqTopKWithIndex(queries: DataFrame, index: DataFrame,
                         candidates: DataFrame,
                         coarse: Array[Array[Long]],
                         books: Array[Array[Array[Long]]],
                         nProbe: Int, k: Int, rerank: Int): DataFrame = {
    val m = books.length
    val kCent = books(0).length
    val sub = books(0)(0).length
    val cIdx = index.select(col("c_id"), col("cell"), col("codes"))
    val lutCol = concat((0 until m).map { j =>
      kernelCol(graft.plans.CellDotsQ(
        kernelExpr(slice(VectorFns.quantize(col("qe")), j * sub + 1, sub)),
        books(j).toIndexedSeq.map(_.toIndexedSeq)))
    }: _*)
    // probe list: the nProbe nearest cells by exact integer distance, ties
    // to the lowest cell — struct sort is lexicographic on (d, i)
    val q0 = queries.select(col("q_id"), col("qe"))
      .withColumn("__qu", VectorFns.quantize(col("qe")))
      .withColumn("__qd", kernelCol(graft.plans.CellDistsQ(
        kernelExpr(col("__qu")), coarse.toIndexedSeq.map(_.toIndexedSeq))))
      .withColumn("__qcd", kernelCol(graft.plans.CellDotsQ(
        kernelExpr(col("__qu")), coarse.toIndexedSeq.map(_.toIndexedSeq))))
      .withColumn("lut", lutCol)
      .withColumn("__cells", expr(
        s"slice(array_sort(transform(__qd, (d, i) -> named_struct('d', d, 'i', CAST(i AS LONG)))), 1, $nProbe)"))
      .withColumn("cell", explode(expr("transform(__cells, s -> s.i)")))
      .withColumn("coarse_dot",
        element_at(col("__qcd"), (col("cell") + 1).cast(IntegerType)))
      .select(col("q_id"), col("cell"), col("coarse_dot"), col("lut"))
    val adcTerms = (0 until m).map(j =>
      element_at(col("lut"),
        (col("codes").getItem(j) + lit(j.toLong * kCent) + 1L).cast(IntegerType)))
    val approx = cIdx.join(broadcast(q0), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("approx_dot", adcTerms.reduce(_ + _) + col("coarse_dot"))
      .select(col("q_id"), col("c_id"), col("approx_dot"))
    val shortlist = graft.plans.TopKPerGroup.topK(approx, Seq("q_id"),
      Seq(("approx_dot", true), ("c_id", false)), rerank)
    val w = Window.partitionBy(col("q_id")).orderBy(col("similarity").desc, col("c_id"))
    shortlist
      .join(withNorm(candidates, "ce", "cn"), Seq("c_id"))
      .join(broadcast(withNorm(queries, "qe", "qn")), Seq("q_id"))
      .withColumn("similarity", cosinePre("qe", "ce", col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }

  /** Multiprobe LSH ANN top-k: scores the query's own bucket PLUS every
    * bucket at Hamming distance 1 (one sign-bit flip) — the standard recall
    * lever at zero index cost. A vector whose projection is near one
    * hyperplane lands across that bucket boundary; probing the flip
    * recovers it. Candidates are a strict superset of [[lshTopK]]'s, so
    * multiprobe recall >= single-probe recall for every query (spec-pinned
    * as an exact property, not a statistical one).
    *
    * Scale: the candidate side is untouched (still one bucket id per row,
    * the write-partition key); only the broadcast-small probe side fans out
    * ×(nBits+1). The join stays a bucket equi-join — never a distance
    * predicate.
    */
  def lshMultiProbeTopK(queries: DataFrame, candidates: DataFrame,
                        nBits: Int, k: Int): DataFrame = {
    val probes = withNorm(queries, "qe", "qn")
      .withColumn("__b0", lshBucket("qe", nBits))
      .withColumn("bucket", explode(array(
        (col("__b0") +: (0 until nBits).map(j =>
          col("__b0").bitwiseXOR(lit(1L << j)))): _*)))
      .drop("__b0")
    val c = withNorm(candidates, "ce", "cn").withColumn("bucket", lshBucket("ce", nBits))
    val w = Window.partitionBy(col("q_id")).orderBy(col("similarity").desc, col("c_id"))
    c.join(broadcast(probes), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("similarity", cosinePre("qe", "ce", col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }

  /** Contrastive triplet mining — training data FOR embedding models
    * (the SimCSE/E5 preparation shape): every vector becomes an anchor
    * with its best same-cell POSITIVE (cosine ≥ `posThreshold`) and its
    * hardest same-cell NEGATIVE (highest cosine inside [`negLo`, `negHi`)
    * — similar enough to be hard, dissimilar enough to be wrong). Anchors
    * missing either side drop out (inner join), so every emitted row is a
    * complete (anchor, pos, neg) triplet.
    *
    * Same scale spine as [[graft.operators.Dedup.semDedup]]: the k-means
    * cell bounds the pair search, the pair join is salted, the cosine is
    * the exact decimal quantized dot rounded to 6 (cross-engine-total
    * ordering with id tie-breaks), and both top-1 selections run on the
    * bounded-heap TopKPerGroup operator over ONE shared directed-pair
    * subplan — no all-pairs anywhere.
    */
  def contrastiveTriplets(df: DataFrame, idCol: String, embCol: String,
                          k: Int, passes: Int, posThreshold: Double,
                          negLo: Double, negHi: Double): DataFrame = {
    require(negLo < negHi && negHi <= posThreshold,
      s"need negLo < negHi <= posThreshold: $negLo, $negHi, $posThreshold")
    import graft.functions.VectorFns
    val m = KMeans.assignmentsQ(df, idCol, embCol, k, passes)
      .withColumn("__n", sqrt(VectorFns.dotQDouble(col("__u"), col("__u"))))
    val a = m.select(col(idCol).as("anchor"), col("cluster"),
      col("__u").as("ae"), col("__n").as("an"))
    val b = m.select(col(idCol).as("other"), col("cluster"),
      col("__u").as("be"), col("__n").as("bn"))
    // Shard key hashes the id (not a raw modulus): total over any id
    // type, where pmod(id, n) on a string/UUID id would fail the cast
    // under ANSI or null out, silently dropping every b-side row.
    val pairSalt = 8
    // The streamed side's partitioning otherwise inherits the upstream
    // scan's (one small parquet file → ONE task computing every cell's
    // |cell|² cosines — measured 1.34 s of a 2.4 s wall). Hash-partition
    // on exactly the join keys: under a broadcast join it spreads the
    // pair compute across the (cluster × salt) keys; under a shuffle join
    // at scale it IS the join's required distribution (no extra hop).
    // EXPLICIT partition count: a column-only repartition lets AQE's
    // bytes-based coalescer collapse the exchange (quantized vectors are
    // tiny on the wire but each joined row pays a full-dimension dot
    // product — measured 3 tasks carrying ~1M cosines); an explicit count
    // is preserved by AQE, so the pair compute keeps the session's
    // configured width.
    val aS = a.withColumn("__salt", explode(lit((0 until pairSalt).toArray)))
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("cluster"), col("__salt"))
    val bS = b.withColumn("__salt", pmod(hash(col("other")), lit(pairSalt)))
    // The pair subplan (scan → quantize → salted cell join → cosine) used
    // to feed two TopKPerGroup legs — executing the shuffle-heavy join
    // TWICE (no ReusedExchange spans the differing filters). A round-16
    // intermediate fix checkpointed the pair frame, but that MATERIALIZES
    // the full pair set — O(pairs) storage where the heaps streamed it
    // (the ×10 fixed-k soak jumped 7.3× → 40×). The right shape is ONE
    // pass: both top-1 selections are conditional MIN aggregates over the
    // pair stream — min(struct(−cos, other)) is exactly (cos DESC, other
    // ASC) top-1, for any orderable id type — so the join output flows
    // straight into a partially-aggregating shuffle (≤ 2 small structs
    // per anchor per partition on the wire) and no pair row is ever
    // stored or recomputed.
    val pairs = aS.join(bS, Seq("cluster", "__salt"))
      .filter(col("anchor") =!= col("other"))
      .withColumn("cos",
        round(VectorFns.dotQDouble(col("ae"), col("be")) / (col("an") * col("bn")), 6))
      .select(col("anchor"), col("other"), col("cos"))
    val best = pairs.groupBy(col("anchor"))
      .agg(
        min(when(col("cos") >= posThreshold,
          struct((-col("cos")).as("nc"), col("other").as("o")))).as("__p"),
        min(when(col("cos") >= negLo && col("cos") < negHi,
          struct((-col("cos")).as("nc"), col("other").as("o")))).as("__n"))
    // anchors missing either side drop (the documented inner-join contract)
    best.filter(col("__p").isNotNull && col("__n").isNotNull)
      .select(col("anchor"),
        col("__p.o").as("pos_id"), (-col("__p.nc")).as("pos_cos"),
        col("__n.o").as("neg_id"), (-col("__n.nc")).as("neg_cos"))
  }

  /** k-NN neighbor GRAPH of a corpus — the persisted index of the
    * graph-ANN family (NSW/HNSW/DiskANN class): per node, its `degree`
    * most-cosine-similar neighbors among candidates sharing its k-means
    * cell. Returns (node, nbr, sim) — the billion-edge table a serving
    * tier shards by `node`. Fully deterministic (fixed-point Lloyd cells,
    * rounded cosines, ties to the lowest neighbor id), so a SQL oracle
    * replays every edge.
    *
    * Scale spine = [[graft.operators.Dedup.semDedup]]: the cell bounds the
    * pair search, the pair join is salted with an explicit partition
    * count, and per-node selection is the bounded-heap TopKPerGroup — the
    * graph build never goes all-pairs. Cell-bounding trades boundary
    * recall for build cost exactly like IVF's nProbe=1; the beam search
    * ([[graphTopK]]) re-opens cross-cell reach by walking edges
    * transitively.
    */
  def knnGraph(df: DataFrame, idCol: String, embCol: String, k: Int,
               passes: Int, degree: Int): DataFrame =
    knnGraphWith(df, idCol, embCol,
      KMeans.train(df, idCol, embCol, k, passes), degree)

  /** [[knnGraph]] against an ALREADY-TRAINED (typically persisted) centroid
    * matrix — the incremental family's frozen-fit convention: the daily
    * batch is graphed with yesterday's cells, never a re-train.
    */
  def knnGraphWith(df: DataFrame, idCol: String, embCol: String,
                   cents: Array[Array[Long]], degree: Int): DataFrame = {
    require(degree >= 1, s"degree must be >= 1: $degree")
    import graft.functions.VectorFns
    val m = KMeans.assignWith(df, idCol, embCol, cents)
      .withColumn("__n", sqrt(VectorFns.dotQDouble(col("__u"), col("__u"))))
    val a = m.select(col(idCol).as("node"), col("cluster"),
      col("__u").as("ae"), col("__n").as("an"))
    val b = m.select(col(idCol).as("nbr"), col("cluster"),
      col("__u").as("be"), col("__n").as("bn"))
    val pairSalt = 8
    val aS = a.withColumn("__salt", explode(lit((0 until pairSalt).toArray)))
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("cluster"), col("__salt"))
    val bS = b.withColumn("__salt", pmod(hash(col("nbr")), lit(pairSalt)))
    val pairs = aS.join(bS, Seq("cluster", "__salt"))
      .filter(col("node") =!= col("nbr"))
      .withColumn("sim",
        round(VectorFns.dotQDouble(col("ae"), col("be")) / (col("an") * col("bn")), 6))
      .select(col("node"), col("nbr"), col("sim"))
    graft.plans.TopKPerGroup.topK(pairs, Seq("node"),
      Seq(("sim", true), ("nbr", false)), degree)
      .select(col("node"), col("nbr"), col("sim"))
  }

  /** Incremental graph maintenance — the daily-batch shape of the graph
    * family (the [[graft.operators.Dedup.mergeBandIndex]] convention):
    * merge a persisted [[knnGraphWith]] edge table with a NEW batch under
    * the same FROZEN centroid matrix. Only cells the batch actually
    * touches contribute new candidate edges (history vectors outside
    * those cells are never re-read — at scale, a partition-pruned fetch
    * when the corpus is written partitioned by cell), in BOTH directions:
    * batch nodes rank their cellmates, and history cellmates may adopt a
    * closer batch neighbor. Only TOUCHED nodes re-rank through the
    * top-`degree` heap; untouched nodes' stored edges pass through
    * MAP-SIDE verbatim.
    *
    * PRECONDITION (r18, the touched-node fast path's contract): `graph`
    * must already be a per-node top-`degree` selection under the SAME
    * `degree` and tie order — i.e. the output of [[knnGraphWith]] or a
    * previous merge with identical parameters, which is the only thing
    * the gates ever store. A hand-built over-degree graph, or a merge
    * called with a SMALLER degree than the table was built with, passes
    * untouched nodes through uncapped (the pre-r18 full-table re-rank
    * would have re-capped them); re-cap such a table once with
    * [[graft.plans.TopKPerGroup.topK]] before merging incrementally.
    *
    * EQUALITY CONTRACT (spec- and oracle-pinned): with the same frozen
    * centroids, `mergeKnnGraph(knnGraphWith(hist), hist, batch)` is
    * edge-for-edge identical to `knnGraphWith(hist ∪ batch)` — the merge
    * is a pure incremental evaluation of the full rebuild.
    */
  def mergeKnnGraph(graph: DataFrame, histDf: DataFrame, batchDf: DataFrame,
                    idCol: String, embCol: String, cents: Array[Array[Long]],
                    degree: Int, requireCapped: Boolean = false): DataFrame = {
    require(degree >= 1, s"degree must be >= 1: $degree")
    val newEdges = newCandidateEdges(histDf, batchDf, idCol, embCol, cents)
    rerankMergeTail(graph, newEdges, carry = Nil, degree, requireCapped,
      "mergeKnnGraph_touchedOld")
  }

  /** The TOUCHED-NODE-ONLY re-rank tail shared by [[mergeKnnGraph]] and
    * the cell-partitioned variant (the r17 gate-growth decomposition fix):
    * only nodes that gained a candidate edge this batch can change — an
    * untouched node's stored edge set is already its exact top-`degree`
    * selection (every writer of these graphs caps through this topK, the
    * documented precondition), so re-running the heap over it returns it
    * verbatim; it streams through MAP-SIDE via the broadcast anti-join.
    * The old shape unioned the FULL edge table into the heap every batch —
    * a corpus-wide shuffle whose cost grew with the graph, not the batch.
    * `carry` names extra columns to thread through (the cells variant's
    * `cell` — functional in `node`, so the heap's row counts are
    * unchanged).
    *
    * Touched nodes' OLD edges are batch-bounded (≤ touched × degree);
    * checkpointing them severs the lineage the semi and anti branches
    * would otherwise share (a union whose children both reference the
    * same graph/touchedNodes subtrees trips Catalyst's union-constraint
    * rewrite with a key-not-found on the duplicated attribute ids).
    */
  private def rerankMergeTail(old0: DataFrame, newEdges: DataFrame,
      carry: Seq[String], degree: Int, requireCapped: Boolean,
      ckptKey: String): DataFrame = {
    val cols = (Seq("node", "nbr", "sim") ++ carry).map(col)
    val touchedNodes = broadcast(newEdges.select(col("node")).distinct())
    val old = old0.select(cols: _*)
    val touchedOld = graft.CkptCycle.cycle(
      graft.CkptCycle.callSiteKey(ckptKey, "graft.operators.Similarity"),
      old.join(touchedNodes, Seq("node"), "left_semi").localCheckpoint(true))
    validateCapped(touchedOld, degree, requireCapped)
    val reranked = graft.plans.TopKPerGroup.topK(
        touchedOld.unionByName(newEdges.select(cols: _*)),
        Seq("node"), Seq(("sim", true), ("nbr", false)), degree)
      .select(cols: _*)
    reranked.unionByName(
      old.join(touchedNodes, Seq("node"), "left_anti"))
  }

  /** Candidate edges a batch contributes under frozen `cents`: every
    * (batch node, touched-cell mate) pair in BOTH directions — cellmates
    * may adopt a batch node as a nearer neighbor; the reverse edge carries
    * the same rounded cosine and the same `cluster` (edges never cross
    * cells under one assignment). The DISTINCT is load-bearing:
    * batch↔batch pairs already appear in both directions before the
    * reverse union, and a duplicated edge would let the top-degree heap
    * seat the same neighbor twice. Returns (node, nbr, sim, cluster),
    * checkpointed (it feeds the re-rank union AND the touched-node
    * broadcast). Batch-bounded: history outside touched cells is never
    * paired.
    */
  private def newCandidateEdges(histDf: DataFrame, batchDf: DataFrame,
      idCol: String, embCol: String, cents: Array[Array[Long]]): DataFrame = {
    def assigned(d: DataFrame) = KMeans.assignWith(d, idCol, embCol, cents)
      .select(col(idCol), col("cluster"), col("__u"))
    newCandidateEdgesAssigned(assigned(histDf), assigned(batchDf), idCol)
  }

  /** [[newCandidateEdges]] over PRE-ASSIGNED frames — (idCol, cluster,
    * __u) rows. The gate's 100 TB shape: the vector table stores the
    * quantized vector and its frozen-fit cell, so per-batch history
    * never re-runs the k-means distance kernel (O(corpus·k·dim) map work
    * the r19 soak measured as the gate's dominant residue) — only the
    * batch side assigns, once, at ingest.
    */
  private def newCandidateEdgesAssigned(histA: DataFrame, batchA: DataFrame,
      idCol: String, batchMaterialized: Boolean = false,
      touchedCellsHint: Option[Seq[Long]] = None): DataFrame = {
    import graft.functions.VectorFns
    def withNorms(d: DataFrame) =
      d.withColumn("__n", sqrt(VectorFns.dotQDouble(col("__u"), col("__u"))))
    // the assigned batch feeds FOUR consumers (touched cells, the mates
    // union, the a-side, and the broadcast's own subplan) — checkpointed
    // once per the CkptCycle rule; it is batch-sized, never the corpus.
    // A caller that already holds the batch as a checkpoint (the gate,
    // which collected touched cells from it) says so — the norm column is
    // a cheap projection over the existing blocks, and a second
    // localCheckpoint would re-materialize the whole batch per merge.
    val bAssign =
      if (batchMaterialized) withNorms(batchA)
      else graft.CkptCycle.cycle(
        graft.CkptCycle.callSiteKey("mergeKnnGraph_batch",
          "graft.operators.Similarity"),
        withNorms(batchA).localCheckpoint(true))
    // history vectors in touched cells only; norms compute AFTER the cell
    // filter, for survivors only. A caller that already knows the batch's
    // cells driver-side (the gate collected them for the partition-pruned
    // read) passes them as an isin LITERAL — no distinct exchange, no
    // broadcast materialization job; otherwise the cells come from a
    // broadcast of the batch's distinct clusters (<= k rows)
    val hTouched = withNorms(touchedCellsHint match {
      case Some(cells) => histA.filter(col("cluster").isin(cells: _*))
      case None => histA.join(
        broadcast(bAssign.select(col("cluster")).distinct()), Seq("cluster"))
    })
    val mates = hTouched.unionByName(bAssign)
    val b = bAssign.select(col(idCol).as("node"), col("cluster"),
      col("__u").as("ae"), col("__n").as("an"))
    val x = mates.select(col(idCol).as("nbr"), col("cluster"),
      col("__u").as("be"), col("__n").as("bn"))
    val pairSalt = 8
    val bS = b.withColumn("__salt", explode(lit((0 until pairSalt).toArray)))
      .repartition(batchA.sparkSession.sessionState.conf.numShufflePartitions,
        col("cluster"), col("__salt"))
    val xS = x.withColumn("__salt", pmod(hash(col("nbr")), lit(pairSalt)))
    val batchEdges = bS.join(xS, Seq("cluster", "__salt"))
      .filter(col("node") =!= col("nbr"))
      .withColumn("sim",
        round(VectorFns.dotQDouble(col("ae"), col("be")) / (col("an") * col("bn")), 6))
      .select(col("node"), col("nbr"), col("sim"), col("cluster"))
    graft.CkptCycle.cycle(
      graft.CkptCycle.callSiteKey("mergeKnnGraph_newEdges",
        "graft.operators.Similarity"),
      batchEdges.unionByName(
          batchEdges.select(col("nbr").as("node"), col("node").as("nbr"),
            col("sim"), col("cluster")))
        .distinct()
        .localCheckpoint(true))
  }

  /** The merge precondition made loud on demand (`requireCapped = true`):
    * every TOUCHED node's stored edge set must already be within `degree`.
    * Bounded — it runs on the batch-sized, already-checkpointed
    * touched-old slice, never the full table (a full-table check would
    * cost exactly the O(corpus) pass the touched-node merge exists to
    * avoid; a stale or hand-built over-degree table virtually always
    * violates on touched nodes too, since the violation is table-wide).
    * Off by default: the gates only ever store this function's own output.
    */
  private def validateCapped(touchedOld: DataFrame, degree: Int,
                             enabled: Boolean): Unit = {
    if (!enabled) return
    val bad = touchedOld.groupBy(col("node")).count()
      .filter(col("count") > degree).limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"mergeKnnGraph(requireCapped): stored graph holds ${bad.head.getLong(1)} " +
        s"edges for node ${bad.head.get(0)} (> degree $degree) — the table " +
        s"was built under different parameters; re-cap it once with " +
        s"TopKPerGroup.topK before merging incrementally.")
  }

  /** [[mergeKnnGraph]] against a CELL-PARTITIONED edge store — the
    * touched-range rewrite shape that keeps per-batch index maintenance
    * O(touched), not O(corpus). `oldTouchedCells` must be the stored edges
    * of exactly the cells the batch lands in (the partition-pruned read;
    * same top-degree precondition as [[mergeKnnGraph]]), carrying a `cell`
    * column. Returns the REPLACEMENT content for those cells — touched
    * nodes re-ranked, untouched cellmates passed through map-side — with
    * `cell` attached, ready for a per-partition swap
    * ([[graft.airbnb.Warehouse.writePartitions]]). Untouched cells'
    * partitions are never read, shuffled, or rewritten.
    *
    * Cells are independent under one frozen assignment (every edge's two
    * endpoints share a cell), so per-cell output equals what the
    * whole-table [[mergeKnnGraph]] would produce for that cell — the
    * equality contract restricted to touched partitions, which is what
    * makes PARTIAL partition swaps crash-safe: a replay re-merges only
    * the cells whose partitions still carry an older batch stamp.
    */
  def mergeKnnGraphTouchedCells(oldTouchedCells: DataFrame, histDf: DataFrame,
      batchDf: DataFrame, idCol: String, embCol: String,
      cents: Array[Array[Long]], degree: Int,
      requireCapped: Boolean = false): DataFrame = {
    def assigned(d: DataFrame) = KMeans.assignWith(d, idCol, embCol, cents)
      .select(col(idCol), col("cluster"), col("__u"))
    mergeKnnGraphTouchedCellsAssigned(oldTouchedCells, assigned(histDf),
      assigned(batchDf), idCol, degree, requireCapped)
  }

  /** [[mergeKnnGraphTouchedCells]] over PRE-ASSIGNED (idCol, cluster, __u)
    * frames — the gate's steady-state shape: the vector table stores each
    * vector's quantized form and frozen-fit cell at ingest, so the merge
    * never re-runs the k-means distance kernel over history (the r19 soak
    * measured that O(corpus·k·dim) map pass as the corpus-batch gate's
    * dominant residue). `histAssigned` may be a superset of the touched
    * cells — the candidate stage re-filters through the batch-cells
    * broadcast — but feeding it partition-pruned/cell-filtered keeps the
    * scan O(touched).
    */
  def mergeKnnGraphTouchedCellsAssigned(oldTouchedCells: DataFrame,
      histAssigned: DataFrame, batchAssigned: DataFrame, idCol: String,
      degree: Int, requireCapped: Boolean = false,
      batchMaterialized: Boolean = false,
      touchedCellsHint: Option[Seq[Long]] = None): DataFrame = {
    require(degree >= 1, s"degree must be >= 1: $degree")
    val newEdges = newCandidateEdgesAssigned(histAssigned, batchAssigned,
        idCol, batchMaterialized, touchedCellsHint)
      .withColumnRenamed("cluster", "cell")
    rerankMergeTail(oldTouchedCells, newEdges, carry = Seq("cell"), degree,
      requireCapped, "mergeKnnGraphCells_touchedOld")
  }

  /** Graph-ANN serving: best-first BEAM SEARCH over a (typically
    * persisted) [[knnGraph]] — the NSW answer shape, unrolled to a fixed
    * `hops` so the whole search is one declarative plan. Each query
    * starts from the `entryK` lowest-id candidates (the deterministic
    * entry convention the k-means seeding uses), and per hop the beam's
    * neighbors join in from the graph, every (query, candidate) is scored
    * once (exact quantized cosine, self-pairs excluded — the in-corpus
    * serving contract of cosineTopK/lshTopK), and the bounded heap keeps
    * the best `beam` per query. Returns (q_id, c_id, similarity, rank)
    * top-k of the final beam.
    *
    * Scale: per hop the frontier is |queries|·beam·degree rows — bounded
    * by the probe set, never by the corpus; the graph join shuffles on
    * `node` (the graph table's shard key), candidate vectors join in by
    * id, and queries ride broadcast. Recall < 1 by construction (beam and
    * hops trade recall for cost — the HNSW knobs); measured per corpus
    * via the recall row before a swap, like the IVF-PQ family.
    */
  def graphTopK(queries: DataFrame, candidates: DataFrame, graph: DataFrame,
                entryK: Int, beam: Int, hops: Int, k: Int): DataFrame = {
    require(entryK >= 1, s"entryK must be >= 1: $entryK")
    graphTopKFrom(queries, candidates, graph,
      c => c.select(col("c_id")).orderBy(col("c_id")).limit(entryK),
      beam, hops, k)
  }

  /** [[graphTopK]] with a COARSE ENTRY LAYER instead of the lowest-id
    * entry convention — the HNSW-upper-layer / IVF-entry serving shape:
    * a deterministic 1-in-`sampleMod` sample of the candidates (by id
    * residue) is scored exactly against every query, and the beam starts
    * from each query's best layer members rather than a fixed arbitrary
    * entry set. Entry quality then depends on the query, not on what the
    * lowest ids happen to embed, which is what lifts beam-search recall
    * on clustered corpora.
    *
    * Scale: the layer plays the IVF-centroid role — pick `sampleMod` so
    * N/sampleMod is index-node-sized (the layer's IDS broadcast; its
    * vectors join in by id like any candidate). Scoring the layer is
    * |queries| × N/sampleMod exact cosines — the same bill IVF pays for
    * its coarse quantizer, amortized across the batch.
    */
  def graphTopKLayered(queries: DataFrame, candidates: DataFrame,
                       graph: DataFrame, sampleMod: Long, beam: Int,
                       hops: Int, k: Int): DataFrame = {
    require(sampleMod >= 1, s"sampleMod must be >= 1: $sampleMod")
    graphTopKFrom(queries, candidates, graph,
      c => c.select(col("c_id")).filter(pmod(col("c_id"), lit(sampleMod)) === 0),
      beam, hops, k)
  }

  private def graphTopKFrom(queries: DataFrame, candidates: DataFrame,
                            graph: DataFrame,
                            entrySet: DataFrame => DataFrame,
                            beam: Int, hops: Int, k: Int): DataFrame = {
    require(beam >= 1 && hops >= 0 && k >= 1, s"bad beam=$beam hops=$hops k=$k")
    import graft.functions.VectorFns
    val c = candidates.select(col("c_id"),
        VectorFns.quantize(col("ce")).as("__u"))
      .withColumn("__n", sqrt(VectorFns.dotQDouble(col("__u"), col("__u"))))
    val q = queries.select(col("q_id"),
        VectorFns.quantize(col("qe")).as("__qu"))
      .withColumn("__qn", sqrt(VectorFns.dotQDouble(col("__qu"), col("__qu"))))
    // (q_id, c_id) -> + exact quantized cosine; queries broadcast, the
    // candidate-vector join shuffles ids only. Self-exclusion (q_id <>
    // c_id) is the in-corpus serving contract every sibling keeps
    // (cosineTopK, lshTopK, the recall rows' exact legs): without it an
    // in-corpus query's own vector (cos 1.0) permanently occupies a beam
    // and a final top-k slot, structurally capping measured recall@k.
    def score(cand: DataFrame): DataFrame =
      cand.filter(col("q_id") =!= col("c_id"))
        .join(c, "c_id").join(broadcast(q), "q_id")
        .withColumn("similarity",
          round(VectorFns.dotQDouble(col("__qu"), col("__u")) / (col("__qn") * col("__n")), 6))
        .select(col("q_id"), col("c_id"), col("similarity"))
    val beamDf = beamSearch(q.select(col("q_id")), graph, entrySet(c),
      score, beam, hops)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("similarity").desc, col("c_id"))
    beamDf
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }

  /** The shared fixed-hop beam loop: seed every query with the entry set,
    * then per hop join the beam's graph neighbors in, score, and keep the
    * best `beam` per query on the bounded heap.
    *
    * Iterative-loop checkpoint discipline (the PageRank/BFS rule): a lazy
    * unrolled beam re-derives the ENTIRE upstream subtree — graph build
    * included — inside every hop (PlanLint measured 28 parquet scans at
    * hops=2). The graph materializes once (production passes a read of
    * the persisted index — a ~free checkpoint), and each hop's beam is a
    * |queries|·beam frame pinned before the next hop consumes it twice
    * (neighbor join + union).
    */
  private def beamSearch(qKeys: DataFrame, graph: DataFrame, entries: DataFrame,
                         score: DataFrame => DataFrame,
                         beam: Int, hops: Int): DataFrame = {
    val g = graft.CkptCycle.cycle(
      graft.CkptCycle.callSiteKey("graphTopK_graph", "graft.operators.Similarity"),
      graph.select(col("node"), col("nbr")).localCheckpoint(true))
    val beamKey = graft.CkptCycle.callSiteKey("graphTopK_beam",
      "graft.operators.Similarity")
    var beamDf = graft.CkptCycle.cycle(beamKey, graft.plans.TopKPerGroup.topK(
        score(qKeys.crossJoin(broadcast(entries))),
        Seq("q_id"), Seq(("similarity", true), ("c_id", false)), beam)
      .localCheckpoint(true))
    var h = 0
    while (h < hops) {
      val nbrs = beamDf.select(col("q_id"), col("c_id"))
        .join(g.select(col("node").as("c_id"), col("nbr")), "c_id")
        .select(col("q_id"), col("nbr").as("c_id"))
      val cand = beamDf.select(col("q_id"), col("c_id"))
        .unionByName(nbrs).distinct()
      beamDf = graft.CkptCycle.cycle(beamKey,
        graft.plans.TopKPerGroup.topK(score(cand),
            Seq("q_id"), Seq(("similarity", true), ("c_id", false)), beam)
          .localCheckpoint(true))
      h += 1
    }
    beamDf
  }

  /** DiskANN-style graph serving: the beam walks the graph scored by
    * PRODUCT-QUANTIZED approximate inner products (integer ADC lookups
    * against the unit-long codebooks — exact arithmetic, so every beam
    * decision replays in SQL), and only the FINAL beam pays an exact
    * cosine re-rank against true embeddings. This is the memory layout
    * the DiskANN/SPANN family serves from: the walk touches codes
    * (bytes per vector) and the graph's edge table; full vectors are
    * fetched once per query for the last `beam` candidates.
    *
    * Scale: per hop the frontier is |queries|·beam·degree CODE rows; true
    * embeddings join in on ~|queries|·beam surviving ids at the end. The
    * approximate scores order the walk, the exact re-rank orders the
    * answer — recall vs the exact-scored walk is measured per corpus via
    * the recall rows, like every approximate family here.
    */
  def graphTopKPQ(queries: DataFrame, candidates: DataFrame, graph: DataFrame,
                  books: Array[Array[Array[Long]]], entryK: Int, beam: Int,
                  hops: Int, k: Int): DataFrame = {
    import graft.functions.VectorFns
    graphTopKPQWithIndex(queries, candidates, graph,
      candidates.select(col("c_id"),
        pqEncodeUnits(VectorFns.quantize(col("ce")), books).as("codes")),
      books, entryK, beam, hops, k)
  }

  /** [[graphTopKPQ]] against a pre-built (typically warehouse- or
    * fixture-persisted) (c_id, codes) table — the serving split: the walk
    * reads codes and edges from persisted artifacts, true embeddings join
    * in only for the final beam's exact re-rank. Persist the codes with
    * the books ([[pqCodebooksUnitsDf]]) the way the IVF-PQ family does.
    */
  def graphTopKPQWithIndex(queries: DataFrame, candidates: DataFrame,
                           graph: DataFrame, codesIdx: DataFrame,
                           books: Array[Array[Array[Long]]], entryK: Int,
                           beam: Int, hops: Int, k: Int): DataFrame = {
    require(entryK >= 1 && beam >= 1 && hops >= 0 && k >= 1,
      s"bad entryK=$entryK beam=$beam hops=$hops k=$k")
    import graft.functions.VectorFns
    val m = books.length
    val kCent = books(0).length
    val sub = books(0)(0).length
    // the PQ-coded candidate table feeds every hop — materialized once
    // (a ~free checkpoint when the caller passes a persisted-index read)
    val cIdx = graft.CkptCycle.cycle(
      graft.CkptCycle.callSiteKey("graphTopKPQ_codes", "graft.operators.Similarity"),
      codesIdx.select(col("c_id"), col("codes")).localCheckpoint(true))
    val lutCol = concat((0 until m).map { j =>
      kernelCol(graft.plans.CellDotsQ(
        kernelExpr(slice(VectorFns.quantize(col("qe")), j * sub + 1, sub)),
        books(j).toIndexedSeq.map(_.toIndexedSeq)))
    }: _*)
    val q = queries.select(col("q_id"), col("qe")).withColumn("lut", lutCol)
      .select(col("q_id"), col("lut"))
    val adcTerms = (0 until m).map(j =>
      element_at(col("lut"),
        (col("codes").getItem(j) + lit(j.toLong * kCent) + 1L).cast(IntegerType)))
    def score(cand: DataFrame): DataFrame =
      cand.filter(col("q_id") =!= col("c_id"))
        .join(cIdx, "c_id").join(broadcast(q), "q_id")
        .withColumn("similarity", adcTerms.reduce(_ + _))
        .select(col("q_id"), col("c_id"), col("similarity"))
    val entries = cIdx.select(col("c_id")).orderBy(col("c_id")).limit(entryK)
    val beamDf = beamSearch(queries.select(col("q_id")), graph, entries,
      score, beam, hops)
    // exact cosine re-rank of the final beam only — the DiskANN
    // discipline. Rank on the cosine ROUNDED to 9 decimals with the c_id
    // tie-break (the round-6 cross-engine discipline graphTopK already
    // follows): the SQL oracles rank by round(cos, 9) DESC, and an
    // unrounded float order could rank-flip candidates whose cosines
    // differ only past 1e-9 (ADVICE r17).
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("similarity"), 9).desc, col("c_id"))
    beamDf.select(col("q_id"), col("c_id"))
      .join(withNorm(candidates, "ce", "cn"), Seq("c_id"))
      .join(broadcast(withNorm(queries, "qe", "qn")), Seq("q_id"))
      .withColumn("similarity", cosinePre("qe", "ce", col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }

  /** MATRYOSHKA (MRL) serving: a PREFIX-dimension IVF shortlist followed
    * by a FULL-dimension exact re-rank — the serving shape MRL embeddings
    * exist for (store and scan the low-dim prefix, keep the tail only for
    * the final re-rank). `prefixIdx` is the persisted prefix index:
    * (c_id, cluster, tv = quantized `prefixDim`-long prefix, tn = its
    * norm) — `1/ (dim/prefixDim)` the bytes of the full-vector table, and
    * when written partitioned by `cluster` the probe reads ONLY the
    * queries' cells (partition pruning — the IVF entry). Per query: assign
    * its prefix to the nearest centroid (the same [[KMeans.assignWith]]
    * arithmetic that built the index), score its cell's members by
    * quantized prefix cosine (rounded to 9, c_id tie-break — the
    * cross-engine rank discipline) on the bounded heap, and fetch FULL
    * vectors once per query for the `shortlist` survivors' exact re-rank.
    *
    * Scale: the scan side is the prefix index's probed cells only; full
    * vectors join by id for |queries|·shortlist rows. Recall < 1 by
    * construction (prefix ranking + single-cell entry); measured per
    * corpus by the recall sibling before a swap, like every approximate
    * family here.
    */
  def matryoshkaTopKServe(queries: DataFrame, candidates: DataFrame,
                          prefixIdx: DataFrame, cents: Array[Array[Long]],
                          prefixDim: Int, shortlist: Int, k: Int,
                          nProbe: Int = 1): DataFrame = {
    require(prefixDim >= 1 && shortlist >= 1 && k >= 1,
      s"bad prefixDim=$prefixDim shortlist=$shortlist k=$k")
    import graft.functions.VectorFns
    // multi-probe entry: each query probes its nProbe nearest cells (ties
    // to the lowest index — replayable as the kmeans distance CTE's
    // row_number); a candidate lives in exactly one cell, so probe lists
    // never duplicate a candidate within a query
    val qAssign = KMeans.assignProbes(
        queries.select(col("q_id"), slice(col("qe"), 1, prefixDim).as("__pe")),
        "q_id", "__pe", cents, nProbe)
      .withColumn("__qn", sqrt(VectorFns.dotQDouble(col("__u"), col("__u"))))
      .select(col("q_id"), col("cluster"), col("__u").as("__qu"), col("__qn"))
    val shortDf = graft.plans.TopKPerGroup.topK(
      prefixIdx.join(broadcast(qAssign), Seq("cluster"))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("psim", round(
          VectorFns.dotQDouble(col("__qu"), col("tv")) / (col("__qn") * col("tn")), 9))
        .select(col("q_id"), col("c_id"), col("psim")),
      Seq("q_id"), Seq(("psim", true), ("c_id", false)), shortlist)
    val cFull = candidates.select(col("c_id"),
        VectorFns.quantize(col("ce")).as("__cu"))
      .withColumn("__cn", sqrt(VectorFns.dotQDouble(col("__cu"), col("__cu"))))
    val qFull = queries.select(col("q_id"),
        VectorFns.quantize(col("qe")).as("__fu"))
      .withColumn("__fn", sqrt(VectorFns.dotQDouble(col("__fu"), col("__fu"))))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("similarity"), 9).desc, col("c_id"))
    shortDf.select(col("q_id"), col("c_id"))
      .join(cFull, Seq("c_id"))
      .join(broadcast(qFull), Seq("q_id"))
      .withColumn("similarity",
        VectorFns.dotQDouble(col("__fu"), col("__cu")) / (col("__fn") * col("__cn")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }

  /** LSH-bucketed ANN top-k: candidates are scored only inside the query's
    * bucket. Recall < 1 by construction; nBits trades recall for speed.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, nBits: Int, k: Int): DataFrame = {
    val q = withNorm(queries, "qe", "qn").withColumn("bucket", lshBucket("qe", nBits))
    val c = withNorm(candidates, "ce", "cn").withColumn("bucket", lshBucket("ce", nBits))
    val w = Window.partitionBy(col("q_id")).orderBy(col("similarity").desc, col("c_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("similarity", cosinePre("qe", "ce", col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("similarity"), col("rank"))
  }
}
