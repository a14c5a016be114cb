package graft

import graft.functions.{TextFns, VectorFns}
import graft.operators.Dedup
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen kernels (graft.plans.VectorKernels / SketchKernels) must agree
  * value-for-value with the HOF decimal-lattice forms they replaced — those
  * HOF forms are the executable specification the DuckDB oracle SQL is
  * generated from, so kernel ≡ HOF on real fixture data implies the oracle
  * gate is unaffected by the swap.
  */
class KernelParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, sf, "embeddings").cache()
  private lazy val docs = Tables.load(spark, sf, "documents").cache()

  test("QuantizeVec element == CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)) unscaled") {
    val n = emb.filter(
      exists(zip_with(
        VectorFns.quantize(col("embedding")),
        expr("transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)) * 1000000 AS BIGINT))"),
        (a, b) => a =!= b), x => x)).count()
    assert(n == 0L)
  }

  test("DotQ on quantized vectors == VectorFns.dotDec (exact decimal HOF)") {
    val pairs = emb.select(col("vec_id"), col("embedding").as("e1"))
      .crossJoin(broadcast(
        emb.filter(col("vec_id") < 3).select(col("embedding").as("e2"))))
    val bad = pairs
      .withColumn("kernel", VectorFns.dotQ(
        VectorFns.quantize(col("e1")), VectorFns.quantize(col("e2"))))
      .withColumn("hof", VectorFns.dotDec("e1", "e2").cast(DecimalType(32, 12)))
      .filter(!(col("kernel") <=> col("hof")))
      .count()
    assert(bad == 0L)
  }

  test("CellDistsQ / CellDotsQ == integer HOF folds over unit-long centroids") {
    // fixed centroids in unit-longs (values ±2.0 at 1e-6 scale and an
    // asymmetric one), 64-dim like the fixture embeddings
    val cents: Seq[Seq[Long]] = Seq(
      Seq.fill(64)(2000000L),
      Seq.fill(64)(-1500000L),
      (0 until 64).map(i => (i - 32) * 100000L))
    def arrLit(c: Seq[Long]): String = s"array(${c.map(v => v + "L").mkString(",")})"
    def hofDist(c: Seq[Long]): org.apache.spark.sql.Column =
      expr(s"aggregate(zip_with(qv, ${arrLit(c)}, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)")
    def hofDot(c: Seq[Long]): org.apache.spark.sql.Column =
      expr(s"aggregate(zip_with(qv, ${arrLit(c)}, (x, y) -> x * y), 0L, (a, v) -> a + v)")
    val df = emb.withColumn("qv", VectorFns.quantize(col("embedding")))
      .withColumn("kdists", GraftColumnBridge.column(
        graft.plans.CellDistsQ(GraftColumnBridge.expression(col("qv")), cents)))
      .withColumn("kdots", GraftColumnBridge.column(
        graft.plans.CellDotsQ(GraftColumnBridge.expression(col("qv")), cents)))
    val badD = df.filter(cents.indices.map(i =>
        !(element_at(col("kdists"), i + 1) <=> hofDist(cents(i)))).reduce(_ || _))
      .count()
    val badP = df.filter(cents.indices.map(i =>
        !(element_at(col("kdots"), i + 1) <=> hofDot(cents(i)))).reduce(_ || _))
      .count()
    assert(badD == 0L && badP == 0L)
  }

  test("CellDistsQ / CellDotsQ null on dimension mismatch or null element") {
    val cents: Seq[Seq[Long]] = Seq(Seq(1L, 2L))
    val df = Seq(1L, 2L, 3L).toDF("id").selectExpr("id",
      """CASE WHEN id = 1 THEN array(1L, 2L, 3L)
              WHEN id = 2 THEN array(5L, 6L)
              ELSE array(7L, CAST(NULL AS BIGINT)) END AS qv""")
    val out = df.select(col("id"),
        GraftColumnBridge.column(graft.plans.CellDistsQ(
          GraftColumnBridge.expression(col("qv")), cents)).as("d"),
        GraftColumnBridge.column(graft.plans.CellDotsQ(
          GraftColumnBridge.expression(col("qv")), cents)).as("p"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))   // dim mismatch → null
    assert(out(1).getSeq[Long](1) == Seq((5L-1L)*(5L-1L) + (6L-2L)*(6L-2L)))
    assert(out(1).getSeq[Long](2) == Seq(5L*1L + 6L*2L))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))   // null element → null
  }

  test("SubVecQ == zip_with(a, b, (x, y) -> x - y); null on mismatch/null element") {
    // parity on real quantized vectors: residual vs the HOF subtract
    val pairs = emb.select(col("vec_id"), col("embedding").as("e1"))
      .crossJoin(broadcast(
        emb.filter(col("vec_id") < 3).select(col("embedding").as("e2"))))
      .withColumn("a", VectorFns.quantize(col("e1")))
      .withColumn("b", VectorFns.quantize(col("e2")))
    val bad = pairs
      .withColumn("kernel", GraftColumnBridge.column(graft.plans.SubVecQ(
        GraftColumnBridge.expression(col("a")),
        GraftColumnBridge.expression(col("b")))))
      .withColumn("hof", zip_with(col("a"), col("b"), (x, y) => x - y))
      .filter(!(col("kernel") <=> col("hof")))
      .count()
    assert(bad == 0L)
    // poisoning contract: dim mismatch and null element both null the row
    val df = Seq(1L, 2L, 3L).toDF("id").selectExpr("id",
      """CASE WHEN id = 1 THEN array(5L, 6L)
              WHEN id = 2 THEN array(5L)
              ELSE array(5L, CAST(NULL AS BIGINT)) END AS qv""")
    val out = df.select(col("id"),
        GraftColumnBridge.column(graft.plans.SubVecQ(
          GraftColumnBridge.expression(col("qv")),
          GraftColumnBridge.expression(expr("array(1L, 2L)")))).as("r"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == Seq(4L, 4L))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("DotFloat == double zip_with/aggregate fold, bit for bit") {
    val hof = expr("aggregate(zip_with(e1, e2, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    val pairs = emb.select(col("embedding").as("e1"))
      .crossJoin(broadcast(emb.filter(col("vec_id") < 3).select(col("embedding").as("e2"))))
    val bad = pairs
      .withColumn("kernel", graft.operators.Similarity.dotFast("e1", "e2"))
      .withColumn("hof", hof)
      // exact equality: same summation order, same primitive double ops
      .filter(!(col("kernel") <=> col("hof"))).count()
    assert(bad == 0L)
  }

  test("LshBucketQ == signProjection decimal bit stack (4 and 8 bits)") {
    for (bits <- Seq(4, 8)) {
      val stack = (0 until bits)
        .map(j => when(VectorFns.signProjection("embedding", j) > 0, lit(1L << j))
          .otherwise(lit(0L)))
        .reduce(_ + _)
      val bad = emb
        .withColumn("kernel",
          VectorFns.lshBucketQ(VectorFns.quantize(col("embedding")), bits))
        .withColumn("hof", stack)
        .filter(col("kernel") =!= col("hof")).count()
      assert(bad == 0L, s"bucket mismatch at nBits=$bits")
    }
  }

  test("ShinglesDistinct == distinct exploded transform/slice/concat_ws shingles") {
    val k = 4
    val viaKernel = Dedup.shingles(docs, "doc_id", "text", k)
    val viaHof = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), explode(TextFns.shingleExpr("t", k)).as("sh"))
      .distinct()
    assert(viaKernel.count() == viaKernel.distinct().count(), "kernel emitted duplicate shingles")
    assert(viaKernel.exceptAll(viaHof).count() == 0L)
    assert(viaHof.exceptAll(viaKernel).count() == 0L)
  }

  test("ShingleHashes: one distinct hash per distinct shingle, same join equalities") {
    val k = 4
    // the hashed twin must agree with the string kernel on per-doc shingle
    // multiplicity (injective on this corpus — a collision would collapse
    // two distinct shingles and fail the count parity)...
    val viaStr = Dedup.shingles(docs, "doc_id", "text", k)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val viaHash = Dedup.shingleHashes(docs, "doc_id", "text", k)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    assert(viaHash.exceptAll(viaStr).count() == 0L)
    assert(viaStr.exceptAll(viaHash).count() == 0L)
    // ...and on the CROSS-DOCUMENT equality structure a decontamination
    // join consumes: equal shingle strings ⇒ equal hashes, distinct
    // strings ⇒ distinct hashes, doc pair by doc pair
    val s1 = Dedup.shingles(docs, "doc_id", "text", k)
      .select(col("doc_id").as("a"), col("sh"))
    val s2 = Dedup.shingles(docs, "doc_id", "text", k)
      .select(col("doc_id").as("b"), col("sh"))
    val strPairs = s1.join(s2, "sh").filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val h1 = Dedup.shingleHashes(docs, "doc_id", "text", k)
      .select(col("doc_id").as("a"), col("__sk"))
    val h2 = Dedup.shingleHashes(docs, "doc_id", "text", k)
      .select(col("doc_id").as("b"), col("__sk"))
    val hashPairs = h1.join(h2, "__sk").filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    assert(hashPairs.exceptAll(strPairs).count() == 0L)
    assert(strPairs.exceptAll(hashPairs).count() == 0L)
    // below k tokens → empty, like the string kernel
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.shingleHashes(tiny, "doc_id", "text", k).count() == 0L)
  }

  test("WinnowFingerprints == shingleExpr -> polyHashEach -> winnowExpr HOF lattice") {
    val (k, w) = (3, 4)
    val base = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k)
    val viaKernel = base.select(col("doc_id"),
      graft.functions.SketchFns.winnowFingerprints(col("t"), k, w).as("fp"))
    val viaHof = base
      .withColumn("sh", TextFns.shingleExpr("t", k))
      .withColumn("hs", TextFns.polyHashEach("sh"))
      .select(col("doc_id"), TextFns.winnowExpr("hs", w).as("fp"))
    // exact per-document fingerprint ARRAYS (values + first-occurrence
    // order) — the values cross the engine boundary in the winnow oracles,
    // so this parity must be bit-exact, not just set-equal
    assert(viaKernel.exceptAll(viaHof).count() == 0L)
    assert(viaHof.exceptAll(viaKernel).count() == 0L)
    // short-document rule: below one full window -> the global minimum
    val tiny = Seq((1L, "a b c"), (2L, "a b c d")).toDF("doc_id", "text")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
    val kTiny = tiny.select(col("doc_id"),
      graft.functions.SketchFns.winnowFingerprints(col("t"), k, w).as("fp"))
    val hTiny = tiny
      .withColumn("sh", TextFns.shingleExpr("t", k))
      .withColumn("hs", TextFns.polyHashEach("sh"))
      .select(col("doc_id"), TextFns.winnowExpr("hs", w).as("fp"))
    assert(kTiny.exceptAll(hTiny).count() == 0L)
    assert(hTiny.exceptAll(kTiny).count() == 0L)
    assert(kTiny.filter(col("doc_id") === 1L).head().getSeq[Long](1).length == 1)
  }

  test("ChunkHashes: same per-doc multiplicity and equality structure as chunkExpr") {
    val k = 5
    val base = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
    // per-doc chunk counts match the HOF form exactly (incl. the final
    // partial chunk)
    val viaStr = base.select(col("doc_id"),
        explode(TextFns.chunkExpr("t", k, k)).as("c"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val viaHash = base.select(col("doc_id"),
        explode(graft.functions.SketchFns.chunkHashes(col("t"), k, k)).as("c"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    assert(viaHash.exceptAll(viaStr).count() == 0L)
    assert(viaStr.exceptAll(viaHash).count() == 0L)
    // cross-document document-frequency structure (what boilerplate
    // accounting consumes): equal chunk strings <=> equal hashes
    val dfStr = base.select(col("doc_id"), explode(TextFns.chunkExpr("t", k, k)).as("c"))
      .groupBy(col("c")).agg(countDistinct(col("doc_id")).as("df"))
      .groupBy(col("df")).agg(count(lit(1)).as("n"))
    val dfHash = base.select(col("doc_id"),
        explode(graft.functions.SketchFns.chunkHashes(col("t"), k, k)).as("c"))
      .groupBy(col("c")).agg(countDistinct(col("doc_id")).as("df"))
      .groupBy(col("df")).agg(count(lit(1)).as("n"))
    assert(dfHash.exceptAll(dfStr).count() == 0L)
    assert(dfStr.exceptAll(dfHash).count() == 0L)
  }

  test("ChunkHashStrings: chunk text == chunkExpr HOF; ck == ChunkHashes key space") {
    val k = 5
    val base = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
    val viaStruct = base.select(col("doc_id"), posexplode(
        graft.functions.SketchFns.chunkHashStrings(col("t"), k, k)))
      .select(col("doc_id"), col("pos"), col("col.ck").as("ck"),
        col("col.chunk").as("chunk"))
    // chunk strings and their order match the HOF form exactly
    val viaHof = base.select(col("doc_id"),
        posexplode(TextFns.chunkExpr("t", k, k)))
      .select(col("doc_id"), col("pos"), col("col").as("chunk"))
    assert(viaStruct.select("doc_id", "pos", "chunk")
      .exceptAll(viaHof).count() == 0L)
    assert(viaHof.exceptAll(
      viaStruct.select("doc_id", "pos", "chunk")).count() == 0L)
    // ck lands in the SAME key space as the hash-only kernel — the C4
    // removal's dfreq side (ChunkHashes) and probe side (this kernel)
    // must join on identical keys
    val viaHash = base.select(col("doc_id"), posexplode(
        graft.functions.SketchFns.chunkHashes(col("t"), k, k)))
      .select(col("doc_id"), col("pos"), col("col").as("ck"))
    assert(viaStruct.select("doc_id", "pos", "ck")
      .exceptAll(viaHash).count() == 0L)
    assert(viaHash.exceptAll(
      viaStruct.select("doc_id", "pos", "ck")).count() == 0L)
  }

  test("PolyHashEach kernel == per-token aggregate/split HOF fold") {
    val base = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
    val viaKernel = base.select(col("doc_id"),
      graft.functions.SketchFns.polyHashEach(col("t")).as("h"))
    val viaHof = base.select(col("doc_id"), TextFns.polyHashEach("t").as("h"))
    assert(viaKernel.exceptAll(viaHof).count() == 0L)
    assert(viaHof.exceptAll(viaKernel).count() == 0L)
  }

  test("MinHashSig == groupBy-min over hashed distinct shingles") {
    val k = 4
    val viaKernel = Dedup.minhashSignatures(docs, "doc_id", "text", k)
    val hashed = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), explode(TextFns.shingleExpr("t", k)).as("sh"))
      .distinct()
      .withColumn("h", TextFns.polyHash("sh"))
    val sigCols = TextFns.minhashPerms.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % TextFns.minhashP).as(s"m$i")
    }
    val viaHof = hashed.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    assert(viaKernel.exceptAll(viaHof).count() == 0L)
    assert(viaHof.exceptAll(viaKernel).count() == 0L)
  }

  test("SimHashBits == explode/groupBy per-bit vote, incl. duplicate tokens") {
    val bits = 16
    val viaKernel = Dedup.simhash(docs, "doc_id", "text", bits)
    val tok = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .withColumn("h", TextFns.polyHash("tok"))
    val bitSums = (0 until bits).map(i =>
      sum(expr(s"CASE WHEN (shiftright(h, $i) & 1) = 1 THEN 1 ELSE -1 END")).as(s"s$i"))
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until bits)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val viaHof = agg.select(col("doc_id"), sim.as("simhash"))
    assert(viaKernel.exceptAll(viaHof).count() == 0L)
    assert(viaHof.exceptAll(viaKernel).count() == 0L)
  }

  test("hash kernels match the HOF fold on empty, whitespace-only, and non-ASCII text") {
    // ascii('') = 0 and split('','') = [''] in BOTH engines, so '' hashes to
    // 217, not the seed; ascii is code-point based ('é' → 233, '😀' → 128512).
    // These inputs are absent from the fixtures — this is the regression net.
    assert(graft.plans.PolyHash.hash("") == 217L)
    assert(graft.plans.PolyHash.hash("abc") == 304891L)
    assert(graft.plans.PolyHash.hash("é") == (7L * 31 + 233) % 2147483647L)
    assert(graft.plans.PolyHash.hash("😀") == (7L * 31 + 128512) % 2147483647L)
    assert(graft.plans.SketchKernels.polyHashCp("") == 217L)
    assert(graft.plans.SketchKernels.polyHashCp("😀") == (7L * 31 + 128512) % 2147483647L)
    val docs = Seq((1L, ""), (2L, "   "), (3L, "é über 😀 straße"),
      (4L, "plain ascii text here")).toDF("doc_id", "text")
    val viaKernel = Dedup.simhash(docs, "doc_id", "text", 16)
    val tok = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .withColumn("h", TextFns.polyHash("tok"))
    val bitSums = (0 until 16).map(i =>
      sum(expr(s"CASE WHEN (shiftright(h, $i) & 1) = 1 THEN 1 ELSE -1 END")).as(s"s$i"))
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 16)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val viaHof = agg.select(col("doc_id"), sim.as("simhash"))
    assert(viaKernel.exceptAll(viaHof).count() == 0L)
    assert(viaHof.exceptAll(viaKernel).count() == 0L)
    // minhash over 1-grams exercises the empty-shingle path ('' hashes 217)
    val sig1 = Dedup.minhashSignatures(docs, "doc_id", "text", 1)
    val hashed1 = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(col("t")).as("sh")).distinct()
      .withColumn("h", TextFns.polyHash("sh"))
    val sigCols1 = TextFns.minhashPerms.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % TextFns.minhashP).as(s"m$i")
    }
    val hof1 = hashed1.groupBy(col("doc_id")).agg(sigCols1.head, sigCols1.tail: _*)
    assert(sig1.exceptAll(hof1).count() == 0L && hof1.exceptAll(sig1).count() == 0L)
  }

  test("quantize mirrors the cast on DECIMAL(12,6) precision overflow (ANSI and not)") {
    // |x| >= 1e6 overflows precision 12. Spark's CAST throws under ANSI mode
    // (the 4.x default) and yields null otherwise — the kernel must do both,
    // not quietly emit a finite value the HOF lattice would reject.
    def big = Seq((1L, Array(1234567.0f, 1.0f))).toDF("id", "emb")
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      intercept[Exception] {
        big.select(VectorFns.dotQ(VectorFns.quantize(col("emb")),
          VectorFns.quantize(col("emb")))).collect()
      }
      intercept[Exception] { big.select(VectorFns.dotDec("emb", "emb")).collect() }
      spark.conf.set("spark.sql.ansi.enabled", "false")
      // rebuild AFTER the conf flip — QuantizeVec captures ansi at planning
      val r = big.select(col("id"),
          VectorFns.dotQ(VectorFns.quantize(col("emb")), VectorFns.quantize(col("emb"))).as("kernel"),
          VectorFns.dotDec("emb", "emb").as("hof"))
        .collect()
      assert(r(0).isNullAt(1) && r(0).isNullAt(2), "overflow row must be null in both forms")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
  }

  test("sketch kernels handle degenerate inputs like the HOF forms") {
    // < k tokens → no shingles / no signature row; duplicates collapse
    val df = Seq((1L, "a b c"), (2L, "x x x x x"), (3L, "one two three four five"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", 4)
    assert(sh.filter(col("doc_id") === 1L).count() == 0L)
    assert(sh.filter(col("doc_id") === 2L).count() == 1L) // "x x x x" ×2 positions → ONE distinct
    val sig = Dedup.minhashSignatures(df, "doc_id", "text", 4)
    assert(sig.count() == 2L)
    // n < k via the raw expression → null signature
    val raw = df.select(graft.functions.SketchFns.minhashSig(
      TextFns.tokens(col("text")), 4).as("sig"))
    assert(raw.filter(col("sig").isNull).count() == 1L)
    // empty-ish strings: simhash of "" is the hash-7 vote, not a crash
    val s0 = Seq((1L, "")).toDF("doc_id", "text")
    assert(Dedup.simhash(s0, "doc_id", "text", 16).count() == 1L)
  }
}
