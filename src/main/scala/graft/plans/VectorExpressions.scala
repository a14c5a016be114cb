package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Scaled-long kernels for the engine's exact-decimal embedding arithmetic.
  *
  * VectorFns' oracle-parity strategy quantizes each float to DECIMAL(12,6)
  * (float → double widening is exact, double → decimal rounds HALF_UP like
  * both engines' CAST), multiplies pairs exactly (scale 12), and sums exactly.
  * The higher-order-function formulation of that lattice is semantically
  * perfect but runs interpreted (HOFs are CodegenFallback) with a boxed
  * Decimal allocation per element — the dominant cost of every ANN/dedup
  * query at bench time.
  *
  * These expressions compute the IDENTICAL values on primitive longs:
  * a DECIMAL(12,6) is an integer count of 1e-6 units, so the quantized vector
  * is an `array<long>` (unscaled at scale 6), a product of two elements is an
  * unscaled long at scale 12, and the exact decimal dot product is a plain
  * long sum re-wrapped as Decimal(32,12). `Math.multiplyExact`/`addExact`
  * guard the (out-of-contract, |x| ≳ 2e6) overflow region loudly instead of
  * wrapping silently.
  *
  * Parity proof obligations, each covered by VectorKernelSpec:
  *   - QuantizeVec(x)[i]   == CAST(CAST(x[i] AS DOUBLE) AS DECIMAL(12,6)) × 1e6
  *   - DotQ(q(a), q(b))    == VectorFns.dotDec(a, b)   (exact decimal)
  *   - DotFloat(a, b)      == Similarity.dotFast(a, b) (sequential double fold)
  *   - LshBucketQ(q(a), n) == Similarity.lshBucket(a, n)
  */
object VectorKernels {

  /** Quantize an array<float> to unscaled longs at scale 6, replicating
    * Spark's Cast(float→double→DECIMAL(12,6)): BigDecimal.valueOf (shortest
    * decimal repr of the exact double) then setScale(6, HALF_UP). Returns
    * null (whole vector) if any element is null/NaN/Inf — the same
    * null-poisoning the zip_with lattice produces on its dot products.
    */
  def quantize(a: ArrayData): ArrayData = quantize(a, ansi = false)

  def quantize(a: ArrayData, ansi: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
      val q = java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      // DECIMAL(12,6) holds |unscaled| < 1e12; on precision overflow Spark's
      // CAST throws under ANSI mode and yields null otherwise — the kernel
      // must do the same, not quietly emit a value the HOF lattice (and the
      // oracle) would reject.
      if (q <= -1000000000000L || q >= 1000000000000L) {
        if (ansi) throw new ArithmeticException(
          s"$d cannot be represented as Decimal(12, 6) (quantize_vec, ANSI mode)")
        return null
      }
      out(i) = q
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Exact dot product of two quantized vectors as an unscaled long at scale
    * 12; null on dimension mismatch (zip_with would null-pad and poison).
    */
  def dotUnscaled(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      // QuantizeVec never emits null elements, but the SQL-registered `dotq`
      // accepts any array<long> — null-poison like the decimal HOF would
      // rather than unboxing null to 0
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s = Math.addExact(s, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Plain double dot product, sequential left fold — bit-identical to
    * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)` (the
    * fast ranking path). Null on length mismatch or null element.
    */
  def dotFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Squared L2 distance to each of k centroids (flattened row-major, `dim`
    * doubles per centroid) — sequential double fold per centroid, matching
    * the `aggregate(zip_with(emb, cent, (x,y) -> (x-y)*(x-y)), 0d, +)` HOF
    * stack bit-for-bit. Null on dimension mismatch or null element.
    */
  def cellDists(a: ArrayData, cents: Array[Double], dim: Int): ArrayData = {
    val n = a.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val k = cents.length / dim
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0
      i = 0
      while (i < dim) {
        val d = a.getFloat(i).toDouble - cents(c * dim + i)
        s += d * d
        i += 1
      }
      out(c) = s
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Exact integer squared L2 distance of a QUANTIZED (unit-long) vector to
    * each of k unit-long centroids (flattened row-major). Every term is an
    * exact product of 1e-6-unit counts, so the distance — and any argmin
    * over it — replays bit-for-bit in a BIGINT SQL oracle (the PQ analog of
    * the k-means fixed-point discipline). Null on dimension mismatch or
    * null element; overflow throws (unit diffs would need |v| ≳ 2e9 units =
    * 2000.0 to overflow, far outside the DECIMAL(12,6) domain).
    */
  def cellDistsQ(a: ArrayData, cents: Array[Long], dim: Int): ArrayData = {
    val n = a.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val k = cents.length / dim
    val out = new Array[Long](k)
    var c = 0
    while (c < k) {
      var s = 0L
      i = 0
      while (i < dim) {
        val d = a.getLong(i) - cents(c * dim + i)
        s = Math.addExact(s, Math.multiplyExact(d, d))
        i += 1
      }
      out(c) = s
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Exact integer dot of a QUANTIZED vector with each of k unit-long
    * centroids (flattened row-major) — the ADC lookup-table kernel: one
    * call computes the query's whole table for a subspace. Same exactness
    * and null contract as [[cellDistsQ]].
    */
  def cellDotsQ(a: ArrayData, cents: Array[Long], dim: Int): ArrayData = {
    val n = a.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val k = cents.length / dim
    val out = new Array[Long](k)
    var c = 0
    while (c < k) {
      var s = 0L
      i = 0
      while (i < dim) {
        s = Math.addExact(s, Math.multiplyExact(a.getLong(i), cents(c * dim + i)))
        i += 1
      }
      out(c) = s
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Element-wise difference of two quantized vectors (a - b) — the
    * residual step of IVF-PQ encoding. Exact long subtraction; null on
    * dimension mismatch or null element (the dotUnscaled poisoning rule).
    */
  def subVecQ(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      out(i) = Math.subtractExact(a.getLong(i), b.getLong(i))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Sign-random-projection LSH bucket over a quantized vector: bit j is set
    * iff sum_i q_i·s(i,j) > 0 with s = ±1 from ((i+1)·7919 + j·104729) % 97 % 2
    * (i 0-based). The projection sum of scale-6 longs is exact, so its sign —
    * and hence the bucket — matches the decimal HOF form exactly.
    */
  def lshBucket(q: ArrayData, nBits: Int): java.lang.Long = {
    val n = q.numElements()
    var i = 0
    while (i < n) { if (q.isNullAt(i)) return null; i += 1 }
    var bucket = 0L
    var j = 0
    while (j < nBits) {
      var s = 0L
      i = 0
      while (i < n) {
        val sign = if ((((i + 1) * 7919L + j * 104729L) % 97L) % 2L == 0L) 1L else -1L
        s = Math.addExact(s, sign * q.getLong(i))
        i += 1
      }
      if (s > 0L) bucket |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(bucket)
  }
}

/** array<float> → array<long>: each element quantized to its unscaled
  * DECIMAL(12,6) value (see [[VectorKernels.quantize]]).
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // Captured at planning, like Cast does: under ANSI a precision overflow
  // throws; otherwise it null-poisons the vector.
  private val ansi: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec requires array<float>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.quantize(input.asInstanceOf[ArrayData], ansi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.VectorKernels.quantize($c, $ansi);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** (array<long>, array<long>) → DECIMAL(32,12): the exact decimal dot product
  * of two quantized vectors (see [[VectorKernels.dotUnscaled]]).
  */
case class DotQ(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DecimalType(32, 12)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dotq requires two array<long> (quantized) inputs, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val s = VectorKernels.dotUnscaled(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (s == null) null else Decimal(s.longValue(), 32, 12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotqSum")
      s"""
      java.lang.Long $tmp = graft.plans.VectorKernels.dotUnscaled($a, $b);
      if ($tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = org.apache.spark.sql.types.Decimal.apply($tmp.longValue(), 32, 12);
      }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotQ =
    copy(left = l, right = r)
}

/** (array<float>, array<float>) → double: plain sequential-fold dot product,
  * the codegen'd twin of Similarity.dotFast (ranking paths, no decimal).
  */
case class DotFloat(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dotf requires two array<float> inputs, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotfSum")
      s"""
      java.lang.Double $tmp = graft.plans.VectorKernels.dotFloat($a, $b);
      if ($tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $tmp.doubleValue();
      }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFloat =
    copy(left = l, right = r)
}

/** array<float> → array<double>: squared L2 distance to each centroid of a
  * plan-time centroid table (IVF coarse quantizer). The centroid matrix rides
  * into codegen as a reference object, not a literal expression tree — k×dim
  * doubles of driver state, broadcast with the plan.
  */
case class CellDists(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty && centroids.forall(_.length == centroids.head.length),
    "centroids must be non-empty and rectangular")
  private val dim = centroids.head.length
  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_dists requires array<float>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.cellDists(input.asInstanceOf[ArrayData], flat, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cellDistsCents", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.VectorKernels.cellDists($c, $centsRef, $dim);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CellDists =
    copy(child = newChild)
}

/** array<long> (quantized) → array<long>: exact integer squared distance to
  * each centroid ([[VectorKernels.cellDistsQ]]) — the oracle-replayable PQ
  * encode/train kernel.
  */
case class CellDistsQ(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression {
  require(centroids.nonEmpty && centroids.forall(_.length == centroids.head.length),
    "centroids must be non-empty and rectangular")
  private val dim = centroids.head.length
  @transient private lazy val flat: Array[Long] = centroids.flatten.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_dists_q requires array<long> (quantized), got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.cellDistsQ(input.asInstanceOf[ArrayData], flat, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cellDistsQCents", flat, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.VectorKernels.cellDistsQ($c, $centsRef, $dim);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CellDistsQ =
    copy(child = newChild)
}

/** (array<long>, array<long>) → array<long>: element-wise difference
  * ([[VectorKernels.subVecQ]]) — the residual (v − coarse centroid) of the
  * IVF-PQ encode path, exact and codegen'd (no zip_with HOF in the hot
  * path).
  */
case class SubVecQ(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sub_vec_q requires two array<long> (quantized) inputs, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.subVecQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.plans.VectorKernels.subVecQ($a, $b);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SubVecQ =
    copy(left = l, right = r)
}

/** array<long> (quantized) → array<long>: exact integer dot with each
  * centroid ([[VectorKernels.cellDotsQ]]) — the per-subspace ADC lookup
  * table of the oracle-replayable PQ path.
  */
case class CellDotsQ(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression {
  require(centroids.nonEmpty && centroids.forall(_.length == centroids.head.length),
    "centroids must be non-empty and rectangular")
  private val dim = centroids.head.length
  @transient private lazy val flat: Array[Long] = centroids.flatten.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_dots_q requires array<long> (quantized), got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.cellDotsQ(input.asInstanceOf[ArrayData], flat, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cellDotsQCents", flat, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.VectorKernels.cellDotsQ($c, $centsRef, $dim);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CellDotsQ =
    copy(child = newChild)
}

/** array<long> → long: deterministic sign-random-projection LSH bucket id
  * over a quantized vector ([[VectorKernels.lshBucket]]). `nBits` is a
  * plan-time constant (≤ 30), not a child expression.
  */
case class LshBucketQ(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 30, s"nBits must be in [1, 30], got $nBits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket_q requires array<long> (quantized) input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.lshBucket(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("lshBucket")
      s"""
      java.lang.Long $tmp = graft.plans.VectorKernels.lshBucket($c, $nBits);
      if ($tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $tmp.longValue();
      }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucketQ =
    copy(child = newChild)
}
