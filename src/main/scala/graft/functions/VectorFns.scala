package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding (array<float>) primitives, numerically exact so DuckDB oracles
  * match bit-for-bit: each float is widened to double (exact) then quantized
  * to DECIMAL(12,6); products and sums stay exact (order-free); only the
  * final sqrt/divide happens in double.
  *
  * Two equivalent implementations exist:
  *   - the HOF decimal lattice (`zip_with` + `aggregate`, this file's *Expr
  *     forms) — the executable specification, and the template the DuckDB
  *     oracle SQL is generated from;
  *   - the scaled-long codegen kernels (graft.plans.VectorKernels) — the hot
  *     path: a DECIMAL(12,6) is an integer count of 1e-6 units, so the same
  *     arithmetic runs on primitive longs inside whole-stage codegen instead
  *     of interpreted HOFs with per-element Decimal boxing.
  * VectorKernelSpec proves the two agree element-for-element; queries use the
  * kernel forms ([[quantize]]/[[dotQ]]/[[lshBucketQ]]).
  */
object VectorFns {

  /** Quantize array<float> → array<long> (unscaled DECIMAL(12,6) values) —
    * compute ONCE per row, then feed [[dotQ]]/[[lshBucketQ]].
    */
  def quantize(c: Column): Column =
    GraftColumnBridge.column(graft.plans.QuantizeVec(GraftColumnBridge.expression(c)))

  /** Exact decimal dot product of two [[quantize]]d vectors, as DECIMAL(32,12). */
  def dotQ(a: Column, b: Column): Column =
    GraftColumnBridge.column(graft.plans.DotQ(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** [[dotQ]] cast to double — the common scoring form. */
  def dotQDouble(a: Column, b: Column): Column = dotQ(a, b).cast(DoubleType)

  /** Sign-random-projection LSH bucket of a [[quantize]]d vector — the
    * codegen twin of the `signProjection(_, j) > 0` bit column stack.
    */
  def lshBucketQ(q: Column, nBits: Int): Column =
    GraftColumnBridge.column(graft.plans.LshBucketQ(GraftColumnBridge.expression(q), nBits))

  // CONTRACT: both arrays must be the same dimension and non-empty. Outside
  // that, the engines genuinely diverge (Spark aggregate() over an empty
  // array returns the 0 seed where DuckDB list_sum returns NULL; on a length
  // mismatch Spark NULL-poisons via zip_with padding where DuckDB skips the
  // out-of-bounds NULL products) — callers validate dimensions at ingest,
  // parity is guaranteed only under the contract.

  /** Exact decimal dot product of two array<float> columns, as double. */
  def dot(a: String, b: String): Column =
    expr(s"CAST(${dotDecExpr(a, b)} AS DOUBLE)")

  /** [[dot]] kept in exact decimal (no double cast) — for aggregation paths
    * where a double→decimal re-quantization would differ across engines.
    */
  def dotDec(a: String, b: String): Column = expr(dotDecExpr(a, b))

  /** DuckDB rendering of [[dotDec]]. */
  def dotDecSql(a: String, b: String): String = dotDecDuck(a, b)

  // Accumulator is DECIMAL(32,12) with an explicit re-cast in the merge
  // lambda: Spark's decimal `+` widens (p,s)+(p,s) beyond the accumulator
  // type, so without the cast the aggregate() types don't unify; the cast is
  // exact for |values| < 1e20 which our unit-scale embeddings never approach.
  // (The double and decimal variants share ONE inner expression on each
  // engine — deriving one from the other by string surgery silently broke
  // when the wrapper changed.)
  private def dotDecExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> " +
    s"CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST(y AS DOUBLE) AS DECIMAL(12,6))), " +
    s"CAST(0 AS DECIMAL(32,12)), (acc, v) -> CAST(acc + v AS DECIMAL(32,12)))"

  private def dotDecDuck(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> " +
    s"CAST(CAST($a[i] AS DOUBLE) AS DECIMAL(12,6)) * CAST(CAST($b[i] AS DOUBLE) AS DECIMAL(12,6))))"

  /** DuckDB rendering of [[dot]] — identical arithmetic. */
  def dotSql(a: String, b: String): String =
    s"CAST(${dotDecDuck(a, b)} AS DOUBLE)"

  /** Signed projection of an embedding onto deterministic hyperplane j:
    * sum_i emb[i] * s(i,j) with s = ±1 from ((i*7919 + j*104729) % 97) % 2,
    * i 1-based. Returned as exact decimal (compared to 0 for the LSH bit).
    */
  def signProjection(emb: String, j: Int): Column =
    expr(s"aggregate(transform($emb, (x, i) -> " +
      s"CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6)) * " +
      s"CAST(CASE WHEN ((i + 1) * 7919 + $j * 104729) % 97 % 2 = 0 THEN 1 ELSE -1 END AS DECIMAL(2,0))), " +
      s"CAST(0 AS DECIMAL(32,12)), (acc, v) -> CAST(acc + v AS DECIMAL(32,12)))")

  /** DuckDB rendering of [[signProjection]] (1-based i matches Spark's i+1). */
  def signProjectionSql(emb: String, j: Int): String =
    s"list_sum(list_transform(range(1, len($emb) + 1), i -> " +
    s"CAST(CAST($emb[i] AS DOUBLE) AS DECIMAL(12,6)) * " +
    s"CAST(CASE WHEN (i * 7919 + $j * 104729) % 97 % 2 = 0 THEN 1 ELSE -1 END AS DECIMAL(2,0))))"
}
