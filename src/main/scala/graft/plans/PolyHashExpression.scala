package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable polynomial string
  * hash (seed 7, base 31, mod 2^31-1) — the codegen'd fast path for the
  * higher-order-function form in TextFns.polyHash (`aggregate(split(s,''),…)`).
  * Identical for ALL inputs: both walk code points (`ascii` returns the code
  * point in Spark and DuckDB — probed incl. 'é' → 233 and '😀' → 128512), and
  * the empty string hashes to 217 because `split('','')` yields one empty
  * piece with `ascii('') = 0`.
  *
  * Demonstrates the (b) tier of the extension ladder — custom `Expression`
  * with `doGenCode` — per SURVEY §7.3: everything else in the engine is
  * built-ins.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyhash requires string input, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PolyHash.hash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Reference implementation (interpreted + codegen call target). Walks
    * code points ('😀' is ONE contribution of 128512, matching both engines'
    * `ascii`); '' hashes to 217 (one empty piece, ascii 0) — see class doc.
    */
  def hash(s: String): Long = {
    if (s.isEmpty) return 217L
    var acc = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Session-level registration for SQL + Column use without extensions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction("poly_hash", exprs => PolyHash(exprs.head), "built-in")

  /** Column form — requires [[register]] (or GraftExtensions) first. */
  def poly_hash(c: Column): Column =
    org.apache.spark.sql.functions.call_function("poly_hash", c)
}
