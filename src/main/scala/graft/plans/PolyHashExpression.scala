package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable polynomial string
  * hash (seed 7, base 31, mod 2^31-1) — the codegen'd fast path for the
  * higher-order-function form in TextFns.polyHash (`aggregate(split(s,''),…)`),
  * which allocates a per-row array. Identical results for ASCII/Latin-1 input
  * (both walk per-character codepoints); the dedup/minhash pipelines feed it
  * whitespace tokens so that holds by construction.
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
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("phStr")
      val i = ctx.freshName("phI")
      s"""
        java.lang.String $s = $c.toString();
        long ${ev.value}_acc = 7L;
        for (int $i = 0; $i < $s.length(); $i++) {
          ${ev.value}_acc = (${ev.value}_acc * 31L + (long) $s.charAt($i)) % 2147483647L;
        }
        ${ev.value} = ${ev.value}_acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Reference implementation (interpreted path + tests). */
  def hash(s: String): Long = {
    var acc = 7L
    var i = 0
    while (i < s.length) { acc = (acc * 31L + s.charAt(i)) % 2147483647L; i += 1 }
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
