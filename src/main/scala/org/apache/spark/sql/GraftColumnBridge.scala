package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * `classic.ExpressionUtils` is `private[sql]`, so the engine's Column-API
  * wrappers (graft.functions.VectorFns etc.) can't call it directly; this
  * one-hop forwarder lives in the sql package purely to re-export the two
  * conversions. Standard extension-library practice — no Spark internals are
  * re-implemented here.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
