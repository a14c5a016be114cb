package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions wiring for the engine's native expressions:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  * then `SELECT poly_hash(text) FROM docs` works in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash(exprs.head)))
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    e.injectOptimizerRule(_ => RewriteRowNumberTopK)
  }
}
