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
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

  /** Plan-time int parameter (k, nBits, …) from a literal argument. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT parameter, got $other")
  }

  private def fn(e: SparkSessionExtensions, name: String, clazz: Class[_])(
      build: Seq[Expression] => Expression): Unit =
    e.injectFunction((new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name), build))

  override def apply(e: SparkSessionExtensions): Unit = {
    fn(e, "poly_hash", classOf[PolyHash])(exprs => PolyHash(exprs.head))
    fn(e, "quantize_vec", classOf[QuantizeVec])(exprs => QuantizeVec(exprs.head))
    fn(e, "dotq", classOf[DotQ])(exprs => DotQ(exprs(0), exprs(1)))
    fn(e, "dotf", classOf[DotFloat])(exprs => DotFloat(exprs(0), exprs(1)))
    fn(e, "lsh_bucket_q", classOf[LshBucketQ])(exprs =>
      LshBucketQ(exprs(0), intLit(exprs(1), "lsh_bucket_q")))
    fn(e, "shingles_distinct", classOf[ShinglesDistinct])(exprs =>
      ShinglesDistinct(exprs(0), intLit(exprs(1), "shingles_distinct")))
    fn(e, "minhash_sig", classOf[MinHashSig])(exprs =>
      MinHashSig(exprs(0), intLit(exprs(1), "minhash_sig")))
    fn(e, "simhash_bits", classOf[SimHashBits])(exprs =>
      SimHashBits(exprs(0), intLit(exprs(1), "simhash_bits")))
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    e.injectOptimizerRule(_ => RewriteRowNumberTopK)
  }
}
