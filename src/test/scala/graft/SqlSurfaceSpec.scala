package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL text surface answers the same questions as the DataFrame API. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("SQL over registered fixture views equals the DataFrame query") {
    Sql.register(spark, TestSpark.sfDir)
    val viaSql = spark.sql("""
      SELECT r_name, n_name, COUNT(*) AS n_customers
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val viaDf = SparkEntry.queries("q_a2_geo_rollup")(spark, TestSpark.sfDir)
      .select("r_name", "n_name", "n_customers")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(viaSql == viaDf)
  }

  test("engine SQL functions are callable from SQL text") {
    Sql.register(spark, TestSpark.sfDir)
    val r = spark.sql(
      "SELECT poly_hash(text) AS h, detect_lang(text) AS l FROM documents LIMIT 5")
      .collect()
    assert(r.length == 5)
    assert(r.forall(_.getLong(0) >= 0))
  }
}
