package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface of the engine (SURVEY §7.1: every capability is exposed both
  * as DataFrame API and as Spark SQL text): registers the fixture tables as
  * temp views and wires in the engine's SQL extensions (poly_hash, the
  * Airbnb views are registered by airbnb.Views).
  */
object Sql {

  /** Register every fixture table of `dir` as a temp view and the engine's
    * native SQL functions; afterwards `spark.sql("SELECT … FROM lineitem")`
    * works against the same relations the DataFrame queries read.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    Tables.names.foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))
    plans.PolyHash.register(spark)
    functions.LangId.register(spark)
  }

  def sql(spark: SparkSession, text: String): DataFrame = spark.sql(text)
}
