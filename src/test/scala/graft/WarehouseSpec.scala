package graft

import graft.airbnb.Warehouse
import org.scalatest.funsuite.AnyFunSuite

class WarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("S11 script runner executes statements, tolerates only DROP failures") {
    val wh = Warehouse(spark, java.nio.file.Files.createTempDirectory("wh").toString)
    wh.runScript("""
      DROP VIEW IF EXISTS t_script;
      DROP VIEW does_not_exist_but_drop_is_tolerated;
      CREATE TEMPORARY VIEW t_script AS SELECT 1 AS a, 2 AS b;
      SELECT * FROM t_script""")
    assert(spark.table("t_script").count() == 1)
    intercept[Exception] { wh.runScript("SELECT * FROM definitely_missing_table") }
  }

  test("J9 catalog introspection replaces sys.tables/sys.columns queries") {
    Seq((1L, "x")).toDF("id", "v").createOrReplaceTempView("t_cat_probe")
    val tables = spark.catalog.listTables().collect().map(_.name)
    assert(tables.contains("t_cat_probe"))
    val cols = spark.catalog.listColumns("t_cat_probe").collect().map(c => (c.name, c.dataType))
    assert(cols.toSeq == Seq(("id", "bigint"), ("v", "string")))
    // DESCRIBE surface (SURVEY §2.11)
    assert(spark.sql("DESCRIBE t_cat_probe").count() == 2)
  }
}
