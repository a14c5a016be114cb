package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The serve-row setup seam: an index must build exactly once per
  * (session, sfDir, name) and be served from parquet afterwards.
  */
class FixturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ensure builds once per session and serves the persisted bytes after") {
    val sfDir = java.nio.file.Files.createTempDirectory("graft-fix-sf").toString
    var builds = 0
    def path() = Fixtures.ensure(spark, sfDir, "spec_index") {
      builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    val p1 = path()
    assert(builds == 1)
    assert(spark.read.parquet(p1).count() == 2)
    // second call: same path, NO rebuild — the timed serve shape
    val p2 = path()
    assert(p2 == p1 && builds == 1)
    // the path is keyed by the sf dir's NAME, so two scale factors never
    // serve each other's index
    val other = java.nio.file.Files.createTempDirectory("graft-fix-sf2").toString
    assert(Fixtures.ensure(spark, other, "spec_index") {
      Seq((9L, "z")).toDF("id", "v")
    } != p1)
  }
}
