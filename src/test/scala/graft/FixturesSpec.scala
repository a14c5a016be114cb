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

  test("reaper deletes dead-pid fixture trees and spares live and malformed ones") {
    val root = new java.io.File("/tmp/graft_fixtures")
    root.mkdirs()
    // a pid far above any real pid_max: ProcessHandle.of is empty → dead
    val dead = new java.io.File(root, "00ab45cd-987654321")
    new java.io.File(dead, "sf0.01/some_index").mkdirs()
    val self = java.lang.ProcessHandle.current().pid()
    val live = new java.io.File(root, s"00ab45cd-$self")
    live.mkdirs()
    val odd = new java.io.File(root, "not-a-pid-entry")
    odd.mkdirs()
    // jvmScratch trees (warehouse staging for the pipeline rows) follow
    // the same <prefix>-<pid> reaping contract
    val deadScratch = new java.io.File(root, "scratch-987654322")
    new java.io.File(deadScratch, "wh_incr_pipeline").mkdirs()
    try {
      Fixtures.reapDeadPids()
      assert(!dead.exists(), "dead-pid tree must be reaped")
      assert(!deadScratch.exists(), "dead-pid scratch tree must be reaped")
      assert(live.exists(), "own-pid tree must survive")
      assert(odd.exists(), "malformed entries are left alone")
      assert(new java.io.File(Fixtures.jvmScratch("probe")).getPath
        .contains(s"scratch-${java.lang.ProcessHandle.current().pid()}"))
    } finally { Seq(live, odd).foreach(_.delete()) }
  }

  test("partitioned fixture: filter on the partition column prunes the read") {
    val sfDir = java.nio.file.Files.createTempDirectory("graft-fix-part").toString
    val df = Fixtures.read(spark, sfDir, "part_index", Seq("sparse")) {
      Seq((1L, 11L, true), (2L, 22L, false), (3L, 33L, true))
        .toDF("id", "sh", "sparse")
    }
    // values roundtrip (partition column re-attached with its type)
    assert(df.filter(col("sparse")).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    // the sparse=true filter reaches the scan as a PartitionFilter
    val scan = df.filter(col("sparse")).queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "partition pruning must engage")
    // a second read serves the cached schema (no footer re-inference) and
    // still sees all rows
    assert(Fixtures.read(spark, sfDir, "part_index", Seq("sparse")) {
      fail("must not rebuild"); null
    }.count() == 3)
  }
}
