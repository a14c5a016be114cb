package graft.airbnb

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet-backed warehouse replacing SQL Server (SURVEY §2.11, S9/S10):
  * tables are parquet directories under a root; facts are written partitioned
  * so date-dim joins get dynamic partition pruning; "truncate in FK order"
  * becomes overwrite order (facts before dims).
  */
final case class Warehouse(spark: SparkSession, root: String) {

  import org.apache.hadoop.fs.Path

  private def path(name: String) = s"$root/$name"

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Spark's committer leaves _SUCCESS when (and only when) a write job
    * completed — the marker that a __tmp directory is safe to promote.
    */
  private def isComplete(f: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    f.exists(new Path(p, "_SUCCESS"))

  /** Finish or undo a swap interrupted by a crash. States (dest, __tmp, __old):
    *  - dest present: strays are garbage from an already-completed swap → drop;
    *  - dest absent, complete __tmp present: the writer died mid-swap after
    *    materializing → roll FORWARD (promote __tmp, drop __old);
    *  - dest absent, __old present: roll BACK to the previous version;
    *  - incomplete __tmp (no _SUCCESS): a dead write job → drop.
    */
  private def recover(name: String): Unit = {
    val dest = new Path(path(name)); val f = fs(dest)
    val tmp = new Path(path(name) + "__tmp"); val old = new Path(path(name) + "__old")
    if (f.exists(dest)) {
      if (f.exists(tmp)) f.delete(tmp, true)
      if (f.exists(old)) f.delete(old, true)
    } else if (f.exists(tmp) && isComplete(f, tmp)) {
      if (!f.rename(tmp, dest)) throw new java.io.IOException(s"recover: promote failed for $name")
      if (f.exists(old)) f.delete(old, true)
    } else {
      if (f.exists(tmp)) f.delete(tmp, true)
      if (f.exists(old) && !f.rename(old, dest))
        throw new java.io.IOException(s"recover: rollback failed for $name")
    }
    recoverPartitions(name)
  }

  /** Heal PER-PARTITION swap windows: a death between a partition's park
    * rename and its promote rename leaves the partition ABSENT from the
    * table with its only surviving copy at the sibling `__pold_<part>`
    * dir. A reader (or the replaying writer) that proceeded without
    * healing would see the partition as empty — and the writer's
    * stray-park sweep would then DELETE the last copy before a
    * read-modify-write caller (the kNN gate) could regenerate it from
    * state it no longer has. So every recover() rolls such parks BACK
    * into the table first; parks whose partition exists are completed
    * swaps' strays and drop. This is what makes the documented invariant
    * — "each individual partition is either fully old or fully new at
    * every crash point" — true for the park-then-promote window too.
    */
  private def recoverPartitions(name: String): Unit = {
    val base = new Path(path(name)); val f = fs(base)
    val parent = base.getParent
    if (parent == null) return
    val prefix = base.getName + "__pold_"
    // globStatus on the park PATTERN, not listStatus on the warehouse
    // root (ADVICE r19): recover() runs on every read/exists/write, and a
    // root LIST is O(#sibling tables) per access — a real per-request
    // cost on object stores. The glob touches only this table's parks
    // (normally zero entries) and returns null for a missing parent.
    val parks = Option(f.globStatus(new Path(parent, prefix + "*")))
      .getOrElse(Array.empty)
    parks.foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(prefix) && st.isDirectory) {
        val partDest = new Path(base, n.stripPrefix(prefix))
        if (!f.exists(partDest)) {
          f.mkdirs(base)
          if (!f.rename(st.getPath, partDest))
            throw new java.io.IOException(
              s"recover: partition rollback failed for $name/${partDest.getName}")
        } else f.delete(st.getPath, true)
      }
    }
  }

  /** Write-to-temp-then-swap: upserts read the current table while producing
    * its replacement, and Spark (correctly) refuses to overwrite a path it is
    * reading from — so materialize beside it, then swap via the Hadoop
    * FileSystem API (HDFS/object-store paths included; plain java.io.File
    * would silently corrupt non-local roots). The previous version is parked
    * at __old until the new one is in place, so every crash point is
    * recoverable by [[recover]] — no delete-before-rename data-loss window.
    * NOTE: rename is atomic on HDFS/local; on S3-style stores it is
    * copy+delete — still recoverable here via the _SUCCESS-gated roll-forward,
    * just not atomic.
    */
  def write(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    recover(name)
    val tmpStr = path(name) + "__tmp"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmpStr)
    val dest = new Path(path(name)); val f = fs(dest)
    val tmp = new Path(tmpStr); val old = new Path(path(name) + "__old")
    if (f.exists(dest) && !f.rename(dest, old))
      throw new java.io.IOException(s"swap: park failed for $name")
    if (!f.rename(tmp, dest)) {
      if (f.exists(old)) f.rename(old, dest) // roll back
      throw new java.io.IOException(s"swap failed for $name")
    }
    if (f.exists(old)) f.delete(old, true)
    invalidateListings(name)
    // write-time schema capture, UNPARTITIONED tables only: the on-disk
    // schema is exactly df's, so the first read-back skips its footer
    // job. Partitioned writes keep read-side inference — partition-value
    // inference types (e.g. boolean partition dirs read back as string)
    // are the established read contract and a declared-type cache would
    // silently change it. NORMALIZED to nullable (ADVICE r20): footer
    // inference in any other JVM (or after eviction) returns all-nullable
    // fields, so caching the writer's nullability would present the same
    // table with two schemas depending on which session reads it.
    if (partitionBy.isEmpty)
      Warehouse.schemaCache.put(path(name),
        Warehouse.allNullable(df.schema)): Unit
  }

  /** Drop Spark's cached file listings/footers for a table path after a
    * swap: a DataFrame planned against the PREVIOUS version's listing
    * would otherwise fail mid-query with FAILED_READ_FILE on the renamed
    * files. Every swap path (whole-table, single-partition,
    * multi-partition) calls this; it is a driver-local cache clear.
    */
  private def invalidateListings(name: String): Unit = {
    spark.catalog.refreshByPath(path(name))
    Warehouse.schemaCache.remove(path(name)): Unit
  }

  def read(name: String): DataFrame = {
    recover(name)
    // schema cached per PATH across Warehouse instances (instances are
    // cheap per-invocation objects): an uncached spark.read.parquet
    // re-infers from footers — one extra job per read of an immutable
    // index table. Every schema-changing path (write/writePartition(s) →
    // invalidateListings, dropTable) clears the entry; a recreate after
    // drop goes through write(), so the cache can never serve a stale
    // schema.
    val p = path(name)
    val cached = Warehouse.schemaCache.get(p)
    if (cached != null) spark.read.schema(cached).parquet(p)
    else {
      val df = spark.read.parquet(p)
      Warehouse.schemaCache.putIfAbsent(p, df.schema)
      df
    }
  }

  /** Idempotent PER-PARTITION write: lands `df` as the single
    * `partCol=partValue` partition directory of `name`, leaving every
    * other partition untouched — the APPEND shape for grow-only tables
    * (streaming gates' per-batch vector/index appends), where [[write]]'s
    * whole-table swap would rewrite O(table) bytes per batch. The
    * partition is written to an underscore-prefixed temp dir (invisible
    * to readers — FileInputFormat skips `_`/`.` paths), then swapped in;
    * a replay of the same `partValue` overwrites the same partition, so
    * the foreachBatch replay contract holds without any groupBy-dedupe
    * pass. Readers go through [[read]] as usual: partition discovery
    * re-attaches `partCol` from the directory names.
    */
  /** Refuse a per-partition write into a table whose root holds data FILES
    * (the [[write]] layout) or partition dirs under a DIFFERENT column:
    * root-level files beside `partCol=` dirs break partition discovery on
    * every later read (CONFLICTING_PARTITION_COLUMN_NAMES / silently
    * missing rows), and the mix is only detectable at read time. A table
    * that needs a whole-table rewrite while staying partitioned (the
    * periodic re-cap maintenance shape, e.g. persisting
    * Dedup.compactAnchorIndex output) must go through
    * `write(name, df, partitionBy = Seq(partCol))`, which preserves the
    * layout — after which per-partition writes remain valid.
    */
  private def requirePartitionedLayout(f: org.apache.hadoop.fs.FileSystem,
                                       base: Path, name: String,
                                       partCol: String): Unit = {
    if (!f.exists(base)) return
    f.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && !n.startsWith("_") && !n.startsWith("."))
        throw new IllegalStateException(
          s"writePartition($name): table root holds data file '$n' (the " +
          s"whole-table write() layout); a partition write would create a " +
          s"mixed layout that breaks partition discovery. Rewrite once via " +
          s"write(name, df, partitionBy = Seq(\"$partCol\")) first.")
      if (st.isDirectory && n.contains("=") && !n.startsWith(partCol + "=") &&
          !n.startsWith("_") && !n.startsWith("."))
        throw new IllegalStateException(
          s"writePartition($name): table is partitioned by '${n.takeWhile(_ != '=')}', " +
          s"not '$partCol' — one table, one partition column.")
    }
  }

  def writePartition(name: String, partCol: String, partValue: Long,
                     df: DataFrame): Unit = {
    recover(name)
    val base = new Path(path(name)); val f = fs(base)
    requirePartitionedLayout(f, base, name, partCol)
    f.mkdirs(base)
    val part = s"$partCol=$partValue"
    val dest = new Path(base, part)
    // temp and park dirs live OUTSIDE the table root as siblings: a dir
    // inside the root that contains data files participates in partition
    // DISCOVERY regardless of an underscore prefix (a parked
    // `__old_batch_id=2` raised CONFLICTING_PARTITION_COLUMN_NAMES, and a
    // mid-write temp would race readers the same way)
    val tmp = new Path(path(name) + s"__ptmp_$part")
    val old = new Path(path(name) + s"__pold_$part")
    // stray park from an earlier crash of THIS partition: the replay that
    // reaches here rewrites the partition anyway, so the park is obsolete
    if (f.exists(old)) f.delete(old, true)
    df.drop(partCol).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // park-then-promote, never delete-before-rename (the write() swap
    // discipline): every crash window leaves the previous rows on disk —
    // either still at dest, or parked at the reader-invisible __old_ dir —
    // and a rename failure rolls the park back
    if (f.exists(dest) && !f.rename(dest, old))
      throw new java.io.IOException(s"partition swap: park failed for $name/$part")
    if (!f.rename(tmp, dest)) {
      if (f.exists(old)) f.rename(old, dest) // roll back
      throw new java.io.IOException(s"partition swap failed for $name/$part")
    }
    if (f.exists(old)) f.delete(old, true)
    invalidateListings(name)
  }

  /** Idempotent MULTI-partition write: lands every `partCol` partition
    * present in `df` (which must carry the column), leaving all other
    * partitions untouched — the TOUCHED-RANGE rewrite shape for indexes
    * whose rows change in place per batch (the kNN gate's cell-partitioned
    * edge store), where [[write]]'s whole-table swap rewrites O(table)
    * bytes per batch and [[writePartition]] can only append one new value.
    * One write job materializes all partitions into a sibling temp dir
    * (partition values become directory names via partitionBy), then each
    * partition dir swaps in through the same park-then-promote discipline
    * as [[writePartition]] — every crash window leaves each INDIVIDUAL
    * partition either fully old or fully new, never mixed, so a caller
    * that stamps rows with the writing batch can detect and skip
    * already-committed partitions on replay (per-partition idempotence).
    * Returns the partition directory names written.
    */
  def writePartitions(name: String, partCol: String, df: DataFrame): Seq[String] = {
    recover(name)
    val base = new Path(path(name)); val f = fs(base)
    requirePartitionedLayout(f, base, name, partCol)
    f.mkdirs(base)
    val tmpRoot = new Path(path(name) + "__ptmp_multi")
    if (f.exists(tmpRoot)) f.delete(tmpRoot, true)
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(tmpRoot.toString)
    val parts = f.listStatus(tmpRoot).filter { st =>
      st.isDirectory && st.getPath.getName.startsWith(partCol + "=")
    }
    parts.foreach { st =>
      val part = st.getPath.getName
      val dest = new Path(base, part)
      val old = new Path(path(name) + s"__pold_$part")
      // stray park from an earlier crash of THIS partition: obsolete — the
      // replay that reaches here rewrites the partition anyway
      if (f.exists(old)) f.delete(old, true)
      if (f.exists(dest) && !f.rename(dest, old))
        throw new java.io.IOException(s"partition swap: park failed for $name/$part")
      if (!f.rename(st.getPath, dest)) {
        if (f.exists(old)) f.rename(old, dest) // roll back
        throw new java.io.IOException(s"partition swap failed for $name/$part")
      }
      if (f.exists(old)) f.delete(old, true)
    }
    f.delete(tmpRoot, true)
    invalidateListings(name)
    parts.map(_.getPath.getName).toSeq
  }

  /** (beyond ref) §2.11 maintenance — small-files compaction. Streaming
    * sinks, incremental upserts, and over-parallel writes leave tables as
    * thousands of KB-sized parquet files; at cluster scale that means a
    * task (and an object-store request) per tiny file on every read. When
    * the table's average data-file size falls below `targetBytes / 2`,
    * rewrite it into ceil(totalBytes / targetBytes) files through the same
    * crash-recoverable swap as [[write]] (a crash mid-compaction can
    * never lose the table).
    *
    * Returns the data-file count after the call (unchanged when healthy —
    * the rewrite is skipped, not repeated, so scheduled compaction is
    * idempotent and cheap to run often).
    */
  def compactSmallFiles(name: String, targetBytes: Long = 128L << 20): Int = {
    recover(name)
    val dir = new Path(path(name)); val f = fs(dir)
    def dataFilesUnder(root: Path) = {
      val it = f.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && !st.getPath.getName.startsWith("_")) buf += st
      }
      buf.toSeq
    }
    if (!f.exists(dir)) return 0
    // a PARTITIONED table (the writePartition layout) compacts each
    // partition directory IN PLACE: the whole-table path below would
    // rewrite it unpartitioned — flattening the partition column into
    // root-level data files, so the next writePartition would produce a
    // mixed layout that breaks partition discovery on every later read
    val partDirs = f.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isDirectory && n.contains("=") && !n.startsWith("_") && !n.startsWith(".")
    }
    if (partDirs.nonEmpty) {
      partDirs.foreach { pd =>
        val files = dataFilesUnder(pd.getPath)
        if (files.length > 1) {
          val total = files.map(_.getLen).sum
          if (total / files.length < targetBytes / 2) {
            val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
            // sibling temp/park dirs, outside the table root (see
            // writePartition — in-root dirs join partition discovery)
            val tmp = new Path(path(name) + s"__ptmp_${pd.getPath.getName}")
            spark.read.parquet(pd.getPath.toString).coalesce(nOut)
              .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
            val old = new Path(path(name) + s"__pold_${pd.getPath.getName}")
            if (f.exists(old)) f.delete(old, true)
            if (!f.rename(pd.getPath, old))
              throw new java.io.IOException(s"compaction park failed: ${pd.getPath}")
            if (!f.rename(tmp, pd.getPath)) {
              f.rename(old, pd.getPath) // roll back
              throw new java.io.IOException(s"compaction swap failed: ${pd.getPath}")
            }
            f.delete(old, true)
          }
        }
      }
      return dataFilesUnder(dir).length
    }
    val files = dataFilesUnder(dir)
    if (files.isEmpty) return 0
    val total = files.map(_.getLen).sum
    val avg = total / files.length
    if (files.length > 1 && avg < targetBytes / 2) {
      val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
      // coalesce, not repartition: compaction must not pay a shuffle —
      // merging co-located small files is a narrow dependency
      write(name, read(name).coalesce(nOut))
      dataFilesUnder(dir).length
    } else files.length
  }

  def readOrEmpty(name: String, schema: StructType): DataFrame = {
    // an EXISTING but EMPTY directory reads as an empty table too: a crash
    // between a per-partition writer's mkdirs and its first partition swap
    // leaves exactly that state, and spark.read.parquet on it would fail
    // schema inference instead of letting the replay proceed. "Empty"
    // means NO data entry (ADVICE r19): a whole-table write() of a
    // zero-partition DataFrame leaves a directory holding only _SUCCESS,
    // which has entries but still fails schema inference — so the guard
    // skips underscore/dot-prefixed metadata names, exactly the names
    // FileInputFormat hides from readers.
    val p = new Path(path(name))
    val hasData = exists(name) && fs(p).listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (hasData) read(name)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  def exists(name: String): Boolean = {
    recover(name)
    val p = new Path(path(name)); fs(p).exists(p)
  }

  /** Remove a table AND its __tmp/__old swap strays: leaving strays would
    * let a later recover() roll the dropped table FORWARD from a pre-drop
    * __tmp. The one shared deletion path for every truncate-like operation.
    */
  private def dropTable(name: String): Unit = {
    Warehouse.schemaCache.remove(path(name))
    Seq(path(name), path(name) + "__tmp", path(name) + "__old").foreach { s =>
      val p = new Path(s); val f = fs(p)
      if (f.exists(p)) f.delete(p, true)
    }
    // per-partition swap strays ([[writePartition]]/compaction siblings:
    // name__ptmp_* / name__pold_*) — a dropped table must not leave them
    val tableDir = new Path(path(name)); val f = fs(tableDir)
    val parent = tableDir.getParent
    if (parent != null && f.exists(parent)) {
      val base = tableDir.getName
      f.listStatus(parent).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(base + "__ptmp_") || n.startsWith(base + "__pold_"))
          f.delete(st.getPath, true)
      }
    }
  }

  /** S10 — clear in FK order (facts → dims), like 00_prepare_tables.sql:5-10. */
  def truncateAll(): Unit =
    Seq("fact_calendar", "fact_reviews", "dim_listing_id_map", "dim_hosts",
        "dim_dates", "dim_listings").foreach(dropTable)

  /** Schema/type migration (scripts/maintenance/convert_ids_to_bigint.py:
    * 119-135 — widen INT→BIGINT across FK-dependent tables): rewrite the
    * table with the named columns re-typed via `try_cast`, preserving
    * column order and every unnamed column. Where the reference's server-
    * side ALTER would abort on an unconvertible value, this quarantines the
    * offending ROWS to `<name>__rejects` (original schema — triage sees
    * the raw values) and migrates the rest; a purely-widening migration
    * quarantines nothing.
    *
    * Both rewrites go through the crash-recoverable swap ([[write]]): the
    * rejects table materializes FIRST, while the original table is still in
    * place, so no crash point can lose rows. Returns the quarantined count.
    * Scale: two scans of the table plus the rewrite — the same order of
    * work the reference's ALTER pays server-side, all distributed.
    */
  def migrateColumnTypes(name: String, casts: Map[String, String],
                         quarantineTo: String = ""): Long = {
    val df = read(name)
    val missing = casts.keySet -- df.columns.toSet
    require(missing.isEmpty, s"migrateColumnTypes: no such column(s) $missing in $name")
    val rejName = if (quarantineTo.nonEmpty) quarantineTo else s"${name}__rejects"
    // the quarantine target must not alias the source (or its swap dirs):
    // writing rejects over `name` would replace the table under the lazy
    // `df`, and the migration rewrite would then read back only the
    // rejects — total data loss from one typo. Fail loudly instead.
    require(rejName != name && rejName != s"${name}__tmp" && rejName != s"${name}__old",
      s"migrateColumnTypes: quarantine target $rejName aliases the source table")
    // a row fails iff some migrated column is non-null but its cast is null
    // (P4's try_cast validity gate, applied per migrated column)
    val bad = casts.map { case (c, t) =>
      col(c).isNotNull && expr(s"try_cast(`$c` AS $t)").isNull
    }.reduce(_ || _)
    // Quarantine is APPEND-ONLY and only touched when rows actually fail:
    // an overwrite would let a clean re-run (the idempotent-maintenance
    // case) replace the rejects table with an empty frame and destroy the
    // only remaining copy of previously quarantined rows. Schema drift
    // between runs (the original schema changes once a migration lands)
    // fails the unionByName loudly rather than silently coercing.
    val nBad = df.filter(bad).count()
    if (nBad > 0) {
      val rejects =
        if (exists(rejName)) read(rejName).unionByName(df.filter(bad))
        else df.filter(bad)
      write(rejName, rejects)
    }
    val migrated = df.filter(!bad).select(df.columns.toSeq.map { c =>
      casts.get(c) match {
        case Some(t) => expr(s"try_cast(`$c` AS $t)").as(c)
        case None    => col(c)
      }
    }: _*)
    write(name, migrated)
    nBad
  }

  /** Archive-then-truncate (scripts/maintenance/
    * archive_and_truncate_staging.py:29-32): park the table's rows in a
    * stamped archive table AND a pipe-gz csv export (the S7 sink — what the
    * reference writes to logs/), then truncate the original. The archive
    * writes complete BEFORE the truncate, so no crash point loses rows.
    * `stamp` is caller-supplied (the reference uses a UTC timestamp);
    * returns the archive table name.
    */
  def archiveAndTruncate(name: String, stamp: String, csvDir: String): String = {
    val archiveName = s"${name}_archive_$stamp"
    val df = read(name)
    write(archiveName, df)
    Sources.writePipeCsv(read(archiveName), s"$csvDir/${name}_$stamp")
    dropTable(name)
    archiveName
  }

  /** Z-ordered write: rows are clustered along the Morton curve of `zCols`
    * so parquet min/max stats data-skip on EVERY z dimension (multi-column
    * B-tree index intent, sql/schema/04_create_indexes.sql, re-expressed for
    * columnar storage). See operators.ZOrder.
    */
  def writeZOrdered(name: String, df: DataFrame, zCols: Seq[String],
                    bits: Int = 8, numPartitions: Int = 0): Unit =
    write(name, graft.operators.ZOrder.cluster(df, zCols, bits, numPartitions))

  /** Bucketed catalog table (SURVEY §4: bucketing co-locates repeated joins
    * on the same key — both sides pre-hashed into the same bucket layout join
    * with NO exchange). Requires the session catalog (bucketBy is
    * saveAsTable-only); use for hot join keys like listing_id.
    */
  def writeBucketed(name: String, df: DataFrame, bucketCols: Seq[String],
                    nBuckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a table dropped in a previous session leaves its managed location
    // behind; saveAsTable refuses to reuse it (LOCATION_ALREADY_EXISTS)
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet").saveAsTable(name)
  }

  /** S11 — SQL script runner (modules/data_loader.py:532-568): split on ';',
    * execute each statement, tolerate failures only on DROP statements.
    */
  def runScript(sqlText: String): Unit =
    sqlText.split(";").map(_.trim).filter(_.nonEmpty).foreach { stmt =>
      try spark.sql(stmt).collect()
      catch {
        case e: Exception if stmt.toUpperCase.startsWith("DROP") => // idempotent drops
        case e: Exception => throw e
      }
    }

  private val tableNames =
    Seq("dim_listings", "dim_listing_id_map", "dim_hosts", "dim_dates",
        "fact_calendar", "fact_reviews")

  /** A6/F16 — the reference's post-load statistics
    * (modules/data_loader.py:570-578): table → row count.
    */
  def stats(): Map[String, Long] =
    tableNames.filter(exists).map(t => t -> read(t).count()).toMap

  /** The reference's db-size report (scripts/analysis/db_size_check.py:22-46):
    * table → bytes on disk. Pure filesystem metadata — no scan.
    */
  def sizeStats(): Map[String, Long] =
    tableNames.filter(exists).map { t =>
      val p = new Path(path(t))
      t -> fs(p).getContentSummary(p).getLength
    }.toMap
}

object Warehouse {
  /** Footer-schema cache keyed by table PATH (Warehouse instances are
    * per-invocation value objects, so the cache lives here): one schema
    * inference job per table per JVM instead of per read. Cleared by
    * invalidateListings (every swap path) and dropTable.
    */
  private[airbnb] val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** The all-nullable form footer inference would return (ADVICE r20) —
    * recursive, so nested fields/elements normalize too. (StructType's own
    * asNullable is private[sql].)
    */
  private[airbnb] def allNullable(st: StructType): StructType =
    nullableType(st).asInstanceOf[StructType]

  private def nullableType(dt: org.apache.spark.sql.types.DataType):
      org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = nullableType(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = nullableType(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = nullableType(m.valueType), valueContainsNull = true)
    case other => other
  }
}
