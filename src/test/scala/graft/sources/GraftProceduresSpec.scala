package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkSpec
import graft.sinks.{ManifestCommit, ParquetMergeSink, TableMaintenance}

/** `CALL graftp.system.*` — the SQL maintenance procedures
  * ([[GraftProcedures]]): history, rollback, vacuum, compact. Each test
  * pins the SQL route against the underlying manifest-protocol API it
  * fronts, the same ≡-discipline as the INSERT/DELETE/MERGE specs.
  */
class GraftProceduresSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft-proc").toString
    spark.conf.set("spark.sql.catalog.graftp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftp.root", r)
    spark.conf.set("spark.sql.catalog.graftp.deleteKey.p", "k")
    r
  }

  private def fs: FileSystem =
    FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)

  private def versions(dir: String): Seq[Long] =
    ManifestCommit.committed(fs, new Path(dir)).map(_.version)

  test("compact materializes a deletion vector and reports the new version") {
    val dir = s"$root/p"
    (1L to 40L).map(k => (k, s"v$k")).toDF("k", "v").write.parquet(dir)
    TableMaintenance.compact(spark, dir, targetBytes = 1 << 20)
    spark.sql("DELETE FROM graftp.p WHERE k > 30")

    val mPre = ManifestCommit.latest(fs, new Path(dir)).get
    assert(mPre.dirs.contains("deletes"), "setup: a vector must exist")

    val row = spark.sql(
      "CALL graftp.system.compact(table => 'p', target_mb => 1)").head
    val mPost = ManifestCommit.latest(fs, new Path(dir)).get
    assert(row.getLong(0) === mPost.version, "compact must report the committed version")
    assert(row.getInt(1) >= 1, "compact must report the output file count")
    assert(!mPost.dirs.contains("deletes"),
      "compact must materialize (and drop) the deletion vector")
    // logical table state unchanged; physical rows now equal logical rows
    assert(spark.sql("SELECT count(*) FROM graftp.p").head.getLong(0) === 30L)
    val physical = spark.read.parquet(
      TableMaintenance.resolveDataDir(spark, dir)).count()
    assert(physical === 30L, "deleted rows must be physically gone after compact")
  }

  test("history lists retained versions newest-first with layout + entries") {
    val dir = s"$root/p" // continues from the compact test's state
    val rows = spark.sql("CALL graftp.system.history(table => 'p')").collect()
    assert(rows.map(_.getLong(0)).toSeq === versions(dir).sorted.reverse,
      "history must list exactly the retained manifest versions, newest first")
    assert(rows.forall(_.getString(2) === "maintained"))
    assert(rows.head.getString(3).contains("dir.table="),
      "entries must carry the manifest's key=value pairs")
    // committed_at parses as an instant
    rows.foreach(r => java.time.Instant.parse(r.getString(1)))
  }

  test("rollback restores a retained version as a NEW commit") {
    val dir = s"$root/rb"
    ParquetMergeSink.merge(Seq((1L, "a", 10L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 2)
    ParquetMergeSink.merge(Seq((1L, "a2", 20L), (2L, "b", 20L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 2)
    val Seq(v1, v2) = versions(dir).sorted.toSeq

    val row = spark.sql(
      s"CALL graftp.system.rollback(table => 'rb', version => $v1)").head
    assert(row.getLong(0) === v1)
    assert(row.getLong(1) > v2, "rollback commits a NEW version (history preserved)")
    // SQL reads now serve the restored state
    assert(spark.sql("SELECT k, v FROM graftp.rb").collect().map(_.toSeq).toSet
      === Set(Seq(1L, "a")),
      "current reads must serve the rolled-back state")
    // and the rolled-PAST version is still readable (history, not erasure)
    assert(spark.sql(s"SELECT count(*) FROM graftp.rb VERSION AS OF $v2")
      .head.getLong(0) === 2L)
    // a vacuumed / never-committed version refuses loudly
    val e = intercept[Exception] {
      spark.sql("CALL graftp.system.rollback(table => 'rb', version => 999)").collect()
    }
    assert(e.getMessage.contains("not in the retained commit log"))
  }

  test("vacuum trims history and reports what is retained") {
    val dir = s"$root/rb" // three retained versions from the rollback test
    assert(versions(dir).size >= 2)
    val row = spark.sql(
      "CALL graftp.system.vacuum(table => 'rb', keep => 1)").head
    assert(row.getInt(0) === 1, "keep=1 must retain exactly one version")
    assert(row.getLong(1) === row.getLong(2), "oldest == newest when one retained")
    assert(versions(dir) === Seq(row.getLong(2)))
    // the vacuumed version is gone from time travel
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graftp.rb VERSION AS OF ${row.getLong(2) - 1}").collect()
    }
    // keep must be >= 1 (keep=0 would delete the table's only manifest)
    val e = intercept[Exception] {
      spark.sql("CALL graftp.system.vacuum(table => 'rb', keep => 0)").collect()
    }
    assert(e.getMessage.contains("keep must be >= 1"))
  }

  test("compact refuses merge-sink bucketed tables; unknown procedures are loud") {
    val e1 = intercept[Exception] {
      spark.sql("CALL graftp.system.compact(table => 'rb')").collect()
    }
    assert(e1.getMessage.contains("merge-sink"),
      "bucketed tables have nothing to compact — the refusal must say so")
    // history still serves them (read-only audit)
    assert(spark.sql("CALL graftp.system.history(table => 'rb')").collect()
      .forall(_.getString(2) === "merge-sink"))

    val e2 = intercept[Exception] {
      spark.sql("CALL graftp.system.frobnicate(table => 'rb')").collect()
    }
    assert(e2.getMessage.contains("frobnicate"))
    // a non-`system` namespace refuses (Spark wraps it as FAILED_TO_LOAD_ROUTINE)
    val e3 = intercept[Exception] {
      spark.sql("CALL graftp.elsewhere.history(table => 'rb')").collect()
    }
    assert(e3.getMessage.contains("elsewhere"))
    val e4 = intercept[Exception] {
      spark.sql("CALL graftp.system.history(table => 'no_such_table')").collect()
    }
    assert(e4.getMessage.contains("not a managed table"))
  }

  test("SHOW PROCEDURES lists the maintenance surface") {
    root // force catalog registration
    val shown = spark.sql("SHOW PROCEDURES IN graftp.system")
    val nameCol = shown.columns.indexWhere(_.contains("procedure"))
    assert(nameCol >= 0, s"unexpected SHOW PROCEDURES schema: ${shown.columns.toSeq}")
    assert(shown.collect().map(_.getString(nameCol)).toSet
      === GraftProcedures.All.toSet)
  }

  test("sort rewrites the managed layout key-ordered and commits a version") {
    val dir = s"$root/srt"
    // deliberately unsorted ingest
    Seq(7L, 3L, 9L, 1L, 5L, 8L, 2L, 6L, 4L).map(k => (k, s"v$k"))
      .toDF("k", "v").write.parquet(dir)
    TableMaintenance.compact(spark, dir, targetBytes = 1 << 20)
    val pre = versions(dir).max

    val row = spark.sql(
      "CALL graftp.system.sort(table => 'srt', keys => 'k', files => 3)").head
    assert(row.getLong(0) > pre, "sort must commit a new manifest version")
    assert(row.getInt(1) === 3)

    val dataDir = TableMaintenance.resolveDataDir(spark, dir)
    val files = fs.listStatus(new Path(dataDir))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(files.length === 3, "sort must write the requested file count")
    // disjoint ascending key ranges per file — the zone-map layout
    val ranges = files.map { f =>
      val ks = spark.read.parquet(f.getPath.toString)
        .select("k").collect().map(_.getLong(0))
      (ks.min, ks.max)
    }.sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Array((_, hi), (lo, _)) => hi < lo
      case _ => true
    }, s"files must own disjoint key ranges, got ${ranges.toSeq}")
    // logical content unchanged; manifest records the layout
    assert(spark.sql("SELECT count(*) FROM graftp.srt").head.getLong(0) === 9L)
    assert(ManifestCommit.latest(fs, new Path(dir)).get
      .entries("layout") === "sorted(k)")
  }

  test("sort reports the COMMITTED file count when cardinality caps the split") {
    val dir = s"$root/srt_few"
    // 2 distinct keys: repartitionByRange(8, k) can produce at most 2
    // non-empty range partitions, so fewer than the requested files land
    Seq((1L, "a"), (2L, "b"), (1L, "c"), (2L, "d"))
      .toDF("k", "v").write.parquet(dir)
    TableMaintenance.compact(spark, dir, targetBytes = 1 << 20)
    val row = spark.sql(
      "CALL graftp.system.sort(table => 'srt_few', keys => 'k', files => 8)").head
    val dataDir = TableMaintenance.resolveDataDir(spark, dir)
    val onDisk = fs.listStatus(new Path(dataDir))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(row.getInt(1) === onDisk,
      s"procedure must report what landed ($onDisk files), not the request (8)")
    assert(onDisk < 8, "fixture must actually exercise the under-split case")
  }

  test("zorder + stats_index: clustered rewrite, zone map, pruned serve") {
    val dir = s"$root/zo"
    (1L to 256L).map(k => (k, k % 16, s"v$k")).toDF("k", "g", "v")
      .write.parquet(dir)
    TableMaintenance.compact(spark, dir, targetBytes = 1 << 20)

    val zrow = spark.sql(
      "CALL graftp.system.zorder(table => 'zo', keys => 'k,g', files => 4)").head
    assert(zrow.getInt(1) === 4)
    assert(ManifestCommit.latest(fs, new Path(dir)).get
      .entries("layout") === "zorder(k,g)")
    assert(spark.sql("SELECT count(*) FROM graftp.zo").head.getLong(0) === 256L)

    val srow = spark.sql(
      "CALL graftp.system.stats_index(table => 'zo', keys => 'k,g')").head
    assert(srow.getInt(0) === 4, "stats_index must report the files indexed")
    assert(srow.getString(1) === "k,g")

    // the indexed layout serves range reads ≡ full scan, opening fewer
    // files (the readSkippingManaged path the procedure prepares)
    val skipped = TableMaintenance.readSkippingManaged(spark, dir,
      Seq(TableMaintenance.KeyRange("k", 1.0, 32.0)))
    val expect = spark.sql("SELECT * FROM graftp.zo WHERE k BETWEEN 1 AND 32")
    assert(skipped.collect().map(_.getLong(0)).sorted.toSeq
      === expect.collect().map(_.getLong(0)).sorted.toSeq)
    assert(skipped.inputFiles.length < 4,
      "a selective key range must prune at least one z-ordered file")

    // layout rewrites refuse merge-sink bucketed tables, like compact
    val e = intercept[Exception] {
      spark.sql("CALL graftp.system.sort(table => 'rb', keys => 'k')").collect()
    }
    assert(e.getMessage.contains("merge-sink"))
    // and refuse an empty key list loudly
    val e2 = intercept[Exception] {
      spark.sql("CALL graftp.system.zorder(table => 'zo', keys => ' ')").collect()
    }
    assert(e2.getMessage.contains("at least one column"))
  }

  test("defaults and positional arguments bind") {
    val dir = s"$root/d"
    (1L to 8L).map(k => (k, k * 2)).toDF("k", "x").write.parquet(dir)
    TableMaintenance.compact(spark, dir, targetBytes = 1 << 20)
    // positional, defaults for target_mb + sort_by
    val row = spark.sql("CALL graftp.system.compact('d')").head
    assert(row.getInt(1) === 1)
    // sorted compaction through the sort_by argument = zone-map restore
    spark.sql("CALL graftp.system.compact('d', 1, 'k')")
    val data = spark.read.parquet(TableMaintenance.resolveDataDir(spark, dir))
      .select("k").collect().map(_.getLong(0))
    assert(data.toSeq === data.sorted.toSeq, "sort_by must order the rewrite")
    assert(spark.sql("SELECT count(*) FROM graftp.d").head.getLong(0) === 8L)
  }

  test("export/restore round-trips the catalog with version history") {
    // a table with real history: base generation, then a deletion-vector
    // commit, so VERSION AS OF distinguishes the restored versions
    val dir = s"$root/exp_t"
    (1L to 6L).map(k => (k, s"v$k")).toDF("k", "v").write.parquet(dir)
    TableMaintenance.compact(spark, dir, targetBytes = 1 << 20)
    val preDelete = versions(dir).max
    // protocol-level delete (the catalog instance may predate any
    // deleteKey conf this test could set)
    TableMaintenance.deleteWhere(spark, dir, "k",
      org.apache.spark.sql.functions.col("k") > 4)
    assert(spark.sql("SELECT count(*) FROM graftp.exp_t").head.getLong(0) === 4L)
    // a second managed table, so the archive is genuinely multi-table
    // even when this test runs alone
    val dir2 = s"$root/exp_u"
    (1L to 8L).map(k => (k, k * 2)).toDF("k", "x").write.parquet(dir2)
    TableMaintenance.compact(spark, dir2, targetBytes = 1 << 20)

    val archive = java.nio.file.Files
      .createTempDirectory("graft-archive").toString + "/arc"
    val exported = spark.sql(
      s"CALL graftp.system.export(dest => '$archive')").collect()
    // the whole catalog went: every managed table this suite created
    val names = exported.map(_.getString(0)).toSet
    assert(names.contains("exp_t") && names.size > 1,
      s"expected a multi-table archive, got $names")
    exported.foreach(r => assert(r.getLong(2) > 0 && r.getLong(3) > 0L,
      s"archived table ${r.getString(0)} must report files+bytes"))

    // restore into a FRESH catalog root (the disaster-recovery shape)
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-restored").toString
    spark.conf.set("spark.sql.catalog.graftr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftr.root", root2)
    val restored = spark.sql(
      s"CALL graftr.system.restore(src => '$archive')").collect()
    assert(restored.map(_.getString(0)).toSet === names)

    // current state AND history both serve from the restored chain
    assert(spark.sql("SELECT count(*) FROM graftr.exp_t").head.getLong(0) === 4L)
    assert(spark.sql(
      s"SELECT count(*) FROM graftr.exp_t VERSION AS OF $preDelete")
      .head.getLong(0) === 6L,
      "the restored manifest chain must serve pre-delete history")
    assert(spark.sql("SELECT count(*) FROM graftr.exp_u").head.getLong(0) === 8L)

    // an existing table refuses silent replacement…
    val e = intercept[Exception](spark.sql(
      s"CALL graftr.system.restore(src => '$archive', table => 'exp_t')")
      .collect())
    assert(e.getMessage.contains("overwrite"), e.getMessage)
    // …and replaces under the explicit flag
    spark.sql(s"CALL graftr.system.restore(src => '$archive', " +
      "table => 'exp_t', overwrite => true)").collect()
    assert(spark.sql("SELECT count(*) FROM graftr.exp_t").head.getLong(0) === 4L)

    // a half-written archive (no completeness manifest) refuses to restore
    val broken = java.nio.file.Files
      .createTempDirectory("graft-broken").toString + "/arc"
    new java.io.File(broken).mkdirs()
    val e2 = intercept[Exception](spark.sql(
      s"CALL graftr.system.restore(src => '$broken')").collect())
    assert(e2.getMessage.contains("not a graft export archive"), e2.getMessage)
  }
}
