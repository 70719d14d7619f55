package graft.sinks

import graft.SparkSpec

class ParquetMergeSinkSpec extends SparkSpec {
  import spark.implicits._

  test("merge is an idempotent latest-wins upsert") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/t"
    val b1 = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b1, dir, Seq("k"), "ver")
    assert(ParquetMergeSink.read(spark, dir).count() === 2)

    // newer version wins, older is ignored, replay is a no-op
    val b2 = Seq((1L, "a2", 20L), (3L, "c", 5L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b2, dir, Seq("k"), "ver")
    ParquetMergeSink.merge(b2, dir, Seq("k"), "ver") // replay
    val rows = ParquetMergeSink.read(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[String]("v"), r.getAs[Long]("ver"))).toMap
    assert(rows === Map(1L -> ("a2", 20L), 2L -> ("b", 10L), 3L -> ("c", 5L)))

    val b3 = Seq((1L, "stale", 1L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b3, dir, Seq("k"), "ver")
    val after = ParquetMergeSink.read(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(after(1L) === "a2", "stale version must not overwrite")
  }

  test("merge rewrites only buckets containing conflicting keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-part").toString + "/t"
    // enough keys that all 4 buckets are populated
    val b1 = (1L to 40L).map(k => (k, s"v$k", 10L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b1, dir, Seq("k"), "ver", nBuckets = 4)

    def fileState(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.length(), f.lastModified()))
        .toMap
    }
    val before = fileState()
    assert(before.keys.map(p => p.split("/").find(_.startsWith("__bucket=")).get).toSet.size === 4)

    // a single-key batch must only rewrite that key's bucket
    val b2 = Seq((7L, "v7-new", 20L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b2, dir, Seq("k"), "ver", nBuckets = 4)
    val after = fileState()

    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    val touchedBucket = "__bucket=" + Seq(7L).toDF("k")
      .select(pmod(xxhash64($"k"), lit(4)).cast("int")).head.getInt(0)
    val untouchedBefore = before.filterNot(_._1.contains(touchedBucket))
    val untouchedAfter = after.filterNot(_._1.contains(touchedBucket))
    assert(untouchedBefore === untouchedAfter,
      "files in buckets without conflicting keys must be byte-identical (same path, size, mtime)")
    assert(before.keys.exists(_.contains(touchedBucket)) &&
      after.filter(_._1.contains(touchedBucket)) != before.filter(_._1.contains(touchedBucket)),
      "the conflicting bucket must actually be rewritten")

    val rows = ParquetMergeSink.read(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(rows.size === 40 && rows(7L) === "v7-new" && rows(8L) === "v8")
  }

  test("a multi-bucket merge commits atomically: one manifest flip covers all buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-atomic").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ParquetMergeSink.merge(
      (1L to 40L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 4)
    val v1 = ManifestCommit.latest(fs, new org.apache.hadoop.fs.Path(dir)).get
    // second merge touches ALL buckets; exactly ONE new manifest version
    // appears, and every touched bucket's entry moves in that single flip
    ParquetMergeSink.merge(
      (1L to 40L).map(k => (k, s"w$k", 2L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 4)
    val v2 = ManifestCommit.latest(fs, new org.apache.hadoop.fs.Path(dir)).get
    assert(v2.version === v1.version + 1)
    assert(v2.dirs.keySet === v1.dirs.keySet)
    assert(v2.dirs.forall { case (b, rel) => v1.dirs(b) != rel },
      "all four bucket entries must flip in one manifest commit")
    // data generations are immutable: nothing the old manifest referenced
    // was overwritten (readers of v1 mid-merge were never disturbed)
    val rows = ParquetMergeSink.read(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(rows === (1L to 40L).map(k => k -> s"w$k").toMap)
  }

  test("streaming foreachBatch drives the merge sink end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-stream").toString + "/t"
    val input = MemoryStream[(Long, String, Long)]
    input.addData((1L, "a1", 10L), (2L, "b1", 10L))
    input.addData((1L, "a2", 20L), (3L, "c1", 10L)) // update + insert
    val q = input.toDF().toDF("k", "v", "ver").writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ParquetMergeSink.merge(batch, dir, Seq("k"), "ver", nBuckets = 4)
      }
      .start()
    q.awaitTermination(60000)
    val rows = ParquetMergeSink.read(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(rows === Map(1L -> "a2", 2L -> "b1", 3L -> "c1"),
      "micro-batches must merge latest-wins into the lake table")
  }

  test("a mismatched nBuckets cannot split the table layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-marker").toString + "/t"
    ParquetMergeSink.merge(
      (1L to 20L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 8)
    // second writer passes a DIFFERENT bucket count: the committed count
    // must win, so the key's existing bucket is still read and merged
    ParquetMergeSink.merge(
      Seq((7L, "v7-new", 2L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 2)
    val rows = ParquetMergeSink.read(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(rows.size === 20 && rows(7L) === "v7-new",
      "no duplicate key across buckets, update applied in place")
  }

  test("bucket count commits before data; generations without a log fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-crash").toString + "/t"
    ParquetMergeSink.merge(
      (1L to 20L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 8)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = ManifestCommit.committed(fs, root)
    assert(manifests.head.entries("buckets") === "8",
      "v1 must pin the bucket count before any data generation exists")
    // Simulate the unknowable state (commit log lost while generation
    // dirs exist): a merge must refuse rather than re-bucket — silently
    // splitting existing keys across buckets — or reset the table.
    fs.delete(new org.apache.hadoop.fs.Path(root, ManifestCommit.CommitDir), true)
    val ex = intercept[IllegalStateException] {
      ParquetMergeSink.merge(
        Seq((7L, "v7-new", 2L)).toDF("k", "v", "ver"),
        dir, Seq("k"), "ver", nBuckets = 2)
    }
    assert(ex.getMessage.contains("_commits"))
  }

  test("vacuum keeps the previous generation for in-flight readers, reclaims older") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-vac").toString + "/t"
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def gens(): Set[String] = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_g"))
      .map(_.getPath.getName).toSet
    ParquetMergeSink.merge(Seq((1L, "a", 1L)).toDF("k", "v", "ver"), dir, Seq("k"), "ver", 2)
    val g1 = gens()
    ParquetMergeSink.merge(Seq((1L, "b", 2L)).toDF("k", "v", "ver"), dir, Seq("k"), "ver", 2)
    assert(gens().intersect(g1) === g1, "previous generation must survive one commit")
    ParquetMergeSink.merge(Seq((1L, "c", 3L)).toDF("k", "v", "ver"), dir, Seq("k"), "ver", 2)
    assert(gens().intersect(g1).isEmpty, "fully superseded generation must be reclaimed")
    assert(ParquetMergeSink.read(spark, dir).collect()
      .map(_.getAs[String]("v")).toSeq === Seq("c"))
  }

  test("a pre-protocol table (bucket dirs + marker) migrates instead of resetting") {
    // hand-build the OLD layout this sink wrote before the manifest
    // protocol: top-level __bucket=N dirs + a .graft-buckets marker
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-legacy").toString + "/t"
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    val legacy = (1L to 20L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ver")
      .withColumn("__bucket", pmod(xxhash64($"k"), lit(4)).cast("int"))
    legacy.write.partitionBy("__bucket").parquet(dir)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, ".graft-buckets"), "4".getBytes)
    // reads serve the legacy rows as-is
    assert(ParquetMergeSink.read(spark, dir).count() === 20)
    // the first post-upgrade merge folds INTO the legacy rows (a silent
    // fresh-table reset would drop 19 of them / duplicate key 7)
    ParquetMergeSink.merge(Seq((7L, "v7-new", 2L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 16) // wrong count must be ignored too
    val rows = ParquetMergeSink.read(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(rows.size === 20 && rows(7L) === "v7-new" && rows(8L) === "v8")
    // legacy dirs get the same keep=2 grace as generations, then reclaim
    ParquetMergeSink.merge(Seq((7L, "v7-n2", 3L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver")
    ParquetMergeSink.merge(Seq((8L, "v8-n2", 3L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver")
    assert(ParquetMergeSink.read(spark, dir).count() === 20)
    // bucket dirs without marker or manifest stay a loud failure
    val dir2 = java.nio.file.Files.createTempDirectory("graft-sink-nomark").toString + "/t"
    legacy.write.partitionBy("__bucket").parquet(dir2)
    new java.io.File(dir2, "_SUCCESS").delete()
    val ex = intercept[IllegalStateException] {
      ParquetMergeSink.merge(Seq((1L, "x", 9L)).toDF("k", "v", "ver"),
        dir2, Seq("k"), "ver")
    }
    assert(ex.getMessage.contains("unknowable"))
  }

  test("time travel reads a retained version; rollback re-commits it as the head") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-tt").toString + "/t"
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def vAt(d: String, ver: Long): Map[Long, String] =
      ParquetMergeSink.readVersion(spark, d, ver).collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    def vNow(d: String): Map[Long, String] =
      ParquetMergeSink.read(spark, d).collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap

    ParquetMergeSink.merge(
      Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver")
    val vOrig = ManifestCommit.latest(fs, root).get.version
    ParquetMergeSink.merge(Seq((1L, "a2", 20L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver")
    val vHead = ManifestCommit.latest(fs, root).get.version
    assert(vHead === vOrig + 1)

    // head sees the upsert; the superseded version is still addressable
    assert(vNow(dir) === Map(1L -> "a2", 2L -> "b"))
    assert(vAt(dir, vOrig) === Map(1L -> "a", 2L -> "b"))

    // rollback re-commits the old entries as a NEW head: nothing deleted,
    // the overwritten head remains addressable for forensics
    val vRestored = ManifestCommit.rollback(fs, root, vOrig)
    assert(vRestored === vHead + 1)
    assert(vNow(dir) === Map(1L -> "a", 2L -> "b"))
    assert(vAt(dir, vHead) === Map(1L -> "a2", 2L -> "b"))

    // and a merge on top of the rollback builds on the restored state
    ParquetMergeSink.merge(Seq((2L, "b2", 30L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver")
    assert(vNow(dir) === Map(1L -> "a", 2L -> "b2"))

    // unretained / never-committed versions fail loudly on both paths
    intercept[IllegalArgumentException](
      ParquetMergeSink.readVersion(spark, dir, 999L))
    intercept[IllegalArgumentException](
      ManifestCommit.rollback(fs, root, 999L))
  }

  test("incoming row wins a version tie (ON CONFLICT DO UPDATE)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-tie").toString + "/t"
    val b1 = Seq((100L, "old", 100L)).toDF("height", "v", "ver")
    ParquetMergeSink.merge(b1, dir, Seq("height"), "ver")
    // same key, same version (version = key, the IndexerFlow pattern),
    // changed content: the replayed/incoming row must survive
    val b2 = Seq((100L, "new", 100L)).toDF("height", "v", "ver")
    ParquetMergeSink.merge(b2, dir, Seq("height"), "ver")
    val v = ParquetMergeSink.read(spark, dir).collect().map(_.getAs[String]("v"))
    assert(v.toSeq === Seq("new"))
  }

  test("mergeActions applies delete+update+insert in one commit, idempotently") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-act").toString + "/t"
    val base = Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L), (4L, "d", 10L))
      .toDF("k", "v", "ver")
    ParquetMergeSink.merge(base, dir, Seq("k"), "ver", nBuckets = 4)
    val vBefore = ManifestCommit.latest(
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(dir)).get.version

    // one source batch carrying all three actions:
    //   k=1 matched+delete, k=2 matched+update, k=5 unmatched+insert,
    //   k=6 unmatched+delete (must be a no-op),
    //   k=7 duplicated in-batch — the winning (ver=30) row says update
    val src = Seq(
      (1L, "DEAD", 20L, true),
      (2L, "b2", 20L, false),
      (5L, "e", 20L, false),
      (6L, "GHOST", 20L, true),
      (7L, "late", 30L, false),
      (7L, "early-delete", 20L, true)
    ).toDF("k", "v", "ver", "del")
    ParquetMergeSink.mergeActions(src, dir, Seq("k"), "ver", col("del"))

    def state(): Map[Long, String] = ParquetMergeSink.read(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    val expected = Map(2L -> "b2", 3L -> "c", 4L -> "d", 5L -> "e", 7L -> "late")
    assert(state() === expected)
    // the delete-marked column never leaks into the table
    assert(!ParquetMergeSink.read(spark, dir).columns.contains("del"))

    // ONE commit: exactly one manifest version past the base table
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val vAfter = ManifestCommit.latest(fs, new org.apache.hadoop.fs.Path(dir)).get.version
    assert(vAfter === vBefore + 1,
      "delete+update+insert must land as a single manifest flip")

    // replay idempotence: same batch again converges to the same table
    ParquetMergeSink.mergeActions(src, dir, Seq("k"), "ver", col("del"))
    assert(state() === expected)
  }

  test("mergeActions: a fully-deleted bucket drops out of the manifest; crash window is invisible") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-del").toString + "/t"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val table = new org.apache.hadoop.fs.Path(dir)
    // 2 buckets; find keys landing in each
    val byBucket = (1L to 20L).groupBy { k =>
      Seq(k).toDF("k").select(
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"k"),
          org.apache.spark.sql.functions.lit(2)).cast("int")).head.getInt(0)
    }
    val (b0Keys, b1Keys) = (byBucket(0).take(2), byBucket(1).take(2))
    val base = (b0Keys ++ b1Keys).map(k => (k, s"v$k", 10L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(base, dir, Seq("k"), "ver", nBuckets = 2)

    // delete EVERY key of bucket 0 → its manifest entry must disappear
    val wipe = b0Keys.map(k => (k, "x", 20L, true)).toDF("k", "v", "ver", "del")
    ParquetMergeSink.mergeActions(wipe, dir, Seq("k"), "ver", col("del"))
    val m = ManifestCommit.latest(fs, table).get
    assert(!m.entries.contains("dir.0"), s"emptied bucket still in manifest: ${m.entries}")
    assert(ParquetMergeSink.read(spark, dir).collect().map(_.getAs[Long]("k")).toSet
      === b1Keys.toSet)

    // crash window: an orphan generation written WITHOUT a manifest flip
    // (the state a crash mid-mergeActions leaves) is invisible to readers
    val before = ParquetMergeSink.read(spark, dir).collect().map(_.toSeq).toSet
    val orphan = new org.apache.hadoop.fs.Path(table, "gen-99999-orphan")
    fs.mkdirs(new org.apache.hadoop.fs.Path(orphan, "__bucket=1"))
    assert(ParquetMergeSink.read(spark, dir).collect().map(_.toSeq).toSet === before,
      "an uncommitted generation must never be observed")
    // and the next committed action still works over it
    val more = b1Keys.take(1).map(k => (k, "upd", 30L, false)).toDF("k", "v", "ver", "del")
    ParquetMergeSink.mergeActions(more, dir, Seq("k"), "ver", col("del"))
    assert(ParquetMergeSink.read(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
      .get(b1Keys.head).contains("upd"))
  }

  test("mergeActions create path stores the same columns as merge-into-existing") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-create").toString + "/t"
    // brand-new table, source carries the CDC verdict column: the stored
    // schema must NOT include it (same columns a later merge would store)
    val src = Seq((1L, "a", 10L, false), (2L, "DEAD", 10L, true))
      .toDF("k", "v", "ver", "del")
    ParquetMergeSink.mergeActions(src, dir, Seq("k"), "ver", col("del"))
    val t = ParquetMergeSink.read(spark, dir)
    assert(t.columns.toSet === Set("k", "v", "ver"),
      s"create-via-mergeActions leaked the predicate column: ${t.columns.toSeq}")
    assert(t.collect().map(_.getAs[Long]("k")).toSeq === Seq(1L))

    // explicit targetCols declares the schema when the predicate reads a
    // genuine data column (here: delete on v's content)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-merge-create2").toString + "/t"
    val src2 = Seq((1L, "keep", 10L), (2L, "DEAD", 10L)).toDF("k", "v", "ver")
    ParquetMergeSink.mergeActions(src2, dir2, Seq("k"), "ver",
      col("v") === "DEAD", targetCols = Seq("k", "v", "ver"))
    val t2 = ParquetMergeSink.read(spark, dir2)
    assert(t2.columns.toSet === Set("k", "v", "ver"))
    assert(t2.collect().map(_.getAs[Long]("k")).toSeq === Seq(1L))
    // targetCols must cover keys+version and come from the source
    intercept[IllegalArgumentException] {
      ParquetMergeSink.mergeActions(src2, dir2 + "x", Seq("k"), "ver",
        col("v") === "DEAD", targetCols = Seq("k", "v"))
    }
  }

  test("a batch missing the merge key or version column refuses instead of null-filling") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-req").toString + "/t"
    ParquetMergeSink.merge(
      Seq((1L, "a", 10L)).toDF("k", "v", "ver"), dir, Seq("k"), "ver")

    // missing version: a null-filled ver would silently lose latest-wins
    val noVer = intercept[IllegalArgumentException] {
      ParquetMergeSink.merge(Seq((1L, "a2")).toDF("k", "v"), dir, Seq("k"), "ver")
    }
    assert(noVer.getMessage.contains("ver"), noVer.getMessage)
    // missing key: every row would hash to one bucket and collapse to one
    val noKey = intercept[IllegalArgumentException] {
      ParquetMergeSink.merge(Seq(("a2", 20L)).toDF("v", "ver"), dir, Seq("k"), "ver")
    }
    assert(noKey.getMessage.contains("k"), noKey.getMessage)
    // mergeActions: same front door
    val actNoVer = intercept[IllegalArgumentException] {
      ParquetMergeSink.mergeActions(
        Seq((1L, "a2", false)).toDF("k", "v", "del"), dir, Seq("k"), "ver",
        org.apache.spark.sql.functions.col("del"))
    }
    assert(actNoVer.getMessage.contains("ver"), actNoVer.getMessage)
    assert(ParquetMergeSink.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq === Seq((1L, "a")),
      "refused batches must leave the table untouched")

    // a genuinely-new DATA column is the one thing that null-fills:
    // post-ADD COLUMN, an old-shape writer (carrying keys+version but not
    // the new column) still merges
    ParquetMergeSink.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    ParquetMergeSink.merge(
      Seq((2L, "b", 10L)).toDF("k", "v", "ver"), dir, Seq("k"), "ver")
    val rows = ParquetMergeSink.read(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.isNullAt(r.fieldIndex("score"))).toMap
    assert(rows === Map(1L -> true, 2L -> true))
  }

  test("a batch with case-duplicate columns refuses instead of silently collapsing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-case").toString + "/t"
    ParquetMergeSink.merge(
      Seq((1L, "a", 10L)).toDF("k", "v", "ver"), dir, Seq("k"), "ver")
    val dup = Seq((1L, "lower", "UPPER", 20L)).toDF("k", "v", "V", "ver")
    val e = intercept[IllegalArgumentException] {
      ParquetMergeSink.merge(dup, dir, Seq("k"), "ver")
    }
    assert(e.getMessage.contains("case"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      ParquetMergeSink.mergeActions(
        dup.withColumn("del", org.apache.spark.sql.functions.lit(false)),
        dir, Seq("k"), "ver", org.apache.spark.sql.functions.col("del"))
    }
    assert(e2.getMessage.contains("case"), e2.getMessage)
  }

  test("mergeActions matched UPDATE carries post-ALTER columns an old-shape source lacks") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-carry").toString + "/t"
    ParquetMergeSink.merge(
      Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver")
    ParquetMergeSink.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    // a new-shape writer sets score for k=1
    ParquetMergeSink.merge(
      Seq((1L, "a", 20L, 0.9)).toDF("k", "v", "ver", "score"),
      dir, Seq("k"), "ver")

    // an old-shape CDC writer (predates the ALTER) updates k=1, deletes
    // k=2, inserts k=3 — k=1's score must SURVIVE the update, not null out
    val oldShape = Seq(
      (1L, "a-upd", 30L, false), (2L, "b", 30L, true), (3L, "c", 30L, false))
      .toDF("k", "v", "ver", "del")
    ParquetMergeSink.mergeActions(oldShape, dir, Seq("k"), "ver", col("del"))
    val rows = ParquetMergeSink.read(spark, dir).collect().map(r =>
      r.getAs[Long]("k") -> (r.getAs[String]("v"),
        if (r.isNullAt(r.fieldIndex("score"))) None
        else Some(r.getAs[Double]("score")))).toMap
    assert(rows === Map(
      1L -> ("a-upd", Some(0.9)), // updated, score carried over
      3L -> ("c", None)),          // inserted, score null-filled
      s"got $rows")

    // replay converges (idempotent under the carry-over too)
    ParquetMergeSink.mergeActions(oldShape, dir, Seq("k"), "ver", col("del"))
    val again = ParquetMergeSink.read(spark, dir).collect().map(r =>
      r.getAs[Long]("k") -> (if (r.isNullAt(r.fieldIndex("score"))) None
        else Some(r.getAs[Double]("score")))).toMap
    assert(again === Map(1L -> Some(0.9), 3L -> None))
  }

  test("renameColumn keeps physical names: mergeActions and time travel across the flip") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-rename").toString + "/t"
    ParquetMergeSink.merge(
      Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val preRename = ManifestCommit.latest(
      fs, new org.apache.hadoop.fs.Path(dir)).get.version

    ParquetMergeSink.renameColumn(spark, dir, "v", "label")
    // values survive under the new name; old name is gone
    val read = ParquetMergeSink.read(spark, dir)
    assert(read.columns.toSeq === Seq("k", "label", "ver"))
    assert(read.collect().map(r =>
      r.getAs[Long]("k") -> r.getAs[String]("label")).toMap
      === Map(1L -> "a", 2L -> "b"))
    // time travel serves the pre-rename name and values
    val old = ParquetMergeSink.readVersion(spark, dir, preRename)
    assert(old.columns.toSeq === Seq("k", "v", "ver"))

    // a NEW-shape CDC writer drives all three actions through the rename:
    // the post-rename generation is written under the ORIGINAL physical
    // name, so both generations keep one file schema
    val cdc = Seq((1L, "a2", 20L, false), (2L, "b", 20L, true),
      (3L, "c", 20L, false)).toDF("k", "label", "ver", "del")
    ParquetMergeSink.mergeActions(cdc, dir, Seq("k"), "ver", col("del"))
    assert(ParquetMergeSink.read(spark, dir).collect().map(r =>
      r.getAs[Long]("k") -> r.getAs[String]("label")).toMap
      === Map(1L -> "a2", 3L -> "c"))
    // every generation's files carry the PHYSICAL name v, never label
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val fields = walk(new java.io.File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .flatMap(f => spark.read.parquet(f.getAbsolutePath).columns)
      .toSet
    assert(fields.contains("v") && !fields.contains("label"),
      s"generations must share the physical name; saw $fields")

    // dropColumns retires the physical name; re-add starts a fresh one
    ParquetMergeSink.dropColumns(spark, dir, Seq("label"))
    assert(ParquetMergeSink.read(spark, dir).columns.toSeq === Seq("k", "ver"))
    ParquetMergeSink.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val vVals = ParquetMergeSink.read(spark, dir).collect()
      .map(r => Option(r.getAs[String]("v")))
    assert(vVals.nonEmpty && vVals.forall(_.isEmpty),
      "re-added v must not resurrect the dropped label's physical data")
  }

  test("empty batches against a nonexistent path leave the filesystem untouched") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-merge-noop").toString
    val dir = root + "/t"
    val empty = Seq.empty[(Long, String, Long, Boolean)].toDF("k", "v", "ver", "del")
    ParquetMergeSink.mergeActions(empty, dir, Seq("k"), "ver", col("del"))
    ParquetMergeSink.merge(empty.drop("del"), dir, Seq("k"), "ver")
    assert(!new java.io.File(dir).exists(),
      "a no-op batch must not mint an empty table as a side effect")
    assert(ParquetMergeSink.readIfExists(spark, dir).isEmpty)
  }
}
