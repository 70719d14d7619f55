package graft.sinks

import graft.SparkSpec

class ParquetMergeSinkSpec extends SparkSpec {
  import spark.implicits._

  test("merge is an idempotent latest-wins upsert") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/t"
    val b1 = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b1, dir, Seq("k"), "ver")
    assert(spark.read.parquet(dir).count() === 2)

    // newer version wins, older is ignored, replay is a no-op
    val b2 = Seq((1L, "a2", 20L), (3L, "c", 5L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b2, dir, Seq("k"), "ver")
    ParquetMergeSink.merge(b2, dir, Seq("k"), "ver") // replay
    val rows = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[String]("v"), r.getAs[Long]("ver"))).toMap
    assert(rows === Map(1L -> ("a2", 20L), 2L -> ("b", 10L), 3L -> ("c", 5L)))

    val b3 = Seq((1L, "stale", 1L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b3, dir, Seq("k"), "ver")
    val after = spark.read.parquet(dir).collect()
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

    val rows = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(rows.size === 40 && rows(7L) === "v7-new" && rows(8L) === "v8")
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
    val rows = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(rows === Map(1L -> "a2", 2L -> "b1", 3L -> "c1"),
      "micro-batches must merge latest-wins into the lake table")
  }

  test("a mismatched nBuckets cannot split the table layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-marker").toString + "/t"
    ParquetMergeSink.merge(
      (1L to 20L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 8)
    // second writer passes a DIFFERENT bucket count: the persisted marker
    // must win, so the key's existing bucket is still read and merged
    ParquetMergeSink.merge(
      Seq((7L, "v7-new", 2L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 2)
    val rows = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(rows.size === 20 && rows(7L) === "v7-new",
      "no duplicate key across buckets, update applied in place")
  }

  test("marker lands at creation; bucket dirs without one fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-crash").toString + "/t"
    ParquetMergeSink.merge(
      (1L to 20L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ver"),
      dir, Seq("k"), "ver", nBuckets = 8)
    val marker = new java.io.File(dir, ".graft-buckets")
    assert(marker.isFile, "marker must exist after the creating merge")
    assert(java.nio.file.Files.readString(marker.toPath).trim === "8")
    // Simulate the unknowable state (marker lost while bucket dirs exist):
    // a merge with a DIFFERENT requested count must refuse rather than
    // re-bucket — silently splitting existing keys across buckets.
    assert(marker.delete())
    val ex = intercept[IllegalStateException] {
      ParquetMergeSink.merge(
        Seq((7L, "v7-new", 2L)).toDF("k", "v", "ver"),
        dir, Seq("k"), "ver", nBuckets = 2)
    }
    assert(ex.getMessage.contains(".graft-buckets"))
  }

  test("incoming row wins a version tie (ON CONFLICT DO UPDATE)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-tie").toString + "/t"
    val b1 = Seq((100L, "old", 100L)).toDF("height", "v", "ver")
    ParquetMergeSink.merge(b1, dir, Seq("height"), "ver")
    // same key, same version (version = key, the IndexerFlow pattern),
    // changed content: the replayed/incoming row must survive
    val b2 = Seq((100L, "new", 100L)).toDF("height", "v", "ver")
    ParquetMergeSink.merge(b2, dir, Seq("height"), "ver")
    val v = spark.read.parquet(dir).collect().map(_.getAs[String]("v"))
    assert(v.toSeq === Seq("new"))
  }
}
