package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.Tables.BarrierOps
import graft.indexer.Upsert

/** Idempotent merge sink over parquet — the concrete form of the
  * reference's `INSERT ... ON CONFLICT DO UPDATE` target tables
  * (db.go:1171-1175) for a lake without a transactional format.
  *
  * Scale design — partition-scoped rewrite, not table rewrite: the table
  * is laid out as `path/__bucket=N/` with N = hash(key) mod `nBuckets`.
  * A merge touches ONLY the buckets containing the batch's keys: it reads
  * those buckets (partition-pruned scan), resolves latest-wins, writes a
  * staging dir, and swaps per-bucket. Buckets without conflicting keys are
  * never read or rewritten — at 100 TB a small batch costs
  * O(batch + touched-buckets), not O(table).
  *
  * Durability: the swap is rename-target-aside → rename-staging-in →
  * delete-aside, every rename checked. A crash between the renames leaves
  * an `.aside-` dir that [[recover]] (run at the start of every merge)
  * rolls back; a crash after leaves a committed bucket. Each bucket swap
  * is atomic; cross-bucket a crash can commit a prefix of buckets, which
  * the replay-idempotence of latest-wins absorbs (re-running the same
  * batch converges). Single-writer, like the reference indexer.
  *
  * Version ties: ON CONFLICT DO UPDATE semantics — the incoming row wins
  * (a source-precedence tie-break, so version collisions like
  * version = key are still deterministic).
  *
  * The bucket count is persisted in a `.graft-buckets` marker at the
  * table root on creation and read back on every merge — a caller's
  * `nBuckets` only applies to a NEW table, so two writers can never
  * bucket the same key differently (which would silently duplicate keys
  * across buckets).
  *
  * All I/O goes through the Hadoop FileSystem API, so `path` may be
  * file://, hdfs:// or s3a://. The swap's atomicity relies on directory
  * rename being atomic, which holds on HDFS and local filesystems; S3A
  * renames are copy+delete, so on object stores run single-writer with
  * idempotent replay as the recovery story — or use a transactional
  * format (Delta/Iceberg), where `merge` becomes a MERGE INTO with the
  * same key/version semantics.
  */
object ParquetMergeSink {

  private val BucketCol = "__bucket"
  private val PrefCol = "__pref"

  private def fsFor(batch: DataFrame, p: Path): FileSystem = {
    val conf = batch.sparkSession.sparkContext.hadoopConfiguration
    p.getFileSystem(if (conf != null) conf else new Configuration())
  }

  /** Roll back (or finish) any swap interrupted by a crash: an
    * `.aside-__bucket=N` dir whose target is missing is restored; one
    * whose target exists is a completed swap's leftover and is dropped.
    * Stale staging dirs are uncommitted by construction and removed.
    */
  private def recover(fs: FileSystem, table: Path): Unit = {
    if (!fs.exists(table)) return
    fs.listStatus(table).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(".aside-")) {
        val target = new Path(table, name.stripPrefix(".aside-"))
        if (!fs.exists(target)) {
          require(fs.rename(st.getPath, target),
            s"recovery rename failed: ${st.getPath} -> $target")
        } else {
          fs.delete(st.getPath, true)
        }
      } else if (name.startsWith(".staging-")) {
        fs.delete(st.getPath, true)
      }
    }
  }

  private val BucketsMarker = ".graft-buckets"

  /** The table's committed bucket count: the marker wins over the caller's
    * `requested` (which only sizes a NEW table). A mismatched count would
    * route a key to a different bucket than its existing row — silent
    * duplicates — so layout is table state, not a per-call choice.
    *
    * Bucket dirs WITHOUT a marker mean the layout is unknowable (e.g. a
    * marker lost to manual deletion): guessing `requested` could re-bucket
    * existing keys and silently duplicate them, so fail loudly instead.
    * The marker itself is written BEFORE any bucket dir is published
    * (see [[merge]]), so a crash can never produce this state.
    */
  private def bucketCount(fs: FileSystem, table: Path, requested: Int): Int = {
    val marker = new Path(table, BucketsMarker)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim.toInt
      finally in.close()
    } else if (fs.exists(table) &&
        fs.listStatus(table).exists(_.getPath.getName.startsWith(s"$BucketCol="))) {
      throw new IllegalStateException(
        s"$table has $BucketCol= dirs but no $BucketsMarker marker: bucket " +
          "count unknowable; refusing to guess (re-bucketing would silently " +
          "duplicate keys). Restore the marker with the original count.")
    } else requested
  }

  private def writeBucketMarker(fs: FileSystem, table: Path, n: Int): Unit = {
    val out = fs.create(new Path(table, BucketsMarker), true)
    try out.write(n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def merge(batch: DataFrame, path: String, keys: Seq[String], version: String,
      nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val table = new Path(path)
    val fs = fsFor(batch, table)
    recover(fs, table)

    val buckets = bucketCount(fs, table, nBuckets)
    // Marker lands at TABLE CREATION, before any bucket dir exists: a crash
    // mid-first-merge then leaves published buckets WITH their marker, so a
    // later merge (even with a different requested nBuckets) reads the
    // committed count instead of silently re-bucketing keys.
    if (!fs.exists(new Path(table, BucketsMarker))) {
      fs.mkdirs(table)
      writeBucketMarker(fs, table, buckets)
    }
    val bucketOf = pmod(xxhash64(keys.map(col): _*), lit(buckets)).cast("int")
    val batchB = batch.withColumn(BucketCol, bucketOf)
      .withColumn(PrefCol, lit(1)) // incoming outranks current on version ties
      .barrier() // bucket list + merge input: compute the batch once
    val touched = batchB.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return

    val hasTable = fs.exists(table) &&
      fs.listStatus(table).exists(_.getPath.getName.startsWith(s"$BucketCol="))
    val current =
      if (hasTable)
        Some(spark.read.parquet(path)
          .filter(col(BucketCol).isin(touched.toIndexedSeq.map(Integer.valueOf): _*))
          .withColumn(PrefCol, lit(0)))
      else None

    val merged = Upsert.latestWins(
        current.fold(batchB)(_.unionByName(batchB)),
        keys, col(version), col(PrefCol).desc)
      .drop(PrefCol)

    val staging = new Path(table, s".staging-${java.util.UUID.randomUUID()}")
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy(BucketCol).parquet(staging.toString)

    touched.foreach { b =>
      val part = s"$BucketCol=$b"
      val src = new Path(staging, part)
      val target = new Path(table, part)
      val aside = new Path(table, s".aside-$part")
      if (!fs.exists(src)) {
        // a touched bucket may legitimately produce no rows (all-null keys
        // upserted away) — nothing to swap
      } else {
        if (fs.exists(target)) {
          require(fs.rename(target, aside), s"rename aside failed: $target")
        }
        if (!fs.rename(src, target)) {
          // restore and fail loudly rather than leaving the bucket missing
          if (fs.exists(aside)) fs.rename(aside, target)
          throw new java.io.IOException(s"rename staging->target failed: $src -> $target")
        }
        if (fs.exists(aside)) fs.delete(aside, true)
      }
    }
    fs.delete(staging, true)
  }
}
