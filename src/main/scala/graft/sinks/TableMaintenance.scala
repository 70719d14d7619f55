package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operations a 100 TB parquet lake runs on a schedule:
  * zone-map-friendly sorted writes and small-file compaction.
  *
  * Both exist because the read path's cheapest win is SKIPPING: parquet
  * footers carry per-column min/max, and Spark prunes row groups (and
  * whole files, via footer ranges) when a filter falls outside them. A
  * table written in arrival order interleaves every key everywhere — the
  * stats cover the full domain and prune nothing. Range-partitioned,
  * sorted-within-partition layout gives each file a disjoint key slice,
  * so a point or range predicate touches O(matching files) instead of
  * O(table). The reference leans on exactly this shape via PostgreSQL
  * b-tree indexes on every fact table (db.go:394-524 `CREATE INDEX`
  * statements); a lake gets the same effect from physical layout.
  *
  * All I/O goes through the Hadoop FileSystem API (file://, hdfs://,
  * s3a://).
  */
object TableMaintenance {

  /** Write `df` range-partitioned and sorted by `keys` into `numFiles`
    * files. `repartitionByRange` samples key quantiles so files get
    * near-equal row counts even under key skew (a hash layout would need
    * salting; a naive fixed-split layout would hotspot). After this
    * write, every output file owns a disjoint `keys` range — the
    * zone-map layout.
    */
  def writeSorted(df: DataFrame, path: String, numFiles: Int,
      keys: Seq[String]): Unit =
    df.repartitionByRange(numFiles, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style directory-partitioned layout (`path/day=2024-05-01/…`) —
    * the canonical shape for date-keyed facts. A scan whose filter hits
    * the partition columns prunes whole directories from the file
    * listing (PartitionFilters in the plan) before reading a byte:
    * the daily-ingest / last-N-days-query pattern touches O(days asked)
    * regardless of table size, and each day's ingest is a pure directory
    * add. Combine with [[writeSorted]] INSIDE each partition (sort the
    * remaining keys) to stack zone-map skipping on top of directory
    * pruning.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  /** Compact a directory of parquet files toward `targetBytes` per file.
    *
    * Streaming sinks and frequent small merges strew thousands of tiny
    * files; each costs a footer round-trip (catastrophic on object
    * stores) and a scheduler task. Compaction reads the table once and
    * rewrites it into `ceil(totalBytes / targetBytes)` files — sorted by
    * `sortKeys` when given, so compaction doubles as the zone-map
    * restore. The rewrite goes to a staging dir and swaps in via the
    * same rename discipline as [[ParquetMergeSink]] (stage → aside →
    * commit), so a crash mid-compaction leaves either the old or the new
    * layout, never a mix. Returns the output file count.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long,
      sortKeys: Seq[String] = Nil): Int = {
    val root = new Path(path)
    val fs: FileSystem =
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new Path(root.getParent, s".aside-${root.getName}")
    // Crash recovery: an aside with no table is an interrupted swap —
    // roll back; an aside next to a committed table is leftover — drop.
    if (fs.exists(aside)) {
      if (!fs.exists(root)) {
        if (!fs.rename(aside, root))
          throw new java.io.IOException(s"compact: cannot roll back $aside")
      } else fs.delete(aside, true)
    }
    val entries = fs.listStatus(root)
    val dataFiles = entries
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    // A directory-partitioned table (day=… subdirs) has no top-level data
    // files: compacting it here would funnel everything into ONE
    // unpartitioned file and silently destroy the pruning layout. Refuse;
    // compact each partition directory instead.
    if (dataFiles.isEmpty && entries.exists(s =>
        s.isDirectory && s.getPath.getName.contains("=")))
      throw new IllegalArgumentException(
        s"compact: $path is directory-partitioned — compact each " +
          "partition dir (path/key=value) individually")
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path)
    val shaped =
      if (sortKeys.nonEmpty)
        df.repartitionByRange(nOut, sortKeys.map(col): _*)
          .sortWithinPartitions(sortKeys.map(col): _*)
      else df.repartition(nOut)
    val staging = new Path(root.getParent, s".compact-${root.getName}")
    fs.delete(staging, true)
    shaped.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // stage → aside → commit: every rename checked; a crash leaves a
    // whole table at either generation (an orphaned aside is rolled back
    // by the recovery block at the top of the next compact)
    if (!fs.rename(root, aside))
      throw new java.io.IOException(s"compact: cannot set aside $root")
    if (!fs.rename(staging, root)) {
      if (!fs.rename(aside, root))
        throw new java.io.IOException(
          s"compact: commit failed AND rollback of $aside failed — " +
            "restore the table manually before reading it")
      throw new java.io.IOException(s"compact: cannot commit $staging")
    }
    fs.delete(aside, true)
    nOut
  }
}
