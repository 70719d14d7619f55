package graft.indexer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sinks.ParquetMergeSink

/** The reference's full-mode loop (restore → catch up → process → write,
  * main.go:120-203) assembled from this library's pieces:
  *
  *   BlockJsonSource (ranged landing files, height-pruned scan)
  *     → Ingest.blockInfo (header flatten)
  *     → ParquetMergeSink (idempotent latest-wins table)
  *
  * `runBatch` is incremental: it asks the target table for its latest
  * height (Snapshot.latestHeight = getLatestBlockHeightFromDB) and the
  * pushed `height > latest` predicate prunes already-ingested landing
  * files from the scan entirely. Re-runs are no-ops; overlapping files
  * converge via the merge key.
  */
object IndexerFlow {

  def readLanding(spark: SparkSession, landingDir: String): DataFrame =
    spark.read.format("graft.sources.BlockJsonSource").load(landingDir)

  /** One catch-up pass; returns the number of newly ingested heights. */
  def runBatch(spark: SparkSession, landingDir: String, tableDir: String): Long = {
    val already = ParquetMergeSink.readIfExists(spark, tableDir)
      .map(Snapshot.latestHeight)
      .getOrElse(0L)
    val fresh = readLanding(spark, landingDir)
      .filter(col("height") > already)
    val blockInfo = Ingest.blockInfo(fresh)
    val n = blockInfo.count()
    if (n > 0) ParquetMergeSink.merge(blockInfo, tableDir, Seq("height"), "height")
    n
  }
}
