package graft.indexer

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.indexer.{Upsert => U}
import org.apache.spark.sql.functions.col

/** Dump / restore of the normalized table set — the reference's S3 backup
  * modes (process_s3.go, README "dump"/"empty"/"full") re-expressed as a
  * parquet snapshot directory: one subdirectory per table, written
  * atomically per table by Spark's committer. `restoreAndCatchUp` merges a
  * snapshot with newly ingested rows using latest-wins on the table's
  * conflict key — the "load dump then pick up from the last entry" path of
  * the reference's full mode.
  */
object Snapshot {

  def save(tables: Map[String, DataFrame], dir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    }

  def load(spark: SparkSession, dir: String, names: Seq[String]): Map[String, DataFrame] =
    names.map(n => n -> spark.read.parquet(s"$dir/$n")).toMap

  /** Union a restored table with fresh rows and resolve conflicts
    * latest-wins on `version` over `keys` — idempotent under overlapping
    * dump/live ranges (the reference restarts from the dump's last height,
    * re-processing any overlap; conflict resolution absorbs it).
    */
  def restoreAndCatchUp(
      restored: DataFrame, fresh: DataFrame,
      keys: Seq[String], version: String): DataFrame = {
    // Version ties (the overlap region re-processed after a restore) go to
    // the FRESH row — ON CONFLICT DO UPDATE semantics, deterministic.
    import org.apache.spark.sql.functions.lit
    U.latestWins(
        restored.withColumn("__pref", lit(0))
          .unionByName(fresh.withColumn("__pref", lit(1))),
        keys, col(version), col("__pref"))
      .drop("__pref")
  }

  /** Highest ingested height — the reference's getLatestBlockHeightFromDB
    * starting-point probe (main.go:205-218).
    */
  def latestHeight(blockInfo: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    blockInfo.agg(coalesce(max(col("height")), lit(0L))).collect()(0).getLong(0)
  }
}
