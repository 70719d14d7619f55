package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

import graft.indexer.Upsert

/** Idempotent merge sink over parquet — the concrete form of the
  * reference's `INSERT ... ON CONFLICT DO UPDATE` target tables
  * (db.go:1171-1175) for a lake without a transactional format: read the
  * current table, union the batch, resolve latest-wins on the conflict
  * key, rewrite atomically (write to a staging dir, then swap). Suitable
  * as a `foreachBatch` target; replays and overlapping batches converge
  * to the same table. On a transactional store (Delta/Iceberg) `merge`
  * becomes a MERGE INTO with the same key/version semantics.
  */
object ParquetMergeSink {

  def merge(
      batch: DataFrame, path: String, keys: Seq[String], version: String): Unit = {
    val spark = batch.sparkSession
    val fs = new java.io.File(path)
    val current =
      if (fs.exists() && fs.listFiles() != null && fs.listFiles().nonEmpty)
        Some(spark.read.parquet(path))
      else None
    val merged = current match {
      case Some(cur) => Upsert.latestWins(cur.unionByName(batch), keys, col(version))
      case None => Upsert.latestWins(batch, keys, col(version))
    }
    val staging = path + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    // swap: the staged result becomes the table
    val target = new java.io.File(path)
    if (target.exists()) {
      import scala.reflect.io.Directory
      new Directory(target).deleteRecursively()
    }
    new java.io.File(staging).renameTo(target)
  }
}
