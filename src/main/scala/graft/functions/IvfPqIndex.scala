package graft.functions

import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted IVF-PQ inverted file: one row per corpus vector —
  * `(cell, cand_id, codes)` — written `partitionBy("cell")` next to the
  * data, exactly the FAISS IVFADC on-disk layout (Jégou et al., TPAMI
  * 2011, §IV) re-expressed as a partitioned parquet table.
  *
  * Why partitioned-by-cell matters at 100 TB: a query probes `nprobe` of
  * `nCells` cells, and those cells are known at PLAN time (the bounded
  * query set's probe lists are computed on the driver). A `cell IN (…)`
  * filter over a cell-partitioned table becomes a PartitionFilter —
  * Spark lists only the probed `cell=N` directories, so the serving scan
  * reads `(nprobe/nCells) × N × 16 B` of codes and never touches the
  * rest of the index, let alone the raw vectors.
  *
  * Same offline-build / online-serve contract as [[IvfIndex.loadOrBuild]]:
  * a committed index carries its training fingerprint in-file; a fingerprint
  * mismatch (different quantizer params, different corpus snapshot) or an
  * uncommitted half-written dir triggers a rebuild, never a silent stale
  * answer.
  */
object IvfPqIndex {

  /** How many times a corpus encode ran in this JVM (spec hook: serving
    * twice must build once).
    */
  private[graft] val builds = new AtomicInteger(0)

  /** Load the committed inverted file if its fingerprint matches, else
    * encode the corpus (cell assignment + PQ codes, one pass over the
    * vectors) and persist it partitioned by cell. BOTH paths return a frame
    * read from the persisted parquet, so a downstream `cell IN (…)` prunes
    * partition directories — serving never scans an in-memory lineage that
    * would re-encode per query.
    */
  def loadOrBuild(corpus: DataFrame, embCol: String, idCol: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      indexPath: String, fingerprint: String): DataFrame = {
    val spark = corpus.sparkSession
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = fs.exists(p) && fs.exists(new Path(p, "_SUCCESS"))
    // one listing serves both the fingerprint check and the returned
    // frame — spark.read.parquet on a partitioned dir re-lists every
    // file, so paying it twice per probe doubles the serving overhead
    val existing = if (committed) Some(spark.read.parquet(indexPath)) else None
    val ok = existing.exists(df => savedFingerprint(df).contains(fingerprint))
    if (!ok) {
      builds.incrementAndGet()
      corpus.select(
          element_at(NearestCells(col(embCol), cents, 1), 1).as("cell"),
          col(idCol).as("cand_id"),
          PqEncode(col(embCol), books).as("codes"),
          lit(fingerprint).as("train_params"))
        // cluster by cell before the write: without this every shuffle
        // task writes its own sliver into every cell dir (nCells × tasks
        // KB-sized files — 875 observed at sf0.1), and each probe then
        // schedules a task per sliver. One task per cell → one file per
        // cell; a cell outgrowing a target file size is what
        // TableMaintenance.compactPartitioned splits, not the builder.
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(indexPath)
    }
    (if (ok) existing.get else spark.read.parquet(indexPath))
      .select("cell", "cand_id", "codes")
  }

  /** Append a new vector batch to a COMMITTED inverted file using the
    * index's FROZEN quantizers — the daily-drop maintenance shape at
    * 100 TB: encode cost is O(batch) (one pass assigning cells + PQ
    * codes), the committed corpus' codes are untouched, and the new rows
    * land in the same `cell=N` partition directories, so serving plans
    * (probe-list PartitionFilters) are unchanged. This is the ANN analog
    * of `dd_incremental`: never re-touch the corpus to absorb a batch.
    *
    * The caller passes the quantizers it holds plus their fingerprint; a
    * mismatch against the committed index FAILS rather than retrains —
    * codes from a different codebook would silently corrupt ADC
    * distances for every future probe, and the retrain decision belongs
    * to the owner of the full corpus, not an incremental writer. Because
    * encoding is per-row deterministic under a frozen quantizer,
    * build(half) + append(half) ≡ build(full) — SimilaritySpec pins that
    * equality. Runs under the table's single-writer maintenance
    * contract, like compaction.
    */
  def append(batch: DataFrame, embCol: String, idCol: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      indexPath: String, fingerprint: String): DataFrame = {
    val spark = batch.sparkSession
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p) && fs.exists(new Path(p, "_SUCCESS")),
      s"no committed index at $indexPath to append to — build first")
    val saved = savedFingerprint(spark.read.parquet(indexPath))
    require(saved.contains(fingerprint),
      s"committed index fingerprint ${saved.orNull} does not match the " +
        s"batch quantizers ($fingerprint) — appending would corrupt ADC " +
        "scores; retrain the full corpus instead")
    batch.select(
        element_at(NearestCells(col(embCol), cents, 1), 1).as("cell"),
        col(idCol).as("cand_id"),
        PqEncode(col(embCol), books).as("codes"),
        lit(fingerprint).as("train_params"))
      // one file per cell per appended batch (see loadOrBuild); nightly
      // compaction absorbs batches when dirs accumulate
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(indexPath)
    spark.read.parquet(indexPath).select("cell", "cand_id", "codes")
  }

  private def savedFingerprint(df: DataFrame): Option[String] = {
    if (!df.columns.contains("train_params")) None
    else df.select("train_params").limit(1).collect()
      .headOption.flatMap(r => Option(r.getString(0)))
  }

  /** Cheap corpus snapshot identity for index fingerprints: total bytes
    * and newest modification time across the table's file(s) — O(driver
    * listing), no data scan, the same identity a lake snapshot pins. An
    * index fingerprinted with this can never silently serve codes built
    * from a table that was since overwritten in place: the quantizers
    * retrain on the new data while a path-only fingerprint would still
    * match the stale persisted codes — ADC scores computed with new LUTs
    * against old codes, the corruption `append`'s guard exists for.
    */
  def snapshotId(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val files = if (st.isDirectory) fs.listStatus(p).filter(_.isFile) else Array(st)
    val bytes = files.map(_.getLen).sum
    val mtime = if (files.isEmpty) 0L else files.map(_.getModificationTime).max
    s"bytes=$bytes;mtime=$mtime"
  }

  /** Collision-proof cache-dir key for a source path: hex MD5 of the
    * path string. `String.hashCode` (the previous key) is 32-bit — two
    * dataset dirs colliding would alternate fingerprint mismatches and
    * rebuild their shared layout on every query (correct but thrashing).
    */
  def pathKey(path: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)

  /** Where a corpus directory's serving indexes live. Defaults to a
    * PER-PROCESS temp root, torn down on JVM exit (the sandbox cannot
    * write next to the read-only testdata): derived layouts — skip/split
    * layouts, ANN inverted files, staged fixtures — are build-once
    * serve-many only WITHIN one process, so a fresh bench or verify
    * invocation always derives everything it serves from the parquet
    * inputs rather than inheriting a previous process's work. A
    * deployment sets `spark.graft.index.dir` to a path beside the data
    * (hdfs://…, s3a://…) so the index shares the data's filesystem and
    * lifecycle and IS reused across jobs — the cross-process reuse is a
    * deliberate deployment opt-in, never the measurement default.
    */
  def indexRoot(spark: SparkSession): String =
    spark.conf.get("spark.graft.index.dir", jvmRoot)

  private lazy val jvmRoot: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_index_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        val s = java.nio.file.Files.walk(dir)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally s.close()
      } catch { case _: Throwable => () }
    }))
    dir.toString
  }
}
