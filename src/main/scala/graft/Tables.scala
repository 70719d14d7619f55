package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Parquet table loaders for the driver-generated testdata layout
  * (`TESTDATA.md`). Parquet embeds the schema, so no inference cost; column
  * pruning and filter pushdown happen at the scan via Catalyst.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` normalization — the one place engine-version parquet
    * timestamp drift is absorbed, so every operator downstream sees a
    * plain session-TZ `TimestampType` column.
    *
    * Driver testdata history: earlier rounds shipped parquet
    * TIMESTAMP(NANOS), which Spark 4 only reads via the
    * `nanosAsLong` legacy conf (LongType branch below). The current
    * testdata is TIMESTAMP(MICROS) with `isAdjustedToUTC=false`, which
    * Spark 4.1's default `parquet.inferTimestampNTZ` reads as
    * **TIMESTAMP_NTZ** — a type that rejects `CAST(ts AS BIGINT)` and
    * surfaces as `LocalDateTime`, silently breaking epoch-seconds math
    * and `getAs[java.sql.Timestamp]`. All three shapes funnel to the
    * same column here: sessions pin `spark.sql.session.timeZone=UTC`,
    * so `NTZ → TimestampType` is a pure re-tag of the same wall-clock
    * instant (no shift), and nano→micro truncation is harmless (all
    * downstream logic compares at second granularity or orders by
    * `event_id`, which is assigned in timestamp order).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame   = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame  = table(s, d, "embeddings")

  /** Table row count, memoized per (application, dir, table). The
    * adaptive operator switches ([[graft.operators.Dedup.ngramJaccard]],
    * `embeddingCosBlocked`) read this per invocation; the first call is
    * a parquet-footer metadata job on the RAW scan (no data columns, no
    * fanout shuffle), repeats are a map hit — a table dir is immutable
    * for the life of an application.
    */
  def tableCount(s: SparkSession, d: String, name: String): Long =
    countCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}#$d#$name",
      _ => java.lang.Long.valueOf(table(s, d, name).count())).longValue()
  def documentCount(s: SparkSession, d: String): Long = tableCount(s, d, "documents")
  def embeddingCount(s: SparkSession, d: String): Long = tableCount(s, d, "embeddings")
  /** events row count — through [[events]] (which owns the ts-layout
    * confs), not the raw table loader. */
  def eventCount(s: SparkSession, d: String): Long =
    countCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}#$d#events",
      _ => java.lang.Long.valueOf(events(s, d).count())).longValue()
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Spread a scan across all cores before CPU-heavy per-row work.
    *
    * Small local parquet files are one row group = one task, which would
    * serialize shingling/hashing/cosine math onto a single core. On a real
    * cluster the scan has thousands of splits and this is a no-op (the
    * round-robin only fires when the scan yields fewer partitions than
    * cores); the shuffle it introduces moves raw rows once, before the
    * expensive projection, which is the right trade whenever
    * compute-per-row ≫ row width.
    */
  def fanout(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Partition count comes from FileIndex metadata (already listed at read
    // time) — `df.rdd.getNumPartitions` would force full physical planning
    // per invocation.
    val scanParts = org.apache.spark.sql.GraftBridge.estimateScanPartitions(df)
    if (scanParts.exists(_ < target)) df.repartition(target) else df
  }

  /** Scale-safe plan-reuse barrier.
    *
    * Operators that feed one frame into several plan branches (self-joins,
    * probe/verify splits, iterative propagation) must materialize it once
    * or every branch re-runs the upstream computation. HOW it is
    * materialized decides what happens when an executor dies:
    *
    *  - `persist(MEMORY_AND_DISK)` keeps lineage: a lost block is
    *    recomputed from source. The default on a cluster, where losing one
    *    of 1000 executors mid-query is routine — a recompute beats a dead
    *    query.
    *  - reliable `checkpoint()` writes blocks to the fault-tolerant store
    *    named by `spark.sql.graft.checkpointDir` and truncates lineage —
    *    the right barrier for iterative loops whose plans would otherwise
    *    grow per round, and for frames too expensive to ever recompute.
    *  - `localCheckpoint()` truncates lineage AND keeps non-replicated
    *    executor-local blocks: fastest, but a lost executor makes the
    *    frame unrecoverable (Spark cannot rebuild truncated lineage). Auto
    *    mode only picks it where there is no executor to lose — a
    *    single-JVM `local[*]` master.
    *
    * `spark.sql.graft.barrier` ∈ {auto (default), persist, checkpoint,
    * localCheckpoint} overrides the automatic choice. The persist path is
    * lazy (first action materializes); the checkpoint paths are eager —
    * both give downstream branches a compute-once frame.
    */
  def barrier[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val sc = spark.sparkContext
    def reliable(): Dataset[T] = {
      val dir = spark.conf.getOption("spark.sql.graft.checkpointDir").getOrElse(
        throw new IllegalArgumentException(
          "spark.sql.graft.barrier=checkpoint requires spark.sql.graft.checkpointDir"))
      // setCheckpointDir stores `<dir>/<random-uuid>` (qualified), so an
      // equality check against `dir` is always false and every barrier
      // would mint a fresh checkpoint subdirectory. Substring-match the
      // configured path instead — one checkpoint dir per session.
      // (Checkpoint FILES are reclaimed by Spark's ContextCleaner only
      // under spark.cleaner.referenceTracking.cleanCheckpoints=true; set
      // it on clusters that run iterative barriered operators.)
      val needle = new org.apache.hadoop.fs.Path(dir).toUri.getPath
      if (!sc.getCheckpointDir.exists(_.contains(needle)))
        sc.setCheckpointDir(dir)
      ds.checkpoint()
    }
    spark.conf.get("spark.sql.graft.barrier", "auto") match {
      case "persist"         => ds.persist(StorageLevel.MEMORY_AND_DISK)
      case "checkpoint"      => reliable()
      case "localCheckpoint" => ds.localCheckpoint()
      case _ =>
        if (spark.conf.getOption("spark.sql.graft.checkpointDir").isDefined) reliable()
        else if (sc.isLocal) ds.localCheckpoint()
        else ds.persist(StorageLevel.MEMORY_AND_DISK)
    }
  }

  /** `.barrier()` as a chainable method — see [[Tables.barrier]]. */
  implicit class BarrierOps[T](private val ds: Dataset[T]) extends AnyVal {
    def barrier(): Dataset[T] = Tables.barrier(ds)
  }

  /** Release every persisted block the last query left behind.
    *
    * Operators materialize plan-reuse barriers with [[barrier]] (persisted
    * or checkpointed blocks); the blocks belong to the
    * returned plan, so the OPERATOR can't release them — the caller must,
    * once the result is consumed. A long-lived session running many
    * queries without this (a bench loop, a query service) accumulates
    * dead blocks until the block manager evicts under pressure — which
    * taxes every later query's shuffles and caches. Bench and Verify call
    * it between queries.
    *
    * SCOPE: this sweeps EVERY persistent RDD in the context — including
    * caches the application created and checkpointed frames still held
    * in scope (whose lineage is truncated, so a later action on them
    * fails rather than recomputes). It is intended for drivers that own
    * the whole session and consume each result fully before the next
    * query (the Bench/Verify pattern). An application holding its own
    * caches or unfinished graft results must release per-frame
    * (`df.unpersist()`) instead of calling this.
    */
  def releaseIntermediates(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = false))
  }
}
