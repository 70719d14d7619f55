package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp. Read nanos as long (legacy conf) and rebuild a
    * microsecond TimestampType column — the truncation is harmless (all
    * downstream logic compares at second granularity or uses `event_id`,
    * which is assigned in timestamp order).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame   = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame  = table(s, d, "embeddings")

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

  /** Release every persisted block the last query left behind.
    *
    * Operators materialize plan-reuse barriers with `localCheckpoint()`
    * (eager, persisted at MEMORY_AND_DISK); the blocks belong to the
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
