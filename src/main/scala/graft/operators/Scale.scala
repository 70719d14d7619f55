package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques that don't fit a single query: bucketed co-located
  * joins (pay the shuffle once at write time, join shuffle-free forever)
  * and salted joins for skewed keys (when AQE's runtime skew split isn't
  * available or the skew is in a broadcast-averse aggregation).
  */
object Scale {

  /** Write both sides bucketed by the join key into the session warehouse.
    * Subsequent equi-joins on `key` between the two tables plan with NO
    * Exchange on either side — at 100 TB this converts every repeated
    * fact-fact join from a full shuffle into a local zip of buckets.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Shuffle-free join of two co-bucketed tables. */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Salted aggregation for skewed group keys: explode each key into
    * `salt` sub-keys, partially aggregate, then merge — two small shuffles
    * with bounded partition size instead of one shuffle with a hot key.
    * `aggs` must be algebraic (sum/count/min/max) for the two-phase
    * composition to be exact.
    */
  def saltedSumCount(
      df: DataFrame, key: String, valueCol: String, salt: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(salt)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("total"), sum(col("__pcnt")).as("n"))
  }

  /** Salted broadcast-side replication join: the (small) right side is
    * replicated `salt` times so a skewed left key spreads over `salt`
    * partitions. Exact for equi-joins.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val replicated = small.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Range join via integer bucketing. A naive `v >= lo AND v < hi` join
    * has no equi-key, so Spark plans a nested-loop — O(|big| · |ranges|)
    * comparisons even when broadcast. This rewrites it as a hash join:
    * every range row is exploded to the fixed-width integer buckets
    * [floor(lo/w), floor(hi/w)] it overlaps, the big side computes its
    * single bucket, and the exact range predicate runs as a residual on
    * the (bucket-matched) pairs only. Cost drops to O(|big| + |ranges| ·
    * spans + |candidate pairs|). `keys` are extra equi-columns (joined
    * alongside the bucket); `broadcastRanges = false` switches to a
    * shuffle hash join on (keys, bucket) for range tables too big to
    * broadcast — the 100 TB interval-join path. Pick `width` near the
    * median range span: too small replicates ranges, too wide inflates
    * candidate pairs.
    */
  def rangeJoinBucketed(
      big: DataFrame, valueCol: String, ranges: DataFrame, loCol: String,
      hiCol: String, width: Double, keys: Seq[String] = Nil,
      broadcastRanges: Boolean = true): DataFrame = {
    val exploded = ranges.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / width).cast("long"),
        floor(col(hiCol) / width).cast("long"))))
    val rangeSide = if (broadcastRanges) broadcast(exploded) else exploded
    big.withColumn("__bucket", floor(col(valueCol) / width).cast("long"))
      .join(rangeSide, keys :+ "__bucket")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }

  /** How many sorted-layout builds ran in this JVM (spec hook: serving
    * twice must build once — the bench must measure the SERVE, not the
    * build).
    */
  private[graft] val skipLayoutBuilds =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** The skipping layout + zone map for `orders`, built once per data
    * snapshot (offline index build, online serve — the [[graft.functions
    * .IvfPqIndex]] discipline applied to the file-level stats index): a
    * multi-file `TableMaintenance.writeSorted` layout keyed on
    * `o_orderkey` plus the `_stats` manifest, committed under a
    * fingerprint file that folds in the SOURCE snapshot id — an in-place
    * rewrite of orders.parquet rebuilds instead of serving stale files.
    */
  private def ordersSkipLayout(spark: SparkSession, dir: String): String = {
    val src = s"$dir/orders.parquet"
    val snap = graft.functions.IvfPqIndex.snapshotId(spark, src)
    val files = 32
    val fp = s"fmt=1;src=$dir;$snap;files=$files;key=o_orderkey"
    val layout = graft.functions.IvfPqIndex.indexRoot(spark) +
      s"/skip_orders_${graft.functions.IvfPqIndex.pathKey(dir)}"
    val built = graft.functions.LayoutCache.serve(spark, layout, fp) {
      staging =>
        graft.sinks.TableMaintenance.writeSorted(
          graft.Tables.orders(spark, dir), staging.toString, files,
          Seq("o_orderkey"))
        graft.sinks.TableMaintenance.writeStatsIndex(
          spark, staging.toString, Seq("o_orderkey"))
    }
    if (built) skipLayoutBuilds.incrementAndGet()
    layout
  }

  /** Key-range order stats served through DRIVER-SIDE FILE PRUNING — the
    * registered proof that the `writeSorted` + `writeStatsIndex` +
    * `readSkipping` path ([[graft.sinks.TableMaintenance]]) returns
    * full-scan answers while opening only the files whose zone-map
    * [min,max] overlaps the range. The oracle runs the same predicate as
    * a FULL SCAN over the original single-file table, so the correctness
    * gate itself pins prune ≡ scan; the plan-level evidence (a proper
    * subset of files in `inputFiles`) is pinned in ScaleSpec. The fixed
    * key range sits in the first ScaleUp copy's key space, so at sf10
    * the scan opens ~1/32nd of the layout while the answer stays
    * row-identical to the 60M-row full scan — the Delta/Iceberg
    * manifest-stats read path, demonstrated end-to-end.
    */
  def ordersKeyRangeSkip(spark: SparkSession, dir: String): DataFrame = {
    val layout = ordersSkipLayout(spark, dir)
    graft.sinks.TableMaintenance.readSkipping(spark, layout,
        Seq(graft.sinks.TableMaintenance.KeyRange("o_orderkey", 1.0, 512.0)))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        // exact integer cents (the revenueUnits discipline): double sums
        // are fold-order-dependent, integer cents exact at any SF
        (sum(round(col("o_totalprice") * 100).cast("long")).cast("double")
          / lit(100.0)).as("total_price"))
      .orderBy("o_orderstatus")
  }

  val ordersKeyRangeSkipOracle: String =
    """SELECT o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) / 100.0
           AS total_price
       FROM orders WHERE o_orderkey BETWEEN 1 AND 512
       GROUP BY 1 ORDER BY 1"""
}
