package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer training: k-means on a bounded, seed-fixed sample.
  *
  * The reference ANN architecture (IVF a la inverted-file indexes) trains
  * the quantizer OFFLINE on a sample and serves queries against cached
  * centroids — training never runs inside a query. The sample is capped,
  * so the driver-side Lloyd's loop is O(sampleCap × k × dim) regardless of
  * corpus size: at 100 TB the sample is still ≤ `sampleCap` rows, collected
  * by one distributed `sample` pass. Centroids are cached per (corpus
  * identity, k) so repeated queries — the serving pattern — skip training
  * entirely.
  */
object IvfIndex {

  private type CacheKey = (String, Int, Int, Int, Long, Int)

  /** Bounded access-order LRU: a long-lived session indexing many corpus
    * snapshots evicts the coldest centroids instead of growing without
    * limit (each entry is k × dim doubles — small, but unbounded × small
    * is still a leak).
    */
  private val maxCacheEntries = 64
  private val cache =
    new java.util.LinkedHashMap[CacheKey, Array[Array[Double]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[CacheKey, Array[Array[Double]]]): Boolean =
        size() > maxCacheEntries
    }

  private def cached(key: CacheKey)(train: => Array[Array[Double]]): Array[Array[Double]] = {
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit
    else {
      // trained outside the lock: concurrent first-queries may duplicate
      // work but never block each other on a multi-second training run
      val v = train
      cache.synchronized(cache.put(key, v))
      v
    }
  }

  /** Trained (or cached) centroids for `corpus` (`embCol`: array<float|double>).
    * `cacheKey` identifies the corpus SNAPSHOT (e.g. its directory path):
    * the cache is keyed on it plus every training parameter, and an index
    * over data that changes in place must be retrained via [[invalidate]]
    * — the same contract as any offline-trained ANN index (append ≠
    * retrain; serving quality degrades silently until reindex).
    */
  def centroids(corpus: DataFrame, embCol: String, k: Int,
      cacheKey: String, sampleCap: Int = 4096, iters: Int = 10,
      seed: Long = 42L, restarts: Int = 4): Array[Array[Double]] =
    cached((cacheKey, k, sampleCap, iters, seed, restarts)) {
      val ordered = deterministicSample(corpus, embCol, sampleCap, seed)
      // Several seeded restarts, keep the lowest within-cluster SSE — the
      // standard guard against a bad k-means++ draw, still deterministic.
      (0 until restarts)
        .map(r => lloyd(ordered, k, iters, seed + r))
        .minBy(sse(ordered, _))
    }

  /** Two-level (IMI) sub-quantizers: the vector's two halves each train
    * their own `kPerHalf`-cell quantizer on the SAME deterministic
    * sample, giving kPerHalf² product cells for 2·kPerHalf training
    * centroids and kPerHalf + kPerHalf assignment distance evals per
    * vector ([[graft.functions.ImiCells]]). Returns (halfA, halfB)
    * centroid sets; halfA's dim is ⌊dim/2⌋ and defines the split point.
    */
  def imiCentroids(corpus: DataFrame, embCol: String, kPerHalf: Int,
      cacheKey: String, sampleCap: Int = 4096, iters: Int = 10,
      seed: Long = 42L, restarts: Int = 4): (Array[Array[Double]], Array[Array[Double]]) = {
    // ONE distributed sample scan feeds both halves (lazy: skipped
    // entirely when both half-quantizers are already cached)
    lazy val sample = {
      val s = deterministicSample(corpus, embCol, sampleCap, seed)
      require(s.nonEmpty && s(0).length >= 2,
        "IMI needs at least 2-dimensional vectors to split")
      s
    }
    def half(tag: String, slice: Array[Double] => Array[Double]) =
      cached((cacheKey + tag, kPerHalf, sampleCap, iters, seed, restarts)) {
        val pts = sample.map(slice)
        (0 until restarts)
          .map(r => lloyd(pts, kPerHalf, iters, seed + r))
          .minBy(sse(pts, _))
      }
    val a = half("#imiA", p => p.take(p.length / 2))
    val b = half("#imiB", p => p.drop(p.length / 2))
    (a, b)
  }

  /** Content-deterministic training sample in canonical order: every row
    * draws a hash of its OWN vector (seed folded in) and the `cap`
    * smallest draws win — the min-k pattern. Unlike
    * `sample(fraction).limit(cap)`, which picks rows per-partition (so
    * trained quantizers depend on file/partition layout), the selected
    * CONTENT is a pure function of the corpus rows + seed: repartitioned,
    * compacted or re-written corpora train identical quantizers. Plans as
    * TakeOrderedAndProject — a per-partition bounded top-k plus a driver
    * merge, one scan, no count() pre-pass. Output is re-sorted by content
    * (Lloyd's is order-sensitive: seeding draws by index, FP sums
    * non-associative) so it is independent of the draw hashes too.
    */
  private[graft] def deterministicSample(corpus: DataFrame, embCol: String,
      cap: Int, seed: Long): Array[Array[Double]] = {
    val sample = corpus
      .select(col(embCol).cast("array<double>").as("e"))
      .withColumn("__draw", xxhash64(lit(seed), col("e")))
      .orderBy(col("__draw"), col("e"))
      .limit(cap)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    sample.sortWith { (a, b) =>
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n && a(i) == b(i)) i += 1
      if (i < n) a(i) < b(i) else a.length < b.length
    }
  }

  /** Plain Lloyd's k-means with k-means++ seeding — deterministic under a
    * fixed seed, milliseconds at the capped sample size.
    */
  private[graft] def lloyd(points: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "cannot train a quantizer on an empty sample")
    val dim = points(0).length
    val rnd = new java.util.Random(seed)
    val kk = math.min(k, points.length)

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }

    // k-means++ seeding.
    val centers = new Array[Array[Double]](kk)
    centers(0) = points(rnd.nextInt(points.length)).clone()
    val minD2 = points.map(p => d2(p, centers(0)))
    var c = 1
    while (c < kk) {
      val total = minD2.sum
      var pick = if (total > 0) rnd.nextDouble() * total else 0.0
      var idx = 0
      while (idx < points.length - 1 && { pick -= minD2(idx); pick > 0 }) idx += 1
      centers(c) = points(idx).clone()
      var i = 0
      while (i < points.length) {
        val d = d2(points(i), centers(c))
        if (d < minD2(i)) minD2(i) = d
        i += 1
      }
      c += 1
    }

    // Lloyd iterations.
    val assign = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < points.length) {
        var best = 0; var bestD = d2(points(i), centers(0))
        var j = 1
        while (j < kk) {
          val d = d2(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      i = 0
      while (i < points.length) {
        val a = assign(i); counts(a) += 1
        val s = sums(a); val p = points(i)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        i += 1
      }
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          var x = 0
          while (x < dim) { sums(j)(x) /= counts(j); x += 1 }
          centers(j) = sums(j)
        } // empty cell: keep the previous center
        j += 1
      }
      it += 1
    }
    centers
  }

  /** Total squared distance of every point to its nearest center. */
  private[graft] def sse(points: Array[Array[Double]], centers: Array[Array[Double]]): Double = {
    var total = 0.0
    var i = 0
    while (i < points.length) {
      val p = points(i)
      var best = Double.MaxValue
      var c = 0
      while (c < centers.length) {
        val ctr = centers(c)
        var acc = 0.0; var j = 0
        val n = math.min(p.length, ctr.length)
        while (j < n) { val d = p(j) - ctr(j); acc += d * d; j += 1 }
        if (acc < best) best = acc
        c += 1
      }
      total += best
      i += 1
    }
    total
  }

  /** Persist trained centroids as a tiny parquet table `(cell, centroid)`
    * — the offline half of the IVF contract: a 100 TB corpus trains ONCE
    * (a scheduled index build), and every serving session loads the
    * cells instead of retraining. Parquet via the session's Hadoop
    * filesystem, so the index lives next to the data on file://, hdfs://
    * or s3a://.
    */
  def save(spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Array[Array[Double]],
      params: Option[String] = None): Unit = {
    import scala.jdk.CollectionConverters._
    val rows = centroids.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i, c.toSeq, params.orNull)
    }.toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      // training fingerprint, constant per row — rides inside the same
      // parquet commit as the centroids so index and provenance can
      // never drift apart (validated by loadOrBuild)
      org.apache.spark.sql.types.StructField("train_params",
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load previously [[save]]d centroids, in cell order. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(path).orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)

  /** The training fingerprint a committed index was built with, if the
    * index carries one (indexes saved before fingerprinting don't).
    */
  private def savedParams(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[String] = {
    val df = spark.read.parquet(path)
    if (!df.columns.contains("train_params")) None
    else df.select("train_params").limit(1).collect()
      .headOption.flatMap(r => Option(r.getString(0)))
  }

  private def fingerprint(k: Int, sampleCap: Int, iters: Int, seed: Long,
      restarts: Int): String =
    s"k=$k;sampleCap=$sampleCap;iters=$iters;seed=$seed;restarts=$restarts"

  /** Serving entry: load the persisted index if present, else train from
    * the corpus and persist — so the first session after an index build
    * (or a cold cache) pays training once and every later session reads
    * k × dim doubles.
    *
    * The committed index's training fingerprint is validated against the
    * requested parameters: a caller asking for k=32 against an index
    * saved with k=8 gets a RETRAIN at the requested shape (and the index
    * is re-persisted), never a silent 8-centroid answer. An index with
    * no fingerprint (pre-fingerprint format) is treated the same way —
    * unverifiable provenance retrains rather than guesses.
    */
  def loadOrBuild(corpus: DataFrame, embCol: String, k: Int, indexPath: String,
      sampleCap: Int = 4096, iters: Int = 10, seed: Long = 42L,
      restarts: Int = 4): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // A bare exists() would treat a crashed half-written index dir as
    // committed and serve truncated centroids forever; Spark's parquet
    // commit protocol drops _SUCCESS only on a completed write.
    val committed = fs.exists(p) &&
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    val wanted = fingerprint(k, sampleCap, iters, seed, restarts)
    if (committed && savedParams(spark, indexPath).contains(wanted))
      load(spark, indexPath)
    else {
      val c = centroids(corpus, embCol, k, cacheKey = indexPath,
        sampleCap = sampleCap, iters = iters, seed = seed, restarts = restarts)
      save(spark, indexPath, c, Some(wanted))
      c
    }
  }

  /** Drop cached centroids for a corpus snapshot — call after in-place
    * data changes (appends/compaction) to force retraining.
    */
  def invalidate(cacheKey: String): Unit = cache.synchronized {
    cache.keySet().removeIf(_._1 == cacheKey)
  }

  /** Test/reset hook. */
  private[graft] def clearCache(): Unit = cache.synchronized(cache.clear())
}
