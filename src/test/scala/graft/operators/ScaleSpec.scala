package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ScaleSpec extends SparkSpec {

  test("co-bucketed tables join without a shuffle") {
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Scale.writeBucketed(Tables.orders(spark, sfDir), "b_orders", "o_orderkey", 8)
    Scale.writeBucketed(
      Tables.lineitem(spark, sfDir).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8)
    // Force the non-broadcast path: at bench scale the planner would rather
    // broadcast these tiny tables; at 100 TB both sides are fact-sized and
    // the bucketed sort-merge join is exactly what we need to see.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected bucketed SMJ:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, sfDir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation matches the direct aggregation") {
    val e = Tables.events(spark, sfDir)
    val direct = e.groupBy("event_type")
      .agg(sum("value").as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Scale.saltedSumCount(e, "event_type", "value", 8)
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("total"), r.getAs[Long]("n"))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (total, n)) =>
      assert(n === direct(k)._2)
      assert(math.abs(total - direct(k)._1) < 1e-6)
    }
  }

  test("salted join matches the plain join") {
    val e = Tables.events(spark, sfDir).select("event_id", "event_type", "value")
    val dim = Tables.events(spark, sfDir).select("event_type").distinct()
      .withColumn("weight", length(col("event_type")))
    val plain = e.join(dim, "event_type").agg(sum(col("value") * col("weight"))).collect()(0).getDouble(0)
    val salted = Scale.saltedJoin(e, dim, "event_type", 4)
      .agg(sum(col("value") * col("weight"))).collect()(0).getDouble(0)
    assert(math.abs(plain - salted) < 1e-6)
  }

  test("AQE splits a skewed join at runtime; manual salt remains the aggregation-skew tool") {
    import spark.implicits._
    // Deliberate skew: one hot key carries ~200k rows, 50 cold keys ~100
    // each — the 100 TB shape where one user/topic dominates the stream.
    val skewed = spark.range(200000)
      .select(lit(0L).as("k"), (col("id") % 1000).cast("double").as("v"))
      .union(spark.range(5000)
        .select((col("id") % 50 + 1).as("k"), col("id").cast("double").as("v")))
    val dim = spark.range(51).select(col("id").as("k"),
      concat(lit("n"), col("id")).as("name"))
    val confs = Seq(
      // force the shuffle join (broadcast would hide the skew entirely —
      // at scale the dim may be broadcast, and then skew is moot)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink AQE's size thresholds so this test-sized hot partition
      // counts as skewed (defaults target 256 MB partitions)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = skewed.join(dim, "k")
      // execute THIS frame's own query execution (count() would build a
      // separate one and leave this plan un-adapted)
      val n = joined.collect().length
      assert(n === 205000)
      val plan = joined.queryExecution.executedPlan.toString
      // the hot key's partition must be SPLIT by the runtime rule — the
      // cluster-side answer to join skew, no salting code needed
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed SMJ (expected skew=true):\n$plan")
      // and the manual replication join computes the same rows when AQE
      // isn't available (legacy clusters, or joins AQE can't split)
      val salted = Scale.saltedJoin(skewed, dim, "k", 8)
      assert(salted.count() === n)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }

    // Where the manual salt STILL wins: aggregation skew. AQE's skew rule
    // only rewrites joins — a groupBy's hot key cannot be split at
    // runtime because the final aggregate needs the whole group on one
    // reducer. For ALGEBRAIC aggs Spark's map-side partial aggregation
    // already absorbs most of it (assert: a partial HashAggregate sits
    // below the exchange), and saltedSumCount is the explicit two-phase
    // form — exact, and the tool of choice when partial agg is
    // ineffective (e.g. exact-distinct state or extreme single-key skew
    // concentrated in few input partitions).
    val plainAgg = skewed.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
    val aggPlan = plainAgg.queryExecution.executedPlan.toString
    assert(aggPlan.split("Exchange").head.contains("HashAggregate"),
      s"expected a map-side partial aggregate below the exchange:\n$aggPlan")
    val direct = plainAgg.collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Scale.saltedSumCount(skewed, "k", "v", 8)
      .collect().map(r => r.getLong(0) -> (r.getAs[Double]("total"), r.getAs[Long]("n"))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (t, n)) =>
      assert(n === direct(k)._2 && math.abs(t - direct(k)._1) < 1e-6)
    }
  }

  test("bucketed range join is row-identical to the naive range join and hash-planned") {
    val e = Tables.events(spark, sfDir).select("event_id", "event_type", "value")
    val ranges = spark.createDataFrame(Seq(
      ("click", 0.0, 40.0, "low"), ("click", 40.0, 500.0, "high"),
      ("view", 0.0, 25.0, "low"), ("view", 25.0, 120.5, "mid"),
      ("view", 120.5, 500.0, "high"), ("purchase", 10.0, 300.0, "only")))
      .toDF("event_type", "lo", "hi", "band")
    val naive = e.join(ranges,
        e("event_type") === ranges("event_type") &&
          col("value") >= col("lo") && col("value") < col("hi"))
      .select(col("event_id"), col("band"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bucketed = Scale.rangeJoinBucketed(e, "value", ranges, "lo", "hi",
        width = 50.0, keys = Seq("event_type"))
      .select(col("event_id"), col("band"))
    val got = bucketed.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === naive, "bucketed range join diverged from naive semantics")
    // and the point of the rewrite: a hash join, not a nested loop
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bucketed range join still plans a nested loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash-family join:\n$plan")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // At 100 TB the common killer join is fact-fact with a selective dim
    // filter: the probe side shuffles EVERYTHING, then the join drops
    // ~90% of it. Spark's runtime bloom-filter injection builds a bloom
    // filter from the filtered build side and pushes it into the probe
    // side's scan, so the shuffle carries only likely-matching rows. The
    // size thresholds that gate injection (10 GB application side in
    // production) are floored here to prove the capability at test SF.
    import org.apache.spark.sql.functions.col
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.Tables.lineitem(spark, sfDir)
      val o = graft.Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val n = j.count()
      assert(n > 0)
      val plan = j.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloom"),
        s"no runtime bloom filter injected into the probe side:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("key-range skip: driver-side file pruning, row-identical, build-once") {
    // hermetic index root: the shared default persists committed layouts
    // across JVMs, which would make build-once unobservable here
    spark.conf.set("spark.graft.index.dir",
      java.nio.file.Files.createTempDirectory("graft-skip-idx").toString)
    try {
    val before = Scale.skipLayoutBuilds.get
    val skipped = Scale.ordersKeyRangeSkip(spark, sfDir)
    val rows = skipped.collect().map(_.toSeq).toSet
    assert(Scale.skipLayoutBuilds.get === before + 1,
      "first serve must build the layout + zone map once")

    // plan-level evidence: the scan OPENS a proper subset of the layout's
    // files (the zone map pruned on the driver before planning)
    val layoutFiles = skipped.inputFiles.length
    val fullLayout = Scale.ordersKeyRangeSkip(spark, sfDir) // cached layout
    assert(Scale.skipLayoutBuilds.get === before + 1,
      "second serve must LOAD the committed layout, not rebuild")
    // count total files in the layout dir via the stats manifest's rows
    val layoutDir = fullLayout.inputFiles.head
      .replaceAll("/[^/]+\\.parquet$", "")
    val total = spark.read.parquet(s"$layoutDir/_stats").count()
    assert(layoutFiles < total,
      s"expected pruning: opened $layoutFiles of $total files")

    // row-identical to the full-scan predicate over the ORIGINAL table
    val full = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") >= 1 && col("o_orderkey") <= 512)
      .groupBy(col("o_orderstatus"))
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"),
        (org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.round(col("o_totalprice") * 100)
            .cast("long")).cast("double") / 100.0).as("total_price"))
      .collect().map(_.toSeq).toSet
    assert(rows === full, "pruned read must equal the full scan")
    assert(rows.nonEmpty)
    } finally spark.conf.unset("spark.graft.index.dir")
  }
}
