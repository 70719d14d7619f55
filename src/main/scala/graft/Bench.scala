package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. A full warmup pass runs first so measurements see
  * steady-state (codegen compiled, parquet footers cached) rather than JVM
  * startup — the number the driver compares against BASELINE should be the
  * throughput a long-running cluster would see.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional args = subset of query names (local iteration aid).
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    // Query-boundary reclamation, OUTSIDE the clock: Spark frees shuffle
    // files and broadcast blocks only when the driver GCs their handles
    // (ContextCleaner is reference-triggered), and a large mostly-idle
    // heap may not GC for the whole suite — so a long chunk accumulates
    // hundreds of dead shuffles in the one local JVM and late queries
    // run against that pressure, not their own cost (measured at sf10:
    // samp_weighted 7.2 s late in a 40-query chunk vs 1.34 s standalone,
    // same build/substrate). An explicit GC at each query boundary makes
    // every query start from a reclaimed state; each still pays its own
    // materialization inside the clock.
    // SPARK_GRAFT_BENCH_GC=0 disables the explicit GC — an A/B isolation
    // aid for timing investigations (used to exonerate the GC when a
    // repeated-execution slowdown was traced to a localCheckpoint barrier).
    def reclaim(): Unit = {
      Tables.releaseIntermediates(spark)
      if (sys.env.get("SPARK_GRAFT_BENCH_GC").forall(_ == "1")) System.gc()
    }
    // Warmup: one untimed pass over every query.
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      reclaim()
    }
    // Three timed runs per query. `queries` carries the MIN (steady-state
    // throughput, robust to one-off GC/scheduler noise — the number to
    // compare against a baseline), and `spread` carries min/median/max so
    // published claims reflect run-to-run variance instead of the best
    // observed number. Checkpoint blocks are released AFTER the clock
    // stops — each query still pays its own materialization cost, but
    // queries don't tax each other through block-manager pressure.
    // SPARK_GRAFT_BENCH_RUNS overrides for very large SFs where a single
    // run is minutes and min-of-3 would burn the measurement budget; the
    // emitted JSON records whatever was used.
    val timedRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    // A failed run must NOT become a timing sample: elapsed-to-exception
    // would publish a broken query as the suite's fastest. Failures are
    // reported by name in `failed` and excluded from every statistic.
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      Tables.releaseIntermediates(spark)
      if (ok) Some(dt) else None
    }
    val all = selected.map { case (name, fn) =>
      val ts = Seq.fill(timedRuns)(timeOnce(fn))
      reclaim()
      name -> ts
    }
    val failed = all.collect { case (n, ts) if ts.exists(_.isEmpty) => n }.toSeq.sorted
    val samples = all.collect { case (n, ts) if ts.forall(_.isDefined) =>
      n -> ts.flatten.sorted
    }
    val results = samples.map { case (name, ts) => name -> ts.head }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = samples.map { case (k, ts) =>
      "\"" + k + "\":{\"min\":" + ts.head + ",\"med\":" + ts(ts.size / 2) +
        ",\"max\":" + ts.last + "}"
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val totalMax = if (samples.nonEmpty) samples.values.map(_.last).sum else 0.0
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$timedRuns,"total_max":$totalMax,"failed":$failedJson,"queries":$qs,"spread":$spread,"sf":"$sfDir"}"""
    println(fullLine)
    // The full line above is ~10-15 KB for the whole suite, and a harness
    // that keeps only a bounded stdout tail cannot parse it (observed:
    // every round's captured bench ends mid-line). Persist the full
    // per-query JSON to a file for diffing, and END stdout with a compact
    // line (same metric/value/unit/sf contract, well under 2 KB) so a
    // tail-bounded consumer always has one complete parseable JSON line.
    val benchFile = new java.io.File("bench_full.json")
    val w = new java.io.PrintWriter(benchFile, "UTF-8")
    try w.println(fullLine) finally w.close()
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$timedRuns,"total_max":$totalMax,"failed":$failedJson,"n_queries":${results.size},"queries_file":"${benchFile.getAbsolutePath}","sf":"$sfDir"}""")
    spark.stop()
  }
}
