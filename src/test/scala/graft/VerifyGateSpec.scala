package graft

import org.apache.spark.sql.functions._

/** The correctness gate must be un-droppable: a query whose DataFrame
  * construction throws has to surface as a LOUD error row, never as a
  * silently absent one (round 5 lost `ev_sessionize` exactly this way —
  * an AnalysisException at plan-build time meant no output dir was ever
  * written, and the gate diff had nothing to flag).
  */
class VerifyGateSpec extends SparkSpec {

  test("a construction-time failure still writes an error-marker output") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify_gate").toString
    val err = Verify.dumpOne(spark, "boom",
      (_, _) => throw new RuntimeException("deliberate construction failure"),
      sfDir, out)
    assert(err.exists(_.contains("deliberate construction failure")))
    val marker = spark.read.parquet(s"$out/boom").collect()
    assert(marker.length === 1)
    assert(marker(0).getAs[String]("__graft_error") === "construction_or_execution_failed")
    assert(marker(0).getAs[String]("detail").contains("deliberate construction failure"))
  }

  test("a healthy query writes its real result, no marker") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify_gate").toString
    val err = Verify.dumpOne(spark, "ok",
      (s, _) => { import s.implicits._; Seq((1L, "a")).toDF("k", "v") },
      sfDir, out)
    assert(err.isEmpty)
    val rows = spark.read.parquet(s"$out/ok")
    assert(rows.columns.toSeq === Seq("k", "v"))
    assert(rows.count() === 1)
  }

  /** The queries that INTENTIONALLY have no portable SQL oracle (approx
    * sketches, ANN recall paths, multimodal stubs, streaming state ops
    * pinned by spec instead). Adding a query without an oracle entry
    * silently downgrades it to a rows-only check — this pin makes that
    * an explicit decision: either add the oracle or add the name here.
    */
  private val rowsOnlyByDesign = Set(
    "dd_embedding_blocked", "dd_minhash_lsh", "dd_simhash",
    "ev_cms_user_counts", "ev_hll_rollup", "ev_hll_users",
    "ev_quantiles_approx",
    "mm_audio_energy", "mm_frame_sample", "mm_media_stats", "mm_resize",
    "pipe_clean_corpus", "pipe_training_set",
    "sim_ivf_topk", "sim_ivfpq_topk", "sim_lsh_topk", "sim_pq_topk",
    "stream_ema_scores")

  test("every oracle has a registered query, and every query constructs") {
    val queries = SparkEntry.queries
    val oracles = SparkEntry.oracleSql
    val orphanOracles = oracles.keySet -- queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracleSql entries without a queries entry: $orphanOracles")
    val rowsOnly = queries.keySet -- oracles.keySet
    assert(rowsOnly === rowsOnlyByDesign,
      "rows-only set drifted — unexpectedly oracle-less: " +
        (rowsOnly -- rowsOnlyByDesign).mkString(", ") +
        "; no longer oracle-less: " +
        (rowsOnlyByDesign -- rowsOnly).mkString(", "))
    // Construction (plan build) must not throw for ANY registered query —
    // this is the cheap session-local version of the full verify sweep and
    // catches engine-version AnalysisExceptions before the driver does.
    val broken = queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(broken.isEmpty, s"queries failing at construction: ${broken.mkString("; ")}")
  }
}
