package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB corpus
  * actually runs, built entirely from the operators in this package —
  *
  *   quality gate  →  exact dedup  →  near-dup removal (MinHash-LSH)
  *   [cleanCorpus], then → stratified draw → sequence packing
  *   [trainingSet]
  *
  * Each stage is the scalable variant: the quality gate is a codegen'd
  * projection + filter, exact dedup shuffles on a digest, and near-dup
  * pairs come from [[Dedup.ngramJaccard]]'s ADAPTIVE candidate seam
  * (PPJoin prefix pruning below the corpus threshold, capped banded LSH
  * above it — the operator's own scale switch, strategy-logged) with
  * exact Jaccard verification, rather than any pairwise scan. Near-dup
  * pairs keep their lowest doc_id (canonical survives, the rest drop via
  * a left-anti join).
  */
object Pipeline {

  val qualityThreshold = 0.55

  def cleanCorpus(spark: SparkSession, dir: String): DataFrame =
    cleanCorpusFrame(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("quality"))
      .orderBy("doc_id")

  /** The clean corpus WITHOUT the gate-presentation sort and WITH the
    * per-doc token count ([[TextOps.qualityScoresDocsKeep]]'s `n_words`)
    * kept — what [[trainingSet]] composes on: its packing stage needs
    * exactly the whitespace token count the quality pass already
    * computed, so re-scanning `documents` and re-splitting every
    * surviving text for it was a full corpus pass of pure recompute.
    *
    * The quality gate and the exact-dedup digest are ONE scan
    * projection: quality stats and `md5(text)` come out of the same
    * pass, and the keep-lowest-doc_id window runs directly on it —
    * previously quality and exact dedup each scanned the corpus and a
    * doc_id join lined them up (two scans + a corpus-wide shuffle join,
    * both removed; survivors and output are identical because the
    * window ran over all docs in both shapes and the quality filter
    * commutes with the rank-1 filter).
    */
  private def cleanCorpusFrame(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables.BarrierOps
    import org.apache.spark.sql.expressions.Window
    val scored = TextOps.qualityScoresDocsKeep(
      graft.Tables.documents(spark, dir),
      Seq(col("lang"), col("source"), md5(col("text").cast("binary")).as("h")))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    // the survivor set feeds BOTH the near-dup input and the final
    // anti-join — materialize it once
    val survivors = scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("quality") >= qualityThreshold)
      .select(col("doc_id"), col("lang"), col("source"), col("quality"),
        col("n_words"))
      .barrier()
    // Near-dup removal runs over the SURVIVORS only — the documented
    // stage order (quality gate → exact dedup → near-dup), and the scale
    // fix: candidate generation over the raw corpus re-paid every doc the
    // earlier gates had already dropped, which at the sf100 replica's
    // duplicate density made this stage super-linear (13.7× for 10×
    // data). The pairs come from ngramJaccard's ADAPTIVE seam (PPJoin
    // prefix pruning / capped banding + exact verification),
    // strategy-logged under its own label so artifacts show which side
    // fired.
    val docs = graft.Tables.fanout(graft.Tables.documents(spark, dir))
      .join(survivors.select(col("doc_id")), "doc_id")
      .select(col("doc_id"), col("text"))
    val nearDupLosers = Dedup.ngramJaccardDocs(spark, docs, "pipe_near_dup")
      .select(col("doc_b").as("doc_id"))
      .distinct()
    survivors.join(nearDupLosers, Seq("doc_id"), "left_anti")
  }

  /** The full training-set assembly on top of [[cleanCorpus]]:
    *
    *   clean corpus  →  deterministic stratified sample  →  token-budget
    *   sequence packing over the survivors
    *
    * i.e. every round-2 sampling stage composed with the curation chain —
    * the output is the (doc → training sequence) assignment a loader
    * would consume. Packing runs on the SURVIVORS' running token counts,
    * so sequences are dense (no holes from dropped docs); the sampling
    * draw and the packing order are both deterministic, making the whole
    * pipeline replay-stable end to end.
    */
  def trainingSet(spark: SparkSession, dir: String): DataFrame = {
    // n_tokens IS the quality pass's n_words (same `size(split(trim))`
    // expression) — carried through cleanCorpusFrame instead of
    // re-scanning documents and re-splitting every surviving text
    val kept = cleanCorpusFrame(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_words").as("n_tokens"))
      // stratified draw, same hash family as Sampling.stratified
      .filter(Sampling.draw("train") <
        when(col("lang") === "en", lit("80000000")).otherwise(lit("e0000000")))
    // packing runs the same segmented prefix sum as pack_token_budget —
    // no per-language window at any stage of the composition
    Sampling.packDocs(kept, budget = 512)
  }
}
