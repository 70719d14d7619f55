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

  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.qualityScores(spark, dir).select(col("doc_id"), col("quality"))
    val exactKept = Dedup.exact(spark, dir) // doc_id, lang, source
    // The adaptive entry, not raw minhashLsh: at the replica's designed
    // duplicate density the un-verified banded join alone went
    // super-linear (13.7× sf10→sf100) while ngramJaccard's seam — prefix
    // pruning / capped banding + exact verification — stays linear; the
    // pipeline should ride the operator's own scale switch.
    val nearDupLosers = Dedup.ngramJaccard(spark, dir)
      .select(col("doc_b").as("doc_id"))
      .distinct()
    exactKept
      .join(quality, "doc_id")
      .filter(col("quality") >= qualityThreshold)
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("quality"))
      .orderBy("doc_id")
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
    val kept = cleanCorpus(spark, dir).select(col("doc_id"), col("lang"))
      // stratified draw, same hash family as Sampling.stratified
      .filter(Sampling.draw("train") <
        when(col("lang") === "en", lit("80000000")).otherwise(lit("e0000000")))
    val toks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    // packing runs the same segmented prefix sum as pack_token_budget —
    // no per-language window at any stage of the composition
    Sampling.packDocs(kept.join(toks, "doc_id"), budget = 512)
  }
}
