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
    import graft.Tables.BarrierOps
    val quality = TextOps.qualityScores(spark, dir).select(col("doc_id"), col("quality"))
    val exactKept = Dedup.exact(spark, dir) // doc_id, lang, source
    // the survivor set feeds BOTH the near-dup input and the final
    // anti-join — materialize it once
    val survivors = exactKept
      .join(quality, "doc_id")
      .filter(col("quality") >= qualityThreshold)
      .barrier()
    // Near-dup removal runs over the SURVIVORS only — the documented
    // stage order (quality gate → exact dedup → near-dup), and the scale
    // fix: candidate generation over the raw corpus re-paid every doc the
    // earlier gates had already dropped, which at the sf100 replica's
    // duplicate density made this stage super-linear (13.7× for 10×
    // data). The pairs come from ngramJaccard's ADAPTIVE seam (prefix
    // pruning / capped banding + exact verification), strategy-logged
    // under its own label so artifacts show which side fired.
    val docs = graft.Tables.fanout(graft.Tables.documents(spark, dir))
      .join(survivors.select(col("doc_id")), "doc_id")
      .select(col("doc_id"), col("text"))
    val nearDupLosers = Dedup.ngramJaccardDocs(spark, docs, "pipe_near_dup")
      .select(col("doc_b").as("doc_id"))
      .distinct()
    survivors
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
