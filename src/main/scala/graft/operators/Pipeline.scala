package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB corpus
  * actually runs, built entirely from the operators in this package —
  *
  *   quality gate  →  exact dedup  →  near-dup removal (MinHash-LSH)
  *
  * Each stage is the scalable variant: the quality gate is a codegen'd
  * projection + filter, exact dedup shuffles on a digest, and near-dup
  * candidates come from the banded LSH join rather than any pairwise scan.
  * Near-dup pairs keep their lowest doc_id (canonical survives, the rest
  * drop via a left-anti join).
  */
object Pipeline {

  val qualityThreshold = 0.55

  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.quality(spark, dir).select(col("doc_id"), col("quality"))
    val exactKept = Dedup.exact(spark, dir) // doc_id, lang, source
    val nearDupLosers = Dedup.minhashLsh(spark, dir)
      .select(col("doc_b").as("doc_id"))
      .distinct()
    exactKept
      .join(quality, "doc_id")
      .filter(col("quality") >= qualityThreshold)
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("quality"))
      .orderBy("doc_id")
  }
}
