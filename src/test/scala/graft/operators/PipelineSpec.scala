package graft.operators

import graft.{SparkSpec, Tables}

class PipelineSpec extends SparkSpec {

  lazy val cleaned: Array[org.apache.spark.sql.Row] =
    Pipeline.cleanCorpus(spark, sfDir).collect()

  test("pipeline only keeps documents above the quality gate") {
    assert(cleaned.nonEmpty)
    cleaned.foreach(r => assert(r.getAs[Double]("quality") >= Pipeline.qualityThreshold))
  }

  test("no near-duplicate pair fully survives the pipeline") {
    val kept = cleaned.map(_.getAs[Long]("doc_id")).toSet
    // ground truth = the exact-verified pair list (at this SF ngramJaccard
    // runs its complete-recall PPJoin side, so every true-Jaccard >= t
    // pair must be broken by the pipeline)
    Dedup.ngramJaccard(spark, sfDir).collect().foreach { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      assert(!(kept.contains(a) && kept.contains(b)), s"pair ($a,$b) both kept")
    }
  }

  test("pipeline output is a strict subset with no exact duplicates") {
    val total = Tables.documents(spark, sfDir).count()
    assert(cleaned.length < total)
    val kept = cleaned.map(_.getAs[Long]("doc_id")).toSet
    val exactKept = Dedup.exact(spark, sfDir).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.subsetOf(exactKept))
  }

  test("training set packs only sampled survivors into dense sequences") {
    val rows = Pipeline.trainingSet(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cleanedIds = cleaned.map(_.getAs[Long]("doc_id")).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet.subsetOf(cleanedIds),
      "packed docs must come from the cleaned corpus")
    assert(rows.length < cleaned.length, "the stratified draw must thin the corpus")
    // sequences are dense over survivors: offsets chain exactly
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("seq_id") === cum / 512)
        assert(r.getAs[Long]("seq_offset") === cum % 512)
        cum += r.getAs[Long]("n_tokens")
      }
    }
    // replay-stable end to end
    val again = Pipeline.trainingSet(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
