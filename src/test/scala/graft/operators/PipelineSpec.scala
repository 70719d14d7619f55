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
    Dedup.minhashLsh(spark, sfDir).collect().foreach { r =>
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
}
