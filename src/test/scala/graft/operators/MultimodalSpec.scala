package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  test("batched decode agrees with Spark's native crc32/length expressions") {
    // The mapPartitions pipeline and a pure-Catalyst computation are
    // independent paths; they must agree byte-for-byte.
    val decoded = Multimodal.binaryMeta(spark, sfDir)
      .select("doc_id", "checksum", "payload_len")
    val native = Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        crc32(col("text").cast("binary")).as("checksum"),
        length(col("text")).as("payload_len"))
    assert(decoded.exceptAll(native).count() === 0)
    assert(native.exceptAll(decoded).count() === 0)
  }

  test("metadata struct carries media type and byte size") {
    val rows = Multimodal.binaryMeta(spark, sfDir).collect()
    assert(rows.length === Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(Set("image/png", "audio/wav", "video/mp4").contains(r.getAs[String]("media_type")))
      assert(r.getAs[Long]("n_bytes") === r.getAs[Int]("payload_len").toLong)
    }
  }

  test("mediaStats rolls up per media type") {
    val rows = Multimodal.mediaStats(spark, sfDir).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === Tables.documents(spark, sfDir).count())
  }
}
