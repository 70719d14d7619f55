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

  test("frame sampling agrees with a native substring/crc32 pipeline") {
    // independent path: slice every 4th 16-byte frame with pure Catalyst
    // expressions (substring is 1-based; binary slices stay binary)
    val native = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text").cast("binary").as("p"))
      .filter(length(col("p")) >= 16)
      .select(col("doc_id"),
        explode(sequence(lit(0), (length(col("p")) / 16).cast("int") - 1)).as("i"),
        col("p"))
      .filter(col("i") % 4 === 0)
      .select(col("doc_id"), col("i").as("frame_idx"),
        crc32(expr("substring(p, i * 16 + 1, 16)")).as("frame_crc"),
        lit(16).as("frame_bytes"))
    val sampled = Multimodal.frameSample(spark, sfDir)
    assert(sampled.exceptAll(native).count() === 0)
    assert(native.exceptAll(sampled).count() === 0)
    // 1 -> N: a video doc must emit multiple frames
    assert(sampled.count() > Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 2).count())
  }

  test("audio energy windows agree with a native aggregate pipeline") {
    // independent path: explode 64-byte windows and fold RMS/peak with
    // pure Catalyst higher-order functions over the unsigned bytes
    val native = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text").cast("binary").as("p"))
      .filter(length(col("p")) >= 64)
      .select(col("doc_id"),
        explode(sequence(lit(0), (length(col("p")) / 64).cast("int") - 1)).as("w"),
        col("p"))
      .select(col("doc_id"), col("w").as("window_idx"),
        expr("transform(split(hex(substring(p, w * 64 + 1, 64)), '(?<=\\\\G..)'), " +
          "h -> conv(h, 16, 10))").as("hx"))
      .filter(size(col("hx")) >= 64)
      .select(col("doc_id"), col("window_idx"),
        (floor(sqrt(expr(
          "aggregate(slice(hx, 1, 64), 0.0D, (a, x) -> a + double(x) * double(x))")
          / 64) * 1e4) / 1e4).as("rms"),
        expr("int(array_max(transform(slice(hx, 1, 64), x -> int(x))))").as("peak"))
    val energy = Multimodal.audioEnergy(spark, sfDir)
    assert(energy.exceptAll(native).count() === 0)
    assert(native.exceptAll(energy).count() === 0)
    assert(energy.count() > 0)
  }

  test("resize halves the pixel grid deterministically") {
    val t1 = Multimodal.resize(spark, sfDir).collect()
    val t2 = Multimodal.resize(spark, sfDir).collect()
    assert(t1.length === t2.length && t1.nonEmpty)
    t1.zip(t2).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(
        a.getAs[Array[Byte]]("thumb"), b.getAs[Array[Byte]]("thumb")),
        "replay must produce byte-identical thumbnails")
    }
    t1.foreach { r =>
      val crc = new java.util.zip.CRC32()
      crc.update(r.getAs[Array[Byte]]("thumb"))
      assert(crc.getValue === r.getAs[Long]("thumb_crc"))
      assert(r.getAs[Int]("thumb_bytes") === r.getAs[Array[Byte]]("thumb").length)
    }
  }
}
