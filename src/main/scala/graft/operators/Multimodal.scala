package graft.operators

import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * processed in partition-sized batches.
  *
  * The decode step is a STUB — the container has no image/audio codecs — but
  * everything around it is the real shape a 100 TB media pipeline needs:
  * an explicit (binary, metadata struct) schema, `fanout` partitioning so
  * decode parallelizes, and a `mapPartitions` batch boundary (the Scala
  * analogue of `mapInPandas`: one iterator per partition, so a real decoder
  * would amortize model/codec initialization per partition, not per row).
  * Swapping `fakeDecode` for a JNI/codec call changes no plumbing.
  */
object Multimodal {

  /** Deterministic fake "decode": byte-level features standing in for a
    * real decoder's output (dimensions, channels, histogram, ...).
    */
  private def fakeDecode(payload: Array[Byte]): (Long, Double, Int) = {
    val crc = new CRC32()
    crc.update(payload)
    val mean = if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xFF).toDouble).sum / payload.length
    (crc.getValue, math.floor(mean * 1e4) / 1e4, payload.length)
  }

  val outputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType),
    StructField("mean_byte", DoubleType),
    StructField("payload_len", IntegerType)))

  /** Build a synthetic media table from `documents` (text bytes as the
    * opaque payload + typed metadata), then run the batched decode.
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanout(Tables.documents(spark, dir))
    val media = d.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("media_type"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))
    val enc = RowEncoder.encoderFor(outputSchema)
    media.mapPartitions { rows =>
      // Per-partition init happens here (decoder/codec handle in real life).
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val meta = r.getStruct(r.fieldIndex("meta"))
        val (crc, mean, len) = fakeDecode(payload)
        Row(r.getAs[Long]("doc_id"), meta.getString(0), meta.getLong(1), crc, mean, len)
      }
    }(enc).toDF()
  }

  /** Per-media-type rollup of the decoded features (oracle-checkable: CRC32
    * and byte stats are engine-portable).
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    binaryMeta(spark, dir)
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("checksum")).as("min_checksum"),
        (floor(sum(col("mean_byte")) / count(lit(1)) * lit(1e4)) / lit(1e4)).as("avg_mean_byte"))
      .orderBy("media_type")
}
