package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sinks.ParquetMergeSink

class HeightPollSourceSpec extends SparkSpec {

  private val blockJson =
    """{"header":{"chain_id":"testchain-1","height":"%d",
       "time":"2024-05-01T10:00:00Z","proposer_address":"P1"},
       "data":{"txs":[]}}""".replaceAll("\n\\s*", "")

  private def writeHeights(dir: String, heights: Range): Unit =
    heights.foreach { h =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"$h.json"),
        blockJson.format(h).getBytes)
    }

  private def pollStream(dir: String, extra: Map[String, String] = Map.empty) = {
    val base = spark.readStream.format("graft.sources.HeightPollSource")
      .option("dir", dir)
    extra.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("polls the tip and fetches every height exactly once across restarts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-poll").toString
    val base = java.nio.file.Files.createTempDirectory("graft-poll-out").toString
    val table = base + "/block_info"
    val ckpt = base + "/ckpt"
    writeHeights(dir, 1 to 5)

    def runOnce(): Unit = {
      val q = pollStream(dir).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          ParquetMergeSink.merge(batch, table, Seq("height"), "height")
        }
        .start()
      q.awaitTermination()
    }
    runOnce()
    val got1 = ParquetMergeSink.read(spark, table)
      .select("height").collect().map(_.getLong(0)).sorted
    assert(got1.toSeq === (1L to 5L), s"first catch-up fetched ${got1.toSeq}")

    // the chain advances; a restarted pump resumes FROM THE CHECKPOINT —
    // heights 1-5 are never re-fetched (offset ranges are exactly-once)
    writeHeights(dir, 6 to 8)
    runOnce()
    val got2 = ParquetMergeSink.read(spark, table)
      .select("height").collect().map(_.getLong(0)).sorted
    assert(got2.toSeq === (1L to 8L))
    // and the fetched body is the real block payload
    val body = ParquetMergeSink.read(spark, table)
      .filter(col("height") === 7L).select("block_json").head.getString(0)
    assert(body.contains("\"height\":\"7\""))
  }

  test("maxHeightsPerTrigger drains a backlog in bounded, checkpointed steps") {
    val dir = java.nio.file.Files.createTempDirectory("graft-poll-cap").toString
    val base = java.nio.file.Files.createTempDirectory("graft-poll-cap-out").toString
    writeHeights(dir, 1 to 7)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val q = pollStream(dir, Map("maxHeightsPerTrigger" -> "3")).writeStream
      .option("checkpointLocation", base + "/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.synchronized {
          seen += id -> batch.select("height").collect().map(_.getLong(0)).sorted.toSeq
        }
        ()
      }
      .start()
    q.awaitTermination()
    val batches = seen.sortBy(_._1).map(_._2).toSeq
    assert(batches.flatten === (1L to 7L),
      s"capped catch-up must cover the backlog in order, got $batches")
    assert(batches.forall(_.size <= 3),
      s"a batch exceeded maxHeightsPerTrigger: $batches")
    assert(batches.size >= 3, s"expected >= ceil(7/3) batches, got $batches")
  }

  test("a batch's height range fans out to heightsPerPartition-sized workers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-poll-fan").toString
    val base = java.nio.file.Files.createTempDirectory("graft-poll-fan-out").toString
    writeHeights(dir, 1 to 6)
    var parts = -1
    val q = pollStream(dir, Map("heightsPerPartition" -> "2")).writeStream
      .option("checkpointLocation", base + "/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the worker fan-out of the reference's height channel: 6 heights
        // at 2 per worker slice = 3 parallel fetch partitions
        parts = batch.rdd.getNumPartitions
        assert(batch.count() === 6)
        ()
      }
      .start()
    q.awaitTermination()
    assert(parts === 3, s"expected 3 fetch partitions, got $parts")
  }

  test("the landing-file pump and the poll pump produce identical block_info rows") {
    import graft.indexer.Ingest
    // same chain, two transport shapes: ranged landing files (batch dumps)
    // and the height poller (live RPC stand-in) must feed identical rows
    // to the same downstream lineage
    val dirPoll = java.nio.file.Files.createTempDirectory("graft-poll-eq").toString
    writeHeights(dirPoll, 1 to 4)
    val streamed = {
      val base = java.nio.file.Files.createTempDirectory("graft-poll-eq-out").toString
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val q = pollStream(dirPoll).writeStream
        .option("checkpointLocation", base + "/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          rows.synchronized {
            rows ++= batch.collect().map(r => (r.getLong(0), r.getString(1)))
          }
          ()
        }
        .start()
      q.awaitTermination()
      rows.sortBy(_._1).toSeq
    }
    import spark.implicits._
    val viaPoll = Ingest.blockInfo(streamed.toDF("height", "block_json"))
      .select("height", "chain_id", "proposer_address")
      .collect().map(_.toSeq).toSeq
    val landing = java.nio.file.Files.createTempDirectory("graft-landing-eq").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "blocks-1-4.jsonl"),
      (1 to 4).map(h => s"$h\t${blockJson.format(h)}").mkString("\n").getBytes)
    val viaFiles = Ingest.blockInfo(
        spark.read.format("graft.sources.BlockJsonSource").load(landing))
      .select("height", "chain_id", "proposer_address")
      .collect().map(_.toSeq).toSeq
    assert(viaPoll.sortBy(_.head.asInstanceOf[Long].longValue()) ===
      viaFiles.sortBy(_.head.asInstanceOf[Long].longValue()))
  }
}
