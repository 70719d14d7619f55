package graft.indexer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec
import graft.sinks.ParquetMergeSink

/** End-to-end live-indexer lineage: HeightPollSource → decode → route →
  * merge-sink, one streaming query — killed mid-batch BETWEEN two tables'
  * merges, resumed from the checkpoint, and proven row-identical to the
  * batch flow over the same landing data (the reference's single worker
  * loop, main.go:255-312 + process_tx.go + db.go ON CONFLICT).
  */
class LiveIndexerSpec extends SparkSpec {

  /** JSON-escape a string for embedding as a JSON string literal. */
  private def q(s: String): String = "\"" + s.replace("\"", "\\\"") + "\""

  private def txJson(h: Long): String =
    s"""{"body":{"messages":[{"@type":"/emissions.v3.MsgInsertWorkerPayload","sender":"allo1w$h","topic_id":"7"}]}}"""

  private def blockJson(h: Long): String =
    s"""{"header":{"chain_id":"testchain-1","height":"$h","time":"2024-05-01T10:00:0${h % 10}Z","proposer_address":"P$h"},"data":{"txs":[${q(txJson(h))}]}}"""

  private def resultsJson(h: Long): String =
    s"""{"height":"$h","finalize_block_events":[
       {"type":"emissions.v3.EventScoresSet","attributes":[
         {"key":"topic_id","value":"\\"7\\""},
         {"key":"actor_type","value":"\\"inferer\\""},
         {"key":"block_height","value":"\\"${h - 1}\\""},
         {"key":"addresses","value":"[\\"allo1a\\",\\"allo1b\\"]"},
         {"key":"scores","value":"[\\"0.2$h\\",\\"-0.5\\"]"}]},
       {"type":"emissions.v3.EventWorkerLastCommitSet","attributes":[
         {"key":"topic_id","value":"\\"7\\""},
         {"key":"block_height","value":"\\"$h\\""},
         {"key":"nonce","value":"{\\"block_height\\":\\"${h - 1}\\"}"}]}],
       "txs_results":[]}""".replaceAll("\n\\s*", "")

  private def envelope(h: Long): String =
    s"""{"block":${blockJson(h)},"block_results":${resultsJson(h)}}"""

  private def writeLanding(dir: String, heights: Range): Unit =
    heights.foreach { h =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"$h.json"), envelope(h).getBytes)
    }

  private def tableRows(root: String, name: String): Set[Seq[Any]] = {
    val df = ParquetMergeSink.read(spark, s"$root/$name")
    // canonical column order + stringified cells (attributes arrays etc.)
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf)).map(identity).toSet
  }

  private val tableNames =
    Seq("block_info", "messages", "events", "scores", "last_commits")

  test("one streaming lineage: kill between table merges, resume, " +
      "row-identical to the batch flow") {
    val landing = java.nio.file.Files.createTempDirectory("graft-live").toString
    val base = java.nio.file.Files.createTempDirectory("graft-live-out").toString
    val streamRoot = base + "/stream"
    val batchRoot = base + "/batch"
    val ckpt = base + "/ckpt"
    writeLanding(landing, 1 to 6)

    // First run: 2 heights per trigger; crash batch 1 AFTER block_info's
    // merge committed but BEFORE messages/events/scores/last_commits —
    // the worst crash window (tables of one batch out of sync on disk).
    val boom = new java.util.concurrent.atomic.AtomicBoolean(true)
    val q1 = LiveIndexer.start(spark, landing, streamRoot, ckpt,
      maxHeightsPerTrigger = Some(2L),
      afterTable = (id, table) =>
        if (id == 1 && table == "block_info" && boom.getAndSet(false))
          throw new RuntimeException("injected crash between table merges"))
    val failed = intercept[StreamingQueryException] { q1.awaitTermination() }
    assert(failed.getMessage.contains("injected crash") ||
      Option(failed.getCause).exists(_.getMessage.contains("injected crash")))

    // The crash left batch 1 HALF-merged: block_info holds heights 3-4,
    // messages (merged after the crash point) does not.
    val partialBlocks = ParquetMergeSink.read(spark, s"$streamRoot/block_info")
      .select("height").collect().map(_.getLong(0)).sorted.toSeq
    assert(partialBlocks === (1L to 4L), s"expected half-merged state, got $partialBlocks")
    val partialMsgs = ParquetMergeSink.read(spark, s"$streamRoot/messages")
      .select("height").collect().map(_.getLong(0)).sorted.toSeq
    assert(partialMsgs === Seq(1L, 2L), s"messages must lag block_info, got $partialMsgs")

    // Resume from the checkpoint: the uncommitted batch replays whole
    // (its block_info half converges via the keyed merge), then the pump
    // drains to the tip.
    val q2 = LiveIndexer.start(spark, landing, streamRoot, ckpt,
      maxHeightsPerTrigger = Some(2L))
    q2.awaitTermination()

    // Batch flow over the same landing files — identical lineage, one go.
    import spark.implicits._
    val all = (1 to 6).map(h => (h.toLong, envelope(h))).toDF("height", "block_json")
    LiveIndexer.mergeAll(all, batchRoot,
      classOf[Ingest.JsonPassthroughDecoder].getName)

    tableNames.foreach { t =>
      assert(tableRows(streamRoot, t) === tableRows(batchRoot, t),
        s"stream and batch flows diverged on table $t")
    }

    // Shape sanity: every height exactly once (exactly-once through the
    // replayed crash window), scores zip-exploded, last-commit update-wins.
    assert(tableRows(streamRoot, "block_info").size === 6)
    assert(tableRows(streamRoot, "messages").size === 6)
    assert(tableRows(streamRoot, "scores").size === 12) // 6 heights × 2 addrs
    val lc = ParquetMergeSink.read(spark, s"$streamRoot/last_commits").collect()
    assert(lc.length === 1, "update-wins table must hold one row per key")
    assert(lc(0).getAs[Long]("height_tx") === 6L,
      "latest-wins must keep the newest commit")
  }

  test("HTTP client polls a loopback server end-to-end through the " +
      "same lineage") {
    // A real network hop behind the two-method SPI: a loopback
    // HttpServer implements the documented REST contract
    // (GET /latest_height → tip, GET /block/<h> → envelope), and the
    // pump runs with HttpHeightClient — nothing else changes.
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, 0), 0)
    val tip = new java.util.concurrent.atomic.AtomicLong(4L)
    def reply(ex: com.sun.net.httpserver.HttpExchange, code: Int,
        body: String): Unit = {
      val b = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/latest_height",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        reply(ex, 200, tip.get.toString))
    server.createContext("/block/",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val h = ex.getRequestURI.getPath.stripPrefix("/block/").toLongOption
        h.filter(x => x >= 1 && x <= tip.get) match {
          case Some(x) => reply(ex, 200, envelope(x))
          case None => reply(ex, 404, "no such height")
        }
      })
    server.start()
    val endpoint =
      s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val base = java.nio.file.Files.createTempDirectory("graft-http").toString
      val httpRoot = base + "/http"
      val ckpt = base + "/ckpt"
      // client unit contract: tip read, block read, 404 throws (task
      // retry seam)
      val c = new graft.sources.HttpHeightClient(endpoint)
      assert(c.latestHeight() === 4L)
      assert(c.fetchBlock(2L) === envelope(2L))
      intercept[java.io.IOException](c.fetchBlock(99L))

      // end-to-end drain over the network, capped catch-up included
      LiveIndexer.start(spark, endpoint, httpRoot, ckpt,
        maxHeightsPerTrigger = Some(2L),
        clientClass = classOf[graft.sources.HttpHeightClient].getName)
        .awaitTermination()

      // identical lineage over the same data via the batch flow
      import spark.implicits._
      val all = (1 to 4).map(h => (h.toLong, envelope(h)))
        .toDF("height", "block_json")
      val batchRoot = base + "/batch"
      LiveIndexer.mergeAll(all, batchRoot,
        classOf[Ingest.JsonPassthroughDecoder].getName)
      tableNames.foreach { t =>
        assert(tableRows(httpRoot, t) === tableRows(batchRoot, t),
          s"HTTP and batch flows diverged on table $t")
      }

      // the chain advances; the SAME checkpoint catches up incrementally
      tip.set(6L)
      LiveIndexer.start(spark, endpoint, httpRoot, ckpt,
        maxHeightsPerTrigger = Some(2L),
        clientClass = classOf[graft.sources.HttpHeightClient].getName)
        .awaitTermination()
      assert(ParquetMergeSink.read(spark, s"$httpRoot/block_info")
        .select("height").collect().map(_.getLong(0)).sorted.toSeq
        === (1L to 6L),
        "a restarted pump must resume from the checkpointed height")
    } finally server.stop(0)
  }

  test("re-running the drained pump is a no-op (idempotent catch-up)") {
    val landing = java.nio.file.Files.createTempDirectory("graft-live2").toString
    val base = java.nio.file.Files.createTempDirectory("graft-live2-out").toString
    writeLanding(landing, 1 to 3)
    val root = base + "/t"
    val ckpt = base + "/ckpt"
    LiveIndexer.start(spark, landing, root, ckpt).awaitTermination()
    val before = tableNames.map(t => t -> tableRows(root, t)).toMap
    LiveIndexer.start(spark, landing, root, ckpt).awaitTermination()
    tableNames.foreach { t =>
      assert(tableRows(root, t) === before(t), s"re-run mutated table $t")
    }
  }
}
