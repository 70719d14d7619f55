package graft.indexer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sinks.ParquetMergeSink

/** The reference's LIVE loop — poll tip, fetch heights, decode, route,
  * upsert (main.go:255-312 + process_tx.go + process_events.go + db.go ON
  * CONFLICT) — composed as ONE streaming lineage over this library's
  * pieces:
  *
  *   HeightPollSource (offset = chain height, capped catch-up)
  *     → envelope split (block + block_results per height — the two RPC
  *       responses the reference fetches per height, landed as one doc)
  *     → Ingest.blockInfo / txsFromBlocks → decodeTxs → messages
  *     → Ingest.events → Routers (whitelist, scores, last-commits)
  *     → ParquetMergeSink per table (manifest-committed generations,
  *       latest-wins merge = ON CONFLICT semantics)
  *
  * Exactly-once through the WHOLE lineage is the composition of the
  * source's checkpointed height ranges (a restarted pump never re-fetches
  * a committed range) and every sink merge being an idempotent keyed
  * upsert (a replayed UNCOMMITTED batch converges to the same table, even
  * when the crash landed between two tables' merges mid-batch) — the same
  * argument the reference makes with its DB transaction per height plus ON
  * CONFLICT inserts. Pinned end-to-end by LiveIndexerSpec: kill mid-batch
  * between table merges, resume, compare row-identical against the batch
  * flow over the same landing data.
  */
object LiveIndexer {

  /** Normalized tables of one raw `(height, block_json)` micro-batch:
    * (name, frame, conflict keys, version column) — the db.go table set
    * reachable from the per-height envelope. Conflict keys mirror the
    * reference's ON CONFLICT targets; `last_commits` is the update-wins
    * table (db.go:1171-1175), everything else insert-ignore.
    */
  def tablesOf(raw: DataFrame, decoderClass: String)
      : Seq[(String, DataFrame, Seq[String], String)] = {
    // Live landing stores both per-height RPC responses in one document
    // {"block":{…},"block_results":{…}}; a plain block document (no
    // envelope) still flows — with zero events.
    val env = raw.select(
      col("height"),
      coalesce(get_json_object(col("block_json"), "$.block"),
        col("block_json")).as("block_json"),
      get_json_object(col("block_json"), "$.block_results").as("results_json"))
    val blocks = env.select("height", "block_json")
    val results = env.filter(col("results_json").isNotNull)
      .select("height", "results_json")
    val msgs = Ingest.messages(
      Ingest.decodeTxs(Ingest.txsFromBlocks(blocks), decoderClass))
    val evts = Ingest.events(results)
    Seq(
      ("block_info", Ingest.blockInfo(blocks), Seq("height"), "height"),
      ("messages", msgs, Seq("height", "hash"), "height"),
      ("events", Routers.routeEvents(evts),
        Seq("height", "type", "hash"), "height"),
      ("scores", Routers.scores(evts),
        Seq("height_tx", "topic_id", "type", "address"), "height_tx"),
      ("last_commits", Routers.actorLastCommit(evts),
        Seq("topic_id", "is_worker"), "height_tx"))
  }

  /** Merge one micro-batch into every table under `tableRoot`. The raw
    * batch is barriered once (the five lineages all start from it; without
    * the barrier each table's merge would re-fetch every block).
    * `afterTable` is the crash-injection seam the restart spec uses — a
    * real deployment leaves it as the no-op.
    */
  def mergeAll(batch: DataFrame, tableRoot: String, decoderClass: String,
      afterTable: (Long, String) => Unit = (_, _) => (),
      batchId: Long = -1L): Unit = {
    val b = graft.Tables.barrier(batch)
    try
      tablesOf(b, decoderClass).foreach { case (name, df, keys, version) =>
        ParquetMergeSink.merge(df, s"$tableRoot/$name", keys, version)
        afterTable(batchId, name)
      }
    finally b.unpersist()
  }

  /** Start the live pump: drains the landing tip in capped, checkpointed
    * micro-batches (Trigger.AvailableNow — the catch-up run; a deployment
    * polling a live chain uses a processing-time trigger with the same
    * lineage). Restart with the same checkpoint to resume exactly where
    * the last committed batch ended.
    */
  def start(spark: SparkSession, landingDir: String, tableRoot: String,
      checkpoint: String,
      decoderClass: String = classOf[Ingest.JsonPassthroughDecoder].getName,
      maxHeightsPerTrigger: Option[Long] = None,
      afterTable: (Long, String) => Unit = (_, _) => (),
      clientClass: String =
        classOf[graft.sources.DirHeightClient].getName): StreamingQuery = {
    // `landingDir` is the client's one-string constructor arg: a
    // directory for the sandbox DirHeightClient, an http(s) endpoint for
    // HttpHeightClient — the lineage is identical either way.
    val base = spark.readStream.format("graft.sources.HeightPollSource")
      .option("client", clientClass)
      .option("clientArg", landingDir)
    val src = maxHeightsPerTrigger
      .fold(base)(n => base.option("maxHeightsPerTrigger", n.toString))
      .load()
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeAll(batch, tableRoot, decoderClass, afterTable, id)
      }
      .start()
  }
}
