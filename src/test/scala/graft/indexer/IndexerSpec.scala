package graft.indexer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end over synthetic chain JSON fixtures shaped like the public
  * CometBFT / Cosmos SDK payloads the reference ingests. Fixtures are
  * hand-written here, not copied from chain dumps.
  */
class IndexerSpec extends SparkSpec {
  import spark.implicits._

  private val blockJson =
    """{"header":{"version":{"block":"11"},"chain_id":"testchain-1","height":"100",
       "time":"2024-05-01T10:00:00Z",
       "last_block_id":{"hash":"AB12","part_set_header":{"total":1,"hash":"CD34"}},
       "last_commit_hash":"E1","data_hash":"E2","validators_hash":"E3",
       "next_validators_hash":"E4","consensus_hash":"E5","app_hash":"E6",
       "last_results_hash":"E7","evidence_hash":"E8","proposer_address":"P1"},
       "data":{"txs":["dGVzdA=="]}}""".replaceAll("\n\\s*", "")

  private val txJson =
    """{"body":{"messages":[
       {"@type":"/emissions.v3.MsgCreateNewTopic","creator":"allo1creator",
        "topic_id":"7","metadata":"eth-pred","loss_method":"mse",
        "epoch_length":"120","ground_truth_lag":"60","default_arg":"x",
        "pnorm":"3","alpha_regret":"0.1","allow_negative":"true"},
       {"@type":"/cosmos.bank.v1beta1.MsgSend","from_address":"allo1from",
        "to_address":"allo1to","amount":[{"denom":"uallo","amount":"5000"}]},
       {"@type":"/emissions.v3.InsertWorkerPayloadRequest","sender":"allo1w",
        "worker_data_bundle":{"worker":"allo1w","topic_id":"7",
          "nonce":{"block_height":"99"},
          "inference_forecasts_bundle":{
            "inference":{"topic_id":"7","block_height":"99","inferer":"allo1w",
                         "value":"123.45","extra_data":"","proof":""},
            "forecast":{"topic_id":"7","block_height":"99","forecaster":"allo1w",
              "forecast_elements":[{"inferer":"allo1a","value":"1.5"},
                                   {"inferer":"allo1b","value":"2.5"}],
              "extra_data":""}}}}]}}""".replaceAll("\n\\s*", "")

  private val resultsJson =
    """{"height":"100",
       "finalize_block_events":[
         {"type":"emissions.v3.EventScoresSet","attributes":[
           {"key":"topic_id","value":"\"7\""},
           {"key":"actor_type","value":"\"inferer\""},
           {"key":"block_height","value":"\"99\""},
           {"key":"addresses","value":"[\"allo1a\",\"allo1b\",\"allo1c\"]"},
           {"key":"scores","value":"[\"0.25\",\"-0.5\",\"oops\"]"}]},
         {"type":"emissions.v3.EventWorkerLastCommitSet","attributes":[
           {"key":"block_height","value":"\"100\""},
           {"key":"nonce","value":"{\"block_height\":\"99\"}"},
           {"key":"topic_id","value":"\"7\""}]},
         {"type":"mint.v2.EventTokenomicsSet","attributes":[
           {"key":"staked_token_amount","value":"\"1000.5\""},
           {"key":"circulating_supply","value":"\"50000.25\""},
           {"key":"emissions_amount","value":"\"12.125\""}]},
         {"type":"emissions.v3.EventNetworkLossSet","attributes":[
           {"key":"topic_id","value":"\"7\""},
           {"key":"block_height","value":"\"99\""},
           {"key":"value_bundle","value":"{\"naive_value\":\"0.9\",\"combined_value\":\"0.8\",\"inferer_values\":[{\"worker\":\"allo1a\",\"value\":\"0.7\"},{\"worker\":\"allo1b\",\"value\":\"0.6\"}],\"forecaster_values\":[{\"worker\":\"allo1c\",\"value\":\"0.5\"}]}"}]},
         {"type":"some.module.EventUnknownThing","attributes":[]}],
       "txs_results":[{"code":0,"events":[
         {"type":"emissions.v3.EventWorkerLastCommitSet","attributes":[
           {"key":"block_height","value":"\"101\""},
           {"key":"nonce","value":"{\"block_height\":\"100\"}"},
           {"key":"topic_id","value":"\"7\""}]}]}]}""".replaceAll("\n\\s*", "")

  private val txJson2 =
    """{"body":{"messages":[
       {"@type":"/emissions.v3.InsertReputerPayloadRequest","sender":"allo1rep",
        "reputer_value_bundle":{"pubkey":"PK1","signature":"SIG1",
          "value_bundle":{"reputer":"allo1rep","topic_id":"7","extra_data":"",
            "naive_value":"0.91","combined_value":"0.88",
            "reputer_request_nonce":{"worker_nonce":{"block_height":"98"},
                                     "reputer_nonce":{"block_height":"99"}},
            "inferer_values":[{"worker":"allo1a","value":"0.1"},
                              {"worker":"allo1b","value":"0.2"}],
            "one_out_inferer_values":[{"worker":"allo1a","value":"0.3"}]}}},
       {"@type":"/emissions.v1.MsgInsertBulkWorkerPayload","sender":"allo1w",
        "topic_id":"7","nonce":{"block_height":"97"},
        "worker_data_bundles":[
          {"worker":"allo1w","topic_id":"7","nonce":{"block_height":"97"},
           "inference_forecasts_bundle":{
             "inference":{"topic_id":"7","block_height":"97","inferer":"allo1w",
                          "value":"10.5","extra_data":"","proof":""}}},
          {"worker":"allo1x","topic_id":"7","nonce":{"block_height":"97"},
           "inference_forecasts_bundle":{
             "inference":{"topic_id":"7","block_height":"97","inferer":"allo1x",
                          "value":"11.5","extra_data":"","proof":""}}}]}]}}"""
      .replaceAll("\n\\s*", "")

  private lazy val blocks: DataFrame =
    Seq((100L, blockJson)).toDF("height", "block_json")
  private lazy val txs: DataFrame =
    Seq((100L, txJson)).toDF("height", "tx_json")
  private lazy val results: DataFrame =
    Seq((100L, resultsJson)).toDF("height", "results_json")

  test("blockInfo flattens the header") {
    val rows = Ingest.blockInfo(blocks).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getAs[String]("chain_id") === "testchain-1")
    assert(r.getAs[String]("proposer_address") === "P1")
    assert(r.getAs[java.sql.Timestamp]("block_time") != null)
  }

  test("block json drives the full block->tx->message lineage") {
    // a block whose data.txs carries the PRE-DECODED tx JSON (the landing
    // contract), plus one still-encoded base64 entry that must null-route
    val esc = txJson.replace("\\", "\\\\").replace("\"", "\\\"")
    val blockWithTxs =
      s"""{"header":{"chain_id":"testchain-1","height":"100","time":"2024-05-01T10:00:00Z"},
          "data":{"txs":["$esc","dGVzdA=="]}}""".replaceAll("\n\\s*", "")
    val b = Seq((100L, blockWithTxs)).toDF("height", "block_json")
    val rows = Ingest.messagesFromBlocks(b).collect()
    assert(rows.length === 3, "three messages from the decoded tx, none from base64")
    assert(rows.map(_.getAs[Long]("height")).forall(_ === 100L))
    assert(rows.map(_.getAs[String]("type")).toSet ===
      Set("/emissions.v3.MsgCreateNewTopic", "/cosmos.bank.v1beta1.MsgSend",
        "/emissions.v3.InsertWorkerPayloadRequest"))
  }

  test("messages explode with sender precedence and content hash") {
    val rows = Ingest.messages(txs).collect()
    assert(rows.length === 3)
    val senders = rows.map(r =>
      r.getAs[String]("type") -> r.getAs[String]("sender")).toMap
    assert(senders("/emissions.v3.MsgCreateNewTopic") === "allo1creator")
    assert(senders("/cosmos.bank.v1beta1.MsgSend") === "allo1from")
    assert(senders("/emissions.v3.InsertWorkerPayloadRequest") === "allo1w")
    assert(rows.map(_.getAs[Long]("hash")).distinct.length === 3)
  }

  test("event whitelist drops unknown types") {
    val ev = Ingest.events(results)
    assert(ev.count() === 6) // 5 block-level + 1 tx-level
    val routed = Routers.routeEvents(ev)
    assert(routed.count() === 5) // EventUnknownThing dropped
    val cats = routed.select("category").distinct().collect().map(_.getString(0)).toSet
    assert(cats === Set("score", "lastcommit", "tokenomics", "networkloss"))
  }

  test("scores zip-explode addresses with values, dropping invalid numerics") {
    val scores = Routers.scores(Ingest.events(results)).collect()
    assert(scores.length === 2) // "oops" dropped by the numeric guard
    val byAddr = scores.map(r =>
      r.getAs[String]("address") -> r.getAs[java.math.BigDecimal]("value")).toMap
    assert(byAddr("allo1a").doubleValue() === 0.25)
    assert(byAddr("allo1b").doubleValue() === -0.5)
    scores.foreach { r =>
      assert(r.getAs[Int]("topic_id") === 7)
      assert(r.getAs[String]("type") === "inferer")
      assert(r.getAs[Long]("height") === 99L)
    }
  }

  test("actorLastCommit keeps only the newest commit per (topic, role)") {
    val lc = Routers.actorLastCommit(Ingest.events(results)).collect()
    assert(lc.length === 1) // two worker commits for topic 7 -> latest wins
    assert(lc(0).getAs[Long]("height_tx") === 101L)
    assert(lc(0).getAs[Long]("height") === 100L)
    assert(lc(0).getAs[Boolean]("is_worker"))
  }

  test("network loss bundle explodes typed value lists") {
    val losses = Routers.networkLosses(Ingest.events(results))
    assert(losses.count() === 1)
    val l = losses.collect()(0)
    assert(l.getAs[String]("naive_value") === "0.9")
    val bv = Routers.bundleValues(losses).collect()
    assert(bv.length === 3) // 2 inferer + 1 forecaster
    assert(bv.map(_.getAs[String]("reputer_value_type")).toSet ===
      Set("InfererValues", "ForecasterValues"))
  }

  test("tokenomics parses decimals at 18-digit scale") {
    val t = Routers.tokenomics(Ingest.events(results)).collect()(0)
    assert(t.getAs[java.math.BigDecimal]("staked_amount").doubleValue() === 1000.5)
    assert(t.getAs[java.math.BigDecimal]("circulating_supply").scale() === 18)
  }

  test("message routing: topics, transfers, inferences, forecasts") {
    val msgs = Ingest.messages(txs)
    val topics = Routers.topics(msgs).collect()
    assert(topics.length === 1 && topics(0).getAs[Int]("id") === 7)
    val transfers = Routers.transfers(msgs).collect()
    assert(transfers.length === 1)
    assert(transfers(0).getAs[String]("amount") === "5000")
    assert(transfers(0).getAs[String]("denom") === "uallo")
    val inf = Routers.inferences(msgs).collect()
    assert(inf.length === 1 && inf(0).getAs[String]("value") === "123.45")
    assert(inf(0).getAs[Long]("nonce_block_height") === 99L)
    val fc = Routers.forecasts(msgs)
    assert(fc.count() === 1)
    val fv = Routers.forecastValues(fc).collect()
    assert(fv.length === 2)
    assert(fv.map(_.getAs[String]("inferer")).toSet === Set("allo1a", "allo1b"))
  }

  test("topic ids derive sequentially from chain order when the payload carries none") {
    // the chain assigns sequential ids at creation; a landing zone without
    // pre-enrichment must still get deterministic ids in (height, hash) order
    def create(h: Long, meta: String): (Long, String) = (h,
      s"""{"body":{"messages":[{"@type":"/emissions.v3.MsgCreateNewTopic",
          "creator":"allo1x","metadata":"$meta"}]}}""".replaceAll("\n\\s*", ""))
    val msgs = Ingest.messages(
      Seq(create(300L, "m3"), create(100L, "m1"), create(200L, "m2"))
        .toDF("height", "tx_json"))
    val ts = Routers.topics(msgs).collect().sortBy(_.getAs[Int]("id"))
    assert(ts.map(_.getAs[Int]("id")).toSeq === Seq(1, 2, 3))
    assert(ts.map(_.getAs[String]("metadata")).toSeq === Seq("m1", "m2", "m3"),
      "ids must follow chain (height) order, not input order")
    // incremental catch-up: the caller passes the table's next id so a
    // later batch continues the sequence instead of restarting at 1
    val t2 = Routers.topics(msgs, nextTopicId = 4L).collect().sortBy(_.getAs[Int]("id"))
    assert(t2.map(_.getAs[Int]("id")).toSeq === Seq(4, 5, 6))
  }

  test("reputer payloads normalize across single and bulk shapes") {
    val msgs = Ingest.messages(Seq((101L, txJson2)).toDF("height", "tx_json"))
    val bundles = Routers.reputerBundles(msgs)
    val b = bundles.collect()
    assert(b.length === 1)
    assert(b(0).getAs[String]("pubkey") === "PK1")
    assert(b(0).getAs[Long]("reputer_nonce_block_height") === 99L)
    assert(b(0).getAs[Long]("worker_nonce_block_height") === 98L)
    assert(b(0).getAs[String]("combined_value") === "0.88")
    val bv = Routers.reputerBundleValues(bundles).collect()
    assert(bv.length === 3) // 2 inferer + 1 one-out-inferer
    assert(bv.map(_.getAs[String]("reputer_value_type")).toSet ===
      Set("InfererValues", "OneOutInfererValues"))
  }

  test("bulk worker payloads explode into per-bundle inferences") {
    val msgs = Ingest.messages(Seq((101L, txJson2)).toDF("height", "tx_json"))
    val inf = Routers.inferences(msgs).collect()
    assert(inf.length === 2)
    assert(inf.map(_.getAs[String]("inferer")).toSet === Set("allo1w", "allo1x"))
    inf.foreach { r =>
      assert(r.getAs[Long]("nonce_block_height") === 97L)
      assert(r.getAs[Int]("topic_id") === 7)
    }
  }

  test("consensus params flatten block/evidence/validator sections") {
    val json =
      """{"params":{"block":{"max_bytes":"22020096","max_gas":"-1"},
         "evidence":{"max_age_num_blocks":"100000","max_age_duration":"172800s","max_bytes":"1048576"},
         "validator":{"pub_key_types":["ed25519","secp256k1"]}}}""".replaceAll("\n\\s*", "")
    val r = Ingest.consensusParams(Seq(json).toDF("params_json")).collect()(0)
    assert(r.getAs[String]("max_bytes") === "22020096")
    assert(r.getAs[String]("max_age_duration") === "172800s")
    assert(r.getAs[String]("pub_key_types") === "ed25519,secp256k1")
  }

  test("address book collects senders, transfer parties and owners, deduped") {
    val addrs = Routers.addresses(Ingest.messages(txs)).collect()
      .map(_.getAs[String]("address")).toSet
    assert(addrs === Set("allo1creator", "allo1from", "allo1to", "allo1w"))
  }

  test("snapshot save/load round-trips and catch-up merges latest-wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val scores = Routers.scores(Ingest.events(results))
    Snapshot.save(Map("scores" -> scores), dir)
    val restored = Snapshot.load(spark, dir, Seq("scores"))("scores")
    assert(restored.count() === scores.count())
    // catch-up: overlapping replay resolves to the newer height_tx
    val fresh = scores.withColumn("height_tx", col("height_tx") + 1)
    val merged = Snapshot.restoreAndCatchUp(
      restored, fresh, Seq("topic_id", "type", "address", "height"), "height_tx")
    assert(merged.count() === scores.count())
    merged.collect().foreach(r => assert(r.getAs[Long]("height_tx") === 101L))
  }

  test("end-to-end flow: landing files -> block_info table, incremental catch-up") {
    val landing = java.nio.file.Files.createTempDirectory("graft-flow-landing").toString
    val table = java.nio.file.Files.createTempDirectory("graft-flow").toString + "/block_info"
    def block(h: Long): String = blockJson.replace("\"height\":\"100\"", s""""height":"$h"""")
    def writeRange(lo: Long, hi: Long): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(landing, s"blocks-$lo-$hi.jsonl"),
        (lo to hi).map(h => s"$h\t${block(h)}").mkString("\n").getBytes)

    writeRange(100, 102)
    assert(IndexerFlow.runBatch(spark, landing, table) === 3)
    assert(graft.sinks.ParquetMergeSink.read(spark, table).count() === 3)
    // re-run with no new data: nothing ingested, table unchanged
    assert(IndexerFlow.runBatch(spark, landing, table) === 0)
    // new ranged file arrives: only the delta is ingested
    writeRange(103, 104)
    assert(IndexerFlow.runBatch(spark, landing, table) === 2)
    val heights = graft.sinks.ParquetMergeSink.read(spark, table).select("height").collect().map(_.getLong(0)).sorted
    assert(heights.toSeq === (100L to 104L))
    // the landing zone can also be FED by the source's own write path
    // (e.g. an upstream Spark job republishing an RPC dump): the flow
    // must pick the published delta up exactly like hand-written files
    Seq((105L, block(105L))).toDF("height", "block_json")
      .write.format("graft.sources.BlockJsonSource").mode("append").save(landing)
    assert(IndexerFlow.runBatch(spark, landing, table) === 1)
    assert(graft.sinks.ParquetMergeSink.read(spark, table).count() === 6)
  }

  test("partitioned flow: ingest appends plain day dirs, maintenance " +
      "absorbs them atomically, re-runs are no-ops") {
    import graft.sinks.{ManifestCommit, TableMaintenance}
    val landing = java.nio.file.Files.createTempDirectory("graft-pflow-landing").toString
    val table = java.nio.file.Files.createTempDirectory("graft-pflow").toString + "/facts"
    // two block days interleaved across heights (odd → day 1, even → day 2)
    def block(h: Long): String = blockJson
      .replace("\"height\":\"100\"", s""""height":"$h"""")
      .replace("2024-05-01", if (h % 2 == 1) "2024-05-01" else "2024-05-02")
    def writeRange(lo: Long, hi: Long): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(landing, s"blocks-$lo-$hi.jsonl"),
        (lo to hi).map(h => s"$h\t${block(h)}").mkString("\n").getBytes)
    def days(): Seq[String] =
      TableMaintenance.readPartitioned(spark, table)
        // partition-dir inference reads day back as DATE; canonicalize
        .select(col("day").cast("string"), col("height")).collect()
        .map(r => s"${r.getString(0)}:${r.getLong(1)}").sorted.toSeq
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // two ingest passes: plain day= dirs appear and strew (one file per
    // append per day), no manifest yet — the cheapest possible write
    writeRange(100, 102)
    assert(IndexerFlow.runBatchPartitioned(spark, landing, table) === 3)
    writeRange(103, 104)
    assert(IndexerFlow.runBatchPartitioned(spark, landing, table) === 2)
    assert(fs.exists(new org.apache.hadoop.fs.Path(table, "day=2024-05-01")))
    assert(ManifestCommit.latest(fs,
      new org.apache.hadoop.fs.Path(table)).isEmpty,
      "ingest must stay append-only plain — maintenance owns the manifest")
    val before = days()
    assert(before.size === 5 && before.count(_.startsWith("2024-05-01")) === 2)

    // maintenance absorbs both strewn plain day dirs in ONE manifest flip
    val rewritten = IndexerFlow.maintain(spark, table, targetBytes = 1L << 20)
    assert(rewritten.toSet === Set("day=2024-05-01", "day=2024-05-02"))
    assert(days() === before, "maintenance must not change visible rows")

    // catch-up re-run with no new data: no-op on both halves
    assert(IndexerFlow.runBatchPartitioned(spark, landing, table) === 0)
    assert(IndexerFlow.maintain(spark, table, targetBytes = 1L << 20) === Seq.empty,
      "re-running maintenance on a quiet table must rewrite nothing")
    assert(days() === before)

    // late data lands plain into the already-compacted days: visible
    // immediately, folded into the managed generations by the NEXT pass
    writeRange(105, 106)
    assert(IndexerFlow.runBatchPartitioned(spark, landing, table) === 2)
    assert(days().size === 7)
    val rewritten2 = IndexerFlow.maintain(spark, table, targetBytes = 1L << 20)
    assert(rewritten2.toSet === Set("day=2024-05-01", "day=2024-05-02"),
      s"late-data days must fold into their generations, got $rewritten2")
    assert(days().size === 7)
    assert(IndexerFlow.runBatchPartitioned(spark, landing, table) === 0)
    assert(IndexerFlow.maintain(spark, table, targetBytes = 1L << 20) === Seq.empty)
  }

  test("tx decode seam: codec runs per partition, JSON passes, base64 decodes, corrupt drops") {
    val jsonTx = """{"body":{"messages":[{"@type":"/t.M","creator":"allo1x","v":"1"}]}}"""
    val b64 = java.util.Base64.getEncoder.encodeToString("payload-bytes".getBytes)
    val txs = Seq(
      (1L, jsonTx),          // pre-decoded landing: must pass through verbatim
      (2L, b64),             // encoded: the stub codec decodes deterministically
      (3L, "!!!not-base64")  // corrupt: dropped, never a failed task
    ).toDF("height", "tx_json")

    // default codec = the pre-decoded-landing contract
    val passthrough = Ingest.decodeTxs(txs)
    assert(passthrough.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, jsonTx)))

    // stub chain codec: full lineage flows for BOTH transport shapes
    val decoded = Ingest.decodeTxs(txs,
      classOf[Ingest.StubBase64Decoder].getName)
    val rows = decoded.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(1L) === jsonTx, "already-JSON txs must pass through unchanged")
    assert(rows(2L).contains("\"n_bytes\":13") &&
      rows(2L).contains("/graft.stub.DecodedTx"),
      s"stub decode must be deterministic over the payload bytes: ${rows(2L)}")
    // …and the decoded envelopes route through the message explode
    val msgs = Ingest.messages(decoded).collect()
    assert(msgs.map(_.getAs[String]("type")).sorted.toSeq ===
      Seq("/graft.stub.DecodedTx", "/t.M"))
    // replay determinism: decoding twice yields identical rows
    val again = Ingest.decodeTxs(txs, classOf[Ingest.StubBase64Decoder].getName)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(again === rows)
  }

  test("upsert operators are idempotent under replay") {
    val df = Seq((1, "a", 10L), (1, "a", 20L), (2, "b", 5L)).toDF("k", "v", "ver")
    val first = Upsert.firstWins(df, Seq("k"), col("ver")).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(first === Map(1 -> 10L, 2 -> 5L))
    val latest = Upsert.latestWins(df, Seq("k"), col("ver")).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(latest === Map(1 -> 20L, 2 -> 5L))
    // replay: processing the union of old + new yields the same table
    val replayed = Upsert.latestWins(df.union(df), Seq("k"), col("ver")).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(replayed === latest)
  }

  test("upsert aggregate is row-identical to the window-argmax it replaced") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    // Skewed synthetic: one hot key carrying most of the rows, version ties
    // broken by a precedence column — the exact merge-sink shape.
    val rows = (1 to 400).map { i =>
      val k = if (i % 4 == 0) i / 4 else 0 // key 0 is hot (300 of 400 rows)
      (k, s"payload_$i", (i % 13).toLong, i % 2)
    }
    val df = rows.toDF("k", "v", "ver", "pref").repartition(8)

    val viaAgg = Upsert.latestWins(df, Seq("k"), col("ver"), col("pref"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ver").desc, col("pref").desc, col("v").desc)
    val viaWindow = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    // (ver, pref) is not a total order here, so compare the decided part
    // (key→winning version+pref) exactly — what ON CONFLICT semantics pin.
    def decided(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "ver", "pref").collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(decided(viaAgg) === decided(viaWindow))

    // And with a total order (unique v tie-break) the full rows must match.
    val viaAggTotal = Upsert.latestWins(df, Seq("k"), col("ver"),
      col("pref"), col("v"))
    assert(viaAggTotal.collect().map(_.toSeq).toSet ===
      viaWindow.collect().map(_.toSeq).toSet)

    // Plan shape: a partial max_by aggregate must run BELOW the exchange
    // (map-side combine), the property the window version lacked.
    viaAgg.collect()
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("partial_maxby")
      || plan.toLowerCase.contains("partial_max_by"),
      s"expected a partial max_by below the exchange, got:\n$plan")
  }
}
