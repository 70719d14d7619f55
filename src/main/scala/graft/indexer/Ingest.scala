package graft.indexer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw chain JSON → normalized frames.
  *
  * The reference's per-height worker loop (main.go:255-312: fetch block,
  * write block_info, decode txs, insert messages, fetch block_results,
  * insert events) becomes three declarative transforms over a DataFrame of
  * `(height, raw_json)` rows. At scale the input is a partitioned landing
  * zone of raw block dumps; each transform is a single pass with native
  * `from_json` — no per-row RPC, no driver-side loops.
  */
object Ingest {

  /** Blocks: `(height, block_json)` → block_info (db.go:178-201 columns). */
  def blockInfo(blocks: DataFrame): DataFrame = {
    val b = from_json(col("block_json"), Model.blockSchema).as("q")
    blocks.select(col("height"), b).select(
      col("height"),
      col("q.header.last_block_id.hash").as("block_hash"),
      col("q.header.last_block_id.part_set_header.total").as("last_block_total_parts"),
      col("q.header.last_block_id.part_set_header.hash").as("last_block_part_set_header_hash"),
      col("q.header.version.block").as("block_version"),
      col("q.header.chain_id").as("chain_id"),
      to_timestamp(col("q.header.time")).as("block_time"),
      col("q.header.last_commit_hash").as("last_commit_hash"),
      col("q.header.data_hash").as("data_hash"),
      col("q.header.validators_hash").as("validators_hash"),
      col("q.header.next_validators_hash").as("next_validators_hash"),
      col("q.header.consensus_hash").as("consensus_hash"),
      col("q.header.app_hash").as("app_hash"),
      col("q.header.last_results_hash").as("last_results_hash"),
      col("q.header.evidence_hash").as("evidence_hash"),
      col("q.header.proposer_address").as("proposer_address"))
  }

  /** Block JSON → `(height, tx_json)`: explodes `data.txs`, closing the
    * block→tx→message lineage without a separate tx input frame.
    *
    * CONTRACT — txs must land PRE-DECODED to JSON. The reference shells
    * out to the chain CLI to decode base64 protobuf txs (execute.go:82,
    * main.go:271-284); no chain binary exists in a Spark cluster, so that
    * decode belongs upstream, at landing time. Entries that are not JSON
    * objects (e.g. still-encoded base64) flow through and are null-routed
    * by [[messages]] (`try_variant_get` yields no messages for them) —
    * they never fail the pipeline.
    */
  def txsFromBlocks(blocks: DataFrame): DataFrame =
    blocks
      .select(col("height"), from_json(col("block_json"), Model.blockSchema).as("q"))
      .select(col("height"), explode(col("q.data.txs")).as("tx_json"))

  /** Full lineage: block JSON → exploded txs → one row per message. */
  def messagesFromBlocks(blocks: DataFrame): DataFrame =
    messages(txsFromBlocks(blocks))

  /** Per-tx decode contract: raw tx entry (base64 protobuf on a real
    * chain) → decoded JSON, or None for undecodable input. Implemented
    * by a pluggable codec constructed BY NAME per partition (a no-arg
    * class; nothing is serialized), so a real deployment drops in a
    * protobuf-descriptor or CLI-backed decoder and nothing else changes.
    */
  trait TxDecoder {
    def decode(raw: String): Option[String]
  }

  /** Already-JSON entries pass through; everything else is dropped —
    * the pre-decoded-landing contract of [[txsFromBlocks]] as a codec.
    */
  class JsonPassthroughDecoder extends TxDecoder {
    override def decode(raw: String): Option[String] = {
      val t = raw.trim
      if (t.startsWith("{")) Some(t) else None
    }
  }

  /** STUB chain codec — the sandbox stand-in for the reference's CLI
    * decode (execute.go:82-109, main.go:271-284; no chain binary exists
    * in a Spark cluster). JSON passes through; a valid base64 entry
    * decodes to a DETERMINISTIC envelope carrying the payload's length
    * and crc32 under a clearly-fake message type, so the full
    * block→tx→message lineage is exercisable end-to-end; corrupt
    * entries yield None (null-routed, never a failed task). The REAL
    * in-JVM codec behind the same two-line contract is
    * [[graft.indexer.ProtoTxDecoder]] (wire-format TxRaw/TxBody/Any
    * walk + schema registry); this stub stays as the dependency-free
    * envelope for harness tests that only need lineage shape.
    */
  class StubBase64Decoder extends TxDecoder {
    override def decode(raw: String): Option[String] = {
      val t = raw.trim
      if (t.startsWith("{")) Some(t)
      else {
        try {
          val bytes = java.util.Base64.getDecoder.decode(t)
          val crc = new java.util.zip.CRC32
          crc.update(bytes)
          Some(s"""{"body":{"messages":[{"@type":"/graft.stub.DecodedTx",""" +
            s""""n_bytes":${bytes.length},"crc32":"${crc.getValue}"}]}}""")
        } catch { case _: IllegalArgumentException => None }
      }
    }
  }

  /** The decode step of the reference's worker loop as a distributed
    * transform: `(height, tx_json)` rows run through the codec with
    * per-partition initialization (`mapPartitions` — one decoder
    * instance per task, the seam a descriptor-set or JNI codec needs
    * for its own expensive init). Undecodable entries are DROPPED here
    * rather than poisoning downstream parsing; [[messages]] would
    * null-route them anyway, so the two stages compose either way.
    */
  def decodeTxs(txs: DataFrame,
      decoderClass: String = classOf[JsonPassthroughDecoder].getName): DataFrame = {
    val spark = txs.sparkSession
    import spark.implicits._
    txs.select(col("height").cast("long"), col("tx_json").cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val dec = Class.forName(decoderClass).getDeclaredConstructor()
          .newInstance().asInstanceOf[TxDecoder]
        it.flatMap { case (h, raw) => dec.decode(raw).map(j => (h, j)) }
      }
      .toDF("height", "tx_json")
  }

  /** Decoded txs: `(height, tx_json)` → one row per message with type,
    * sender (creator|sender|from_address precedence, process_tx.go:48-57),
    * raw payload, and a content hash for insert-ignore dedup (db.go:573).
    *
    * Messages are heterogeneous (every `@type` has its own shape), so the
    * array is exploded as VariantType — Spark's native semi-structured
    * column — which keeps the full nested payload per message without
    * committing to a schema; per-type routers re-parse `data` with their
    * own schemas.
    */
  def messages(txs: DataFrame): DataFrame = {
    val msgs = txs.select(
      col("height"),
      // try_parse_json: a non-JSON entry (still-encoded base64, corrupt
      // landing line) contributes zero messages instead of failing the scan
      explode(try_variant_get(try_parse_json(col("tx_json")), "$.body.messages", "array<variant>"))
        .as("m"))
    msgs.select(
      col("height"),
      try_variant_get(col("m"), "$['@type']", "string").as("type"),
      coalesce(
        try_variant_get(col("m"), "$.creator", "string"),
        try_variant_get(col("m"), "$.sender", "string"),
        try_variant_get(col("m"), "$.from_address", "string")).as("sender"),
      to_json(col("m")).as("data"),
      xxhash64(to_json(col("m"))).as("hash"))
  }

  /** Consensus params: `(params_json)` → one flattened row per snapshot
    * (process_consensus.go:10-30, db.go:203-214 columns; pub_key_types
    * joined with commas as the reference does).
    */
  def consensusParams(params: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("params", StructType(Seq(
      StructField("block", StructType(Seq(
        StructField("max_bytes", StringType),
        StructField("max_gas", StringType)))),
      StructField("evidence", StructType(Seq(
        StructField("max_age_num_blocks", StringType),
        StructField("max_age_duration", StringType),
        StructField("max_bytes", StringType)))),
      StructField("validator", StructType(Seq(
        StructField("pub_key_types", ArrayType(StringType))))))))))
    params.select(from_json(col("params_json"), schema).as("p")).select(
      col("p.params.block.max_bytes").as("max_bytes"),
      col("p.params.block.max_gas").as("max_gas"),
      col("p.params.evidence.max_age_duration").as("max_age_duration"),
      col("p.params.evidence.max_age_num_blocks").as("max_age_num_blocks"),
      col("p.params.evidence.max_bytes").as("evidence_max_bytes"),
      concat_ws(",", col("p.params.validator.pub_key_types")).as("pub_key_types"))
  }

  /** Block results: `(height, results_json)` → one row per whitelisted
    * event, block-level and tx-level merged (process_events.go:119-145),
    * with attributes kept structured and the sender attribute lifted.
    */
  def events(results: DataFrame): DataFrame = {
    val r = results.select(
      col("height"),
      from_json(col("results_json"), Model.blockResultsSchema).as("br"))
    val blockEvents = r.select(col("height"),
      explode(col("br.finalize_block_events")).as("ev"))
    val txEvents = r.select(col("height"),
      explode(col("br.txs_results")).as("tx"))
      .select(col("height"), explode(col("tx.events")).as("ev"))
    val all = blockEvents.unionByName(txEvents)
    val attrsMap = map_from_entries(col("ev.attributes"))
    all.select(
      col("height"),
      col("ev.type").as("type"),
      element_at(split(col("ev.type"), "\\."), -1).as("base_type"),
      col("ev.attributes").as("attributes"),
      attrsMap.getItem("sender").as("sender"),
      xxhash64(to_json(col("ev.attributes"))).as("hash"))
  }
}
