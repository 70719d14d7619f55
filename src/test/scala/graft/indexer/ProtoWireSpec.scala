package graft.indexer

import graft.SparkSpec

/** Wire-format tx decode, end to end through the message lineage: a
  * hand-encoded cosmos TxRaw fixture (the byte layout is the public
  * protobuf encoding spec) must decode in-JVM to the exact JSON shape
  * `Ingest.messages` consumes — the seam the reference fills by shelling
  * out to the chain binary (execute.go:82-109).
  */
class ProtoWireSpec extends SparkSpec {
  import spark.implicits._

  // --- tiny test-side wire WRITER (spec-defined byte layout) ---
  private def varint(v: Long): Array[Byte] = {
    var x = v
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while ((x & ~0x7fL) != 0L) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += (x & 0x7f).toByte
    out.toArray
  }
  private def tag(no: Int, wt: Int): Array[Byte] = varint((no.toLong << 3) | wt)
  private def lenField(no: Int, payload: Array[Byte]): Array[Byte] =
    tag(no, 2) ++ varint(payload.length.toLong) ++ payload
  private def strField(no: Int, s: String): Array[Byte] =
    lenField(no, s.getBytes("UTF-8"))
  private def uintField(no: Int, v: Long): Array[Byte] = tag(no, 0) ++ varint(v)
  private def anyMsg(typeUrl: String, value: Array[Byte]): Array[Byte] =
    strField(1, typeUrl) ++ lenField(2, value)
  private def txRaw(msgs: Array[Byte]*): String = {
    val body = msgs.map(lenField(1, _)).fold(Array.empty[Byte])(_ ++ _) ++
      strField(2, "fixture-memo")
    java.util.Base64.getEncoder.encodeToString(lenField(1, body))
  }

  // registered type: cosmos bank MsgSend (seeded in ProtoTx)
  private val msgSend =
    strField(1, "addr_sender") ++ strField(2, "addr_receiver") ++
      lenField(3, strField(1, "utok") ++ strField(2, "42"))
  // unregistered custom type: creator string + varint nonce
  private val msgCustom = strField(1, "creator_x") ++ uintField(2, 7L)

  private val fixtureTx = txRaw(
    anyMsg("/cosmos.bank.v1beta1.MsgSend", msgSend),
    anyMsg("/graft.test.MsgCustom", msgCustom))

  test("TxRaw decodes through the registry and messages() extracts lineage") {
    val txs = Seq((100L, fixtureTx)).toDF("height", "tx_json")
    val decoded = Ingest.decodeTxs(txs, classOf[ProtoTxDecoder].getName)
    val rows = Ingest.messages(decoded)
      .orderBy("type").collect()
    assert(rows.length === 2)
    val send = rows.find(_.getAs[String]("type")
      .endsWith("MsgSend")).get
    assert(send.getAs[String]("sender") === "addr_sender",
      "from_address must flow through the sender precedence")
    assert(send.getAs[String]("data").contains("\"to_address\":\"addr_receiver\""))
    // (variant to_json alphabetizes object keys)
    assert(send.getAs[String]("data")
      .contains("\"amount\":[{\"amount\":\"42\",\"denom\":\"utok\"}]"),
      "repeated Coin must decode as an array under its schema")
    // unregistered type: @type present, payload decoded STRUCTURALLY
    val custom = rows.find(_.getAs[String]("type")
      .endsWith("MsgCustom")).get
    assert(custom.getAs[String]("data").contains("\"1\":\"creator_x\""))
    assert(custom.getAs[String]("data").contains("\"2\":7"))
    assert(custom.getAs[String]("sender") == null,
      "a structural decode has no named creator/sender field")
  }

  test("registering a schema upgrades an unknown type to named fields") {
    import ProtoWire._
    ProtoTx.register("/graft.test.MsgCustom", Schema(Map(
      1 -> Field("creator", PString),
      2 -> Field("nonce", PUInt))))
    val txs = Seq((101L, fixtureTx)).toDF("height", "tx_json")
    val rows = Ingest.messages(
      Ingest.decodeTxs(txs, classOf[ProtoTxDecoder].getName)).collect()
    val custom = rows.find(_.getAs[String]("type")
      .endsWith("MsgCustom")).get
    assert(custom.getAs[String]("sender") === "creator_x",
      "with the schema registered, creator flows into the sender column")
    assert(custom.getAs[String]("data").contains("\"nonce\":7"))
  }

  test("corrupt frames null-route instead of failing the task") {
    val bad = Seq(
      (1L, "not-base64!!"),
      (2L, java.util.Base64.getEncoder.encodeToString(
        Array[Byte](0x0a, 0x7f))), // length runs past the frame
      (3L, """{"body":{"messages":[]}}"""), // pre-decoded JSON passes through
      (4L, fixtureTx))
      .toDF("height", "tx_json")
    val out = Ingest.decodeTxs(bad, classOf[ProtoTxDecoder].getName)
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(3L, 4L),
      "JSON passthrough + valid frame survive; corrupt frames drop")
  }

  test("wire reader survives unknown fields and skips all wire types") {
    import ProtoWire._
    // unknown fixed64 (wt 1), fixed32 (wt 5), varint and len-delim fields
    // around one known field — the spec's required skip behavior
    val payload =
      (tag(9, 1) ++ Array.fill(8)(0x11.toByte)) ++
      (tag(10, 5) ++ Array.fill(4)(0x22.toByte)) ++
      uintField(11, 999L) ++
      strField(12, "ignored") ++
      strField(1, "kept")
    val json = decode(payload, 0, payload.length,
      Schema(Map(1 -> Field("kept_field", PString))))
    assert(json === """{"kept_field":"kept"}""")
  }
}
