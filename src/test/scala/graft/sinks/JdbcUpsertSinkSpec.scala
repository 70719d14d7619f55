package graft.sinks

import java.sql.DriverManager

import graft.SparkSpec

class JdbcUpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def tableRows(table: String): Map[Long, (String, Long)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT k, v, ver FROM $table")
      val out = scala.collection.mutable.Map.empty[Long, (String, Long)]
      while (rs.next()) out += rs.getLong(1) -> (rs.getString(2), rs.getLong(3))
      out.toMap
    } finally conn.close()
  }

  test("jdbc upsert is idempotent latest-wins with incoming winning ties") {
    val t = "upsert_t1"
    val b1 = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "ver")
    JdbcUpsertSink.upsert(b1, url, t, Seq("k"), "ver")
    assert(tableRows(t) === Map(1L -> ("a", 10L), 2L -> ("b", 10L)))

    // newer version wins; replay is a no-op
    val b2 = Seq((1L, "a2", 20L), (3L, "c", 5L)).toDF("k", "v", "ver")
    JdbcUpsertSink.upsert(b2, url, t, Seq("k"), "ver")
    JdbcUpsertSink.upsert(b2, url, t, Seq("k"), "ver")
    assert(tableRows(t) === Map(1L -> ("a2", 20L), 2L -> ("b", 10L), 3L -> ("c", 5L)))

    // stale version must not overwrite
    JdbcUpsertSink.upsert(Seq((1L, "stale", 1L)).toDF("k", "v", "ver"), url, t, Seq("k"), "ver")
    assert(tableRows(t)(1L) === ("a2", 20L))

    // equal version, changed content: incoming wins (ON CONFLICT DO UPDATE)
    JdbcUpsertSink.upsert(Seq((1L, "rewrite", 20L)).toDF("k", "v", "ver"), url, t, Seq("k"), "ver")
    assert(tableRows(t)(1L) === ("rewrite", 20L))
  }

  test("all-key rows degrade to insert-ignore (no malformed UPDATE)") {
    val t = "upsert_allkey"
    // every column is part of the key: there is nothing to UPDATE, so the
    // upsert must become insert-ignore instead of preparing "UPDATE t SET "
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    JdbcUpsertSink.upsert(b1, url, t, Seq("k", "v"), "k")
    // replay + an overlapping batch: existing keys ignored, new ones land
    JdbcUpsertSink.upsert(Seq((1L, "a"), (3L, "c")).toDF("k", "v"), url, t, Seq("k", "v"), "k")
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT k, v FROM $t ORDER BY k")
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      while (rs.next()) got += ((rs.getLong(1), rs.getString(2)))
      assert(got.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally conn.close()
  }

  test("streamed micro-batches sink to jdbc through foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = "upsert_stream"
    val input = MemoryStream[String]
    def ev(height: Long, tpe: String): String =
      s"""{"height":$height,"ts":"2024-05-01T10:00:00Z","type":"$tpe","attributes":[{"key":"k","value":"1"}]}"""
    val dup = ev(100, "t.A")
    input.addData(dup, dup, ev(100, "t.B"), ev(101, "t.A"))

    val q = graft.streaming.EventStream.start(
      graft.streaming.EventStream.parse(input.toDF()),
      (batch, _) =>
        JdbcUpsertSink.upsert(
          batch.select("height", "type", "hash"), url, t, Seq("height", "type"), "height"))
    q.awaitTermination(60000)

    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT height, type FROM $t ORDER BY height, type")
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      while (rs.next()) got += ((rs.getLong(1), rs.getString(2)))
      assert(got.toSeq === Seq((100L, "t.A"), (100L, "t.B"), (101L, "t.A")))
    } finally conn.close()
  }
}
