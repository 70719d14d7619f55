package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, StreamingQuery, Trigger}

import graft.indexer.{Model, Upsert}

/** Output row of [[EventStream.runningTypeTotals]]. */
case class TypeTotal(eventType: String, batchCount: Long, runningTotal: Long)

/** The reference's pump loop (main.go:221-253: poll for new heights,
  * process, sleep, repeat) as Structured Streaming.
  *
  * A stream of raw event JSON (in production: a file-source landing zone or
  * Kafka of block_results) is parsed with the same schemas the batch path
  * uses, aggregated under a watermark, and sunk through `foreachBatch`
  * with first-wins dedup — making the sink idempotent under replay exactly
  * like the reference's ON CONFLICT DO NOTHING inserts (db.go:744-747).
  * State is bounded by the watermark (event-time) and the conflict keys.
  */
object EventStream {

  /** Raw JSON lines → typed event rows. Input column: `value` (string). */
  def parse(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("height", LongType),
      StructField("ts", StringType),
      StructField("type", StringType),
      StructField("attributes", Model.attributeType)))
    raw.select(from_json(col("value"), schema).as("e"))
      .select(
        col("e.height").as("height"),
        to_timestamp(col("e.ts")).as("ts"),
        col("e.type").as("type"),
        col("e.attributes").as("attributes"),
        xxhash64(to_json(col("e.attributes"))).as("hash"))
      .filter(col("type").isNotNull)
  }

  /** Per-minute, per-type counts with a 10-minute watermark: late events
    * beyond the watermark are dropped, so aggregation state is bounded.
    */
  def minuteTypeCounts(parsed: DataFrame): DataFrame =
    parsed
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("type"))
      .agg(count(lit(1)).as("n_events"), sum(col("height")).as("height_sum"))
      .select(
        col("window.start").as("minute_start"),
        col("type"), col("n_events"), col("height_sum"))

  /** Streaming-native insert-ignore: duplicates on the events conflict key
    * are dropped across micro-batches, with state bounded by the watermark
    * (`dropDuplicatesWithinWatermark` evicts keys once their event time
    * passes) — the unbounded-state-free version of the foreachBatch dedup.
    */
  def dedupedStream(parsed: DataFrame): DataFrame =
    parsed
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("height", "type", "hash")

  /** Custom streaming state: a per-type running total maintained with
    * `mapGroupsWithState` — the shape for state the built-in windowed
    * aggregations can't express (counters, EMAs, dedup caches keyed by
    * entity). State is one long per key, partitioned by key.
    */
  def runningTypeTotals(parsed: DataFrame): Dataset[TypeTotal] = {
    val byType = parsed.select(col("type")).as(Encoders.STRING)
    byType
      .groupByKey(identity)(Encoders.STRING)
      .mapGroupsWithState[Long, TypeTotal](GroupStateTimeout.NoTimeout) {
        case (tpe, rows, state) =>
          val add = rows.size.toLong
          val total = state.getOption.getOrElse(0L) + add
          state.update(total)
          TypeTotal(tpe, add, total)
      }(Encoders.scalaLong, Encoders.product[TypeTotal])
  }

  /** Run the stream through an idempotent micro-batch sink: each batch is
    * first-wins-deduplicated on (height, type, hash) — the events-table
    * conflict key (db.go:747) — before `merge` sees it. `merge` is the
    * storage adapter (Delta MERGE / JDBC upsert in production; a test
    * harness in specs).
    */
  def start(parsed: DataFrame, merge: (DataFrame, Long) => Unit): StreamingQuery =
    parsed.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val deduped = Upsert.firstWins(batch, Seq("height", "type", "hash"), col("hash"))
        merge(deduped, id)
      }
      .start()
}
