package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IncrementalAggSpec extends SparkSpec {

  private val keys = Seq("day", "event_type")

  private def ev: DataFrame =
    Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("value"), col("event_id"))

  private def stateSet(df: DataFrame): Set[(String, String, Long, Long, Long, Long)] =
    df.select(col("day"), col("event_type"), col("n_events"), col("cents"),
        col("min_cents"), col("max_cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet

  test("batch-folded state equals the one-shot aggregate, any split, any order") {
    val oneShot = stateSet(IncrementalAgg.partial(ev, keys, "value"))
    // uneven split (by id mod 4) folded forward
    val slices = (0 until 4).map(i => ev.filter(pmod(col("event_id"), lit(4)) === i))
    val folded = slices.tail.foldLeft(IncrementalAgg.partial(slices.head, keys, "value")) {
      (st, b) => IncrementalAgg.merge(st, IncrementalAgg.partial(b, keys, "value"), keys)
    }
    assert(stateSet(folded) === oneShot)
    // reversed batch order — monoid merge must not care
    val foldedRev = slices.reverse.tail.foldLeft(
      IncrementalAgg.partial(slices.reverse.head, keys, "value")) {
      (st, b) => IncrementalAgg.merge(st, IncrementalAgg.partial(b, keys, "value"), keys)
    }
    assert(stateSet(foldedRev) === oneShot)
  }

  test("an empty batch is the merge identity") {
    val st = IncrementalAgg.partial(ev, keys, "value")
    val empty = IncrementalAgg.partial(ev.filter(lit(false)), keys, "value")
    assert(stateSet(IncrementalAgg.merge(st, empty, keys)) === stateSet(st))
  }

  test("foreachBatch advance converges the state table to the one-shot aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-incagg").toString
    val statePath = base + "/state"
    val rows = ev.select("day", "event_type", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val input = MemoryStream[(String, String, Double)]
    val q = input.toDF().toDF("day", "event_type", "value")
      .writeStream
      .outputMode("append")
      // the checkpoint is what makes each restart resume AFTER the data it
      // already folded — without it every AvailableNow run would replay
      // from offset 0 and the additive state would double-count
      .option("checkpointLocation", base + "/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        IncrementalAgg.advance(spark, statePath, batch, keys, "value",
          batchId = Some(batchId))
      }
    // three micro-batches, each folded into the parquet state table
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { g =>
      input.addData(g.toSeq)
      val run = q.start()
      run.awaitTermination()
    }
    assert(stateSet(IncrementalAgg.readState(spark, statePath).get) ===
      stateSet(IncrementalAgg.partial(ev, keys, "value")))
  }

  test("a crashed advance (generation written, manifest not) is invisible; replay converges") {
    val base = java.nio.file.Files.createTempDirectory("graft-incagg-rec").toString
    val statePath = base + "/state"
    val half = ev.filter(pmod(col("event_id"), lit(2)) === 0)
    val rest = ev.filter(pmod(col("event_id"), lit(2)) === 1)
    IncrementalAgg.advance(spark, statePath, half, keys, "value")
    // simulate the crash window: a later advance wrote its generation in
    // full but died before the manifest flip — the committed state must
    // still be the first batch's fold, and the orphan must not leak in
    IncrementalAgg.partial(rest, keys, "value")
      .write.parquet(statePath + "/_g99-deadbeef")
    assert(stateSet(IncrementalAgg.readState(spark, statePath).get) ===
      stateSet(IncrementalAgg.partial(half, keys, "value")),
      "an uncommitted generation must be invisible to readers")
    // the at-least-once replay of the "crashed" batch now converges
    IncrementalAgg.advance(spark, statePath, rest, keys, "value")
    assert(stateSet(IncrementalAgg.readState(spark, statePath).get) ===
      stateSet(IncrementalAgg.partial(ev, keys, "value")),
      "replaying the crashed batch must fold it exactly once")
  }

  test("a replayed batchId is skipped: state and progress commit together") {
    val base = java.nio.file.Files.createTempDirectory("graft-incagg-once").toString
    val statePath = base + "/state"
    val half = ev.filter(pmod(col("event_id"), lit(2)) === 0)
    val rest = ev.filter(pmod(col("event_id"), lit(2)) === 1)
    IncrementalAgg.advance(spark, statePath, half, keys, "value", batchId = Some(0L))
    // at-least-once delivery replays batch 0: the sink itself must
    // dedupe it (the documented exactly-once contract), not the caller
    IncrementalAgg.advance(spark, statePath, half, keys, "value", batchId = Some(0L))
    assert(stateSet(IncrementalAgg.readState(spark, statePath).get) ===
      stateSet(IncrementalAgg.partial(half, keys, "value")),
      "replayed batch must not double-count")
    IncrementalAgg.advance(spark, statePath, rest, keys, "value", batchId = Some(1L))
    IncrementalAgg.advance(spark, statePath, rest, keys, "value", batchId = Some(1L))
    assert(stateSet(IncrementalAgg.readState(spark, statePath).get) ===
      stateSet(IncrementalAgg.partial(ev, keys, "value")))
  }

  test("a pre-protocol plain state table migrates instead of silently resetting") {
    val base = java.nio.file.Files.createTempDirectory("graft-incagg-legacy").toString
    val statePath = base + "/state"
    val half = ev.filter(pmod(col("event_id"), lit(2)) === 0)
    val rest = ev.filter(pmod(col("event_id"), lit(2)) === 1)
    // the OLD layout: state written as plain parquet at the root
    IncrementalAgg.partial(half, keys, "value")
      .write.parquet(statePath)
    // first post-upgrade advance must FOLD INTO the legacy state — a
    // reset-to-one-batch would drop half the history
    IncrementalAgg.advance(spark, statePath, rest, keys, "value")
    assert(stateSet(IncrementalAgg.readState(spark, statePath).get) ===
      stateSet(IncrementalAgg.partial(ev, keys, "value")),
      "legacy plain state was not carried into the managed fold")
    // the plain debris survives the migrating commit (legacy-reader
    // grace) and is reclaimed by the following advance
    val empty = ev.filter(lit(false))
    IncrementalAgg.advance(spark, statePath, empty, keys, "value")
    val plainLeft = new java.io.File(statePath).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(plainLeft === 0, "migration debris must be reclaimed by the next advance")
    assert(stateSet(IncrementalAgg.readState(spark, statePath).get) ===
      stateSet(IncrementalAgg.partial(ev, keys, "value")))
  }

  test("served view derives avg from exact carried monoids") {
    val served = IncrementalAgg.serve(
      IncrementalAgg.partial(ev, keys, "value"), keys).collect()
    served.foreach { r =>
      val n = r.getAs[Long]("n_events")
      assert(n > 0)
      assert(r.getAs[Double]("min_value") <= r.getAs[Double]("max_value"))
      val avg = r.getAs[Double]("avg_value_floor")
      assert(avg >= r.getAs[Double]("min_value") - 0.01 &&
        avg <= r.getAs[Double]("max_value") + 0.01)
    }
  }
}
