package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MinKLongsSpec extends SparkSpec {

  test("min_k_longs equals sort-and-take per group") {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), xxhash64(col("event_id")).as("h"))
    val viaAgg = e.groupBy(col("user_id"))
      .agg(MinKLongs(col("h"), 5).as("mins"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getSeq[Long](1).toSeq)
      .toMap
    val expected = e.collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rows) => u -> rows.map(_.getAs[Long]("h")).sorted.take(5).toSeq }
    assert(viaAgg === expected)
  }

  test("the sketch partial-aggregates before the shuffle") {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), xxhash64(col("event_id")).as("h"))
    val df = e.groupBy(col("user_id")).agg(MinKLongs(col("h"), 3).as("mins"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a partial
    // phase below the exchange — the map-side k-element reduction
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    assert(exIdx > 0 && plan.indexOf("partial_min_k_longs", exIdx) > 0,
      s"expected a partial aggregate below the exchange:\n$plan")
  }

  test("merge is order-insensitive: results identical under repartitioning") {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), xxhash64(col("event_id")).as("h"))
    def run(parts: Int) =
      e.repartition(parts).groupBy(col("user_id"))
        .agg(MinKLongs(col("h"), 7).as("mins"))
        .orderBy("user_id").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getSeq[Long](1).toSeq)).toSeq
    assert(run(2) === run(17))
  }
}
