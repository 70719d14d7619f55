package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TopKPerKeySpec extends SparkSpec {

  test("custom operator matches the window row_number idiom exactly") {
    val e = Tables.events(spark, sfDir)
    val viaWindow = e.withColumn("rank",
        row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))))
      .filter(col("rank") <= 3)
      .select("user_id", "event_id", "rank")
    val viaCustom = TopKPerKey.perKey(
        e, Seq(col("user_id")), Seq(col("value").desc, col("event_id")), 3)
      .select("user_id", "event_id", "rank")
    assert(viaCustom.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaCustom).count() === 0)
  }

  test("plan contains the custom exec node and a single hash exchange") {
    val e = Tables.events(spark, sfDir)
    val df = TopKPerKey.perKey(e, Seq(col("user_id")), Seq(col("value").desc), 2)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom node missing:\n$plan")
    assert(!plan.contains("Window"), "must not fall back to a window sort")
    assert(plan.contains("Exchange hashpartitioning"), "expects the single key shuffle")
    // two-phase: a map-side partial heap must sit BELOW the exchange so
    // each map partition forwards at most k rows per key into the shuffle
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    assert(plan.indexOf("TopKPerKey") < exIdx && plan.indexOf("TopKPerKey", exIdx) > 0,
      s"expected partial+final TopKPerKey around the exchange:\n$plan")
  }

  test("handles k larger than group sizes") {
    val e = Tables.events(spark, sfDir).filter(col("user_id") === 0)
    val n = e.count()
    val all = TopKPerKey.perKey(e, Seq(col("user_id")), Seq(col("event_id")), 10000)
    assert(all.count() === n)
    val ranks = all.select("rank").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq === (1 to n.toInt))
  }

  test("key-only filters push through the custom node to the scan") {
    val e = Tables.events(spark, sfDir)
    val topk = TopKPerKey.perKey(e, Seq(col("user_id")), Seq(col("value").desc), 3)
    // a filter on the grouping key, applied AFTER top-k, plus one on the
    // produced rank column that must NOT move
    val filtered = topk.filter(col("user_id") < 5 && col("rank") <= 2)
    val optimized = filtered.queryExecution.optimizedPlan
    val topkNode = optimized.collect { case t: TopKPerKeyPlan => t }
    assert(topkNode.nonEmpty, "custom node survived optimization")
    assert(topkNode.head.child.toString.contains("user_id"),
      s"key predicate must sit below TopKPerKey:\n$optimized")
    // the key predicate keeps pushing all the way into the parquet scan
    filtered.collect()
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(user_id), LessThan(user_id,5)"),
      s"expected scan-level pushdown:\n$physical")
    // semantics unchanged vs filtering the window idiom
    val viaWindow = e.withColumn("rank",
        row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("value").desc)))
      .filter(col("user_id") < 5 && col("rank") <= 2)
    assert(filtered.count() === viaWindow.count())
  }

  test("filters do NOT push through computed keys (commute is unsound there)") {
    val e = Tables.events(spark, sfDir)
    // key = user_id % 7: a predicate on user_id references the key's input
    // attribute but cuts rows WITHIN key groups — pushing it would rank
    // only the surviving rows and silently change the top-k result
    val key = pmod(col("user_id"), lit(7))
    val topk = TopKPerKey.perKey(e, Seq(key), Seq(col("value").desc, col("event_id")), 3)
    val filtered = topk.filter(col("user_id") >= 50)
    val topkNode = filtered.queryExecution.optimizedPlan
      .collect { case t: TopKPerKeyPlan => t }
    assert(topkNode.nonEmpty, "custom node survived optimization")
    assert(topkNode.head.child.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("50") => f
      }.isEmpty,
      s"predicate must STAY ABOVE a computed-key top-k:\n${filtered.queryExecution.optimizedPlan}")
    // row-identical to the window idiom with the filter applied after
    val viaWindow = e.withColumn("rank",
        row_number().over(
          Window.partitionBy(key).orderBy(col("value").desc, col("event_id"))))
      .filter(col("rank") <= 3 && col("user_id") >= 50)
      .select("user_id", "event_id", "rank")
    val got = filtered.select("user_id", "event_id", "rank")
    assert(got.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(got).count() === 0)
  }
}
