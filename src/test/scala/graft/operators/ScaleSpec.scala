package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ScaleSpec extends SparkSpec {

  test("co-bucketed tables join without a shuffle") {
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Scale.writeBucketed(Tables.orders(spark, sfDir), "b_orders", "o_orderkey", 8)
    Scale.writeBucketed(
      Tables.lineitem(spark, sfDir).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8)
    // Force the non-broadcast path: at bench scale the planner would rather
    // broadcast these tiny tables; at 100 TB both sides are fact-sized and
    // the bucketed sort-merge join is exactly what we need to see.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected bucketed SMJ:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, sfDir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation matches the direct aggregation") {
    val e = Tables.events(spark, sfDir)
    val direct = e.groupBy("event_type")
      .agg(sum("value").as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Scale.saltedSumCount(e, "event_type", "value", 8)
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("total"), r.getAs[Long]("n"))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (total, n)) =>
      assert(n === direct(k)._2)
      assert(math.abs(total - direct(k)._1) < 1e-6)
    }
  }

  test("salted join matches the plain join") {
    val e = Tables.events(spark, sfDir).select("event_id", "event_type", "value")
    val dim = Tables.events(spark, sfDir).select("event_type").distinct()
      .withColumn("weight", length(col("event_type")))
    val plain = e.join(dim, "event_type").agg(sum(col("value") * col("weight"))).collect()(0).getDouble(0)
    val salted = Scale.saltedJoin(e, dim, "event_type", 4)
      .agg(sum(col("value") * col("weight"))).collect()(0).getDouble(0)
    assert(math.abs(plain - salted) < 1e-6)
  }

  test("bucketed range join is row-identical to the naive range join and hash-planned") {
    val e = Tables.events(spark, sfDir).select("event_id", "event_type", "value")
    val ranges = spark.createDataFrame(Seq(
      ("click", 0.0, 40.0, "low"), ("click", 40.0, 500.0, "high"),
      ("view", 0.0, 25.0, "low"), ("view", 25.0, 120.5, "mid"),
      ("view", 120.5, 500.0, "high"), ("purchase", 10.0, 300.0, "only")))
      .toDF("event_type", "lo", "hi", "band")
    val naive = e.join(ranges,
        e("event_type") === ranges("event_type") &&
          col("value") >= col("lo") && col("value") < col("hi"))
      .select(col("event_id"), col("band"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bucketed = Scale.rangeJoinBucketed(e, "value", ranges, "lo", "hi",
        width = 50.0, keys = Seq("event_type"))
      .select(col("event_id"), col("band"))
    val got = bucketed.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === naive, "bucketed range join diverged from naive semantics")
    // and the point of the rewrite: a hash join, not a nested loop
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bucketed range join still plans a nested loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash-family join:\n$plan")
  }
}
