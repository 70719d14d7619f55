package graft.operators

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("q01 groups by (returnflag, linestatus) and sums are positive") {
    val rows = Relational.q01PricingSummary(spark, sfDir).collect()
    assert(rows.length === 6) // 3 flags x 2 statuses
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Double]("avg_qty") > 0)
    }
  }

  test("q03 returns at most 10 orders ranked by revenue desc") {
    val rows = Relational.q03TopOrders(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q05 joins six tables and produces per-nation revenue") {
    val df = Relational.q05RegionRevenue(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("revenue") > 0))
  }

  test("q05 broadcasts the dimension sides") {
    val plan = Relational.q05RegionRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
  }

  test("q_part_supplier covers every brand with broadcast joins") {
    val df = Relational.qPartSupplier(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(df.count() === 25) // Brand#1..25
  }

  test("q13 keeps customers with zero orders in the 0 bucket") {
    val rows = Relational.q13CustomerDist(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    assert(total === graft.Tables.customer(spark, sfDir).count())
  }

  test("q18 only returns orders above the HAVING threshold") {
    Relational.q18LargeOrders(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Double]("total_qty") > 150.0)
    }
  }

  test("q_repeat_customers is a subset of each year's actives") {
    val repeat = Relational.qRepeatCustomers(spark, sfDir).collect()
      .map(_.getAs[Long]("o_custkey")).toSet
    import org.apache.spark.sql.functions._
    val o = graft.Tables.orders(spark, sfDir)
    val y96 = o.filter(year(col("o_orderdate")) === 1996)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(repeat.subsetOf(y96))
  }

  test("rollup grand total equals the table size") {
    val rows = Relational.qRollup(spark, sfDir).collect()
    val grand = rows.find(r =>
      r.getAs[String]("returnflag") == "ALL" && r.getAs[String]("linestatus") == "ALL").get
    assert(grand.getAs[Long]("n_lines") === graft.Tables.lineitem(spark, sfDir).count())
  }

  test("q21 materializes the pair frame once for its three consumers") {
    val df = Relational.q21SoleLateSupplier(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // pairs is localCheckpointed: the probe/semi/anti branches must read
    // the checkpoint, not re-run the lineitem⋈orders agg three times —
    // neither fact table may appear as a scan anywhere in the final plan
    assert(!plan.contains("lineitem.parquet") && !plan.contains("orders.parquet"),
      s"fact scans must be absorbed by the pair checkpoint:\n$plan")
    assert(plan.contains("ExistingRDD"), s"expected checkpoint scans:\n$plan")
  }

  test("lineitem scan prunes columns") {
    val plan = Relational.q01PricingSummary(spark, sfDir)
      .queryExecution.executedPlan.toString
    // 7 of 11 lineitem columns are needed; the scan must not read the rest.
    assert(!plan.contains("l_orderkey"), "q01 scan should prune l_orderkey")
  }
}
