package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {

  test("hllRollup tracks the exact rolling-distinct on the same day spine") {
    val est = Sketches.hllRollup(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Events.rollingDau(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet, "sketch rollup must cover every report day")
    for ((day, ex) <- exact) {
      val e = est(day)
      // lgK=12 → ~1.6% relative standard error; 5% is a hard outlier wall
      assert(math.abs(e - ex) <= math.max(1L, (ex * 0.05).toLong),
        s"day $day: estimate $e vs exact $ex beyond 5%")
    }
  }

  test("hllRollup union of daily sketches equals sketching the window directly") {
    import spark.implicits._
    val ud = graft.Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("d"), col("user_id"))
    val days = ud.select(col("d")).distinct().as[java.sql.Date].collect().sorted
    val window = days.take(7)
    // direct: one sketch over all users active in the window
    val direct = ud.filter(col("d").isin(window.map(_.toString): _*))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))"))
      .head.getLong(0)
    // merged: union of the per-day sketches — the rollup's path
    val merged = ud.filter(col("d").isin(window.map(_.toString): _*))
      .groupBy(col("d")).agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))"))
      .head.getLong(0)
    assert(merged === direct,
      "mergeability: union of daily sketches must estimate like one sketch of the union")
  }

  test("cmsUserCounts holds the CMS bounds: never under, over ≤ eps*N") {
    val n = graft.Tables.events(spark, sfDir).count()
    val rows = Sketches.cmsUserCounts(spark, sfDir).collect()
    assert(rows.length === 10)
    for (r <- rows) {
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("est_cnt")
      assert(est >= exact, s"user ${r.get(0)}: CMS undercounted ($est < $exact)")
      assert(est - exact <= math.max(1L, (0.001 * n).toLong),
        s"user ${r.get(0)}: overcount ${est - exact} beyond eps*N")
    }
  }
}
