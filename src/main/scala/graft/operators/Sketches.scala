package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CmsEstimate

/** Mergeable-sketch rollups — the pre-aggregation shapes that replace
  * raw-data re-scans at 100 TB. The unifying idea: aggregate once into a
  * small commutative summary (HLL registers, CMS cells), then answer a
  * family of queries by COMBINING summaries, never re-touching events.
  * Complements the exact formulations that share their oracles/specs:
  * [[Events.rollingDau]] (exact trailing distinct), [[Events.topkUsers]]
  * (exact heavy hitters), [[Events.hllUsers]] (single-shot approx
  * distinct).
  */
object Sketches {

  /** Trailing 7-day distinct users per day from DAILY HLL sketches —
    * the materialized-sketch rollup. [[Events.rollingDau]] answers the
    * same question exactly by fanning distinct (user, day) pairs ×7 into a
    * count-distinct; at 100 TB that remains one full pass over the
    * distinct-pair frame for every report refresh. Here the raw volume is
    * absorbed ONCE into one fixed-size sketch per day (Datasketches HLL,
    * lgK=12 → ≤4 KB, ~1.6% rel. std. error; update and merge are
    * commutative register-max, so map-side partials combine and the result
    * is partition-order invariant), and every window then unions ≤7
    * sketches — cost O(days × 4 KB), independent of event count. This is
    * the sketch-cube pattern: persist the daily sketches and ANY date
    * range, not just the trailing week, is answerable by union without
    * touching events again. Sketch binaries are not engine-portable —
    * rows-only gate; SketchesSpec pins the day spine to the exact rollup
    * and bounds every day's estimate against the exact distinct count.
    */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val bounds = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    // each day's sketch serves the ≤7 report days it contributes to —
    // the fanout carries |days| × 4 KB, never event rows
    daily.select(col("sk"), explode(sequence(col("d"), date_add(col("d"), 6))).as("rd"))
      .crossJoin(broadcast(bounds))
      .filter(col("rd").between(col("d0"), col("d1")))
      .groupBy(date_format(col("rd"), "yyyy-MM-dd").as("day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_users_7d"))
      .orderBy("day")
  }

  /** Heavy-hitter frequencies from ONE Count-Min sketch pass — point
    * lookups without per-key state. The exact top-k ([[Events.topkUsers]])
    * needs a full (key → count) aggregation; a CMS answers "how often did
    * THIS key occur" from a fixed ε×depth grid of commutative counters
    * (ε=10⁻³, δ=10⁻³ → 2000×10 longs ≈ 160 KB regardless of key
    * cardinality), built in one mergeable aggregate and broadcast to the
    * probe. The output joins exact counts with sketch estimates for the
    * exact top 10, so the CMS contract is visible in the result itself:
    * `over = est - exact ≥ 0` always (CMS never undercounts), and
    * `over ≤ ε·N` with probability ≥ 1-δ. With the seed fixed the
    * estimate is fully deterministic (cells are sums — commutative under
    * partitioning), so the rows-only gate is stable; SketchesSpec pins
    * both bounds and partition invariance.
    */
  def cmsUserCounts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val sk = e.agg(expr("count_min_sketch(user_id, 0.001d, 0.999d, 42)").as("sk"))
    val top = e.groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(desc("exact_cnt"), col("user_id")).limit(10)
    top.crossJoin(broadcast(sk))
      .select(col("user_id"), col("exact_cnt"),
        CmsEstimate(col("sk"), col("user_id")).as("est_cnt"))
      .withColumn("overcount", col("est_cnt") - col("exact_cnt"))
      .orderBy(desc("exact_cnt"), col("user_id"))
  }
}
