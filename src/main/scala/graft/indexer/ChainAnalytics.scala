package graft.indexer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked analytics over the ROUTED chain tables — the
  * reference's actual consumer surface (per-topic / per-actor queries
  * over the tables `db.go:842-937` scores and `db.go:939-1017` rewards
  * land in), registered in the correctness gate.
  *
  * The chain fixture is built DETERMINISTICALLY from the driver's
  * `events` table (one synthetic `EventScoresSet` / `EventRewardsSettled`
  * chain event per row, attributes JSON-encoded exactly as the chain
  * emits them — quoted string arrays, parallel addresses/values lists,
  * an occasional malformed numeric), so the DuckDB oracle can derive the
  * same rows in pure SQL while the Spark side exercises the REAL router
  * lineage: whitelist match, attribute-map extraction, zip-explode,
  * numeric guard (`isInvalidNumericValue`, db.go:893), decimal cast.
  *
  * Scale shape: the fixture is a projection of the events scan (no
  * shuffle), the router explode is linear, and the aggregate is a
  * two-phase hash agg on (topic, type) / address — bounded output
  * domains (16 topics × types; 50 actors), so the driver never holds
  * more than the report.
  */
object ChainAnalytics {

  /** Quoted-JSON string array of the two parallel per-event entries. */
  private def jarr(a: Column, b: Column): Column =
    concat(lit("[\""), a, lit("\",\""), b, lit("\"]"))

  private def attrEntry(key: String, v: Column): Column =
    struct(lit(key).as("key"), v.as("value"))

  /** One synthetic chain event per events-table row. `suffix` picks the
    * whitelisted type; `valuesKey` is the parallel-array attribute the
    * router zips ("scores" / "rewards"); (v1, v2) are the two value
    * strings paired with the two addresses.
    */
  private def fixture(spark: SparkSession, dir: String, suffix: String,
      valuesKey: String, v1: Column, v2: Column): DataFrame =
    graft.Tables.events(spark, dir).select(
      col("event_id").as("height"),
      lit(s"emissions.v3.$suffix").as("type"),
      array(
        attrEntry("block_height", col("event_id").cast("string")),
        attrEntry("topic_id", (col("user_id") % 16).cast("string")),
        attrEntry("actor_type", col("event_type")),
        attrEntry("addresses", jarr(
          concat(lit("addr_"), (col("user_id") % 50).cast("string")),
          concat(lit("addr_"), ((col("user_id") + 1) % 50).cast("string")))),
        attrEntry(valuesKey, jarr(v1, v2))).as("attributes"))

  /** [[fixture]] STAGED once per (events snapshot, query) and served from
    * parquet after — the [[graft.functions.LayoutCache]] discipline. In
    * production the chain events the routers consume are already on disk
    * (the ingest pump landed them); the synthetic JSON ENCODE is gate
    * scaffolding, and measured at sf100 it dominated the query (228 s of
    * which most was fixture encode, re-paid on every run). Staging makes
    * the measured number the operator's real cost: scan → router lineage
    * → bounded aggregate. The build/serve choice is strategy-logged so
    * artifacts can tell a cold fixture build from a served run.
    */
  private def stagedFixture(spark: SparkSession, dir: String, key: String,
      suffix: String, valuesKey: String, v1: Column, v2: Column): DataFrame = {
    val snap = graft.functions.IvfPqIndex.snapshotId(
      spark, s"$dir/events.parquet")
    val fp = s"fmt=1;src=$dir;$snap;fixture=$key"
    val layout = graft.functions.IvfPqIndex.indexRoot(spark) +
      s"/chain_fixture_${key}_${graft.functions.IvfPqIndex.pathKey(dir)}"
    val built = graft.functions.LayoutCache.serve(spark, layout, fp) {
      staging =>
        fixture(spark, dir, suffix, valuesKey, v1, v2)
          .write.mode("overwrite").parquet(staging.toString)
    }
    graft.StrategyLog.record("chain_fixture",
      if (built) "build" else "serve", "key" -> key)
    spark.read.parquet(layout)
  }

  /** Per-topic score totals over the routed `scores` table — the
    * reference's "how did topic N's actors score" query. The second
    * array slot is malformed every 11th event: the router's numeric
    * guard must drop exactly those pairs (the oracle applies the same
    * regex), so the gate pins guard semantics, not just the zip.
    */
  def topicScores(spark: SparkSession, dir: String): DataFrame = {
    val v1 = concat((col("event_id") % 997).cast("string"), lit("."),
      (col("user_id") % 97).cast("string"))
    val v2 = when(col("event_id") % 11 === 0, lit("NaN"))
      .otherwise(((col("event_id") * 7) % 1009).cast("string"))
    Routers.scores(
        stagedFixture(spark, dir, "scores", "EventScoresSet", "scores", v1, v2))
      .groupBy(col("topic_id"), col("type"))
      .agg(
        count(lit(1)).as("n_scores"),
        countDistinct(col("address")).as("n_actors"),
        sum(col("value")).cast("double").as("total_score"))
      .orderBy("topic_id", "type")
  }

  val topicScoresOracle: String =
    """WITH f AS (
         SELECT event_id, user_id, event_type,
                CAST(event_id % 997 AS VARCHAR) || '.' ||
                  CAST(user_id % 97 AS VARCHAR) AS s1,
                CASE WHEN event_id % 11 = 0 THEN 'NaN'
                     ELSE CAST((event_id * 7) % 1009 AS VARCHAR) END AS s2,
                'addr_' || CAST(user_id % 50 AS VARCHAR) AS a1,
                'addr_' || CAST((user_id + 1) % 50 AS VARCHAR) AS a2
         FROM events),
       z AS (
         SELECT user_id % 16 AS topic_id, event_type AS type,
                a1 AS address, s1 AS raw FROM f
         UNION ALL
         SELECT user_id % 16, event_type, a2, s2 FROM f),
       v AS (
         SELECT topic_id, type, address,
                CAST(raw AS DECIMAL(38,18)) AS value
         FROM z
         WHERE regexp_matches(raw,
           '^-?[0-9]+(\.[0-9]+)?([eE][-+]?[0-9]+)?$'))
       SELECT CAST(topic_id AS INTEGER) AS topic_id, type,
              CAST(count(*) AS BIGINT) AS n_scores,
              CAST(count(DISTINCT address) AS BIGINT) AS n_actors,
              CAST(sum(value) AS DOUBLE) AS total_score
       FROM v GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Per-actor reward totals over the routed `rewards` table — the
    * reference's "what has this address earned, over how many topics"
    * query (db.go:939-1017 shape). Bounded 50-actor report.
    */
  def actorRewards(spark: SparkSession, dir: String): DataFrame = {
    val v1 = concat((col("event_id") % 499).cast("string"), lit("."),
      (col("user_id") % 89).cast("string"))
    val v2 = when(col("user_id") % 13 === 0, lit("1.2.3"))
      .otherwise(((col("event_id") * 3) % 769).cast("string"))
    Routers.rewards(
        stagedFixture(spark, dir, "rewards", "EventRewardsSettled", "rewards",
          v1, v2))
      .groupBy(col("address"))
      .agg(
        count(lit(1)).as("n_rewards"),
        countDistinct(col("topic_id")).as("n_topics"),
        sum(col("value")).cast("double").as("total_reward"))
      .orderBy("address")
  }

  val actorRewardsOracle: String =
    """WITH f AS (
         SELECT event_id, user_id,
                CAST(event_id % 499 AS VARCHAR) || '.' ||
                  CAST(user_id % 89 AS VARCHAR) AS s1,
                CASE WHEN user_id % 13 = 0 THEN '1.2.3'
                     ELSE CAST((event_id * 3) % 769 AS VARCHAR) END AS s2,
                'addr_' || CAST(user_id % 50 AS VARCHAR) AS a1,
                'addr_' || CAST((user_id + 1) % 50 AS VARCHAR) AS a2
         FROM events),
       z AS (
         SELECT user_id % 16 AS topic_id, a1 AS address, s1 AS raw FROM f
         UNION ALL
         SELECT user_id % 16, a2, s2 FROM f),
       v AS (
         SELECT topic_id, address, CAST(raw AS DECIMAL(38,18)) AS value
         FROM z
         WHERE regexp_matches(raw,
           '^-?[0-9]+(\.[0-9]+)?([eE][-+]?[0-9]+)?$'))
       SELECT address,
              CAST(count(*) AS BIGINT) AS n_rewards,
              CAST(count(DISTINCT topic_id) AS BIGINT) AS n_topics,
              CAST(sum(value) AS DOUBLE) AS total_reward
       FROM v GROUP BY 1 ORDER BY 1"""
}
