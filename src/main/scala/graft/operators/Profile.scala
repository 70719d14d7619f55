package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ANALYZE-style data profiling: per-column row/null/distinct counts and
  * min/max — the statistics a cost-based optimizer (join reordering,
  * broadcast thresholds) and a data-quality gate both consume, and the
  * first pass any 100 TB ingest runs before trusting a new table drop.
  * The reference gets these implicitly from PostgreSQL's ANALYZE; a lake
  * engine has to compute them.
  *
  * Shape: one aggregation PER COLUMN, unioned — deliberately not one
  * aggregation with k exact `count(DISTINCT ...)`s, which Spark plans via
  * `Expand` (every input row duplicated k× through a single shuffle, all
  * columns carried). Per-column passes each scan exactly one column
  * (parquet `ReadSchema` pruning), shuffle only that column's values for
  * its distinct, and pipeline independently. The sketch alternative for
  * when exactness isn't required — `approx_count_distinct`, one pass, no
  * Expand, mergeable HLL partials — is the ev_hll_users shape (its ≤5%
  * error bound is spec-pinned there).
  */
object Profile {

  /** Column profile of `lineitem` over its key, flag, and date columns
    * (the columns whose NDVs drive join planning). Doubles are excluded
    * from min/max stringification on purpose: the two engines print
    * shortest-round-trip doubles differently, and a profile exists to be
    * compared.
    */
  def lineitemStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def stat(name: String, fmt: Column => Column): DataFrame = {
      val c = col(name)
      li.agg(
          count(lit(1)).as("n_rows"),
          sum(c.isNull.cast("long")).as("n_nulls"),
          countDistinct(c).as("n_distinct"),
          fmt(min(c)).as("min_value"),
          fmt(max(c)).as("max_value"))
        .select(lit(name).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }
    val asStr = (c: Column) => c.cast("string")
    val asDay = (c: Column) => date_format(c, "yyyy-MM-dd")
    stat("l_orderkey", asStr)
      .unionAll(stat("l_partkey", asStr))
      .unionAll(stat("l_suppkey", asStr))
      .unionAll(stat("l_returnflag", asStr))
      .unionAll(stat("l_linestatus", asStr))
      .unionAll(stat("l_shipdate", asDay))
      .orderBy("column_name")
  }

  val lineitemStatsOracle: String = {
    def one(name: String, minMax: String => String): String =
      s"""SELECT '$name' AS column_name, count(*) AS n_rows,
            CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            CAST(count(DISTINCT $name) AS BIGINT) AS n_distinct,
            ${minMax(s"min($name)")} AS min_value,
            ${minMax(s"max($name)")} AS max_value
          FROM lineitem"""
    val asStr = (e: String) => s"CAST($e AS VARCHAR)"
    val asDay = (e: String) => s"strftime($e, '%Y-%m-%d')"
    Seq(
      one("l_orderkey", asStr), one("l_partkey", asStr),
      one("l_suppkey", asStr), one("l_returnflag", asStr),
      one("l_linestatus", asStr), one("l_shipdate", asDay)
    ).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
