package graft.indexer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's two conflict-resolution semantics as set operators.
  *
  * PostgreSQL `ON CONFLICT DO NOTHING` (db.go:744-747) keeps the first row
  * per key; `ON CONFLICT DO UPDATE` (db.go:1171-1175, 1334-1339) keeps the
  * newest. Over immutable data lakes both become one window pass: partition
  * by the conflict key, order by the version column, keep rank 1 — a single
  * hash-partition shuffle, no row-at-a-time upserts, idempotent under
  * replay (re-running over the union of old+new data yields the same
  * table, which is what makes the streaming sink exactly-once in effect).
  */
object Upsert {

  /** Keep the first row per key (insert-ignore). `tieBreaks` order rows
    * within equal versions — pass a source-precedence column when versions
    * can collide (see [[latestWins]]).
    */
  def firstWins(df: DataFrame, keys: Seq[String], version: Column,
      tieBreaks: Column*): DataFrame =
    pick(df, keys, version.asc +: tieBreaks)

  /** Keep the newest row per key (update-wins). ON CONFLICT DO UPDATE
    * means the INCOMING row must win a version tie — when merging two
    * frames whose version columns can be equal (e.g. version = the key
    * itself), callers must pass a precedence tie-break (incoming outranks
    * current) or the survivor is partition-order nondeterministic.
    */
  def latestWins(df: DataFrame, keys: Seq[String], version: Column,
      tieBreaks: Column*): DataFrame =
    pick(df, keys, version.desc +: tieBreaks)

  private def pick(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
