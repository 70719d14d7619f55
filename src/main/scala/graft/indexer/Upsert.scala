package graft.indexer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's two conflict-resolution semantics as set operators.
  *
  * PostgreSQL `ON CONFLICT DO NOTHING` (db.go:744-747) keeps the first row
  * per key; `ON CONFLICT DO UPDATE` (db.go:1171-1175, 1334-1339) keeps the
  * newest. Over immutable data lakes both become ONE hash aggregate:
  * `max_by(struct(row), struct(version, ties))` per conflict key. Unlike a
  * `row_number()` window — which shuffles every row of a key to a single
  * reducer and sorts the key's entire history there — a declarative
  * `max_by`/`min_by` aggregate computes map-side partials, so each input
  * partition forwards at most ONE candidate row per key across the
  * exchange. A hot key (a bot user, a hot actor address) costs O(partitions)
  * after the map side instead of serializing its full history on one
  * reducer — the shape that survives a skewed 100 TB key space. Idempotent
  * under replay (re-running over the union of old+new data yields the same
  * table, which is what makes the streaming sink exactly-once in effect).
  */
object Upsert {

  /** Keep the first row per key (insert-ignore): the row with the SMALLEST
    * `(version, tieBreaks…)` tuple survives. Tie-break columns must be
    * oriented so the desired survivor is the smallest (pass a
    * source-precedence column when versions can collide, see
    * [[latestWins]]).
    */
  def firstWins(df: DataFrame, keys: Seq[String], version: Column,
      tieBreaks: Column*): DataFrame =
    pick(df, keys, version +: tieBreaks, newest = false)

  /** Keep the newest row per key (update-wins): the row with the LARGEST
    * `(version, tieBreaks…)` tuple survives. ON CONFLICT DO UPDATE means
    * the INCOMING row must win a version tie — when merging two frames
    * whose version columns can be equal (e.g. version = the key itself),
    * callers must pass a precedence tie-break column on which the incoming
    * row is LARGER, or the survivor is partition-order nondeterministic.
    */
  def latestWins(df: DataFrame, keys: Seq[String], version: Column,
      tieBreaks: Column*): DataFrame =
    pick(df, keys, version +: tieBreaks, newest = true)

  /** Two-phase argmax: group by the conflict key, keep the payload struct
    * whose ordering struct is extreme. Struct comparison is lexicographic
    * (version first, then ties), matching the window ORDER BY it replaces;
    * determinism needs the same total order the window needed. The ordering
    * struct itself is never null, and a null FIELD sorts smallest — the
    * same place `NULLS FIRST` asc / `NULLS LAST` desc put it before.
    */
  private def pick(df: DataFrame, keys: Seq[String], ord: Seq[Column],
      newest: Boolean): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val ordKey = struct(ord.toIndexedSeq: _*)
    val winner = if (newest) max_by(payload, ordKey) else min_by(payload, ordKey)
    df.groupBy(keys.map(col): _*)
      .agg(winner.as("__row"))
      .select(col("__row.*"))
  }
}
