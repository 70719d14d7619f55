package graft.sinks

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, xxhash64}
import org.apache.spark.sql.types._

import graft.indexer.Upsert

/** JDBC upsert sink — the reference's actual output surface (PostgreSQL
  * `INSERT ... ON CONFLICT DO UPDATE`, db.go:527-1514) as a `foreachBatch`
  * target.
  *
  * Portable upsert (no dialect-specific MERGE): per row, an UPDATE guarded
  * on `existing.version <= incoming.version` (so the incoming row wins a
  * version tie — DO UPDATE semantics); if it matched nothing, an INSERT,
  * with a duplicate-key failure meaning the existing row is strictly newer
  * (stale incoming → skipped). Batches are conflict-resolved with
  * [[Upsert.latestWins]] before touching the database, so each key is
  * written at most once per batch and replays converge.
  *
  * Scale shape: one connection + one transaction per partition, writes
  * stream through two prepared statements — the database is the
  * bottleneck, not the driver (no collect). Tested against in-JVM Derby
  * (the sandbox's only JDBC engine); on PostgreSQL the same plumbing
  * applies with the URL swapped.
  */
object JdbcUpsertSink {

  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    // Derby caps DECIMAL precision at 31 (the reference's NUMERIC(72,18)
    // discipline degrades the same way it does in Model.scala).
    case d: DecimalType => s"DECIMAL(${math.min(d.precision, 31)},${math.min(d.scale, 30)})"
    case StringType => "VARCHAR(4096)"
    case other =>
      throw new IllegalArgumentException(s"unsupported JDBC sink type: ${other.catalogString}")
  }

  /** CREATE TABLE (keys as PRIMARY KEY) when it doesn't exist yet. */
  def ensureTable(conn: Connection, table: String, schema: StructType, keys: Seq[String]): Unit = {
    val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
    val exists = try rs.next() finally rs.close()
    if (!exists) {
      val cols = schema.fields.map { f =>
        s"${f.name} ${sqlType(f.dataType)}" + (if (keys.contains(f.name)) " NOT NULL" else "")
      }.mkString(", ")
      val st = conn.createStatement()
      try st.executeUpdate(s"CREATE TABLE $table ($cols, PRIMARY KEY (${keys.mkString(", ")}))")
      finally st.close()
    }
  }

  def upsert(batch: DataFrame, url: String, table: String,
      keys: Seq[String], version: String): Unit = {
    // Version ties within a batch break on a CONTENT hash, not partition
    // order: the same batch always elects the same survivor, so replays
    // converge even when the version column collides (e.g. version = key).
    val contentTie = xxhash64(batch.columns.map(col).toIndexedSeq: _*)
    val resolved = Upsert.latestWins(batch, keys, col(version), contentTie)
    val schema = resolved.schema
    val conn0 = DriverManager.getConnection(url)
    try ensureTable(conn0, table, schema, keys) finally conn0.close()

    val fields = schema.fieldNames.toSeq
    val nonKeys = fields.filterNot(keys.contains)
    // All-key rows have nothing to UPDATE ("UPDATE t SET WHERE ..." is
    // malformed SQL): upsert degenerates to insert-ignore, so skip the
    // UPDATE leg entirely and let the duplicate-key handler absorb
    // re-inserts of existing keys.
    val hasUpdate = nonKeys.nonEmpty
    val updateSql =
      if (!hasUpdate) ""
      else s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keys.map(c => s"$c = ?").mkString(" AND ")} AND $version <= ?"
    val insertSql =
      s"INSERT INTO $table (${fields.mkString(", ")}) " +
        s"VALUES (${fields.map(_ => "?").mkString(", ")})"

    resolved.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val up = if (hasUpdate) conn.prepareStatement(updateSql) else null
          val ins = conn.prepareStatement(insertSql)
          try {
            rows.foreach { row =>
              val updated = hasUpdate && {
                nonKeys.zipWithIndex.foreach { case (c, i) =>
                  up.setObject(i + 1, row.getAs[AnyRef](c))
                }
                keys.zipWithIndex.foreach { case (c, i) =>
                  up.setObject(nonKeys.size + i + 1, row.getAs[AnyRef](c))
                }
                up.setObject(nonKeys.size + keys.size + 1, row.getAs[AnyRef](version))
                up.executeUpdate() > 0
              }
              if (!updated) {
                fields.zipWithIndex.foreach { case (c, i) =>
                  ins.setObject(i + 1, row.getAs[AnyRef](c))
                }
                // Savepoint around the INSERT: on PostgreSQL any error
                // aborts the surrounding transaction (25P02 on every later
                // statement), so a swallowed duplicate-key exception must
                // roll back to the savepoint to keep the partition's
                // transaction usable. Derby tolerates either way.
                val sp = conn.setSavepoint()
                try { ins.executeUpdate(); conn.releaseSavepoint(sp) }
                catch {
                  // duplicate key: the stored row is strictly newer than the
                  // incoming one (the guarded UPDATE already declined) —
                  // stale input, correctly ignored
                  case e: SQLException if e.getSQLState != null
                      && e.getSQLState.startsWith("23") =>
                    conn.rollback(sp)
                }
              }
            }
            conn.commit()
          } catch {
            case t: Throwable => conn.rollback(); throw t
          } finally {
            if (up != null) up.close()
            ins.close()
          }
        } finally conn.close()
      }
    }
  }
}
