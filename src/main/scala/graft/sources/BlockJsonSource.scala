package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for block landing zones — the ingestion edge of
  * the pipeline (the reference fetches blocks over RPC one height at a
  * time, main.go:255-312; at lake scale the equivalent is ranged dump
  * files).
  *
  * Files are newline-delimited `<height>\t<block_json>` named
  * `blocks-<lo>-<hi>.jsonl`. The source demonstrates both V2 pushdown
  * hooks that matter at 100 TB:
  *
  *  - height predicates prune whole FILES from the scan (the filename
  *    range is a zone map), so `height >= X` catch-up reads touch only
  *    the tail of the landing zone;
  *  - required-column pruning skips materializing the (large) JSON body
  *    when only heights are selected.
  *
  * Usage: `spark.read.format("graft.sources.BlockJsonSource").load(dir)`.
  */
class BlockJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockJsonSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BlockJsonTable(properties.get("path"))
}

object BlockJsonSource {
  val schema: StructType = StructType(Seq(
    StructField("height", LongType, nullable = false),
    StructField("block_json", StringType)))

  /** `blocks-<lo>-<hi>[-p<task>].jsonl` → (lo, hi); files that don't match
    * are kept conservatively (no pruning possible). The optional task
    * suffix is what [[BlockBatchWrite]] appends so concurrent writer tasks
    * with overlapping ranges never collide on a name.
    */
  private[sources] def rangeOf(name: String): Option[(Long, Long)] = {
    val m = "^blocks-([0-9]+)-([0-9]+)(?:-p[0-9]+)?\\.jsonl$".r
    name match {
      case m(lo, hi) => Some((lo.toLong, hi.toLong))
      case _ => None
    }
  }

  private[sources] def hadoopConfEntries(
      spark: org.apache.spark.sql.SparkSession): Array[(String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val entries = new java.util.ArrayList[(String, String)]()
    conf.iterator().forEachRemaining(e => entries.add(e.getKey -> e.getValue))
    scala.jdk.CollectionConverters.ListHasAsScala(entries).asScala.toArray
  }

  private[sources] def fsWith(
      entries: Array[(String, String)], p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem = {
    val c = new org.apache.hadoop.conf.Configuration()
    entries.foreach { case (k, v) => c.set(k, v) }
    p.getFileSystem(c)
  }
}

class BlockJsonTable(path: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"blocks($path)"
  override def schema(): StructType = BlockJsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BlockScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(info.schema().fieldNames.toSeq == Seq("height", "block_json"),
      s"landing writes need (height, block_json), got ${info.schema().catalogString}")
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            new BlockBatchWrite(path,
              BlockJsonSource.hadoopConfEntries(org.apache.spark.sql.SparkSession.active))
        }
    }
  }
}

/** Two-phase-commit landing writer (the write half of the DSv2 table):
  * each task streams its rows to a private file under `<dir>/.staging-*`
  * and reports (path, minHeight, maxHeight, partition) in its commit
  * message; the DRIVER's `commit` renames every staged file into the
  * landing dir as `blocks-<lo>-<hi>-p<partition>.jsonl` — the reader's
  * zone-map naming, so written files are height-prunable — and `abort`
  * deletes the staging dir. A failed/speculative task never publishes:
  * its file stays in staging until commit (only messages that REACHED
  * commit are renamed) or abort wipes it.
  *
  * Failure contract: each file rename is atomic (HDFS/local), but the
  * commit loop as a whole is not — a crash mid-commit can publish a
  * prefix. Published names are DETERMINISTIC in the partition id and
  * replace on republish, so re-running the same append converges instead
  * of duplicating; for stronger guarantees land into a transactional
  * format. Every rename is attempted before any failure is thrown, so
  * one bad rename cannot strand the rest in staging.
  */
class BlockBatchWrite(path: String, hadoopConf: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  private val stagingName = s".staging-${java.util.UUID.randomUUID().toString.replace("-", "")}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BlockWriterFactory(path, stagingName, hadoopConf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = BlockJsonSource.fsWith(hadoopConf, dir)
    val failures = messages.flatMap {
      case BlockCommit(staged, lo, hi, part) if staged.nonEmpty =>
        val target = new org.apache.hadoop.fs.Path(dir, s"blocks-$lo-$hi-p$part.jsonl")
        if (fs.exists(target)) fs.delete(target, false) // idempotent republish
        if (fs.rename(new org.apache.hadoop.fs.Path(staged), target)) None
        else Some(s"$staged -> $target")
      case _ => None // empty task: nothing staged
    }
    fs.delete(new org.apache.hadoop.fs.Path(dir, stagingName), true)
    if (failures.nonEmpty)
      throw new java.io.IOException(
        s"landing publish failed for ${failures.length} file(s): ${failures.mkString(", ")}")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = BlockJsonSource.fsWith(hadoopConf, dir)
    fs.delete(new org.apache.hadoop.fs.Path(dir, stagingName), true)
  }
}

case class BlockCommit(staged: String, lo: Long, hi: Long, partition: Int)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class BlockWriterFactory(path: String, stagingName: String, hadoopConf: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  import org.apache.spark.sql.connector.write._

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val staged = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(path, stagingName), s"task-$partitionId-$taskId.jsonl")
      private val fs = BlockJsonSource.fsWith(hadoopConf, staged)
      private var out: java.io.BufferedWriter = _
      private var lo = Long.MaxValue
      private var hi = Long.MinValue

      override def write(row: InternalRow): Unit = {
        if (out == null)
          out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
            fs.create(staged, true), java.nio.charset.StandardCharsets.UTF_8))
        val h = row.getLong(0)
        // The landing format is line-oriented: a payload with an embedded
        // newline would silently split into a truncated row plus corrupt
        // lines on read-back, and NULL is unrepresentable (the reader
        // yields ""). Fail loudly instead of corrupting the round trip —
        // single-line JSON (the landing contract) never hits either.
        if (row.isNullAt(1))
          throw new IllegalArgumentException(
            s"block_json must not be NULL (height $h): the landing format cannot round-trip it")
        val json = row.getUTF8String(1).toString
        if (json.indexOf('\n') >= 0 || json.indexOf('\r') >= 0)
          throw new IllegalArgumentException(
            s"block_json must be single-line (height $h carries an embedded newline)")
        lo = math.min(lo, h); hi = math.max(hi, h)
        out.write(h.toString); out.write('\t')
        out.write(json)
        out.write('\n')
      }

      override def commit(): WriterCommitMessage = {
        if (out == null) BlockCommit("", 0L, 0L, partitionId)
        else { out.close(); out = null; BlockCommit(staged.toString, lo, hi, partitionId) }
      }

      override def abort(): Unit = {
        if (out != null) out.close()
        fs.delete(staged, false)
      }

      override def close(): Unit = if (out != null) { out.close(); out = null }
    }
}

class BlockScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = BlockJsonSource.schema
  private var minHeight: Long = Long.MinValue
  private var maxHeight: Long = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThan("height", _: Long) => true
      case GreaterThanOrEqual("height", _: Long) => true
      case LessThan("height", _: Long) => true
      case LessThanOrEqual("height", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("height", v: Long) => minHeight = math.max(minHeight, v + 1)
      case GreaterThanOrEqual("height", v: Long) => minHeight = math.max(minHeight, v)
      case LessThan("height", v: Long) => maxHeight = math.min(maxHeight, v - 1)
      case LessThanOrEqual("height", v: Long) => maxHeight = math.min(maxHeight, v)
      case _ => ()
    }
    pushed = accepted
    // height bounds are only a file-level zone map; rows inside a kept
    // file still need the residual filter, so return everything.
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new BlockScan(path, required, minHeight, maxHeight)
}

class BlockScan(
    path: String, required: StructType, minHeight: Long, maxHeight: Long)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // Hadoop FileSystem, not java.io: the landing zone is file:// in tests
    // and s3a://HDFS on a cluster — same code path (cf. the reference's S3
    // restore, process_s3.go:30-126).
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    val files =
      (if (fs.exists(dir)) fs.listStatus(dir) else Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".jsonl"))
        .filter { f =>
          BlockJsonSource.rangeOf(f.getPath.getName) match {
            case Some((lo, hi)) => hi >= minHeight && lo <= maxHeight
            case None => true // unknown name: cannot prune
          }
        }
    files.sortBy(_.getPath.getName)
      .map(f => BlockFilePartition(fs.makeQualified(f.getPath).toUri.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // Ship the driver's Hadoop configuration to the executors: a bare
    // executor-side `new Configuration()` would see only classpath
    // *-site.xml and silently drop spark.hadoop.* settings (s3a
    // credentials, endpoints) — the scan would then plan fine on the
    // driver and fail auth in every task.
    new BlockReaderFactory(required,
      BlockJsonSource.hadoopConfEntries(org.apache.spark.sql.SparkSession.active))
}

case class BlockFilePartition(file: String) extends InputPartition

class BlockReaderFactory(required: StructType, hadoopConf: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[BlockFilePartition].file
    new PartitionReader[InternalRow] {
      // Executor-side Hadoop open with the DRIVER's configuration
      // re-applied, so s3a/hdfs URIs resolve with the same credentials
      // and endpoints the planning side used.
      private val fsPath = new org.apache.hadoop.fs.Path(new java.net.URI(file))
      private val fs = BlockJsonSource.fsWith(hadoopConf, fsPath)
      private val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(fsPath), java.nio.charset.StandardCharsets.UTF_8))
      private var row: InternalRow = _

      /** A landing line is `<long>\t<json>`. Anything else — no tab, or a
        * non-numeric height prefix — is a corrupt line: skipped, never
        * emitted as a null into the non-nullable height field, and never
        * allowed to fail the whole scan.
        */
      private def parse(line: String): Option[InternalRow] = {
        val tab = line.indexOf('\t')
        if (tab <= 0) return None
        val height =
          try java.lang.Long.parseLong(line.substring(0, tab))
          catch { case _: NumberFormatException => return None }
        val values = required.fieldNames.map {
          case "height" => height: java.lang.Long
          case "block_json" => UTF8String.fromString(line.substring(tab + 1))
          case _ => null
        }
        Some(InternalRow.fromSeq(values.toSeq))
      }

      override def next(): Boolean = {
        var line = in.readLine()
        while (line != null) {
          parse(line) match {
            case Some(r) => row = r; return true
            case None => line = in.readLine() // corrupt line: skip
          }
        }
        false
      }

      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
