package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}

/** Object-store-safe commit protocol: immutable generation directories
  * plus a log of tiny numbered manifest files. The ONLY mutation a commit
  * performs is making one small file appear; data directories are never
  * renamed, overwritten, or mutated after they are written.
  *
  * Why not a directory-rename swap: `FileSystem.rename` of a directory is
  * atomic on HDFS and local filesystems but on S3A it is a non-atomic
  * O(data) copy+delete — a crash mid-swap leaves a half-copied table, so
  * the "whole table at either generation" guarantee silently does not
  * hold on the one store a 100 TB lake actually runs on. The reference
  * gets its all-or-nothing writes from PostgreSQL transactions
  * (db.go `INSERT ... ON CONFLICT` inside a tx); at the lake layer the
  * equivalent is exactly this shape — Delta's `_delta_log` and Structured
  * Streaming's HDFSMetadataLog commit the same way (numbered small files,
  * data immutable).
  *
  * Layout under a table root:
  * {{{
  *   root/_commits/00000000000000000001   <- manifest v1 (key=value lines)
  *   root/_commits/00000000000000000002   <- manifest v2 (current)
  *   root/_g1-<hex>/                      <- generation data, immutable
  *   root/_g2-<hex>/
  * }}}
  *
  * Generation dirs are `_`-prefixed on purpose: Spark's file listing
  * skips `_`/`.`-prefixed children, so a plain `spark.read.parquet(root)`
  * over a half-migrated table sees only the legacy top-level files, never
  * a mix of layouts; managed readers address the generation dir
  * explicitly via the manifest.
  *
  * Commit discipline: the payload is written to `_commits/.tmp-<uuid>`
  * and renamed (no overwrite) to the next version number. The rename
  * moves ONE object of a few hundred bytes: effectively atomic on every
  * store, and the create-fails-if-exists target catches a racing writer.
  * Readers list `_commits`, take the highest fully-committed version, and
  * resolve data paths from its entries — they see the previous or the
  * next generation, never a mix, with no coordination.
  *
  * Crash windows, by construction:
  *  - before the manifest rename: the new generation dir is an orphan no
  *    manifest references — readers are untouched; [[vacuum]] removes it.
  *  - after the rename: the commit is complete; superseded generations
  *    linger for in-flight readers until [[vacuum]] (writers call it with
  *    `keep = 2` so the previous generation survives one more commit).
  *
  * Single-writer per table, like the reference indexer; concurrent
  * READERS are always safe.
  *
  * Manifest entries are `key=value` lines. By convention a key starting
  * with `dir.` names a data path relative to the root (its first path
  * segment is a generation directory); other keys are scalar metadata
  * (bucket counts, last-applied batch ids).
  */
object ManifestCommit {

  val CommitDir = "_commits"
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  final case class Manifest(version: Long, entries: Map[String, String]) {
    /** Relative data paths this manifest references (`dir.*` values). */
    def dirs: Map[String, String] =
      entries.collect { case (k, v) if k.startsWith("dir.") =>
        k.stripPrefix("dir.") -> v
      }
    /** First path segments (generation dirs) this manifest pins live. */
    def liveGenerations: Set[String] =
      dirs.values.map(_.split("/").head).toSet
  }

  private[graft] def commitPath(root: Path, version: Long): Path =
    new Path(new Path(root, CommitDir), f"$version%020d")

  private def parseVersion(name: String): Option[Long] =
    if (name.forall(_.isDigit) && name.length == 20) Some(name.toLong) else None

  /** All committed manifests, ascending by version. */
  def committed(fs: FileSystem, root: Path): Seq[Manifest] = {
    val dir = new Path(root, CommitDir)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .flatMap(s => parseVersion(s.getPath.getName))
      .sorted
      .map(v => Manifest(v, readEntries(fs, commitPath(root, v))))
  }

  /** The current manifest — highest committed version — if any. */
  def latest(fs: FileSystem, root: Path): Option[Manifest] = {
    val dir = new Path(root, CommitDir)
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).flatMap(s => parseVersion(s.getPath.getName))
    if (versions.isEmpty) None
    else {
      val v = versions.max
      Some(Manifest(v, readEntries(fs, commitPath(root, v))))
    }
  }

  private def readEntries(fs: FileSystem, p: Path): Map[String, String] = {
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), Utf8) finally in.close()
    text.linesIterator.filter(_.contains("=")).map { line =>
      val i = line.indexOf('=')
      line.substring(0, i) -> line.substring(i + 1)
    }.toMap
  }

  /** Publish `entries` as the next manifest version. The data dirs the
    * entries reference must already be fully written — this call is the
    * commit point. Returns the committed version. Fails (leaving the
    * table at the previous generation) if another writer took the slot.
    *
    * The slot is claimed with an ATOMIC put-if-absent, dispatched per
    * store the way Delta's LogStore is (one primitive per store's actual
    * atomicity guarantee):
    *
    *  - local `file://` — hard-link tmp → target. `link(2)` is the one
    *    POSIX primitive that is both atomic and exclusive; POSIX
    *    `rename(2)` silently REPLACES an existing destination, so a
    *    tmp+rename protocol lets a racing writer clobber a committed
    *    manifest after its writer's read-back already passed (both report
    *    success for one version — observed, then designed out). The link
    *    makes the full content visible in the same atomic step.
    *  - everything else (HDFS-semantics stores) — rename with no
    *    overwrite, which HDFS refuses atomically at the NameNode when the
    *    destination exists, then a txid READ-BACK: the manifest carries a
    *    unique `txid` entry and the committer verifies the committed file
    *    holds ITS txid, so on any store whose rename replaces (object
    *    stores without conditional puts) a clobbered writer still fails
    *    loudly instead of silently losing its commit.
    *
    * Tables are single-writer by contract; this turns a misconfigured
    * double-writer into a loud failure instead of data loss.
    */
  def commit(fs: FileSystem, root: Path, entries: Map[String, String]): Long = {
    val version = latest(fs, root).map(_.version).getOrElse(0L) + 1L
    val dir = new Path(root, CommitDir)
    fs.mkdirs(dir)
    val txid = java.util.UUID.randomUUID().toString
    val tmp = new Path(dir, s".tmp-$txid")
    val out = fs.create(tmp, false)
    try {
      val text = (entries - "txid" + ("txid" -> txid)).toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
      out.write(text.getBytes(Utf8))
    } finally out.close()
    val target = commitPath(root, version)
    def lose(): Nothing = {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"manifest commit lost the race for version $version at $root — " +
          "tables are single-writer; the data generation written for this " +
          "commit is an orphan and will be vacuumed")
    }
    if (fs.exists(target)) lose()
    if (fs.getScheme == "file") {
      try java.nio.file.Files.createLink(
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      catch {
        case _: java.nio.file.FileAlreadyExistsException => lose()
      }
      fs.delete(tmp, false)
    } else {
      if (!fs.rename(tmp, target)) lose()
      if (!readEntries(fs, target).get("txid").contains(txid)) lose()
    }
    version
  }

  /** The manifest at an exact version, if vacuum still retains it. */
  def at(fs: FileSystem, root: Path, version: Long): Option[Manifest] =
    committed(fs, root).find(_.version == version)

  /** History-preserving rollback (the Delta RESTORE shape): re-commit
    * `toVersion`'s entries as the NEW head version. Nothing is deleted —
    * readers of the current head are untouched until the new commit
    * lands atomically, the log keeps every intermediate state for
    * forensics, and vacuum retention is unchanged (the restored
    * generations are referenced by the new head, so they survive it).
    * Fails loudly when the target version, or any generation directory
    * it references, has already been vacuumed — a rollback that silently
    * resurrected a half-reclaimed generation would serve partial data.
    */
  def rollback(fs: FileSystem, root: Path, toVersion: Long): Long = {
    val m = at(fs, root, toVersion).getOrElse(
      throw new IllegalArgumentException(
        s"version $toVersion is not in the retained commit log at $root — " +
          s"retained: ${committed(fs, root).map(_.version).mkString(", ")}"))
    val missing = m.liveGenerations.filterNot(g => fs.exists(new Path(root, g)))
    require(missing.isEmpty,
      s"cannot roll back to version $toVersion: generation dir(s) " +
        s"${missing.mkString(", ")} already vacuumed")
    commit(fs, root, m.entries - "txid")
  }

  /** New generation dir name for `version` (collision-free under crash
    * retries of the same version: the uuid disambiguates).
    */
  def newGeneration(version: Long): String =
    s"_g$version-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Remove orphaned generation dirs and manifests older than the last
    * `keep` commits. A dir survives if ANY retained manifest references
    * it, so in-flight readers of the previous generation keep their
    * files. Only top-level dirs matching the `g<n>-` generation pattern
    * are candidates — anything else at the root is left alone.
    */
  def vacuum(fs: FileSystem, root: Path, keep: Int = 2): Unit = {
    if (!fs.exists(root)) return
    val all = committed(fs, root)
    if (all.isEmpty) return
    val retained = all.takeRight(keep)
    val live = retained.flatMap(_.liveGenerations).toSet
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name != CommitDir &&
          name.matches("_g\\d+-[0-9a-f]+") && !live.contains(name))
        fs.delete(st.getPath, true)
    }
    all.dropRight(keep).foreach(m => fs.delete(commitPath(root, m.version), false))
    // a crash between tmp-write and rename leaves a .tmp debris file; the
    // table is single-writer, so any tmp present OUTSIDE an in-flight
    // commit (and vacuum runs post-commit) is dead — reclaim it
    fs.listStatus(new Path(root, CommitDir)).foreach { st =>
      if (st.isFile && st.getPath.getName.startsWith(".tmp-"))
        fs.delete(st.getPath, false)
    }
  }

  /** True when the root holds generation-pattern dirs but no committed
    * manifest — an unreadable state that can only arise from `_commits`
    * being lost (writers commit a v1 manifest BEFORE writing any
    * generation data, so a crash can never produce it). Writers treat it
    * as fatal rather than guessing a layout and silently re-keying or
    * resetting data — the same discipline as the old bucket-count marker.
    */
  def orphanedGenerations(fs: FileSystem, root: Path): Boolean =
    fs.exists(root) && latest(fs, root).isEmpty &&
      fs.listStatus(root).exists(s =>
        s.isDirectory && s.getPath.getName.matches("_g\\d+-[0-9a-f]+"))
}
