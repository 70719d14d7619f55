package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Build-once / serve-many fingerprinted layout cache — the one
  * discipline behind every persisted derived layout in the engine (the
  * orders skip layout, the stream split-replay layout, the components
  * cache, the IVF/PQ serving indexes): a layout directory is valid iff
  * its `_graft_fp` file equals the caller's fingerprint, which must fold
  * in the SOURCE snapshot identity ([[IvfPqIndex.snapshotId]] —
  * bytes+mtime), so an in-place rewrite of the source rebuilds instead of
  * serving stale derived data.
  *
  * Publish protocol: build into a UUID staging dir, write the fingerprint
  * INSIDE it, then delete+rename-flip — a reader in this JVM only ever
  * observes a complete old generation or a complete new one, and a crash
  * mid-build leaves an orphan `_build_*` dir (vacuumed by the next build)
  * rather than a fingerprint vouching for missing files. The
  * check → build → publish sequence is serialized per layout path within
  * the JVM; cross-JVM builders race benignly on local filesystems (both
  * write equivalent content — last flip wins) and a deployment points
  * `spark.graft.index.dir` at a store whose rename refuses existing
  * destinations (HDFS) for a hard cross-process guarantee.
  */
object LayoutCache {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Serve `layout`, building first when the fingerprint mismatches.
    * `build` receives the staging dir and must leave the complete layout
    * content inside it (`_graft_fp` is written here, after `build`
    * returns). Returns true iff a build ran — call sites keep their own
    * build counters as spec hooks.
    */
  def serve(spark: SparkSession, layout: String, fp: String)(
      build: Path => Unit): Boolean = {
    val lock = locks.computeIfAbsent(layout, _ => new Object)
    lock.synchronized {
      val fpPath = new Path(layout, "_graft_fp")
      val fs = fpPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val ok = fs.exists(fpPath) && {
        val in = fs.open(fpPath)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) == fp
        finally in.close()
      }
      if (ok) false
      else {
        val staging = new Path(layout + s"_build_${java.util.UUID.randomUUID()}")
        build(staging)
        // Spark writers drop a _SUCCESS marker; it is not layout content
        fs.delete(new Path(staging, "_SUCCESS"), false)
        val out = fs.create(new Path(staging, "_graft_fp"), true)
        try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        fs.delete(new Path(layout), true)
        require(fs.rename(staging, new Path(layout)),
          s"publishing layout $staging -> $layout failed")
        // reclaim orphaned staging dirs from crashed prior builds
        val parent = new Path(layout).getParent
        val prefix = new Path(layout).getName + "_build_"
        fs.listStatus(parent).map(_.getPath)
          .filter(p => p.getName.startsWith(prefix) && p != staging)
          .foreach(p => fs.delete(p, true))
        true
      }
    }
  }
}
