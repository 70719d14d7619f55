package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** [[Tables.barrier]] — the scale-safe plan-reuse barrier.
  *
  * Conf-sensitive tests run on `spark.newSession()` (own SQLConf, shared
  * context) so suites running in parallel never see the mode overrides.
  */
class BarrierSpec extends SparkSpec {

  private def frame(s: org.apache.spark.sql.SparkSession) =
    s.range(0, 1000).toDF("id")
      .withColumn("x", col("id") * 2)
      .filter(col("id") % 3 =!= 0)

  test("auto mode on a local master truncates lineage (localCheckpoint)") {
    val s = spark.newSession()
    val df = Tables.barrier(frame(s))
    // a checkpointed frame's logical plan is the materialized RDD, not the
    // original lineage — the cheap-but-unrecoverable local-only fast path
    assert(df.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.count() === 666)
    df.unpersist(blocking = true)
  }

  test("persist mode keeps lineage: block loss recomputes instead of failing") {
    val s = spark.newSession()
    s.conf.set("spark.sql.graft.barrier", "persist")
    val df = Tables.barrier(frame(s))
    assert(df.storageLevel === StorageLevel.MEMORY_AND_DISK)
    // lineage intact: the plan is still the declarative tree, not an RDD scan
    assert(!df.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    assert(df.count() === 666) // materialize the cache
    // simulate losing every executor block mid-query: with lineage kept,
    // re-consuming the frame recomputes from source rather than dying
    df.unpersist(blocking = true)
    assert(df.count() === 666)
  }

  test("checkpoint mode writes a reliable checkpoint under the configured dir") {
    val s = spark.newSession()
    val dir = java.nio.file.Files.createTempDirectory("graft-barrier-ckpt").toString
    s.conf.set("spark.sql.graft.checkpointDir", dir)
    s.conf.set("spark.sql.graft.barrier", "checkpoint")
    val df = Tables.barrier(frame(s))
    assert(df.count() === 666)
    assert(df.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
    assert(files(new java.io.File(dir)).nonEmpty,
      "reliable checkpoint must land files in the configured dir")
  }

  test("auto mode prefers the reliable checkpoint when a dir is configured") {
    val s = spark.newSession()
    val dir = java.nio.file.Files.createTempDirectory("graft-barrier-auto").toString
    s.conf.set("spark.sql.graft.checkpointDir", dir)
    val df = Tables.barrier(frame(s))
    assert(df.count() === 666)
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
    assert(files(new java.io.File(dir)).nonEmpty)
  }

  test("checkpoint mode without a dir fails loudly") {
    val s = spark.newSession()
    s.conf.set("spark.sql.graft.barrier", "checkpoint")
    intercept[IllegalArgumentException] { Tables.barrier(frame(s)) }
  }

  test("a real barriered operator is mode-invariant (ngramJaccard)") {
    import graft.operators.Dedup
    val base = Dedup.ngramJaccard(spark, sfDir).collect().toSeq.map(_.toString).sorted
    val s = spark.newSession()
    s.conf.set("spark.sql.graft.barrier", "persist")
    val persisted = Dedup.ngramJaccard(s, sfDir).collect().toSeq.map(_.toString).sorted
    assert(persisted === base, "barrier mode must never change results")
    Tables.releaseIntermediates(s)
  }
}
