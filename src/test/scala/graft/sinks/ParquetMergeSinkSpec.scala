package graft.sinks

import graft.SparkSpec

class ParquetMergeSinkSpec extends SparkSpec {
  import spark.implicits._

  test("merge is an idempotent latest-wins upsert") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/t"
    val b1 = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b1, dir, Seq("k"), "ver")
    assert(spark.read.parquet(dir).count() === 2)

    // newer version wins, older is ignored, replay is a no-op
    val b2 = Seq((1L, "a2", 20L), (3L, "c", 5L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b2, dir, Seq("k"), "ver")
    ParquetMergeSink.merge(b2, dir, Seq("k"), "ver") // replay
    val rows = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[String]("v"), r.getAs[Long]("ver"))).toMap
    assert(rows === Map(1L -> ("a2", 20L), 2L -> ("b", 10L), 3L -> ("c", 5L)))

    val b3 = Seq((1L, "stale", 1L)).toDF("k", "v", "ver")
    ParquetMergeSink.merge(b3, dir, Seq("k"), "ver")
    val after = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(after(1L) === "a2", "stale version must not overwrite")
  }
}
