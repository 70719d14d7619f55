package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BlockJsonSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-blocks").toString
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, name), String.join("\n", lines: _*).getBytes)
    write("blocks-100-101.jsonl", Seq(
      "100\t{\"header\":{\"chain_id\":\"t1\"}}",
      "101\t{\"header\":{\"chain_id\":\"t1\"}}"))
    // deliberately malformed body: must never be read when pruned away
    write("blocks-200-201.jsonl", Seq(
      "200\t{\"header\":{\"chain_id\":\"t1\"}}",
      "201\tTHIS IS NOT JSON BUT STILL A VALID ROW"))
    d
  }

  test("write path round-trips and written files stay height-prunable") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-blocks-write").toString
    val rows = (1L to 200L).map(h => (h, s"""{"h":$h}"""))
    rows.toDF("height", "block_json")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("height"))
      .write.format("graft.sources.BlockJsonSource").mode("append").save(d)
    // staging must be fully published
    assert(!new java.io.File(d).listFiles().exists(_.getName.startsWith(".staging")),
      "no staging leftovers after commit")
    val back = spark.read.format("graft.sources.BlockJsonSource").load(d)
    assert(back.count() === 200)
    assert(back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      rows.toMap, "round trip must be lossless")
    // range-partitioned writes produce range-named files -> the reader's
    // zone map prunes them for a height predicate
    val pruned = back.filter(org.apache.spark.sql.functions.col("height") > 190L)
    assert(pruned.count() === 10)
    assert(pruned.rdd.getNumPartitions < 4,
      "height predicate must prune whole written files from the scan")
    // a second append adds, never overwrites
    Seq((201L, """{"h":201}""")).toDF("height", "block_json")
      .write.format("graft.sources.BlockJsonSource").mode("append").save(d)
    assert(spark.read.format("graft.sources.BlockJsonSource").load(d).count() === 201)
  }

  test("corrupt landing lines are skipped, not nulled or fatal") {
    val d = java.nio.file.Files.createTempDirectory("graft-blocks-corrupt").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "blocks-1-5.jsonl"),
      Seq(
        "1\t{\"ok\":1}",
        "THIS LINE HAS NO TAB",          // no tab -> skip
        "not-a-number\t{\"ok\":0}",      // non-numeric height -> skip
        "",                               // blank -> skip
        "5\t{\"ok\":5}").mkString("\n").getBytes)
    val rows = spark.read.format("graft.sources.BlockJsonSource").load(d)
    assert(rows.count() === 2)
    assert(rows.select("height").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 5L))
  }

  private def read() =
    spark.read.format("graft.sources.BlockJsonSource").load(dir)

  test("reads all ranged files with the declared schema") {
    val df = read()
    assert(df.schema.fieldNames.toSeq === Seq("height", "block_json"))
    assert(df.count() === 4)
    assert(df.agg(min("height"), max("height")).collect()(0).toSeq === Seq(100L, 201L))
  }

  test("height predicates prune whole files from the scan") {
    // one InputPartition per file: partition count is the file count
    assert(read().rdd.getNumPartitions === 2)
    val df = read().filter(col("height") >= 200)
    assert(df.rdd.getNumPartitions === 1, "file outside the height range must be pruned")
    assert(df.count() === 2)
    val other = read().filter(col("height") < 150)
    assert(other.rdd.getNumPartitions === 1)
    assert(other.select("height").collect().map(_.getLong(0)).sorted.toSeq === Seq(100L, 101L))
  }

  test("residual row filtering still applies inside kept files") {
    val df = read().filter(col("height") === 101)
    assert(df.count() === 1)
  }

  test("column pruning drops the json body from the read schema") {
    val heights = read().select("height")
    assert(heights.queryExecution.executedPlan.toString.contains("height"))
    assert(heights.collect().map(_.getLong(0)).sorted.toSeq === Seq(100L, 101L, 200L, 201L))
  }
}
