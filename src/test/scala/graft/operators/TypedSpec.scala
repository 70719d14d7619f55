package graft.operators

import graft.{SparkSpec, Tables}

class TypedSpec extends SparkSpec {

  test("typed dataset round-trips every document through case classes") {
    val ds = Typed.docs(spark, sfDir)
    val summaries = Typed.summarize(ds).collect()
    assert(summaries.length === Tables.documents(spark, sfDir).count())
    summaries.foreach { s =>
      assert(Set("short", "medium", "long").contains(s.quality_band))
      assert(s.words > 0)
    }
  }

  test("typed filter pushes down to the scan") {
    val ds = Typed.docs(spark, sfDir).filter(_.lang == "en")
    assert(ds.count() > 0)
    val typedCount = ds.count()
    val untyped = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("lang") === "en").count()
    assert(typedCount === untyped)
  }
}
