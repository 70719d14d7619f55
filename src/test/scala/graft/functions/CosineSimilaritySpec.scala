package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec, Tables}

class CosineSimilaritySpec extends SparkSpec {

  test("native expression is bit-equal to the higher-order-function form") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id"))
    val diff = pairs.select(
      CosineSimilarity(col("a"), col("b")).as("native"),
      Vec.cosine(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0, "native and HOF cosine must agree bit-for-bit")
  }

  test("expression participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sfDir)
    val plan = e.select(CosineSimilarity(col("embedding"), col("embedding")).as("c"))
      .queryExecution.executedPlan.toString
    // The "*(n)" prefix marks operators fused into a WholeStageCodegen stage.
    assert(plan.contains("*(1) Project [graft_cosine"), s"expected codegen in:\n$plan")
  }

  test("native expressions are SQL-callable once registered") {
    // Same registration GraftExtensions performs via spark.sql.extensions.
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    Tables.embeddings(spark, sfDir).limit(5).createOrReplaceTempView("emb_tmp")
    val rows = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM emb_tmp").collect()
    rows.foreach(r => assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-9))
    val ic = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS n").head()
    assert(ic.getAs[Int]("n") === 2)
    val sh = spark.sql(
      "SELECT graft_simhash64(array(1L, 2L, 3L)) AS h, graft_simhash64(array(1L, 2L, 3L)) AS h2")
      .head()
    assert(sh.getAs[Long]("h") === sh.getAs[Long]("h2"))
    val mk = spark.sql(
      "SELECT min_k_longs(v, 2) AS m FROM VALUES (5L), (1L), (9L), (3L) AS t(v)").head()
    assert(mk.getSeq[Long](0).toSeq === Seq(1L, 3L))
    val vs = spark.sql(
      "SELECT vec_sum(v) AS s FROM VALUES (array(1.0D, 2.0D)), (array(3.0D, 4.0D)) AS t(v)")
      .head()
    assert(vs.getSeq[Double](0).toSeq === Seq(4.0, 6.0))
    val sg = spark.sql(
      """SELECT graft_shingle_hash64(array('a', 'b', 'c', 'a', 'b', 'c'), 3) AS g,
                sort_array(array_distinct(array(
                  xxhash64('a b c'), xxhash64('b c a'), xxhash64('c a b')))) AS e""")
      .head()
    assert(sg.getSeq[Long](0).toSeq === sg.getSeq[Long](1).toSeq)
  }
}
