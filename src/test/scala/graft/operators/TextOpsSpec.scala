package graft.operators

import graft.{SparkSpec, Tables}

class TextOpsSpec extends SparkSpec {

  test("token counts are consistent") {
    TextOps.tokens(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("ws_tokens") > 0)
      assert(r.getAs[Long]("uniq_words") <= r.getAs[Long]("ws_tokens"))
      // every whitespace token is at least one regex token
      assert(r.getAs[Long]("re_tokens") >= r.getAs[Long]("ws_tokens"))
    }
  }

  test("quality score is bounded and ratios are in [0, 1]") {
    TextOps.quality(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Double]("stop_ratio") >= 0.0 && r.getAs[Double]("stop_ratio") <= 1.0)
      assert(r.getAs[Double]("uniq_ratio") > 0.0 && r.getAs[Double]("uniq_ratio") <= 1.0)
      assert(r.getAs[Double]("quality") > 0.0 && r.getAs[Double]("quality") <= 1.0)
    }
  }

  test("langid predicts a language for every doc") {
    val rows = TextOps.langid(spark, sfDir).collect()
    assert(rows.length === Tables.documents(spark, sfDir).count())
    val langs = Set("en", "es", "de", "fr", "zh")
    rows.foreach(r => assert(langs.contains(r.getAs[String]("pred_lang"))))
  }

  test("fingerprint groups partition the corpus") {
    val rows = TextOps.fingerprint(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === Tables.documents(spark, sfDir).count())
  }
}
