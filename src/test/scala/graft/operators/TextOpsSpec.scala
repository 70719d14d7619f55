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

  test("ngram novelty: doc 0 is fully novel, rates bounded, counts partition") {
    val rows = TextOps.ngramNovelty(spark, sfDir).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_novel"), r.getAs[Double]("novelty"))).toMap
    // the lowest doc_id in the corpus can only contain first-seen trigrams
    val firstDoc = byDoc.keys.min
    assert(byDoc(firstDoc)._1 === byDoc(firstDoc)._2,
      "the first document's trigrams are all novel by definition")
    byDoc.values.foreach { case (n, novel, rate) =>
      assert(novel <= n && rate >= 0.0 && rate <= 1.0)
    }
    // every distinct trigram is novel in exactly ONE document: the novel
    // counts must sum to the corpus's distinct-trigram count
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, sfDir)
    val distinctTris = d.select(split(trim(col("text")), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(explode(array_distinct(transform(
        sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2), element_at(col("ws"), i + 3))))).as("ng"))
      .select("ng").distinct().count()
    assert(byDoc.values.map(_._2).sum === distinctTris)
  }

  test("lm cross-entropy is positive, bounded, and replay-stable") {
    val r1 = TextOps.lmScore(spark, sfDir).collect()
    assert(r1.nonEmpty)
    // add-one smoothing bounds every token's surprisal by ln(T + V), so
    // cross-entropy lives in (0, ln(T+V)]
    r1.foreach { r =>
      val ce = r.getAs[Double]("cross_entropy")
      assert(ce > 0.0 && ce < 25.0, s"implausible cross-entropy $ce")
    }
    val r2 = TextOps.lmScore(spark, sfDir).collect()
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq, "replay-stable")
    // in-vocabulary synthetic text must score far below the OOV ceiling:
    // the corpus shares one small vocabulary, so the average doc is fluent
    val mean = r1.map(_.getAs[Double]("cross_entropy")).sum / r1.length
    assert(mean < 10.0, s"mean cross-entropy $mean looks like an OOV-only score")
  }

  test("zipf head: dense ranks, nonincreasing counts, bounded shares") {
    val rows = TextOps.zipf(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to rows.length.toLong))
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "counts must fall (or tie) as rank grows")
    val shares = rows.map(_.getAs[Double]("share"))
    assert(shares.forall(s => s > 0.0 && s <= 1.0))
    assert(shares.sum <= 1.0 + 1e-9, "head shares cannot exceed the corpus")
  }
}
