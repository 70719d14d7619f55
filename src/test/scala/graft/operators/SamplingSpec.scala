package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("stratified sampling is deterministic and thins strata at their rates") {
    val s1 = Sampling.stratified(spark, sfDir).collect()
    val s2 = Sampling.stratified(spark, sfDir).collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq,
      "re-running must select exactly the same rows")
    val total = graft.Tables.documents(spark, sfDir)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s1.groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length.toLong }
    // en is thinned to 25%, the rest kept at 75% (binomial tolerance)
    kept.foreach { case (lang, n) =>
      val rate = n.toDouble / total(lang)
      val want = if (lang == "en") 0.25 else 0.75
      assert(math.abs(rate - want) < 0.15, s"$lang kept $rate, wanted ~$want")
    }
  }

  test("reservoir keeps exactly k per stratum with dense ranks") {
    val r = Sampling.reservoir(spark, sfDir).collect()
    val perLang = r.groupBy(_.getString(0))
    perLang.foreach { case (lang, rows) =>
      assert(rows.length === 20, s"$lang must keep exactly k=20")
      assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to 20L),
        s"$lang ranks must be dense 1..20")
    }
    // deterministic: same draw on re-run
    val again = Sampling.reservoir(spark, sfDir).collect()
    assert(r.map(_.getLong(1)).toSet === again.map(_.getLong(1)).toSet)
  }

  test("weighted sampling favors high-quality documents deterministically") {
    val s1 = Sampling.weighted(spark, sfDir).collect()
    val s2 = Sampling.weighted(spark, sfDir).collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq, "replay-stable")
    val keptQ = s1.map(_.getAs[Double]("quality"))
    val allQ = TextOps.quality(spark, sfDir).collect().map(_.getAs[Double]("quality"))
    assert(s1.length > 0 && s1.length < allQ.length)
    // importance sampling must tilt the kept distribution upward
    assert(keptQ.sum / keptQ.length > allQ.sum / allQ.length,
      "kept average quality must exceed the corpus average")
  }

  test("top-p sources cover at least p and drop the tail") {
    val rows = Sampling.topPSources(spark, sfDir).collect()
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.max >= 0.8 - 1e-4, "kept set must cover p")
    // every kept source except the crossing one starts below p
    val shares = rows.map(_.getAs[Double]("share"))
    rows.indices.foreach { i =>
      assert(cums(i) - shares(i) < 0.8 + 1e-9)
    }
    val nSources = graft.Tables.documents(spark, sfDir)
      .select(countDistinct(col("source"))).head.getLong(0)
    assert(rows.length < nSources, "the long tail must actually be dropped")
  }

  test("token packing fills sequences in order with consistent offsets") {
    val rows = Sampling.packTokenBudget(spark, sfDir)
      .orderBy("lang", "doc_id").collect()
    rows.groupBy(_.getString(1)).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getAs[Long]("seq_id") === cum / 512)
        assert(r.getAs[Long]("seq_offset") === cum % 512)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("contamination: eval docs sharing 5-grams with train are flagged") {
    val rows = TextOps.contamination(spark, sfDir).collect()
    assert(rows.nonEmpty, "the hash split must produce eval docs")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_ngrams"); val c = r.getAs[Long]("n_contam")
      assert(c <= n, "contaminated count is bounded by the doc's n-grams")
      val rate = r.getAs[Double]("contam_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // the synthetic corpus has planted near-duplicates -> some contamination
    // must exist corpus-wide
    assert(rows.map(_.getAs[Long]("n_contam")).sum > 0,
      "a corpus with near-duplicate docs must show train/eval overlap")
  }

  test("dedup-penalized sampling thins clusters toward one survivor, keeps uniques whole") {
    import spark.implicits._
    // synthetic corpus: 200 unique docs + one 50-copy cluster + one
    // 10-copy cluster (the driver corpus has no exact dups below sf0.1,
    // so the m > 1 threshold path needs its own fixture)
    val uniq = (1L to 200L).map(i => (i, s"unique document body $i"))
    val big = (1000L to 1049L).map(i => (i, "the big duplicated boilerplate"))
    val small = (2000L to 2009L).map(i => (i, "the small duplicated footer"))
    val docs = (uniq ++ big ++ small).toDF("doc_id", "text")
    val kept = Sampling.dedupPenalizedOn(docs).collect()
    val byId = kept.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    // every unique doc survives (threshold 2^32 div 1 beats any draw)
    assert((1L to 200L).forall(byId.get(_).contains(1L)),
      "unique documents must never be thinned")
    // clusters are penalized: a 50-copy cluster keeps ~1 expected doc;
    // the draw is deterministic, so just assert strict thinning and that
    // survivors carry the cluster size
    val bigKept = kept.filter(_.getAs[Long]("n_copies") == 50L)
    val smallKept = kept.filter(_.getAs[Long]("n_copies") == 10L)
    assert(bigKept.length < 10, s"50-copy cluster kept ${bigKept.length}")
    assert(smallKept.length < 5, s"10-copy cluster kept ${smallKept.length}")
    // deterministic replay
    val again = Sampling.dedupPenalizedOn(docs).collect()
      .map(_.getAs[Long]("doc_id")).sorted
    assert(again.toSeq === kept.map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }
}
