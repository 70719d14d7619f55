package graft.operators

import graft.SparkSpec

/** Partition-invariance pins: every deterministic operator must produce
  * IDENTICAL rows whatever the shuffle layout — on a cluster, partition
  * counts change with executor counts, AQE coalescing, and retries, so
  * any partition-order dependence is a latent wrong-results bug (the
  * class of failure behind nondeterministic tie-breaks and fold-order
  * floats). Representative operators from each family run under three
  * shuffle-partition settings and must match exactly.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private def withPartitions[T](n: Int)(f: => T): T = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  private def rowsOf(f: => org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    f.collect().map(_.toSeq.map {
      case a: Array[_] => a.toSeq
      case x => x
    }.toSeq).toSeq

  test("representative operators are identical under 3, 8 and 32 shuffle partitions") {
    val ops: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "ema" -> (() => Events.ema(spark, sfDir)),
      "ngram_jaccard" -> (() => Dedup.ngramJaccard(spark, sfDir)),
      "components" -> (() => Dedup.components(spark, sfDir)),
      "pack_token_budget" -> (() => Sampling.packTokenBudget(spark, sfDir)),
      "reservoir" -> (() => Sampling.reservoir(spark, sfDir)),
      "tfidf" -> (() => TextOps.tfidf(spark, sfDir)),
      "contamination" -> (() => TextOps.contamination(spark, sfDir)),
      // round-4 operators
      "incremental_dedup" -> (() => Dedup.incremental(spark, sfDir)),
      "ngram_novelty" -> (() => TextOps.ngramNovelty(spark, sfDir)),
      "transition_matrix" -> (() => Events.transitionMatrix(spark, sfDir)),
      "attribution" -> (() => Events.attribution(spark, sfDir)),
      "kfold_split" -> (() => Sampling.kfoldSplit(spark, sfDir)),
      "inter_event" -> (() => Events.interEvent(spark, sfDir)),
      "epoch_schedule" -> (() => Sampling.epochSchedule(spark, sfDir)),
      "best_of_cluster" -> (() => Dedup.bestOfCluster(spark, sfDir)),
      "ivfpq_topk" -> (() => Similarity.ivfPqTopk(spark, sfDir)),
      // round-5 operators: corpus-frequency stitch (collect_list +
      // array_sort) and per-doc top-k under score ties
      "boilerplate" -> (() => TextOps.boilerplate(spark, sfDir)),
      "keywords" -> (() => TextOps.keywords(spark, sfDir)),
      // round-5 continuation: per-doc interval-union fold over a
      // collect_list whose input order varies with partitioning
      "dup_spans" -> (() => Dedup.dupSpans(spark, sfDir)),
      // sketch states must be commutative: HLL register-max, CMS cell
      // sums, Bloom bit-OR — estimates may not depend on merge order
      "hll_rollup" -> (() => Sketches.hllRollup(spark, sfDir)),
      "cms_user_counts" -> (() => Sketches.cmsUserCounts(spark, sfDir)),
      "contamination_bloom" -> (() => TextOps.contaminationBloom(spark, sfDir)),
      // 10 chained join+sum rounds: integer mass must make every round's
      // fold order irrelevant
      "pagerank" -> (() => Similarity.pagerank(spark, sfDir)),
      // iterative Lloyd rounds: integer-grid distances and floor'd
      // centroid means must survive any assignment fold order
      "kmeans" -> (() => Similarity.kmeans(spark, sfDir)),
      // per-doc sums of floor'd micro-unit scores: exact under any
      // postings partitioning
      "bm25" -> (() => TextOps.bm25(spark, sfDir)),
      // round-6: integer RRF of two bounded rankings, and a confusion
      // matrix whose centroid means are floor'd integer sums
      "hybrid_rrf" -> (() => TextOps.hybridRrf(spark, sfDir)),
      "centroid_classify" -> (() => Similarity.centroidClassify(spark, sfDir)),
      // round-7: kmeans composition + within-cluster max-cos pruning
      // (max over doubles is order-free; the iterative labels must be),
      // and the NB classifier's per-doc micro-logit long sums
      "semdedup" -> (() => Dedup.semDedup(spark, sfDir)),
      "nb_quality" -> (() => TextOps.nbQuality(spark, sfDir)),
      // per-domain cap: bounded-heap ranking under trunc4 quality ties
      "domain_cap" -> (() => Curation.domainCap(spark, sfDir)))
    ops.foreach { case (name, op) =>
      val results = Seq(3, 8, 32).map(n => withPartitions(n) {
        // drop cached ANN quantizers so index TRAINING re-runs under each
        // width too — otherwise runs 2 and 3 would pin only the serving
        // path against run 1's trained centroids/codebooks
        graft.functions.IvfIndex.clearCache()
        graft.functions.PqIndex.clearCache()
        rowsOf(op())
      })
      assert(results(0) === results(1),
        s"$name differs between 3 and 8 shuffle partitions")
      assert(results(1) === results(2),
        s"$name differs between 8 and 32 shuffle partitions")
    }
  }
}
