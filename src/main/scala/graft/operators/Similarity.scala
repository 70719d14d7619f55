package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{CosineSimilarity, Vec}
import graft.plans.TopKPerKey

/** Similarity search over the `embeddings` table.
  *
  * `topkBruteforce` is the exact baseline: broadcast the (small) query set
  * against a single scan of the corpus — at 100 TB this is the right plan
  * whenever the query side fits in memory, because it is one shuffle-free
  * pass plus a per-query top-k. `lshTopk` is the approximate scale path:
  * random-hyperplane signatures bucket the corpus so each query only scores
  * its own bucket (recall measured against the exact baseline in
  * SimilaritySpec).
  */
object Similarity {

  private def trunc4(c: Column): Column = floor(c * lit(1e4)) / lit(1e4)

  /** Exact cosine top-5 for each query vector (vec_id < 10). */
  def topkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = Tables.fanout(e.filter(col("vec_id") >= 10))
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("label"))
    val scored = broadcast(q).join(c)
      .select(col("query_id"), col("cand_id"), col("label"),
        CosineSimilarity(col("qe"), col("ce")).as("cos"))
    // Top-k via the custom bounded-heap operator (graft.plans.TopKPerKey):
    // same single hash shuffle as a window, no per-group full sort.
    TopKPerKey.perKey(scored, Seq(col("query_id")), Seq(col("cos").desc, col("cand_id")), 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("label"), trunc4(col("cos")).as("cosine"))
      .orderBy("query_id", "rank")
  }

  val topkBruteforceOracle: String =
    """WITH scored AS (
         SELECT a.vec_id AS query_id, b.vec_id AS cand_id, b.label,
           list_sum([(a.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE)
                     FOR i IN generate_series(1, len(a.embedding))])
           / (sqrt(list_sum([(x::DOUBLE) * (x::DOUBLE) FOR x IN a.embedding]))
              * sqrt(list_sum([(x::DOUBLE) * (x::DOUBLE) FOR x IN b.embedding]))) AS cos
         FROM embeddings a JOIN embeddings b ON b.vec_id >= 10
         WHERE a.vec_id < 10),
       ranked AS (
         SELECT query_id, cand_id, label, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
         FROM scored)
       SELECT query_id, rank, cand_id, label, floor(cos * 1e4) / 1e4 AS cosine
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Fixed pseudo-random hyperplanes (deterministic, seedless):
    * `tables` independent hash tables of `bitsPerTable` hyperplanes each.
    */
  // 8 tables × 6 bits: on a near-uniform corpus (this synthetic data has no
  // tight clusters; max cosine ≈ 0.5) each query scores ~12% of the corpus
  // for ~40-50% exact-top-k recall. On clustered real-world embeddings the
  // same construction prunes far harder at far higher recall — tune
  // (tables, bits) to the corpus distance profile.
  private val lshTables = 8
  private val lshBits = 6
  private[operators] val planes: Seq[Seq[Seq[Double]]] =
    (0 until lshTables).map(t =>
      (0 until lshBits).map(j =>
        (0 until 64).map(i => math.sin(1.0 + (t * lshBits + j) * 64.0 + i))))

  /** (table, bucket) signature pairs for one embedding — OR-construction:
    * a candidate matching in ANY table is considered.
    */
  private def bucketsOf(emb: Column): Column =
    array(planes.zipWithIndex.map { case (tablePlanes, t) =>
      struct(
        lit(t).as("tbl"),
        tablePlanes.zipWithIndex
          .map { case (p, j) =>
            when(Vec.dot(emb, typedLit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
          }
          .reduce(_ + _).as("bucket"))
    }: _*)

  /** Approximate top-3 per query via multi-table random-hyperplane LSH
    * (4 tables × 8 bits, OR-construction): each query scores only the union
    * of its buckets' members, a ~1/2^bits fraction of the corpus per table.
    * No SQL oracle (approximate by construction); recall vs
    * `topkBruteforce` is asserted in SimilaritySpec.
    */
  def lshTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanout(Tables.embeddings(spark, dir))
    val bucketed = e.select(
      col("vec_id"), col("embedding"),
      explode(bucketsOf(col("embedding"))).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      // query and candidate branches both read this — materialize once
      .localCheckpoint()
    val q = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("tbl"), col("bucket"))
    val c = bucketed.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("tbl"), col("bucket"))
    val scored = broadcast(q).join(c, Seq("tbl", "bucket"))
      .select(col("query_id"), col("cand_id"), col("qe"), col("ce"))
      .dropDuplicates("query_id", "cand_id")
      .select(col("query_id"), col("cand_id"), CosineSimilarity(col("qe"), col("ce")).as("cos"))
    TopKPerKey.perKey(scored, Seq(col("query_id")), Seq(col("cos").desc, col("cand_id")), 3)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), trunc4(col("cos")).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into cells; each query probes only its
    * `nprobe` nearest cells. The other classic ANN scale path next to
    * hyperplane LSH — at 100 TB the assignment is one pass, cells are the
    * shuffle key, and the trained centroids (k×dim doubles) broadcast for
    * free. Deterministic via a fixed seed. No SQL oracle (approximate);
    * recall vs `topkBruteforce` asserted in SimilaritySpec.
    */
  def ivfTopk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val nCells = 16
    val nprobe = 4
    val e = Tables.fanout(Tables.embeddings(spark, dir)).localCheckpoint()
    val feat = e.withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5).fit(feat)
    val assigned = model.transform(feat)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
      .localCheckpoint()
    // Broadcastable centroid table: (cell, centroid array).
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq)
      .toDF("cell", "centroid")
    // Each query probes its nprobe nearest cells (euclidean to centroid).
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val dist2 = aggregate(
      zip_with(col("qe"), col("centroid"), (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    val probed = TopKPerKey.perKey(
        broadcast(q).join(centroids).select(col("query_id"), col("qe"), col("cell"), dist2.as("d2")),
        Seq(col("query_id")), Seq(col("d2"), col("cell")), nprobe)
      .select(col("query_id"), col("qe"), col("cell"))
    val cands = assigned.filter(col("vec_id") >= 10)
      .select(col("cell"), col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val scored = broadcast(probed).join(cands, "cell")
      .select(col("query_id"), col("cand_id"), CosineSimilarity(col("qe"), col("ce")).as("cos"))
      .dropDuplicates("query_id", "cand_id")
    TopKPerKey.perKey(scored, Seq(col("query_id")), Seq(col("cos").desc, col("cand_id")), 3)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), trunc4(col("cos")).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Cross-modal join: documents ↔ embeddings on id, per-language norm
    * stats — the text-plus-vector join a multimodal pipeline runs
    * constantly. Embedding side reduced to (id, norm) before the join.
    */
  def docEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val e = Tables.fanout(Tables.embeddings(spark, dir))
      .select(col("vec_id"), Vec.norm(col("embedding")).as("nrm"))
    d.join(e, col("doc_id") === col("vec_id"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        trunc4(sum(col("nrm")) / count(lit(1))).as("avg_norm"))
      .orderBy("lang")
  }

  val docEmbeddingOracle: String =
    """WITH n AS (
         SELECT vec_id,
           sqrt(list_sum([(x::DOUBLE) * (x::DOUBLE) FOR x IN embedding])) AS nrm
         FROM embeddings)
       SELECT lang, count(*) AS n_docs,
         floor(sum(nrm) / count(*) * 1e4) / 1e4 AS avg_norm
       FROM documents JOIN n ON doc_id = vec_id
       GROUP BY 1 ORDER BY 1"""

  /** Per-label L2-norm statistics (vector algebra smoke over the corpus). */
  def embNorms(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanout(Tables.embeddings(spark, dir))
    val withNorm = e.select(col("label"), Vec.norm(col("embedding")).as("nrm"))
    withNorm.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        trunc4(min(col("nrm"))).as("min_norm"),
        trunc4(max(col("nrm"))).as("max_norm"),
        trunc4(sum(col("nrm")) / count(lit(1))).as("avg_norm"))
      .orderBy("label")
  }

  val embNormsOracle: String =
    """WITH n AS (
         SELECT label,
           sqrt(list_sum([(x::DOUBLE) * (x::DOUBLE) FOR x IN embedding])) AS nrm
         FROM embeddings)
       SELECT label, count(*) AS n_vectors,
         floor(min(nrm) * 1e4) / 1e4 AS min_norm,
         floor(max(nrm) * 1e4) / 1e4 AS max_norm,
         floor(sum(nrm) / count(*) * 1e4) / 1e4 AS avg_norm
       FROM n GROUP BY label ORDER BY label"""
}
