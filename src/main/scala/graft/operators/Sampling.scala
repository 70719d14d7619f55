package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.BarrierOps
import graft.plans.TopKPerKey

/** Corpus-sampling / training-set-assembly operators over `documents` —
  * the selection half of a large-scale training-data pipeline (the dedup
  * suite is the removal half).
  *
  * Everything here is DETERMINISTIC: sampling decisions hash stable keys
  * (`md5(seed || doc_id)`) instead of calling `rand()`, so a re-run — or a
  * replay of one failed partition at 100 TB — selects exactly the same
  * rows, results are DuckDB-oracle-checkable, and changing the seed string
  * re-draws the sample. Hex md5 prefixes compare lexicographically =
  * numerically (fixed-width lowercase hex), so a rate r is the threshold
  * `hex(floor(r * 16^8))` over the first 8 hex chars.
  */
object Sampling {

  private def trunc4(c: Column): Column = floor(c * lit(1e4)) / lit(1e4)

  /** First 8 md5 hex chars of `seed:doc_id` — a uniform draw in [0, 16^8). */
  private[operators] def draw(seed: String): Column =
    substring(md5(concat(lit(seed + ":"), col("doc_id").cast("string")).cast("binary")), 1, 8)

  /** Stratified downsampling with per-language rates: high-resource
    * strata are thinned (en 25%), the rest kept at 75% — the standard
    * rebalancing step before training-set assembly. Pure filter over a
    * single scan: no shuffle, no state, embarrassingly parallel at any
    * scale.
    */
  def stratified(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(draw("strat") <
        when(col("lang") === "en", lit("40000000")).otherwise(lit("c0000000")))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  val stratifiedOracle: String =
    """SELECT doc_id, lang, source FROM documents
       WHERE substring(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8)
             < CASE WHEN lang = 'en' THEN '40000000' ELSE 'c0000000' END
       ORDER BY doc_id"""

  /** Deterministic train/val/test assignment — the split step every
    * training pipeline runs, as a pure hash of the stable key (never
    * `rand()`): a document's split is a FUNCTION of its id, so re-runs,
    * partition replays, and incremental ingest extend the split
    * consistently — a doc can never migrate between train and test
    * across runs (the leakage a random split invites). The first hex
    * nibble of the draw buckets 16 ways: 12 train / 2 val / 2 test
    * (75/12.5/12.5). Reported per (split, lang) with within-language
    * shares — the balance check that catches a skewed split before
    * training does. Pure projection + one bounded aggregation.
    */
  def kfoldSplit(spark: SparkSession, dir: String): DataFrame = {
    val nib = substring(draw("split"), 1, 1)
    val split = when(nib.between("0", "b"), lit("train"))
      .when(nib.between("c", "d"), lit("val"))
      .otherwise(lit("test"))
    val perLang = Window.partitionBy(col("lang"))
    Tables.documents(spark, dir)
      .select(col("lang"), split.as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        floor(col("n_docs") * lit(1e4) / sum(col("n_docs")).over(perLang)) / lit(1e4))
      .orderBy("split", "lang")
  }

  val kfoldSplitOracle: String =
    """WITH s AS (
         SELECT lang,
                CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)
                          BETWEEN '0' AND 'b' THEN 'train'
                     WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)
                          BETWEEN 'c' AND 'd' THEN 'val'
                     ELSE 'test' END AS split
         FROM documents)
       SELECT split, lang, count(*) AS n_docs,
              floor(count(*) * 1e4 /
                    sum(count(*)) OVER (PARTITION BY lang)) / 1e4 AS share
       FROM s GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Epoch/repetition schedule: low-resource strata are up-sampled by an
    * integer repeat factor and EXPLODED into per-epoch rows — the
    * "repeat under-represented sources N times per training epoch" step
    * of real data mixtures (multi-epoch up-sampling rather than
    * duplication at rest). A pure `sequence` explode: no shuffle, no
    * state, fanout bounded by the largest factor, and deterministic —
    * replays assemble the identical epoch stream.
    */
  def epochSchedule(spark: SparkSession, dir: String): DataFrame = {
    val repeats = when(col("lang") === "en", lit(1L))
      .when(col("lang").isin("es", "zh"), lit(2L))
      .otherwise(lit(3L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), repeats)).as("epoch"))
      .orderBy("doc_id", "epoch")
  }

  val epochScheduleOracle: String =
    """SELECT doc_id, lang,
         CAST(unnest(generate_series(1,
           CASE WHEN lang = 'en' THEN 1
                WHEN lang IN ('es', 'zh') THEN 2
                ELSE 3 END)) AS BIGINT) AS epoch
       FROM documents ORDER BY doc_id, epoch"""

  /** Fixed-size uniform sample per stratum (k = 20 per language):
    * deterministic "reservoir" — the k smallest hash draws win. Runs on
    * [[TopKPerKey]], the bounded-heap plan node: per-partition heaps of
    * size k + one hash shuffle, never a full per-key sort at scale.
    */
  def reservoir(spark: SparkSession, dir: String): DataFrame =
    TopKPerKey.perKey(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"), draw("resv").as("d")),
        Seq(col("lang")), Seq(col("d").asc, col("doc_id").asc), 20)
      .select(col("lang"), col("doc_id"), col("rank").cast("long").as("rank"))
      .orderBy("lang", "rank")

  val reservoirOracle: String =
    """SELECT lang, doc_id, CAST(rank AS BIGINT) AS rank FROM (
         SELECT lang, doc_id,
                row_number() OVER (PARTITION BY lang
                  ORDER BY substring(md5('resv:' || CAST(doc_id AS VARCHAR)), 1, 8),
                           doc_id) AS rank
         FROM documents)
       WHERE rank <= 20 ORDER BY lang, rank"""

  /** Importance (quality-weighted) sampling: a document's keep
    * probability is its quality score scaled by a base rate — high-quality
    * text is oversampled, junk is thinned, the standard quality-mixing
    * step before training. Deterministic: the hash draw (mapped into
    * [0, 1)) is kept iff below `rate × quality`, so replays keep the same
    * rows. One scan, one filter, no shuffle; the quality score itself is
    * the codegen'd TextOps projection.
    */
  def weighted(spark: SparkSession, dir: String): DataFrame = {
    val rate = 0.9
    // first 8 md5 hex chars as a fraction of 16^8 — uniform in [0, 1)
    val u = conv(draw("wsamp"), 16, 10).cast("double") / lit(4294967296.0)
    TextOps.qualityScores(spark, dir).select(col("doc_id"), col("quality"))
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
      .filter(u < lit(rate) * col("quality"))
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy("doc_id")
  }

  val weightedOracle: String =
    """WITH q AS (%s)
       SELECT q.doc_id, d.lang, q.quality
       FROM q JOIN documents d ON q.doc_id = d.doc_id
       WHERE ('0x' || substring(md5('wsamp:' || CAST(q.doc_id AS VARCHAR)), 1, 8))::BIGINT
             / 4294967296.0 < 0.9 * q.quality
       ORDER BY q.doc_id""".format(TextOps.qualityOracle)

  /** Nucleus (top-p) source selection: rank sources by document count and
    * keep the smallest set covering 80% of the corpus — the "trim the
    * long tail of scrapes" step. The window is global but runs over the
    * per-source AGGREGATE (bounded domain: one row per source), the same
    * bounded-global-window pattern as ev_daily_stats.
    */
  def topPSources(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val ord = Window.orderBy(col("n_docs").desc, col("source"))
    // all cumulative arithmetic stays on exact integers; doubles appear
    // only at the output edge (identical division order to the oracle)
    counts
      .withColumn("cum_n", sum(col("n_docs")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n_docs")).over())
      // keep sources until the cumulative share CROSSES p (the crossing
      // source is included so coverage is >= p)
      .filter((col("cum_n") - col("n_docs")) / col("total") < 0.8)
      .select(col("source"), col("n_docs"),
        trunc4(col("n_docs") / col("total")).as("share"),
        trunc4(col("cum_n") / col("total")).as("cum_share"))
      .orderBy(col("n_docs").desc, col("source"))
  }

  val topPSourcesOracle: String =
    """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       s AS (SELECT source, n_docs,
               sum(n_docs) OVER (ORDER BY n_docs DESC, source
                 ROWS UNBOUNDED PRECEDING) AS cum_n,
               sum(n_docs) OVER () AS total
             FROM c)
       SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
              floor(n_docs * 1.0 / total * 1e4) / 1e4 AS share,
              floor(cum_n * 1.0 / total * 1e4) / 1e4 AS cum_share
       FROM s WHERE (cum_n - n_docs) * 1.0 / total < 0.8
       ORDER BY n_docs DESC, source"""

  /** Token-budget packing: assign documents to fixed-budget training
    * sequences (512 whitespace tokens) within each language, in doc_id
    * order — sequence id and offset come from the running token count, so
    * a document lands in the sequence its prefix sum starts in.
    *
    * Scale shape — two-phase SEGMENTED prefix sum, not a per-language
    * window: language cardinality is tiny, so `partitionBy(lang)` would
    * sort most of a 100 TB corpus on one reducer. Instead documents are
    * bucketed into fixed doc_id blocks; phase 1 computes per-(lang,
    * block) token totals (a hash agg over the corpus); phase 2 runs the
    * ordered prefix sum over the per-block totals — the bounded domain
    * (≈ corpus/block rows) where a global window is fine; phase 3 adds
    * the block offset to an intra-block running sum, whose window
    * partitions are capped at `blockSize` documents. The result is
    * bit-identical to the naive per-language window at any partitioning.
    */
  def packTokenBudget(spark: SparkSession, dir: String): DataFrame =
    packDocs(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens")),
      budget = 512)

  /** The segmented-prefix-sum packing core over any (doc_id, lang,
    * n_tokens) frame — shared by [[packTokenBudget]] and
    * [[Pipeline.trainingSet]].
    */
  private[operators] def packDocs(toksIn: DataFrame, budget: Int): DataFrame = {
    val blockSize = 1000L // documents per segment; caps every window partition
    // NOT barriered, deliberately (measured r14-opt): the two branches
    // (block totals + offset join) do re-read the input lineage, but
    // every expensive stage a composer feeds this (pipe_training_set's
    // near-dup candidates, signatures) is already materialized behind
    // its own internal barrier, so the re-read is joins over
    // block-manager frames — an extra eager localCheckpoint here
    // measured ~1 s SLOWER at sf0.1 than the re-read it avoids
    val toks = toksIn.withColumn("block", floor(col("doc_id") / blockSize))
    val blockTotals = toks.groupBy(col("lang"), col("block"))
      .agg(sum(col("n_tokens")).as("block_tokens"))
    val byLangBlocks = Window.partitionBy(col("lang")).orderBy(col("block"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blockOffsets = blockTotals
      .withColumn("block_start",
        sum(col("block_tokens")).over(byLangBlocks) - col("block_tokens"))
      .select(col("lang"), col("block"), col("block_start"))
    val inBlock = Window.partitionBy(col("lang"), col("block")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .join(blockOffsets, Seq("lang", "block"))
      .withColumn("start",
        col("block_start") + sum(col("n_tokens")).over(inBlock) - col("n_tokens"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("start") / budget).cast("long").as("seq_id"),
        (col("start") % budget).as("seq_offset"))
      .orderBy("doc_id")
  }

  /** Temperature-balanced multilingual sampling (α = 0.5): per-language
    * keep rates flatten the language distribution toward p^α — the
    * standard rebalancing for multilingual training corpora, where
    * high-resource languages are thinned and the rarest is kept whole.
    * rate(l) = sqrt(n_min / n_l): derived from p^(α−1) normalized so the
    * smallest language keeps 100%. The rates frame is one row per
    * language (a 1-row global min cross-joined in), so the whole operator
    * is two tiny broadcast joins over a single corpus scan plus the
    * deterministic per-doc hash draw — no shuffle of document rows.
    */
  def temperature(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_l")).as("n_min"))))
      .select(col("lang"), sqrt(col("n_min") / col("n_l")).as("rate"))
    val u = conv(draw("temp"), 16, 10).cast("double") / lit(4294967296.0)
    d.join(broadcast(rates), "lang")
      .filter(u < col("rate"))
      .select(col("doc_id"), col("lang"), trunc4(col("rate")).as("keep_rate"))
      .orderBy("doc_id")
  }

  val temperatureOracle: String =
    """WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
       r AS (SELECT lang, sqrt((SELECT min(n_l) FROM c) * 1.0 / n_l) AS rate
             FROM c)
       SELECT doc_id, d.lang, floor(rate * 1e4) / 1e4 AS keep_rate
       FROM documents d JOIN r ON d.lang = r.lang
       WHERE ('0x' || substring(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             / 4294967296.0 < rate
       ORDER BY doc_id"""

  /** Target-mixture composition: downsample every source toward EQUAL
    * representation — the data-mixing step that turns "whatever the crawl
    * yielded" into the mixture a training run actually wants. Per-source
    * keep rate = min(1, N/(S·n_s)) (N total docs, S sources, n_s source
    * size): over-represented sources are thinned to the uniform share,
    * under-represented ones pass whole (rate capped at 1 — sampling can't
    * invent data). The rate table is a tiny broadcast; the keep decision
    * is the deterministic [[draw]] per document, so replays and retries
    * compose the identical mixture. Output is the per-source audit
    * (original vs kept vs rate); swap the uniform target for any share
    * vector without touching the plan shape.
    */
  def targetMix(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val stats = d.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
      // feeds the totals aggregate, the join and the audit — once
      .barrier()
    val tot = stats.agg(sum(col("n_src")).as("n_tot"), count(lit(1)).as("n_srcs"))
    val rates = stats.crossJoin(broadcast(tot))
      .select(col("source"), col("n_src"),
        least(lit(1.0),
          col("n_tot").cast("double") / (col("n_srcs") * col("n_src")))
          .as("rate"))
    val u = conv(draw("mix"), 16, 10).cast("double") / lit(4294967296.0)
    val kept = d.join(broadcast(rates), "source")
      .filter(u < col("rate"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_src").as("n_orig"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        trunc4(col("rate")).as("rate"))
      .orderBy("source")
  }

  val targetMixOracle: String =
    """WITH s AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
       t AS (SELECT CAST(sum(n_src) AS BIGINT) AS n_tot, count(*) AS n_srcs
             FROM s),
       r AS (SELECT source, n_src,
               least(1.0, CAST(n_tot AS DOUBLE) / (n_srcs * n_src)) AS rate
             FROM s, t),
       k AS (SELECT d.source, count(*) AS n_kept
             FROM documents d JOIN r ON d.source = r.source
             WHERE ('0x' || substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 < rate
             GROUP BY 1)
       SELECT r.source, CAST(r.n_src AS BIGINT) AS n_orig,
              CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
              floor(rate * 1e4) / 1e4 AS rate
       FROM r LEFT JOIN k ON r.source = k.source ORDER BY 1"""

  /** Duplicate-penalized sampling (the D4/"dedup via downweighting"
    * shape): each document survives with probability 1/m where m is its
    * exact-duplicate cluster size, so every duplicate cluster contributes
    * ONE expected document to the training mix without a hard dedup pass
    * — repeated boilerplate is thinned in proportion to its redundancy
    * while unique text is untouched (m = 1 → always kept).
    *
    * Determinism: the keep decision is the [[draw]] 32-bit hash compared
    * against the exact integer threshold 2³² div m — integer division,
    * no float rate — so replays, retries, and both engines draw the
    * identical sample.
    *
    * Scale shape: digest the text once (rows shuffle as 16-byte md5 +
    * id, never text — the [[graft.operators.Dedup.exact]] discipline),
    * one hash agg for cluster sizes, one join back on the digest, then
    * the per-row draw. Cluster sizes are a skew-safe aggregate
    * (map-side combine absorbs a 10⁹-copy boilerplate key).
    */
  def dedupPenalized(spark: SparkSession, dir: String): DataFrame =
    dedupPenalizedOn(Tables.fanout(Tables.documents(spark, dir)))

  /** The penalized-draw core over any (doc_id, text) frame — split out so
    * specs can drive it with synthetic duplicate clusters (the driver
    * corpus has none below sf0.1, which would leave the m > 1 threshold
    * path untested at the gate's own scale).
    */
  private[operators] def dedupPenalizedOn(docs: DataFrame): DataFrame = {
    import graft.Tables.BarrierOps
    val d = docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("dig"))
      .barrier() // cluster sizes + the kept set read this
    val sizes = d.groupBy(col("dig")).agg(count(lit(1)).as("n_copies"))
    d.join(sizes, "dig")
      .filter(conv(draw("pen"), 16, 10).cast("long") <
        expr("CAST(4294967296 AS BIGINT) div n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy("doc_id")
  }

  val dedupPenalizedOracle: String =
    """WITH d AS (SELECT doc_id, md5(text) AS dig FROM documents),
       s AS (SELECT dig, count(*) AS n_copies FROM d GROUP BY 1)
       SELECT doc_id, CAST(n_copies AS BIGINT) AS n_copies
       FROM d JOIN s USING (dig)
       WHERE ('0x' || substring(md5('pen:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             < 4294967296 // n_copies
       ORDER BY doc_id"""

  val packTokenBudgetOracle: String =
    """WITH t AS (SELECT doc_id, lang,
                    len(string_split_regex(trim(text), '\s+')) AS n_tokens
                  FROM documents),
       r AS (SELECT doc_id, lang, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) - n_tokens AS start
             FROM t)
       SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
              CAST(start // 512 AS BIGINT) AS seq_id,
              CAST(start % 512 AS BIGINT) AS seq_offset
       FROM r ORDER BY doc_id"""
}
