package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.TopKPerKey

/** URL/domain-level curation — the knobs a crawl pipeline applies BEFORE
  * any content filter looks at a byte of text (the C4 recipe: drop
  * blocklisted domains, cap any one domain's share of the corpus). In the
  * reference's terms this is the source-routing whitelist discipline
  * (process_events.go:49-61) applied to a crawl's provenance column
  * instead of an event-type column.
  *
  * Both operators key on `documents.source` (the testdata's provenance
  * column — a real crawl's registrable domain after URL normalization,
  * which would be one extra projection upstream).
  */
object Curation {

  /** Domains a curation pipeline refuses outright (license, spam, adult,
    * PII-heavy). A deployment loads this from a maintained table; the
    * fixed set here stands in for it and keeps the result
    * oracle-checkable.
    */
  private[operators] val Blocklist = Seq("src3", "src7", "src11", "src18")

  /** Blocklist gate: every document from a blocked domain drops; the
    * survivors pass through unchanged. The blocklist is a broadcast
    * LEFT ANTI join, not an `IN` literal — the list is a TABLE in any
    * real pipeline (tens of thousands of domains, maintained
    * independently of the query), and the anti-join keeps the same plan
    * shape when it grows from 4 rows to 10⁵: a broadcast hash probe per
    * scan row, no shuffle of the corpus.
    */
  def blocklistGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bl = Blocklist.toDF("source")
    Tables.documents(spark, dir)
      // Unknown provenance does NOT pass a provenance gate: a NULL source
      // drops here, explicitly. (Spark's left_anti KEEPS a null-key row
      // while SQL's NOT IN yields NULL for it — this filter makes the two
      // agree instead of leaving a latent engine divergence.)
      .filter(col("source").isNotNull)
      .join(broadcast(bl), Seq("source"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy("doc_id")
  }

  val blocklistGateOracle: String =
    """SELECT doc_id, source, lang FROM documents
       WHERE source NOT IN ('src3', 'src7', 'src11', 'src18')
       ORDER BY doc_id"""

  /** Per-domain cap: keep at most N = 20 documents per source, choosing
    * the HIGHEST-QUALITY ones (quality desc, doc_id tie-break) — the
    * "no single domain dominates the mixture" cap every crawl-scale
    * corpus applies, here quality-aware so the cap keeps each domain's
    * best material rather than an arbitrary slice.
    *
    * Scale shape: the key space is every domain — the high-cardinality
    * regime [[TopKPerKey]] exists for. Bounded per-key heaps on both
    * sides of ONE hash shuffle (map-side partial heaps absorb a
    * mega-domain's rows before the exchange), never a per-domain window
    * sort; the quality score joins in from the codegen'd
    * [[TextOps.quality]] projection on the same corpus scan.
    */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val q = TextOps.qualityScores(spark, dir).select(col("doc_id"), col("quality"))
    TopKPerKey.perKey(
        docs.join(q, "doc_id"),
        Seq(col("source")), Seq(col("quality").desc, col("doc_id").asc), 20)
      .select(col("source"), col("doc_id"), col("quality"),
        col("rank").cast("long").as("cap_rank"))
      .orderBy("source", "cap_rank")
  }

  val domainCapOracle: String =
    """WITH q AS (%s),
       r AS (SELECT d.source, d.doc_id, q.quality,
               row_number() OVER (PARTITION BY d.source
                 ORDER BY q.quality DESC, d.doc_id) AS cap_rank
             FROM q JOIN documents d USING (doc_id))
       SELECT source, doc_id, quality, CAST(cap_rank AS BIGINT) AS cap_rank
       FROM r WHERE cap_rank <= 20 ORDER BY source, cap_rank"""
      .format(TextOps.qualityOracle)
}
