package graft.operators

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

import graft.Tables

/** Typed `Dataset[T]` face over the corpus tables — for pipeline stages
  * where compile-time row types pay (multi-step curation logic, library
  * API boundaries). Encoders are case-class derived; the typed filters
  * below still compile to Catalyst predicates where expressible, and the
  * typed map stages run on the deserialized objects.
  */
object Typed {

  case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  case class DocSummary(doc_id: Long, lang: String, words: Int, quality_band: String)

  def docs(spark: SparkSession, dir: String): Dataset[Doc] =
    Tables.documents(spark, dir).as(Encoders.product[Doc])

  /** Typed curation stage: classify documents into quality bands. */
  def summarize(ds: Dataset[Doc]): Dataset[DocSummary] =
    ds.map { d =>
      val words = d.text.trim.split("\\s+").length
      val band =
        if (words >= 60) "long"
        else if (words >= 30) "medium"
        else "short"
      DocSummary(d.doc_id, d.lang, words, band)
    }(Encoders.product[DocSummary])
}
