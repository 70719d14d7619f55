package graft

import org.apache.spark.sql.functions._

/** Invariants of the ScaleUp replica transforms — the credibility of
  * every multi-SF bench artifact rests on these: the scaled data must be
  * MORE of the same workload (each copy a new entity with the source's
  * statistical character), never verbatim duplication (which would turn
  * dedup/ANN benches into a different, trivially-clustered workload).
  */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  private val Copies = 40 // 4 outer char-rotation levels (inner = 10)

  // ten 12-word docs of distinct multi-char words, plus one doc built
  // ONLY of period-2/3 words (the shape the old shared-shift outer level
  // collapsed across levels at Δa = lcm ≤ 6)
  private lazy val docs = {
    val normal = (0L until 10L).map { i =>
      val words = (0 until 12).map(j => f"w${i}%02dx${j}%02d")
      (i, words.mkString(" "))
    }
    // ≥ 10 words (docs below the inner rotation count collide within a
    // level by pigeonhole — the documented short-doc residual, not what
    // this corpus probes)
    val periodic = (10L,
      "abab cdcd efef ghgh xyxy haha bebe ababab cdcdcd qrqrqr toto susu")
    (normal :+ periodic).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private lazy val scaled = ScaleUp.scaledDocuments(docs, Copies).cache()

  test("copy 0 is byte-identical to the source corpus") {
    val back = scaled.filter(col("doc_id") < ScaleUp.DocStride)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    val src = docs.select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(back === src)
  }

  test("every copy preserves word count, word-length multiset, and char multiset") {
    val bad = scaled
      .withColumn("src", pmod(col("doc_id"), lit(ScaleUp.DocStride)))
      .join(docs.select(col("doc_id").as("src"), col("text").as("stext")), "src")
      .select("src", "doc_id", "text", "stext").as[(Long, Long, String, String)]
      .collect().filter { case (_, _, t, s) =>
        def lens(x: String) = x.split("\\s+").map(_.length).sorted.toSeq
        def chars(x: String) = x.replace(" ", "").sorted
        lens(t) != lens(s) || chars(t) != chars(s)
      }
    assert(bad.isEmpty,
      s"copies must be rearrangements, got ${bad.take(2).mkString("; ")}")
  }

  test("no minted duplicates across 4 outer levels for multi-char-word docs") {
    val dups = scaled
      .filter(pmod(col("doc_id"), lit(ScaleUp.DocStride)) < 10) // normal docs
      .withColumn("src", pmod(col("doc_id"), lit(ScaleUp.DocStride)))
      .groupBy("src", "text").count().filter(col("count") > 1).count()
    assert(dups === 0L,
      "per-word hash-derived char shifts must not repeat between outer " +
        "levels — the shared-shift transform collided every doc whose " +
        "lcm(word periods) fit inside the level count")
    // the periodic doc now survives too: its word periods (2/3) no longer
    // divide a SHARED level delta — each word draws an independent shift
    val periodicDups = scaled
      .filter(pmod(col("doc_id"), lit(ScaleUp.DocStride)) === 10)
      .groupBy("text").count().filter(col("count") > 1).count()
    assert(periodicDups === 0L,
      "period-2/3 words collided under the shared shift; the hash shift " +
        "must keep their docs distinct across levels")
  }

  test("every copy preserves the token-frequency structure exactly") {
    // the outer level is a word→word dictionary (hash keyed on the word
    // VALUE, not its position), so each copy's sorted frequency vector —
    // the input to Zipf/TTR/stopword-mass/vocab-size analyses — must
    // equal the source doc's. A position-keyed shift broke this: every
    // occurrence of a word minted its own surface form, exploding
    // distinct tokens ~8× at sf10 and with it every token-cardinality
    // aggregate (text_nb_quality 18.8 → 55.3 s).
    val repeats = Seq(
      (0L, "alpha beta alpha gamma beta alpha delta epsilon zeta eta theta iota"),
      (1L, "one two three one two three one two three four five six"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val s = ScaleUp.scaledDocuments(repeats, Copies)
    def freqVec(t: String): Seq[Int] =
      t.split("\\s+").groupBy(identity).values.map(_.length).toSeq.sorted
    val bad = s
      .withColumn("src", pmod(col("doc_id"), lit(ScaleUp.DocStride)))
      .join(repeats.select(col("doc_id").as("src"), col("text").as("stext")), "src")
      .select("doc_id", "text", "stext").as[(Long, String, String)]
      .collect().filter { case (_, t, st) => freqVec(t) != freqVec(st) }
    assert(bad.isEmpty,
      s"copies must preserve token frequencies, got ${bad.take(2).mkString("; ")}")
  }

  test("the known residual: an all-period-1 doc cannot mint distinct outer copies") {
    val degenerate = Seq((0L, "aa bb cc dd ee ff gg hh ii jj"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val s = ScaleUp.scaledDocuments(degenerate, Copies)
    val dups = s.groupBy("text").count().filter(col("count") > 1).count()
    assert(dups > 0L,
      "char rotation is the identity on period-1 words at every shift — " +
        "this residual is by design and the post-write audit reports it")
  }

  test("embedding copies preserve norm and magnitude multiset, all distinct") {
    // dim 16, not smaller: a sign level draws a dim-bit pattern, and at
    // dim 8 the 256-pattern space birthday-collides within ~19 levels (a
    // test-corpus artifact — the real dim-64 corpus has 2⁶⁴ patterns for
    // the capped ≤ 32 levels)
    val dim = 16
    val emb = (0L until 5L).map { i =>
      (i, (0 until dim).map(j => (i + 1).toFloat * (j + 1) - 3.7f).toArray)
    }.toDF("vec_id", "embedding")
    val copies = 300 // rotation(16) × reversal(2) × 10 sign levels
    val s = ScaleUp.scaledEmbeddings(emb, copies).cache()
    assert(s.count() === 5L * copies)
    // distinct directions: no two copies of a source vector share coords
    val dupVecs = s.withColumn("src", pmod(col("vec_id"), lit(ScaleUp.DocStride)))
      .groupBy("src", "embedding").count().filter(col("count") > 1).count()
    assert(dupVecs === 0L, "all 300 copies must be pairwise distinct")
    // norms + magnitude multisets survive every level exactly
    val bad = s.withColumn("src", pmod(col("vec_id"), lit(ScaleUp.DocStride)))
      .join(emb.select(col("vec_id").as("src"), col("embedding").as("semb")), "src")
      .select("embedding", "semb").as[(Array[Float], Array[Float])]
      .collect().filter { case (e, se) =>
        e.map(math.abs).sorted.toSeq != se.map(math.abs).sorted.toSeq
      }
    assert(bad.isEmpty,
      "rotation/reversal/sign-flip must preserve coordinate magnitudes")
  }
}
