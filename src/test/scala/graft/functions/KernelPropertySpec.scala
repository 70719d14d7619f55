package graft.functions

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Property-style pins for the native kernels: across hundreds of
  * seeded-random inputs the hand-written merge/fold code must agree
  * exactly with the composed built-in-function formulation it replaces.
  * A unit test checks the examples someone thought of; these sweep the
  * ones nobody did (empty arrays, singletons, all-equal values, disjoint
  * ranges, every length pairing), batched through one DataFrame so the
  * whole sweep is a single Spark job per property.
  */
class KernelPropertySpec extends SparkSpec {

  private val rnd = new Random(20260812L)

  test("sorted_intersect_count equals size(array_intersect) across random set pairs") {
    val cases = Seq.tabulate(300) { i =>
      def gen(n: Int) =
        Seq.fill(n)(rnd.between(-50L, 50L)).distinct.sorted.toArray
      Row(i.toLong, gen(rnd.between(0, 40)), gen(rnd.between(0, 40)))
    }
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(LongType, containsNull = false)),
      StructField("b", ArrayType(LongType, containsNull = false))))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(cases).asJava),
      schema)
    val bad = df.select(
        col("id"),
        SortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .filter(col("native") =!= col("builtin"))
    assert(bad.count() === 0, s"mismatching cases: ${bad.collect().mkString(", ")}")
  }

  test("imi_cells top-probe equals brute force over the product cells") {
    // integer-valued doubles keep every squared-distance sum exact, so
    // the grid selection and the brute-force enumeration share one total
    // order (ties included) — the property is equality, not closeness
    for (trial <- 0 until 100) {
      val dim = 8
      val ka = rnd.between(2, 7)
      val kb = rnd.between(2, 9)
      def vec(n: Int) = Array.fill(n)(rnd.between(-4, 5).toDouble)
      val ca = Array.fill(ka)(vec(dim / 2))
      val cb = Array.fill(kb)(vec(dim - dim / 2))
      val v = vec(dim)
      val nprobe = rnd.between(1, 7)
      def d2(a: Array[Double], b: Array[Double], off: Int): Double = {
        var acc = 0.0
        for (i <- b.indices) { val d = a(off + i) - b(i); acc += d * d }
        acc
      }
      val brute = (for (a <- 0 until ka; b <- 0 until kb)
        yield (d2(v, ca(a), 0) + d2(v, cb(b), dim / 2), a * kb + b))
        .sorted.take(math.min(nprobe, ka * kb)).map(_._2)
      val got = ImiCells.computeLocal(v, ca, cb, nprobe).toSeq
      assert(got === brute, s"trial $trial: ka=$ka kb=$kb nprobe=$nprobe")
    }
  }

  test("graft_cosine is bit-equal to the zip_with/aggregate form across random vectors") {
    val cases = Seq.tabulate(300) { i =>
      val n = rnd.between(1, 17)
      def vec() = Array.fill(n)(rnd.between(-10.0, 10.0))
      Row(i.toLong, vec(), vec())
    }
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(DoubleType, containsNull = false)),
      StructField("b", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(cases).asJava),
      schema)
    val bad = df.select(
        col("id"),
        CosineSimilarity(col("a"), col("b")).as("native"),
        Vec.cosine(col("a"), col("b")).as("composed"))
      // bit-equality is the documented contract: compare raw bits, treating
      // only exact equality (or both-null) as a pass
      .filter(!(col("native") <=> col("composed")))
    assert(bad.count() === 0, s"mismatching cases: ${bad.collect().mkString(", ")}")
  }

  test("graft_cosine returns NULL exactly when lengths differ") {
    val cases = for (n <- 0 to 8; m <- 0 to 8 if n > 0 || m > 0)
      yield Row(n.toLong * 100 + m, Array.fill(n)(1.0), Array.fill(m)(1.0))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(DoubleType, containsNull = false)),
      StructField("b", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(cases.toSeq).asJava),
      schema)
    val rows = df.select(col("id"),
      size(col("a")).as("n"), size(col("b")).as("m"),
      CosineSimilarity(col("a"), col("b")).as("c")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(3) === (r.getAs[Int]("n") != r.getAs[Int]("m")),
        s"NULL contract violated for id ${r.getLong(0)}")
    }
  }

  test("shingle_hash64 is bit-equal to the sorted-distinct xxhash64 HOF chain") {
    val vocab = Vector("the", "cat", "sat", "on", "a", "mat", "Ünïcødé",
      "多字节", "x", "", "long-word-with-dashes")
    val cases = Seq.tabulate(400) { i =>
      val m = rnd.between(0, 30)
      // heavy repetition so duplicate shingles are common (the dedup path)
      Row(i.toLong, Seq.fill(m)(vocab(rnd.nextInt(vocab.size))))
    }
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ws", ArrayType(StringType, containsNull = false))))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(cases).asJava),
      schema)
    for (n <- Seq(1, 2, 3, 5)) {
      val hof = sort_array(array_distinct(transform(
        sequence(lit(0), size(col("ws")) - n),
        i => xxhash64(concat_ws(" ",
          (0 until n).map(j => element_at(col("ws"), i + j + 1)): _*)))))
      val bad = df.filter(size(col("ws")) >= n)
        .select(col("id"),
          ShingleHash64(col("ws"), n).as("native"), hof.as("builtin"))
        .filter(col("native") =!= col("builtin"))
      assert(bad.count() === 0,
        s"n=$n mismatches: ${bad.collect().take(3).mkString(", ")}")
      // below-width documents yield the empty set (the HOF chain would
      // throw on the negative sequence bound; callers filter first)
      val short = df.filter(size(col("ws")) < n)
        .select(ShingleHash64(col("ws"), n).as("native"))
        .filter(size(col("native")) =!= 0)
      assert(short.count() === 0, s"n=$n: short docs must hash to empty")
    }
  }
}
