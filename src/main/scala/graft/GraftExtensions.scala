package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, MinKLongs, ShingleHash64, SimHash64, SortedIntersectCount, VecSumDoubles}

/** Session extensions registering graft's native expressions for SQL use
  * and the custom-plan optimizations:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT sorted_intersect_count(sha, shb) FROM ...
  *   SELECT graft_simhash64(word_hashes) FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughTopK)
    // `MERGE INTO graft.t` → one ParquetMergeSink.mergeActions commit.
    // Post-hoc: the analyzed MergeIntoTable (star assignments expanded)
    // is rewritten before Spark refuses it for non-row-level-op tables.
    ext.injectPostHocResolutionRule(_ => graft.sources.RewriteGraftMerge)
    // `UPDATE graft.t SET …` → one read-modify-write merge commit.
    ext.injectPostHocResolutionRule(_ => graft.sources.RewriteGraftUpdate)
  }
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))),
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => SortedIntersectCount(children.head, children(1))),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    (FunctionIdentifier("graft_shingle_hash64"),
      new ExpressionInfo(classOf[ShingleHash64].getName, "graft_shingle_hash64"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"graft_shingle_hash64(words, n) takes 2 arguments, got ${children.length}")
        val n = children(1) match {
          case e if e.foldable => e.eval() match {
            case v: Number if v.intValue() > 0 => v.intValue()
            case other => throw new IllegalArgumentException(
              s"graft_shingle_hash64: n must be a positive integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_shingle_hash64: n must be a literal")
        }
        ShingleHash64(children.head, n)
      }),
    (FunctionIdentifier("min_k_longs"),
      new ExpressionInfo(classOf[MinKLongs].getName, "min_k_longs"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"min_k_longs(col, k) takes 2 arguments, got ${children.length}")
        val k = children(1) match {
          case e if e.foldable => e.eval() match {
            case n: Number if n.intValue() > 0 => n.intValue()
            case other => throw new IllegalArgumentException(
              s"min_k_longs: k must be a positive integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException("min_k_longs: k must be a literal")
        }
        MinKLongs(children.head, k).toAggregateExpression()
      }),
    (FunctionIdentifier("vec_sum"),
      new ExpressionInfo(classOf[VecSumDoubles].getName, "vec_sum"),
      (children: Seq[Expression]) =>
        VecSumDoubles(children.head).toAggregateExpression()))
}
