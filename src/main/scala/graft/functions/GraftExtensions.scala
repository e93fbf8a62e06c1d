package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType}

/** SQL registration for the native Catalyst expressions (SURVEY.md §7.3
  * preference (b)): after injection, `spark.sql` can call `word_shingles`,
  * `minhash_sig`, `dot_product`, `simhash64`, and `unicode_normalize`
  * directly — the idiomatic Spark route for a library shipping custom
  * expressions:
  *
  *   - new sessions: `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (or `builder.withExtensions(new GraftExtensions)`);
  *   - an existing session: `GraftFunctions.register(spark)`.
  *
  * Static arguments (shingle width, hash count, normalization form) must be
  * foldable literals — they parameterize the generated code itself.
  */
object GraftFunctions {

  private def intLit(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def strLit(fn: String, arg: String, e: Expression): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  private def boolLit(fn: String, arg: String, e: Expression): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a boolean literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], expected: Range): Unit =
    if (!expected.contains(args.length))
      throw new IllegalArgumentException(
        s"$fn expects ${expected.mkString("..")} arguments, got ${args.length}")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        arity("word_shingles", args, 2 to 2)
        WordShingles(args.head, intLit("word_shingles", "n", args(1)))
      }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        arity("minhash_sig", args, 2 to 2)
        MinHashSig(args.head, intLit("minhash_sig", "num_hashes", args(1)))
      }),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        arity("dot_product", args, 2 to 2)
        DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        arity("simhash64", args, 1 to 1)
        SimHash64(args.head)
      }),
    // "mg_top_k", not "approx_top_k" — Spark 4 ships a builtin of that name
    // with a different contract (optional args, any type); shadowing it
    // would silently break builtin-style calls through the front door
    (FunctionIdentifier("mg_top_k"),
      new ExpressionInfo(classOf[ApproxTopK].getName, "mg_top_k"),
      (args: Seq[Expression]) => {
        arity("mg_top_k", args, 3 to 3)
        ApproxTopK(args.head, intLit("mg_top_k", "k", args(1)),
          intLit("mg_top_k", "capacity", args(2))).toAggregateExpression()
      }),
    (FunctionIdentifier("compress_ratio"),
      new ExpressionInfo(classOf[CompressRatio].getName, "compress_ratio"),
      (args: Seq[Expression]) => {
        arity("compress_ratio", args, 1 to 1)
        CompressRatio(args.head)
      }),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (args: Seq[Expression]) => {
        arity("unicode_normalize", args, 1 to 3)
        val form = if (args.length >= 2) strLit("unicode_normalize", "form", args(1)) else "NFC"
        val casefold =
          if (args.length == 3) boolLit("unicode_normalize", "casefold", args(2)) else false
        UnicodeNormalize(args.head, form, casefold)
      }),
    (FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (args: Seq[Expression]) => {
        arity("strip_accents", args, 1 to 1)
        StripAccents(args.head)
      }),
    (FunctionIdentifier("hash_embed"),
      new ExpressionInfo(classOf[HashEmbedExpr].getName, "hash_embed"),
      (args: Seq[Expression]) => {
        arity("hash_embed", args, 2 to 2)
        HashEmbedExpr(args.head, intLit("hash_embed", "dim", args(1)))
      }),
    (FunctionIdentifier("theta_sketch_agg"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "theta_sketch_agg"),
      (args: Seq[Expression]) => {
        arity("theta_sketch_agg", args, 1 to 2)
        val lgK = if (args.length == 2) intLit("theta_sketch_agg", "lgK", args(1)) else 12
        ThetaSketchAgg(args.head, lgK).toAggregateExpression()
      }),
    (FunctionIdentifier("theta_union_agg"),
      new ExpressionInfo(classOf[ThetaUnionAgg].getName, "theta_union_agg"),
      (args: Seq[Expression]) => {
        arity("theta_union_agg", args, 1 to 2)
        val lgK = if (args.length == 2) intLit("theta_union_agg", "lgK", args(1)) else 12
        ThetaUnionAgg(args.head, lgK).toAggregateExpression()
      }),
    (FunctionIdentifier("theta_estimate"),
      new ExpressionInfo(classOf[ThetaEstimate].getName, "theta_estimate"),
      (args: Seq[Expression]) => {
        arity("theta_estimate", args, 1 to 1)
        ThetaEstimate(args.head)
      }),
    (FunctionIdentifier("theta_intersect_estimate"),
      new ExpressionInfo(classOf[ThetaIntersectEstimate].getName, "theta_intersect_estimate"),
      (args: Seq[Expression]) => {
        arity("theta_intersect_estimate", args, 2 to 2)
        ThetaIntersectEstimate(args.head, args(1))
      }),
    (FunctionIdentifier("theta_diff_estimate"),
      new ExpressionInfo(classOf[ThetaDiffEstimate].getName, "theta_diff_estimate"),
      (args: Seq[Expression]) => {
        arity("theta_diff_estimate", args, 2 to 2)
        ThetaDiffEstimate(args.head, args(1))
      }),
    (FunctionIdentifier("cms_sketch_agg"),
      new ExpressionInfo(classOf[CmsSketchAgg].getName, "cms_sketch_agg"),
      (args: Seq[Expression]) => {
        arity("cms_sketch_agg", args, 1 to 3)
        val depth = if (args.length >= 2) intLit("cms_sketch_agg", "depth", args(1)) else 5
        val width = if (args.length == 3) intLit("cms_sketch_agg", "width", args(2)) else 4096
        CmsSketchAgg(args.head, depth, width).toAggregateExpression()
      }),
    (FunctionIdentifier("cms_merge_agg"),
      new ExpressionInfo(classOf[CmsMergeAgg].getName, "cms_merge_agg"),
      (args: Seq[Expression]) => {
        arity("cms_merge_agg", args, 1 to 3)
        val depth = if (args.length >= 2) intLit("cms_merge_agg", "depth", args(1)) else 5
        val width = if (args.length == 3) intLit("cms_merge_agg", "width", args(2)) else 4096
        CmsMergeAgg(args.head, depth, width).toAggregateExpression()
      }),
    (FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (args: Seq[Expression]) => {
        arity("cms_estimate", args, 2 to 2)
        CmsEstimate(args.head, args(1))
      }),
    (FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      (args: Seq[Expression]) => {
        arity("kll_sketch_agg", args, 1 to 2)
        val k = if (args.length == 2) intLit("kll_sketch_agg", "k", args(1)) else 200
        KllSketchAgg(args.head, k).toAggregateExpression()
      }),
    (FunctionIdentifier("kll_merge_agg"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge_agg"),
      (args: Seq[Expression]) => {
        arity("kll_merge_agg", args, 1 to 2)
        val k = if (args.length == 2) intLit("kll_merge_agg", "k", args(1)) else 200
        KllMergeAgg(args.head, k).toAggregateExpression()
      }),
    (FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
      (args: Seq[Expression]) => {
        arity("kll_quantile", args, 2 to 2)
        KllQuantile(args.head, args(1))
      }),
    (FunctionIdentifier("kll_rank"),
      new ExpressionInfo(classOf[KllRank].getName, "kll_rank"),
      (args: Seq[Expression]) => {
        arity("kll_rank", args, 2 to 2)
        KllRank(args.head, args(1))
      }))

  /** Register into an already-built session (per-session function registry). */
  def register(spark: SparkSession): Unit = all.foreach { case (id, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

/** `spark.sql.extensions` entry point: the custom-expression registry plus
  * the materialized-view auto-rewrite rule (operator-optimization batch —
  * it runs BEFORE V2 scan pushdown, so a substituted MV relation still
  * gets its own pushdown/pruning/statistics treatment). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(session => graft.plans.MvRewriteRule(session))
  }
}
