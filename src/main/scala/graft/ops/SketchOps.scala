package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built into
  * Spark as `hll_sketch_agg`/`hll_union_agg`) — the pre-aggregation layout
  * that makes "distinct users per X" queries cheap at 100 TB: each daily /
  * per-shard job reduces its slice to a few-KB sketch ONCE, the sketches
  * persist as ordinary binary parquet columns, and any later rollup (all
  * days, all sources, ad-hoc slices) is a union of sketches — no re-scan of
  * the raw data, no exact-distinct shuffle of raw keys. Estimates are
  * within ~1.6%/sqrt(2^lgK); exactness is engine-specific, so registry
  * entries over these are rows-only with [[graft.SketchSpec]] asserting
  * relative error and merge-vs-direct consistency.
  */
object SketchOps {

  /** One HLL sketch per group: the map-side-combinable aggregate runs as a
    * single hash aggregate (partial sketches merge associatively inside
    * Spark), emitting (grp, sketch-binary). */
  def hllSketches(
      df: DataFrame, group: Column, value: Column, lgK: Int = 12): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(hll_sketch_agg(value, lit(lgK)).as("sketch"))

  /** Union previously-built sketches (e.g. read back from parquet) into one
    * — O(sketch bytes) per input row, never touching raw values. */
  def hllUnion(sketches: DataFrame, sketch: Column): DataFrame =
    sketches.agg(hll_union_agg(sketch, lit(true)).as("sketch"))

  /** Distinct-count estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  // ------------------------------------------------------- theta sketches

  /** One theta sketch per group (graft.functions.ThetaSketchAgg): same
    * single-hash-aggregate shape as [[hllSketches]], but the sketches also
    * support INTERSECTION — the cross-source overlap question HLL can't
    * answer without inclusion-exclusion error blowup. */
  def thetaSketches(
      df: DataFrame, group: Column, value: Column, lgK: Int = 12): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(graft.functions.ThetaFunctions.theta_sketch_agg(value, lgK).as("sketch"))

  /** Union stored theta sketches into one. */
  def thetaUnion(sketches: DataFrame, sketch: Column, lgK: Int = 12): DataFrame =
    sketches.agg(graft.functions.ThetaFunctions.theta_union_agg(sketch, lgK).as("sketch"))

  /** Distinct-count estimate of a theta sketch column. */
  def thetaEstimate(sketch: Column): Column =
    graft.functions.ThetaFunctions.theta_estimate(sketch)

  /** Intersection-cardinality estimate of two theta sketch columns. */
  def thetaIntersect(a: Column, b: Column): Column =
    graft.functions.ThetaFunctions.theta_intersect_estimate(a, b)

  // --------------------------------------------- count-min frequency sketches

  /** One count-min sketch per group — any-key frequency lookups over any
    * later slice union as sketch arithmetic (Misra-Gries finds WHICH keys
    * are heavy; CMS answers counts for keys chosen after the scan). */
  def cmsSketches(
      df: DataFrame, group: Column, value: Column,
      depth: Int = 5, width: Int = 4096): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(graft.functions.CmsFunctions.cms_sketch_agg(value, depth, width).as("sketch"))

  /** Merge stored CMS sketches into one (exact elementwise add). */
  def cmsMerge(
      sketches: DataFrame, sketch: Column,
      depth: Int = 5, width: Int = 4096): DataFrame =
    sketches.agg(graft.functions.CmsFunctions.cms_merge_agg(sketch, depth, width).as("sketch"))

  /** Estimated count of a key under a CMS sketch column (never under). */
  def cmsEstimate(sketch: Column, key: Column): Column =
    graft.functions.CmsFunctions.cms_estimate(sketch, key)

  // --------------------------------------------------- KLL quantile sketches

  /** One KLL quantile sketch per group — same single-aggregate shape as the
    * other sketch builders; any later quantile over any union of groups is
    * sketch arithmetic, never a raw re-scan. */
  def kllSketches(
      df: DataFrame, group: Column, value: Column, k: Int = 200): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(graft.functions.KllFunctions.kll_sketch_agg(value, k).as("sketch"))

  /** Merge stored KLL sketches into one. */
  def kllMerge(sketches: DataFrame, sketch: Column, k: Int = 200): DataFrame =
    sketches.agg(graft.functions.KllFunctions.kll_merge_agg(sketch, k).as("sketch"))

  /** Quantile at normalized rank (0..1) of a KLL sketch column. */
  def kllQuantile(sketch: Column, rank: Double): Column =
    graft.functions.KllFunctions.kll_quantile(sketch, lit(rank))
}
