package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan-time skipping. At 100 TB the cheapest
  * byte is the one never read: parquet keeps per-row-group min/max stats,
  * and Spark prunes row groups (and whole files) whose stat range misses
  * the filter. A single-column sort clusters only that column; a Z-order
  * (Morton) interleave clusters SEVERAL columns at once, so box predicates
  * on any subset of the z-dimensions skip most of the data — the layout
  * Delta/Iceberg `OPTIMIZE ZORDER BY` applies, built here from plain
  * column arithmetic.
  */
object LayoutOps {

  /** Morton (Z-order) value: interleave the low `bits` bits of two
    * integral columns — x takes the even output bits, y the odd. Inputs
    * are masked to their low `bits` bits first, so an out-of-range or
    * negative value clamps to a deterministic two's-complement-low-bits
    * interleave instead of leaking sign bits. Pure integer arithmetic
    * (shift/and/add), codegen'd per row, no shuffle; 2×`bits` result bits
    * must fit a long (bits ≤ 31). */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = lit((1L << bits) - 1)
    val xs = x.cast("long").bitwiseAND(mask)
    val ys = y.cast("long").bitwiseAND(mask)
    (0 until bits).map { i =>
      shiftright(xs, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(ys, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Morton value over N columns: column j's bit i lands at output bit
    * i·N + j (round-robin interleave, the general ZORDER BY key). Inputs
    * masked to their low `bits` bits as in [[zValue2]]. N·`bits` result
    * bits must fit a long. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "zValueN needs at least two columns")
    require(bits >= 1 && n * bits <= 63, s"need n*bits <= 63, got $n x $bits")
    val mask = lit((1L << bits) - 1)
    cols.zipWithIndex.map { case (c, j) =>
      val cl = c.cast("long").bitwiseAND(mask)
      (0 until bits).map { i =>
        shiftright(cl, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j))
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  /** Distributed global row_number — the scale-safe replacement for a
    * `Window.orderBy(...)` with no partition (which funnels the whole
    * table through ONE task). Three steps, none single-partition over the
    * data: (1) one aggregate computes `buckets-1` approximate percentile
    * boundaries of `rangeKey` and broadcasts them; (2) each row's bucket
    * is the count of boundaries strictly below its key (monotone in the
    * key, so bucket order = key order; ties stay in one bucket and are
    * resolved by the within-bucket sort), and rows are numbered inside
    * their bucket by a PARTITIONED window over `order`; (3) per-bucket
    * counts (≤ `buckets` rows) prefix-sum via a tiny triangular self-join
    * and broadcast back as offsets. The result column is the EXACT global
    * rank — boundary skew only unbalances bucket sizes, never the ranks.
    * `order` must start with (or be consistent with) `rangeKey`; `rangeKey`
    * must be numeric and non-null. */
  def globalRowNumber(
      df: DataFrame, rangeKey: Column, order: Seq[Column], buckets: Int,
      outCol: String = "global_rn"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val probs = array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*)
    // bounds in DOUBLE space (percentile_approx over a long column would
    // return array<long>): long→double is monotone, and bucket assignment
    // only needs monotonicity — ranks come from the within-bucket sort
    val bounds = df.agg(
      percentile_approx(rangeKey.cast("double"), probs, lit(10000))
        .as("__bounds"))
    // native two-column binary rank instead of an interpreted per-row
    // size(filter(bounds, λ)) HOF (the lambda is CodegenFallback — it was
    // the per-row cost of every globalRowNumber consumer); same Spark `<`
    // double ordering, same null-element handling
    val withBucket = df.crossJoin(broadcast(bounds))
      .withColumn("__bkt", graft.functions.NativeFunctions
        .count_below_arr(rangeKey.cast("double"), col("__bounds"))
        .cast("int"))
      .drop("__bounds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(order: _*)
    // __bkt ∈ [0, buckets-1] so this limit never truncates — it exists to
    // stamp the ≤buckets cardinality cap into the plan (`maxRows`), which
    // keeps the triangular prefix-sum join below provably bounded for the
    // registry-wide plan lint (and for Catalyst's own join-size reasoning).
    val cnts = withBucket.groupBy(col("__bkt")).agg(count(lit(1)).as("__cnt"))
      .limit(buckets)
    val offs = cnts.alias("x")
      .join(cnts.alias("y"), col("y.__bkt") < col("x.__bkt"), "left")
      .groupBy(col("x.__bkt").as("__bkt"))
      .agg(sum(col("y.__cnt")).as("__off"))
    withBucket
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(offs), Seq("__bkt"))
      .withColumn(outCol, (coalesce(col("__off"), lit(0L)) + col("__rn")).cast("long"))
      .drop("__bkt", "__rn", "__off")
  }

  /** Compact a parquet directory to ~`targetBytes` files: the streaming-
    * ingest small-file fix (thousands of KB-sized files make listing and
    * task scheduling, not IO, the scan bottleneck at 100 TB). File count
    * derives from the CURRENT on-disk byte size, data moves once through
    * a round-robin repartition (no key skew), and the rewrite lands in
    * `outPath` — compact-then-swap, never in place. Returns file count. */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inPath: String, outPath: String, targetBytes: Long): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inPath)).getLength
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(outPath)
    numFiles
  }

  /** Rewrite `df` into `numFiles` files clustered by the Z-order of two
    * columns: range-partition on the z-value (contiguous z-ranges per
    * file) and sort within each partition, then write parquet. Each file
    * then covers a compact rectangle-ish region of (x, y) space, so its
    * min/max stats on BOTH columns are tight — the property the
    * `LayoutSpec` file-skipping assertion measures. */
  def zorderWrite(
      df: DataFrame, x: Column, y: Column, bits: Int,
      numFiles: Int, path: String): Unit = {
    df.withColumn("__z", zValue2(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
