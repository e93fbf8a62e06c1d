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
    * non-negative integral columns — x takes the even output bits, y the
    * odd. Pure integer arithmetic (shift/and/add), codegen'd per row, no
    * shuffle; 2×`bits` result bits must fit a long (bits ≤ 31). */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftright(xs, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(ys, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Morton value over N columns: column j's bit i lands at output bit
    * i·N + j (round-robin interleave, the general ZORDER BY key).
    * N·`bits` result bits must fit a long. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "zValueN needs at least two columns")
    require(bits >= 1 && n * bits <= 63, s"need n*bits <= 63, got $n x $bits")
    cols.zipWithIndex.map { case (c, j) =>
      val cl = c.cast("long")
      (0 until bits).map { i =>
        shiftright(cl, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j))
      }.reduce(_ + _)
    }.reduce(_ + _)
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
