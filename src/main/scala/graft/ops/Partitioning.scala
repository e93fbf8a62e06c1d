package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for the per-partition byte kernels (guide §2.5
  * "input skew", §2.6 idle capacity): the fixture tables are single small
  * parquet files — ONE scan partition — so a compute-heavy mapPartitions
  * lane (gzip member framing, zip/PDF/RTF parsing, codec encode+decode)
  * would otherwise run as a SINGLE task no matter how many cores the
  * session has. That made the WARC/WET lanes both the slowest entries in
  * the bench and the most contention-sensitive ones (one task at the mercy
  * of co-tenant load), and at real scale it is exactly the "one huge
  * unsplittable file" input-skew case the guide says to repartition after
  * the read. */
object Partitioning {

  /** Round-robin repartition UP to the session's default parallelism.
    * Inputs that already carry at least that many partitions are left
    * untouched — a real many-file corpus scan never pays an extra
    * shuffle; only the degenerate small-input case spreads, and what it
    * shuffles is by definition small. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
