package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the 100 TB answer to the
  * fact-fact shuffle (SURVEY.md "Partitioning & shuffle"): persist both
  * sides bucketed+sorted by the join key and equi-joins on that key read
  * bucket-aligned files with NO Exchange on either side. At cluster scale
  * this turns the nightly lineitem⋈orders shuffle (terabytes of network)
  * into local merges; BucketingSpec proves the Exchange disappears.
  */
object BucketingOps {

  /** Persist `df` as a bucketed, per-bucket-sorted managed parquet table.
    * Drops any prior table AND its on-disk location first: the session
    * catalog is in-memory, so a previous JVM's managed-table directory
    * survives in the warehouse while the catalog forgets the table —
    * without the cleanup a re-run dies with LOCATION_ALREADY_EXISTS. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. When both sides share
    * the bucket count, Catalyst plans SortMergeJoin over the existing
    * layout — zero shuffle. The merge hint pins the strategy a real
    * fact-fact join would get anyway (at fixture scale the planner would
    * otherwise broadcast the small side and ignore the bucketing). */
  def colocatedJoin(
      spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).hint("merge").join(
      spark.table(right).hint("merge"),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
