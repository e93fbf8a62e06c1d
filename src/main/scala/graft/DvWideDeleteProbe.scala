package graft

import org.apache.spark.sql.SparkSession

/** Executor-memory proof for the merge-on-read DELETE harvest, run in a
  * FORKED small-heap JVM (see `DeletionVectorSpec`): a DELETE matching
  * ~half of every file in a multi-million-row DV table must complete in a
  * few hundred MB of heap. The harvest aggregates matched row indexes
  * per file into packed `DvBitmap`s (O(rows/8) buffers with map-side
  * partial aggregation) — the shape the earlier `collect_list` plan
  * OOMed on, because one aggregation row held ALL of a file's matched
  * indexes as boxed longs. Wide-matching straddler deletes are exactly
  * the 100 TB case DV mode exists for (`DELETE WHERE quality < x`), so
  * the bound is proven in a real constrained JVM, not argued. Prints
  * `DV_WIDE_DELETE_OK survivors=<n> planHasBitmapAgg=<bool>` and exits
  * 0 on success. */
object DvWideDeleteProbe {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("gdisk_dv_probe").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-dv-wide-delete-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gdvp",
        classOf[graft.sources.GraftDiskCatalog].getName)
      .config("spark.sql.catalog.gdvp.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdvp.lake")
    spark.sql("""CREATE TABLE gdvp.lake.wide (id BIGINT, v STRING)
      TBLPROPERTIES ('delete.mode'='dv')""")
    // 4 files x 3M rows; every file straddles the predicate below
    spark.sql("""INSERT INTO gdvp.lake.wide
      SELECT id, concat('value_', id) FROM range(0, 12000000, 1, 4)""")
    spark.sql("DELETE FROM gdvp.lake.wide WHERE id % 2 = 0")
    val plan = graft.sources.DvDebug.lastHarvestPlan
    val hasAgg = plan.contains("dv_bitmap_agg") && !plan.contains("collect_list")
    val survivors = spark.table("gdvp.lake.wide").count()
    val odd = spark.sql(
      "SELECT count(*) FROM gdvp.lake.wide WHERE id % 2 = 0").head().getLong(0)
    println(s"DV_WIDE_DELETE_OK survivors=$survivors planHasBitmapAgg=$hasAgg")
    spark.stop()
    if (survivors != 6000000L || odd != 0L || !hasAgg) sys.exit(2)
  }
}
