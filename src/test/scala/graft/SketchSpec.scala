package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SketchOps
import graft.queries.Registry
import graft.sources.Tables

/** HLL sketch correctness properties: estimates track exact distinct counts
  * within the sketch's error bound, and a union OF SKETCHES (the persisted
  * pre-aggregation path — raw keys never re-scanned) estimates the same
  * count as sketching the raw union directly.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events =
    Tables.load(spark, TestSpark.sfDir, "events").cache()

  test("per-group HLL estimates are within 2% of exact distinct counts") {
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SketchOps.hllSketches(events, $"event_type", $"user_id")
      .select($"grp", SketchOps.estimate($"sketch").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, ex) =>
      val err = math.abs(approx(g) - ex).toDouble / ex
      assert(err <= 0.02, s"group $g: exact=$ex approx=${approx(g)} err=$err")
    }
  }

  test("sketch union equals sketching the union; parquet roundtrip merges") {
    val perType = SketchOps.hllSketches(events, $"event_type", $"user_id")
    val direct = events
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sketch"))
      .select(SketchOps.estimate($"sketch")).head.getLong(0)
    val merged = SketchOps.hllUnion(perType, $"sketch")
      .select(SketchOps.estimate($"sketch")).head.getLong(0)
    assert(merged == direct,
      s"union-of-sketches $merged != direct sketch $direct")

    // persist per-group sketches as binary parquet, read back, re-merge:
    // the incremental-rollup path — no raw data touched after day one
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    perType.write.mode("overwrite").parquet(dir)
    val reread = SketchOps.hllUnion(spark.read.parquet(dir), $"sketch")
      .select(SketchOps.estimate($"sketch")).head.getLong(0)
    assert(reread == direct, s"roundtripped merge $reread != direct $direct")
  }

  test("ext_sketch_hll registry entry: ALL row consistent with per-type rows") {
    val rows = Registry.queries("ext_sketch_hll")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = events.select(countDistinct($"user_id")).head.getLong(0)
    assert(rows.contains("ALL"))
    // the ALL union can never estimate below the largest single group
    val maxGroup = rows.filter(_._1 != "ALL").values.max
    assert(rows("ALL") >= maxGroup)
    val err = math.abs(rows("ALL") - exactAll).toDouble / exactAll
    assert(err <= 0.02, s"ALL: exact=$exactAll approx=${rows("ALL")} err=$err")
  }
}
