package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AsofOps, RangeJoinOps}
import graft.sources.Tables

/** AsofOps / RangeJoinOps equal their naive (pair-materializing) brute-force
  * formulations on the driver events data. */
class AsofRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asofJoin equals brute-force latest-at-or-before per row") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
    val buys = events.filter($"event_type" === "purchase")
      .select($"event_id".as("buy_id"), $"user_id", $"ts".as("buy_ts"))
    val views = events.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts".as("view_ts"))
      .agg(max($"event_id").as("view_id"))

    val got = AsofOps.asofJoin(buys, views, "user_id", "buy_ts", "view_ts",
        Seq("view_id", "view_ts"))
      .select($"buy_id", $"view_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    // brute force: all candidate pairs, then argmax per buy
    val pairs = buys.join(views.withColumnRenamed("user_id", "v_user"),
        $"user_id" === $"v_user" && $"view_ts" <= $"buy_ts", "left")
    val brute = pairs
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"buy_id")
          .orderBy($"view_ts".desc_nulls_last, $"view_id".desc_nulls_last)))
      .filter($"rk" === 1)
      .select($"buy_id", $"view_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("asofJoinForward equals brute-force earliest-at-or-after per row") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
    val buys = events.filter($"event_type" === "purchase")
      .select($"event_id".as("buy_id"), $"user_id", $"ts".as("buy_ts"))
    val views = events.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts".as("view_ts"))
      .agg(max($"event_id").as("view_id"))

    val got = AsofOps.asofJoinForward(buys, views, "user_id", "buy_ts", "view_ts",
        Seq("view_id", "view_ts"))
      .select($"buy_id", $"view_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    val pairs = buys.join(views.withColumnRenamed("user_id", "v_user"),
        $"user_id" === $"v_user" && $"view_ts" >= $"buy_ts", "left")
    val brute = pairs
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"buy_id")
          .orderBy($"view_ts".asc_nulls_last, $"view_id".asc_nulls_last)))
      .filter($"rk" === 1)
      .select($"buy_id", $"view_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("intervalJoin equals naive inequality join and plans as equi-join") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
    val buys = events.filter($"event_type" === "purchase")
      .select($"event_id".as("buy_id"), $"user_id", $"ts".as("buy_ts"))

    val binned = RangeJoinOps.intervalJoin(clicks, buys, "user_id", "click_ts", "buy_ts", 600L)
    val got = binned.select($"click_id", $"buy_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = clicks.join(buys.withColumnRenamed("user_id", "b_user"),
        $"user_id" === $"b_user" &&
          $"buy_ts" > $"click_ts" &&
          $"buy_ts" <= $"click_ts" + expr("INTERVAL 600 SECONDS"))
      .select($"click_id", $"buy_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == naive)

    // the binned form must join on (key, bin) — no bin column may survive,
    // and the join itself must be a hash/sort-merge equi-join
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a pair-materializing join:\n$plan")
  }
}
