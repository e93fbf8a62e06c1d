package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry
import graft.sources.Tables

/** Approximate aggregates: sketch answers must land within their error
  * envelope of the exact answers (the driver correctness gate cannot
  * hash-compare sketch internals across engines). */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct and approx_percentile within tolerance of exact") {
    import spark.implicits._
    val approx = Registry.queries("an_approx_agg")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val exact = Tables.load(spark, TestSpark.sfDir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        countDistinct($"o_custkey").as("n_cust"),
        expr("percentile(o_totalprice, 0.5)").as("median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (nCust, median)) =>
      val (aCust, aMedian) = approx(k)
      assert(math.abs(aCust - nCust).toDouble / nCust <= 0.10,
        s"$k: approx distinct $aCust vs exact $nCust")
      // percentile over a gappy distribution: allow the sketch to land on a
      // neighboring value — compare by rank displacement via tolerance on
      // the value scale
      assert(math.abs(aMedian - median) / math.max(median, 1.0) <= 0.05,
        s"$k: approx median $aMedian vs exact $median")
    }
  }

  test("sketches are deterministic across runs (same partitioning, same result)") {
    val a = Registry.queries("an_approx_agg")(spark, TestSpark.sfDir).collect().toSeq
    val b = Registry.queries("an_approx_agg")(spark, TestSpark.sfDir).collect().toSeq
    assert(a == b)
  }
}
