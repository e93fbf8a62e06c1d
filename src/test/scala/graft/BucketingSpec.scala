package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BucketingOps
import graft.sources.Tables

/** Proves the co-located-join layout: bucketed lineitem⋈orders on the
  * order key plans with no shuffle Exchange on either join input. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact-fact join has no exchange on either side") {
    import spark.implicits._
    // idempotence: clear catalog entries AND stale warehouse dirs (a
    // crashed prior run can leave the location without the table)
    Seq("b_lineitem", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    BucketingOps.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    BucketingOps.writeBucketed(o, "b_orders", "o_orderkey", 8)

    val joined = BucketingOps.colocatedJoin(
      spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // sanity: result matches the unbucketed join
    val expected = li.join(o, $"l_orderkey" === $"o_orderkey").count()
    assert(joined.count() == expected)

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
  }
}
