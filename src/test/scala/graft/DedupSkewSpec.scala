package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DedupOps

/** Skew-bounding of the shared candidate generator (guide §2.5): a hot
  * bucket (a boilerplate shingle, a degenerate LSH band) must neither build
  * an unbounded collect_list aggregation buffer nor emit its O(df²) pairs
  * from one task — and the routing must not change the pair MULTISET
  * (per-bucket multiplicity feeds the jaccard intersection counts). */
class DedupSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force per-bucket 2-combinations, lower item first — the
    * reference pair multiset. */
  private def ref(rows: Seq[(String, Long)]): Seq[(Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ids = xs.map(_._2).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
    }

  test("bucketPairs: hot buckets route through the join lane, pair multiset unchanged") {
    // one hot bucket over the default hotDf, cold buckets, a singleton,
    // and a pair repeated across two buckets (multiplicity must survive)
    val rows = (0 until 600).map(i => ("hot", 1000L + i)) ++
      Seq(("c1", 1L), ("c1", 5L), ("c2", 3L), ("c2", 7L), ("c2", 9L),
        ("c3", 1L), ("c3", 5L), ("lone", 11L))
    val df = rows.toDF("k", "id")
    val got = DedupOps.bucketPairs(df, Seq("k"), col("id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == ref(rows).sorted)
    assert(got.count(_ == (1L, 5L)) == 2, "per-bucket multiplicity lost")
  }

  test("bucketPairs: forced tiny hotDf still yields the exact pair multiset") {
    // hotDf = 4 puts the 6-item bucket in the join lane and the 3-item one
    // in the list lane — the two lanes must agree on orientation and count
    val rows = (0 until 6).map(i => ("big", i.toLong)) ++
      Seq(("small", 2L), ("small", 8L), ("small", 4L))
    val df = rows.toDF("k", "id")
    val got = DedupOps.bucketPairs(df, Seq("k"), col("id"), hotDf = 4)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == ref(rows).sorted)
    got.foreach { case (a, b) => assert(a < b) }
  }

  test("bucketPairs: maxDf drops hot buckets BEFORE any list is collected") {
    val rows = (0 until 50).map(i => ("hot", i.toLong)) ++
      Seq(("c1", 1L), ("c1", 5L))
    val df = rows.toDF("k", "id")
    val got = DedupOps.bucketPairs(df, Seq("k"), col("id"), maxDf = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L)))
    // and the plan applies the df cut below the aggregation: the filter on
    // the window count must exist (no full-list-then-filter shape)
    val plan = DedupOps.bucketPairs(df, Seq("k"), col("id"), maxDf = 10)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition") || plan.contains("Window"),
      plan)
  }

  test("bucketPairs: struct items keep the (id, payload) orientation") {
    val rows = Seq(("k", 5L, 50L), ("k", 2L, 20L), ("k", 9L, 90L))
    val df = rows.toDF("k", "id", "sz")
    val got = DedupOps.bucketPairs(df, Seq("k"),
        struct(col("id"), col("sz")), hotDf = 2) // forces the join lane
      .select(col("a.id"), col("a.sz"), col("b.id"), col("b.sz"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq((2L, 20L, 5L, 50L), (2L, 20L, 9L, 90L),
      (5L, 50L, 9L, 90L)))
  }
}
