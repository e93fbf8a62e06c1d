package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ApproxTopK

/** Misra-Gries heavy-hitter guarantees: any term with true frequency >
  * N/capacity must appear, counts are lower bounds within N/capacity, and
  * the summary survives the partial/merge aggregation path (repartitioned
  * input exercises serialize/merge).
  */
class ApproxTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    val rows =
      Seq.fill(1000)("hot1") ++ Seq.fill(800)("hot2") ++ Seq.fill(500)("warm") ++
        (1 to 700).map(i => s"tail$i")
    rows.toDF("term")
  }

  test("heavy hitters found with correct order and bounded counts") {
    val n = 3000L
    val capacity = 100
    val got = fixture.repartition(8)
      .agg(ApproxTopK.mg_top_k($"term", 3, capacity).as("top"))
      .select(explode($"top").as("t")).select($"t.term", $"t.approx_count")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // true freq > N/capacity = 30 → hot1/hot2/warm guaranteed present
    assert(got.map(_._1).toSeq == Seq("hot1", "hot2", "warm"))
    val trueCounts = Map("hot1" -> 1000L, "hot2" -> 800L, "warm" -> 500L)
    for ((term, c) <- got) {
      assert(c <= trueCounts(term), s"$term count $c exceeds true count")
      assert(c >= trueCounts(term) - n / capacity, s"$term count $c too low")
    }
  }

  test("single partition gives exact counts when vocabulary fits capacity") {
    val got = Seq("a", "b", "a", "c", "a", "b").toDF("term").coalesce(1)
      .agg(ApproxTopK.mg_top_k($"term", 2, 10).as("top"))
      .select(explode($"top").as("t")).select($"t.term", $"t.approx_count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("a" -> 3L, "b" -> 2L))
  }

  test("callable from SQL after registration") {
    val s = TestSpark.spark.newSession()
    graft.functions.GraftFunctions.register(s)
    // build the fixture against the new session — temp views are per-session
    val sqlImplicits = s.implicits
    import sqlImplicits._
    (Seq.fill(100)("hot1") ++ (1 to 50).map(i => s"tail$i")).toDF("term")
      .createOrReplaceTempView("topk_fixture")
    val top = s.sql(
      "SELECT inline(mg_top_k(term, 1, 50)) FROM topk_fixture").head()
    assert(top.getString(0) == "hot1")
    // Spark's builtin approx_top_k is NOT shadowed by the registration
    val builtin = s.sql(
      "SELECT approx_top_k(term) FROM topk_fixture").head()
    assert(!builtin.isNullAt(0))
  }
}
