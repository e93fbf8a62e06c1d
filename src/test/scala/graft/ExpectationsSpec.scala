package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ExpectationsOps
import graft.ops.ExpectationsOps.Expectation

/** Declarative data-quality expectations: NULL-safe violation logic, the
  * clean/quarantine split accounting for every input row, warn counting
  * without removal, and the fail-rule batch abort. */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val exps = Seq(
    Expectation("v_pos", "v > 0", "drop"),
    Expectation("s_known", "s IN ('a','b')", "warn"),
    Expectation("id_present", "id IS NOT NULL", "fail"))

  private def df = Seq(
    (Some(1L), 5L, "a"),    // clean
    (Some(2L), -1L, "a"),   // drops: v_pos
    (Some(3L), 7L, "zz"),   // kept, warns: s_known
    (Some(4L), 0L, "zz")    // drops: v_pos (and warns)
  ).toDF("id", "v", "s")

  test("clean + quarantine partition the input; tags name every violation") {
    val clean = ExpectationsOps.clean(df, exps).collect().map(_.getLong(0))
    assert(clean.sorted.toSeq == Seq(1L, 3L))
    val q = ExpectationsOps.quarantine(df, exps).collect()
      .map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(q == Map(2L -> "v_pos", 4L -> "s_known,v_pos"))
  }

  test("NULL predicate results count as violations") {
    val nullDf = Seq((Some(9L), Option.empty[java.lang.Long], "a"))
      .toDF("id", "v", "s")
    assert(ExpectationsOps.clean(nullDf, exps).count() == 0L)
    assert(ExpectationsOps.quarantine(nullDf, exps).head().getString(0)
      == "v_pos")
  }

  test("metrics: one combinable aggregate, per-rule counts plus kept rows") {
    val m = ExpectationsOps.metrics(df, exps).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(m == Map(
      "v_pos" -> (("drop", 2L)),
      "s_known" -> (("warn", 2L)),
      "id_present" -> (("fail", 0L)),
      "__kept" -> (("info", 2L))))
  }

  test("a violated fail rule aborts the batch; a clean one passes through") {
    assert(ExpectationsOps.enforce(df, exps).count() == 4L)
    val bad = Seq((Option.empty[java.lang.Long], 1L, "a")).toDF("id", "v", "s")
    val e = intercept[IllegalStateException](
      ExpectationsOps.enforce(bad, exps))
    assert(e.getMessage.contains("id_present"))
  }
}
