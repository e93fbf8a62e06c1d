package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** CBO histogram CONSUMPTION: the committed equi-height histograms must
  * change the physical JOIN STRATEGY, not just row estimates — the
  * registry entry builds the skewed fixture, ANALYZEs it, and requires
  * the flip in-builder; this spec re-asserts both directions explicitly
  * and pins result parity across them (plan choice must never change
  * answers). */
class CboJoinFlipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("histograms flip the skewed-filter join from shuffle to broadcast") {
    // builds gdisk.verify.cbo_fact/cbo_probe, ANALYZEs, requires the
    // flip internally, and returns the (default-conf) result
    val df = Registry.queries("ddl_v2_cbo_hist_join")(spark, TestSpark.sfDir)
    val defaultRows = df.collect().map(_.toSeq).toSeq
    assert(defaultRows.size == 7, "7 tag groups")

    val q = """SELECT substring(p.tag, 1, 2) AS tag2,
        count(*) AS cnt, CAST(sum(f.v) AS BIGINT) AS sum_v,
        CAST(sum(octet_length(f.pad)) AS BIGINT) AS sum_pad
      FROM gdisk.verify.cbo_fact f
      JOIN gdisk.verify.cbo_probe p ON f.k = p.k
      WHERE f.v >= 4000
      GROUP BY substring(p.tag, 1, 2) ORDER BY tag2"""
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.conf.set("spark.graft.cbo.serveHistograms", "false")
      val noHist = spark.sql(q)
      val noHistPlan = noHist.queryExecution.executedPlan.toString
      assert(!noHistPlan.contains("BroadcastHashJoin"),
        s"min/max-uniform estimate (~50% of the fact) must not broadcast:\n$noHistPlan")
      val noHistRows = noHist.collect().map(_.toSeq).toSeq

      spark.conf.set("spark.graft.cbo.serveHistograms", "true")
      val withHist = spark.sql(q)
      val withHistPlan = withHist.queryExecution.executedPlan.toString
      assert(withHistPlan.contains("BroadcastHashJoin"),
        s"histogram selectivity (<1%) must broadcast the filtered fact:\n$withHistPlan")
      val withHistRows = withHist.collect().map(_.toSeq).toSeq

      assert(noHistRows == withHistRows && withHistRows == defaultRows,
        "the plan flip must never change the answer")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.graft.cbo.serveHistograms")
    }
  }
}
