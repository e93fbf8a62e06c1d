package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CdcMvOps

/** Incremental MV maintenance over the gdisk CDC feed: exactly-once by
  * construction (the watermark rides inside the MV commit), tombstone
  * semantics, and harmless replay of empty windows. The oracle-gated
  * end-to-end run (inserts + COW UPDATE + DELETE + OPTIMIZE) lives in
  * `ddl_v2_disk_mv_incremental`; this spec pins the edge semantics the
  * hash can't see. */
class CdcMvSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val src = "gslt.default.mv_spec_src"
  private val mv = "gslt.default.mv_spec_mv"

  private def setup(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $src")
    spark.sql(s"DROP TABLE IF EXISTS $mv")
    spark.sql(s"CREATE TABLE $src (k STRING, v DOUBLE)")
    spark.sql(CdcMvOps.createRollupDdl(mv, "k STRING"))
  }

  private def refresh(): Long =
    CdcMvOps.refreshRollup(spark, src, mv, Seq("k"), "v")

  private def served(): Map[String, (Long, Double)] =
    CdcMvOps.serve(spark, mv, Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("incremental refresh equals a direct aggregate") {
    setup()
    spark.sql(s"INSERT INTO $src VALUES ('a', 1.5), ('a', 2.25), ('b', 10.0)")
    spark.sql(s"INSERT INTO $src VALUES ('b', 0.75), ('c', 3.0)")
    refresh()
    assert(served() == Map("a" -> (2L, 3.75), "b" -> (2L, 10.75), "c" -> (1L, 3.0)))
    // second batch after the first refresh: only the delta is folded in
    spark.sql(s"INSERT INTO $src VALUES ('a', 0.25), ('d', 7.0)")
    refresh()
    assert(served() == Map(
      "a" -> (3L, 4.0), "b" -> (2L, 10.75), "c" -> (1L, 3.0), "d" -> (1L, 7.0)))
  }

  test("a group deleted to zero tombstones (kept row, hidden from serve) and the watermark cannot regress") {
    setup()
    spark.sql(s"INSERT INTO $src VALUES ('a', 1.0), ('b', 2.0)")
    refresh()
    // the head commit ONLY deletes: if the watermark lived on max(__as_of)
    // of *surviving positive* rows and 'b' were physically deleted, the
    // next refresh would re-apply this window and double-subtract
    spark.sql(s"DELETE FROM $src WHERE k = 'b'")
    val w = refresh()
    assert(served() == Map("a" -> (1L, 1.0)))
    val raw = spark.sql(s"SELECT k, cnt FROM $mv ORDER BY k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(raw == Map("a" -> 1L, "b" -> 0L), "zero-count group must remain as a tombstone")
    assert(refresh() == w, "replaying an applied window must be a no-op")
    assert(served() == Map("a" -> (1L, 1.0)))
  }

  test("OPTIMIZE-only windows are CDC-silent: watermark holds, replay is harmless, later commits still apply") {
    setup()
    spark.sql(s"INSERT INTO $src VALUES ('a', 1.0)")
    spark.sql(s"INSERT INTO $src VALUES ('a', 2.0)")
    val w1 = refresh()
    new GraftSession(spark).sql(s"OPTIMIZE $src") // pure reorganization
    val w2 = refresh() // zero-row window: nothing to stamp
    assert(w2 == w1, "an empty delta window must not advance the watermark")
    assert(served() == Map("a" -> (2L, 3.0)))
    spark.sql(s"INSERT INTO $src VALUES ('a', 4.0)")
    refresh() // window re-covers the OPTIMIZE version plus the new insert
    assert(served() == Map("a" -> (3L, 7.0)))
  }

  test("CREATE/REFRESH MATERIALIZED VIEW front door: definition persists in the manifest, refresh works from a fresh session object") {
    spark.sql(s"DROP TABLE IF EXISTS $src")
    spark.sql("DROP TABLE IF EXISTS gslt.default.mv_spec_fd")
    spark.sql(s"CREATE TABLE $src (k STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO $src VALUES ('a', 1.0), ('a', 2.5), ('b', 4.0)")
    val g = new GraftSession(spark)
    g.sql(s"CREATE MATERIALIZED VIEW gslt.default.mv_spec_fd AS " +
      s"SELECT k, count(*) AS cnt, sum(v) AS total FROM $src GROUP BY k")
    // a DIFFERENT GraftSession refreshes purely from the persisted definition
    val w = new GraftSession(spark)
      .sql("REFRESH MATERIALIZED VIEW gslt.default.mv_spec_fd").head()
    assert(w.getLong(1) >= 1L)
    val got = CdcMvOps.serve(spark, "gslt.default.mv_spec_fd", Seq("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map("a" -> (2L, 3.5), "b" -> (1L, 4.0)))
    // non-MV tables refuse REFRESH with a pointed error
    val e = intercept[RuntimeException] {
      new GraftSession(spark).sql(s"REFRESH MATERIALIZED VIEW $src")
    }
    assert(e.getMessage.contains("not a materialized view"))
  }

  test("fresh MV auto-rewrites a matching aggregate; stale, mismatched, or disabled declines") {
    val src2 = "gslt.default.mvr_src"
    val mv2 = "gslt.default.mvr_mv"
    spark.sql(s"DROP TABLE IF EXISTS $src2")
    spark.sql(s"DROP TABLE IF EXISTS $mv2")
    spark.sql(s"CREATE TABLE $src2 (k STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO $src2 VALUES ('a', 1.5), ('a', 2.25), ('b', 10.0)")
    val g = new GraftSession(spark)
    g.sql(s"CREATE MATERIALIZED VIEW $mv2 AS SELECT k, count(*) AS cnt, " +
      s"sum(v) AS total FROM $src2 GROUP BY k")
    val q = "SELECT k, count(*) AS c, " +
      s"CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS t FROM $src2 " +
      "GROUP BY k ORDER BY k"
    def plan(): String = spark.sql(q).queryExecution.optimizedPlan.toString
    def rows(): Seq[(String, Long, Double)] = spark.sql(q).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

    // created but never refreshed: no freshness hint → no rewrite
    assert(!plan().contains("mvr_mv"), plan())
    g.sql(s"REFRESH MATERIALIZED VIEW $mv2")
    val p = plan()
    assert(p.contains("mvr_mv") && !p.contains("mvr_src"),
      s"fresh MV must serve the aggregate:\n$p")
    val viaMv = rows()
    // the rewrite is invisible in the result: disabled run matches exactly
    spark.conf.set("spark.graft.mv.autoRewrite", "false")
    val direct = try {
      assert(!plan().contains("mvr_mv"))
      rows()
    } finally spark.conf.set("spark.graft.mv.autoRewrite", "true")
    assert(viaMv == direct && viaMv.map(_._1) == Seq("a", "b"), viaMv.toString)

    // a non-matching shape (different aggregate) never rewrites
    val qMax = s"SELECT k, max(v) AS m FROM $src2 GROUP BY k"
    assert(!spark.sql(qMax).queryExecution.optimizedPlan.toString
      .contains("mvr_mv"))

    // stale: a post-refresh source commit declines until the next refresh
    spark.sql(s"INSERT INTO $src2 VALUES ('c', 4.0)")
    val stale = plan()
    assert(!stale.contains("mvr_mv") && stale.contains("mvr_src"), stale)
    assert(rows().map(_._1) == Seq("a", "b", "c"))
    g.sql(s"REFRESH MATERIALIZED VIEW $mv2")
    assert(plan().contains("mvr_mv"))

    // tombstones stay invisible through the rewrite path
    spark.sql(s"DELETE FROM $src2 WHERE k = 'b'")
    g.sql(s"REFRESH MATERIALIZED VIEW $mv2")
    assert(plan().contains("mvr_mv"))
    assert(rows().map(_._1) == Seq("a", "c"))
  }

  test("a resurrected group reuses its tombstone row") {
    setup()
    spark.sql(s"INSERT INTO $src VALUES ('a', 5.0)")
    refresh()
    spark.sql(s"DELETE FROM $src WHERE k = 'a'")
    refresh()
    assert(served().isEmpty)
    spark.sql(s"INSERT INTO $src VALUES ('a', 8.0)")
    refresh()
    assert(served() == Map("a" -> (1L, 8.0)))
    assert(spark.sql(s"SELECT count(*) FROM $mv").head().getLong(0) == 1,
      "resurrection must update the tombstone, not add a second row")
  }
}
