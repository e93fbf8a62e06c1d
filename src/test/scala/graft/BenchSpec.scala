package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A broken query must surface as a bench error (and a nonzero exit in
  * main), never as a fast-looking timing entry. */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bench records per-query failures instead of swallowing them") {
    val qs = Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame](
      "ok" -> ((s, _) => s.range(3).toDF()),
      "broken" -> ((s, _) => s.read.parquet("/nonexistent/graft/path")))
    val r = Bench.runAll(spark, TestSpark.sfDir, qs)
    assert(r.errors.keySet == Set("broken"))
    assert(r.errors("broken").nonEmpty)
    assert(r.seconds.keySet == Set("ok", "broken"))
  }

  test("regression gate flags real growth, ignores jitter and unknowns") {
    val base = Map("q1" -> 2.0, "q2" -> 0.2, "q3" -> 1.0, "q4" -> 3.0)
    val cur = Map(
      "q1" -> 5.0, // 2.5× and +3 s: a real regression
      "q2" -> 0.45, // 2.25× but only +0.25 s: sub-floor jitter, NOT flagged
      "q3" -> 1.8, // +0.8 s but under 2×: NOT flagged
      "q4" -> 2.9, // improved
      "q_new" -> 9.9) // no baseline: NOT flagged
    val r = Bench.regressions(base, cur)
    assert(r == Map("q1" -> ((2.0, 5.0))), r.toString)
    // boundary: exactly 2× and exactly +floor are NOT regressions
    assert(Bench.regressions(Map("a" -> 1.0), Map("a" -> 2.0)).isEmpty)
    assert(Bench.regressions(Map("a" -> 0.4), Map("a" -> 0.9)).isEmpty)
  }

  test("regression gate skips a baseline measured at a different sf") {
    val base = """{"medians":{"q1":1.0,"zorder":2.0},"sf":"/data/sf0.01"}"""
    // same entries 10x slower — across scale factors that is DATA, not a
    // plan regression, and the gate must say "skipped", never flag
    val cur = Map("q1" -> 10.0, "zorder" -> 20.0)
    Bench.gateAgainstBaseline(base, "/data/sf0.1", cur) match {
      case Left(reason) =>
        assert(reason.contains("sf changed"), reason)
        assert(reason.contains("/data/sf0.01") && reason.contains("/data/sf0.1"))
      case Right(r) => fail(s"expected a skip, got regressions $r")
    }
    // same sf: the diff runs and the real regression IS flagged
    assert(Bench.gateAgainstBaseline(base, "/data/sf0.01", cur) ==
      Right(Map("q1" -> ((1.0, 10.0)), "zorder" -> ((2.0, 20.0)))))
    // a baseline that never recorded sf is also incomparable
    assert(Bench.gateAgainstBaseline(
      """{"medians":{"q1":1.0}}""", "/data/sf0.1", cur).isLeft)
  }

  test("baseline sf parses from the report JSON") {
    assert(Bench.parseSf("""{"medians":{},"sf":"/root/testdata/sf0.1"}""")
      .contains("/root/testdata/sf0.1"))
    assert(Bench.parseSf("""{"medians":{}}""").isEmpty)
    // the committed baseline must carry its sf
    val p = java.nio.file.Paths.get("bench_baseline.json")
    if (java.nio.file.Files.exists(p))
      assert(Bench.parseSf(java.nio.file.Files.readString(p)).isDefined)
  }

  test("baseline medians parse from the bench report JSON shape") {
    val json = """{"single_shot":{"x":1.0},"medians":{"q1_a":1.234,"pl_b":0.5},"sf":"/d"}"""
    assert(Bench.parseMedians(json) == Map("q1_a" -> 1.234, "pl_b" -> 0.5))
    assert(Bench.parseMedians("""{"no_medians":true}""").isEmpty)
    // the committed bench_baseline.json (if present) must parse non-empty
    val p = java.nio.file.Paths.get("bench_baseline.json")
    if (java.nio.file.Files.exists(p)) {
      val m = Bench.parseMedians(java.nio.file.Files.readString(p))
      assert(m.nonEmpty && m.values.forall(_ > 0))
    }
  }
}
