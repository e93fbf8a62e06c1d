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

  test("min-aware gate: a contention spike (min at parity) is not flagged") {
    val base = Map("q1" -> 0.4, "q2" -> 2.0)
    val cur = Map("q1" -> 1.1, "q2" -> 5.0) // both medians past 2x + floor
    // q1's min sits at baseline parity (round-8 signature of host noise);
    // q2's min regressed with its median — a real plan regression
    val mins = Map("q1" -> 0.39, "q2" -> 4.8)
    assert(Bench.regressions(base, cur, currentMins = mins) ==
      Map("q2" -> ((2.0, 5.0))))
    // no min recorded -> median-only behavior (both flagged)
    assert(Bench.regressions(base, cur).keySet == Set("q1", "q2"))
  }

  test("baseline refresh is a ratchet: noise cannot raise it") {
    val old = Map("a" -> 1.0, "b" -> 2.0, "gone" -> 3.0)
    val fresh = Map("a" -> 5.0 /* inflated */, "b" -> 1.5 /* improved */,
      "new" -> 0.7)
    val r = Bench.ratchet(old, fresh)
    assert(r == Map("a" -> 1.0, "b" -> 1.5, "new" -> 0.7), r.toString)
    // removed queries drop out instead of gating forever
    assert(!r.contains("gone"))
  }

  test("gate skips (with reason) on an overloaded host") {
    val base = """{"medians":{"q1":1.0},"sf":"/d"}"""
    val cur = Map("q1" -> 9.0)
    Bench.gateAgainstBaseline(base, "/d", cur,
      loadavg = Some(130.0), loadSkipThreshold = 128.0) match {
      case Left(reason) => assert(reason.contains("overloaded"), reason)
      case Right(r) => fail(s"expected load skip, got $r")
    }
    // under the threshold the diff runs
    assert(Bench.gateAgainstBaseline(base, "/d", cur,
      loadavg = Some(20.0), loadSkipThreshold = 128.0).isRight)
  }

  test("stream medians parse from their own baseline key and gate") {
    val base = """{"medians":{"q1":1.0},"stream_medians":{"corpus_clean_sec":3.1,"near_dup_gate_sec":4.8},"sf":"/d"}"""
    assert(Bench.parseMedians(base, "stream_medians") ==
      Map("corpus_clean_sec" -> 3.1, "near_dup_gate_sec" -> 4.8))
    // batch medians are untouched by the stream block
    assert(Bench.parseMedians(base) == Map("q1" -> 1.0))
    // a 14x corpus_clean drop (round 8) is now machine-flagged
    val r = Bench.gateAgainstBaseline(base, "/d",
      Map("corpus_clean_sec" -> 44.9, "near_dup_gate_sec" -> 4.9),
      baselineKey = "stream_medians")
    assert(r == Right(Map("corpus_clean_sec" -> ((3.1, 44.9)))))
    // committed baseline carries a stream block
    val p = java.nio.file.Paths.get("bench_baseline.json")
    if (java.nio.file.Files.exists(p)) {
      val m = Bench.parseMedians(
        java.nio.file.Files.readString(p), "stream_medians")
      assert(m.nonEmpty && m.values.forall(_ > 0))
    }
  }

  test("medianOf3 takes the median of reps but caps runaway legs") {
    var reps = List(5.0, 2.0)
    def rerun(): Double = { val h = reps.head; reps = reps.tail; h }
    assert(Bench.medianOf3(3.0, () => rerun()) == 3.0) // median(3,5,2)
    // a leg whose first rep blows the cap is not re-run twice more
    var called = 0
    assert(Bench.medianOf3(200.0, () => { called += 1; 1.0 }) == 200.0)
    assert(called == 0)
    // failing re-runs fall back to completed timings
    assert(Bench.medianOf3(1.0, () => sys.error("boom")) == 1.0)
  }

  test("medianMinOf3 carries the min-of-reps for the stream gate") {
    var reps = List(5.0, 2.0)
    def rerun(): Double = { val h = reps.head; reps = reps.tail; h }
    assert(Bench.medianMinOf3(3.0, () => rerun()) == ((3.0, 2.0)))
    // capped legs report the single rep as both median and min
    assert(Bench.medianMinOf3(200.0, () => 1.0) == ((200.0, 200.0)))
    // a min-at-parity stream leg must adjudicate like the batch set:
    // median 3x base but min at base -> not flagged
    val regs = Bench.regressions(
      Map("near_dup_gate_sec" -> 2.0),
      Map("near_dup_gate_sec" -> 6.0),
      currentMins = Map("near_dup_gate_sec" -> 2.1))
    assert(regs.isEmpty, regs)
    // median AND min both over -> flagged
    val real = Bench.regressions(
      Map("near_dup_gate_sec" -> 2.0),
      Map("near_dup_gate_sec" -> 6.0),
      currentMins = Map("near_dup_gate_sec" -> 5.9))
    assert(real.contains("near_dup_gate_sec"), real)
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

  test("metric line stays under the driver's output-tail budget") {
    // reconstruct round 12's real overflow shape: 22 headline medians +
    // 22 mins + 12 tracked heavy entries + a stream object WITH a mins
    // map — the old headline-only fallback was ~2100 chars and the driver
    // recorded parsed:null for five straight rounds
    val head = (1 to 22).map(i => s"q${i}_some_query_name_$i" -> 0.123).toMap
    val heavy = (1 to 12).map(i => s"ext_heavy_entry_number_$i" -> 3.456).toMap
    val medians = head ++ heavy
    val streamLean =
      """{"corpus_clean_rows":5000,"corpus_clean_sec":3.743,"corpus_clean_rows_per_sec":1335.912,"session_window_rows":100000,"session_window_sec":4.092,"session_window_rows_per_sec":24440.237,"near_dup_gate_rows":5000,"near_dup_gate_sec":6.240,"near_dup_gate_rows_per_sec":801.301,"expectations_gate_rows":5000,"expectations_gate_sec":3.026,"expectations_gate_rows_per_sec":1652.469}"""
    val streamFull = streamLean.dropRight(1) +
      ""","mins":{"corpus_clean_sec":3.703,"expectations_gate_sec":1.397,"near_dup_gate_sec":6.114,"session_window_sec":3.150}}"""
    val (out, full) = Bench.chooseMetricLine(
      totalSec = 123.456, nQueries = 395, medians = medians, mins = medians,
      errsJson = "{}",
      regsJson = """{"ext_text_warc_extract":{"base":1.036,"now":10.357}}""",
      streamFull = streamFull, streamLean = streamLean,
      streamRegsJson = """{"expectations_gate_sec":{"base":0.631,"now":3.026}}""",
      loadJson = "3.80", nice = false, sfDir = "/root/testdata/sf0.1")
    assert(full.length > 1700, s"test shape no longer overflows (${full.length})")
    assert(out.length <= 1700, s"chosen line over budget: ${out.length}")
    // contract keys survive every fallback, and the headline queries stay
    for (k <- Seq("\"metric\"", "\"value\"", "\"unit\"", "\"queries\"",
        "\"sf\"", "\"errors\"", "\"regressions\"", "\"stream\"",
        "\"stream_regressions\"", "\"n_queries\":395"))
      assert(out.contains(k), s"missing $k in $out")
    assert(out.contains("q1_some_query_name_1"))
    // a small run keeps the full line (mins + heavy entries included)
    val smallM = Map("q1_pricing_summary" -> 0.5)
    val (outS, fullS) = Bench.chooseMetricLine(1.0, 22, smallM, smallM,
      "{}", "{}", streamFull, streamLean, "{}", "1.00", false, "/d")
    assert(outS == fullS && outS.contains("queries_min"))
    // the last-resort candidate is itself under budget for this shape
    assert(Bench.metricLine(123.456, 395, head, None, "{}", "{}", "null",
      "{}", "3.80", false, "/root/testdata/sf0.1").length <= 1700)
  }

  test("pinned stable-set entries are live registry queries") {
    // a renamed/removed query would silently un-gate its bench entry —
    // the pin must track the registry
    val missing = Bench.pinnedStable.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"pinnedStable names not in registry: $missing")
  }
}
