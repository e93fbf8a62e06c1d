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
  * reported as per-query MEDIAN of 3 (plus a `queries_min` map): one-shot
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

  /** The per-query breakdown printed on stdout is limited to the headline
    * TPC-H analogs so the final JSON line stays well under the driver's
    * 2000-char output-tail window (the full 80+-query map overflowed it and
    * the driver recorded `parsed: null` in rounds 1-2). The complete
    * breakdown still goes to stderr and all queries still run + error-check.
    */
  private def isHeadline(name: String): Boolean = name.matches("q\\d+_.*")

  private def fmt(v: Double): String = f"$v%.3f"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session, parquet footers, first codegen
    try SparkEntry.queries.get("q6_forecast_revenue").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    val res = runAll(spark, sfDir, SparkEntry.queries)
    def qsJson(m: Map[String, Double]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ":" + fmt(v) }.mkString("{", ",", "}")
    val errs = res.errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }.mkString("{", ",", "}")
    System.err.println(
      s"""{"all_queries":${qsJson(res.seconds)},"n":${res.seconds.size}}""")
    // headline stability: 2 extra timed repeats -> median-of-3 + min
    val headlineRuns: Map[String, Seq[Double]] = res.seconds.collect {
      case (name, first) if isHeadline(name) && !res.errors.contains(name) =>
        // a transient re-run failure must not abort the bench after the
        // full timed pass already succeeded — fall back to the first timing
        val more = (0 until 2).flatMap { _ =>
          try {
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, sfDir).count()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case _: Throwable => None }
        }
        name -> (first +: more)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val medians = headlineRuns.map { case (n, xs) => n -> median(xs) }
    val mins = headlineRuns.map { case (n, xs) => n -> xs.min }
    println(s"""{"metric":"total","value":${fmt(res.total)},"unit":"sec","queries":${qsJson(medians)},"queries_min":${qsJson(mins)},"n_queries":${res.seconds.size},"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (res.errors.nonEmpty) sys.exit(1)
  }
}
