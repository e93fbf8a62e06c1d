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
    val qs = res.seconds.toSeq.sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = res.errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${res.total},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (res.errors.nonEmpty) sys.exit(1)
  }
}
