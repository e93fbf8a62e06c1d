package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the streaming near-dup gate (guide §1): runs
  * the same staged leg the bench times, then prints per-micro-batch
  * durations and per-stateful-operator metrics from the query progress —
  * the data that says whether the leg's cost is input compute (minhash),
  * shuffle, or state-store machinery. Not part of the driver contract. */
object StreamGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate_probe").toString
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
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.streaming.StreamingOps.nearDupGateStream(
        spark, staged.schema, gateDir,
        watermark = "1 hour", horizonMillis = 3600L * 1000)
      val q = df.writeStream.outputMode("append")
        .format("memory").queryName(s"gate_probe_$rep").start()
      try q.processAllAvailable() finally q.stop()
      val n = spark.table(s"gate_probe_$rep").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[gate] rep $rep total $sec%.2f s rows $n")
      q.recentProgress.foreach { p =>
        val dur = p.durationMs
        println(s"[gate]  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"triggerMs=${dur.get("triggerExecution")} " +
          s"addBatch=${dur.get("addBatch")} getBatch=${dur.get("getBatch")} " +
          s"planning=${dur.get("queryPlanning")} walCommit=${dur.get("walCommit")} " +
          s"stateCommit=${dur.get("commitOffsets")}")
        p.stateOperators.foreach { so =>
          println(s"[gate]   op=${so.operatorName} rowsTotal=${so.numRowsTotal} " +
            s"updated=${so.numRowsUpdated} updateMs=${so.allUpdatesTimeMs} " +
            s"removeMs=${so.allRemovalsTimeMs} commitMs=${so.commitTimeMs} " +
            s"memUsed=${so.memoryUsedBytes}")
        }
      }
    }
    spark.stop()
  }
}
