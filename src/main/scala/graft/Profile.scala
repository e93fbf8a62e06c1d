package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): time registry
  * queries in isolation (cold + warm reps, same `.count()` action the
  * bench uses so numbers are comparable) and dump `.explain("formatted")`
  * per query for the plan-diff record in plans/r<n>/.
  *
  * Usage: runMain graft.Profile <sfDir> <planOutDir|-> <reps> <name>...
  * A name of `heavy` expands to the baseline's most expensive entries.
  * Not part of the driver contract — Bench/Verify are untouched.
  */
object Profile {
  private val heavySet = Seq(
    "ext_ml_hashed_lr", "pl_dedup_cascade", "ddl_v2_disk_zorder",
    "ext_ann_pq", "ddl_v2_disk_mv_incremental", "pl_semdedup",
    "ext_dedup_jaccard_pairs", "pl_near_dedup_report", "ext_dedup_keeper_map",
    "ext_graph_pagerank", "cat_analyze_stats", "ddl_v2_disk_spj_bucket",
    "ext_dedup_clusters", "ext_graph_component_sizes",
    "pl_contrastive_triplets", "pl_filter_ablation")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("-")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val names = {
      val raw = args.drop(3).toSeq
      if (raw.isEmpty) heavySet
      else raw.flatMap(n => if (n == "heavy") heavySet else Seq(n))
    }
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
    // untimed warmup: session, parquet footers, first codegen
    try SparkEntry.queries("q6_forecast_revenue")(spark, sfDir).count()
    catch { case _: Throwable => }
    for (name <- names) {
      SparkEntry.queries.get(name) match {
        case None => println(f"[profile] $name%-28s MISSING")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(s"profile: $name")
          val times = (0 until reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          val ts = times.map(t => f"$t%7.2f").mkString(" ")
          println(f"[profile] $name%-28s min ${times.min}%7.2f | $ts")
          if (outDir != "-") {
            val df = fn(spark, sfDir)
            df.count() // populate the AQE final plan
            val formatted =
              try df.queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
              catch { case e: Throwable => s"explain failed: $e" }
            val executed = df.queryExecution.executedPlan.toString
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/$name.txt"),
              formatted + "\n\n== Executed (AQE final) ==\n" + executed)
          }
          spark.sparkContext.setJobDescription(null)
      }
    }
    spark.stop()
  }
}
