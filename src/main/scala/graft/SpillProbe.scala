package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure spill proof, run in a FORKED small-heap JVM (see
  * `ScaleOpsSpec`): a session whose force-spill thresholds are set to a few
  * elements runs the heaviest pipeline entries end-to-end, so every
  * aggregate / sort-merge join / window buffer takes its spill path. The
  * local[32]/128 GiB bench never exercises those paths; at 100 TB they ARE
  * the steady state — an operator that only works when its hash map fits
  * in memory is not a scale-ready operator. Prints one line:
  * `SPILL_PROBE_OK rows=<n> spilledBytes=<m>` and exits 0 on success. */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spill-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // leave little to execution memory and lower the element-count spill
      // triggers so sorts/joins/windows genuinely spill — but not so low
      // that THOUSANDS of spill files' read-ahead buffers (2 MB each)
      // become their own OOM (the 64-element setting did exactly that).
      // The force-spill threshold stays at 20000: it is NOT the probe's
      // spill mechanism anymore — real memory pressure is, via the
      // spark.testing.memory pool cap below (the r12 posting-list rewrite
      // removed the window/SMJ element-count buffers the old thresholds
      // used to trip).
      .config("spark.memory.fraction", "0.2")
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "20000")
      // cap the memory MANAGER's view of the heap (the documented testing
      // knob): 0.2 × (450 MB − 300 MB reserved) ≈ 30 MB of execution
      // memory across 4 cores, so the fixture-sized aggregates/sorts/
      // joins/windows must take their spill paths to complete at all —
      // the r12 posting-list rewrite removed the window/SMJ buffers whose
      // element thresholds used to force synthetic spills here, and the
      // fixture SFs are too small to pressure a genuine 1 GiB pool
      .config("spark.testing.memory", (450L * 1024 * 1024).toString)
      .config("spark.sql.windowExec.buffer.spill.threshold", "4096")
      .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "4096")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "64")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spilled = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        Option(e.taskMetrics).foreach(m =>
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled))
    })
    val rows =
      SparkEntry.queries("pl_dedup_cascade")(spark, sfDir).count() +
        SparkEntry.queries("pl_corpus_clean")(spark, sfDir).count() +
        SparkEntry.queries("q18_large_orders")(spark, sfDir).count()
    // listener events drain asynchronously — give the bus a moment
    val deadline = System.nanoTime() + 10_000_000_000L
    while (spilled.get() == 0 && System.nanoTime() < deadline) Thread.sleep(200)
    println(s"SPILL_PROBE_OK rows=$rows spilledBytes=${spilled.get()}")
    spark.stop()
    if (rows <= 0) sys.exit(2)
  }
}
