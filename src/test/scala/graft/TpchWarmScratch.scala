package graft

import org.scalatest.funsuite.AnyFunSuite

/** Warm TPC-H timing probe (scratch; not in the correctness suite).
  * Warm in-session timings are the stable signal on this noisy shared
  * host — use them before believing a bench "regression". Opt in with
  * SPARK_GRAFT_PROFILE=1. */
class TpchWarmScratch extends AnyFunSuite {
  test("warm tpch q18/q21/q1 at sf0.1", org.scalatest.Tag("profile")) {
    assume(sys.env.contains("SPARK_GRAFT_PROFILE"), "profile-only probe")
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q18_large_orders", "q21_late_shippers", "q1_pricing_summary");
         i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"[warm] $q run$i ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
  }
}
