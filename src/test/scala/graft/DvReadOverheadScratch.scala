package graft

import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read READ-overhead probe (scratch; not in the correctness
  * suite): quantifies what a deletion vector costs a scan. Since round
  * 10 the composite batch stays COLUMNAR — clean files pass vectorized
  * batches through, DV'd batches filter with a zero-copy fast path —
  * so the residual cost is the per-file partition regrouping plus the
  * row-index column on DV'd files (measured ~1.1× warm vs the 1.35× of
  * the round-9 all-row-based shape). Prints warm timings of the same
  * aggregate over (a) the clean table, (b) after a 1-row DV delete,
  * (c) after OPTIMIZE PURGE DELETES. Opt in with SPARK_GRAFT_PROFILE=1. */
class DvReadOverheadScratch extends AnyFunSuite {
  test("dv read overhead at sf0.1 lineitem", org.scalatest.Tag("profile")) {
    assume(sys.env.contains("SPARK_GRAFT_PROFILE"), "profile-only probe")
    val spark = TestSpark.spark
    spark.conf.set("spark.sql.catalog.gdvprof",
      classOf[graft.sources.GraftDiskCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdvprof.warehouse",
      java.nio.file.Files.createTempDirectory("gdv_prof").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdvprof.p")
    graft.sources.Tables.register(spark, "/root/testdata/sf0.1", Seq("lineitem"))
    spark.sql("""CREATE TABLE gdvprof.p.li (
        l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE)
      TBLPROPERTIES ('delete.mode'='dv')""")
    spark.sql("""INSERT INTO gdvprof.p.li
      SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem""")
    def time(tag: String): Unit = for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      spark.sql("""SELECT count(*), sum(l_quantity), sum(l_extendedprice)
        FROM gdvprof.p.li WHERE l_orderkey % 3 = 0""").collect()
      println(f"[dv-prof] $tag run$i ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    time("clean      ")
    spark.sql("DELETE FROM gdvprof.p.li WHERE l_orderkey = 7")
    time("1-row dv   ")
    new GraftSession(spark).sql("OPTIMIZE gdvprof.p.li PURGE DELETES")
    time("post-purge ")
  }
}
