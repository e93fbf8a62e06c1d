package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Scratch: BPE query timings at sf0.01/sf0.1 (run explicitly). */
class BpeProfileScratch extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bpe query timings", org.scalatest.Tag("profile")) {
    for (dir <- Seq("/root/testdata/sf0.01");
         q <- Seq("ext_bpe_merges", "ext_bpe_token_counts")) {
      val t0 = System.nanoTime()
      val n = Registry.queries(q)(spark, dir).count()
      println(f"[profile] $q @ $dir: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
  }
}
