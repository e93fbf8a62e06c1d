package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BloomOps
import graft.sources.Tables

/** Bloom filter contract: zero false negatives (the property the
  * decontamination prefilter relies on), bounded false-positive rate at
  * the standard ~10 bits/key sizing, and build/probe hash agreement. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every inserted key tests positive") {
    val keys = (0 until 2000).map(i => s"key-$i")
    val df = keys.toDF("k")
    val filt = BloomOps.buildFilter(df, $"k", numBits = 1L << 15)
    val misses = df.filter(!BloomOps.mightContain($"k", filt)).count()
    assert(misses === 0L)
  }

  test("false-positive rate stays near theory at 16 bits/key") {
    val inserted = (0 until 2000).map(i => s"in-$i").toDF("k")
    val filt = BloomOps.buildFilter(inserted, $"k", numBits = 1L << 15)
    // disjoint probe population
    val probes = (0 until 10000).map(i => s"out-$i").toDF("k")
    val fp = probes.filter(BloomOps.mightContain($"k", filt)).count()
    // theory at m/n=16.4, k=7 is ~0.2%; allow generous slack
    assert(fp.toDouble / 10000 < 0.02, s"fp=$fp")
  }

  test("bloom prefilter is invisible to an exact decontamination join") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val blocks = graft.ops.DedupOps
      .tokenBlocks(docs, $"doc_id", $"text", blockTokens = 8)
    val probe = blocks.filter($"doc_id" < 25).select($"block")
    val filt = BloomOps.buildFilter(probe, $"block", numBits = 1L << 16)
    val withBloom = blocks.filter($"doc_id" >= 25)
      .filter(BloomOps.mightContain($"block", filt))
      .join(probe.distinct(), Seq("block"), "left_semi")
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    val exact = blocks.filter($"doc_id" >= 25)
      .join(probe.distinct(), Seq("block"), "left_semi")
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(withBloom === exact)
    assert(exact.nonEmpty) // fixture actually exercises the path
  }

  test("probe plan is join-free and shuffle-free before the semi-join") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val filt = BloomOps.buildFilter(
      docs.filter($"doc_id" < 25).select($"text"), $"text", numBits = 1L << 14)
    val plan = docs.filter(BloomOps.mightContain($"text", filt))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("native probe matches the column-composed probe bit-for-bit") {
    import org.apache.spark.sql.functions._
    val docs2 = Tables.load(spark, TestSpark.sfDir, "documents")
    val filt = BloomOps.buildFilter(
      docs2.filter($"doc_id" % 3 === 0).select($"text"), $"text",
      numBits = 1L << 14, numHashes = 7)
    val both = docs2.select($"doc_id",
        BloomOps.mightContain($"text", filt, 7).as("native"),
        BloomOps.mightContainColumns($"text", filt, 7).as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2),
        s"doc ${r.getLong(0)}: native=${r.getBoolean(1)} composed=${r.getBoolean(2)}")
    }
  }
}
