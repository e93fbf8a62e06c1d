package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry
import graft.sources.Tables

/** Pipeline operators whose outputs the DuckDB oracle can't hash-compare:
  * seeded stratified sampling (Bernoulli draw internals are engine-specific). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stratified sample hits per-stratum fractions within tolerance") {
    import spark.implicits._
    val fractions = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25,
      "es" -> 0.1, "zh" -> 0.1)
    val totals = Tables.load(spark, TestSpark.sfDir, "documents")
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Registry.queries("pl_sample_stratified")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    sampled.foreach { case (lang, n) =>
      val expected = totals(lang) * fractions(lang)
      // Bernoulli draw: allow 4 sigma of binomial spread (+1 for tiny strata)
      val sigma = math.sqrt(totals(lang) * fractions(lang) * (1 - fractions(lang)))
      assert(math.abs(n - expected) <= 4 * sigma + 1,
        s"$lang: sampled $n, expected ~$expected (±${4 * sigma + 1})")
    }
  }

  test("stratified sample is deterministic for a fixed seed") {
    val a = Registry.queries("pl_sample_stratified")(spark, TestSpark.sfDir).collect().toSeq
    val b = Registry.queries("pl_sample_stratified")(spark, TestSpark.sfDir).collect().toSeq
    assert(a == b)
  }
}
