package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Every registered query builds and executes at sf0.001; queries that must
  * be non-empty at the smallest SF are asserted so. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Empty at sf0.001 is acceptable for these (their filters legitimately
  // select nothing in 6k rows); everything else must return rows.
  private val mayBeEmpty = Set("ext_dedup_minhash_lsh", "ext_dedup_jaccard_pairs")

  Registry.queryDefs.foreach { d =>
    test(s"${d.name} executes" + (if (d.oracle.isEmpty) " (rows-only)" else "")) {
      val n = d.build(spark, TestSpark.sfDir).count()
      if (!mayBeEmpty(d.name)) assert(n > 0, s"${d.name} returned no rows")
    }
  }

  test("entry() returns rows (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name is a registered query") {
    val qs = Registry.queries.keySet
    assert(Registry.oracleSql.keySet.subsetOf(qs))
  }
}
