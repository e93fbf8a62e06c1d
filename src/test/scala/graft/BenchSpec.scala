package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A broken query must surface as a bench error (and a nonzero exit in
  * main), never as a fast-looking timing entry. */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bench records per-query failures instead of swallowing them") {
    val qs = Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame](
      "ok" -> ((s, _) => s.range(3).toDF()),
      "broken" -> ((s, _) => s.read.parquet("/nonexistent/graft/path")))
    val r = Bench.runAll(spark, TestSpark.sfDir, qs)
    assert(r.errors.keySet == Set("broken"))
    assert(r.errors("broken").nonEmpty)
    assert(r.seconds.keySet == Set("ok", "broken"))
  }
}
