package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TfIdfOps

/** TF-IDF vs hand computation on a tiny corpus. */
class TfIdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topTerms matches hand-computed smoothed tf-idf") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry date")).toDF("doc_id", "text")
    val got = TfIdfOps.topTerms(docs, $"doc_id", $"text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
      .toSet

    def idf(df: Long): Double = math.log(4.0 / (df + 1.0)) + 1.0
    def rnd(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // df: apple 1, banana 2, cherry 2, date 1
    val want = Set(
      (1L, "apple", 2L, 1L, rnd(2 * idf(1)), 1),
      (1L, "banana", 1L, 2L, rnd(1 * idf(2)), 2),
      (2L, "banana", 1L, 2L, rnd(1 * idf(2)), 1), // tie with cherry → term asc
      (2L, "cherry", 1L, 2L, rnd(1 * idf(2)), 2),
      (3L, "cherry", 2L, 2L, rnd(2 * idf(2)), 1),
      (3L, "date", 1L, 1L, rnd(1 * idf(1)), 2))
    assert(got == want)
  }

  test("rank is dense per doc and capped at k") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val got = TfIdfOps.topTerms(docs, $"doc_id", $"text", k = 3).collect()
    assert(got.length == 3)
    assert(got.map(_.getInt(5)).sorted.toSeq == Seq(1, 2, 3))
  }
}
