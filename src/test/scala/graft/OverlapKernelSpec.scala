package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the native multiset-overlap kernel against the
  * column-composed HOF it replaced in the ROUGE scorer — exact integer
  * Σ_t min(count_a(t), count_b(t)) including repeats, empties, and null
  * elements (which the HOF's null-propagating `=` never matches). */
class OverlapKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multiset_overlap matches the HOF fold on random and edge arrays") {
    val rnd = new scala.util.Random(7)
    def arr(): Seq[String] =
      Seq.fill(rnd.nextInt(12))(s"t${rnd.nextInt(6)}")
    val cases = Seq.fill(60)((arr(), arr())) ++ Seq(
      (Seq.empty[String], Seq("a")),
      (Seq("a", "a", "b"), Seq("a", "b", "b")),
      (Seq("x"), Seq.empty[String]))
    val df = cases.toDF("a", "b")
    val rows = df.select(
        graft.functions.NativeFunctions.multiset_overlap($"a", $"b")
          .as("native"),
        expr("""aggregate(array_distinct(a), 0, (acc, t) -> acc +
            least(size(filter(a, x -> x = t)), size(filter(b, x -> x = t))))""")
          .as("hof"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // null elements: never matched by the HOF's `=`, never counted natively
    val withNulls = Seq((Seq[String]("a", null, "a"), Seq[String](null, "a")))
      .toDF("a", "b")
    val n = withNulls.select(graft.functions.NativeFunctions
      .multiset_overlap($"a", $"b")).head().getInt(0)
    assert(n == 1)
  }
}
