package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BpeOps
import graft.sources.Tables

/** BPE trainer correctness: the distributed DataFrame implementation must
  * learn exactly the merge list a sequential in-memory BPE (Sennrich et al.
  * 2016) learns on the same corpus, and the encoder's token counts must
  * match sequential encoding.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- independent sequential reference (ground truth) -------------------

  private def refWords(corpus: Seq[String]): Map[Vector[String], Long] =
    corpus.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }

  private def refMergeWord(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(corpus: Seq[String], k: Int): Seq[(String, String, Long)] = {
    var words = refWords(corpus)
    val merges = Seq.newBuilder[(String, String, Long)]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, w) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + w
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.toSeq.minBy { case ((l, r), f) => (-f, l, r) }
        merges += ((l, r, f))
        words = words.toSeq.map { case (syms, w) => refMergeWord(syms, l, r) -> w }
          .groupBy(_._1).map { case (s, ws) => s -> ws.map(_._2).sum }
        rank += 1
      }
    }
    merges.result()
  }

  private def refEncodeCount(text: String, merges: Seq[(String, String, Long)]): Int =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).map { w =>
      merges.foldLeft(w.map(_.toString).toVector) { case (syms, (l, r, _)) =>
        refMergeWord(syms, l, r)
      }.length
    }.sum

  // ---- fixtures ----------------------------------------------------------

  private val corpus = Seq(
    "low lower lowest newest newest",
    "wider wide wide widest low low",
    "the newest new news is new",
    "a low blow below the widest window",
    "i saw the lowest ebb of the new era")

  test("distributed train equals sequential reference (merge-for-merge)") {
    val df = corpus.toDF("text")
    val got = BpeOps.train(spark, df, $"text", k = 12)
      .map(m => (m.left, m.right, m.freq))
    val want = refTrain(corpus, 12)
    assert(got == want)
  }

  test("tie-break is deterministic lexicographic on (left, right)") {
    // every pair here occurs exactly once → all ties; lexicographically
    // smallest pair must win every round
    val df = Seq("abcd").toDF("text")
    val got = BpeOps.train(spark, df, $"text", k = 3).map(m => (m.left, m.right))
    assert(got == refTrain(Seq("abcd"), 3).map { case (l, r, _) => (l, r) })
    assert(got.head == ("a", "b"))
  }

  test("encodeTokenCount matches sequential encoding on every doc") {
    val merges = refTrain(corpus, 10)
    val bm = merges.zipWithIndex.map { case ((l, r, f), i) => BpeOps.Merge(i, l, r, f) }
    val got = corpus.toDF("text")
      .select($"text", BpeOps.encodeTokenCount($"text", bm).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    for (doc <- corpus)
      assert(got(doc) == refEncodeCount(doc, merges), s"doc: $doc")
  }

  test("encode scales to realistic vocabulary sizes (800 merges, one plan)") {
    // the native imperative expression must handle vocab-scale merge lists
    // (the HOF formulation nested one aggregate() per merge and collapsed);
    // most of these merges never fire — the point is plan size, not effect
    val real = refTrain(corpus, 10)
    val filler = (0 until 790).map(i => (s"zz${i}a", s"zz${i}b", 1L))
    val merges = (real ++ filler).zipWithIndex
      .map { case ((l, r, f), i) => BpeOps.Merge(i, l, r, f) }
    val got = corpus.toDF("text")
      .select($"text", BpeOps.encodeTokenCount($"text", merges).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    for (doc <- corpus)
      assert(got(doc) == refEncodeCount(doc, real), s"doc: $doc")
  }

  test("merges shrink token counts monotonically vs character baseline") {
    val df = corpus.toDF("text")
    val merges = BpeOps.train(spark, df, $"text", k = 8)
    val chars = corpus.map(_.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      .map(_.length).sum).sum
    val encoded = corpus.map(refEncodeCount(_, merges.map(m => (m.left, m.right, m.freq))))
    assert(encoded.sum < chars)
  }

  test("trains on the driver documents table") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val merges = BpeOps.train(spark, docs, $"text", k = 6)
    assert(merges.length == 6)
    assert(merges.map(_.rank) == (0 until 6))
    // frequencies are non-increasing is NOT guaranteed by BPE (a merge can
    // create a new high-frequency pair), but each freq must be positive
    assert(merges.forall(_.freq > 0))
  }
}
