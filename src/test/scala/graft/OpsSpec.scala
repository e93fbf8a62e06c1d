package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash64
import graft.ops._
import graft.sources.Tables

/** Extension-operator correctness: hash-seeded algorithms (MinHash, SimHash,
  * LSH) cross-checked against their exact baselines. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, TestSpark.sfDir, "documents").cache()
  private lazy val emb = Tables.load(spark, TestSpark.sfDir, "embeddings").cache()

  test("simhash64 expression matches reference implementation") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),
      (3L, "completely different words entirely")).toDF("id", "text")
    val got = df.select($"id", SimHash64.simhash64(TextOps.tokens($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = SimHash64.ofTokens(Seq("the", "quick", "brown", "fox"))
    assert(got(1L) == expected)
    assert(got(1L) == got(2L)) // identical text, identical signature
    assert(got(1L) != got(3L))
  }

  test("simhash hamming 0 for identical docs, small for near-identical") {
    val a = SimHash64.ofTokens(Seq.tabulate(50)(i => s"tok$i"))
    val b = SimHash64.ofTokens(Seq.tabulate(50)(i => s"tok$i") :+ "extra")
    assert(java.lang.Long.bitCount(a ^ b) <= 8)
  }

  test("minhash LSH finds the exact-Jaccard pairs (high-threshold recall)") {
    val exact = DedupOps.jaccardPairs(docs, $"doc_id", $"text", 3, 0.9)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLshPairs(docs, $"doc_id", $"text", 3, 16, 4, 0.9)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification filters false positives, so LSH ⊆ exact; 16x4 bands at
    // J≥0.9 give recall ≈ 1 on this corpus
    assert(lsh.subsetOf(exact))
    assert(lsh == exact, s"missed pairs: ${exact -- lsh}")
  }

  test("chunk-banded simhash pairs equal brute force (pigeonhole recall)") {
    import graft.functions.SimHash64.simhash64
    val sigs = docs.select($"doc_id", simhash64(TextOps.tokens($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val banded = DedupOps.simhashPairs(docs, $"doc_id", $"text")
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
  }

  test("exact dedup keeps one keeper per key") {
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "t")
    val got = DedupOps.exactDedup(d, $"t", $"id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 1L, 2L), ("b", 3L, 1L)))
  }

  test("brute-force top-k is exact (verified against local computation)") {
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = vecs.filter(_._1 != 0L).toSeq
      .map { case (id, v) => (id, cos(vecs(0L), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
    val got = SimilarityOps.bruteForceTopK(
        emb.filter($"vec_id" === 0), emb, $"vec_id", $"embedding", $"vec_id", $"embedding", 3)
      .orderBy($"rank").select($"n_id").collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("LSH ANN achieves reasonable recall vs brute force") {
    val brute = SimilarityOps.bruteForceTopK(
        emb.filter($"vec_id" < 10), emb, $"vec_id", $"embedding", $"vec_id", $"embedding", 5)
      .select($"q_id", $"n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.lshTopK(
        emb.filter($"vec_id" < 10), emb, $"vec_id", $"embedding", $"vec_id", $"embedding", 5)
      .select($"q_id", $"n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall too low: $recall") // 4 tables x 6 bits, multiprobe
  }

  test("text ops: token count, shingles, fingerprint") {
    val d = Seq("the quick brown fox jumps").toDF("text")
    val r = d.select(
      TextOps.tokenCount($"text").as("n"),
      size(TextOps.shingles($"text", 3)).as("sh"),
      TextOps.fingerprint($"text").as("fp"),
      TextOps.langId($"text").as("lang")).collect().head
    assert(r.getInt(0) == 5)
    assert(r.getInt(1) == 3) // 5 tokens -> 3 trigrams
    assert(r.getString(2).length == 32)
    assert(r.getString(3) == "en")
  }

  test("multimodal stub extracts deterministic metadata") {
    val media = MultimodalOps.asBinaryPayload(docs.limit(10), "doc_id", "text")
    val a = MultimodalOps.extractMeta(spark, media).collect().sortBy(_.doc_id)
    val b = MultimodalOps.extractMeta(spark, media).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq) // deterministic
    assert(a.forall(m => m.byte_len > 0 && m.checksum.length == 32))
    assert(a.forall(m => m.width >= 64 && m.height >= 64))
  }
}
