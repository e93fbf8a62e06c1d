package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PqOps, VectorOps}
import graft.sources.Tables

/** Product quantization: codes are within range, encoding is deterministic,
  * and ADC top-k reaches useful recall against exact L2 search while
  * scoring 8-byte codes instead of 256-byte vectors.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    Tables.load(spark, TestSpark.sfDir, "embeddings").cache()

  test("codes: m entries, all in [0, k); deterministic run-to-run") {
    val books = PqOps.trainCodebooks(emb, $"vec_id", $"embedding",
      dim = 64, m = 8, k = 16)
    assert(books.length == 8 && books.forall(_.length == 16) &&
      books.forall(_.forall(_.length == 8)))
    val coded = PqOps.encode(
      emb.select($"vec_id", VectorOps.vecD($"embedding").as("v")),
      col("v"), books)
      .select($"vec_id", $"codes").collect()
    assert(coded.forall(_.getSeq[Int](1).size == 8))
    assert(coded.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 16)))
    val again = PqOps.encode(
      emb.select($"vec_id", VectorOps.vecD($"embedding").as("v")),
      col("v"), books)
      .select($"vec_id", $"codes").collect()
    assert(coded.map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap ==
      again.map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap)
  }

  // The fixture embeddings are near-uniform unit vectors (same-label and
  // other-label mean L2 distances are 1.95 vs 1.97 — the labels are NOT
  // proximity clusters), so the nearest-neighbor margin is thin and PQ —
  // which approximates the SCORE, unlike IVF/LSH which only prune
  // candidates and score exactly — needs the 16-byte m=32×16 budget to
  // resolve it. Measured at this budget: recall@5 = 0.62, top-decile
  // containment = 0.96; asserted with margin below.
  test("ADC top-5: useful recall and top-decile containment vs exact L2") {
    val queries = emb.filter($"vec_id" < 10)
    val approx = PqOps.pqTopK(queries, emb, $"vec_id", $"embedding",
        $"vec_id", $"embedding", dim = 64, k = 5, m = 32, codesPerSub = 16)
      .select($"q_id", $"n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val v = emb.select($"vec_id".as("id"), VectorOps.vecD($"embedding").as("v"))
    val q = v.filter($"id" < 10).select($"id".as("q_id"), $"v".as("q_v"))
    val exact = v.join(broadcast(q))
      .filter($"q_id" =!= $"id")
      .withColumn("d", VectorOps.sqDist($"q_v", $"v"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"d", $"id")))
    val ex5 = exact.filter($"rank" <= 5)
      .select($"q_id", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex50 = exact.filter($"rank" <= 50)
      .select($"q_id", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = approx.count(ex5.contains).toDouble / approx.length
    assert(recall >= 0.4, s"PQ recall@5 too low: $recall")
    val contained = approx.count(ex50.contains).toDouble / approx.length
    assert(contained >= 0.85,
      s"only $contained of ADC neighbors inside the exact top decile")
  }

  test("IVF-PQ equals full-scan ADC restricted to the probed cells") {
    import graft.ops.IvfOps
    val queries = emb.filter($"vec_id" < 10)
    val ivfpq = PqOps.ivfPqTopK(queries, emb, $"vec_id", $"embedding",
        $"vec_id", $"embedding", dim = 64, k = 5, numCells = 16, nprobe = 6,
        m = 32, codesPerSub = 16)
      .select($"q_id", $"rank", $"n_id", $"approx_dist").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    // reference: full-scan ADC (same codebooks/codes), keep only
    // candidates whose cell is among the query's nprobe nearest, re-rank
    val centroids = IvfOps.trainCentroids(emb, $"vec_id", $"embedding", 16)
    val cells = IvfOps.assignCells(
        emb.select($"vec_id".as("id"), VectorOps.vecD($"embedding").as("v")),
        col("v"), centroids)
      .select($"id", $"cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def probeSet(q: Long): Set[Int] = {
      val qvec = emb.filter($"vec_id" === q)
        .select(VectorOps.vecD($"embedding")).head.getSeq[Double](0).toArray
      centroids.zipWithIndex
        .map { case (c, i) => (c.zip(qvec).map { case (a, b) => (a - b) * (a - b) }.sum, i) }
        .sortBy(_._1).take(6).map(_._2).toSet
    }
    val full = PqOps.pqTopK(queries, emb, $"vec_id", $"embedding",
        $"vec_id", $"embedding", dim = 64, k = 500, m = 32, codesPerSub = 16)
      .select($"q_id", $"n_id", $"approx_dist").collect()
      .groupBy(_.getLong(0))
    for (q <- 0L until 10L) {
      val probes = probeSet(q)
      val expect = full(q).filter(r => probes.contains(cells(r.getLong(1))))
        .sortBy(r => (r.getDouble(2), r.getLong(1))).take(5)
        .map(r => (r.getLong(1), r.getDouble(2)))
      val got = (1 to 5).map(rk => ivfpq((q, rk)))
      assert(got == expect.toSeq, s"query $q")
    }
  }

  test("registry entry ext_ann_pq returns k rows per query, ranked") {
    val rows = graft.queries.Registry.queries("ext_ann_pq")(spark, TestSpark.sfDir)
      .collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5))
    byQ.values.foreach { rs =>
      val ranked = rs.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to 5))
      // approx distances are non-decreasing in rank
      val ds = ranked.map(_.getDouble(3))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }
}
