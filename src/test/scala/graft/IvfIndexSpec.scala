package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IvfOps, VectorOps}
import graft.sources.Tables

/** Persisted IVF index: cell-partitioned parquet layout + partition-pruned
  * probes. The pruning assertion is the point — at scale a probe must read
  * nprobe directories, not the corpus.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")

  test("probe over the persisted index prunes to nprobe cell partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    val numCells = 8
    val nprobe = 3
    val centroids = IvfOps.writeIndex(emb, $"vec_id", $"embedding", dir, numCells)
    assert(centroids.length == numCells)

    val qVec = emb.orderBy($"vec_id").limit(1)
      .select(VectorOps.vecD($"embedding")).head().getSeq[Double](0)
    val probe = IvfOps.probeIndex(spark, dir, centroids, qVec, k = 10, nprobe = nprobe)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)

    val got = probe.collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.length == 10)
    // results sorted by cosine desc and self is rank 1 (query IS vector 0)
    assert(got.map(_._2).toSeq == got.map(_._2).sortBy(-_).toSeq)
    assert(math.abs(got.head._2 - 1.0) < 1e-9)

    // the probed candidate set matches an unpersisted cell-filtered scan —
    // i.e. pruning changed WHAT IS READ, not the result
    val probeCells = centroids.zipWithIndex
      .map { case (c, i) => (c.zip(qVec).map { case (a, b) => (a - b) * (a - b) }.sum, i) }
      .sortBy(_._1).take(nprobe).map(_._2).toSet
    val expected = IvfOps.assignCells(
        emb.select($"vec_id".as("n_id"), VectorOps.vecD($"embedding").as("n_v")),
        org.apache.spark.sql.functions.col("n_v"), centroids)
      .filter($"cell".isInCollection(probeCells))
      .withColumn("cosine",
        VectorOps.dot(
          org.apache.spark.sql.functions.array(qVec.map(org.apache.spark.sql.functions.lit(_)): _*),
          $"n_v") / (org.apache.spark.sql.functions.lit(
            math.sqrt(qVec.map(x => x * x).sum)) * VectorOps.l2norm($"n_v")))
      .orderBy($"cosine".desc, $"n_id")
      .limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(got.map(_._1).toSeq == expected)
  }
}
