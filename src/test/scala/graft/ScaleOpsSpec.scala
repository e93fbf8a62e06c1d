package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IvfOps, SimilarityOps, SkewOps}
import graft.sources.Tables

/** Scale-path operators: salting equals the unsalted results; IVF achieves
  * useful recall against brute force while scanning a fraction of cells. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def skewed = {
    // one hot key (90%) + uniform tail — decimal values so sums are exact
    val hot = (1 to 900).map(i => ("hot", BigDecimal(i).setScale(2)))
    val tail = (1 to 100).map(i => (s"k${i % 10}", BigDecimal(i).setScale(2)))
    (hot ++ tail).toDF("key", "value")
      .withColumn("value", col("value").cast(DecimalType(12, 2)))
  }

  test("salted aggregation equals plain groupBy on a hot key") {
    val plain = skewed.groupBy($"key")
      .agg(sum($"value").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    val salted = SkewOps.saltedSum(skewed, $"key", $"value", salts = 8)
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join on a hot key") {
    val dim = Seq(("hot", 1), ("k1", 2), ("k5", 3)).toDF("dkey", "attr")
    val plain = skewed.join(dim, $"key" === $"dkey")
      .groupBy($"dkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewOps.saltedJoin(skewed, dim, "key", "dkey", salts = 8)
      .groupBy($"dkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("IVF top-k achieves useful recall scanning nprobe/numCells of data") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings").cache()
    val brute = SimilarityOps.bruteForceTopK(
        emb.filter($"vec_id" < 10), emb, $"vec_id", $"embedding", $"vec_id", $"embedding", 5)
      .select($"q_id", $"n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = IvfOps.ivfTopK(
        emb.filter($"vec_id" < 10), emb, $"vec_id", $"embedding", $"vec_id", $"embedding",
        k = 5, numCells = 16, nprobe = 6)
      .select($"q_id", $"n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF recall too low: $recall")
  }

  test("IVF is deterministic run-to-run") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    def run() = IvfOps.ivfTopK(
        emb.filter($"vec_id" < 3), emb, $"vec_id", $"embedding", $"vec_id", $"embedding",
        k = 3, numCells = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run() == run())
  }
}
