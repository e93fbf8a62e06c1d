package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PcaOps
import graft.sources.Tables

/** Distributed PCA: the Gram-aggregate covariance must equal a driver-side
  * brute force, eigenpairs must actually diagonalize it, and projections
  * must concentrate variance in leading components. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, TestSpark.sfDir, "embeddings").cache()

  private def bruteCov(): (Array[Double], Array[Array[Double]]) = {
    val vecs = emb.select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    val dim = vecs.head.length
    val means = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      vecs.map(v => (v(i) - means(i)) * (v(j) - means(j))).sum / n
    }.map(_.toArray)
    (means, cov)
  }

  test("distributed covariance equals driver-side brute force") {
    val means = PcaOps.dimMeans(emb, $"embedding")
    val cov = PcaOps.covariance(emb, $"vec_id", $"embedding", means)
    val (bMeans, bCov) = bruteCov()
    means.zip(bMeans).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    for (i <- cov.indices; j <- cov.indices)
      assert(math.abs(cov(i)(j) - bCov(i)(j)) < 1e-9, s"cov($i)($j)")
  }

  test("power iteration finds orthonormal eigenpairs with descending values") {
    val (_, eig) = PcaOps.fit(emb, $"vec_id", $"embedding", k = 8)
    val values = eig.map(_._1)
    assert(values.zip(values.tail).forall { case (a, b) => a >= b - 1e-9 }, values)
    assert(values.head > 0.0)
    // orthonormal within tolerance
    for (a <- eig.indices; b <- a until eig.size) {
      val d = eig(a)._2.zip(eig(b)._2).map { case (x, y) => x * y }.sum
      if (a == b) assert(math.abs(d - 1.0) < 1e-6, s"norm $a")
      else assert(math.abs(d) < 1e-4, s"ortho $a,$b")
    }
    // eigen residual: ||Av - lambda v|| small for the top pair
    val (_, cov) = bruteCov()
    val (l0, v0) = eig.head
    val av = Array.tabulate(cov.length)(i =>
      (0 until cov.length).map(j => cov(i)(j) * v0(j)).sum)
    val resid = math.sqrt(av.zip(v0).map { case (a, v) => (a - l0 * v) * (a - l0 * v) }.sum)
    assert(resid < 1e-6 * math.max(1.0, math.abs(l0)), s"residual $resid")
  }

  test("projection variance per component matches eigenvalues") {
    val (means, eig) = PcaOps.fit(emb, $"vec_id", $"embedding", k = 4)
    val proj = emb.select(
      PcaOps.project($"embedding", means, eig.map(_._2)).as("p"))
    val n = emb.count().toDouble
    val varPerComp = (0 until 4).map { c =>
      val col_ = element_at($"p", c + 1)
      proj.agg((sum(col_ * col_) / n).as("v")).head.getDouble(0)
    }
    // projected variance along component c IS its eigenvalue (data centered)
    varPerComp.zip(eig.map(_._1)).foreach { case (v, l) =>
      assert(math.abs(v - l) < 1e-6 * math.max(1.0, l), s"$v vs $l")
    }
    // projection plan is shuffle-free
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("whitened projection has unit variance per component") {
    val (means, eig) = PcaOps.fit(emb, $"vec_id", $"embedding", k = 4)
    val proj = emb.select(PcaOps.project($"embedding", means,
      eig.map(_._2), eig.map(_._1)).as("p"))
    val n = emb.count().toDouble
    (0 until 4).foreach { c =>
      val pc = element_at($"p", c + 1)
      val v = proj.agg((sum(pc * pc) / n).as("v")).head.getDouble(0)
      assert(math.abs(v - 1.0) < 1e-6, s"component $c variance $v")
    }
  }
}
