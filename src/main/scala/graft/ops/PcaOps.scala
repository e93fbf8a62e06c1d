package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the whitening / dimension-
  * reduction step embedding pipelines run before clustering or dedup
  * (e.g. SemDeDup preprocessing).
  *
  * Scale shape: the corpus is touched exactly twice — one aggregate for
  * the per-dimension means, one for the centered Gram (covariance)
  * matrix — and ONLY dim×dim numbers ever reach the driver (dim=64 →
  * 32 KiB), independent of corpus size. The Gram explode produces
  * n·dim²/2 intermediate rows but they partial-aggregate map-side to
  * dim²/2 per partition before the (i, j)-keyed shuffle. The
  * eigendecomposition runs on the driver's dim×dim matrix (power
  * iteration + deflation, deterministic init — no linear-algebra
  * dependency), and projection back over the corpus is a shuffle-free
  * per-row fold against the component matrix as plan literals.
  */
object PcaOps {

  /** Per-dimension means: one aggregate, `dim` rows to the driver. */
  def dimMeans(df: DataFrame, vec: Column): Array[Double] = {
    val rows = df.select(posexplode(VectorOps.vecD(vec)).as(Seq("i", "x")))
      .groupBy(col("i")).agg(avg(col("x")).as("m"))
      .collect()
    val out = new Array[Double](rows.length)
    rows.foreach(r => out(r.getInt(0)) = r.getDouble(1))
    out
  }

  /** Centered covariance matrix via a distributed Gram aggregate: join
    * the (id, i, xi) explode with itself on id, keep the upper triangle,
    * one (i, j)-keyed sum. Returns the full symmetric dim×dim matrix. */
  def covariance(df: DataFrame, id: Column, vec: Column, means: Array[Double]): Array[Array[Double]] = {
    val meanLit = array(means.map(lit(_)): _*)
    val centered = df.select(id.as("id"),
      transform(VectorOps.vecD(vec),
        (x, i) => x - element_at(meanLit, i + 1)).as("v"))
    val ex = centered.select(col("id"), posexplode(col("v")).as(Seq("i", "x")))
    val n = df.count().toDouble
    val upper = ex.alias("a")
      .join(ex.alias("b"), col("a.id") === col("b.id") && col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg((sum(col("a.x") * col("b.x")) / lit(n)).as("c"))
      .collect()
    val dim = means.length
    val cov = Array.fill(dim)(new Array[Double](dim))
    upper.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      cov(i)(j) = c; cov(j)(i) = c
    }
    cov
  }

  /** Top-k eigenpairs of a symmetric matrix by power iteration with
    * deflation. Deterministic: fixed iteration count, fixed start vector
    * (uniform + index perturbation). Returns (eigenvalue, eigenvector)
    * sorted by descending eigenvalue; eigenvector sign is fixed so the
    * largest-magnitude entry is positive. */
  def topEigen(m: Array[Array[Double]], k: Int, iters: Int = 200): Seq[(Double, Array[Double])] = {
    val dim = m.length
    val a = m.map(_.clone())
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim)(i => (0 until dim).map(j => a(i)(j) * v(j)).sum)
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val found = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    (0 until k).map { c =>
      var v = Array.tabulate(dim)(i => 1.0 + 1e-3 * ((i + c) % 7))
      var nv = norm(v); v = v.map(_ / nv)
      for (_ <- 0 until iters) {
        v = matVec(v)
        // re-orthogonalize against found components every step — deflation
        // alone drifts when neighboring eigenvalues are close
        found.foreach { u =>
          val d = (0 until dim).map(i => v(i) * u(i)).sum
          for (i <- 0 until dim) v(i) -= d * u(i)
        }
        nv = norm(v)
        if (nv > 1e-300) v = v.map(_ / nv)
      }
      val lambda = {
        val av = matVec(v)
        (0 until dim).map(i => v(i) * av(i)).sum
      }
      // fix sign: largest-|entry| positive
      val maxIdx = v.indices.maxBy(i => math.abs(v(i)))
      if (v(maxIdx) < 0) v = v.map(-_)
      // deflate: a -= lambda v v^T
      for (i <- 0 until dim; j <- 0 until dim) a(i)(j) -= lambda * v(i) * v(j)
      found += v
      (lambda, v)
    }.toSeq
  }

  /** Project the (centered) embedding onto the top-k components — a
    * shuffle-free per-row fold; components ride as plan literals. Pass
    * `eigenvalues` to whiten: each coordinate divides by √λ so every
    * output dimension has unit variance (the SemDeDup-style
    * preprocessing that stops dominant directions swamping cosine). */
  def project(
      vec: Column, means: Array[Double], components: Seq[Array[Double]],
      eigenvalues: Seq[Double] = Nil): Column = {
    require(eigenvalues.isEmpty || eigenvalues.size == components.size)
    val meanLit = array(means.map(lit(_)): _*)
    val centered = transform(VectorOps.vecD(vec), (x, i) => x - element_at(meanLit, i + 1))
    array(components.zipWithIndex.map { case (comp, c) =>
      val d = VectorOps.dot(centered, array(comp.map(lit(_)): _*))
      if (eigenvalues.isEmpty) d else d / lit(math.sqrt(eigenvalues(c)))
    }: _*)
  }

  /** End-to-end fit: means + covariance + top-k eigenpairs. */
  def fit(df: DataFrame, id: Column, vec: Column, k: Int): (Array[Double], Seq[(Double, Array[Double])]) = {
    val means = dimMeans(df, vec)
    val cov = covariance(df, id, vec, means)
    (means, topEigen(cov, k))
  }
}
