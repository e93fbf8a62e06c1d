package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split each dim-D vector into
  * `m` subspaces of D/m, k-means each subspace independently (codebooks of
  * `k` centroids per subspace), store each vector as `m` small codes. A
  * query builds one m×k lookup table of subspace distances and scores a
  * candidate with m table lookups (ADC — asymmetric distance computation)
  * instead of D multiplies.
  *
  * The 100 TB story is MEMORY, not just FLOPs: a dim-64 float corpus is
  * 256 B/vector raw but m=8, k=16 codes are 8 B/vector — a 32× compression
  * that keeps a trillion-vector index on disk-backed executors, with the
  * codebooks (m·k·D/m doubles) broadcast as plan literals. Composes with
  * [[IvfOps]] cells (IVF-PQ: prune to nprobe cells, then ADC-score codes).
  *
  * Deterministic: codebooks train with [[IvfOps.trainCentroids]] (seeded
  * from lowest-id vectors, fixed Lloyd iterations), so codes and rankings
  * reproduce run-to-run; PqSpec asserts recall against exact search.
  */
object PqOps {

  /** Per-subspace codebooks: `m` × `k` × (dim/m). Subspace `j` trains on
    * `slice(vec, j·sub+1, sub)`; only centroids reach the driver. */
  def trainCodebooks(
      df: DataFrame, id: Column, vec: Column,
      dim: Int, m: Int, k: Int, iters: Int = 3): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val v = df.select(id.as("id"), VectorOps.vecD(vec).as("v")).cache()
    val books = (0 until m).map { j =>
      IvfOps.trainCentroids(
        v.select(col("id"), slice(col("v"), j * sub + 1, sub).as("s")),
        col("id"), col("s"), k, iters)
    }.toArray
    v.unpersist()
    books
  }

  /** Encode vectors to `m` codes: per subspace, the nearest codebook
    * centroid's index (argmin via a sorted (dist, code) struct array, the
    * [[IvfOps.assignCells]] shape). Adds `codes: array<int>`; shuffle-free,
    * codegen'd per row. */
  def encode(df: DataFrame, vec: Column, books: Array[Array[Array[Double]]]): DataFrame = {
    val sub = books(0)(0).length
    val codeCols = books.zipWithIndex.map { case (book, j) =>
      val s = slice(vec, j * sub + 1, sub)
      val distArr = array(book.zipWithIndex.map { case (c, i) =>
        struct(VectorOps.sqDist(s, array(c.map(lit(_)): _*)).as("d"),
          lit(i).as("code"))
      }: _*)
      element_at(array_sort(distArr), 1).getField("code")
    }
    df.withColumn("codes", array(codeCols: _*))
  }

  /** PQ-ADC top-k: approximate L2 distance from query `q` to a candidate is
    * Σ_j lut[j][codes[j]] where lut[j][c] = ‖q_j − book[j][c]‖². The per-
    * query LUT rides the broadcast join as an m×k array literal column; a
    * candidate costs m `element_at` lookups + a sum — no dim-wide arithmetic
    * on the scan side, and candidates stay partitioned (no shuffle of the
    * corpus; only (q_id, n_id, dist) scalars enter the top-k window). */
  def pqTopK(
      queries: DataFrame, candidates: DataFrame,
      qId: Column, qVec: Column, cId: Column, cVec: Column,
      dim: Int, k: Int, m: Int = 8, codesPerSub: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val books = trainCodebooks(candidates, cId, cVec, dim, m, codesPerSub)
    val sub = dim / m
    val coded = encode(
      candidates.select(cId.as("n_id"), VectorOps.vecD(cVec).as("n_v")),
      col("n_v"), books)
      .select(col("n_id"), col("codes"))
    // per-query LUT: lut[j][c] = squared distance from the query's j-th
    // subvector to codebook centroid c of subspace j
    val q0 = queries.select(qId.as("q_id"), VectorOps.vecD(qVec).as("q_v"))
    val lut = array(books.zipWithIndex.map { case (book, j) =>
      val s = slice(col("q_v"), j * sub + 1, sub)
      array(book.map(c => VectorOps.sqDist(s, array(c.map(lit(_)): _*))): _*)
    }: _*)
    val qLut = q0.select(col("q_id"), lut.as("lut"))
    val approxDist = aggregate(
      zip_with(col("codes"), col("lut"),
        (code, lutJ) => element_at(lutJ, code + 1)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist"), col("n_id"))
    coded.join(broadcast(qLut))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adist", approxDist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("adist"), 6).as("approx_dist"))
  }
}
