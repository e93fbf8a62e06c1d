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
  * Deterministic: codebooks train on the lowest-id sample with fixed Lloyd
  * iterations, so codes and rankings reproduce run-to-run; PqSpec asserts
  * recall against exact search.
  */
object PqOps {

  /** Per-subspace codebooks: `m` × `k` × (dim/m), trained on a bounded
    * DETERMINISTIC sample driver-side — the FAISS discipline: PQ codebook
    * k-means is a tiny-data problem (k centroids in a dim/m-dimensional
    * subspace needs thousands of samples, not the corpus), so production
    * trainers sample regardless of corpus size. One collect of
    * `sampleSize`×dim doubles (lowest ids — reproducible on any engine /
    * partitioning), then plain Lloyd iterations in memory; zero Spark jobs
    * per iteration. The at-scale distributed parts of PQ — [[encode]] over
    * the full corpus and the ADC scan — stay distributed. (A distributed
    * trainer was measured at 3-4 s PER Lloyd iteration on 5k vectors:
    * each round's fresh codebook literal forces full re-analysis/codegen
    * of the assignment plan — all overhead, no arithmetic.)
    *
    * Seeded from the k lowest-id sample vectors, fixed `iters`: codes and
    * rankings reproduce run-to-run. */
  def trainCodebooks(
      df: DataFrame, id: Column, vec: Column,
      dim: Int, m: Int, k: Int, iters: Int = 3,
      sampleSize: Int = 4096): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val sample = df.select(id.cast("long").as("id"), VectorOps.vecD(vec).as("v"))
      .orderBy(col("id")).limit(sampleSize)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.length >= k, s"need ≥$k vectors to train, got ${sample.length}")
    (0 until m).map { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      var cents = pts.take(k).map(_.clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(k, sub)(0.0)
        val counts = new Array[Long](k)
        for (p <- pts) {
          var best = 0; var bestD = Double.MaxValue
          for (c <- 0 until k) {
            var d = 0.0
            var i = 0
            while (i < sub) { val t = p(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
          }
          counts(best) += 1
          for (i <- 0 until sub) sums(best)(i) += p(i)
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(sub)(i => sums(c)(i) / counts(c))
        }
      }
      cents
    }.toArray
  }

  /** Encode vectors to `m` codes: per subspace, the nearest codebook
    * centroid's index. One nested transform over the codebook literal
    * (outer with index = subspace, inner with index = code), so the
    * literal appears once and the whole encode is a single shuffle-free
    * codegen'd projection. Adds `codes: array<int>`. */
  def encode(df: DataFrame, vec: Column, books: Array[Array[Array[Double]]]): DataFrame =
    // Native kernel ([[graft.functions.PqEncode]]): the codebook rides as
    // a plan REFERENCE (one object, not an expression tree) and the whole
    // m×k argmin of ‖c‖² − 2·s·c runs as one tight loop per row. The
    // column-composed transform/array_min form was ~m×k interpreted
    // lambda evaluations + slice/struct allocations per row (HOFs are
    // CodegenFallback) — measured ~600 µs/row at m=32, k=16, i.e. the
    // whole corpus-side cost of a PQ probe. Bit-identical argmin
    // (sequential-fold dot, precomputed norms, ties → lowest code).
    df.withColumn("codes",
      graft.functions.NativeFunctions.pq_encode(vec, books))

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
    // subvector to codebook centroid c of subspace j (codebooks as ONE
    // typedlit literal — see [[encode]] on why per-value lit trees cost
    // seconds of driver plan time)
    val q0 = queries.select(qId.as("q_id"), VectorOps.vecD(qVec).as("q_v"))
    val bookLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val lut = transform(bookLit, (book, j) => {
      val s = slice(col("q_v"), j * sub + 1, lit(sub))
      transform(book, cent => VectorOps.sqDist(s, cent))
    })
    val qLut = q0.select(col("q_id"), lut.as("lut"))
    // native ADC lookup — the zip_with+aggregate HOF form is interpreted
    // per candidate row (the hottest loop of the probe); same sequential
    // double adds, bit-identical sum
    val approxDist =
      graft.functions.NativeFunctions.pq_adc(col("codes"), col("lut"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist"), col("n_id"))
    coded.join(broadcast(qLut))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adist", approxDist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("adist"), 6).as("approx_dist"))
  }

  /** IVF-PQ: the production ANN layout (FAISS "IVFx,PQy") — a coarse
    * quantizer prunes the corpus to each query's `nprobe` nearest cells,
    * and ONLY those cells' m-byte codes are ADC-scored. Per-query cost is
    * (nprobe/numCells)·corpus code lookups; at rest the index is the
    * cell-partitioned code table ([[IvfOps.writeIndex]] layout + `codes`),
    * dim-width floats appear nowhere in the scan. This is the plain (non-
    * residual) variant: codes quantize the vectors themselves, not the
    * cell residuals — one codebook set serves all cells, at some recall
    * cost vs FAISS's per-cell residual encoding.
    *
    * Shape: cell-keyed equi-join between the coded corpus and the
    * broadcast (query × probe-cell) list — candidates never shuffle; only
    * (q_id, n_id, adist) scalars enter the top-k window. */
  def ivfPqTopK(
      queries: DataFrame, candidates: DataFrame,
      qId: Column, qVec: Column, cId: Column, cVec: Column,
      dim: Int, k: Int, numCells: Int = 16, nprobe: Int = 4,
      m: Int = 16, codesPerSub: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = IvfOps.trainCentroids(candidates, cId, cVec, numCells)
    val books = trainCodebooks(candidates, cId, cVec, dim, m, codesPerSub)
    val sub = dim / m
    val coded = encode(
      IvfOps.assignCells(
        candidates.select(cId.as("n_id"), VectorOps.vecD(cVec).as("n_v")),
        col("n_v"), centroids),
      col("n_v"), books)
      .select(col("n_id"), col("cell"), col("codes"))
    val q0 = queries.select(qId.as("q_id"), VectorOps.vecD(qVec).as("q_v"))
    val probeArr = transform(typedlit(centroids.map(_.toSeq).toSeq),
      (c, i) => struct(VectorOps.sqDist(col("q_v"), c).as("d"),
        i.cast("int").as("cell")))
    val bookLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val lut = transform(bookLit, (book, j) => {
      val s = slice(col("q_v"), j * sub + 1, lit(sub))
      transform(book, cent => VectorOps.sqDist(s, cent))
    })
    val qProbes = q0
      .withColumn("lut", lut)
      .withColumn("probes", slice(array_sort(probeArr), 1, nprobe))
      .select(col("q_id"), col("lut"), explode(col("probes.cell")).as("cell"))
    // native ADC lookup — the zip_with+aggregate HOF form is interpreted
    // per candidate row (the hottest loop of the probe); same sequential
    // double adds, bit-identical sum
    val approxDist =
      graft.functions.NativeFunctions.pq_adc(col("codes"), col("lut"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist"), col("n_id"))
    coded.join(broadcast(qProbes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adist", approxDist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("adist"), 6).as("approx_dist"))
  }
}
