package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: a coarse k-means quantizer partitions vectors
  * into cells; a query scans only its `nprobe` nearest cells. The cluster
  * assignment and per-cell candidate scan are distributed; only the K×dim
  * centroid matrix ever touches the driver (the standard IVF layout — at
  * 100 TB the cell-assigned table is written partitioned by cell and a
  * query prunes to nprobe partitions).
  *
  * Deterministic: centroids seed from the first K vectors by id and Lloyd
  * iterations are fixed-count, so results are reproducible run-to-run.
  */
object IvfOps {

  /** K-means centroids (K × dim), seeded from the K lowest-id vectors,
    * `iters` Lloyd steps over a bounded DETERMINISTIC sample collected to
    * the driver — the FAISS discipline: a coarse quantizer of K cells
    * needs thousands of training points, not the corpus, so production
    * trainers sample regardless of corpus size (the corpus-wide work —
    * cell ASSIGNMENT and probing — stays distributed). One collect of
    * `sampleSize`×dim doubles, ordered by id so the result reproduces on
    * any engine/partitioning. (The previous distributed trainer spent
    * 1-2 s PER Lloyd iteration re-analyzing/codegen'ing the assignment
    * plan — each round's fresh centroid literals defeat plan caching.) */
  def trainCentroids(
      df: DataFrame, id: Column, vec: Column,
      k: Int, iters: Int = 3, sampleSize: Int = 4096): Array[Array[Double]] = {
    val pts = df.select(id.cast("long").as("id"), VectorOps.vecD(vec).as("v"))
      .orderBy(col("id")).limit(math.max(k, sampleSize))
      .collect().map(_.getSeq[Double](1).toArray)
    require(pts.length >= k, s"need ≥$k vectors to train, got ${pts.length}")
    val dim = pts(0).length
    var centroids = pts.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Long](k)
      for (p <- pts) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = p(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => sums(c)(i) / counts(c))
      }
    }
    centroids
  }

  /** Nearest-centroid cell id for each row (centroids broadcast as plan
    * literals; per-row argmin over K distances via `array_min` on a
    * (dist, cell) struct array — O(K) with no sort, and a when-chain fold
    * would duplicate subtrees exponentially). */
  def assignCells(df: DataFrame, vec: Column, centroids: Array[Array[Double]]): DataFrame = {
    // centroid matrix as ONE typedlit literal — per-value lit(..) trees
    // (K×dim expression nodes) cost the analyzer/optimizer far more than
    // the executed argmin does (see PqOps.encode)
    val distArr = transform(typedlit(centroids.map(_.toSeq).toSeq),
      (c, i) => struct(VectorOps.sqDist(vec, c).as("d"),
        i.cast("int").as("cell")))
    df.withColumn("cell", array_min(distArr).getField("cell"))
  }

  /** IVF top-k: per query, rank only the candidates whose cell is among the
    * query's `nprobe` nearest centroids. */
  def ivfTopK(
      queries: DataFrame, candidates: DataFrame,
      qId: Column, qVec: Column, cId: Column, cVec: Column,
      k: Int, numCells: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = trainCentroids(candidates, cId, cVec, numCells)
    val c = assignCells(
      candidates.select(cId.as("n_id"), VectorOps.vecD(cVec).as("n_v")), col("n_v"), centroids)
      .withColumn("n_n", VectorOps.l2norm(col("n_v")))
    // per query: the nprobe nearest cells
    val q0 = queries.select(qId.as("q_id"), VectorOps.vecD(qVec).as("q_v"))
      .withColumn("q_n", VectorOps.l2norm(col("q_v")))
    val probeCols = transform(typedlit(centroids.map(_.toSeq).toSeq),
      (c, i) => struct(VectorOps.sqDist(col("q_v"), c).as("d"),
        i.cast("int").as("cell")))
    val qProbes = q0
      .withColumn("probes", slice(array_sort(probeCols), 1, nprobe))
      .select(col("q_id"), col("q_v"), col("q_n"), explode(col("probes.cell")).as("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    c.join(broadcast(qProbes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", VectorOps.dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")))
      .dropDuplicates("q_id", "n_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cosine"))
  }

  // ------------------------------------------------------ persisted index

  /** Materialize the IVF index at rest: cell-assign every vector and write
    * Hive-partitioned by cell. At 100 TB this is the whole point of IVF —
    * a probe reads ONLY its nprobe cell directories (partition pruning at
    * the source), so per-query scan cost is nprobe/numCells of the corpus.
    * Returns the centroid matrix the probes need. */
  def writeIndex(
      df: DataFrame, id: Column, vec: Column,
      path: String, numCells: Int = 16): Array[Array[Double]] = {
    val centroids = trainCentroids(df, id, vec, numCells)
    assignCells(df.select(id.as("n_id"), VectorOps.vecD(vec).as("n_v")),
        col("n_v"), centroids)
      .withColumn("n_n", VectorOps.l2norm(col("n_v")))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    centroids
  }

  /** Probe the persisted index: `cell IN (nprobe nearest cells)` prunes to
    * those partition directories before any row is read. */
  def probeIndex(
      spark: SparkSession, path: String, centroids: Array[Array[Double]],
      qVec: Seq[Double], k: Int, nprobe: Int = 4): DataFrame = {
    val probeCells = centroids.zipWithIndex
      .map { case (c, i) => (c.zip(qVec).map { case (a, b) => (a - b) * (a - b) }.sum, i) }
      .sortBy(_._1).take(nprobe).map(_._2)
    val qArr = array(qVec.map(lit(_)): _*)
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    spark.read.parquet(path)
      .filter(col("cell").isin(probeCells.toSeq: _*))
      .withColumn("cosine",
        VectorOps.dot(qArr, col("n_v")) / (lit(qNorm) * col("n_n")))
      .orderBy(col("cosine").desc, col("n_id"))
      .limit(k)
      .select(col("n_id"), col("cosine"))
  }
}
