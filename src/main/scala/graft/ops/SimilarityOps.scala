package graft.ops

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * query set against the (huge) candidate table; candidates never shuffle,
  * ranking is a per-query top-k (window + filter ≈ TakeOrdered per group).
  *
  * Scale path: random-hyperplane LSH — each vector hashes to a signature of
  * sign bits; probing only matching buckets cuts the candidate set by
  * ~2^bits. The hyperplanes are generated from a fixed seed so signatures
  * are deterministic and reusable across runs (at 100 TB the bucketed table
  * would be written out partitioned by bucket and queries pruned to their
  * bucket's partitions).
  */
object SimilarityOps {

  /** Brute-force cosine top-k: for each query row, the k nearest candidate
    * rows (excluding itself). */
  def bruteForceTopK(
      queries: DataFrame, candidates: DataFrame,
      qId: Column, qVec: Column, cId: Column, cVec: Column,
      k: Int): DataFrame = {
    val q = queries.select(qId.as("q_id"), VectorOps.vecD(qVec).as("q_v"))
      .withColumn("q_n", VectorOps.l2norm(col("q_v")))
    val c = candidates.select(cId.as("n_id"), VectorOps.vecD(cVec).as("n_v"))
      .withColumn("n_n", VectorOps.l2norm(col("n_v")))
    import org.apache.spark.sql.expressions.Window
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        VectorOps.dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cosine"))
  }

  /** Deterministic random hyperplanes: `bits` planes of dimension `dim`. */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id for a double-array vector column. The plane
    * matrix rides as ONE typedlit literal (a bits×dim per-value lit(..)
    * tree costs the analyzer/optimizer far more than the executed dot
    * products — see PqOps.encode); the OR-fold over per-plane sign bits
    * is commutative, so the bucket value is bit-identical to the old
    * per-plane fold. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftshim._
    def shl(a: Column, b: Column): Column = columnOf(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        expressionOf(a), expressionOf(b)))
    aggregate(
      transform(typedlit(planes.map(_.toSeq).toSeq), (plane, i) =>
        when(VectorOps.dot(vec, plane) >= 0, shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Bucketed candidates: input plus a `bucket` column. */
  def lshBuckets(df: DataFrame, vec: Column, planes: Array[Array[Double]]): DataFrame =
    df.withColumn("bucket", lshBucket(VectorOps.vecD(vec), planes))

  /** Approximate k-NN graph over the whole corpus — per vector, its top-k
    * cosine neighbors among LSH-cohabitant candidates. The adjacency input
    * for graph-based ANN (HNSW-style), kNN clustering, and outlier
    * detection. Candidate generation is a bucket equi-join over `tables`
    * independent sign-bit tables (union → dedup), so the pair space is the
    * per-bucket cohabitant set, never the n² cartesian; top-k per vector is
    * a bounded window. Symmetric: each edge (a,b) is scored once per
    * direction so every vector gets k out-neighbors. */
  def knnGraph(
      df: DataFrame, id: Column, vec: Column,
      k: Int, dim: Int, bits: Int = 6, tables: Int = 2): DataFrame = {
    require(dim > 0, s"vector dim must be positive, got $dim")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(id.as("id"), VectorOps.vecD(vec).as("v"))
    val withBuckets = (0 until tables).foldLeft(base) { (acc, t) =>
      acc.withColumn(s"b$t", lshBucket(col("v"), hyperplanes(dim, bits, seed = 100 + t)))
    }
    val left = withBuckets.select(
      (Seq(col("id").as("src"), col("v").as("src_v")) ++
        (0 until tables).map(t => col(s"b$t").as(s"lb$t"))): _*)
    // score INSIDE each per-table join so the union → dedup → top-k
    // shuffles carry (src, dst, cosine) scalars, not two dim-wide vectors
    // per candidate row (cosine is deterministic per pair, so scoring
    // before the dedup is equivalent and the duplicate work is bounded by
    // `tables`)
    val candidates = (0 until tables).map { t =>
      left.join(
        withBuckets.select(col("id").as("dst"), col("v").as("dst_v"),
          col(s"b$t").as(s"rb$t")),
        col(s"lb$t") === col(s"rb$t") && col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          (VectorOps.dot(col("src_v"), col("dst_v")) /
            (VectorOps.l2norm(col("src_v")) * VectorOps.l2norm(col("dst_v"))))
            .as("cosine"))
    }.reduce(_ union _).dropDuplicates("src", "dst")
    val w = Window.partitionBy(col("src")).orderBy(col("cosine").desc, col("dst"))
    candidates
      .withColumn("nn_rank", row_number().over(w))
      .filter(col("nn_rank") <= k)
      .select(col("src"), col("nn_rank"), col("dst"), round(col("cosine"), 6).as("cosine"))
  }

  /** Multi-table LSH ANN: `tables` independent sign-bit tables of `bits`
    * planes each; a candidate is ranked if it shares any table's bucket with
    * the query (multi-probe widens each table's probe set to Hamming ≤ 1).
    * Recall ≈ 1-(1-p_table)^tables at a ~2^bits candidate cut per table —
    * the knobs trade recall against scan cost, and at 100 TB the bucketed
    * candidates would be a table partitioned by (table, bucket) so each
    * probe prunes to its partitions. */
  def lshTopK(
      queries: DataFrame, candidates: DataFrame,
      qId: Column, qVec: Column, cId: Column, cVec: Column,
      k: Int, dim: Int, bits: Int = 6, tables: Int = 4,
      multiProbe: Boolean = true): DataFrame = {
    // Hyperplanes must span the full embedding dimension: a short plane
    // truncates the sign-bit dot product (dot() folds over min length) and
    // silently degrades recall. Array columns carry no static width in the
    // schema, so the caller MUST pass it — a data probe here would run a
    // one-row job during plan construction.
    require(dim > 0, s"vector dim must be positive, got $dim")
    import org.apache.spark.sql.expressions.Window
    val allPlanes = (0 until tables).map(t => hyperplanes(dim, bits, seed = 42L + t))

    def withBuckets(df: DataFrame, vecCol: String, out: String => String): DataFrame =
      allPlanes.zipWithIndex.foldLeft(df) { case (d, (planes, t)) =>
        d.withColumn(out(t.toString), lshBucket(col(vecCol), planes))
      }

    val q0 = queries.select(qId.as("q_id"), VectorOps.vecD(qVec).as("q_v"))
      .withColumn("q_n", VectorOps.l2norm(col("q_v")))
    val c0 = candidates.select(cId.as("n_id"), VectorOps.vecD(cVec).as("n_v"))
      .withColumn("n_n", VectorOps.l2norm(col("n_v")))
    val qb = withBuckets(q0, "q_v", t => s"qb_$t")
    val cb = withBuckets(c0, "n_v", t => s"cb_$t")

    // per-table probe sets (bucket + Hamming-1 neighbors), tagged by table id
    val probeCols = (0 until tables).flatMap { t =>
      val b = col(s"qb_$t")
      val probes = if (multiProbe) b +: (0 until bits).map(i => b.bitwiseXOR(lit(1L << i)))
                   else Seq(b)
      probes.map(p => struct(lit(t).as("t"), p.as("b")))
    }
    val qProbes = qb
      .select(col("q_id"), col("q_v"), col("q_n"), explode(array(probeCols: _*)).as("pr"))
      .select(col("q_id"), col("q_v"), col("q_n"), col("pr.t").as("t"), col("pr.b").as("probe"))

    // candidate bucket rows tagged by table id
    val cBuckets = cb.select(
      col("n_id"), col("n_v"), col("n_n"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), col(s"cb_$t").as("b"))): _*)).as("bk"))
      .select(col("n_id"), col("n_v"), col("n_n"), col("bk.t").as("t"), col("bk.b").as("bucket"))

    // cosine is computed on the (map-side) broadcast-join output so the
    // dedup + top-k shuffles move only (q_id, n_id, cosine) scalars — the
    // vectors never enter an exchange
    val scored = cBuckets
      .join(broadcast(qProbes),
        qProbes("probe") === cBuckets("bucket") && qProbes("t") === cBuckets("t") &&
          qProbes("q_id") =!= cBuckets("n_id"))
      .withColumn("cosine",
        VectorOps.dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")))
      .select(col("q_id"), col("n_id"), col("cosine"))
      .dropDuplicates("q_id", "n_id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cosine"))
  }
}
