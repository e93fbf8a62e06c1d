package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a hashed-feature logistic-regression quality
  * classifier — the fastText-shaped model `TextOps.hashedLinearScore`
  * scores with, but with LEARNED weights, trained entirely as DataFrame
  * aggregations:
  *
  *   - features: L1-normalized hashed token counts (the hashing trick —
  *     vocabulary-independent, `buckets` fixed, no dictionary broadcast);
  *   - per iteration: one aggregate computes every document's margin
  *     under the current weights (weights ride along as a plan literal),
  *     one bucket-keyed aggregate reduces the full-batch gradient;
  *   - ONLY the `buckets`-sized gradient vector reaches the driver per
  *     iteration (256 doubles — 2 KiB), independent of corpus size.
  *
  * This is the 100 TB layout: full-batch gradient descent where each
  * Lloyd-style round is two shuffles over a cached feature table, and the
  * model state is O(buckets) on the driver. All arithmetic is
  * deterministic per-row; gradient sums are floating-point adds whose
  * partition order Spark does not fix, so run-to-run weights agree to
  * ~1 ulp (assert on metrics, not weight bits).
  */
object MlOps {

  /** (id, n, bucket, cnt) hashed bag-of-words: md5-prefix bucket per
    * token, per-doc counts, `n` = doc token count (for L1 normalization).
    * One explode + one (id, bucket) aggregate. */
  def hashedFeatures(df: DataFrame, id: Column, text: Column, buckets: Int): DataFrame =
    df.filter(length(trim(text)) > 0)
      .select(id.as("id"), TextOps.tokens(text).as("tk"))
      .select(col("id"), size(col("tk")).as("n"), explode(col("tk")).as("tok"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("tok").cast("binary")), 1, 4), 16, 10)
          .cast("int"), lit(buckets)))
      .groupBy(col("id"), col("n"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Trained model: weight per bucket + intercept, with the training-loss
    * trajectory (one full-batch cross-entropy value per iteration). */
  final case class HashedLR(
      weights: Array[Double], bias: Double, losses: Seq[Double], buckets: Int)

  /** Full-batch gradient descent on cross-entropy loss. `labelCol` must
    * be 0/1. The feature table is built once and cached; every iteration
    * runs the same two-shuffle plan with updated weight literals. */
  def trainHashedLR(
      df: DataFrame, id: Column, text: Column, labelCol: Column,
      buckets: Int = 256, iters: Int = 30, step: Double = 10.0): HashedLR = {
    // binary presence features (x=1 per distinct bucket), held as ONE row
    // per doc: the doc's distinct-bucket array + its size `nb`. Building
    // the table is a shuffle-FREE projection (array_distinct over the
    // per-token bucket map — no explode/groupBy, no window), and each
    // iteration's margin z = Σ_{b∈bks} w_b is a map-side array fold over
    // the cached doc-grain rows instead of the former per-iteration
    // id-keyed window (which re-sorted the exploded feature table every
    // round). The bucket-keyed gradient aggregate reads the same rows via
    // one explode; per-doc loss/bias terms smear as term/nb across that
    // doc's nb exploded rows and telescope back exactly, so one action per
    // iteration still fetches gradient + loss + bias.
    val bks = array_distinct(transform(TextOps.tokens(text), t =>
      pmod(conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("int"),
        lit(buckets))))
    val feats = df.filter(length(trim(text)) > 0)
      .select(id.as("id"), labelCol.cast("double").as("y"), bks.as("bks"))
      .withColumn("nb", size(col("bks")).cast("double"))
      .cache()
    val nDocs = feats.count().toDouble

    var w = new Array[Double](buckets)
    var b = 0.0
    val losses = Seq.newBuilder[Double]
    for (_ <- 0 until iters) {
      val wLit = typedlit(w.toSeq)
      val eps = 1e-12
      val withZ = feats.withColumn("z",
        aggregate(col("bks"), lit(0.0),
          (acc, bk) => acc + element_at(wLit, bk + 1)))
      val scored = withZ
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-(col("z") + lit(b)))))
        .withColumn("r", col("p") - col("y"))
        .withColumn("lt",
          -(col("y") * log(col("p") + eps) +
            (lit(1.0) - col("y")) * log(lit(1.0) - col("p") + eps)))
      // ONE bucket-keyed aggregate fetches weight gradients AND the
      // loss/bias sums (`buckets` rows to the driver, ~3 doubles each):
      // Σ_rows lt/nb telescopes back to Σ_docs lt because a doc
      // contributes exactly nb rows
      val grad = scored
        .select(col("r"), col("lt"), col("nb"),
          explode(col("bks")).as("bucket"))
        .groupBy(col("bucket"))
        .agg(sum(col("r")).as("g"),
          sum(col("lt") / col("nb")).as("lp"),
          sum(col("r") / col("nb")).as("rp"))
        .collect()
      losses += grad.map(_.getDouble(2)).sum / nDocs
      val gradB = grad.map(_.getDouble(3)).sum / nDocs
      val next = w.clone()
      grad.foreach(row => next(row.getInt(0)) -= step * row.getDouble(1) / nDocs)
      w = next
      b -= step * gradB
    }
    feats.unpersist()
    HashedLR(w, b, losses.result(), buckets)
  }

  /** Score a text column under a trained model — the same shuffle-free
    * per-row fold shape as [[TextOps.hashedLinearScore]], with learned
    * weights as plan literals. Folds over DISTINCT tokens to mirror the
    * binary presence features the trainer fits. */
  def scoreHashedLR(text: Column, model: HashedLR): Column = {
    val wLit = array(model.weights.map(lit(_)): _*)
    // distinct BUCKETS, not tokens — two tokens colliding into one bucket
    // contribute its weight once, exactly as the trainer's features do
    val bks = array_distinct(transform(TextOps.tokens(text), t =>
      pmod(conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("int"),
        lit(model.buckets))))
    val z = aggregate(bks, lit(0.0),
      (acc, bk) => acc + element_at(wLit, bk + 1)) + lit(model.bias)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
