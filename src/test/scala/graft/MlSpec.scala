package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MlOps
import graft.sources.Tables

/** Distributed hashed-LR training: loss goes down, the learned model
  * separates a real signal (English vs non-English) on the driver corpus,
  * and the shuffle-free scoring fold agrees with the training-side margin
  * aggregate. */
class MlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, TestSpark.sfDir, "documents").cache()

  // the corpus `lang` column is random w.r.t. its (shared-vocabulary)
  // token pool — unlearnable by construction — so the spec targets a label
  // the text genuinely carries: whether the doc mentions 'spark'
  private val label = array_contains(graft.ops.TextOps.tokens($"text"), "spark")

  test("training reduces loss and learns a token-borne label") {
    val model = MlOps.trainHashedLR(docs, $"doc_id", $"text",
      label.cast("int"), buckets = 256, iters = 20, step = 5.0)
    assert(model.losses.size === 20)
    assert(model.losses.last < model.losses.head * 0.8,
      s"loss did not improve enough: ${model.losses.head} -> ${model.losses.last}")
    val acc = docs
      .select((label === (MlOps.scoreHashedLR($"text", model) >= 0.5))
        .cast("double").as("hit"))
      .agg(avg($"hit")).head.getDouble(0)
    assert(acc >= 0.9, s"train accuracy $acc")
  }

  test("scoring fold matches the training-side margin aggregate") {
    val model = MlOps.trainHashedLR(docs.limit(50), $"doc_id", $"text",
      ($"lang" === "en").cast("int"), buckets = 32, iters = 3, step = 5.0)
    val viaFold = docs.limit(50)
      .select($"doc_id", MlOps.scoreHashedLR($"text", model).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wLit = array(model.weights.map(lit(_)): _*)
    val viaAgg = MlOps.hashedFeatures(docs.limit(50), $"doc_id", $"text", 32)
      .groupBy($"id")
      .agg(sum(element_at(wLit, $"bucket" + 1)).as("z"))
      .select($"id", (lit(1.0) / (lit(1.0) + exp(-($"z" + lit(model.bias))))).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    viaFold.foreach { case (id, p) =>
      assert(math.abs(p - viaAgg(id)) < 1e-9, s"doc $id: $p vs ${viaAgg(id)}")
    }
  }

  test("scoring plan is shuffle-free") {
    val model = MlOps.HashedLR(new Array[Double](16), 0.0, Nil, 16)
    val plan = docs.select(MlOps.scoreHashedLR($"text", model))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
