package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, TextOps}
import graft.sources.Tables

/** Correctness for the C4-style block dedup and the hashed linear
  * classifier: hand-built fixtures with known answers, plus global
  * invariants on the driver documents table. */
class CleanOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------- block dedup

  test("block dedup keeps globally-first occurrence, reassembles in order") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e x y z w v"), // first block repeats doc 1 block 0
      (3L, "   "),                 // whitespace-only doc survives as ''
      (4L, "f g h i j f g h i j"), // both blocks repeat doc 1 block 1
      (5L, "p q r s t p q r s t")  // self-duplicate: second copy dropped
    ).toDF("doc_id", "text")
    val got = DedupOps.blockDedup(docs, $"doc_id", $"text", blockTokens = 5)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got === Array(
      (1L, "a b c d e f g h i j", 2L),
      (2L, "x y z w v", 1L),
      (3L, "", 0L),
      (4L, "", 0L),
      (5L, "p q r s t", 1L)))
  }

  test("block dedup keeps a ragged tail block as its own unit") {
    val docs = Seq(
      (1L, "a b c d e f g"),  // tail block 'f g'
      (2L, "f g")             // same content as doc 1's tail -> dropped
    ).toDF("doc_id", "text")
    val got = DedupOps.blockDedup(docs, $"doc_id", $"text", blockTokens = 5)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got === Array((1L, "a b c d e f g", 2L), (2L, "", 0L)))
  }

  test("block dedup invariant on driver corpus: kept blocks = distinct blocks") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val out = DedupOps.blockDedup(docs, $"doc_id", $"text", blockTokens = 8)
    val kept = out.agg(sum($"blocks_kept")).as[Long].head()
    // every distinct block content survives exactly once, globally
    val distinctBlocks = docs
      .filter(length(trim($"text")) > 0)
      .select(TextOps.tokens($"text").as("tk"))
      .select(explode(expr(
        "transform(sequence(1, cast(ceil(size(tk) / 8.0) as int)), " +
          "i -> concat_ws(' ', slice(tk, (i - 1) * 8 + 1, 8)))")).as("block"))
      .select(countDistinct($"block")).as[Long].head()
    assert(kept === distinctBlocks)
  }

  // --------------------------------------- hashed linear classifier

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def refWeight(tok: String): Double =
    Integer.parseInt(md5hex(tok).substring(0, 2), 16) / 255.0 - 0.5

  test("hashed linear logit matches a driver-side reference fold") {
    val rows = Seq((1L, "alpha beta gamma"), (2L, "alpha"), (3L, "Beta  BETA"))
    val got = rows.toDF("id", "text")
      .select($"id", TextOps.hashedLinearLogit($"text").as("z"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val expected = toks.map(refWeight).sum / toks.size
      assert(math.abs(got(id) - expected) < 1e-12, s"doc $id")
    }
  }

  test("hashed linear score is length-normalized and in (0, 1)") {
    val df = Seq((1L, "word"), (2L, "word word word word")).toDF("id", "text")
    val s = df.select($"id", TextOps.hashedLinearScore($"text").as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(s(1L) - s(2L)) < 1e-12) // mean, not sum: length-invariant
    assert(s(1L) > 0.0 && s(1L) < 1.0)
  }

  test("hashed linear scoring plan is shuffle-free") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val plan = docs.select(TextOps.hashedLinearScore($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
