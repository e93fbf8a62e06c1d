package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer induction — the
  * vocabulary-learning pass of an LLM data pipeline, as iterative DataFrame
  * aggregation.
  *
  * Algorithm (Sennrich et al. 2016, the public BPE formulation): start from
  * per-character symbol sequences; repeatedly count adjacent symbol pairs
  * across the corpus and merge the most frequent pair everywhere; the K
  * chosen pairs ARE the learned vocabulary.
  *
  * Scale shape: each round is ONE map-side-combinable aggregate over the
  * corpus (explode adjacent pairs → groupBy count) followed by a shuffle-free
  * per-row merge rewrite. Only the single argmax pair row is collected per
  * round — driver traffic is O(K), independent of corpus size. The corpus
  * dataframe is iterated lazily; `localCheckpoint` every few rounds bounds
  * plan growth the same way the mutable-table chain does.
  *
  * Determinism: frequency ties break lexicographically on (left, right), so
  * the learned merge list is reproducible on any engine, any partitioning.
  */
object BpeOps {

  /** One learned merge: rank-ordered pair and its corpus frequency. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Word → per-character symbol sequence, whitespace-tokenized lowercase.
    * Each distinct word is weighted by its corpus frequency, so pair counts
    * over the (word, weight) table equal pair counts over the raw corpus —
    * the standard BPE trick that shrinks the working set from corpus-size
    * to vocabulary-size. */
  def wordTable(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(lower(trim(text)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("weight"))
      .withColumn("syms", split(col("w"), ""))

  /** Learn `k` merges. Returns them rank-ordered. */
  def train(spark: SparkSession, df: DataFrame, text: Column, k: Int): Seq[Merge] = {
    var words = wordTable(df, text).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < k && !exhausted) {
      // adjacent-pair frequencies, weighted by word frequency
      // single-symbol words have no adjacent pairs; filter BEFORE the
      // sequence() or sequence(0, -1) yields a descending [0, -1] range
      val pairs = words
        .filter(size(col("syms")) >= 2)
        .select(col("weight"), col("syms"),
          explode(expr("sequence(0, size(syms) - 2)")).as("i"))
        .select(col("weight"),
          element_at(col("syms"), col("i") + 1).as("l"),
          element_at(col("syms"), col("i") + 2).as("r"))
        .groupBy(col("l"), col("r")).agg(sum(col("weight")).as("freq"))
      val top = pairs
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, f)
        // merge the pair in every symbol sequence (shuffle-free row map):
        // fold left-to-right so overlapping occurrences merge greedily,
        // matching the sequential reference algorithm
        val merged = mergePair(col("syms"), l, r)
        words = words.withColumn("syms", merged)
        if ((rank + 1) % 4 == 0) words = words.localCheckpoint()
        rank += 1
      }
    }
    merges.result()
  }

  /** Left-to-right greedy merge of adjacent (l, r) within a symbol array,
    * expressed as an `aggregate` HOF so it stays inside codegen. The
    * accumulator struct carries the rebuilt array plus a skip flag for the
    * just-consumed right symbol. */
  private[graft] def mergePair(syms: Column, l: String, r: String): Column = {
    val litL = lit(l)
    val litR = lit(r)
    // state: (acc: array<string>)
    // step: if last(acc) == l && cur == r → replace last with l+r
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, cur) =>
        when(
          size(acc) > 0 &&
            element_at(acc, -1) === litL && cur === litR &&
            // the element before a freshly-made merge is never re-split:
            // a merged symbol's text differs from l unless l==l+r (impossible
            // for nonempty r), so plain equality on the last element is safe
            lit(true),
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(litL, litR))))
          .otherwise(concat(acc, array(cur))))
  }

  /** Encode: token count per document under the learned vocabulary.
    * Tokenization matches training exactly — whitespace-split words, each
    * encoded independently (merges never cross word boundaries), counts
    * summed. Native imperative expression ([[graft.functions.BpeEncodeCount]]):
    * a column-HOF formulation would nest one aggregate() per merge, whose
    * expression tree collapses at realistic vocabulary sizes (thousands of
    * merges); the native expression is O(tokens × merges) with a
    * constant-size plan. */
  def encodeTokenCount(text: Column, merges: Seq[Merge]): Column =
    graft.functions.NativeFunctions.bpe_encode_count(
      text, merges.map(m => (m.left, m.right)))
}
