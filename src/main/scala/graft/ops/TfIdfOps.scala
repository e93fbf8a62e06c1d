package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — keyword extraction /
  * topical fingerprints for training-data curation.
  *
  * Scale shape: two shuffles total — (doc, term) term-frequency aggregation
  * and term document-frequency aggregation — then a term-keyed join that AQE
  * broadcast-converts when the vocabulary is small. The corpus size N joins
  * in as a broadcast one-row aggregate, never a driver round-trip. Top-k per
  * doc is a bounded window (rank ≤ k) — Spark plans a running TopK per
  * partition key, no global sort.
  */
object TfIdfOps {

  /** Smoothed idf: ln((N + 1) / (df + 1)) + 1 (the standard sklearn-style
    * smoothing — never zero, defined for unseen terms). */
  private def idf(n: Column, df: Column): Column =
    log((n + lit(1.0)) / (df + lit(1.0))) + lit(1.0)

  /** Top-k terms per document by tf-idf, deterministic tiebreak on term.
    * Output: (doc_id, term, tf, df, tfidf, term_rank). */
  def topTerms(docs: DataFrame, docId: Column, text: Column, k: Int): DataFrame = {
    val toks = docs.select(docId.as("doc_id"),
      explode(TextOps.tokens(text)).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // tf is already distinct per (doc, term) → df = row count per term
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") * idf(col("n_docs").cast("double"),
          col("df").cast("double")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tfidf"), 6).as("tfidf"), col("term_rank"))
  }

  /** BM25 ranked retrieval for a fixed query-term set (Robertson/Okapi,
    * the Lucene default scorer): score(d) = Σ_t idf(t) · tf·(k1+1) /
    * (tf + k1·(1 − b + b·len_d/avg_len)), idf = ln((N − df + ½)/(df + ½)
    * + 1).
    *
    * Scale shape: the query terms filter the (doc, term) stream BEFORE the
    * tf aggregation (a |Q|-term isin — no full-vocabulary state), doc
    * lengths are one combinable aggregate, and the corpus stats ride a
    * broadcast one-row cross join. Scores round before ranking so the
    * order is reproducible across engines. */
  def bm25(docs: DataFrame, docId: Column, text: Column,
      queryTerms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(docId.as("doc_id"),
        explode(TextOps.tokens(text)).as("term"))
      .filter(length(col("term")) > 0)
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("term").isInCollection(queryTerms))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val contrib = tf.join(dfreq, "term").join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
    contrib.groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Corpus-bigram log-probability per document — the classic cheap fluency
    * signal (a KenLM stand-in computable in pure SQL): score(doc) = mean
    * over its bigrams of ln(count(w1 w2) / count(w1 ·)), with counts taken
    * from the corpus itself (so no zero probabilities). Gibberish scores
    * far below template prose.
    *
    * Scale shape: bigram and unigram-context counts are two combinable
    * aggregates; the per-doc score is a join on bigram (AQE broadcasts when
    * the vocab is small) plus one doc-keyed aggregate.
    */
  def bigramLogProb(docs: DataFrame, docId: Column, text: Column): DataFrame = {
    val toks = docs.select(docId.as("doc_id"), TextOps.tokens(text).as("tk"))
      .filter(size(col("tk")) >= 2)
    val grams = toks.select(col("doc_id"),
      explode(expr("transform(sequence(1, size(tk) - 1), " +
        "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"))
        .as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val bi = grams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val uni = bi.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    grams.join(bi, Seq("w1", "w2")).join(uni, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("c12").cast("double") / col("c1").cast("double"))), 6)
        .as("avg_logprob"),
        count(lit(1)).as("n_bigrams"))
  }
}
