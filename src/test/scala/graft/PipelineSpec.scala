package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry
import graft.sources.Tables

/** Pipeline operators whose outputs the DuckDB oracle can't hash-compare:
  * seeded stratified sampling (Bernoulli draw internals are engine-specific). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("perplexity buckets: terciles per lang, head means above tail means") {
    import spark.implicits._
    val rows = Registry.queries("pl_perplexity_buckets")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, bs) =>
      val m = bs.map(b => b._2 -> b._4).toMap
      assert(m.keySet == Set("head", "middle", "tail"), s"$lang: ${m.keySet}")
      // head = highest logprob (lowest perplexity)
      assert(m("head") > m("middle") && m("middle") > m("tail"), s"$lang: $m")
      // tercile split: group sizes within rounding of each other
      val counts = bs.map(_._3)
      assert(counts.max - counts.min <= 2, s"$lang: ${counts.toSeq}")
    }
  }

  test("stratified sample hits per-stratum fractions within tolerance") {
    import spark.implicits._
    val fractions = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25,
      "es" -> 0.1, "zh" -> 0.1)
    val totals = Tables.load(spark, TestSpark.sfDir, "documents")
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Registry.queries("pl_sample_stratified")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    sampled.foreach { case (lang, n) =>
      val expected = totals(lang) * fractions(lang)
      // Bernoulli draw: allow 4 sigma of binomial spread (+1 for tiny strata)
      val sigma = math.sqrt(totals(lang) * fractions(lang) * (1 - fractions(lang)))
      assert(math.abs(n - expected) <= 4 * sigma + 1,
        s"$lang: sampled $n, expected ~$expected (±${4 * sigma + 1})")
    }
  }

  test("stratified sample is deterministic for a fixed seed") {
    val a = Registry.queries("pl_sample_stratified")(spark, TestSpark.sfDir).collect().toSeq
    val b = Registry.queries("pl_sample_stratified")(spark, TestSpark.sfDir).collect().toSeq
    assert(a == b)
  }

  test("line dedup removes corpus-repeated lines and preserves order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 2-token lines; "spam spam" is shared by docs 1 and 2 (df=2 -> removed
    // everywhere), "solo solo" appears twice but only inside doc 3 (df=1 ->
    // kept); doc 4 is pure boilerplate -> fully emptied.
    val docs = Seq(
      (1L, "alpha beta spam spam gamma delta"),
      (2L, "spam spam epsilon zeta"),
      (3L, "solo solo solo solo eta theta"),
      (4L, "spam spam")).toDF("doc_id", "text")
    val out = graft.ops.DedupOps.lineDedup(docs, col("doc_id"), col("text"),
        lineTokens = 2, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 2L, "alpha beta gamma delta")))
    assert(out(2L) == ((2L, 1L, "epsilon zeta")))
    assert(out(3L) == ((3L, 3L, "solo solo solo solo eta theta")))
    assert(out(4L) == ((1L, 0L, "")))
  }

  test("semantic dedup: planted near-dups retired, no cartesian in the plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // three well-separated base directions; ids 1-3 (the first-k centroid
    // init) span all three regions so the cells converge onto the bases
    val b1 = Array[Float](1, 2, 3, 4, 5, 6, 7, 8)
    val b2 = Array[Float](-8, -7, -6, -5, -4, -3, -2, -1)
    val b3 = Array[Float](5, -5, 5, -5, 5, -5, 5, -5)
    def jitter(b: Array[Float], comp: Int, eps: Float): Array[Float] = {
      val v = b.clone(); v(comp) += eps; v
    }
    val rows = Seq(
      1L -> jitter(b1, 0, 0.001f), 2L -> jitter(b2, 0, 0.001f),
      3L -> jitter(b3, 0, 0.001f),
      4L -> jitter(b1, 1, 0.002f), 5L -> jitter(b1, 2, 0.002f), // b1 dups
      6L -> jitter(b2, 1, 0.002f), 7L -> jitter(b2, 2, 0.002f), // b2 dups
      8L -> jitter(b3, 0, 4f), 9L -> jitter(b3, 1, 4f))         // b3, distinct
    val df = rows.toDF("vec_id", "embedding")
    val pairs = graft.ops.DedupOps.semanticDedupPairs(df, col("vec_id"),
      col("embedding"), numCells = 3, threshold = 0.999)
    assert(!pairs.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "within-cell pair join must stay an equi-join on the cell id")
    val got = pairs.select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 4L), (1L, 5L), (4L, 5L), (2L, 6L), (2L, 7L), (6L, 7L)),
      s"unexpected pairs: $got")
    // keeper selection: min id per component survives, the rest retire
    val clusters = graft.ops.GraphOps.dedupClusters(df, col("vec_id"), pairs,
      col("id_a"), col("id_b"))
    val keepers = clusters.filter(col("is_keeper")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val retired = clusters.filter(!col("is_keeper")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(keepers == Set(1L, 2L) && retired == Set(4L, 5L, 6L, 7L),
      s"keepers=$keepers retired=$retired")
  }

  test("pl_rag_index: hash-embed retrieval plumbing is exact on identical text") {
    import org.apache.spark.sql.functions._
    // embeddings are unit-norm and deterministic
    val e = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(col("doc_id") < 5)
      .select(graft.ops.TextOps.hashEmbed(col("text"), 32).as("emb"))
      .collect().map(_.getSeq[Double](0))
    assert(e.forall(v => math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9))

    // identical chunk text under a fresh query id must retrieve the
    // original chunk at rank 1 with cosine ~ 1 — exactness of the full
    // chunk -> embed -> cell -> probe composition (the corpus is
    // template-like word salad, so same-DOC retrieval is not a valid
    // oracle; identical-text retrieval is)
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
    val chunks = docs
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0), greatest(length(col("text")) - 1, lit(0)), lit(200))))
      .select((col("doc_id") * 1000000L + col("pos")).as("chunk_id"),
        col("text").substr(col("col") + 1, lit(256)).as("chunk"))
      .withColumn("emb", graft.ops.TextOps.hashEmbed(col("chunk"), 32))
    val offset = 77777777777L
    val queries = chunks.filter(col("chunk_id").isin(0L, 5000000L, 9000000L))
      .select((col("chunk_id") + offset).as("chunk_id"), col("chunk"), col("emb"))
    val top = graft.ops.IvfOps.ivfTopK(queries, chunks,
        col("chunk_id"), col("emb"), col("chunk_id"), col("emb"),
        k = 3, numCells = 8, nprobe = 4)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0) - offset, r.getLong(2), r.getDouble(3)))
    assert(top.length == 3)
    for ((q, n, cos) <- top) {
      assert(q == n, s"query chunk $q retrieved $n at rank 1")
      assert(cos > 0.999999, s"self-cosine $cos for chunk $q")
    }

    // registry entry sanity: k ranked rows per query, cosine non-increasing
    val rows = graft.queries.Registry.queries("pl_rag_index")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      val cs = sorted.map(_._3)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("observe() collects in-flight quality-gate metrics in ONE pass") {
    // the data-quality counters a production clean job publishes (rows
    // scanned, rows a gate would drop, extremes) ride the SAME action as
    // the pipeline itself — no second scan of a 100 TB input just to count
    import spark.implicits._
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions._
    val obs = Observation("quality_gate")
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val kept = docs
      .observe(obs,
        count(lit(1)).as("rows_scanned"),
        sum(when(length($"text") < 50, 1L).otherwise(0L)).as("short_docs"),
        max($"n_chars").as("max_chars"))
      .filter(length($"text") >= 50)
      .count()
    val m = obs.get
    assert(m("rows_scanned").asInstanceOf[Long] == docs.count())
    assert(m("rows_scanned").asInstanceOf[Long] - m("short_docs").asInstanceOf[Long] == kept)
    assert(m("max_chars").asInstanceOf[Long] > 0)
  }
}
