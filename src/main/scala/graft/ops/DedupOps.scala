package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SimHash64

/** Deduplication operators for LLM-data pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. Every pipeline is expressed as joins/aggregations
  * over distributed columns — no driver-side materialization — so the same
  * plan runs on a 1000-executor cluster:
  *
  *   - exact: hash-shuffle groupBy on the dedup key (map-side combine);
  *   - jaccard: inverted-index join on shingles — shuffle is proportional to
  *     posting-list sizes, the standard sparse similarity-join layout;
  *   - minhash LSH: candidate generation via band-bucket equi-join (shuffle
  *     on band signatures, each doc appears `bands` times — constant
  *     amplification), then exact verification on candidates only;
  *   - simhash: O(1)-per-row signature; candidate pairs within a Hamming
  *     radius via self-join (here brute-force over the 500-doc fixture; at
  *     scale, bucket by bit-chunks — same pigeonhole trick as LSH bands).
  */
object DedupOps {

  /** Cross-doc substring coverage — the per-doc share of its positional
    * word n-grams that also appear in ANOTHER doc. The Lee et al. exact-
    * substring-dedup signal, at n-gram (not suffix-array) granularity: a
    * high ratio means the doc is mostly boilerplate shared across the
    * corpus. Positional grams (NOT distinct) in the numerator/denominator;
    * sharedness via a distinct-gram document-frequency cut. Shuffles: gram
    * df aggregate + left-semi membership join + per-doc aggregate. */
  def substringCoverage(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val grams = df
      .select(id.as("doc_id"), graft.ops.TextOps.tokens(text).as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(tk) - $n + 1), " +
          s"i -> concat_ws(' ', slice(tk, i, $n)))")).as("gram"))
    // collapse to per-(doc, gram) counts FIRST — the explode feeds exactly
    // one shuffle, and every later stage works on the far smaller count
    // table instead of re-scanning the corpus
    val g = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val shared = g.groupBy(col("gram")).agg(count(lit(1)).as("docs"))
      .filter(col("docs") >= 2)
      .select(col("gram"))
    val marked = g.join(shared, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(sum(col("cnt")).as("shared_grams"))
    g.groupBy(col("doc_id")).agg(sum(col("cnt")).as("total_grams"))
      .join(marked, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("shared_grams"), lit(0L)).cast("double") /
          col("total_grams").cast("double"), 6).as("shared_ratio"),
        col("total_grams"))
  }

  /** Exact dedup: one surviving row (min id) per key + duplicate count.
    * `groupBy` gives partial aggregation before the shuffle. */
  def exactDedup(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("copies"))

  /** C4-style paragraph/block dedup: split each document into fixed-size
    * token blocks (the stand-in for newline-delimited paragraphs on a
    * corpus without line structure), keep only the GLOBALLY FIRST
    * occurrence of each distinct block — ordered by (doc_id, position) —
    * and reassemble the surviving blocks in document order. Later copies
    * of boilerplate blocks vanish from every document, including repeats
    * inside one document (exactly the C4 three-sentence-span rule at block
    * granularity).
    *
    * Scale shape: one explode feeding a single window shuffle keyed on
    * block content (posting lists are block-frequency long — bounded by
    * corpus duplication, no quadratic pair blowup), then one per-doc
    * aggregate to reassemble. Nothing touches the driver.
    */
  /** (doc_id, pos, block) exploded view of fixed-size token blocks.
    * Empty docs are filtered before the explode (sequence(1, 0) DESCENDS
    * in Spark — it would fabricate two bogus blocks). */
  private[graft] def tokenBlocks(
      df: DataFrame, id: Column, text: Column, blockTokens: Int): DataFrame =
    df.filter(length(trim(text)) > 0)
      .select(id.as("doc_id"), TextOps.tokens(text).as("tk"))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, cast(ceil(size(tk) / ${blockTokens}.0) as int)), " +
            s"i -> concat_ws(' ', slice(tk, (i - 1) * $blockTokens + 1, $blockTokens)))")))
      .select(col("doc_id"), col("pos"), col("col").as("block"))

  def blockDedup(df: DataFrame, id: Column, text: Column, blockTokens: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("block")).orderBy(col("doc_id"), col("pos"))
    // docs emptied by the explode filter are restored by the left join
    // below with clean_text = ''
    val blocks = tokenBlocks(df, id, text, blockTokens)
    val kept = blocks
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
    df.select(id.as("doc_id"))
      .join(
        kept.groupBy(col("doc_id")).agg(
          concat_ws(" ", array_sort(collect_list(struct(col("pos"), col("block"))))
            .getField("block")).as("clean_text"),
          count(lit(1)).as("blocks_kept")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("blocks_kept"), lit(0L)).as("blocks_kept"))
  }

  /** (id, shingle) inverted-index exploded view, distinct shingles per doc.
    *
    * `maxDf > 0` drops shingles whose document frequency exceeds it — the
    * skew guard for the self-join below: a corpus-common shingle ("of the
    * and"-class) otherwise lands a df-long posting list on one reducer and
    * emits O(df²) candidate pairs. The df count is a window over the same
    * `shingle` key the self-join shuffles on, so the guard rides the
    * existing exchange instead of adding one. */
  private[graft] def shingleIndex(
      df: DataFrame, id: Column, text: Column, n: Int, maxDf: Int = 0): DataFrame = {
    val idx = df.select(id.as("id"), TextOps.shingles(text, n).as("sh"))
      .select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
    if (maxDf <= 0) idx
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
      idx.withColumn("df", count(lit(1)).over(w))
        .filter(col("df") <= maxDf)
        .drop("df")
    }
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minContainment` of a PROBE document's distinct n-gram shingles
    * (containment = |corpus ∩ probe| / |probe| — the asymmetric overlap
    * decontamination uses: a training doc that contains a benchmark item
    * scores high even if the training doc is much longer).
    *
    * Inverted-index equi-join on shingle — same scale shape as
    * [[jaccardPairs]]: candidates exist only where a shingle actually
    * matches; `maxDf` bounds hot-shingle posting lists. The probe side is
    * typically tiny (a benchmark suite), so Catalyst broadcasts it and the
    * corpus never shuffles. */
  def containmentPairs(
      corpus: DataFrame, probe: DataFrame, id: Column, text: Column,
      n: Int = 3, minContainment: Double = 0.5, maxDf: Int = 0): DataFrame = {
    val ci = shingleIndex(corpus, id, text, n, maxDf)
      .select(col("id").as("corpus_id"), col("shingle"))
    val pi = shingleIndex(probe, id, text, n, maxDf)
      .select(col("id").as("probe_id"), col("sz").as("sz_p"), col("shingle"))
    ci.join(pi, "shingle")
      .groupBy(col("corpus_id"), col("probe_id"), col("sz_p"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("containment",
        round(col("inter").cast("double") / col("sz_p").cast("double"), 4))
      .filter(col("containment") >= minContainment)
      .select(col("corpus_id"), col("probe_id"), col("containment"))
  }

  /** Ordered (i < j) pairs generated INSIDE a per-key posting list: for a
    * sorted array of (id, sz) structs, every 2-combination with the lower
    * id first. Semantically identical to the equi-self-join on the key +
    * `id_a < id_b` filter, but the pairs are produced by a codegen'd
    * nested transform over an already-aggregated list — no second scan of
    * the index, no sort-merge join, and half the pre-filter row count
    * (combinations, not ordered pairs). */
  private[ops] def postingPairs(lst: Column): Column =
    flatten(transform(lst, (x, i) =>
      transform(slice(lst, i + lit(2), size(lst)), y =>
        struct(x.as("a"), y.as("b")))))

  /** Per-bucket (a < b) candidate pairs with BOUNDED per-task state — the
    * shared candidate generator of the jaccard / minhash-LSH / simhash /
    * fuzzy-key families (guide §2.5: skew).
    *
    * The bucket document frequency is counted FIRST by a window over the
    * bucket key (one exchange — the same one the aggregation needs; the
    * window buffer is spillable, unlike an aggregation's collect_list
    * buffer), so:
    *   - buckets outside [2, maxDf] are dropped BEFORE any list is
    *     collected (the old `size(lst) <= maxDf` filter built the full
    *     hot-bucket list and then threw it away — at corpus scale a
    *     boilerplate shingle is an OOM, not a filter);
    *   - with no df cap (maxDf = 0), buckets hotter than `hotDf` keep
    *     their exact pair set but route through a spillable equi-self-join
    *     lane instead of a single collect_list row + one O(df²) in-memory
    *     pair array (`postingPairs` materializes the combination array per
    *     row before exploding, so the list lane is also bounded by the
    *     array it allocates — hotDf² structs).
    *
    * Pair-set equality with the plain posting-list form: every bucket is
    * handled by exactly one lane; the list lane emits each unordered
    * in-bucket pair once, lower item first (sorted list); the join lane
    * emits exactly the `a < b` half of the cross product — same pairs,
    * same per-bucket multiplicity, same orientation. Items must be
    * non-null and totally ordered (ids, strings, or structs compared
    * field-lexicographically — array_sort and `<` agree on all of them).
    * Returns columns (a, b) of the item type. */
  private[graft] def bucketPairs(
      buckets: DataFrame, keys: Seq[String], item: Column,
      maxDf: Int = 0, hotDf: Int = 512): DataFrame = {
    val kc = keys.map(col)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(kc: _*)
    val idx = buckets.select(kc :+ item.as("it"): _*)
      .withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") >= 2 &&
        (if (maxDf > 0) col("__df") <= maxDf else lit(true)))
    val cap = if (maxDf > 0) math.min(maxDf, hotDf) else hotDf
    val cold = idx.filter(col("__df") <= cap)
      .groupBy(kc: _*)
      .agg(array_sort(collect_list(col("it"))).as("lst"))
      .select(explode(postingPairs(col("lst"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    if (maxDf > 0 && maxDf <= hotDf) cold
    else {
      val hot = idx.filter(col("__df") > cap)
      val l = hot.select(kc :+ col("it").as("a"): _*)
      val r = hot.select(kc :+ col("it").as("b"): _*)
      val hotPairs = l.join(r, keys)
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"))
      cold.unionByName(hotPairs)
    }
  }

  /** All pairs (a < b) with shingle-set Jaccard ≥ threshold, from the
    * inverted index: |A∩B| from matching shingles, |A∪B| from the per-doc
    * set sizes carried alongside. Candidate pairs come from the
    * skew-bounded [[bucketPairs]] generator over the index (posting-list
    * 2-combinations for normal shingles, the spillable join lane for
    * unguarded hot ones), and the maxDf cut is applied BEFORE any list is
    * collected.
    *
    * With `maxDf > 0`, shingles in more than `maxDf` docs are excluded from
    * the index. Tradeoff is recall-only: a dropped shingle leaves `sz_a`/
    * `sz_b` intact but can no longer contribute to `inter`, so the computed
    * Jaccard only ever *under*-estimates — pairs whose overlap rides solely
    * on corpus-common shingles are missed, never false-positived. For
    * unbounded corpora prefer [[minhashLshPairs]] (constant amplification
    * per doc regardless of shingle popularity).
    *
    * A PPJoin prefix-filter variant (index only the first
    * |S| − ⌈t·|S|⌉ + 1 shingles per doc under a global order, verify
    * candidates with array_intersect) was built and measured this round:
    * it cut the posting index 4.7× at sf0.1 as theory promises, but on
    * this corpus' flat (non-Zipf) shingle-frequency profile even
    * rare-first prefixes produced 119k candidates for 256 qualifying
    * pairs, and the verify-by-join shape ran 3× slower end-to-end than
    * this counting aggregation (6.4 s vs 2.2 s isolated). Rejected per
    * guide §1.1 — the counting shape IS the cheaper plan when overlap
    * is decided by many medium-frequency shingles rather than few rare
    * ones; OPTIMIZATION_r13.md records the full experiment. */
  def jaccardPairs(
      df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.8, maxDf: Int = 0): DataFrame = {
    // spread before shingling: a single-file fixture input would
    // otherwise tokenize+shingle the whole corpus in ONE task
    val idx = shingleIndex(
      Partitioning.spread(df.select(id.as("__sid"), text.as("__text"))),
      col("__sid"), col("__text"), n, maxDf = 0)
    bucketPairs(idx, Seq("shingle"), struct(col("id"), col("sz")), maxDf)
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Incremental (batch-vs-corpus) Jaccard pairs, rebuilding the shingle
    * index from text in-plan. This is the *oracle-anchor* variant — a
    * single statement DuckDB can replicate; the production default is the
    * persisted pair [[writeShingleIndex]] + [[probeShingleIndex]], where
    * corpus text is shingled once at ingest and probes scan stored
    * postings. Only postings of the NEW batch probe the corpus shingle
    * index, so candidate generation is |batch postings| × posting-list
    * joins — the corpus is never self-joined.
    *
    * Every qualifying pair with ≥1 batch member is emitted exactly once:
    * batch-vs-corpus pairs as (id_a = batch doc, id_b = corpus doc,
    * b_batch = false); batch-vs-batch pairs once with id_a < id_b
    * (b_batch = true) — the `a.id < b.id`-only-when-both-batch filter stops
    * the double orientation the symmetric probe would otherwise produce.
    * `batchIds` must be a single-column frame of batch ids (small — it is
    * broadcast to flag/filter index rows). `maxDf` as in [[jaccardPairs]]. */
  def batchJaccardPairs(
      df: DataFrame, batchIds: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.8, maxDf: Int = 0): DataFrame = {
    val idx = shingleIndex(df, id, text, n, maxDf)
    val bflag = batchIds.toDF("id").withColumn("is_b", lit(true))
    val probe = idx.join(broadcast(bflag.select(col("id"))), Seq("id"), "left_semi")
    val corpusIdx = idx.join(broadcast(bflag), Seq("id"), "left")
      .withColumn("is_b", coalesce(col("is_b"), lit(false)))
    val a = probe.alias("a")
    val b = corpusIdx.alias("b")
    a.join(b, col("a.shingle") === col("b.shingle"))
      .filter(col("a.id") =!= col("b.id") &&
        (!col("b.is_b") || col("a.id") < col("b.id")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"), col("b.is_b").as("b_batch"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"), col("b_batch"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("b_batch"), col("jaccard"))
  }

  /** Materialize the corpus shingle inverted index to parquet — with
    * [[probeShingleIndex]] this is the DEFAULT incremental-dedup path
    * (PlanSpec asserts probes scan the stored postings, never corpus
    * text; [[batchJaccardPairs]] remains as the single-statement oracle
    * anchor): the corpus is shingled
    * ONCE at ingest time, and every later batch probes the stored
    * (id, sz, shingle) postings instead of re-scanning corpus text. The
    * `maxDf` cut is applied at build time over the corpus (document
    * frequencies are corpus frequencies — a later batch doesn't change
    * stored postings; re-build or compact periodically as the corpus
    * grows). */
  def writeShingleIndex(
      df: DataFrame, id: Column, text: Column, path: String,
      n: Int = 3, maxDf: Int = 0): Unit =
    shingleIndex(df, id, text, n, maxDf)
      .write.mode("overwrite").parquet(path)

  /** Fold an ADMITTED batch into the persisted index (the step after
    * [[probeShingleIndex]] retires the batch's near-dups): the batch's
    * postings append to the stored parquet — batch text is shingled once
    * and never re-read, same as the corpus. NO df cut on the appended
    * rows: stored document frequencies are corpus-build-time frequencies
    * by contract (a batch cannot retroactively re-cap old postings);
    * rebuild via [[writeShingleIndex]] or compact periodically as drift
    * accumulates. Probe-after-append == probe-of-rebuilt-index is proven
    * in OpsSpec (uncapped). */
  def appendShingleIndex(
      df: DataFrame, id: Column, text: Column, path: String,
      n: Int = 3): Unit =
    shingleIndex(df, id, text, n)
      .write.mode("append").parquet(path)

  /** Probe a persisted corpus index with a NEW batch: emits every
    * Jaccard-qualifying pair with ≥1 batch member exactly once —
    * batch-vs-corpus pairs as (id_a = batch doc, id_b = corpus doc,
    * b_batch = false) from the postings join, batch-vs-batch pairs
    * (id_a < id_b, b_batch = true) from an in-batch [[jaccardPairs]] (the
    * batch is ingest-sized, so no df cut there). The corpus side is the
    * stored index — corpus text is never re-read, and per-ingest work
    * scales with the batch. */
  def probeShingleIndex(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      batch: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val corpusIdx = spark.read.parquet(indexPath)
    val batchIdx = shingleIndex(batch, id, text, n)
    val cross = batchIdx.alias("a")
      .join(corpusIdx.alias("b"), col("a.shingle") === col("b.shingle"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), lit(false).as("b_batch"), col("jaccard"))
    val within = jaccardPairs(batch, id, text, n, threshold)
      .select(col("id_a"), col("id_b"), lit(true).as("b_batch"), col("jaccard"))
    cross.unionByName(within)
  }

  /** Engine-neutral MinHash family: universal hashes
    * hᵢ(s) = (Aᵢ·(base(s) mod P) + Bᵢ) mod P over a 48-bit md5-prefix base,
    * P the largest 32-bit prime. Every term is md5 + integer arithmetic any
    * SQL engine reproduces bit-for-bit (Aᵢ < 2²⁰ keeps Aᵢ·x < 2⁵² — no
    * 64-bit overflow anywhere), so the DuckDB oracle computes IDENTICAL
    * signatures — unlike a JVM-seeded or FNV-looped hash. */
  private[graft] val MinhashP = 4294967291L
  private[graft] def minhashA(i: Int): Long = 1L + (i.toLong * 2654435761L) % 1048573L
  private[graft] def minhashB(i: Int): Long = (i.toLong * 4050313L + 17L) % MinhashP

  /** array<long> minhash signature of a distinct-shingle array: the native
    * codegen'd kernel ([[graft.functions.NeutralMinHashSig]] — one md5 +
    * a tight probe loop per shingle). Semantics are pure md5 + integer
    * arithmetic, so the DuckDB oracle reproduces it; bit-parity with the
    * column-composed spec [[neutralMinhashSigColumns]] is asserted in
    * OpsSpec. */
  private[graft] def neutralMinhashSig(sh: Column, numHashes: Int): Column =
    graft.functions.NativeFunctions.neutral_minhash_sig(sh, numHashes)

  /** Column-composed executable spec of [[neutralMinhashSig]] (what the
    * DuckDB oracle mirrors term by term) — parity anchor, not the hot
    * path: 64 array-transform passes per row vs the kernel's single
    * loop. */
  private[graft] def neutralMinhashSigColumns(sh: Column, numHashes: Int): Column = {
    val bases = transform(sh, s =>
      conv(substring(md5(s), 1, 12), 16, 10).cast("long") % MinhashP)
    val aLit = array((0 until numHashes).map(i => lit(minhashA(i))): _*)
    val bLit = array((0 until numHashes).map(i => lit(minhashB(i))): _*)
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(bases, x =>
        (element_at(aLit, i + 1) * x + element_at(bLit, i + 1)) % MinhashP)))
  }

  /** array<string> of `bands` LSH band keys ("band:md5-of-slice") for a
    * distinct-shingle array — the shared candidate-bucket key of
    * [[minhashLshPairs]] (pairwise near-dup mining) and
    * [[nearDupGateBatch]] / streaming gate (first-wins keep/drop).
    * Engine-neutral end to end (md5 arithmetic), so DuckDB oracles
    * reproduce the exact buckets. */
  private[graft] def minhashBandKeys(
      sh: Column, bands: Int, rowsPerBand: Int): Column = {
    val mh = neutralMinhashSig(sh, bands * rowsPerBand)
    array((0 until bands).map { b =>
      concat_ws(":", lit(b),
        md5(concat_ws(",", slice(mh, b * rowsPerBand + 1, rowsPerBand))))
    }: _*)
  }

  /** Near-dup GATE, batch form: one keep/drop bit per document without
    * materializing the pair list — a doc survives iff it is the
    * first-arriving claimant (min arrival order) of EVERY one of its LSH
    * band buckets within the corpus. Any near-dup of an earlier doc shares
    * ≥1 band with it by LSH design and therefore fails to claim that band.
    * This is the admission-control view of dedup (the decision an ingest
    * gate needs), vs [[minhashLshPairs]]'s forensic pair view; the
    * streaming twin ([[graft.streaming.StreamingOps.nearDupGateStream]])
    * runs the identical first-wins rule over watermark-bounded band state,
    * and StreamingSpec proves batch/stream parity.
    *
    * Scale shape: explode to bands (×16 rows, three scalar columns), one
    * band-keyed window for the per-band first claimant, one doc-keyed
    * aggregate for the all-bands conjunction. No pair blowup anywhere —
    * candidate pairs are never formed. */
  def nearDupGateBatch(
      df: DataFrame, id: Column, text: Column, arrival: Column,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withBands = df
      .select(id.as("id"), arrival.as("arrival"),
        TextOps.shingles(text, n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), col("arrival"),
        explode(minhashBandKeys(col("sh"), bands, rowsPerBand)).as("band"))
    val w = Window.partitionBy(col("band")).orderBy(col("arrival"), col("id"))
    withBands
      .withColumn("claimed", row_number().over(w) === 1)
      .groupBy(col("id"))
      .agg(min(col("claimed")).as("is_new"))
      .select(col("id"), col("is_new"))
  }

  /** All pairs of distinct keys within Levenshtein distance 1, via
    * deletion-neighborhood blocking (the FastSS/SymSpell identity: two
    * strings within one edit — insert, delete, or substitute — always
    * share a variant in {s} ∪ single-deletions(s), so the candidate
    * equi-join on variants has FULL recall by construction and exact
    * `levenshtein` verification makes the output exact, not approximate).
    * The record-linkage / typo-cluster primitive: key normalization,
    * vocabulary folding, entity matching.
    *
    * Scale shape: |key|+1 variant rows per key, one equi-shuffle keyed on
    * the variant string, per-variant collision lists bounded by
    * ~alphabet·|key| — never the |V|² cross product a naive fuzzy join
    * needs. Verification runs on the (tiny) deduped candidate set. */
  def editDistance1Pairs(df: DataFrame, key: Column, maxDf: Int = 0): DataFrame = {
    val k = df.select(key.as("k")).filter(col("k").isNotNull).distinct()
    val variants = array_distinct(concat(array(col("k")),
      transform(sequence(lit(1), length(col("k"))), i =>
        concat(col("k").substr(lit(1), i - 1),
          col("k").substr(i + 1, length(col("k")))))))
    val ex0 = k.select(col("k"), explode(variants).as("v"))
    // hot-variant guard (same discipline as [[jaccardPairs]]' maxDf): a
    // degenerate key cluster (all-same-char keys, boilerplate prefixes)
    // could land O(df²) candidates on one variant bucket; capping the
    // posting-list length bounds every bucket. 0 = off (the oracle
    // anchor); pairs joined ONLY through capped variants are the recall
    // cost, and only when every shared variant is hot. Candidates come
    // from the skew-bounded [[bucketPairs]] generator (window-counted df,
    // posting-list combinations, hot buckets through the spillable join
    // lane — no sort-merge self-join in the common case).
    bucketPairs(ex0, Seq("v"), col("k"), maxDf)
      .select(col("a").as("k_a"), col("b").as("k_b"))
      .dropDuplicates("k_a", "k_b")
      .filter(levenshtein(col("k_a"), col("k_b")) <= 1)
  }

  /** MinHash+LSH near-dup pairs: band-bucket candidate join, then exact
    * Jaccard verification of candidates (false positives filtered; recall
    * governed by (bands, rowsPerBand) — 16×4 here, ≥0.9998 at J≥0.9).
    * Signatures are the engine-neutral [[neutralMinhashSig]] md5-arithmetic
    * family and band keys are md5 of the band's comma-joined minhash slice,
    * so the whole candidate generation — and therefore the final verified
    * pair set — is reproducible in the DuckDB oracle. */
  def minhashLshPairs(
      df: DataFrame, id: Column, text: Column,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSh = df
      .select(id.as("id"), TextOps.shingles(text, n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = withSh.withColumn(
      "mh", neutralMinhashSig(col("sh"), numHashes))
    // band signature = md5 of that band's comma-joined minhash slice
    // (engine-neutral, unlike Spark's murmur `hash`)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", slice(col("mh"), b * rowsPerBand + 1, rowsPerBand)))
          .as("sig"))
    }
    // The band-bucket candidate stage moves ONLY (id, band, sig) — three
    // scalars per bucket row. Shipping the shingle arrays through this
    // shuffle would replicate every document's full shingle set ×bands;
    // instead the arrays are re-attached to the (far smaller) deduped
    // candidate pair list by two id-keyed joins before exact verification.
    // Candidates come from the skew-bounded [[bucketPairs]] generator:
    // posting-list combinations for normal buckets, the spillable join
    // lane for degenerate hot buckets (a band signature shared by a huge
    // near-identical cohort must not serialize into one aggregation row).
    val buckets = sig
      .select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val candPairs = bucketPairs(buckets, Seq("band", "sig"), col("id"))
      .select(col("a").as("id_a"), col("b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val candidates = candPairs
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    // exact verification on the (small) candidate set
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    candidates
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Approximation audit for the MinHash family: every LSH candidate pair
    * with its EXACT Jaccard, its signature-estimated Jaccard (fraction of
    * agreeing minhash components — the estimator LSH thresholds actually
    * act on), and the absolute error. The estimate is unbiased with
    * stderr ≈ √(J(1-J)/64); this query is the measurement a pipeline runs
    * before trusting a (bands, rowsPerBand) configuration at scale.
    * Everything is the engine-neutral md5 family, so the DuckDB oracle
    * reproduces estimates AND errors bit for bit. Same shuffle shape as
    * [[minhashLshPairs]]: sig-only bucket join, arrays re-attached to the
    * deduped candidate list. */
  def minhashJaccardEst(
      df: DataFrame, id: Column, text: Column,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSh = df
      .select(id.as("id"), TextOps.shingles(text, n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = withSh.withColumn("mh", neutralMinhashSig(col("sh"), numHashes))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", slice(col("mh"), b * rowsPerBand + 1, rowsPerBand)))
          .as("sig"))
    }
    // skew-bounded per-bucket candidates (same [[bucketPairs]] shape as
    // [[minhashLshPairs]] — no sort-merge self-join in the common case)
    val buckets = sig
      .select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val candPairs = bucketPairs(buckets, Seq("band", "sig"), col("id"))
      .select(col("a").as("id_a"), col("b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val candidates = candPairs
      .join(sig.select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("mh").as("mh_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sh").as("sh_b"),
        col("mh").as("mh_b")), Seq("id_b"))
    val exact =
      size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    val agree = aggregate(
      zip_with(col("mh_a"), col("mh_b"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    candidates
      .withColumn("exact_j", exact)
      .withColumn("est_j", agree.cast("double") / numHashes)
      .select(col("id_a"), col("id_b"),
        round(col("exact_j"), 6).as("exact_j"),
        round(col("est_j"), 6).as("est_j"),
        round(abs(col("exact_j") - col("est_j")), 6).as("abs_err"))
  }

  /** Engine-neutral 60-bit SimHash: per-token 60-bit md5-prefix hashes,
    * each bit position j accumulates ±1 across tokens (repeats counted),
    * bit j of the signature is 1 iff the sum is > 0. 60 bits (15 hex
    * chars) keep the value unambiguously in a signed 64-bit integer on
    * every engine — the native [[graft.functions.SimHash64]] FNV loop
    * needs wrapping 64-bit multiplication, which DuckDB's overflow-checked
    * BIGINT cannot express. The token-hash array is projected ONCE per row;
    * the 60 bit-sums then fold over that array. */
  private[graft] val SimhashBits = 60
  /** Native codegen'd signature ([[graft.functions.NeutralSimHash60]]):
    * one md5 + 60-bit vote loop per token. Bit-parity with the
    * column-composed spec below is asserted in OpsSpec. */
  private[graft] def neutralSimhash(tokens: Column): Column =
    graft.functions.NativeFunctions.neutral_simhash60(tokens)
  /** Column-composed executable spec (what the DuckDB oracle mirrors) —
    * parity anchor, not the hot path. */
  private[graft] def neutralTokenHashes(tokens: Column): Column =
    transform(tokens, t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
  private[graft] def neutralSimhashFromHashes(ths: Column): Column =
    (0 until SimhashBits).map { j =>
      when(aggregate(ths, lit(0L), (a, h) =>
        a + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1)) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** SimHash near-dup pairs within a Hamming radius, via chunk-bucket
    * banding: the 60-bit signature splits into `chunks` equal bit-chunks;
    * by pigeonhole, any pair within Hamming distance < chunks shares at
    * least one identical chunk, so the equi-join on (chunk index, chunk
    * value) is a candidate generator with *exact* recall for
    * maxHamming ≤ chunks-1 — an equi-shuffle instead of the O(n²) cross
    * join, the same trick Manku et al. use for web-scale simhash dedup.
    * Signatures are the engine-neutral md5 family ([[neutralSimhashFromHashes]])
    * so the DuckDB oracle reproduces the exact pair set. */
  def simhashPairs(
      df: DataFrame, id: Column, text: Column, maxHamming: Int = 3,
      chunks: Int = 4): DataFrame = {
    require(maxHamming < chunks, "pigeonhole guarantee needs maxHamming < chunks")
    val bitsPerChunk = SimhashBits / chunks
    val sigs = df
      .select(id.as("id"), neutralSimhash(TextOps.tokens(text)).as("sig"))
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("c"),
        shiftright(col("sig"), c * bitsPerChunk)
          .bitwiseAND(lit((1L << bitsPerChunk) - 1)).as("v"))
    }
    // skew-bounded per-chunk candidates ([[bucketPairs]]): a degenerate
    // chunk value (near-empty texts share whole signature chunks) must
    // not serialize its bucket into one aggregation row
    val buckets = sigs
      .select(col("id"), col("sig"), explode(array(chunkCols: _*)).as("ck"))
      .select(col("id"), col("sig"), col("ck.c").as("c"), col("ck.v").as("v"))
    bucketPairs(buckets, Seq("c", "v"), struct(col("id"), col("sig")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Embedding near-dup via LSH-bucketed candidates: vectors hash into
    * sign-bit buckets per table ([[SimilarityOps.lshBucket]]); only pairs
    * colliding in some table's bucket are scored, so the join is an
    * equi-shuffle on (table, bucket) instead of the O(n²) cross product —
    * the scale path for [[embeddingTopPairs]]. This is a *near-duplicate*
    * finder: vectors within a few degrees collide per table with probability
    * ~1, so recall on true near-dups (cosine ≳ 0.95) is ~1, while unrelated
    * pairs (the ~60° apart kind) are intentionally never scored — if a
    * corpus has no near-dups, its "top-k" here is a sample of bucket
    * cohabitants, not the exact cartesian top-k. */
  def embeddingTopPairsLsh(
      df: DataFrame, id: Column, vec: Column, k: Int, dim: Int,
      bits: Int = 6, tables: Int = 4): DataFrame = {
    require(dim > 0, s"vector dim must be positive, got $dim")
    val v = df.select(id.as("id"), VectorOps.vecD(vec).as("v"))
      .withColumn("nrm", VectorOps.l2norm(col("v")))
    val bucketCols = (0 until tables).map { t =>
      val planes = SimilarityOps.hyperplanes(dim, bits, seed = 42L + t)
      struct(lit(t).as("t"), SimilarityOps.lshBucket(col("v"), planes).as("b"))
    }
    val bucketed = v
      .select(col("id"), col("v"), col("nrm"), explode(array(bucketCols: _*)).as("bk"))
      .select(col("id"), col("v"), col("nrm"), col("bk.t").as("t"), col("bk.b").as("b"))
    val a = bucketed.select(col("t"), col("b"),
      col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = bucketed.select(col("t"), col("b"),
      col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b"))
    // cosine on the (map-side) join output BEFORE the dedup, so the
    // dedup shuffle and TakeOrdered move (id_a, id_b, cosine) scalars —
    // never the dim-wide vectors (same trade as [[SimilarityOps.knnGraph]]:
    // a pair colliding in several tables is scored once per table, but
    // cosine is deterministic per pair so the duplicates collapse safely
    // and the redundant work is bounded by `tables`)
    a.join(b, Seq("t", "b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        VectorOps.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .select(col("id_a"), col("id_b"), col("cosine"))
      .dropDuplicates("id_a", "id_b")
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Embedding near-dup: top-k most similar pairs by cosine — the exact
    * all-pairs baseline (the non-equi `id_a < id_b` join is a cartesian;
    * fine for a fixture-sized table, quadratic at corpus scale). For large
    * tables use [[embeddingTopPairsLsh]], whose candidate join equi-shuffles
    * on LSH buckets. */
  def embeddingTopPairs(df: DataFrame, id: Column, vec: Column, k: Int): DataFrame = {
    // Norms are computed once per vector, not once per pair — same bits as
    // cosine(v_a, v_b), ~3x less work in the O(n^2) stage.
    val v = df.select(id.as("id"), VectorOps.vecD(vec).as("v"))
      .withColumn("nrm", VectorOps.l2norm(col("v")))
    val a = v.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = v.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        VectorOps.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Corpus-level repeated-span removal (the CCNet/RefinedWeb line-dedup
    * step, over fixed token windows instead of newlines so it applies to
    * unstructured text too): cut each doc into consecutive `lineTokens`-token
    * lines, drop every line whose distinct-document frequency is >= `minDf`
    * anywhere in the corpus, and reassemble the survivors in original order.
    * Output: (id, n_lines, n_kept, clean_text).
    *
    * Scale shape: explode -> one df aggregate on the line text -> anti-join
    * back -> per-doc ordered reassembly. The boilerplate line set is tiny
    * relative to the corpus (only lines with df >= minDf), so Catalyst
    * broadcasts the anti-join side; the reassembly groupBy is the only
    * full-width shuffle and carries (id, idx, line) — never whole docs. */
  def lineDedup(df: DataFrame, id: Column, text: Column,
      lineTokens: Int = 8, minDf: Int = 2): DataFrame = {
    val toks = split(text, " ")
    val nLines = ceil(size(toks).cast("double") / lineTokens).cast("int")
    val linesArr = transform(sequence(lit(0), nLines - 1),
      i => array_join(slice(toks, i * lineTokens + 1, lit(lineTokens)), " "))
    val lines = df
      .select(id.as("id"), posexplode(linesArr))
      .withColumnRenamed("pos", "idx")
      .withColumnRenamed("col", "line")
    val boiler = lines.groupBy(col("line"))
      .agg(countDistinct(col("id")).as("line_df"))
      .filter(col("line_df") >= minDf)
      .select(col("line"))
    val rebuilt = lines.join(boiler, Seq("line"), "left_anti")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("line")))),
            x => x.getField("line")), " ").as("clean_text"))
    df.select(id.as("id"), nLines.cast("long").as("n_lines"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023): k-means
    * the embedding space into `numCells` cells, then compare vectors ONLY
    * within their cell — the all-pairs cosine join becomes `numCells`
    * independent equi-joins, sum of squared cell sizes instead of n^2.
    * Emits (id_a, id_b, cosine) for within-cell pairs with cosine >=
    * `threshold`; feed to [[graft.ops.GraphOps.dedupClusters]] to pick
    * keepers. Centroids are deterministic ([[IvfOps.trainCentroids]]:
    * first-k init + fixed iterations), so the pair set is reproducible. */
  def semanticDedupPairs(df: DataFrame, id: Column, vec: Column,
      numCells: Int, threshold: Double, iters: Int = 3): DataFrame = {
    val v = df.select(id.as("id"), VectorOps.vecD(vec).as("v"))
    val centroids = IvfOps.trainCentroids(v, col("id"), col("v"), numCells, iters)
    val cells = IvfOps.assignCells(v, col("v"), centroids)
      .withColumn("nrm", VectorOps.l2norm(col("v")))
    val a = cells.select(col("cell"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = cells.select(col("cell"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        VectorOps.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
