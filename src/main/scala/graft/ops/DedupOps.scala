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

  /** Exact dedup: one surviving row (min id) per key + duplicate count.
    * `groupBy` gives partial aggregation before the shuffle. */
  def exactDedup(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("copies"))

  /** (id, shingle) inverted-index exploded view, distinct shingles per doc. */
  private def shingleIndex(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("id"), TextOps.shingles(text, n).as("sh"))
      .select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))

  /** All pairs (a < b) with shingle-set Jaccard ≥ threshold, by inverted-
    * index self-join: |A∩B| from matching shingles, |A∪B| from the per-doc
    * set sizes carried alongside. */
  def jaccardPairs(
      df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val idx = shingleIndex(df, id, text, n)
    // Self-join with aliases ABOVE identical subplans: both join inputs are
    // the same scan→shingle→explode tree, so Catalyst's ReuseExchange ships
    // one shuffle instead of two (renaming below the exchange would make
    // the subtrees differ and double the shuffle).
    val a = idx.alias("a")
    val b = idx.alias("b")
    a.join(b, col("a.shingle") === col("b.shingle"))
      .filter(col("a.id") < col("b.id"))
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

  /** MinHash+LSH near-dup pairs: band-bucket candidate join, then exact
    * Jaccard verification of candidates (false positives filtered; recall
    * governed by (bands, rowsPerBand) — 16×4 here, ≥0.9998 at J≥0.9).
    * Signatures come from the one-pass native [[graft.functions.MinHashSig]]
    * expression (universal hashing over a single FNV-1a base hash). */
  def minhashLshPairs(
      df: DataFrame, id: Column, text: Column,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSh = df
      .select(id.as("id"), TextOps.shingles(text, n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = withSh.withColumn(
      "mh", graft.functions.NativeFunctions.minhash_sig(col("sh"), numHashes))
    // band signature = hash of that band's minhash slice
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash(slice(col("mh"), b * rowsPerBand + 1, rowsPerBand)).as("sig"))
    }
    val buckets = sig
      .select(col("id"), col("sh"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val l = buckets.select(col("band"), col("sig"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = buckets.select(col("band"), col("sig"), col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = l.join(r, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
    // exact verification on the (small) candidate set
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    candidates
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs within a Hamming radius, via chunk-bucket
    * banding: the 64-bit signature splits into `chunks` equal bit-chunks;
    * by pigeonhole, any pair within Hamming distance < chunks shares at
    * least one identical chunk, so the equi-join on (chunk index, chunk
    * value) is a candidate generator with *exact* recall for
    * maxHamming ≤ chunks-1 — an equi-shuffle instead of the O(n²) cross
    * join, the same trick Manku et al. use for web-scale simhash dedup. */
  def simhashPairs(
      df: DataFrame, id: Column, text: Column, maxHamming: Int = 3,
      chunks: Int = 4): DataFrame = {
    require(maxHamming < chunks, "pigeonhole guarantee needs maxHamming < chunks")
    val bitsPerChunk = 64 / chunks
    val sigs = df.select(id.as("id"), SimHash64.simhash64(TextOps.tokens(text)).as("sig"))
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("c"),
        shiftright(col("sig"), c * bitsPerChunk)
          .bitwiseAND(lit((1L << bitsPerChunk) - 1)).as("v"))
    }
    val buckets = sigs
      .select(col("id"), col("sig"), explode(array(chunkCols: _*)).as("ck"))
      .select(col("id"), col("sig"), col("ck.c").as("c"), col("ck.v").as("v"))
    val a = buckets.select(col("c"), col("v"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = buckets.select(col("c"), col("v"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("c", "v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Embedding near-dup: top-k most similar pairs by cosine. At scale the
    * candidate join comes from [[SimilarityOps.lshBuckets]] instead of the
    * full cross product; the fixture table is 500 rows so brute force is the
    * exact baseline. */
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
}
