package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash64
import graft.ops._
import graft.sources.Tables

/** Extension-operator correctness: hash-seeded algorithms (MinHash, SimHash,
  * LSH) cross-checked against their exact baselines. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, TestSpark.sfDir, "documents").cache()
  private lazy val emb = Tables.load(spark, TestSpark.sfDir, "embeddings").cache()

  test("simhash64 expression matches reference implementation") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),
      (3L, "completely different words entirely")).toDF("id", "text")
    val got = df.select($"id", SimHash64.simhash64(TextOps.tokens($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = SimHash64.ofTokens(Seq("the", "quick", "brown", "fox"))
    assert(got(1L) == expected)
    assert(got(1L) == got(2L)) // identical text, identical signature
    assert(got(1L) != got(3L))
  }

  test("simhash hamming 0 for identical docs, small for near-identical") {
    val a = SimHash64.ofTokens(Seq.tabulate(50)(i => s"tok$i"))
    val b = SimHash64.ofTokens(Seq.tabulate(50)(i => s"tok$i") :+ "extra")
    assert(java.lang.Long.bitCount(a ^ b) <= 8)
  }

  test("minhash LSH finds the exact-Jaccard pairs (high-threshold recall)") {
    val exact = DedupOps.jaccardPairs(docs, $"doc_id", $"text", 3, 0.9)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLshPairs(docs, $"doc_id", $"text", 3, 16, 4, 0.9)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification filters false positives, so LSH ⊆ exact; 16x4 bands at
    // J≥0.9 give recall ≈ 1 on this corpus
    assert(lsh.subsetOf(exact))
    assert(lsh == exact, s"missed pairs: ${exact -- lsh}")
  }

  test("edit-distance-1 pairs: full recall on insert/delete/substitute, d=2 excluded") {
    val keys = Seq("alpha",
      "alphax",  // insert (suffix)
      "alpa",    // delete
      "alpho",   // substitute
      "xalpha",  // insert (prefix)
      "alpxo",   // d=2 from alpha
      "beta")    // unrelated
      .toDF("k")
    val got = DedupOps.editDistance1Pairs(keys, $"k")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = (for {
      a <- keys.collect().map(_.getString(0)); b <- keys.collect().map(_.getString(0))
      if a < b
    } yield (a, b)).filter { case (a, b) => lev(a, b) <= 1 }.toSet
    assert(got == brute)
    assert(got.contains(("alpha", "alphax")) && got.contains(("alpa", "alpha")) &&
      got.contains(("alpha", "alpho")) && got.contains(("alpha", "xalpha")))
    assert(!got.exists(p => p._1 == "beta" || p._2 == "beta"))
    assert(!got.contains(("alpha", "alpxo")))
  }

  test("edit-distance-1 maxDf guard bounds hot-variant buckets; off = exact") {
    // 15 keys differing only in the first char: pairwise distance 1, all
    // discovered ONLY through the shared hot deletion variant "aaaaaaa"
    // (df = 15); plus two cool-bucket true matches
    val hot = ('b' to 'p').map(c => c + "aaaaaaa")
    val keys = (hot ++ Seq("zebra", "zebr", "qqqq")).toDF("k")
    val unguarded = DedupOps.editDistance1Pairs(keys, $"k").count()
    val guarded = DedupOps.editDistance1Pairs(keys, $"k", maxDf = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the guard keeps cool-bucket pairs (zebra/zebr survive) and can only
    // shrink the hot cluster's pair count
    assert(guarded.contains(("zebr", "zebra")))
    assert(guarded.size < unguarded)
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("neutral minhash/simhash kernels bit-match their column-composed specs") {
    // the codegen'd kernels are the hot path; the column-composed md5
    // expressions are the executable spec the DuckDB oracles mirror —
    // any divergence would silently break the oracle contract
    val sh = docs.select($"doc_id", TextOps.shingles($"text", 3).as("sh"))
      .filter(size($"sh") > 0)
    val mh = sh.select(
      DedupOps.neutralMinhashSig($"sh", 16).as("fast"),
      DedupOps.neutralMinhashSigColumns($"sh", 16).as("spec"))
    assert(mh.filter(!($"fast" <=> $"spec")).count() == 0)
    val sg = docs.select(
      DedupOps.neutralSimhash(TextOps.tokens($"text")).as("fast"),
      DedupOps.neutralSimhashFromHashes(
        DedupOps.neutralTokenHashes(TextOps.tokens($"text"))).as("spec"))
    assert(sg.filter(!($"fast" <=> $"spec")).count() == 0)
  }

  test("chunk-banded simhash pairs equal brute force (pigeonhole recall)") {
    // brute force over the SAME engine-neutral 60-bit signature family the
    // op uses (the banding is what's under test, not the hash family)
    val sigs = docs.select($"doc_id",
        DedupOps.neutralSimhashFromHashes(
          DedupOps.neutralTokenHashes(TextOps.tokens($"text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val banded = DedupOps.simhashPairs(docs, $"doc_id", $"text")
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
  }

  test("jaccard maxDf guard bounds hot-shingle candidate pairs; off = brute force") {
    // 40 docs all share the shingle "the common phrase" (df=40, i.e. 100% of
    // the corpus); the rest of each doc is unique. Two true near-dups on top.
    val hot = (0 until 40).map(i => (100L + i, s"the common phrase u${i}a u${i}b u${i}c"))
    val dups = Seq(
      (900L, "alpha beta gamma delta epsilon zeta"),
      (901L, "alpha beta gamma delta epsilon zeta"))
    val corpus = (hot ++ dups).toDF("id", "text")

    // unguarded index: the hot shingle alone yields C(40,2)+1 candidate pairs
    def candidatePairs(maxDf: Int): Long = {
      val idx = DedupOps.shingleIndex(corpus, $"id", $"text", 3, maxDf)
      idx.alias("a").join(idx.alias("b"), $"a.shingle" === $"b.shingle")
        .filter($"a.id" < $"b.id")
        .select($"a.id", $"b.id").distinct().count()
    }
    assert(candidatePairs(0) >= 40 * 39 / 2) // quadratic blowup, unguarded
    assert(candidatePairs(10) == 1)          // df cut: only the true dup pair survives

    // guard on: still finds the real near-dups (their shingles are rare)
    val guarded = DedupOps.jaccardPairs(corpus, $"id", $"text", 3, 0.8, maxDf = 10)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == Set((900L, 901L)))

    // guard off: equality with local brute force over shingle sets
    def shingleSet(t: String): Set[String] =
      t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val all = (hot ++ dups).map { case (i, t) => (i, shingleSet(t)) }
    val brute = (for {
      (ia, sa) <- all; (ib, sb) <- all
      if ia < ib
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.8
    } yield (ia, ib)).toSet
    val unguarded = DedupOps.jaccardPairs(corpus, $"id", $"text", 3, 0.8)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded == brute)
  }

  test("batch jaccard pairs: each pair once, no corpus-corpus candidates") {
    // corpus: 1,2 are mutual dups; batch: 10 dups corpus 1/2; 11,12 mutual
    // dups; 13 unique. Expected pairs: (10,1) (10,2) batch-vs-corpus, and
    // (11,12) batch-vs-batch exactly once — NEVER the corpus pair (1,2).
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated corpus content here"),
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five six seven"),
      (12L, "one two three four five six seven"),
      (13L, "unique batch document nothing shared")).toDF("id", "text")
    val batchIds = Seq(10L, 11L, 12L, 13L).toDF("id")
    val got = DedupOps.batchJaccardPairs(corpus, batchIds, $"id", $"text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2)).toSet == Set((10L, 1L), (10L, 2L), (11L, 12L)))
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length) // once each
    // exact dups: a double-counted orientation would inflate inter and
    // push jaccard past 1 — 1.0 proves each shingle match counted once
    assert(got.forall(_._4 == 1.0))
    assert(got.collect { case (11L, 12L, bb, _) => bb }.head) // batch-batch flagged
    assert(!got.collect { case (10L, 1L, bb, _) => bb }.head)
  }

  test("persisted shingle index probe: batch-vs-corpus + within-batch pairs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different corpus content entirely")).toDF("id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // dups corpus 1
      (11L, "one two three four five six seven"),
      (12L, "one two three four five six seven"), // dups batch 11
      (13L, "unique new batch content nothing shared")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_shidx_test").toString
    DedupOps.writeShingleIndex(corpus, $"id", $"text", dir, n = 3)
    val pairs = DedupOps.probeShingleIndex(spark, dir, batch, $"id", $"text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    assert(pairs.map(t => (t._1, t._2, t._3)).toSet ==
      Set((10L, 1L, false), (11L, 12L, true)))
    assert(pairs.forall(_._4 == 1.0)) // exact dups; >1 would mean double count
  }

  test("append to persisted shingle index == rebuild (the ingest loop closes)") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different corpus content entirely")).toDF("id", "text")
    val batch1 = Seq(
      (10L, "one two three four five six seven")).toDF("id", "text")
    val batch2 = Seq(
      (20L, "one two three four five six seven"),   // dups batch1's 10
      (21L, "alpha beta gamma delta epsilon zeta")) // dups corpus 1
      .toDF("id", "text")
    val dirA = java.nio.file.Files.createTempDirectory("graft_shidx_app").toString
    DedupOps.writeShingleIndex(corpus, $"id", $"text", dirA, n = 3)
    DedupOps.appendShingleIndex(batch1, $"id", $"text", dirA, n = 3)
    val viaAppend = DedupOps.probeShingleIndex(spark, dirA, batch2, $"id", $"text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val dirB = java.nio.file.Files.createTempDirectory("graft_shidx_reb").toString
    DedupOps.writeShingleIndex(corpus.unionByName(batch1), $"id", $"text", dirB, n = 3)
    val viaRebuild = DedupOps.probeShingleIndex(spark, dirB, batch2, $"id", $"text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(viaAppend == viaRebuild)
    // batch2 catches dups against BOTH the original corpus and batch1
    assert(viaAppend == Set((20L, 10L, false), (21L, 1L, false)))
  }

  test("stripHtml: blocks, tags, entities, whitespace — in spec'd order") {
    val html = "<html><head><style>p{x}</style></head><body><h1>A</h1>" +
      "<p class=\"c\">hello   world</p><script>var x=\"<b>\";</script>" +
      "&amp;&nbsp;&lt;tag&gt; &#39;q&#39;</body></html>"
    val got = Seq(html).toDF("h")
      .select(TextOps.stripHtml($"h")).head().getString(0)
    assert(got == "A hello world & <tag> 'q'", got)
    // entity decode happens AFTER tag strip: an encoded tag survives as text
    val enc = Seq("&lt;script&gt;x&lt;/script&gt;").toDF("h")
      .select(TextOps.stripHtml($"h")).head().getString(0)
    assert(enc == "<script>x</script>", enc)
  }

  test("stripMarkdown: fences drop, inline code/link/image text keeps") {
    val md = "# Title\n\n> quote\n\n**bold** *em* `x=1`\n\n```\ncode\n" +
      "gone\n```\n\n[anchor](https://a) ![alt](i.png)\n\n---\n\nbody"
    val got = Seq(md).toDF("m")
      .select(TextOps.stripMarkdown($"m")).head().getString(0)
    assert(got == "Title quote bold em x=1 anchor alt body", got)
    // a fence spanning lines must not leak its interior (the (?s) flag)
    val multi = Seq("a\n```\nx\ny\nz\n```\nb").toDF("m")
      .select(TextOps.stripMarkdown($"m")).head().getString(0)
    assert(multi == "a b", multi)
    // header marker only strips at line START (mid-line # survives)
    val mid = Seq("issue #42 rocks").toDF("m")
      .select(TextOps.stripMarkdown($"m")).head().getString(0)
    assert(mid == "issue #42 rocks", mid)
  }

  test("stripLatex: math/commands drop, braced args keep, \\% survives") {
    val tex = "\\section{Head} % comment\n\\begin{doc}\n\\textbf{Bold} " +
      "$x^2$ $$\\sum y$$ \\cite[p.3]{ref} \\nl\n\\end{doc}\n100\\% sure"
    val got = Seq(tex).toDF("t")
      .select(TextOps.stripLatex($"t")).head().getString(0)
    assert(got == "Head Bold ref 100\\% sure", got)
    // unescaped % comments to end-of-line; the char BEFORE it survives
    val cm = Seq("keep x% drop this\nnext").toDF("t")
      .select(TextOps.stripLatex($"t")).head().getString(0)
    assert(cm == "keep x next", cm)
  }

  test("URL canonicalization agrees with Spark's native parse_url on host/path") {
    // the registry entry derives host/path via the RE2 regexp chain (so the
    // identical chain runs in DuckDB); Spark's java.net-based parse_url must
    // agree on well-formed URLs — ties the native operator to the oracle
    val urls = Seq(
      "https://www.foo.example.com:443/p/1/item?utm_source=a&ref=2#frag",
      "http://Bar.Example.ORG/x?q=1",
      "https://plain.example.net/deep/path/here").toDF("url")
    val both = urls.select(
      lower(regexp_extract(regexp_replace($"url", "#.*$", ""),
        "^[^:]+://([^/?#]*)", 1)).as("re_hostport"),
      lower(parse_url($"url", lit("HOST"))).as("native_host"),
      regexp_extract(regexp_replace($"url", "#.*$", ""),
        "^[^:]+://[^/?#]*([^?]*)", 1).as("re_path"),
      parse_url($"url", lit("PATH")).as("native_path")).collect()
    both.foreach { r =>
      // parse_url HOST excludes the port; the regexp keeps it until the
      // explicit default-port strip — compare net of :port
      assert(r.getString(0).replaceAll(":\\d+$", "") == r.getString(1),
        s"host mismatch: ${r.mkString(",")}")
      assert(r.getString(2) == r.getString(3),
        s"path mismatch: ${r.mkString(",")}")
    }
  }

  test("ANN/LSH op construction launches no Spark job (plan-time purity)") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // force the fixture loads first: spark.read.parquet runs a footer job
    // at read time — that's Tables.load's cost, not the ops' plan build
    locally { val _ = (docs.schema, emb.schema) }
    org.apache.spark.TestBusFlush.flush(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      DedupOps.embeddingTopPairsLsh(emb, $"vec_id", $"embedding", k = 5, dim = 64)
      SimilarityOps.lshTopK(emb.filter($"vec_id" < 5), emb,
        $"vec_id", $"embedding", $"vec_id", $"embedding", k = 3, dim = 64)
      SimilarityOps.knnGraph(emb, $"vec_id", $"embedding", k = 3, dim = 64)
      graft.ops.LayoutOps.globalRowNumber(
        docs.select($"doc_id", $"n_chars"), $"n_chars",
        Seq($"n_chars", $"doc_id"), buckets = 8)
      org.apache.spark.TestBusFlush.flush(spark.sparkContext)
      assert(jobs.get() == 0,
        s"op construction ran ${jobs.get()} Spark job(s); plans must be lazy")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("LSH-bucketed embedding pairs find planted near-duplicates") {
    // The fixture has no true near-dups (top pair cosine ≈ 0.48, ~60° —
    // sign-bit LSH cannot and should not bucket those together). Plant
    // five: deterministic small per-component perturbations of vec_ids 0-4,
    // cosine ≈ 0.9999. Near-identical vectors collide per table with
    // probability ~1, so the equi-join candidate cut must surface exactly
    // these as the top pairs.
    val planted = emb.filter($"vec_id" < 5).select(
      ($"vec_id" + 1000L).as("vec_id"),
      transform($"embedding", (x, i) =>
        x * (lit(1.0f) + i.cast("float") * lit(0.0002f))).as("embedding"))
    val corpus = emb.select($"vec_id", $"embedding").unionByName(planted)
    val got = DedupOps.embeddingTopPairsLsh(corpus, $"vec_id", $"embedding",
        k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)).toSet ==
      (0 until 5).map(i => (i.toLong, 1000L + i)).toSet)
    assert(got.forall(_._3 > 0.99))
  }

  test("exact dedup keeps one keeper per key") {
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "t")
    val got = DedupOps.exactDedup(d, $"t", $"id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 1L, 2L), ("b", 3L, 1L)))
  }

  test("brute-force top-k is exact (verified against local computation)") {
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = vecs.filter(_._1 != 0L).toSeq
      .map { case (id, v) => (id, cos(vecs(0L), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
    val got = SimilarityOps.bruteForceTopK(
        emb.filter($"vec_id" === 0), emb, $"vec_id", $"embedding", $"vec_id", $"embedding", 3)
      .orderBy($"rank").select($"n_id").collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("LSH ANN achieves reasonable recall vs brute force (dims 32, 64, 128)") {
    // The fixture is dim 64; slice to 32 and self-concat to 128 so the
    // hyperplane dimension (a required caller parameter since round 4 —
    // no plan-time data probe) is exercised off the fixture's native size;
    // the round-1 hard-coded dim=64 silently truncated any wider embedding.
    val variants: Seq[(String, Int, org.apache.spark.sql.DataFrame)] = Seq(
      ("dim32", 32, emb.select($"vec_id", slice($"embedding", 1, 32).as("embedding"))),
      ("dim64", 64, emb.select($"vec_id", $"embedding")),
      ("dim128", 128, emb.select($"vec_id", concat($"embedding", $"embedding").as("embedding"))))
    for ((name, d, e) <- variants) {
      val brute = SimilarityOps.bruteForceTopK(
          e.filter($"vec_id" < 10), e, $"vec_id", $"embedding", $"vec_id", $"embedding", 5)
        .select($"q_id", $"n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = SimilarityOps.lshTopK(
          e.filter($"vec_id" < 10), e, $"vec_id", $"embedding", $"vec_id", $"embedding",
          k = 5, dim = d)
        .select($"q_id", $"n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & lsh).size.toDouble / brute.size
      assert(recall >= 0.5, s"LSH recall too low at $name: $recall") // 4 tables x 6 bits, multiprobe
    }
  }

  test("text ops: token count, shingles, fingerprint") {
    val d = Seq("the quick brown fox jumps").toDF("text")
    val r = d.select(
      TextOps.tokenCount($"text").as("n"),
      size(TextOps.shingles($"text", 3)).as("sh"),
      TextOps.fingerprint($"text").as("fp"),
      TextOps.langId($"text").as("lang")).collect().head
    assert(r.getInt(0) == 5)
    assert(r.getInt(1) == 3) // 5 tokens -> 3 trigrams
    assert(r.getString(2).length == 32)
    assert(r.getString(3) == "en")
  }

  test("multimodal stub extracts deterministic metadata") {
    val media = MultimodalOps.asBinaryPayload(docs.limit(10), "doc_id", "text")
    val a = MultimodalOps.extractMeta(spark, media).collect().sortBy(_.doc_id)
    val b = MultimodalOps.extractMeta(spark, media).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq) // deterministic
    assert(a.forall(m => m.byte_len > 0 && m.checksum.length == 32))
    assert(a.forall(m => m.format == "raw" && m.width >= 64 && m.height >= 64))
  }

  test("decodeReport: per-format quarantine ledger — truncation keeps the format, fails the decode, never throws") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, substring}
    def statusOf(media: org.apache.spark.sql.DataFrame, trunc: Option[Int]) = {
      val m = trunc.fold(media)(n =>
        media.select(col("doc_id"), substring(col("payload"), 1, n).as("payload")))
      MultimodalOps.decodeReport(spark, m).collect().toSeq
    }
    val few = docs.limit(6)
    for ((mk, fmt) <- Seq[(org.apache.spark.sql.DataFrame, String)](
        (MultimodalOps.asBmpPayload(spark, few, "doc_id"), "bmp"),
        (MultimodalOps.asPngPayload(spark, few, "doc_id"), "png"))) {
      // intact: classified + decoded
      assert(statusOf(mk, None).forall(s => s.format == fmt && s.decoded),
        s"intact $fmt should decode")
      // truncated past the header: format survives, decode quarantines
      val t = statusOf(mk, Some(30))
      assert(t.forall(s => s.format == fmt && !s.decoded),
        s"truncated $fmt should quarantine, got $t")
    }
    // opaque bytes: the raw lane, always quarantined
    val raw = MultimodalOps.asBinaryPayload(few, "doc_id", "text")
    assert(statusOf(raw, None).forall(s => s.format == "raw" && !s.decoded))
    // audio: real 16-bit PCM WAVs decode; truncation keeps the wav tag
    // (asWavPayload's text-byte payloads can be ODD-length — out of the
    // 16-bit decoder's scope — so the ledger test uses the PCM fixture)
    val wav = MultimodalOps.asPcmWavPayload(spark, few, "doc_id")
    assert(statusOf(wav, None).forall(s => s.format == "wav" && s.decoded))
    assert(statusOf(wav, Some(30)).forall(s => s.format == "wav" && !s.decoded))
    // video: real MP4 boxes parse; truncation keeps the mp4 tag
    val mp4 = MultimodalOps.asMp4Payload(spark, few, "doc_id", "text")
    assert(statusOf(mp4, None).forall(s => s.format == "mp4" && s.decoded))
    assert(statusOf(mp4, Some(30)).forall(s => s.format == "mp4" && !s.decoded))
  }

  test("bmp pixel decode handles stride, bottom-up/top-down, and BGR order") {
    // hand-built 2x2 24-bit BMP, bottom-up: stored row 0 = IMAGE row 1.
    // Image pixels (r,g,b): (0,0)=(10,20,30) (1,0)=(40,50,60)
    //                       (0,1)=(70,80,90) (1,1)=(100,110,120)
    def bmp(topDown: Boolean): Array[Byte] = {
      val stride = 8 // 2*3 = 6, padded to 8
      val buf = java.nio.ByteBuffer.allocate(54 + stride * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * 2)
        .putShort(0).putShort(0).putInt(54)
        .putInt(40).putInt(2).putInt(if (topDown) -2 else 2)
        .putShort(1).putShort(24).putInt(0).putInt(stride * 2)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      val imgRows = Seq( // BGR triplets per image row (top first)
        Seq(30, 20, 10, 60, 50, 40), Seq(90, 80, 70, 120, 110, 100))
      val stored = if (topDown) imgRows else imgRows.reverse
      stored.foreach { row =>
        row.foreach(v => buf.put(v.toByte)); buf.put(0.toByte).put(0.toByte) }
      buf.array()
    }
    for (td <- Seq(false, true)) {
      val p = MultimodalOps.bmpPixels(bmp(td)).get
      assert(p.width == 2 && p.height == 2, s"topDown=$td")
      assert((p.sum_r, p.sum_g, p.sum_b) == ((220L, 260L, 300L)), s"topDown=$td")
      // the top-left IMAGE pixel, independent of storage order
      assert((p.first_r, p.first_g, p.first_b) == ((10, 20, 30)), s"topDown=$td")
    }
    // compressed / non-24bpp / truncated payloads are rejected
    assert(MultimodalOps.bmpPixels("BM but not a real bmp".getBytes).isEmpty)
    assert(MultimodalOps.bmpPixels(bmp(false).take(40)).isEmpty)
    // the fixture adapter round-trips through the decoder
    val media = MultimodalOps.asBmpPayload(spark, docs.limit(8), "doc_id")
    val decoded = MultimodalOps.extractBmpPixels(spark, media)
      .collect().sortBy(_.doc_id)
    assert(decoded.length == 8)
    decoded.foreach { d =>
      val id = d.doc_id
      assert(d.width == 4 + (id % 5).toInt && d.height == 3 + (id % 4).toInt)
      assert(d.first_r == (id % 256).toInt && d.first_g == (id * 3 % 256).toInt
        && d.first_b == (id * 5 % 256).toInt, s"doc $id first pixel")
    }
  }

  test("png pixel decode: zlib inflate + all five filters, vs an independent encoder") {
    // cross-check against the JDK's OWN png encoder (ImageIO — a codebase
    // with no shared code or filter choices with ours): decode must
    // recover exact channel sums and the top-left pixel
    val w = 7; val h = 5
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (11 * x + 3 * y) % 256
      val g = (5 * x + 17 * y) % 256
      val b = (7 * x + 13 * y + 101) % 256
      sr += r; sg += g; sb += b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val p = MultimodalOps.pngPixels(bos.toByteArray).get
    assert(p.width == w && p.height == h)
    assert((p.sum_r, p.sum_g, p.sum_b) == ((sr, sg, sb)))
    assert((p.first_r, p.first_g, p.first_b) == ((0, 0, 101)))
    // adversarial payloads are quarantined, not thrown
    assert(MultimodalOps.pngPixels("not a png at all".getBytes).isEmpty)
    assert(MultimodalOps.pngPixels(bos.toByteArray.take(30)).isEmpty) // truncated
    val corrupt = bos.toByteArray.clone()
    corrupt(60) = (corrupt(60) ^ 0x5a).toByte // garble inside IDAT
    assert(MultimodalOps.pngPixels(corrupt).isEmpty ||
      MultimodalOps.pngPixels(corrupt).isDefined) // never throws either way
    // the fixture adapter (filters cycling 0..4 across rows) round-trips
    val media = MultimodalOps.asPngPayload(spark, docs.limit(10), "doc_id")
    val decoded = MultimodalOps.extractPngPixels(spark, media)
      .collect().sortBy(_.doc_id)
    assert(decoded.length == 10)
    decoded.foreach { d =>
      val id = d.doc_id
      assert(d.width == 4 + (id % 5).toInt && d.height == 3 + (id % 4).toInt)
      assert(d.first_r == (id % 256).toInt && d.first_g == (id * 3 % 256).toInt
        && d.first_b == (id * 5 % 256).toInt, s"doc $id first pixel")
      val (esr, esg, esb) = {
        var (a, b2, c) = (0L, 0L, 0L)
        for (y <- 0 until d.height; x <- 0 until d.width) {
          a += ((id + 7L * x + 13L * y) % 256)
          b2 += ((id * 3 + 5L * x + 11L * y) % 256)
          c += ((id * 5 + 3L * x + 17L * y) % 256)
        }
        (a, b2, c)
      }
      assert((d.sum_r, d.sum_g, d.sum_b) == ((esr, esg, esb)), s"doc $id sums")
    }
  }

  test("png color types 0/3/6, sub-byte palettes, and Adam7 interlace match ImageIO exactly") {
    def pngBytes(bi: java.awt.image.BufferedImage, progressive: Boolean): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      if (progressive)
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(mos)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      mos.flush(); writer.dispose()
      bos.toByteArray
    }
    def check(bi: java.awt.image.BufferedImage, progressive: Boolean,
        label: String): Int = {
      val bytes = pngBytes(bi, progressive)
      val colorType = bytes(25) & 0xff // IHDR color type
      val interlaced = (bytes(28) & 0xff) == 1
      assert(interlaced == progressive, s"$label: interlace flag mismatch")
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val (w, h, rgb) = MultimodalOps.pngDecodeRgb(bytes)
        .getOrElse(fail(s"$label: decode failed (type $colorType)"))
      assert(w == ref.getWidth && h == ref.getHeight, label)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        if (colorType == 0 || colorType == 4) {
          // getRGB would colorspace-convert gray; compare the raw sample
          val g = ref.getRaster.getSample(x, y, 0)
          assert((rgb(o) & 0xff) == g && (rgb(o + 1) & 0xff) == g &&
            (rgb(o + 2) & 0xff) == g,
            s"$label: pixel ($x,$y) mismatch (type $colorType)")
        } else {
          val p = ref.getRGB(x, y)
          assert((rgb(o) & 0xff) == ((p >> 16) & 0xff) &&
            (rgb(o + 1) & 0xff) == ((p >> 8) & 0xff) &&
            (rgb(o + 2) & 0xff) == (p & 0xff),
            s"$label: pixel ($x,$y) mismatch (type $colorType)")
        }
      }
      colorType
    }
    val rnd = new scala.util.Random(11)
    import java.awt.image.BufferedImage
    // grayscale (type 0)
    val gray = new BufferedImage(23, 17, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 17; x <- 0 until 23)
      gray.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    assert(check(gray, progressive = false, "gray") == 0)
    // 256-color palette (type 3, depth 8)
    val idx = new BufferedImage(19, 13, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 13; x <- 0 until 19)
      idx.setRGB(x, y, rnd.nextInt() | 0xff000000)
    assert(check(idx, progressive = false, "palette8") == 3)
    // 4-color palette (type 3, sub-byte depth)
    val cmap = Array(0xff000000, 0xffff0000, 0xff00ff00, 0xff0000ff)
    val icm = new java.awt.image.IndexColorModel(2, 4,
      cmap.map(c => ((c >> 16) & 0xff).toByte),
      cmap.map(c => ((c >> 8) & 0xff).toByte),
      cmap.map(c => (c & 0xff).toByte))
    val bin = new BufferedImage(21, 9, BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until 9; x <- 0 until 21)
      bin.setRGB(x, y, cmap(rnd.nextInt(4)))
    assert(check(bin, progressive = false, "palette2bit") == 3)
    // RGBA (type 6): alpha dropped, RGB exact
    val argb = new BufferedImage(16, 11, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 11; x <- 0 until 16)
      argb.setRGB(x, y, (rnd.nextInt() & 0x00ffffff) | (rnd.nextInt(256) << 24))
    assert(check(argb, progressive = false, "rgba") == 6)
    // Adam7 interlace over truecolor AND grayscale (non-multiple-of-8
    // dims exercise the ragged passes)
    val rgbI = new BufferedImage(29, 22, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 22; x <- 0 until 29)
      rgbI.setRGB(x, y, rnd.nextInt() & 0xffffff)
    assert(check(rgbI, progressive = true, "adam7-rgb") == 2)
    val grayI = new BufferedImage(9, 30, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 30; x <- 0 until 9)
      grayI.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    assert(check(grayI, progressive = true, "adam7-gray") == 0)
    // 16-bit grayscale (colorType 0, depth 16, ImageIO-written): decodes
    // via the high byte of each big-endian sample pair — the standard
    // 16→8 downscale ImageIO's (sample >> 8) agrees with
    val deep = new BufferedImage(8, 8, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 8; x <- 0 until 8)
      deep.getRaster.setSample(x, y, 0, rnd.nextInt(65536))
    val deepOut = MultimodalOps.pngDecodeRgb(pngBytes(deep, progressive = false))
    assert(deepOut.isDefined, "16-bit grayscale PNG quarantined")
    val (dw, dh, dRgb) = deepOut.get
    assert((dw, dh) == (8, 8))
    for (y <- 0 until 8; x <- 0 until 8) {
      val expect = deep.getRaster.getSample(x, y, 0) >> 8
      assert((dRgb((y * 8 + x) * 3) & 0xff) == expect, s"16-bit gray ($x,$y)")
    }
    // 16-bit palette is not a legal PNG combination and must quarantine:
    // hand-corrupt a type-3 header's depth to 16
    val pal = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_INDEXED)
    val palBytes = pngBytes(pal, progressive = false)
    assert(MultimodalOps.pngDecodeRgb(palBytes).isDefined)
    val corrupt = palBytes.clone()
    // IHDR depth byte sits at offset 8 (sig) + 8 (len+type) + 8 (w,h)
    if ((corrupt(25) & 0xff) == 3) { // color type 3 where expected
      corrupt(24) = 16.toByte
      assert(MultimodalOps.pngDecodeRgb(corrupt).isEmpty,
        "16-bit palette must quarantine")
    }
  }

  test("16-bit truecolor png fixture decodes to the high-byte formula") {
    import graft.ops.MultimodalOps
    val ids = spark.range(0, 24).toDF("doc_id")
    val media = MultimodalOps.asPng16Payload(spark, ids, "doc_id")
    val rows = media.collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val w = 4 + (id % 5).toInt
      val h = 3 + (id % 4).toInt
      val out = MultimodalOps.pngDecodeRgb(bytes)
      assert(out.isDefined, s"doc $id quarantined")
      val (dw, dh, rgb) = out.get
      assert((dw, dh) == (w, h), s"doc $id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        assert((rgb(o) & 0xff) == ((id + 7L * x + 13L * y) % 256).toInt,
          s"doc $id R($x,$y)")
        assert((rgb(o + 1) & 0xff) == ((id * 3 + 5L * x + 11L * y) % 256).toInt,
          s"doc $id G($x,$y)")
        assert((rgb(o + 2) & 0xff) == ((id * 5 + 3L * x + 17L * y) % 256).toInt,
          s"doc $id B($x,$y)")
      }
    }
  }

  test("png decode matches ImageIO across 40 random images (seeded sweep)") {
    // randomized cross-check against the JDK's independent encoder:
    // dimensions 1..40 exercise single-pixel rows/columns and whatever
    // filter choices ImageIO makes per image; fixed seed keeps it
    // deterministic for CI
    val rnd = new scala.util.Random(20260814L)
    for (n <- 0 until 40) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var first = (0, 0, 0)
      for (y <- 0 until h; x <- 0 until w) {
        val r = rnd.nextInt(256); val g = rnd.nextInt(256); val b = rnd.nextInt(256)
        if (x == 0 && y == 0) first = (r, g, b)
        sr += r; sg += g; sb += b
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val p = MultimodalOps.pngPixels(bos.toByteArray)
        .getOrElse(fail(s"image $n (${w}x$h) not decoded"))
      assert(p.width == w && p.height == h, s"image $n")
      assert((p.sum_r, p.sum_g, p.sum_b) == ((sr, sg, sb)), s"image $n sums")
      assert((p.first_r, p.first_g, p.first_b) == first, s"image $n first px")
    }
  }

  test("tiff decode: fixture formula, both endians, multi-strip; ImageIO cross-check") {
    import graft.ops.MultimodalOps
    // own fixtures: every lane (II/MM endian, gray/RGB, multi-strip)
    val media = MultimodalOps.asTiffPayload(spark, docs.limit(24), "doc_id")
    media.collect().foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val w = 4 + (id % 5).toInt
      val h = 3 + (id % 4).toInt
      assert(MultimodalOps.imageDims(bytes).contains(("tiff", w, h)), s"doc $id dims")
      val (dw, dh, rgb) = MultimodalOps.tiffDecodeRgb(bytes)
        .getOrElse(fail(s"doc $id quarantined"))
      assert((dw, dh) == (w, h))
      val gray = id % 3 == 0
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val er = ((id + 7L * x + 13L * y) % 256).toInt
        assert((rgb(o) & 0xff) == er, s"doc $id R($x,$y)")
        val eg = if (gray) er else ((id * 3 + 5L * x + 11L * y) % 256).toInt
        assert((rgb(o + 1) & 0xff) == eg, s"doc $id G($x,$y)")
      }
    }
    // the JDK's OWN tiff writer (an unrelated implementation) must
    // round-trip through our decoder pixel-exact
    import java.awt.image.BufferedImage
    val rnd = new scala.util.Random(5150)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    assume(writers.hasNext, "JDK TIFF plugin absent")
    for (tpe <- Seq(BufferedImage.TYPE_INT_RGB, BufferedImage.TYPE_BYTE_GRAY)) {
      val img = new BufferedImage(9, 7, tpe)
      for (y <- 0 until 7; x <- 0 until 9)
        if (tpe == BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
        else img.setRGB(x, y, rnd.nextInt() & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "tiff", bos))
      val out = MultimodalOps.tiffDecodeRgb(bos.toByteArray)
      assert(out.isDefined, s"ImageIO tiff (type $tpe) quarantined")
      val (dw, dh, rgb) = out.get
      assert((dw, dh) == (9, 7))
      for (y <- 0 until 7; x <- 0 until 9) {
        val o = (y * 9 + x) * 3
        if (tpe == BufferedImage.TYPE_BYTE_GRAY) {
          // getRGB would gamma-convert linear gray to sRGB — the file
          // stores the RAW raster sample, which is what we decode
          val exp = img.getRaster.getSample(x, y, 0)
          assert((rgb(o) & 0xff) == exp, s"gray($x,$y)")
          assert((rgb(o + 1) & 0xff) == exp && (rgb(o + 2) & 0xff) == exp)
        } else {
          val exp = img.getRGB(x, y)
          assert((rgb(o) & 0xff) == ((exp >> 16) & 0xff), s"R($x,$y)")
          assert((rgb(o + 1) & 0xff) == ((exp >> 8) & 0xff), s"G($x,$y)")
          assert((rgb(o + 2) & 0xff) == (exp & 0xff), s"B($x,$y)")
        }
      }
    }
    // off-scope variants quarantine: flip a fixture's compression tag
    val sample = media.limit(1).collect().head.getAs[Array[Byte]](1)
    assert(MultimodalOps.tiffDecodeRgb(sample).isDefined)
    // IFD starts at byte 8: entry k sits at 10 + 12k; compression is the
    // 4th entry (tag 259) — its SHORT value field is at +8 of the entry
    val corrupt = sample.clone()
    val compEntry = 10 + 12 * 3 + 8
    corrupt(compEntry) = 7 // JPEG-in-TIFF: genuinely out of scope
    assert(MultimodalOps.tiffDecodeRgb(corrupt).isEmpty,
      "JPEG-compressed TIFF must quarantine")
  }

  test("tiff compressed decode: LZW/PackBits/Deflate × predictor, ImageIO cross-checks both ways") {
    import graft.ops.MultimodalOps
    // own fixtures: codec × endian × gray/RGB × predictor matrix, every
    // pixel against the generation formula
    val media = MultimodalOps.asTiffCompressedPayload(
      spark, docs.limit(28), "doc_id")
    val collected = media.collect()
    assert(collected.nonEmpty)
    collected.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val w = 4 + (id % 5).toInt
      val h = 3 + (id % 4).toInt
      val gray = id % 3 == 0
      val (dw, dh, rgb) = MultimodalOps.tiffDecodeRgb(bytes)
        .getOrElse(fail(s"doc $id (comp lane ${id % 7}) quarantined"))
      assert((dw, dh) == (w, h), s"doc $id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val er = ((id + 7L * x + 13L * y) % 256).toInt
        assert((rgb(o) & 0xff) == er, s"doc $id R($x,$y) comp=${id % 7}")
        val eg = if (gray) er else ((id * 3 + 5L * x + 11L * y) % 256).toInt
        assert((rgb(o + 1) & 0xff) == eg, s"doc $id G($x,$y) comp=${id % 7}")
        val eb = if (gray) er else ((id * 5 + 3L * x + 17L * y) % 256).toInt
        assert((rgb(o + 2) & 0xff) == eb, s"doc $id B($x,$y) comp=${id % 7}")
      }
      // the JDK's OWN tiff reader (an unrelated implementation) must
      // agree on our fixture bytes — this pins the LZW bitstream, the
      // early code-size change, PackBits packets, and the predictor to
      // the public spec, not to our decoder's private conventions
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (ref != null) {
        assert(ref.getWidth == w && ref.getHeight == h, s"doc $id ImageIO dims")
        for (y <- 0 until h; x <- 0 until w) {
          val o = (y * w + x) * 3
          if (gray)
            assert(ref.getRaster.getSample(x, y, 0) == (rgb(o) & 0xff),
              s"doc $id ImageIO gray($x,$y)")
          else {
            assert(ref.getRaster.getSample(x, y, 0) == (rgb(o) & 0xff),
              s"doc $id ImageIO R($x,$y)")
            assert(ref.getRaster.getSample(x, y, 1) == (rgb(o + 1) & 0xff),
              s"doc $id ImageIO G($x,$y)")
            assert(ref.getRaster.getSample(x, y, 2) == (rgb(o + 2) & 0xff),
              s"doc $id ImageIO B($x,$y)")
          }
        }
      }
    }
    // and the reverse: ImageIO's OWN compressed writers round-trip
    // through our decoder pixel-exact
    import java.awt.image.BufferedImage
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    assume(writers.hasNext, "JDK TIFF plugin absent")
    val writer = writers.next()
    val available = writer.getDefaultWriteParam.getCompressionTypes.toSeq
    val rnd = new scala.util.Random(31337)
    for {
      ctype <- Seq("LZW", "PackBits", "ZLib", "Deflate")
        .filter(available.contains)
      tpe <- Seq(BufferedImage.TYPE_INT_RGB, BufferedImage.TYPE_BYTE_GRAY)
    } {
      val img = new BufferedImage(33, 17, tpe)
      for (y <- 0 until 17; x <- 0 until 33)
        if (tpe == BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
        else img.setRGB(x, y, rnd.nextInt() & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(ctype)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close()
      val out = MultimodalOps.tiffDecodeRgb(bos.toByteArray)
      assert(out.isDefined, s"ImageIO $ctype tiff (type $tpe) quarantined")
      val (dw, dh, rgb) = out.get
      assert((dw, dh) == (33, 17))
      for (y <- 0 until 17; x <- 0 until 33) {
        val o = (y * 33 + x) * 3
        if (tpe == BufferedImage.TYPE_BYTE_GRAY) {
          val exp = img.getRaster.getSample(x, y, 0)
          assert((rgb(o) & 0xff) == exp, s"$ctype gray($x,$y)")
        } else {
          val exp = img.getRGB(x, y)
          assert((rgb(o) & 0xff) == ((exp >> 16) & 0xff), s"$ctype R($x,$y)")
          assert((rgb(o + 1) & 0xff) == ((exp >> 8) & 0xff), s"$ctype G($x,$y)")
          assert((rgb(o + 2) & 0xff) == (exp & 0xff), s"$ctype B($x,$y)")
        }
      }
    }
  }

  test("tiff deep matrix: 16-bit, tiled, planar=2 × codecs; ImageIO cross-checks") {
    import graft.ops.MultimodalOps
    val media = MultimodalOps.asTiffDeepPayload(spark, docs.limit(64), "doc_id")
    val collected = media.collect()
    assert(collected.nonEmpty)
    var imageioChecked = 0
    collected.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val lane = (id % 4).toInt
      val tiled = lane == 1 || lane == 3
      val bps = if (lane == 0 || lane == 3) 2 else 1
      val planar = if (lane == 2 || lane == 3) 2 else 1
      val w = (if (tiled) 20 else 4) + (id % 5).toInt
      val h = (if (tiled) 17 else 3) + (id % 3).toInt
      val gray = id % 3 == 0
      val (dw, dh, rgb) = MultimodalOps.tiffDecodeRgb(bytes)
        .getOrElse(fail(s"doc $id (lane $lane) quarantined"))
      assert((dw, dh) == (w, h), s"doc $id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val er = ((id + 7L * x + 13L * y) % 256).toInt
        assert((rgb(o) & 0xff) == er, s"doc $id lane=$lane R($x,$y)")
        val eg = if (gray) er else ((id * 3 + 5L * x + 11L * y) % 256).toInt
        assert((rgb(o + 1) & 0xff) == eg, s"doc $id lane=$lane G($x,$y)")
        val eb = if (gray) er else ((id * 5 + 3L * x + 17L * y) % 256).toInt
        assert((rgb(o + 2) & 0xff) == eb, s"doc $id lane=$lane B($x,$y)")
      }
      // independent-implementation pin where the JDK plugin can read the
      // variant (it declines some planar/depth combinations — that only
      // skips the comparison, never the formula assert above)
      val ref = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) catch { case _: Exception => null }
      if (ref != null && ref.getWidth == w && ref.getHeight == h) {
        imageioChecked += 1
        for (y <- 0 until h; x <- 0 until w) {
          val o = (y * w + x) * 3
          def refSample(band: Int): Int = {
            val s = ref.getRaster.getSample(x, y, band)
            if (bps == 2) s >> 8 else s
          }
          assert(refSample(0) == (rgb(o) & 0xff),
            s"doc $id lane=$lane ImageIO band0($x,$y)")
          if (!gray && ref.getRaster.getNumBands >= 3) {
            assert(refSample(1) == (rgb(o + 1) & 0xff),
              s"doc $id lane=$lane ImageIO band1($x,$y)")
            assert(refSample(2) == (rgb(o + 2) & 0xff),
              s"doc $id lane=$lane ImageIO band2($x,$y)")
          }
        }
      }
    }
    assert(imageioChecked > 0, "JDK TIFF plugin verified none of the fixtures")
    // reverse direction: the JDK's OWN tiled and 16-bit writers must
    // round-trip through our decoder
    import java.awt.image.BufferedImage
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    assume(writers.hasNext, "JDK TIFF plugin absent")
    val writer = writers.next()
    val rnd = new scala.util.Random(8086)
    def writeTiff(img: BufferedImage, tile: Boolean, ctype: Option[String])
        : Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val p = writer.getDefaultWriteParam
      ctype.foreach { ct =>
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionType(ct)
      }
      if (tile) {
        p.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setTiling(16, 16, 0, 0)
      }
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close()
      bos.toByteArray
    }
    // tiled RGB, uncompressed and LZW
    for (ctype <- Seq(None, Some("LZW"))) {
      val img = new BufferedImage(37, 21, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 21; x <- 0 until 37)
        img.setRGB(x, y, rnd.nextInt() & 0xffffff)
      val out = MultimodalOps.tiffDecodeRgb(writeTiff(img, tile = true, ctype))
      assert(out.isDefined, s"ImageIO tiled tiff ($ctype) quarantined")
      val (dw, dh, rgb) = out.get
      assert((dw, dh) == (37, 21))
      for (y <- 0 until 21; x <- 0 until 37) {
        val o = (y * 37 + x) * 3
        val exp = img.getRGB(x, y)
        assert((rgb(o) & 0xff) == ((exp >> 16) & 0xff), s"tiled $ctype R($x,$y)")
        assert((rgb(o + 2) & 0xff) == (exp & 0xff), s"tiled $ctype B($x,$y)")
      }
    }
    // 16-bit grayscale (the scanner depth), striped
    val img16 = new BufferedImage(11, 9, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 9; x <- 0 until 11)
      img16.getRaster.setSample(x, y, 0, rnd.nextInt(65536))
    val out16 = MultimodalOps.tiffDecodeRgb(
      writeTiff(img16, tile = false, ctype = None))
    assert(out16.isDefined, "ImageIO 16-bit tiff quarantined")
    val (dw16, dh16, rgb16) = out16.get
    assert((dw16, dh16) == (11, 9))
    for (y <- 0 until 9; x <- 0 until 11) {
      val exp = img16.getRaster.getSample(x, y, 0) >> 8
      assert((rgb16((y * 11 + x) * 3) & 0xff) == exp, s"16-bit gray($x,$y)")
    }
  }

  test("tiff palette + WhiteIsZero photometrics decode and match ImageIO") {
    import graft.ops.MultimodalOps
    val media = MultimodalOps.asTiffPalettePayload(spark, docs.limit(32), "doc_id")
    var imageioChecked = 0
    media.collect().foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val pal = id % 2 == 0
      val w = 4 + (id % 5).toInt
      val h = 3 + (id % 4).toInt
      val (dw, dh, rgb) = MultimodalOps.tiffDecodeRgb(bytes)
        .getOrElse(fail(s"doc $id quarantined"))
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val f = ((id + 7L * x + 13L * y) % 256).toInt
        val (er, eg, eb) =
          if (pal) ((5 * f + 1) % 256, (3 * f + 7) % 256, (11 * f + 13) % 256)
          else (f, f, f)
        assert((rgb(o) & 0xff) == er, s"doc $id R($x,$y)")
        assert((rgb(o + 1) & 0xff) == eg, s"doc $id G($x,$y)")
        assert((rgb(o + 2) & 0xff) == eb, s"doc $id B($x,$y)")
      }
      val ref = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) catch { case _: Exception => null }
      if (ref != null && ref.getWidth == w) {
        imageioChecked += 1
        for (y <- 0 until h; x <- 0 until w) {
          val o = (y * w + x) * 3
          if (pal) {
            // palette surfaces through getRGB (the color model applies
            // the map — no gamma, IndexColorModel is sRGB-direct)
            val exp = ref.getRGB(x, y)
            assert(((exp >> 16) & 0xff) == (rgb(o) & 0xff),
              s"doc $id ImageIO R($x,$y)")
            assert((exp & 0xff) == (rgb(o + 2) & 0xff),
              s"doc $id ImageIO B($x,$y)")
          } else {
            // WhiteIsZero: the reader inverts during decode; compare the
            // RAW raster sample (getRGB would gamma-convert linear gray)
            assert(ref.getRaster.getSample(x, y, 0) == (rgb(o) & 0xff),
              s"doc $id ImageIO gray($x,$y)")
          }
        }
      }
    }
    assert(imageioChecked > 0, "JDK TIFF plugin verified none of the fixtures")
  }

  test("mp4 codec triage: avc1 SPS parse, mp4a params, hvc1 identification") {
    import graft.ops.MultimodalOps
    val media = MultimodalOps.asCodecMp4Payload(spark, docs.limit(64), "doc_id")
    media.collect().foreach { r =>
      val id = r.getLong(0)
      val info = MultimodalOps.mp4CodecInfo(r.getAs[Array[Byte]](1))
        .getOrElse(fail(s"doc $id triage failed"))
      if (id % 3 == 0) {
        assert(info.codec == "mp4a")
        assert(info.profile == 2, "esds AudioSpecificConfig aot = AAC LC")
        assert(info.audio_channels == 1 + (id % 2).toInt)
        assert(info.audio_rate ==
          Seq(8000, 16000, 22050, 44100, 48000)((id / 3 % 5).toInt))
      } else if (id % 7 == 0) {
        assert(info.codec == "hvc1" && info.profile == -1)
      } else {
        assert(info.codec == "avc1")
        assert(info.profile == Seq(66, 77, 100)((id / 4 % 3).toInt), s"doc $id")
        assert(info.level == Seq(30, 31, 40, 41)((id % 4).toInt))
        assert(info.coded_width ==
          (20 + (id % 3).toInt) * 16 - 2 * ((id % 3).toInt - 1), s"doc $id w")
        assert(info.coded_height ==
          (15 + (id % 2).toInt) * 16 - 2 * (id % 2).toInt, s"doc $id h")
      }
    }
    // negatives: a scaling-matrix SPS quarantines (out of scope, never
    // mis-parsed); truncated and garbage NALs quarantine
    assert(MultimodalOps.parseSps(Array(0x67, 0x42).map(_.toByte)).isEmpty)
    assert(MultimodalOps.parseSps(Array[Byte](0x01, 0x02, 0x03, 0x04)).isEmpty)
    // profile 100 with seq_scaling_matrix_present_flag = 1: bytes built
    // by hand — profile 0x64, constraints 0, level 0x1e, then ue(0),
    // ue(1), ue(0), ue(0), bypass 0, scaling 1 …
    val scaling = {
      val bits = "0110 0100" + "0000 0000" + "0001 1110" + // 100, 0, 30
        "1" + "010" + "1" + "1" + "0" + "1" + "1111" // spsid, chroma=1, bd, bd, bypass, SCALING=1, pad
      val clean = bits.replace(" ", "")
      val bytes = clean.grouped(8).map(g =>
        Integer.parseInt((g + "0000000").take(8), 2).toByte).toArray
      Array(0x67.toByte) ++ bytes
    }
    assert(MultimodalOps.parseSps(scaling).isEmpty,
      "scaling-matrix SPS must quarantine")
  }

  test("avif/heic triage: brand dispatch, ispe walk, classify, negatives") {
    import graft.ops.MultimodalOps
    val media = MultimodalOps.asAvifHeicPayload(spark, docs.limit(24), "doc_id")
    media.collect().foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val m = MultimodalOps.avifHeicMeta(bytes)
        .getOrElse(fail(s"doc $id triage failed"))
      assert(m.format == (if (id % 2 == 0) "avif" else "heic"))
      assert((m.width, m.height) ==
        ((64 + (id % 1000).toInt, 48 + (id % 800).toInt)))
      // the ledger tags the IMAGE brand (quarantined — no AV1/HEVC
      // decode), never mp4
      assert(MultimodalOps.decodeStatusOf(bytes) == ((m.format, false)))
      // truncation sweep never throws
      for (cut <- 0 until bytes.length by 9)
        MultimodalOps.avifHeicMeta(bytes.take(cut))
    }
    // a genuine MP4 still routes to the video arm
    val mp4 = MultimodalOps.asMp4Payload(spark, docs.limit(2), "doc_id", "text")
      .collect()(0).getAs[Array[Byte]](1)
    assert(MultimodalOps.decodeStatusOf(mp4) == (("mp4", true)))
    // missing ispe → None (classify still tags the brand)
    val noIspe = media.collect()(0).getAs[Array[Byte]](1).take(24) // ftyp only
    assert(MultimodalOps.avifHeicMeta(noIspe).isEmpty)
  }

  test("flac/mp3 triage: packed-field parse, classify branches, negatives") {
    import graft.ops.MultimodalOps
    val flac = MultimodalOps.asFlacPayload(spark, docs.limit(12), "doc_id")
      .collect()
    flac.foreach { r =>
      val id = r.getLong(0)
      val m = MultimodalOps.flacMeta(r.getAs[Array[Byte]](1))
        .getOrElse(fail(s"flac $id quarantined"))
      assert(m.sample_rate ==
        Seq(8000, 16000, 22050, 44100, 48000, 96000)((id % 6).toInt))
      assert(m.channels == 1 + (id % 2).toInt)
      assert(m.bits == Seq(16, 24)((id / 2 % 2).toInt))
      assert(m.data_bytes == 10 + id % 50)
      // classify lane: decoded now means FULL frame decode — this
      // triage fixture carries STREAMINFO + opaque bytes, so it
      // format-tags but QUARANTINES (honest ledger semantics)
      assert(MultimodalOps.decodeStatusOf(r.getAs[Array[Byte]](1)) ==
        ("flac", false))
    }
    // a full FLAC stream (frames + CRCs) classifies AND decodes
    val full = graft.ops.FlacEncoder.encode(
      Array(Array.tabulate(64)(i => i * 3 - 90)), 16000, 16, 0, 2)
    assert(MultimodalOps.decodeStatusOf(full) == ("flac", true))
    val mp3 = MultimodalOps.asMp3Payload(spark, docs.limit(12), "doc_id")
      .collect()
    mp3.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val m = MultimodalOps.mp3Meta(bytes).getOrElse(fail(s"mp3 $id"))
      assert(m.sample_rate == Seq(44100, 48000, 32000)((id % 3).toInt))
      assert(m.channels == (if (id % 2 == 1) 1 else 2))
      assert(m.data_bytes == 100 + id % 200)
      assert(MultimodalOps.decodeStatusOf(bytes) == ("mp3", true))
    }
    // negatives: truncated STREAMINFO, wrong first-block type, a
    // free-format MP3 header, and a reserved version all quarantine
    val f0 = flac.head.getAs[Array[Byte]](1)
    assert(MultimodalOps.flacMeta(f0.take(20)).isEmpty)
    val wrongType = f0.clone(); wrongType(4) = 4 // first block not STREAMINFO
    assert(MultimodalOps.flacMeta(wrongType).isEmpty)
    assert(MultimodalOps.mp3Meta(Array(0xff, 0xfb, 0x00, 0x00)
      .map(_.toByte)).isEmpty) // bitrate idx 0 = free format
    assert(MultimodalOps.mp3Meta(Array(0xff, 0xeb, 0x10, 0x00)
      .map(_.toByte)).isEmpty) // reserved version
  }

  test("bmp variants: 8-bit palette, RLE8, 32-bit BGRX; ImageIO cross-checks both ways") {
    import graft.ops.MultimodalOps
    val media = MultimodalOps.asBmpVariantPayload(spark, docs.limit(36), "doc_id")
    var imageioChecked = 0
    media.collect().foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val lane = (id % 3).toInt
      val w = 4 + (id % 5).toInt
      val h = 3 + (id % 4).toInt
      val px = MultimodalOps.bmpPixels(bytes)
        .getOrElse(fail(s"bmp doc $id (lane $lane) quarantined"))
      assert((px.width, px.height) == (w, h), s"doc $id dims")
      def expected(x: Int, y: Int): (Int, Int, Int) = {
        val f = ((id + 7L * x + 13L * y) % 256).toInt
        if (lane == 2)
          (f, ((id * 3 + 5L * x + 11L * y) % 256).toInt,
            ((id * 5 + 3L * x + 17L * y) % 256).toInt)
        else ((5 * f + 1) % 256, (3 * f + 7) % 256, (11 * f + 13) % 256)
      }
      val (er, eg, eb) = expected(0, 0)
      assert((px.first_r, px.first_g, px.first_b) == ((er, eg, eb)),
        s"doc $id lane=$lane first pixel")
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r0, g0, b0) = expected(x, y)
        sr += r0; sg += g0; sb += b0
      }
      assert((px.sum_r, px.sum_g, px.sum_b) == ((sr, sg, sb)),
        s"doc $id lane=$lane sums")
      // the JDK's BMP plugin must agree on the same bytes
      val ref = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) catch { case _: Exception => null }
      if (ref != null && ref.getWidth == w) {
        imageioChecked += 1
        for (y <- 0 until h; x <- 0 until w) {
          val (r0, g0, b0) = expected(x, y)
          val exp = ref.getRGB(x, y)
          assert(((exp >> 16) & 0xff, (exp >> 8) & 0xff, exp & 0xff) ==
            ((r0, g0, b0)), s"doc $id lane=$lane ImageIO ($x,$y)")
        }
      }
    }
    assert(imageioChecked > 0, "JDK BMP plugin verified none of the fixtures")
    // adversarial headers QUARANTINE, never crash: a negative data
    // offset on the RLE8 path, a near-MaxInt biSize that would wrap the
    // palette offset negative, and a total-pixel bomb (w*h overflow /
    // multi-GiB RLE output from a 40-byte payload)
    val rle = MultimodalOps.asBmpVariantPayload(
      spark, docs.filter(col("doc_id") % 3 === 1).limit(1), "doc_id")
      .collect().head.getAs[Array[Byte]](1)
    def patched(at: Int, v: Array[Byte]): Array[Byte] = {
      val c = rle.clone(); System.arraycopy(v, 0, c, at, v.length); c
    }
    assert(MultimodalOps.bmpPixels(
      patched(10, Array(0xff, 0xff, 0xff, 0xff).map(_.toByte))).isEmpty,
      "negative bfOffBits must quarantine")
    assert(MultimodalOps.bmpPixels(
      patched(14, Array(0xf6, 0xff, 0xff, 0x7f).map(_.toByte))).isEmpty,
      "palette-offset Int wrap must quarantine")
    assert(MultimodalOps.bmpPixels(patched(18,
      Array[Byte](0, 0x10, 0, 0, /* w=4096 */ 0x01, 0x10, 0, 0))).isEmpty,
      "total-pixel bomb must quarantine")
    // reverse: ImageIO's OWN BI_RLE8 writer round-trips through our decoder
    import java.awt.image.BufferedImage
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("bmp")
    assume(writers.hasNext, "JDK BMP plugin absent")
    val writer = writers.next()
    val available = writer.getDefaultWriteParam.getCompressionTypes.toSeq
    if (available.contains("BI_RLE8")) {
      val pal = Array.tabulate(256)(i =>
        (((5 * i + 1) % 256) << 16) | (((3 * i + 7) % 256) << 8) | ((11 * i + 13) % 256))
      val icm = new java.awt.image.IndexColorModel(
        8, 256, pal, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
      val rnd = new scala.util.Random(777)
      val img = new BufferedImage(23, 11, BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until 11; x <- 0 until 23)
        img.getRaster.setSample(x, y, 0,
          if (rnd.nextBoolean()) rnd.nextInt(256) else 42) // runs + literals
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType("BI_RLE8")
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close()
      val out = MultimodalOps.bmpPixels(bos.toByteArray)
      assert(out.isDefined, "ImageIO BI_RLE8 bmp quarantined")
      val px = out.get
      assert((px.width, px.height) == (23, 11))
      val exp0 = img.getRGB(0, 0)
      assert(px.first_r == ((exp0 >> 16) & 0xff) && px.first_b == (exp0 & 0xff))
      var sr = 0L
      for (y <- 0 until 11; x <- 0 until 23) sr += (img.getRGB(x, y) >> 16) & 0xff
      assert(px.sum_r == sr, "RLE8 channel sum diverges from ImageIO's pixels")
    }
  }

  test("pnm decode: P5/P6, 8/16-bit, comment-salted headers, negatives") {
    import graft.ops.MultimodalOps
    MultimodalOps.asPnmPayload(spark, docs.limit(40), "doc_id")
      .collect().foreach { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        val gray = id % 3 == 0
        val px = MultimodalOps.pnmPixels(bytes)
          .getOrElse(fail(s"pnm doc $id quarantined"))
        assert((px.width, px.height) == (w, h), s"doc $id dims")
        assert(px.first_r == (id % 256).toInt, s"doc $id first_r")
        assert(px.first_g ==
          (if (gray) (id % 256) else (id * 3 % 256)).toInt, s"doc $id first_g")
        var sr = 0L
        for (y <- 0 until h; x <- 0 until w) sr += ((id + 7L * x + 13L * y) % 256)
        assert(px.sum_r == sr, s"doc $id sum_r")
        assert(MultimodalOps.decodeStatusOf(bytes) == ("pnm", true))
      }
    // negatives: ASCII formats, odd maxvals, truncated rasters, and a
    // text doc that merely starts with P6 all quarantine
    assert(MultimodalOps.pnmPixels("P3\n2 2\n255\n0 0 0".getBytes).isEmpty)
    assert(MultimodalOps.pnmPixels(
      ("P5\n2 2\n1023\n" + " " * 8).getBytes("ISO-8859-1")).isEmpty)
    assert(MultimodalOps.pnmPixels("P6\n4 4\n255\nxx".getBytes).isEmpty)
    assert(MultimodalOps.decodeStatusOf(
      "P6 is a netpbm magic inside prose".getBytes) == ("pnm", false))
  }

  test("ico decode: largest-member selection, DIB doubled-height unwrap, PNG members") {
    import graft.ops.MultimodalOps
    MultimodalOps.asIcoPayload(spark, docs.limit(24), "doc_id")
      .collect().foreach { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = 1 + (id % 3).toInt
        val w = 4 + (n - 1) * 4 + (id % 5).toInt
        val h = 3 + (n - 1) * 4 + (id % 4).toInt
        val pal8 = id % 2 == 1
        val px = MultimodalOps.icoPixels(bytes)
          .getOrElse(fail(s"ico doc $id quarantined"))
        assert(px.n_members == n && px.member_format == "dib")
        assert((px.width, px.height) == (w, h),
          s"doc $id picked the wrong member")
        def expected(x: Int, y: Int): (Int, Int, Int) = {
          val f = ((id + 7L * x + 13L * y) % 256).toInt
          if (pal8) ((5 * f + 1) % 256, (3 * f + 7) % 256, (11 * f + 13) % 256)
          else (f, ((id * 3 + 5L * x + 11L * y) % 256).toInt,
            ((id * 5 + 3L * x + 17L * y) % 256).toInt)
        }
        val (er, eg, eb) = expected(0, 0)
        assert((px.first_r, px.first_g, px.first_b) == ((er, eg, eb)),
          s"doc $id first pixel (flip or mask bug)")
        var sr = 0L
        for (y <- 0 until h; x <- 0 until w) sr += expected(x, y)._1
        assert(px.sum_r == sr, s"doc $id sum_r")
        assert(MultimodalOps.decodeStatusOf(bytes) == ("ico", true))
      }
    // a PNG member (the modern favicon layout) delegates to the PNG
    // decoder — built with ImageIO's own PNG writer
    val img = new java.awt.image.BufferedImage(
      9, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(99)
    for (y <- 0 until 7; x <- 0 until 9) img.setRGB(x, y, rnd.nextInt() & 0xffffff)
    val pngBos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", pngBos))
    val png = pngBos.toByteArray
    val ico = java.nio.ByteBuffer.allocate(6 + 16 + png.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ico.putShort(0); ico.putShort(1); ico.putShort(1)
    ico.put(9.toByte).put(7.toByte).put(0.toByte).put(0.toByte)
    ico.putShort(1); ico.putShort(32)
    ico.putInt(png.length); ico.putInt(22)
    ico.put(png)
    val out = MultimodalOps.icoPixels(ico.array())
      .getOrElse(fail("png-member ico quarantined"))
    assert(out.member_format == "png" && (out.width, out.height) == ((9, 7)))
    assert(out.first_r == ((img.getRGB(0, 0) >> 16) & 0xff))
    // negatives: cursors (type 2) and truncated directories quarantine
    val cur = ico.array().clone(); cur(2) = 2
    assert(MultimodalOps.icoPixels(cur).isEmpty)
    assert(MultimodalOps.icoPixels(ico.array().take(12)).isEmpty)
  }

  test("tga decode: truecolor/gray × RLE × origin, id-field skip, negatives") {
    import graft.ops.MultimodalOps
    MultimodalOps.asTgaPayload(spark, docs.limit(40), "doc_id")
      .collect().foreach { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val lane = (id % 4).toInt
        val gray = lane == 1 || lane == 3
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        val px = MultimodalOps.tgaPixels(bytes)
          .getOrElse(fail(s"tga doc $id (lane $lane) quarantined"))
        assert((px.width, px.height) == (w, h), s"doc $id dims")
        assert(px.first_r == (id % 256).toInt, s"doc $id first_r")
        assert(px.first_g ==
          (if (gray) (id % 256) else (id * 3 % 256)).toInt, s"doc $id first_g")
        var sr = 0L; var sg = 0L
        for (y <- 0 until h; x <- 0 until w) {
          sr += (id + 7L * x + 13L * y) % 256
          sg += (if (gray) (id + 7L * x + 13L * y) else (id * 3 + 5L * x + 11L * y)) % 256
        }
        assert(px.sum_r == sr, s"doc $id lane=$lane sum_r")
        assert(px.sum_g == sg, s"doc $id lane=$lane sum_g")
      }
    // negatives: palette type, odd depth, truncated RLE stream
    val ok = MultimodalOps.asTgaPayload(spark, docs.limit(4), "doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .find(_._1 % 4 >= 2).get._2 // an RLE doc
    assert(MultimodalOps.tgaPixels(ok.dropRight(3)).isEmpty,
      "truncated RLE must quarantine")
    val paletted = ok.clone(); paletted(1) = 1; paletted(2) = 1
    assert(MultimodalOps.tgaPixels(paletted).isEmpty)
    val odd = ok.clone(); odd(16) = 15
    assert(MultimodalOps.tgaPixels(odd).isEmpty)
    // descriptor bit 4 (right-to-left pixel order): a 2x1 truecolor image
    // stored [red, blue] with bit 4 set must report blue as the leftmost
    // pixel — the orientation probe (first_*) flips, the sums do not
    val rtl = java.nio.ByteBuffer.allocate(18 + 6)
    rtl.put(0.toByte).put(0.toByte).put(2.toByte) // no id, no map, truecolor
    rtl.put(new Array[Byte](9))                   // map spec + origin
    rtl.putShort(java.lang.Short.reverseBytes(2)) // w=2 (LE)
    rtl.putShort(java.lang.Short.reverseBytes(1)) // h=1 (LE)
    rtl.put(24.toByte).put((0x20 | 0x10).toByte)  // top-down + right-to-left
    rtl.put(Array[Byte](0, 0, 255.toByte))        // stored px0: BGR red
    rtl.put(Array[Byte](255.toByte, 0, 0))        // stored px1: BGR blue
    val flipped = MultimodalOps.tgaPixels(rtl.array())
      .getOrElse(fail("right-to-left tga quarantined"))
    assert((flipped.first_r, flipped.first_g, flipped.first_b) == ((0, 0, 255)),
      "bit-4 image must decode mirrored: leftmost pixel is the stored-last one")
    assert((flipped.sum_r, flipped.sum_b) == ((255L, 255L)))
    // same bytes without bit 4: leftmost pixel is the stored-first (red)
    val ltr = rtl.array().clone(); ltr(17) = 0x20
    val straight = MultimodalOps.tgaPixels(ltr).get
    assert((straight.first_r, straight.first_b) == ((255, 0)))
  }

  test("adversarial header battery: ico/pnm/tga never throw, bombs quarantine") {
    import graft.ops.MultimodalOps
    // the same discipline the BMP decoder got in round 10: every byte
    // prefix and every single-byte mutation either decodes or returns
    // None — a task failure or a giant allocation is a corpus outage
    val pnm = MultimodalOps.asPnmPayload(spark, docs.limit(6), "doc_id")
      .collect().map(_.getAs[Array[Byte]](1))
    val ico = MultimodalOps.asIcoPayload(spark, docs.limit(6), "doc_id")
      .collect().map(_.getAs[Array[Byte]](1))
    val tga = MultimodalOps.asTgaPayload(spark, docs.limit(6), "doc_id")
      .collect().map(_.getAs[Array[Byte]](1))
    def battery(name: String, payloads: Array[Array[Byte]],
        decode: Array[Byte] => Option[_]): Unit = {
      payloads.foreach { p =>
        assert(decode(p).isDefined, s"$name baseline must decode")
        // truncation sweep: every prefix quarantines or decodes, no throw
        var cut = 0
        while (cut < p.length) {
          decode(p.take(cut))
          cut += math.max(1, p.length / 37)
        }
        // mutation sweep: header region byte flips never escape
        for (at <- 0 until math.min(p.length, 64)) {
          val m = p.clone(); m(at) = (m(at) ^ 0xa5).toByte
          decode(m)
        }
      }
    }
    battery("pnm", pnm, MultimodalOps.pnmPixels)
    battery("ico", ico, MultimodalOps.icoPixels)
    battery("tga", tga, MultimodalOps.tgaPixels)
    // dimension bombs: a 300M-pixel header on a tiny payload must
    // quarantine BEFORE allocating (guards, not OOM)
    val pnmBomb = "P6 20000 20000 255\n".getBytes ++ Array.fill[Byte](64)(1)
    assert(MultimodalOps.pnmPixels(pnmBomb).isEmpty)
    val tgaBomb = tga(0).clone()
    tgaBomb(12) = 0xff.toByte; tgaBomb(13) = 0x7f.toByte // w = 32767
    tgaBomb(14) = 0xff.toByte; tgaBomb(15) = 0x7f.toByte // h = 32767
    assert(MultimodalOps.tgaPixels(tgaBomb).isEmpty)
    // ico: directory entry pointing past the payload (offset wrap)
    val icoWrap = ico(0).clone()
    if (icoWrap.length > 21) {
      icoWrap(18) = 0xff.toByte; icoWrap(19) = 0xff.toByte
      icoWrap(20) = 0xff.toByte; icoWrap(21) = 0x7f.toByte
      MultimodalOps.icoPixels(icoWrap) // None or decode — never throws
    }
  }

  test("mp3 VBR duration: Xing frame count wins over the CBR estimate; VBRI parses") {
    import graft.ops.MultimodalOps
    // hand-built MPEG1 Layer III mono frame (44100 Hz, bitrate idx 9)
    def frame(extra: Array[Byte], pad: Int): Array[Byte] =
      Array(0xff, 0xfb, 0x90, 0xc0).map(_.toByte) ++ extra ++
        Array.fill[Byte](pad)(7)
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    // Xing after the 17-byte mono side info, frames flag set
    val xing = frame(Array.fill[Byte](17)(0) ++ "Xing".getBytes ++
      be32(1) ++ be32(250), 64)
    val mx = MultimodalOps.mp3Meta(xing).get
    assert(math.abs(mx.duration_ms - 250 * 1152.0 / 44100 * 1000.0) < 1e-9)
    // same bytes without the tag: CBR byte estimate
    val cbr = frame(Array.fill[Byte](33)(0), 64)
    val mc = MultimodalOps.mp3Meta(cbr).get
    assert(math.abs(mc.duration_ms -
      cbr.length * 8.0 / (128 * 1000.0) * 1000.0) < 1e-9)
    // VBRI sits at frame start + 36 regardless of mode
    val vbri = frame(Array.fill[Byte](32)(0) ++ "VBRI".getBytes ++
      Array.fill[Byte](10)(0) ++ be32(99) ++ Array.fill[Byte](4)(0), 32)
    val mv = MultimodalOps.mp3Meta(vbri).get
    assert(math.abs(mv.duration_ms - 99 * 1152.0 / 44100 * 1000.0) < 1e-9)
    // Xing with frames flag CLEAR falls back to CBR
    val noFrames = frame(Array.fill[Byte](17)(0) ++ "Xing".getBytes ++
      be32(2) ++ be32(250), 64)
    val mn = MultimodalOps.mp3Meta(noFrames).get
    assert(math.abs(mn.duration_ms -
      noFrames.length * 8.0 / (128 * 1000.0) * 1000.0) < 1e-9)
  }

  test("gif pixel decode: from-scratch LZW vs the JDK's independent encoder") {
    // ImageIO's GIF writer is an unrelated LZW implementation: feed it an
    // INDEXED image with an explicit palette (no quantization/dither) and
    // our decoder must recover exact channel sums and the top-left pixel
    val pal = Array.tabulate(256)(i =>
      (((5 * i + 1) % 256) << 16) | (((3 * i + 7) % 256) << 8) | ((11 * i + 13) % 256))
    val icm = new java.awt.image.IndexColorModel(
      8, 256, pal, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val rnd = new scala.util.Random(424242L)
    for (n <- 0 until 20) {
      val w = 1 + rnd.nextInt(48)
      val h = 1 + rnd.nextInt(32)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var first = (0, 0, 0)
      for (y <- 0 until h; x <- 0 until w) {
        val i = rnd.nextInt(256)
        val (r, g, b) = ((5 * i + 1) % 256, (3 * i + 7) % 256, (11 * i + 13) % 256)
        if (x == 0 && y == 0) first = (r, g, b)
        sr += r; sg += g; sb += b
        img.getRaster.setSample(x, y, 0, i)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", bos))
      val p = MultimodalOps.gifPixels(bos.toByteArray)
        .getOrElse(fail(s"gif $n (${w}x$h) not decoded"))
      assert(p.width == w && p.height == h, s"gif $n")
      assert((p.sum_r, p.sum_g, p.sum_b) == ((sr, sg, sb)), s"gif $n sums")
      assert((p.first_r, p.first_g, p.first_b) == first, s"gif $n first px")
    }
    // and the reverse direction: OUR encoder read by the JDK's decoder
    val media = MultimodalOps.asGifPayload(spark, docs.limit(10), "doc_id")
    media.collect().foreach { row =>
      val id = row.getLong(0)
      val bytes = row.getAs[Array[Byte]](1)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: ImageIO cannot read our GIF")
      val w = 16 + (id % 17).toInt; val h = 12 + (id % 13).toInt
      assert(img.getWidth == w && img.getHeight == h, s"doc $id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val idx = ((id + 7L * x + 13L * y) % 256).toInt
        val expected = (0xff << 24) | (((5 * idx + 1) % 256) << 16) |
          (((3 * idx + 7) % 256) << 8) | ((11 * idx + 13) % 256)
        assert(img.getRGB(x, y) == expected, s"doc $id px ($x,$y)")
      }
    }
    // fixture round-trip through our own decoder
    val decoded = MultimodalOps.extractGifPixels(spark, media)
      .collect().sortBy(_.doc_id)
    assert(decoded.length == 10)
    decoded.foreach { d =>
      val id = d.doc_id
      assert(d.width == 16 + (id % 17).toInt && d.height == 12 + (id % 13).toInt)
      val i0 = (id % 256).toInt
      assert((d.first_r, d.first_g, d.first_b) ==
        (((5 * i0 + 1) % 256, (3 * i0 + 7) % 256, (11 * i0 + 13) % 256)),
        s"doc $id first pixel")
    }
    // adversarial payloads are quarantined, never thrown
    assert(MultimodalOps.gifPixels("GIF89a but not really".getBytes).isEmpty)
    val ok = media.limit(1).collect()(0).getAs[Array[Byte]](1)
    assert(MultimodalOps.gifPixels(ok.take(40)).isEmpty) // truncated
    val corrupt = ok.clone()
    corrupt(800) = (corrupt(800) ^ 0x5a).toByte // garble inside LZW data
    MultimodalOps.gifPixels(corrupt) // must not throw (either outcome ok)
  }

  test("image container headers parse real dimensions (no codec needed)") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // PNG: signature + IHDR chunk (len, "IHDR", width=640, height=480)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++ Array[Byte](8, 6, 0, 0, 0)
    assert(MultimodalOps.imageDims(png).contains(("png", 640, 480)))

    // GIF89a: little-endian logical screen 320x200
    val gif = "GIF89a".getBytes ++ Array[Byte](0x40, 0x01, 0xc8.toByte, 0x00, 0, 0, 0, 0)
    assert(MultimodalOps.imageDims(gif).contains(("gif", 320, 200)))

    // BMP: "BM" + 16 bytes + LE width=800 at 18, LE height=-600 at 22 (top-down)
    val bmp = "BM".getBytes ++ Array.fill[Byte](16)(0) ++
      Array[Byte](0x20, 0x03, 0, 0) ++ be32(-600).reverse ++ Array.fill[Byte](4)(0)
    assert(MultimodalOps.imageDims(bmp).contains(("bmp", 800, 600)))

    // JPEG: SOI, APP0 (len 4), SOF0 (len 17: precision + h=1080 + w=1920 ...)
    val jpeg = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x11, 0x08,
      0x04, 0x38, // height 1080
      0x07, 0x80, // width 1920
      0x03, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    assert(MultimodalOps.imageDims(jpeg).contains(("jpeg", 1920, 1080)))

    // JPEG with 0xFF fill bytes between segments (legal padding) — the
    // fill byte must be skipped, not parsed as a marker with a length
    val jpegPadded = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xe0, 0x00, 0x04,
      0x00, 0x00, 0xff, 0xff, 0xc0, 0x00, 0x11, 0x08,
      0x04, 0x38, 0x07, 0x80,
      0x03, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    assert(MultimodalOps.imageDims(jpegPadded).contains(("jpeg", 1920, 1080)))

    // non-image bytes → None (stub path)
    assert(MultimodalOps.imageDims("hello world plain text".getBytes).isEmpty)

    // end-to-end through the partition-parallel extractor
    import spark.implicits._
    val mixed = Seq((1L, png), (2L, jpeg), (3L, "plain".getBytes))
      .toDF("doc_id", "payload")
    val metas = MultimodalOps.extractMeta(spark, mixed).collect().sortBy(_.doc_id)
    assert(metas.map(m => (m.format, m.width, m.height)).toSeq ==
      Seq(("png", 640, 480), ("jpeg", 1920, 1080), ("raw", metas(2).width, metas(2).height)))
  }

  test("WAV headers parse via chunk walk: canonical, reordered, invalid") {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def fmtChunk(ch: Int, rate: Int, bits: Int) =
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
        le32(rate * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits)
    val data = Array.fill[Byte](1000)(7)
    // canonical 44-byte layout: RIFF/WAVE + fmt + data
    val wav = "RIFF".getBytes ++ le32(36 + 1000) ++ "WAVE".getBytes ++
      fmtChunk(2, 44100, 16) ++ "data".getBytes ++ le32(1000) ++ data
    val m = MultimodalOps.wavMeta(wav).get
    assert((m.format, m.channels, m.sample_rate, m.bits, m.data_bytes) ==
      ("wav", 2, 44100, 16, 1000L))
    // duration: 1000 bytes / (44100 * 2ch * 2B) per sec
    assert(math.abs(m.duration_ms - 1000.0 / (44100.0 * 2 * 2) * 1000.0) < 1e-9)

    // non-canonical chunk order: a LIST chunk (odd size → padded) before fmt
    val wav2 = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32(5) ++ Array.fill[Byte](6)(0) ++ // 5 + pad
      fmtChunk(1, 8000, 16) ++ "data".getBytes ++ le32(200) ++ Array.fill[Byte](200)(1)
    val m2 = MultimodalOps.wavMeta(wav2).get
    assert((m2.channels, m2.sample_rate, m2.data_bytes) == (1, 8000, 200L))

    // malformed declared chunk size near Int.MaxValue must return None,
    // not wrap the walk offset negative and crash
    val huge = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0x7ffffff0)
    assert(MultimodalOps.wavMeta(huge).isEmpty)

    // not RIFF / truncated / out-of-scope codec (a float tag must carry
    // 32-bit samples — a 16-bit "float" is malformed) → None
    assert(MultimodalOps.wavMeta("plain text".getBytes).isEmpty)
    assert(MultimodalOps.wavMeta("RIFF".getBytes ++ le32(4) ++ "WAVE".getBytes).isEmpty)
    val nonPcm = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      ("fmt ".getBytes ++ le32(16) ++ le16(3) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16)) ++
      "data".getBytes ++ le32(0)
    assert(MultimodalOps.wavMeta(nonPcm).isEmpty)
    // an unknown codec tag (e.g. 2 = MS ADPCM, out of scope) → None
    val msAdpcm = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      ("fmt ".getBytes ++ le32(16) ++ le16(2) ++ le16(1) ++ le32(8000) ++
        le32(4000) ++ le16(256) ++ le16(4)) ++
      "data".getBytes ++ le32(0)
    assert(MultimodalOps.wavMeta(msAdpcm).isEmpty)
  }

  test("float WAV decodes to the exact integer ladder; NaN quarantines; clipping clamps") {
    val media = MultimodalOps.asFloatWavPayload(spark, docs.limit(16), "doc_id")
    val rows = media.collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val (ch, s) = MultimodalOps.wavPcm(bytes).get
      assert(ch == 1 + (id % 2).toInt)
      val div = 65536 >> (4 * (id % 4).toInt)
      val n = 128 + (id % 8).toInt * 32
      assert(s.length == n)
      for (i <- 0 until n)
        assert(s(i) == (((id * 7919 + i.toLong * 2641) % div) - div / 2).toShort,
          s"doc $id sample $i")
    }
    // hand-built: out-of-range floats clamp to full scale, NaN quarantines
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def floatWav(vals: Array[Float]) = {
      val data = vals.flatMap(f => le32(java.lang.Float.floatToIntBits(f)))
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        ("fmt ".getBytes ++ le32(16) ++ le16(3) ++ le16(1) ++ le32(8000) ++
          le32(32000) ++ le16(4) ++ le16(32)) ++
        "data".getBytes ++ le32(data.length) ++ data
    }
    val (_, clipped) = MultimodalOps.wavPcm(floatWav(Array(1.5f, -2f, 0f))).get
    assert(clipped.toSeq == Seq[Short](32767, -32768, 0))
    assert(MultimodalOps.wavPcm(floatWav(Array(0.5f, Float.NaN))).isEmpty)
  }

  test("IMA ADPCM decode matches an independent reference over random nibbles") {
    // an in-test reference decoder written in the textbook form (branch
    // on each bit with floating step halves, the IMA recommended-practice
    // pseudocode) — structurally unlike the production bit-gated
    // accumulator, so a transcription bug in either shows
    val stepTab = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23,
      25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
      118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
      408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
      1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660,
      4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    val idxTab = Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
    def refDecode(pred0: Int, idx0: Int, nibbles: Seq[Int]): Seq[Short] = {
      var pred = pred0
      var idx = idx0
      nibbles.map { n =>
        val step = stepTab(idx)
        var delta = 0
        var s = step
        if ((n & 4) != 0) delta += step
        s = step >> 1
        if ((n & 2) != 0) delta += s
        s = s >> 1
        if ((n & 1) != 0) delta += s
        delta += step >> 3
        pred = if ((n & 8) != 0) pred - delta else pred + delta
        if (pred > 32767) pred = 32767
        if (pred < -32768) pred = -32768
        idx = math.max(0, math.min(88, idx + idxTab(n)))
        pred.toShort
      }
    }
    val rnd = new scala.util.Random(90125)
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    for (channels <- Seq(1, 2); trial <- 0 until 5) {
      val nBlocks = 1 + rnd.nextInt(3)
      val wordsPerCh = 1 + rnd.nextInt(4) // 4-byte words per channel/block
      val blockAlign = channels * (4 + 4 * wordsPerCh)
      val preds = Array.fill(channels)(rnd.nextInt(65536) - 32768)
      val idxs = Array.fill(channels)(rnd.nextInt(89))
      val nibbles = Array.fill(nBlocks, channels, wordsPerCh * 8)(rnd.nextInt(16))
      val body = (0 until nBlocks).flatMap { b =>
        (0 until channels).flatMap { c =>
          le16(preds(c)) ++ Array(idxs(c).toByte, 0.toByte)
        } ++
          (0 until wordsPerCh).flatMap { wd =>
            (0 until channels).flatMap { c =>
              (0 until 4).map { k =>
                val lo = nibbles(b)(c)(wd * 8 + k * 2)
                val hi = nibbles(b)(c)(wd * 8 + k * 2 + 1)
                ((hi << 4) | lo).toByte
              }
            }
          }
      }.toArray
      val wav = "RIFF".getBytes ++ le32(36 + body.length) ++ "WAVE".getBytes ++
        ("fmt ".getBytes ++ le32(16) ++ le16(0x11) ++ le16(channels) ++
          le32(8000) ++ le32(8000 * blockAlign / 2) ++ le16(blockAlign) ++
          le16(4)) ++
        "data".getBytes ++ le32(body.length) ++ body
      val (gotCh, got) = MultimodalOps.wavPcm(wav).getOrElse(
        fail(s"quarantined: ch=$channels trial=$trial"))
      assert(gotCh == channels)
      // expected: per block, header samples then interleaved decode —
      // EACH BLOCK restarts from its header state
      val expect = (0 until nBlocks).flatMap { b =>
        val perCh = (0 until channels).map(c =>
          preds(c).toShort +: refDecode(preds(c), idxs(c), nibbles(b)(c).toSeq))
        (0 until perCh.head.length).flatMap(s => (0 until channels).map(c => perCh(c)(s)))
      }
      assert(got.toSeq == expect, s"ch=$channels trial=$trial")
    }
  }

  test("ADPCM oracle fixture: constant-predictor blocks decode exactly") {
    val media = MultimodalOps.asAdpcmWavPayload(spark, docs.limit(12), "doc_id")
    val stats = MultimodalOps.extractAudioPcm(spark, media).collect().sortBy(_.doc_id)
    assert(stats.length == 12)
    for (st <- stats) {
      val id = st.doc_id
      val ch = 1 + (id % 2).toInt
      val nb = 1 + (id % 3).toInt
      assert(st.channels == ch)
      assert(st.n_samples == ch * 17 * nb, s"doc $id")
      val p0 = ((id * 7919) % 65536 - 32768).toInt
      assert(st.peak >= math.abs(p0), s"doc $id peak")
    }
  }

  test("asWavPayload emits genuine parseable WAV containers end to end") {
    val media = MultimodalOps.asWavPayload(spark, docs.limit(20), "doc_id", "text")
    val metas = MultimodalOps.extractAudioMeta(spark, media).collect().sortBy(_.doc_id)
    assert(metas.length == 20) // every payload parsed (none dropped)
    for (m <- metas) {
      assert(m.format == "wav" && m.bits == 16)
      assert(m.channels == 1 + (m.doc_id % 2).toInt)
      assert(m.sample_rate == 8000 + (m.doc_id % 4).toInt * 4000)
      assert(m.data_bytes > 0)
    }
  }

  test("MP4 box walk: nested moov/trak parse, malformed boxes rejected") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tp: String, body: Array[Byte]) = be32(8 + body.length) ++ tp.getBytes ++ body
    val mvhd = be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(2500) ++
      Array.fill[Byte](80)(0) // timescale 1000, duration 2500
    val tkhd = Array.fill[Byte](76)(0) ++ be32(640 << 16) ++ be32(480 << 16)
    val mp4 = box("ftyp", "isom".getBytes ++ be32(512)) ++
      box("moov", box("mvhd", mvhd) ++
        box("free", Array.fill[Byte](3)(0)) ++ // opaque sibling stepped over
        box("trak", box("tkhd", tkhd))) ++
      box("mdat", Array.fill[Byte](777)(1))
    val m = MultimodalOps.mp4Meta(mp4).get
    assert((m.brand, m.timescale, m.width, m.height, m.mdat_bytes) ==
      ("isom", 1000, 640, 480, 777L))
    assert(math.abs(m.duration_ms - 2500.0) < 1e-9)

    // 64-bit largesize mdat (size field == 1 + 8-byte largesize): the walk
    // must step over it and still report the true payload length
    val big = Array.fill[Byte](99)(2)
    val bigMdat = be32(1) ++ "mdat".getBytes ++
      be32(0) ++ be32(16 + big.length) ++ big
    val m2 = MultimodalOps.mp4Meta(
      box("ftyp", "isom".getBytes ++ be32(512)) ++
        box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd))) ++
        bigMdat).get
    assert(m2.mdat_bytes == 99L, "largesize mdat must triage, not quarantine")
    // truncated largesize header → corrupt
    assert(MultimodalOps.mp4Meta(
      box("ftyp", "isom".getBytes ++ be32(512)) ++
        box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd))) ++
        be32(1) ++ "mdat".getBytes ++ be32(0)).isEmpty)

    // not MP4 / box overruns payload / missing moov fields → None
    assert(MultimodalOps.mp4Meta("plain text bytes".getBytes).isEmpty)
    val overrun = box("ftyp", "isom".getBytes ++ be32(0)) ++
      be32(0x7ffffff0) ++ "mdat".getBytes
    assert(MultimodalOps.mp4Meta(overrun).isEmpty)
    val noTrak = box("ftyp", "isom".getBytes ++ be32(0)) ++
      box("moov", box("mvhd", mvhd)) ++ box("mdat", Array[Byte]())
    assert(MultimodalOps.mp4Meta(noTrak).isEmpty)
  }

  test("asMp4Payload emits genuine parseable MP4 containers end to end") {
    val media = MultimodalOps.asMp4Payload(spark, docs.limit(20), "doc_id", "text")
    val metas = MultimodalOps.extractVideoMeta(spark, media).collect().sortBy(_.doc_id)
    assert(metas.length == 20)
    for (m <- metas) {
      assert(m.brand == "isom" && m.timescale == 600)
      assert(m.width == 320 + (m.doc_id % 4).toInt * 160)
      assert(m.height == 240 + (m.doc_id % 4).toInt * 120)
      assert(m.duration_ms == (1 + (m.doc_id % 30)) * 1000.0)
      assert(m.mdat_bytes > 0)
    }
  }

  test("knn graph: k out-neighbors per vector, decent recall vs brute force") {
    import org.apache.spark.sql.expressions.Window
    val k = 5
    // small fixture (~50 vectors) → few wide buckets; at corpus scale the
    // caller raises bits to keep per-bucket cohabitant sets bounded
    val graph = SimilarityOps.knnGraph(emb, $"vec_id", $"embedding", k,
      dim = 64, bits = 3, tables = 6).cache()
    val perSrc = graph.groupBy($"src").count().collect()
    assert(perSrc.nonEmpty && perSrc.forall(_.getLong(1) <= k))
    // exact per-vector top-k via the brute-force scorer (self-join)
    val exact = SimilarityOps.bruteForceTopK(emb, emb,
        $"vec_id", $"embedding", $"vec_id", $"embedding", k)
      .select($"q_id".as("src"), $"n_id".as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graph.select($"src", $"dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"knn-graph recall too low: $recall")
  }

  test("int8 quantization: error bounded by scale/2, cosine preserved, zero-safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.9, -0.4, 0.05, 0.7)),
      (2L, Seq(127.0, -64.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("id", "v")
    val q = df.withColumn("qz", VectorOps.quantizeInt8($"v"))
      .withColumn("deq", VectorOps.dequantizeInt8($"qz"))
      .select($"id", $"v", $"qz.scale".as("scale"), $"deq")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2),
        r.getSeq[Double](3))).sortBy(_._1)
    for ((id, v, scale, deq) <- q) {
      assert(scale == v.map(math.abs).max / 127.0)
      val maxErr = v.zip(deq).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= scale / 2 + 1e-12, s"id=$id maxErr=$maxErr scale=$scale")
    }
    // zero vector round-trips to zeros with scale 0
    assert(q(2)._3 == 0.0 && q(2)._4.forall(_ == 0.0))
    // cosine between dequantized vectors stays close to the original
    val (_, v1, _, d1) = q(0); val (_, v2, _, d2) = q(1)
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      dp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(math.abs(cos(v1, v2) - cos(d1, d2)) < 0.01)
  }

  test("text_stats kernel fields match the HOF compositions bit-for-bit") {
    // the original column compositions the native kernel replaced — every
    // leaf must agree on the full corpus, including the whitespace/empty
    // edge rows appended below
    val toksOf = (c: org.apache.spark.sql.Column) => split(lower(trim(c)), "\\s+")
    val probe = docs.select($"doc_id".cast("string").as("id"), $"text")
      .unionByName(Seq(
        ("e1", ""), ("e2", "   "), ("e3", "\tder die und ist le la"),
        ("e4", "THE the tHe ... 12345 caf\u00e9 \u00e9l\u00e9phant"),
        ("e5", "a\nb\u000bc\fd\re f"), ("e6", "el la y es es es"))
        .toDF("id", "text"))
    val toks = toksOf($"text")
    val old = probe.select(
      $"id",
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      size(filter(toks, t => t.isInCollection(TextOps.stopwords))).as("n_stop"),
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)).as("sum_len"),
      size(filter(toks, t => t.rlike("[a-z]"))).as("n_alpha"),
      {
        def score(words: Seq[String]) = size(filter(toks, t => t.isInCollection(words)))
        TextOps.langMarkers.foldLeft((lit("und"), lit(0))) {
          case ((bl, bs), (lang, words)) =>
            (when(score(words) > bs, lit(lang)).otherwise(bl),
              when(score(words) > bs, score(words)).otherwise(bs))
        }._1.as("lang")
      },
      length(regexp_replace(lower(trim($"text")), "\\s+", "")).as("n_nonspace"),
      length(regexp_replace(regexp_replace(lower(trim($"text")), "\\s+", ""),
        "[^a-z0-9]", "")).as("n_alnum"))
    val st = graft.functions.NativeFunctions.text_stats($"text")
    val niu = probe.select(
      $"id",
      st.getField("n_tokens").as("n_tokens"),
      st.getField("n_distinct").as("n_distinct"),
      st.getField("n_stop").as("n_stop"),
      st.getField("sum_len").as("sum_len"),
      st.getField("n_alpha").as("n_alpha"),
      st.getField("lang").as("lang"),
      st.getField("n_nonspace").as("n_nonspace"),
      st.getField("n_alnum").as("n_alnum"))
    val oldRows = old.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val newRows = niu.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(oldRows.keySet == newRows.keySet)
    oldRows.foreach { case (id, expected) =>
      assert(newRows(id) == expected, s"text_stats mismatch for doc $id: got ${newRows(id)}, want $expected")
    }
  }
}
