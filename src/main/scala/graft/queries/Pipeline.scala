package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{DedupOps, GraphOps, IvfOps, TextOps}
import graft.sources.Tables

/** The composed training-data cleaning pipeline — the end-to-end shape a
  * 100 TB corpus run takes, as ONE declarative plan:
  *
  *   classify (lang-ID + quality + token count, per-row codegen'd)
  *     → filter (keep confident-English, sane-quality, sane-length docs)
  *     → exact-dedup (fingerprint hash; first doc_id wins)
  *     → per-source report (docs kept, tokens kept, mean quality)
  *
  * Scale shape: the classify/filter stages are shuffle-free row maps; the
  * dedup is the ONLY shuffle (hash on fingerprint), and the final report
  * re-aggregates the survivors with map-side combine. Catalyst prunes the
  * document text column after the last stage that needs it. The same plan
  * with `minhashLshPairs` substituted for the fingerprint stage is the
  * near-dup variant ([[graft.ops.DedupOps]]); the exact stage is used here
  * because it is DuckDB-oracle-verifiable end to end.
  */
object Pipeline extends QueryModule {

  /** The declarative quality gate shared by the two `pl_expectations_*`
    * rows: drop non-core-language and too-short docs, warn on very long
    * ones, hard-fail the batch if a doc_id ever arrives NULL. */
  private def corpusExpectations = Seq(
    graft.ops.ExpectationsOps.Expectation("lang_supported",
      "lang IN ('en','de','fr','es')", "drop"),
    graft.ops.ExpectationsOps.Expectation("min_length",
      "n_chars >= 60", "drop"),
    graft.ops.ExpectationsOps.Expectation("not_huge",
      "n_chars <= 400", "warn"),
    graft.ops.ExpectationsOps.Expectation("id_present",
      "doc_id IS NOT NULL", "fail"))

  def defs: Seq[QueryDef] = Seq(
    // ---- Declarative data-quality expectations (the lakehouse EXPECT /
    // ON VIOLATION shape): one codegen'd projection tags each row with
    // its violated rule names; drop-violators route to the quarantine
    // lane WITH the tags (dead-letter, nothing silently lost), warn
    // rules count but keep, a fail rule aborts the batch. Zero shuffle
    // at any scale — each output is a filter over the scan. ----
    QueryDef(
      "pl_expectations_quarantine",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.ops.ExpectationsOps.enforce(docs, corpusExpectations)
        graft.ops.ExpectationsOps
          .quarantine(docs, corpusExpectations)
          .select("violated", "doc_id", "lang", "n_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT array_to_string(list_sort(
            [x FOR x IN [
              CASE WHEN NOT coalesce(lang IN ('en','de','fr','es'), false)
                   THEN 'lang_supported' END,
              CASE WHEN NOT coalesce(n_chars >= 60, false)
                   THEN 'min_length' END,
              CASE WHEN NOT coalesce(n_chars <= 400, false)
                   THEN 'not_huge' END] IF x IS NOT NULL]), ',') AS violated,
          doc_id, lang, n_chars
        FROM documents
        WHERE NOT coalesce(lang IN ('en','de','fr','es'), false)
           OR NOT coalesce(n_chars >= 60, false)
        ORDER BY doc_id""")),

    QueryDef(
      "pl_expectations_metrics",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.ops.ExpectationsOps.metrics(docs, corpusExpectations)
          .orderBy("expectation")
      },
      Some("""SELECT * FROM (
          SELECT 'lang_supported' AS expectation, 'drop' AS action,
            count(*) FILTER (WHERE NOT coalesce(
              lang IN ('en','de','fr','es'), false)) AS rows FROM documents
          UNION ALL SELECT 'min_length', 'drop',
            count(*) FILTER (WHERE NOT coalesce(n_chars >= 60, false))
            FROM documents
          UNION ALL SELECT 'not_huge', 'warn',
            count(*) FILTER (WHERE NOT coalesce(n_chars <= 400, false))
            FROM documents
          UNION ALL SELECT 'id_present', 'fail',
            count(*) FILTER (WHERE doc_id IS NULL) FROM documents
          UNION ALL SELECT '__kept', 'info',
            count(*) FILTER (WHERE coalesce(
                lang IN ('en','de','fr','es'), false)
              AND coalesce(n_chars >= 60, false)
              AND doc_id IS NOT NULL) FROM documents)
        ORDER BY expectation""")),

    // ---- Audio corpus quality gate: decode real 16-bit PCM WAVs
    // (per-partition, zero shuffle), keep docs that are ≤50% silent and
    // ≤1% clipped — both thresholds in exact integer arithmetic — then
    // one doc_id-keyed join back to metadata and a lang rollup. The
    // fixture's four amplitude tiers guarantee the gate genuinely drops
    // the silent tier and keeps the loud ones. ----
    QueryDef(
      "pl_audio_quality_gate",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val media = graft.ops.MultimodalOps.asPcmWavPayload(s, docs, "doc_id")
        val kept = graft.ops.MultimodalOps.extractAudioPcm(s, media).toDF()
          .filter($"silence_count" * 2 <= $"n_samples" &&
            $"clip_count" * 100 <= $"n_samples")
          .select($"doc_id")
        docs.join(kept, "doc_id")
          .groupBy($"lang")
          .agg(count(lit(1)).as("kept_docs"))
          .orderBy($"lang")
      },
      Some("""WITH base AS (
          SELECT doc_id, lang,
            CASE doc_id % 4 WHEN 0 THEN 65536 WHEN 1 THEN 4096
                 WHEN 2 THEN 256 ELSE 16 END AS d,
            CAST(128 + (doc_id % 8) * 32 AS INT) AS n
          FROM documents),
        stats AS (
          SELECT doc_id, lang, n,
            count(*) FILTER (WHERE abs(v) < 64) AS silent,
            count(*) FILTER (WHERE abs(v) >= 32700) AS clip
          FROM (SELECT doc_id, lang, n,
                  (doc_id*7919 + i*2641) % d - d//2 AS v
                FROM base, unnest(range(0, 352)) AS t(i) WHERE i < n)
          GROUP BY doc_id, lang, n)
        SELECT lang, count(*) AS kept_docs FROM stats
        WHERE silent * 2 <= n AND clip * 100 <= n
        GROUP BY lang ORDER BY lang""")),

    QueryDef(
      "pl_corpus_clean",
      (s, dir) => {
        import s.implicits._
        val enriched = Tables.load(s, dir, "documents")
          .select(
            $"doc_id", $"source",
            TextOps.langId($"text").as("lang_guess"),
            TextOps.qualityScore($"text").as("quality"),
            TextOps.tokenCount($"text").cast("bigint").as("n_tokens"),
            TextOps.fingerprint($"text").as("fp"))
        val kept = enriched.filter(
          $"lang_guess" === "en" && $"quality" >= 0.5 &&
            $"n_tokens".between(5, 1000))
        val deduped = kept
          .withColumn("rk", row_number().over(Window.partitionBy($"fp").orderBy($"doc_id")))
          .filter($"rk" === 1)
        deduped.groupBy($"source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("total_tokens"),
            round(avg($"quality"), 4).as("avg_quality"))
          .orderBy($"source")
      },
      Some("""WITH t AS (
          SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS tk,
                 md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          FROM documents),
        m AS (
          SELECT doc_id, source, fp,
            CAST(len(tk) AS BIGINT) AS n_tokens,
            CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS diversity,
            CAST(len(list_filter(tk, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
              / CAST(len(tk) AS DOUBLE) AS sr,
            CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE)
              / CAST(len(tk) AS DOUBLE) AS mtl,
            len(list_filter(tk, x -> x IN ('the','a','of','and'))) AS s_en,
            len(list_filter(tk, x -> x IN ('der','die','und','ist'))) AS s_de,
            len(list_filter(tk, x -> x IN ('le','la','et','est'))) AS s_fr,
            len(list_filter(tk, x -> x IN ('el','la','y','es'))) AS s_es
          FROM t),
        scored AS (
          SELECT doc_id, source, fp, n_tokens,
            diversity * 0.6
              + (CASE WHEN sr BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END) * 0.2
              + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2 AS quality,
            CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                 WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                 WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                 WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                 ELSE 'es' END AS lang_guess
          FROM m),
        kept AS (
          SELECT * FROM scored
          WHERE lang_guess = 'en' AND quality >= 0.5 AND n_tokens BETWEEN 5 AND 1000),
        deduped AS (
          SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk FROM kept)
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(avg(quality), 4) AS avg_quality
        FROM deduped WHERE rk = 1
        GROUP BY source ORDER BY source""")),

    // ---- deterministic hash-based train/test split: the assignment is a
    // pure function of the stable id (md5 prefix), so it reproduces
    // identically on any engine, any partitioning, any day — the property
    // a 100 TB split must have (no sampling state, no shuffle; the split
    // column is computed in the scan's projection). 'e6' = 230/256 ≈ 90%. ----
    QueryDef(
      "pl_train_test_split",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .withColumn("split",
            when(substring(md5($"doc_id".cast("string").cast("binary")), 1, 2) < "e6",
              "train").otherwise("test"))
          .groupBy($"split")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
          .orderBy($"split")
      },
      Some("""SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                     THEN 'train' ELSE 'test' END AS split,
               count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1 ORDER BY split""")),

    // ---- seeded stratified sampling (per-language fractions): Bernoulli
    // per-row draws keyed by a seed — no shuffle, no state; exact fractions
    // are engine-specific so this is rows-only, with PipelineSpec asserting
    // per-stratum tolerance and run-to-run determinism. ----
    QueryDef(
      "pl_sample_stratified",
      (s, dir) => {
        import s.implicits._
        val fractions = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25,
          "es" -> 0.1, "zh" -> 0.1)
        Tables.load(s, dir, "documents")
          .stat.sampleBy("lang", fractions, seed = 42L)
          .groupBy($"lang").agg(count(lit(1)).as("n_sampled"))
          .orderBy($"lang")
      },
      None,
      noOracleReason = Some(
        "deliberately exercises Spark's native Bernoulli sampleBy (engine RNG by " +
        "definition); the engine-neutral deterministic sibling " +
        "pl_sample_hash_topk IS oracle-checked, and PipelineSpec bounds " +
        "per-stratum counts around n*fraction.")),

    // ---- deterministic hash-rank sampling: exactly k docs per stratum,
    // ranked by md5 of a seeded doc key. Unlike Bernoulli sampleBy
    // (engine-specific RNG, rows-only above), the hash rank is a pure
    // function of the data — the same sample on any engine, partitioning,
    // or rerun, and it composes with incremental ingest (a doc's rank
    // never changes). One per-stratum window shuffle, k·strata rows out. ----
    QueryDef(
      "pl_sample_hash_topk",
      (s, dir) => {
        import s.implicits._
        val k = 20
        val w = Window.partitionBy($"lang")
          .orderBy(md5(concat(lit("smp:"), $"doc_id".cast("string"))))
        Tables.load(s, dir, "documents")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= k)
          .select($"lang", $"doc_id", $"rn")
          .orderBy($"lang", $"rn")
      },
      Some("""SELECT lang, doc_id,
          CAST(row_number() OVER (PARTITION BY lang
            ORDER BY md5('smp:' || CAST(doc_id AS VARCHAR))) AS INT) AS rn
        FROM documents
        QUALIFY rn <= 20
        ORDER BY lang, rn""")),

    // ---- deterministic weighted sampling without replacement (Efraimidis-
    // Spirakis): rank by u^(1/w) with u a pure md5-derived uniform (first
    // 8 hex chars / 2³²), w = doc length — longer docs proportionally more
    // likely, yet the whole draw is a deterministic function of the data
    // (reproducible across engines/partitioning, auditable). The top-k is
    // orderBy+limit → TakeOrderedAndProject: per-partition heaps + one
    // k-row merge at the driver, NO global sort exchange. ----
    QueryDef(
      "pl_sample_weighted",
      (s, dir) => {
        import s.implicits._
        val k = 30
        val u = (expr("conv(substring(md5(concat('wsmp:', cast(doc_id as string))), 1, 8), 16, 10)")
          .cast("double") + 1.0) / 4294967296.0
        val topk = Tables.load(s, dir, "documents")
          .withColumn("es_key", pow(u, lit(1.0) / $"n_chars".cast("double")))
          .orderBy($"es_key".desc, $"doc_id")
          .limit(k)
        topk
          .withColumn("rank",
            row_number().over(Window.orderBy($"es_key".desc, $"doc_id")))
          .select($"rank", $"doc_id", $"lang", round($"es_key", 9).as("es_key_r"))
          .orderBy($"rank")
      },
      Some("""WITH t AS (
          SELECT doc_id, lang,
            pow((CAST('0x' || substring(md5('wsmp:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS UBIGINT) + 1) / 4294967296.0,
                1.0 / n_chars) AS es_key
          FROM documents)
        SELECT CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS INT) AS rank,
          doc_id, lang, round(es_key, 9) AS es_key_r
        FROM t QUALIFY rank <= 30 ORDER BY rank""")),

    // ---- sequence packing: greedy contiguous fill of fixed token-budget
    // context windows (the standard LLM pretraining batching step). Packing
    // is per-source so the running sum parallelizes across sources (at
    // 100 TB you pack per shard — a GLOBAL running sum would serialize);
    // within a source it is one partitioned window cumsum, no extra
    // shuffle beyond the partition-by. pack_id = floor(preceding-tokens /
    // budget): deterministic in (source, doc_id) order on any engine. ----
    QueryDef(
      "pl_pack_sequences",
      (s, dir) => {
        import s.implicits._
        val budget = 512L
        val docs = Tables.load(s, dir, "documents")
          .select($"doc_id", $"source",
            TextOps.tokenCount($"text").cast("bigint").as("n_tokens"))
        val w = Window.partitionBy($"source").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.withColumn("cum", sum($"n_tokens").over(w))
          .withColumn("pack_id", floor(($"cum" - $"n_tokens") / budget))
          .groupBy($"source", $"pack_id")
          .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("pack_tokens"))
          .orderBy($"source", $"pack_id")
      },
      Some("""WITH d AS (
          SELECT doc_id, source,
            CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum
          FROM d)
        SELECT source, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_id,
               count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        FROM c GROUP BY 1, 2 ORDER BY source, pack_id""")),

    // ---- weighted source mixing: per-language keep-rates as a pure hash
    // function of (doc_id, lang) — the deterministic, stateless way to hit
    // a target training mix at 100 TB (no sampling state, reproduces on
    // any engine/partitioning; compare 16-bit md5 prefix to the rate
    // threshold). en kept fully; de/fr at 1/2; es at 1/4; zh at 1/10. ----
    QueryDef(
      "pl_mix_weighted",
      (s, dir) => {
        import s.implicits._
        val h = substring(
          md5(concat($"doc_id".cast("string"), lit(":"), $"lang").cast("binary")),
          1, 4)
        val keep = when($"lang" === "en", lit(true))
          .when($"lang" === "de" || $"lang" === "fr", h < "8000")
          .when($"lang" === "es", h < "4000")
          .when($"lang" === "zh", h < "1999")
          .otherwise(lit(false))
        Tables.load(s, dir, "documents")
          .filter(keep)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(TextOps.tokenCount($"text").cast("bigint")).as("total_tokens"))
          .orderBy($"lang")
      },
      Some("""WITH h AS (
          SELECT lang, text,
            substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 4) AS hx
          FROM documents)
        SELECT lang, count(*) AS n_docs,
          CAST(sum(len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT)
            AS total_tokens
        FROM h
        WHERE lang = 'en'
           OR (lang IN ('de', 'fr') AND hx < '8000')
           OR (lang = 'es' AND hx < '4000')
           OR (lang = 'zh' AND hx < '1999')
        GROUP BY lang ORDER BY lang""")),

    // ---- DOC-level benchmark decontamination — the drop-the-document
    // sibling of [[pl_decontaminate_spans]] (which rewrites spans):
    // flag train docs sharing any 8-token n-gram with the benchmark
    // set, the PaLM/Llama whole-doc filter rule (8-grams, vs the span
    // entry's trigram surgery). The benchmark side (eval sets are
    // SMALL) distincts its n-grams and BROADCASTS; the train side
    // explodes n-grams map-side, so at 100 TB the only shuffle is the
    // per-doc hit count. The fixture INJECTS leakage (docs %31==5
    // append an 8-token span from benchmark doc 0 at a varying offset),
    // since naturally-disjoint synthetic text would make the entry
    // trivially empty; the oracle replays the full n-gram join — no
    // closed-form shortcut, so tokenization, windowing, injection,
    // dedup, and the join all sit under the hash. ----
    QueryDef(
      "pl_decontaminate",
      (s, dir) => {
        import s.implicits._
        val n = 8
        val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
        // limit(1) states the 1-row bound in the plan (doc_id is unique)
        // so the plan lint can PROVE the cross join is broadcast-bounded
        val bench0 = docs.filter($"doc_id" === 0).limit(1)
          .select(split($"text", " ").as("b0"))
        val train = docs.filter($"doc_id" % 97 =!= 0)
          .crossJoin(broadcast(bench0))
          .select($"doc_id",
            when($"doc_id" % 31 === 5,
              concat($"text", lit(" "),
                array_join(slice($"b0",
                  (lit(1) + $"doc_id" % 3).cast("int"), lit(n)), " ")))
              .otherwise($"text").as("text"))
        def grams(c: org.apache.spark.sql.Column) = {
          val tk = split(c, " ")
          transform(
            sequence(lit(1), greatest(lit(1), size(tk) - (n - 1))),
            i => array_join(slice(tk, i, lit(n)), " "))
        }
        val benchGrams = docs.filter($"doc_id" % 97 === 0)
          .select(explode(grams($"text")).as("gram")).distinct()
        train.select($"doc_id", explode(grams($"text")).as("gram"))
          .join(broadcast(benchGrams), "gram")
          .groupBy($"doc_id")
          .agg(countDistinct($"gram").as("n_hits"))
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents),
        b0 AS (SELECT string_split(text, ' ') AS b0 FROM d WHERE doc_id = 0),
        tr AS (SELECT doc_id,
            CASE WHEN doc_id % 31 = 5 THEN text || ' ' ||
              array_to_string((SELECT b0 FROM b0)[(1 + doc_id % 3):(8 + doc_id % 3)], ' ')
            ELSE text END AS text
          FROM d WHERE doc_id % 97 <> 0),
        tg AS (SELECT doc_id,
            unnest([array_to_string(tk[i:i+7], ' ')
              FOR i IN generate_series(1, greatest(1, len(tk)-7))]) AS gram
          FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM tr)),
        bg AS (SELECT DISTINCT
            unnest([array_to_string(tk[i:i+7], ' ')
              FOR i IN generate_series(1, greatest(1, len(tk)-7))]) AS gram
          FROM (SELECT string_split(text, ' ') AS tk FROM d
                WHERE doc_id % 97 = 0))
        SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_hits
        FROM tg JOIN bg USING (gram)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- temperature-rebalanced language mixing (the multilingual-corpus
    // α-sampling rule): per-language keep-rate ∝ N_l^(α-1), normalized so
    // the SMALLEST language keeps everything — α = 0.5 upsamples rare
    // languages relative to the natural distribution (en at 218 docs is
    // halved; fr at 64 keeps all). Two aggregate shuffles: language counts
    // (broadcast back) and the final report; the per-doc keep decision is
    // a pure md5-threshold function, stateless and engine/partitioning-
    // independent. floor(rate·65536) makes the threshold integer-exact on
    // both engines. ----
    QueryDef(
      "pl_mix_temperature",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_orig"))
        val minN = counts.agg(min($"n_orig").as("n_min"))
        val rates = counts.join(broadcast(minN))
          .withColumn("thresh",
            floor(sqrt($"n_min".cast("double") / $"n_orig".cast("double"))
              * 65536).cast("long"))
        val hx = conv(
          substring(md5($"doc_id".cast("string").cast("binary")), 1, 4),
          16, 10).cast("long")
        docs.join(broadcast(rates), Seq("lang"))
          .withColumn("keep", hx < $"thresh")
          .groupBy($"lang")
          .agg(max($"n_orig").as("n_orig"),
            sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
            max($"thresh").as("thresh"))
          .orderBy($"lang")
      },
      Some("""WITH c AS (
          SELECT lang, count(*) AS n_orig FROM documents GROUP BY lang),
        m AS (SELECT min(n_orig) AS n_min FROM c),
        r AS (
          SELECT lang, n_orig,
            CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_orig AS DOUBLE))
              * 65536) AS BIGINT) AS thresh
          FROM c, m),
        d AS (
          SELECT d.lang, r.n_orig, r.thresh,
            ((strpos('0123456789abcdef', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
             + (strpos('0123456789abcdef', substring(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1) * 256
             + (strpos('0123456789abcdef', substring(md5(CAST(d.doc_id AS VARCHAR)), 3, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substring(md5(CAST(d.doc_id AS VARCHAR)), 4, 1)) - 1)) AS hx
          FROM documents d JOIN r USING (lang))
        SELECT lang, CAST(max(n_orig) AS BIGINT) AS n_orig,
               CAST(sum(CASE WHEN hx < thresh THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               max(thresh) AS thresh
        FROM d GROUP BY lang ORDER BY lang""")),

    // ---- percentile-clip outlier filter: p05/p95 length thresholds from
    // one aggregate, broadcast into the filter — the two-pass shape that
    // replaces a driver round-trip (no collect; the threshold row rides a
    // BroadcastExchange). Exact percentile matches DuckDB quantile_cont. ----
    QueryDef(
      "pl_length_clip",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val pcts = docs.agg(
          expr("percentile(n_chars, array(0.05, 0.95))").as("p"))
          .select($"p".getItem(0).as("lo"), $"p".getItem(1).as("hi"))
        docs.join(broadcast(pcts))
          .filter($"n_chars" >= $"lo" && $"n_chars" <= $"hi")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            round(avg($"n_chars"), 4).as("avg_chars"))
          .orderBy($"lang")
      },
      Some("""WITH p AS (
          SELECT quantile_cont(n_chars, 0.05) AS lo,
                 quantile_cont(n_chars, 0.95) AS hi
          FROM documents)
        SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
        FROM documents, p
        WHERE n_chars >= lo AND n_chars <= hi
        GROUP BY lang ORDER BY lang""")),

    // ---- near-dup admission GATE (batch twin of the streaming
    // first-wins gate): one keep/drop bit per doc — survives iff it is
    // the first claimant of every one of its MinHash LSH band buckets
    // (arrival order = doc_id here). No pair materialization anywhere;
    // StreamingSpec proves the stateful streaming twin
    // (StreamingOps.nearDupGateStream) emits the identical decision set.
    // The engine-neutral band keys make the whole gate oracle-checkable. ----
    QueryDef(
      "pl_near_dedup_gate",
      (s, dir) => {
        import s.implicits._
        DedupOps.nearDupGateBatch(
            Tables.load(s, dir, "documents"), $"doc_id", $"text", $"doc_id")
          .select($"id".as("doc_id"), $"is_new")
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk FROM documents),
        shd AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM toks WHERE len(tk) >= 3),
        bases AS (
          SELECT doc_id,
            list_transform(shs, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT % 4294967291) AS bs
          FROM shd WHERE len(shs) > 0),
        sig AS (
          SELECT doc_id, i,
            list_min(list_transform(bs, x ->
              ((1 + (i * 2654435761) % 1048573) * x + (i * 4050313 + 17) % 4294967291)
                % 4294967291)) AS mh
          FROM bases, range(0, 64) t(i)),
        bands AS (
          SELECT doc_id, i // 4 AS band,
            md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS bsig
          FROM sig GROUP BY doc_id, i // 4),
        claims AS (
          SELECT doc_id,
            doc_id = min(doc_id) OVER (PARTITION BY band, bsig) AS claimed
          FROM bands)
        SELECT doc_id, bool_and(claimed) AS is_new
        FROM claims GROUP BY doc_id ORDER BY doc_id""")),

    // ---- the full near-dup dedup pass, end to end: shingle-Jaccard pairs
    // → connected components → drop every non-keeper → per-lang survivor
    // report. This is THE corpus-dedup shape at 100 TB (candidate join,
    // fixpoint clustering, anti-join retirement); exact-Jaccard pairs keep
    // it DuckDB-oracle-verifiable — swap minhashLshPairs in for the
    // constant-amplification variant at scale. The maxDf cut is part of the
    // SPEC (mirrored in the oracle's df window), not a fixture shortcut:
    // it bounds every shingle posting list so a corpus-common shingle can
    // never land O(df²) candidates on one reducer. ----
    QueryDef(
      "pl_near_dedup_report",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val pairs = DedupOps.jaccardPairs(docs, $"doc_id", $"text", n = 3,
          threshold = 0.8, maxDf = 128)
        val clusters = GraphOps.dedupClusters(docs, $"doc_id", pairs,
          $"id_a", $"id_b")
        val retired = clusters.filter(!$"is_keeper").select($"doc_id")
        docs.join(retired, Seq("doc_id"), "left_anti")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("kept_chars"))
          .orderBy($"lang")
      },
      Some("""WITH RECURSIVE toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM toks WHERE len(tk) >= 3),
        idx0 AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS shingle FROM sh),
        idx AS (
          SELECT doc_id, sz, shingle FROM (
            SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM idx0)
          WHERE df <= 128),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                 count(*) AS inter
          FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM cand
          WHERE CAST(inter AS DOUBLE) / CAST(sz_a + sz_b - inter AS DOUBLE) >= 0.8),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        reach AS (
          SELECT DISTINCT src AS id, src AS lab FROM sym
          UNION
          SELECT s.dst AS id, r.lab FROM reach r JOIN sym s ON s.src = r.id),
        retired AS (
          SELECT id AS doc_id FROM reach GROUP BY id HAVING id <> min(lab))
        SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
        FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM retired)
        GROUP BY lang ORDER BY lang""")),

    // ---- corpus-level repeated-span removal (CCNet/RefinedWeb line dedup
    // over fixed 8-token windows): drop every line shared by >= 2 docs,
    // reassemble survivors in order. md5 of the rebuilt text makes the
    // full reassembly oracle-checkable without hauling doc bodies. ----
    QueryDef(
      "pl_line_dedup",
      (s, dir) => {
        import s.implicits._
        DedupOps.lineDedup(Tables.load(s, dir, "documents"),
            $"doc_id", $"text", lineTokens = 8, minDf = 2)
          .select($"id".as("doc_id"), $"n_lines", $"n_kept",
            ($"n_lines" - $"n_kept").as("n_removed"),
            md5($"clean_text".cast("binary")).as("clean_md5"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        lines AS (
          SELECT doc_id, u.i - 1 AS idx,
                 array_to_string(tk[(u.i-1)*8+1:(u.i-1)*8+8], ' ') AS line
          FROM t, unnest(range(1, CAST(ceil(len(tk) / 8.0) AS BIGINT) + 1)) u(i)),
        boiler AS (
          SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
        reb AS (
          SELECT doc_id, count(*) AS n_kept,
                 md5(string_agg(line, ' ' ORDER BY idx)) AS clean_md5
          FROM lines WHERE line NOT IN (SELECT line FROM boiler)
          GROUP BY doc_id),
        tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
        SELECT t.doc_id, t.n_lines,
               coalesce(r.n_kept, 0) AS n_kept,
               t.n_lines - coalesce(r.n_kept, 0) AS n_removed,
               coalesce(r.clean_md5, md5('')) AS clean_md5
        FROM tot t LEFT JOIN reb r USING (doc_id) ORDER BY doc_id""")),

    // ---- per-source document cap (the CommonCrawl per-domain cap):
    // deterministic "random" order inside each source via md5(doc_id), keep
    // the first 40. One window shuffle partitioned by source; at corpus
    // scale sources are many and small so the window parallelizes — a
    // single hot source is the documented skew case for AQE. ----
    QueryDef(
      "pl_source_cap",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"source")
          .orderBy(md5($"doc_id".cast("string").cast("binary")), $"doc_id")
        Tables.load(s, dir, "documents")
          .withColumn("samp_rank", row_number().over(w))
          .filter($"samp_rank" <= 40)
          .select($"source", $"samp_rank", $"doc_id")
          .orderBy($"source", $"samp_rank")
      },
      Some("""SELECT source, samp_rank, doc_id FROM (
          SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS samp_rank
          FROM documents)
        WHERE samp_rank <= 40 ORDER BY source, samp_rank""")),

    // ---- SemDeDup (Abbas et al. 2023): k-means cells -> within-cell
    // cosine pairs -> connected components -> retire non-keepers. Rows-only
    // (iterative centroid training isn't one SQL statement); planted-
    // duplicate correctness + no-cartesian plan shape in PipelineSpec. The
    // 0.45 threshold is calibrated to the synthetic corpus (max pairwise
    // cosine ~0.51) so retirement is actually exercised. ----
    QueryDef(
      "pl_semdedup",
      (s, dir) => {
        import s.implicits._
        val emb = Tables.load(s, dir, "embeddings")
        val pairs = DedupOps.semanticDedupPairs(emb, $"vec_id", $"embedding",
          numCells = 16, threshold = 0.45)
        val clusters = GraphOps.dedupClusters(emb, $"vec_id", pairs,
          $"id_a", $"id_b")
        val retired = clusters.filter(!$"is_keeper")
          .select($"doc_id".as("vec_id"))
        emb.join(retired, Seq("vec_id"), "left_anti")
          .groupBy($"label")
          .agg(count(lit(1)).as("n_kept"))
          .orderBy($"label")
      },
      None,
      noOracleReason = Some(
        "within-cell pruning depends on iteratively k-means-trained cells; " +
        "OpsSpec asserts planted semantic duplicates are caught and kept-set " +
        "determinism.")),

    // ---- Z-order (Morton) layout key: the multi-column clustering value
    // behind Delta/Iceberg OPTIMIZE ZORDER BY — writing files in zval
    // order gives tight per-file min/max on BOTH dimensions, so box
    // predicates skip files at the scan (LayoutSpec proves the skipping on
    // disk; this entry oracle-checks the interleave arithmetic itself,
    // which is pure per-row shift/and/add — shuffle-free). ----
    QueryDef(
      "pl_zorder_events",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "events")
          .select($"event_id",
            pmod($"user_id", lit(256)).as("zx"),
            pmod($"event_id", lit(256)).as("zy"))
          .withColumn("zval", graft.ops.LayoutOps.zValue2($"zx", $"zy", 8))
          .orderBy($"zval", $"event_id")
          .limit(100)
      },
      Some(s"""WITH b AS (
          SELECT event_id, user_id % 256 AS zx, event_id % 256 AS zy
          FROM events)
        SELECT event_id, zx, zy, ${zOracleExpr("zx", "zy", 8)} AS zval
        FROM b ORDER BY zval, event_id LIMIT 100""")),

    // ---- incremental dedup: a NEW batch (sources src0/src1) lands
    // against the already-ingested corpus. A batch doc is retired when it
    // near-duplicates (trigram Jaccard ≥ 0.8) any corpus doc — the corpus
    // copy always wins, id order irrelevant — or a lower-id doc of its own
    // batch. Only BATCH postings probe the corpus shingle index
    // ([[DedupOps.batchJaccardPairs]]) — the corpus is never self-joined,
    // so per-ingest work scales with the batch, not the corpus. The maxDf
    // cut is part of the spec (mirrored in the oracle's df window). ----
    QueryDef(
      "pl_incremental_dedup",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val batchIds = docs.filter($"source".isin("src0", "src1"))
          .select($"doc_id")
        val pairs = DedupOps.batchJaccardPairs(docs, batchIds, $"doc_id",
          $"text", n = 3, threshold = 0.8, maxDf = 128)
        // id_a is always a batch doc: retire the higher batch id of a
        // batch-batch pair, else the batch side of a batch-corpus pair
        val retired = pairs
          .select(when($"b_batch", $"id_b").otherwise($"id_a").as("doc_id"))
          .distinct()
        docs.filter($"source".isin("src0", "src1"))
          .join(retired, Seq("doc_id"), "left_anti")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_new"), sum($"n_chars").as("chars_new"))
          .orderBy($"lang")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM toks WHERE len(tk) >= 3),
        idx0 AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS shingle FROM sh),
        idx AS (
          SELECT doc_id, sz, shingle FROM (
            SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM idx0)
          WHERE df <= 128),
        pairs AS (
          SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a,
                   b.sz AS sz_b, count(*) AS inter
            FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
          WHERE CAST(inter AS DOUBLE) / CAST(sz_a + sz_b - inter AS DOUBLE) >= 0.8),
        b AS (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1')),
        retired AS (
          SELECT DISTINCT CASE
            WHEN id_b IN (SELECT doc_id FROM b) THEN id_b
            WHEN id_a IN (SELECT doc_id FROM b) THEN id_a END AS doc_id
          FROM pairs),
        surv AS (
          SELECT d.* FROM documents d
          WHERE d.source IN ('src0', 'src1')
            AND NOT EXISTS (SELECT 1 FROM retired r WHERE r.doc_id = d.doc_id))
        SELECT lang, count(*) AS n_new, CAST(sum(n_chars) AS BIGINT) AS chars_new
        FROM surv GROUP BY lang ORDER BY lang""")),

    // ---- deterministic shard manifest: md5-prefix shard assignment
    // (engine- and partitioning-independent — the same doc lands in the
    // same shard on any cluster size), with per-shard row/char totals.
    // The write path is `.withColumn("shard", …).write.partitionBy` —
    // this entry oracle-checks the assignment + balance report. ----
    QueryDef(
      "pl_shard_manifest",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .withColumn("shard",
            conv(substring(md5($"doc_id".cast("string").cast("binary")), 1, 2),
              16, 10).cast("int") % 16)
          .groupBy($"shard")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
          .orderBy($"shard")
      },
      Some("""WITH t AS (
          SELECT n_chars,
            ((strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
            % 16 AS shard
          FROM documents)
        SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM t GROUP BY shard ORDER BY shard""")),

    // ---- length-bucketed batching: pack docs into fixed-size batches in
    // token-length order vs arrival order and report the padding waste
    // (each batch pads to its max length — the inference/training batcher
    // economics). The global batch assignment uses the distributed
    // [[graft.ops.LayoutOps.globalRowNumber]] (percentile-boundary range
    // buckets + partitioned within-bucket numbering + tiny offset join) —
    // EXACT global ranks with no single-partition window, so the same plan
    // runs over 100 TB. Oracle mirrors both strategies with a plain global
    // row_number (same ranks by construction). ----
    QueryDef(
      "pl_length_buckets",
      (s, dir) => {
        import s.implicits._
        val base = Tables.load(s, dir, "documents")
          .select($"doc_id", TextOps.tokenCount($"text").as("n"))
        def waste(rangeKey: org.apache.spark.sql.Column,
            order: Seq[org.apache.spark.sql.Column], strategy: String) = {
          graft.ops.LayoutOps.globalRowNumber(base, rangeKey, order,
              buckets = 32, outCol = "grn")
            .withColumn("batch", (($"grn" - 1) / 32).cast("int"))
            .groupBy($"batch")
            .agg(max($"n").as("mx"), sum($"n").as("useful"),
              count(lit(1)).as("cnt"))
            .agg(sum($"mx" * $"cnt").as("padded"), sum($"useful").as("useful"))
            .select(lit(strategy).as("strategy"), $"padded", $"useful",
              round(($"padded" - $"useful") / $"padded", 6).as("waste_ratio"))
        }
        waste($"n", Seq($"n", $"doc_id"), "length_sorted")
          .union(waste($"doc_id", Seq($"doc_id"), "arrival"))
          .orderBy($"strategy")
      },
      Some("""WITH base AS (
          SELECT doc_id,
            len(string_split_regex(lower(trim(text)), '\s+')) AS n
          FROM documents),
        so AS (
          SELECT n, CAST(floor((row_number() OVER (ORDER BY n, doc_id) - 1) / 32)
            AS INT) AS batch FROM base),
        sb AS (SELECT batch, max(n) AS mx, sum(n) AS useful, count(*) AS cnt
               FROM so GROUP BY batch),
        sw AS (SELECT 'length_sorted' AS strategy, sum(mx * cnt) AS padded,
                      sum(useful) AS useful FROM sb),
        ao AS (
          SELECT n, CAST(floor((row_number() OVER (ORDER BY doc_id) - 1) / 32)
            AS INT) AS batch FROM base),
        ab AS (SELECT batch, max(n) AS mx, sum(n) AS useful, count(*) AS cnt
               FROM ao GROUP BY batch),
        aw AS (SELECT 'arrival' AS strategy, sum(mx * cnt) AS padded,
                      sum(useful) AS useful FROM ab)
        SELECT strategy, CAST(padded AS BIGINT) AS padded,
          CAST(useful AS BIGINT) AS useful,
          round((padded - useful) / CAST(padded AS DOUBLE), 6) AS waste_ratio
        FROM (SELECT * FROM sw UNION ALL SELECT * FROM aw)
        ORDER BY strategy""")),

    // ---- CCNet-style perplexity bucketing: score every doc with the
    // corpus bigram LM (the KenLM stand-in TfIdfOps.bigramLogProb), split
    // each language at its own logprob terciles into head/middle/tail —
    // the partition CCNet uses to keep fluent text and downsample the
    // tail. Thresholds come from ONE per-lang percentile aggregate and
    // ride a broadcast join (no driver round-trip, no global sort); the
    // LM itself is two combinable aggregates. Head = highest logprob
    // (lowest perplexity). ----
    QueryDef(
      "pl_perplexity_buckets",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val scored = graft.ops.TfIdfOps
          .bigramLogProb(docs, $"doc_id", $"text")
          .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
        val cuts = scored.groupBy($"lang")
          .agg(expr("percentile(avg_logprob, array(1.0D/3, 2.0D/3))").as("p"))
          .select($"lang", $"p".getItem(0).as("t1"), $"p".getItem(1).as("t2"))
        scored.join(broadcast(cuts), Seq("lang"))
          .withColumn("bucket",
            when($"avg_logprob" <= $"t1", "tail")
              .when($"avg_logprob" <= $"t2", "middle")
              .otherwise("head"))
          .groupBy($"lang", $"bucket")
          .agg(count(lit(1)).as("n_docs"),
            (round(avg($"avg_logprob"), 6) + lit(0)).as("mean_logprob"))
          .orderBy($"lang", $"bucket")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents),
        t2 AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= 2),
        grams AS (
          SELECT doc_id,
            unnest(list_transform(range(1, len(tk)),
              i -> {'w1': tk[i], 'w2': tk[i + 1]}), recursive := true)
          FROM t2),
        bi AS (SELECT w1, w2, count(*) AS c12 FROM grams GROUP BY 1, 2),
        uni AS (SELECT w1, sum(c12) AS c1 FROM bi GROUP BY 1),
        scored AS (
          SELECT doc_id,
            round(avg(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))), 6)
              AS avg_logprob
          FROM grams JOIN bi USING (w1, w2) JOIN uni USING (w1)
          GROUP BY doc_id),
        sl AS (
          SELECT s.doc_id, d.lang, s.avg_logprob
          FROM scored s JOIN documents d USING (doc_id)),
        cuts AS (
          SELECT lang, quantile_cont(avg_logprob, 1.0/3) AS t1,
                 quantile_cont(avg_logprob, 2.0/3) AS t2
          FROM sl GROUP BY lang),
        b AS (
          SELECT sl.lang,
            CASE WHEN avg_logprob <= t1 THEN 'tail'
                 WHEN avg_logprob <= t2 THEN 'middle'
                 ELSE 'head' END AS bucket,
            avg_logprob
          FROM sl JOIN cuts USING (lang))
        SELECT lang, bucket, count(*) AS n_docs,
               round(avg(avg_logprob), 6) + 0 AS mean_logprob
        FROM b GROUP BY 1, 2 ORDER BY lang, bucket""")),

    // ---- incremental dedup against a PERSISTED corpus shingle index:
    // the corpus is shingled once (writeShingleIndex, maxDf cut at build
    // time over corpus document frequencies) and the new batch probes the
    // stored postings — corpus TEXT is never re-read, per-ingest work
    // scales with the batch. Retirement: a batch doc loses to any corpus
    // near-dup (the ingested copy wins) or to a lower-id doc of its own
    // batch. Oracle rebuilds the identical index (corpus-only df window)
    // in SQL. ----
    QueryDef(
      "pl_incremental_dedup_persisted",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.filter(!$"source".isin("src0", "src1"))
        val batch = docs.filter($"source".isin("src0", "src1"))
        // stable per-sf-dir location (mode=overwrite), like the IVF index
        val idxDir = new java.io.File(
          sys.props("java.io.tmpdir"),
          s"graft_shingle_idx_${math.abs(dir.hashCode)}").toString
        DedupOps.writeShingleIndex(corpus, $"doc_id", $"text", idxDir,
          n = 3, maxDf = 128)
        val pairs = DedupOps.probeShingleIndex(s, idxDir, batch,
          $"doc_id", $"text", n = 3, threshold = 0.8)
        val retired = pairs
          .select(when($"b_batch", $"id_b").otherwise($"id_a").as("doc_id"))
          .distinct()
        batch.join(retired, Seq("doc_id"), "left_anti")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_new"), sum($"n_chars").as("chars_new"))
          .orderBy($"lang")
      },
      Some("""WITH toks AS (
          SELECT doc_id, source,
                 string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents),
        sh AS (
          SELECT doc_id, source, list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM toks WHERE len(tk) >= 3),
        cidx0 AS (
          SELECT doc_id, len(shs) AS sz, unnest(shs) AS shingle FROM sh
          WHERE source NOT IN ('src0', 'src1')),
        cidx AS (
          SELECT doc_id, sz, shingle FROM (
            SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM cidx0)
          WHERE df <= 128),
        bidx AS (
          SELECT doc_id, len(shs) AS sz, unnest(shs) AS shingle FROM sh
          WHERE source IN ('src0', 'src1')),
        cross_retired AS (
          SELECT DISTINCT id_a AS doc_id FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a,
                   b.sz AS sz_b, count(*) AS inter
            FROM bidx a JOIN cidx b ON a.shingle = b.shingle
            GROUP BY 1, 2, 3, 4)
          WHERE CAST(inter AS DOUBLE) / CAST(sz_a + sz_b - inter AS DOUBLE) >= 0.8),
        within_retired AS (
          SELECT DISTINCT id_b AS doc_id FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a,
                   b.sz AS sz_b, count(*) AS inter
            FROM bidx a JOIN bidx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
          WHERE CAST(inter AS DOUBLE) / CAST(sz_a + sz_b - inter AS DOUBLE) >= 0.8),
        retired AS (
          SELECT doc_id FROM cross_retired UNION SELECT doc_id FROM within_retired),
        surv AS (
          SELECT d.* FROM documents d
          WHERE d.source IN ('src0', 'src1')
            AND d.doc_id NOT IN (SELECT doc_id FROM retired))
        SELECT lang, count(*) AS n_new, CAST(sum(n_chars) AS BIGINT) AS chars_new
        FROM surv GROUP BY lang ORDER BY lang""")),

    // ---- contrastive triplet mining (E5/GTE-style embedding-training
    // data prep): anchors+positives from the near-dup pair list; negatives
    // drawn per (anchor, positive) from a FIXED hash-sampled candidate
    // pool — the pool is a corpus-side md5-prefix filter (no anchor ×
    // corpus cross join, the pool broadcasts), ranked by md5(anchor:neg)
    // so the draw is deterministic on any engine/partitioning. Negatives
    // that are near-dups of the anchor are anti-joined out (they'd be
    // false negatives in the training sense). Scale shape: pairs join ×
    // broadcast pool; the only shuffle is the per-pair ranking window. ----
    QueryDef(
      "pl_contrastive_triplets",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val pairs = DedupOps.jaccardPairs(docs, $"doc_id", $"text", n = 3,
            threshold = 0.8, maxDf = 128)
          .select($"id_a".as("anchor"), $"id_b".as("positive"))
        val pool = docs
          .filter(substring(md5($"doc_id".cast("string").cast("binary")), 1, 2) < "10")
          .select($"doc_id".as("neg_id"))
          // a hash FRACTION alone grows with the corpus; the md5-ordered
          // LIMIT makes the pool a true fixed-size candidate set (and
          // stamps the bound into the plan — TakeOrdered → maxRows — so
          // the registry lint can prove the pairs×pool join bounded)
          .orderBy(md5($"neg_id".cast("string").cast("binary")), $"neg_id")
          .limit(256)
        val w = Window.partitionBy($"anchor", $"positive")
          .orderBy(md5(concat($"anchor".cast("string"), lit(":"),
            $"neg_id".cast("string")).cast("binary")))
        // symmetric near-dup exclusion: a pool doc that near-dups the
        // anchor in EITHER pair direction is a false negative
        val nearDup = pairs.select($"anchor", $"positive".as("neg_id"))
          .unionByName(pairs.select($"positive".as("anchor"),
            $"anchor".as("neg_id")))
        pairs.join(broadcast(pool))
          .filter($"neg_id" =!= $"anchor" && $"neg_id" =!= $"positive")
          .join(nearDup, Seq("anchor", "neg_id"), "left_anti")
          .withColumn("neg_rank", row_number().over(w))
          .filter($"neg_rank" <= 2)
          .select($"anchor", $"positive", $"neg_id", $"neg_rank")
          .orderBy($"anchor", $"positive", $"neg_rank")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM toks WHERE len(tk) >= 3),
        idx0 AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS shingle FROM sh),
        idx AS (
          SELECT doc_id, sz, shingle FROM (
            SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM idx0)
          WHERE df <= 128),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                 count(*) AS inter
          FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        pairs AS (
          SELECT id_a AS anchor, id_b AS positive FROM cand
          WHERE CAST(inter AS DOUBLE) / CAST(sz_a + sz_b - inter AS DOUBLE) >= 0.8),
        pool AS (
          SELECT doc_id AS neg_id FROM documents
          WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '10'
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
          LIMIT 256),
        cands AS (
          SELECT p.anchor, p.positive, n.neg_id
          FROM pairs p CROSS JOIN pool n
          WHERE n.neg_id <> p.anchor AND n.neg_id <> p.positive
            AND NOT EXISTS (SELECT 1 FROM pairs q
              WHERE (q.anchor = p.anchor AND q.positive = n.neg_id)
                 OR (q.positive = p.anchor AND q.anchor = n.neg_id))),
        ranked AS (
          SELECT anchor, positive, neg_id,
                 row_number() OVER (PARTITION BY anchor, positive
                   ORDER BY md5(CAST(anchor AS VARCHAR) || ':'
                     || CAST(neg_id AS VARCHAR))) AS neg_rank
          FROM cands)
        SELECT anchor, positive, neg_id, CAST(neg_rank AS BIGINT) AS neg_rank
        FROM ranked WHERE neg_rank <= 2
        ORDER BY anchor, positive, neg_rank""")),

    // ---- deterministic span masking (BERT/T5-style pretraining sample
    // prep): tokens are masked in spans of 3 — span s of doc d is masked
    // when md5(d:s) 8-bit prefix < 0x26 (≈15%) — a pure hash function of
    // (doc_id, span), so the same doc masks identically on any engine,
    // partitioning, or day (the reproducibility a 100 TB masking pass
    // needs; no RNG state). Shuffle-free row map; the masked text is
    // md5-fingerprinted so the oracle proves byte-equality of the full
    // corruption, not just counts. Spark's lambda index is 0-based and
    // DuckDB's is 1-based — the span formula aligns them. ----
    QueryDef(
      "pl_span_mask",
      (s, dir) => {
        import s.implicits._
        val toks = split(lower(trim($"text")), "\\s+")
        val masked = transform(toks, (t, i) =>
          when(substring(md5(concat($"doc_id".cast("string"), lit(":"),
              floor(i / 3).cast("int").cast("string")).cast("binary")), 1, 2) < "26",
            lit("<mask>")).otherwise(t))
        Tables.load(s, dir, "documents")
          .select($"doc_id",
            size(toks).cast("bigint").as("n_tokens"),
            aggregate(masked, lit(0L),
              (acc, t) => acc + when(t === "<mask>", 1L).otherwise(0L))
              .as("n_masked"),
            md5(concat_ws(" ", masked).cast("binary")).as("masked_md5"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents),
        m AS (
          SELECT doc_id, tk,
            list_transform(tk, (x, i) -> CASE
              WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':'
                || CAST((i - 1) // 3 AS VARCHAR)), 1, 2) < '26'
              THEN '<mask>' ELSE x END) AS mk
          FROM t)
        SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(mk, x -> x = '<mask>')) AS BIGINT) AS n_masked,
          md5(array_to_string(mk, ' ')) AS masked_md5
        FROM m ORDER BY doc_id""")),

    // ---- RAG retrieval plumbing end to end: overlapping char chunks →
    // feature-hashed embeddings (vocabulary-free, engine-independent —
    // the map stand-in a real model embedder swaps into) → IVF cells →
    // per-query top-k chunks. Every stage is the already-proven operator
    // (chunking posexplode, hashEmbed codegen, IvfOps cells); this entry
    // pins their COMPOSITION. Rows-only (iterative k-means); PipelineSpec
    // asserts exactness of the plumbing: an identical chunk planted under
    // a fresh query id retrieves the original at rank 1, cosine ≈ 1. ----
    QueryDef(
      "pl_rag_index",
      (s, dir) => {
        import s.implicits._
        val width = 256
        val stride = 200
        val dim = 32
        // Materialize embeddings ONCE before the IVF stage (what a real
        // index build does: embed → persist → index). Without the lineage
        // cut, Catalyst re-inlines the hashEmbed tree into every downstream
        // reference — 8 centroid distances + norm + dot. The repartition
        // fans the single small source file out to all cores for the embed
        // pass (at 100 TB the source is already many splits).
        val chunks = Tables.load(s, dir, "documents")
          .select($"doc_id", $"text",
            posexplode(sequence(lit(0),
              greatest(length($"text") - 1, lit(0)), lit(stride))))
          // chunk ordinal (pos = ordinal since sequence steps by stride),
          // scaled so ids never collide across docs: 1M chunks/doc headroom
          // (docs beyond 200M chars would need a wider scheme)
          .select(($"doc_id" * 1000000L + $"pos").as("chunk_id"),
            $"text".substr($"col" + 1, lit(width)).as("chunk"))
          .repartition(32)
          .withColumn("emb", TextOps.hashEmbed($"chunk", dim))
          .localCheckpoint()
        val queries = chunks.filter(
          $"chunk_id".isin(0L, 5000000L, 9000000L))
        IvfOps.ivfTopK(queries, chunks,
            $"chunk_id", $"emb", $"chunk_id", $"emb",
            k = 3, numCells = 8, nprobe = 4)
          .select($"q_id", $"rank", $"n_id", round($"cosine", 6).as("cosine"))
          .orderBy($"q_id", $"rank")
      },
      None,
      noOracleReason = Some(
        "the IVF stage embeds iterative k-means training; PipelineSpec pins " +
        "plumbing exactness end to end - an identical chunk planted under a fresh " +
        "query id retrieves the original at rank 1 with cosine ~= 1.")),

    // ---- RAG chunking with overlap (the oracle-checked sibling of
    // pl_rag_index's character chunker): token-grain sliding windows of
    // 64 tokens at stride 48 (16-token overlap, the context-preserving
    // shape retrieval pipelines actually ship). Pure per-row HOF work —
    // split → posexplode(sequence) → slice — codegen'd, zero shuffle; at
    // 100 TB the expansion is linear in tokens with no driver involvement.
    // The md5 chunk signature makes every boundary byte-exact under the
    // oracle: an off-by-one in stride, slice base, or tail clamping
    // breaks the hash. ----
    QueryDef(
      "pl_rag_chunk_overlap",
      (s, dir) => {
        import s.implicits._
        val chunkSize = 64
        val stride = 48
        val toks = Tables.load(s, dir, "documents")
          .select($"doc_id", split(lower(trim($"text")), "\\s+").as("tk"))
          .withColumn("n", size($"tk"))
          .filter($"n" >= 1)
        toks
          .select($"doc_id", $"n", $"tk",
            posexplode(sequence(lit(0), $"n" - 1, lit(stride)))
              .as(Seq("chunk_idx", "start")))
          .select($"doc_id",
            $"chunk_idx".cast("int").as("chunk_idx"),
            $"start".cast("int").as("start"),
            least(lit(chunkSize), $"n" - $"start").cast("int").as("n_tokens"),
            md5(array_join(slice($"tk", $"start" + 1, lit(chunkSize)), " "))
              .as("sig"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents),
        starts AS (
          SELECT doc_id, tk, len(tk) AS n, unnest(range(0, len(tk), 48)) AS st
          FROM toks WHERE len(tk) >= 1)
        SELECT doc_id, CAST(st/48 AS INT) AS chunk_idx, CAST(st AS INT) AS start,
          CAST(least(64, n - st) AS INT) AS n_tokens,
          md5(coalesce(array_to_string(tk[st+1 : st+64], ' '), '')) AS sig
        FROM starts ORDER BY doc_id, chunk_idx""")),

    // ---- training-mix solver (the datamix step every pretraining run
    // plans with): target domain shares (here ∝ 1/(1+source index),
    // normalized over the sources actually present) against the measured
    // per-source character mass → per-source sampling rate capped at 1.0
    // and the expected sampled mass, flagging under-supplied domains. Two
    // aggregates + one broadcast scalar; the normalizer is an aggregate
    // joined back (NOT an unpartitioned window), so the plan scales. ----
    QueryDef(
      "pl_mix_domain_weights",
      (s, dir) => {
        import s.implicits._
        val budget = 50000.0
        val m = Tables.load(s, dir, "documents")
          .groupBy($"source")
          .agg(count(lit(1)).as("docs"), sum($"n_chars").as("chars"))
          .withColumn("raw_w",
            lit(1.0) / (lit(1.0) + substring($"source", 4, 10).cast("double")))
        val z = m.agg(sum($"raw_w").as("z"))
        m.crossJoin(broadcast(z))
          .withColumn("share", $"raw_w" / $"z")
          .withColumn("rate", least(lit(1.0), $"share" * budget / $"chars"))
          .select($"source", $"docs", $"chars",
            round($"share", 6).as("target_share"),
            round($"rate", 6).as("sample_rate"),
            round($"rate" * $"chars", 0).cast("long").as("expected_chars"),
            ($"share" * budget > $"chars").as("undersupplied"))
          .orderBy($"source")
      },
      Some("""WITH m AS (
          SELECT source, CAST(count(*) AS BIGINT) AS docs,
            CAST(sum(n_chars) AS BIGINT) AS chars,
            1.0 / (1.0 + CAST(substr(source, 4, 10) AS DOUBLE)) AS raw_w
          FROM documents GROUP BY source),
        z AS (SELECT sum(raw_w) AS z FROM m)
        SELECT source, docs, chars,
          round(raw_w / z, 6) AS target_share,
          round(least(1.0, (raw_w / z) * 50000 / chars), 6) AS sample_rate,
          CAST(round(least(1.0, (raw_w / z) * 50000 / chars) * chars, 0) AS BIGINT)
            AS expected_chars,
          (raw_w / z) * 50000 > chars AS undersupplied
        FROM m CROSS JOIN z ORDER BY source""")),

    // ---- data-quality gate (dbt-test shape): null keys, constraint
    // violations, PK duplicates, referential orphans — ONE row-level scan
    // (conditional aggregates unpivoted via stack) plus one anti-join and
    // one PK group count; the report every ingest runs before promoting a
    // batch. ----
    QueryDef(
      "pl_data_quality_report",
      (s, dir) => {
        import s.implicits._
        val li = Tables.load(s, dir, "lineitem")
        val ord = Tables.load(s, dir, "orders")
        val rowChecks = li.agg(
            sum(when($"l_orderkey".isNull, 1L).otherwise(0L)).as("null_orderkey"),
            sum(when($"l_discount" < 0 || $"l_discount" > 0.2, 1L).otherwise(0L))
              .as("discount_out_of_range"),
            sum(when($"l_quantity" <= 0 || $"l_extendedprice" < 0, 1L)
              .otherwise(0L)).as("nonpositive_values"))
          .select(expr("""stack(3,
            'l_orderkey_null', null_orderkey,
            'discount_out_of_range', discount_out_of_range,
            'nonpositive_values', nonpositive_values) AS (check_name, violations)"""))
        val orphans = li
          .join(ord, $"l_orderkey" === $"o_orderkey", "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit("orphan_lineitems").as("check_name"), $"violations")
        val dupPk = li.groupBy($"l_orderkey", $"l_linenumber")
          .agg(count(lit(1)).as("c")).filter($"c" > 1)
          .agg(count(lit(1)).as("violations"))
          .select(lit("duplicate_pk").as("check_name"), $"violations")
        rowChecks.union(orphans).union(dupPk).orderBy($"check_name")
      },
      Some("""WITH rc AS (SELECT
            sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS null_orderkey,
            sum(CASE WHEN l_discount < 0 OR l_discount > 0.2 THEN 1 ELSE 0 END)
              AS discount_out_of_range,
            sum(CASE WHEN l_quantity <= 0 OR l_extendedprice < 0 THEN 1 ELSE 0 END)
              AS nonpositive_values
          FROM lineitem),
        orph AS (SELECT count(*) AS c FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
            WHERE o.o_orderkey = l.l_orderkey)),
        dup AS (SELECT count(*) AS c FROM (
          SELECT l_orderkey, l_linenumber FROM lineitem
          GROUP BY 1, 2 HAVING count(*) > 1))
        SELECT 'l_orderkey_null' AS check_name,
               CAST(null_orderkey AS BIGINT) AS violations FROM rc
        UNION ALL SELECT 'discount_out_of_range',
               CAST(discount_out_of_range AS BIGINT) FROM rc
        UNION ALL SELECT 'nonpositive_values',
               CAST(nonpositive_values AS BIGINT) FROM rc
        UNION ALL SELECT 'orphan_lineitems', c FROM orph
        UNION ALL SELECT 'duplicate_pk', c FROM dup
        ORDER BY check_name""")),

    // ---- deterministic epoch reshuffle: a fresh pseudo-random global
    // permutation per training epoch from md5(epoch:doc_id) — identical on
    // any engine/partitioning/rerun (no RNG state), and each epoch's order
    // is statistically independent of the last. Positions come from
    // [[graft.ops.LayoutOps.globalRowNumber]] (percentile range buckets →
    // within-bucket numbering → tiny offset join) — the EXACT global rank
    // with no single-partition window; lexicographic hex order ==
    // numeric-prefix order, so the bucketed rank reproduces DuckDB's plain
    // ORDER BY md5. Dump filtered to doc_id < 200 AFTER ranking (ranks are
    // over the full table; the filter only bounds the dumped rows). ----
    QueryDef(
      "pl_epoch_shuffle",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents").select($"doc_id")
        Seq(1, 2).map { ep =>
          val keyed = docs
            .withColumn("epoch", lit(ep))
            .withColumn("k", md5(concat(lit(s"$ep:"), $"doc_id").cast("binary")))
            .withColumn("kn",
              conv(substring($"k", 1, 15), 16, 10).cast("long"))
          graft.ops.LayoutOps
            .globalRowNumber(keyed, $"kn", Seq($"kn", $"k"), buckets = 8,
              outCol = "pos")
        }.reduce(_.unionByName(_))
          .filter($"doc_id" < 200)
          .select($"epoch", $"doc_id", $"pos")
          .orderBy($"epoch", $"pos")
      },
      Some("""WITH e AS (SELECT 1 AS epoch UNION ALL SELECT 2),
        k AS (
          SELECT e.epoch, d.doc_id,
            md5(e.epoch || ':' || d.doc_id) AS kk
          FROM documents d CROSS JOIN e),
        r AS (
          SELECT epoch, doc_id,
            row_number() OVER (PARTITION BY epoch ORDER BY kk) AS pos
          FROM k)
        SELECT epoch, doc_id, pos FROM r
        WHERE doc_id < 200 ORDER BY epoch, pos""")),

    // ---- DSIR importance resampling (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): score every raw
    // doc by how target-like its unigram distribution is, then keep the
    // top-K. Target distribution = the English slice of the corpus; the
    // feature space = the top-V corpus vocabulary (V=128, count-desc /
    // token-asc deterministic cut); Laplace(+1) smoothing over V. Doc
    // score = Σ_w c_w(doc)·[ln p_tgt(w) − ln p_raw(w)].
    //
    // Scale shape: ONE token-keyed shuffle computes raw+target counts in
    // the same combinable aggregate; the V-row vocabulary and its one-row
    // totals ride broadcasts, so the scoring join is map-side; the doc
    // score is a second (doc-keyed) shuffle; top-K is a TakeOrdered, never
    // a global sort. Scores round(,6) BEFORE ranking so the order
    // reproduces across engines (same rule as ext_text_bm25). ----
    QueryDef(
      "pl_importance_resample",
      (s, dir) => {
        import s.implicits._
        val V = 128
        val toks = Tables.load(s, dir, "documents")
          .select($"doc_id", $"source", $"lang",
            explode(TextOps.tokens($"text")).as("w"))
          .filter(length($"w") > 0)
        val counts = toks.groupBy($"w").agg(
          count(lit(1)).as("c_raw"),
          sum(when($"lang" === "en", 1L).otherwise(0L)).as("c_tgt"))
        val vocab = counts.orderBy($"c_raw".desc, $"w").limit(V)
        val tot = vocab.agg(
          sum($"c_raw").as("n_raw"), sum($"c_tgt").as("n_tgt"))
        val llr = vocab.crossJoin(broadcast(tot))
          .select($"w",
            (log(($"c_tgt" + 1).cast("double") / ($"n_tgt" + V).cast("double")) -
             log(($"c_raw" + 1).cast("double") / ($"n_raw" + V).cast("double")))
              .as("llr"))
        toks.join(broadcast(llr), "w")
          .groupBy($"doc_id", $"source")
          .agg(round(sum($"llr"), 6).as("score"),
            count(lit(1)).as("n_feat"))
          .orderBy($"score".desc, $"doc_id")
          .limit(20)
          .select($"doc_id", $"source", $"n_feat", $"score")
      },
      Some("""WITH toks AS (
          SELECT doc_id, source, lang,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
          FROM documents),
        t AS (SELECT * FROM toks WHERE len(w) > 0),
        counts AS (
          SELECT w, count(*) AS c_raw,
            sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
          FROM t GROUP BY w),
        vocab AS (SELECT * FROM counts ORDER BY c_raw DESC, w LIMIT 128),
        tot AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt FROM vocab),
        llr AS (
          SELECT w,
            ln(CAST(c_tgt + 1 AS DOUBLE) / CAST(n_tgt + 128 AS DOUBLE)) -
            ln(CAST(c_raw + 1 AS DOUBLE) / CAST(n_raw + 128 AS DOUBLE)) AS llr
          FROM vocab CROSS JOIN tot),
        scored AS (
          SELECT doc_id, source, round(sum(llr), 6) AS score,
            count(*) AS n_feat
          FROM t JOIN llr USING (w) GROUP BY doc_id, source)
        SELECT doc_id, source, n_feat, score
        FROM scored ORDER BY score DESC, doc_id LIMIT 20""")),

    // ---- leakage-safe group-holdout split: the split key is the SOURCE
    // (domain), not the doc — every doc of a domain lands on the same side,
    // so near-duplicates and templated siblings (which cluster within a
    // domain) can never straddle train/heldout. 'cc' = 204/256 ≈ 80% of
    // DOMAINS to train. Pure hash of the group key: no shuffle for the
    // assignment, one aggregate for the report; reproduces on any engine,
    // partitioning, or corpus size. ----
    QueryDef(
      "pl_group_holdout_split",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .withColumn("split",
            when(substring(md5(concat(lit("grp:"), $"source").cast("binary")),
              1, 2) < "cc", "train").otherwise("heldout"))
          .groupBy($"split")
          .agg(countDistinct($"source").as("n_sources"),
            count(lit(1)).as("n_docs"),
            sum($"n_chars").as("total_chars"))
          .orderBy($"split")
      },
      Some("""SELECT CASE WHEN substring(md5('grp:' || source), 1, 2) < 'cc'
                     THEN 'train' ELSE 'heldout' END AS split,
               count(DISTINCT source) AS n_sources, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1 ORDER BY split""")),

    // ---- corpus snapshot diff (the ingest-audit between two crawl
    // versions): v1/v2 membership and per-doc content fingerprints are
    // deterministic functions of the fixture (v1 drops doc_id%7=0, v2
    // drops doc_id%11=3 and rewrites doc_id%5=0), full-outer join on the
    // id classifies added/removed/changed/unchanged. Only (id, source,
    // 32-byte fp) ride the join — never document text — so the diff of a
    // 100 TB corpus shuffles GBs, not TBs. ----
    QueryDef(
      "pl_corpus_diff",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .select($"doc_id", $"source", md5($"text".cast("binary")).as("fp"))
        val v1 = docs.filter($"doc_id" % 7 =!= 0)
          .select($"doc_id", $"source", $"fp".as("fp1"))
        val v2 = docs.filter($"doc_id" % 11 =!= 3)
          .select($"doc_id", $"source",
            when($"doc_id" % 5 === 0,
              md5(concat($"fp", lit(":v2")).cast("binary")))
              .otherwise($"fp").as("fp2"))
        v1.join(v2, Seq("doc_id", "source"), "full_outer")
          .withColumn("status",
            when($"fp1".isNull, "added")
              .when($"fp2".isNull, "removed")
              .when($"fp1" === $"fp2", "unchanged")
              .otherwise("changed"))
          .groupBy($"status")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"source").as("n_sources"))
          .orderBy($"status")
      },
      Some("""WITH d AS (
          SELECT doc_id, source, md5(text) AS fp FROM documents),
        v1 AS (SELECT doc_id, source, fp AS fp1 FROM d WHERE doc_id % 7 <> 0),
        v2 AS (
          SELECT doc_id, source,
            CASE WHEN doc_id % 5 = 0 THEN md5(fp || ':v2') ELSE fp END AS fp2
          FROM d WHERE doc_id % 11 <> 3),
        j AS (
          SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
                 coalesce(v1.source, v2.source) AS source, fp1, fp2
          FROM v1 FULL OUTER JOIN v2
            ON v1.doc_id = v2.doc_id AND v1.source = v2.source)
        SELECT CASE WHEN fp1 IS NULL THEN 'added'
                    WHEN fp2 IS NULL THEN 'removed'
                    WHEN fp1 = fp2 THEN 'unchanged'
                    ELSE 'changed' END AS status,
               count(*) AS n_docs, count(DISTINCT source) AS n_sources
        FROM j GROUP BY 1 ORDER BY status""")),

    // ---- dedup threshold sweep (the tuning report run BEFORE committing a
    // corpus-wide dedup threshold): ONE shingle-index pass at the loosest
    // threshold, pairs banded by Jaccard decile — the marginal cost of the
    // sweep over a single-threshold run is zero extra shuffles. maxDf is
    // the same spec'd skew cut as the production pass, so the sweep
    // measures exactly what the real pass would do. ----
    QueryDef(
      "pl_dedup_threshold_sweep",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        DedupOps.jaccardPairs(docs, $"doc_id", $"text", n = 3,
            threshold = 0.5, maxDf = 128)
          .withColumn("band",
            when($"jaccard" >= 0.9, "[0.9,1.0]")
              .when($"jaccard" >= 0.8, "[0.8,0.9)")
              .when($"jaccard" >= 0.7, "[0.7,0.8)")
              .when($"jaccard" >= 0.6, "[0.6,0.7)")
              .otherwise("[0.5,0.6)"))
          .groupBy($"band")
          .agg(count(lit(1)).as("n_pairs"),
            round(avg($"jaccard"), 6).as("mean_jaccard"))
          .orderBy($"band")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM toks WHERE len(tk) >= 3),
        idx0 AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS shingle FROM sh),
        idx AS (
          SELECT doc_id, sz, shingle FROM (
            SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM idx0)
          WHERE df <= 128),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                 count(*) AS inter
          FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        pj AS (
          SELECT CAST(inter AS DOUBLE) / CAST(sz_a + sz_b - inter AS DOUBLE) AS j
          FROM cand),
        banded AS (
          SELECT CASE WHEN j >= 0.9 THEN '[0.9,1.0]'
                      WHEN j >= 0.8 THEN '[0.8,0.9)'
                      WHEN j >= 0.7 THEN '[0.7,0.8)'
                      WHEN j >= 0.6 THEN '[0.6,0.7)'
                      ELSE '[0.5,0.6)' END AS band, j
          FROM pj WHERE j >= 0.5)
        SELECT band, count(*) AS n_pairs, round(avg(j), 6) AS mean_jaccard
        FROM banded GROUP BY band ORDER BY band""")),

    // ---- cross-source duplication matrix (corpus forensics: which
    // sources copy from each other): near-dup pairs keyed to the unordered
    // (source, source) pair. The pair list is maxDf-bounded; attaching
    // sources is two id-keyed joins against an (id, source) projection —
    // text never rides the shuffle. ----
    QueryDef(
      "pl_cross_source_matrix",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val src = docs.select($"doc_id", $"source")
        val pairs = DedupOps.jaccardPairs(docs, $"doc_id", $"text", n = 3,
          threshold = 0.8, maxDf = 128)
        pairs
          .join(src.select($"doc_id".as("id_a"), $"source".as("src_a")), Seq("id_a"))
          .join(src.select($"doc_id".as("id_b"), $"source".as("src_b")), Seq("id_b"))
          .select(least($"src_a", $"src_b").as("source_1"),
            greatest($"src_a", $"src_b").as("source_2"))
          .groupBy($"source_1", $"source_2")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy($"source_1", $"source_2")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM toks WHERE len(tk) >= 3),
        idx0 AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS shingle FROM sh),
        idx AS (
          SELECT doc_id, sz, shingle FROM (
            SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM idx0)
          WHERE df <= 128),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                 count(*) AS inter
          FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        pairs AS (
          SELECT id_a, id_b FROM cand
          WHERE CAST(inter AS DOUBLE) / CAST(sz_a + sz_b - inter AS DOUBLE) >= 0.8),
        m AS (
          SELECT least(da.source, db.source) AS source_1,
                 greatest(da.source, db.source) AS source_2
          FROM pairs p
          JOIN documents da ON da.doc_id = p.id_a
          JOIN documents db ON db.doc_id = p.id_b)
        SELECT source_1, source_2, count(*) AS n_pairs
        FROM m GROUP BY 1, 2 ORDER BY source_1, source_2""")),

    // ---- rank-fusion quality ensemble: per-language percent-rank of each
    // quality signal (content quality score, doc length), averaged — the
    // scale-free way to combine incommensurable signals (no re-calibration
    // when a signal's distribution drifts), then bucketed into deciles for
    // the keep/downsample decision. Windows partition BY LANGUAGE — no
    // global sort; percent_rank is (rank-1)/(n-1) on both engines so the
    // fused score reproduces bit-for-bit. ----
    QueryDef(
      "pl_quality_ensemble",
      (s, dir) => {
        import s.implicits._
        val scored = Tables.load(s, dir, "documents")
          .select($"doc_id", $"lang", $"n_chars",
            TextOps.qualityScore($"text").as("q"))
        val wq = Window.partitionBy($"lang").orderBy($"q")
        val wl = Window.partitionBy($"lang").orderBy($"n_chars")
        scored
          .withColumn("r_q", percent_rank().over(wq))
          .withColumn("r_len", percent_rank().over(wl))
          .withColumn("ens", ($"r_q" + $"r_len") / 2)
          .withColumn("decile", least(floor($"ens" * 10), lit(9)).cast("int"))
          .groupBy($"lang", $"decile")
          .agg(count(lit(1)).as("n_docs"), round(avg($"ens"), 6).as("mean_ens"))
          .orderBy($"lang", $"decile")
      },
      Some("""WITH t AS (
          SELECT doc_id, lang, n_chars,
                 string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents),
        m AS (
          SELECT doc_id, lang, n_chars,
            CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS diversity,
            CAST(len(list_filter(tk, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
              / CAST(len(tk) AS DOUBLE) AS sr,
            CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE)
              / CAST(len(tk) AS DOUBLE) AS mtl
          FROM t),
        scored AS (
          SELECT doc_id, lang, n_chars,
            diversity * 0.6
              + (CASE WHEN sr BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END) * 0.2
              + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2 AS q
          FROM m),
        r AS (
          SELECT lang,
            percent_rank() OVER (PARTITION BY lang ORDER BY q) AS r_q,
            percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS r_len
          FROM scored),
        e AS (SELECT lang, (r_q + r_len) / 2 AS ens FROM r)
        SELECT lang, CAST(least(floor(ens * 10), 9) AS INT) AS decile,
               count(*) AS n_docs, round(avg(ens), 6) AS mean_ens
        FROM e GROUP BY 1, 2 ORDER BY lang, decile""")),

    // ---- token-budget allocation by waterfilling: spend budget B (here
    // half the corpus) across sources so no source exceeds the common cap
    // c, where c is the unique level with Σ min(tokens_i, c) = B — small
    // sources keep everything, big sources are clipped to c (the standard
    // fair-mixture rule). Closed form from ONE pass over the per-source
    // aggregate: sort ascending, the first position k where the residual-
    // budget-per-remaining-source fits under tokens_k yields c. The window
    // runs over the AGGREGATED per-source table (thousands of rows at
    // 100 TB, not the corpus); the corpus itself is touched once by the
    // combinable token-count aggregate. ----
    QueryDef(
      "pl_token_budget_alloc",
      (s, dir) => {
        import s.implicits._
        val perSrc = Tables.load(s, dir, "documents")
          .groupBy($"source")
          .agg(sum(TextOps.tokenCount($"text").cast("bigint")).as("t"))
        val tot = perSrc.agg(sum($"t").as("total"),
          count(lit(1)).as("n_src"))
        val w = Window.orderBy($"t", $"source")
        val cand = perSrc.crossJoin(broadcast(tot))
          .withColumn("b", $"total".cast("double") / 2)
          .withColumn("k", row_number().over(w))
          .withColumn("cum", sum($"t").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cap_cand",
            ($"b" - ($"cum" - $"t").cast("double")) / ($"n_src" - $"k" + 1))
        val cap = cand.filter($"cap_cand" <= $"t".cast("double"))
          .orderBy($"k").limit(1).select($"cap_cand".as("cap"))
        perSrc.crossJoin(broadcast(cap))
          .select($"source", $"t".as("tokens"),
            round(least($"t".cast("double"), $"cap"), 4).as("alloc"),
            round(least($"t".cast("double"), $"cap") / $"t", 6).as("keep_frac"))
          .orderBy($"source")
      },
      Some("""WITH per_src AS (
          SELECT source,
            CAST(sum(len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS t
          FROM documents GROUP BY source),
        tot AS (SELECT sum(t) AS total, count(*) AS n_src FROM per_src),
        cand AS (
          SELECT source, t, CAST(total AS DOUBLE) / 2 AS b,
            row_number() OVER (ORDER BY t, source) AS k,
            sum(t) OVER (ORDER BY t, source ROWS UNBOUNDED PRECEDING) AS cum,
            n_src
          FROM per_src CROSS JOIN tot),
        c2 AS (
          SELECT *, (b - CAST(cum - t AS DOUBLE)) / (n_src - k + 1) AS cap_cand
          FROM cand),
        cap AS (
          SELECT cap_cand AS cap FROM c2
          WHERE cap_cand <= CAST(t AS DOUBLE) ORDER BY k LIMIT 1)
        SELECT source, t AS tokens,
          round(least(CAST(t AS DOUBLE), cap), 4) AS alloc,
          round(least(CAST(t AS DOUBLE), cap) / t, 6) AS keep_frac
        FROM per_src CROSS JOIN cap ORDER BY source""")),

    // ---- the full dedup CASCADE as one funnel report (the production
    // composition every corpus actually runs, cheapest stage first so each
    // stage shrinks the next one's input): exact fingerprint dedup →
    // line-level boilerplate filter (drop docs that lose ≥half their
    // lines) → near-dup clustering (trigram Jaccard ≥ 0.8, connected
    // components, min-id keeper). Reports survivors after each stage —
    // the attrition numbers a data lead signs off on before a train run.
    // Every stage is the already-proven operator; this entry pins their
    // COMPOSITION end to end under one oracle. ----
    QueryDef(
      "pl_dedup_cascade",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
        // the funnel unions four stage counts; checkpoint each stage's
        // survivor set so the chain's expensive prefixes (fingerprint
        // window, line-dedup) run ONCE, not once per downstream branch
        // lazy checkpoints: materialized (and block-cached) on the query's
        // FIRST action, so the expensive prefixes still run once across the
        // four funnel branches — but nothing executes at construction time
        // (an eager checkpoint here ran the fingerprint window during
        // plan-only inspection and outside any bench-timed region)
        // first-per-fingerprint via min(struct) aggregation, not a window:
        // partial (map-side) aggregation collapses duplicate groups before
        // the shuffle and there is no per-partition sort — same surviving
        // rows (doc_id is unique, so min(struct(doc_id, text)) IS the
        // min-doc_id row of the fp group)
        val s1 = docs
          .groupBy(TextOps.fingerprint($"text").as("fp"))
          .agg(min(struct($"doc_id", $"text")).as("keep"))
          .select($"keep.doc_id".as("doc_id"), $"keep.text".as("text"))
          .localCheckpoint(eager = false)
        val ld = DedupOps.lineDedup(s1, $"doc_id", $"text",
          lineTokens = 8, minDf = 2)
        val s2 = s1.join(
          ld.filter($"n_kept" * 2 >= $"n_lines").select($"id".as("doc_id")),
          Seq("doc_id"))
          .localCheckpoint(eager = false)
        val pairs = DedupOps.jaccardPairs(s2, $"doc_id", $"text", n = 3,
          threshold = 0.8, maxDf = 128)
        val clusters = GraphOps.dedupClusters(s2, $"doc_id", pairs,
          $"id_a", $"id_b")
        val retired = clusters.filter(!$"is_keeper").select($"doc_id")
        val s3 = s2.join(retired, Seq("doc_id"), "left_anti")
        def stage(name: String, df: DataFrame) =
          df.agg(count(lit(1)).as("n_docs"))
            .select(lit(name).as("stage"), $"n_docs")
        stage("0_raw", docs).union(stage("1_exact", s1))
          .union(stage("2_line", s2)).union(stage("3_neardup", s3))
          .orderBy($"stage")
      },
      Some("""WITH RECURSIVE raw AS (SELECT doc_id, text FROM documents),
        fp AS (
          SELECT doc_id, text,
            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          FROM raw),
        s1 AS (
          SELECT doc_id, text FROM (
            SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
            FROM fp)
          WHERE rk = 1),
        t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM s1),
        lines AS (
          SELECT doc_id, u.i - 1 AS idx,
                 array_to_string(tk[(u.i-1)*8+1:(u.i-1)*8+8], ' ') AS line
          FROM t, unnest(range(1, CAST(ceil(len(tk) / 8.0) AS BIGINT) + 1)) u(i)),
        boiler AS (
          SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
        keptl AS (
          SELECT doc_id, count(*) AS n_kept FROM lines
          WHERE line NOT IN (SELECT line FROM boiler) GROUP BY doc_id),
        totl AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id),
        s2 AS (
          SELECT s1.doc_id, s1.text
          FROM s1 JOIN totl USING (doc_id) LEFT JOIN keptl USING (doc_id)
          WHERE coalesce(n_kept, 0) * 2 >= n_lines),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk FROM s2),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> array_to_string(tk[i:i+2], ' '))) AS shs
          FROM toks WHERE len(tk) >= 3),
        idx0 AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS shingle FROM sh),
        idx AS (
          SELECT doc_id, sz, shingle FROM (
            SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM idx0)
          WHERE df <= 128),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                 count(*) AS inter
          FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM cand
          WHERE CAST(inter AS DOUBLE) / CAST(sz_a + sz_b - inter AS DOUBLE) >= 0.8),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        reach AS (
          SELECT DISTINCT src AS id, src AS lab FROM sym
          UNION
          SELECT s.dst AS id, r.lab FROM reach r JOIN sym s ON s.src = r.id),
        retired AS (
          SELECT id AS doc_id FROM reach GROUP BY id HAVING id <> min(lab)),
        s3 AS (
          SELECT doc_id FROM s2
          WHERE doc_id NOT IN (SELECT doc_id FROM retired))
        SELECT '0_raw' AS stage, count(*) AS n_docs FROM raw
        UNION ALL SELECT '1_exact', count(*) FROM s1
        UNION ALL SELECT '2_line', count(*) FROM s2
        UNION ALL SELECT '3_neardup', count(*) FROM s3
        ORDER BY stage""")),

    // ---- per-filter ablation (which gate does the work?): for each of
    // the four keep-filters (quality score, language, length, Gopher
    // alpha/symbol), the docs it fails and the docs ONLY it fails — the
    // unique-contribution read that tells you which filter to tune and
    // which is redundant. ONE shuffle-free scan computes every flag;
    // everything after is a single global aggregate unpivoted via stack.
    // The `all_pass` row repeats the survivors count in both columns. ----
    QueryDef(
      "pl_filter_ablation",
      (s, dir) => {
        import s.implicits._
        val f = Tables.load(s, dir, "documents").select(
          (TextOps.qualityScore($"text") >= 0.5).as("f_quality"),
          (TextOps.langId($"text") === "en").as("f_lang"),
          TextOps.tokenCount($"text").between(5, 1000).as("f_len"),
          (TextOps.alphaWordRatio($"text") >= 0.8 &&
            TextOps.symbolRatio($"text") <= 0.25).as("f_gopher"))
        def fails(c: org.apache.spark.sql.Column) =
          sum(when(!c, 1L).otherwise(0L))
        def onlyFails(c: org.apache.spark.sql.Column,
            others: org.apache.spark.sql.Column*) =
          sum(when(!c && others.reduce(_ && _), 1L).otherwise(0L))
        f.agg(
            fails($"f_quality").as("q_f"),
            onlyFails($"f_quality", $"f_lang", $"f_len", $"f_gopher").as("q_o"),
            fails($"f_lang").as("l_f"),
            onlyFails($"f_lang", $"f_quality", $"f_len", $"f_gopher").as("l_o"),
            fails($"f_len").as("n_f"),
            onlyFails($"f_len", $"f_quality", $"f_lang", $"f_gopher").as("n_o"),
            fails($"f_gopher").as("g_f"),
            onlyFails($"f_gopher", $"f_quality", $"f_lang", $"f_len").as("g_o"),
            sum(when($"f_quality" && $"f_lang" && $"f_len" && $"f_gopher", 1L)
              .otherwise(0L)).as("pass_all"))
          .select(expr("""stack(5,
            'all_pass', pass_all, pass_all,
            'gopher', g_f, g_o,
            'lang', l_f, l_o,
            'length', n_f, n_o,
            'quality', q_f, q_o) AS (filter_name, n_fail, n_only_fail)"""))
          .orderBy($"filter_name")
      },
      Some("""WITH t AS (
          SELECT doc_id,
            string_split_regex(lower(trim(text)), '\s+') AS tk,
            regexp_replace(lower(trim(text)), '\s+', '', 'g') AS ns
          FROM documents),
        m AS (
          SELECT doc_id, len(tk) AS n_tokens,
            CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS diversity,
            CAST(len(list_filter(tk, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
              / len(tk) AS sr,
            CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE)
              / len(tk) AS mtl,
            len(list_filter(tk, x -> x IN ('the','a','of','and'))) AS s_en,
            len(list_filter(tk, x -> x IN ('der','die','und','ist'))) AS s_de,
            len(list_filter(tk, x -> x IN ('le','la','et','est'))) AS s_fr,
            len(list_filter(tk, x -> x IN ('el','la','y','es'))) AS s_es,
            CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
              / len(tk) AS alpha_ratio,
            1.0 - CAST(length(regexp_replace(ns, '[^a-z0-9]', '', 'g')) AS DOUBLE)
              / nullif(length(ns), 0) AS symbol_ratio
          FROM t),
        f AS (
          SELECT
            (diversity * 0.6
              + (CASE WHEN sr BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END) * 0.2
              + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2)
              >= 0.5 AS f_quality,
            (CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                  ELSE 'es' END) = 'en' AS f_lang,
            n_tokens BETWEEN 5 AND 1000 AS f_len,
            (alpha_ratio >= 0.8 AND symbol_ratio <= 0.25) AS f_gopher
          FROM m),
        a AS (SELECT
            CAST(sum(CASE WHEN NOT f_quality THEN 1 ELSE 0 END) AS BIGINT) AS q_f,
            CAST(sum(CASE WHEN NOT f_quality AND f_lang AND f_len AND f_gopher
              THEN 1 ELSE 0 END) AS BIGINT) AS q_o,
            CAST(sum(CASE WHEN NOT f_lang THEN 1 ELSE 0 END) AS BIGINT) AS l_f,
            CAST(sum(CASE WHEN NOT f_lang AND f_quality AND f_len AND f_gopher
              THEN 1 ELSE 0 END) AS BIGINT) AS l_o,
            CAST(sum(CASE WHEN NOT f_len THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
            CAST(sum(CASE WHEN NOT f_len AND f_quality AND f_lang AND f_gopher
              THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
            CAST(sum(CASE WHEN NOT f_gopher THEN 1 ELSE 0 END) AS BIGINT) AS g_f,
            CAST(sum(CASE WHEN NOT f_gopher AND f_quality AND f_lang AND f_len
              THEN 1 ELSE 0 END) AS BIGINT) AS g_o,
            CAST(sum(CASE WHEN f_quality AND f_lang AND f_len AND f_gopher
              THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
          FROM f)
        SELECT 'all_pass' AS filter_name, pass_all AS n_fail,
               pass_all AS n_only_fail FROM a
        UNION ALL SELECT 'gopher', g_f, g_o FROM a
        UNION ALL SELECT 'lang', l_f, l_o FROM a
        UNION ALL SELECT 'length', n_f, n_o FROM a
        UNION ALL SELECT 'quality', q_f, q_o FROM a
        ORDER BY filter_name""")),

    // ---- incremental aggregate maintenance (materialized-view refresh):
    // the per-(user, event_type) rollup is maintained by aggregating ONLY
    // the newly-ingested partition and algebraically merging it into the
    // stored partial state — sum folds into sum, count into sum, max into
    // max. At 100 TB the base table is never re-scanned on ingest: refresh
    // cost is O(delta + aggregate size). Money sums stay DECIMAL end to end
    // so the merge is exact under any partition/merge order; the DuckDB
    // oracle recomputes the rollup DIRECTLY from all rows, so a hash match
    // proves merge(partials) == direct aggregation. ----
    QueryDef(
      "pl_incremental_agg",
      (s, dir) => {
        import s.implicits._
        val money = DecimalType(12, 2)
        val cutoff = lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
        def partial(df: DataFrame): DataFrame =
          df.groupBy($"user_id", $"event_type")
            .agg(
              count(lit(1)).as("n_events"),
              sum($"value".cast(money)).as("sum_value"),
              max($"ts").as("last_ts"))
        val ev = Tables.load(s, dir, "events")
        val stored = partial(ev.filter($"ts" < cutoff)) // the materialized state
        val delta = partial(ev.filter($"ts" >= cutoff)) // only the new partition
        stored.unionByName(delta)
          .groupBy($"user_id", $"event_type")
          .agg(
            sum($"n_events").as("n_events"),
            sum($"sum_value").cast("double").as("sum_value"),
            max($"last_ts").as("last_ts"))
          .orderBy($"user_id", $"event_type")
      },
      Some("""SELECT user_id, event_type,
          CAST(count(*) AS BIGINT) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
          max(ts) AS last_ts
        FROM events
        GROUP BY user_id, event_type
        ORDER BY user_id, event_type""")),

    // ---- CDC change-log compaction (Debezium-style apply): the event
    // stream read as an ordered per-key change ledger — signup/click/view/
    // purchase upsert the row, 'error' is a tombstone — collapsed to the
    // final snapshot by keeping each key's LAST change and dropping keys
    // whose last change is a delete. ONE user-keyed shuffle; the rk=1
    // filter plans into Spark's map-side per-group top-k
    // (WindowGroupLimitExec), so at most one row per key per mapper
    // reaches the exchange regardless of ledger length. ----
    QueryDef(
      "pl_cdc_apply",
      (s, dir) => {
        import s.implicits._
        val changes = Tables.load(s, dir, "events")
          .select($"user_id", $"ts", $"event_id",
            when($"event_type" === "error", lit("D")).otherwise(lit("U")).as("op"),
            $"value")
        changes
          .withColumn("rk", row_number().over(
            Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)))
          .filter($"rk" === 1 && $"op" =!= "D")
          .select($"user_id", $"value", $"ts".as("updated_at"))
          .orderBy($"user_id")
      },
      Some("""WITH c AS (
          SELECT user_id, ts, event_id,
            CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rk
          FROM events)
        SELECT user_id, value, ts AS updated_at
        FROM c WHERE rk = 1 AND op <> 'D'
        ORDER BY user_id""")),

    // ---- span-level decontamination (GPT-3 appendix-C shape): instead of
    // dropping whole documents that overlap the eval set, remove only the
    // contaminated token SPANS — every token covered by a trigram that
    // appears in any probe document — and keep the rest. The probe trigram
    // set is distinct-deduped and rides a broadcast (eval suites are tiny
    // next to a 100 TB corpus); the corpus contributes one positional-
    // trigram explode + one doc-keyed aggregate of hit positions, then the
    // rewrite is a shuffle-free per-row array filter. The cleaned text is
    // md5-digested so the full rewrite is hash-verified without shipping
    // text through the compare. ----
    QueryDef(
      "pl_decontaminate_spans",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val base = docs.filter($"doc_id" >= 25)
          .select($"doc_id", TextOps.tokens($"text").as("tk"))
          .withColumn("n", size($"tk"))
        val probeTris = docs.filter($"doc_id" < 25)
          .select(explode(TextOps.shingles($"text", 3)).as("tri"))
          .distinct()
        // 1-based trigram start positions; pos+1 recovers the start index
        val hits = base.filter($"n" >= 3)
          .select($"doc_id", posexplode(expr(
            "transform(sequence(1, n - 2), i -> concat_ws(' ', slice(tk, i, 3)))")))
          .select($"doc_id", ($"pos" + 1).as("start"), $"col".as("tri"))
          .join(broadcast(probeTris), "tri")
          .select($"doc_id", explode(expr("array(start, start + 1, start + 2)")).as("p"))
          .groupBy($"doc_id").agg(collect_set($"p").as("bad"))
        base.join(hits, Seq("doc_id"), "left")
          .withColumn("bad", coalesce($"bad", typedLit(Array.empty[Int])))
          .withColumn("clean_tk",
            expr("filter(tk, (t, i) -> NOT array_contains(bad, i + 1))"))
          .select($"doc_id", $"n".as("n_tokens"),
            ($"n" - size($"clean_tk")).as("n_removed"),
            md5(concat_ws(" ", $"clean_tk")).as("clean_md5"))
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents),
        pt AS (
          SELECT DISTINCT unnest(list_distinct(list_transform(
                   range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))) AS tri
          FROM toks WHERE doc_id < 25 AND len(tk) >= 3),
        ct AS (
          SELECT doc_id, unnest(range(1, len(tk) - 1)) AS start, tk
          FROM toks WHERE doc_id >= 25 AND len(tk) >= 3),
        hit AS (
          SELECT ct.doc_id, ct.start
          FROM ct JOIN pt ON array_to_string(ct.tk[ct.start:ct.start+2], ' ') = pt.tri),
        bad AS (
          SELECT doc_id, list(DISTINCT p) AS bad FROM (
            SELECT doc_id, unnest([start, start + 1, start + 2]) AS p FROM hit)
          GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.tk) AS INT) AS n_tokens,
          CAST(len(t.tk) - len(list_filter(t.tk,
            (x, i) -> NOT list_contains(coalesce(b.bad, []), i))) AS INT) AS n_removed,
          md5(coalesce(array_to_string(list_filter(t.tk,
            (x, i) -> NOT list_contains(coalesce(b.bad, []), i)), ' '), '')) AS clean_md5
        FROM toks t LEFT JOIN bad b USING (doc_id)
        WHERE t.doc_id >= 25
        ORDER BY t.doc_id""")),

    // ---- retrieve → rerank (the two-stage RAG serving shape): a cheap
    // wide recall pass (cosine top-10 per query; the IVF/LSH siblings are
    // the at-scale recall paths — brute cosine keeps this entry
    // oracle-exact) feeds a rich scorer over ONLY the 10 candidates:
    // hybrid score = 0.8·cosine + 0.2·metadata boost (label agreement) —
    // the "vector recall, business-logic rerank" split every production
    // retrieval stack runs, with the expensive scorer touching k rows per
    // query, never the corpus. Both ranking windows partition BY QUERY. ----
    QueryDef(
      "pl_rag_rerank",
      (s, dir) => {
        import s.implicits._
        val emb = Tables.load(s, dir, "embeddings")
          .select($"vec_id", graft.ops.VectorOps.vecD($"embedding").as("ve"), $"label")
        val queries = emb.filter($"vec_id" < 3)
          .select($"vec_id".as("q_id"), $"ve".as("q_ve"), $"label".as("q_label"))
        val w = Window.partitionBy($"q_id")
        val recalled = emb.crossJoin(broadcast(queries))
          .filter($"vec_id" =!= $"q_id")
          .select($"q_id", $"q_label", $"vec_id".as("n_id"), $"label",
            (graft.ops.VectorOps.dot($"q_ve", $"ve") /
              (graft.ops.VectorOps.l2norm($"q_ve") *
                graft.ops.VectorOps.l2norm($"ve"))).as("cosine"))
          .withColumn("r_recall",
            row_number().over(w.orderBy($"cosine".desc, $"n_id")))
          .filter($"r_recall" <= 10)
        recalled
          .withColumn("final_score", round(
            $"cosine" * 0.8 +
              when($"label" === $"q_label", 0.2).otherwise(0.0), 6))
          .withColumn("rank",
            row_number().over(w.orderBy($"final_score".desc, $"n_id")))
          .filter($"rank" <= 3)
          .select($"q_id", $"rank", $"n_id", $"final_score")
          .orderBy($"q_id", $"rank")
      },
      Some("""WITH v AS (
          SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
          FROM embeddings),
        scored AS (
          SELECT q.vec_id AS q_id, q.label AS q_label,
            c.vec_id AS n_id, c.label,
            list_sum(list_transform(list_zip(q.ve, c.ve), s2 -> s2[1] * s2[2]))
              / (sqrt(list_sum(list_transform(list_zip(q.ve, q.ve), s2 -> s2[1] * s2[2])))
               * sqrt(list_sum(list_transform(list_zip(c.ve, c.ve), s2 -> s2[1] * s2[2]))))
              AS cosine
          FROM v q JOIN v c ON q.vec_id < 3 AND c.vec_id <> q.vec_id),
        recalled AS (
          SELECT * FROM (
            SELECT q_id, q_label, n_id, label, cosine,
              row_number() OVER (PARTITION BY q_id
                ORDER BY cosine DESC, n_id) AS r_recall
            FROM scored)
          WHERE r_recall <= 10),
        reranked AS (
          SELECT q_id, n_id,
            round(cosine * 0.8 +
              CASE WHEN label = q_label THEN 0.2 ELSE 0.0 END, 6) AS final_score
          FROM recalled)
        SELECT q_id, CAST(rank AS INT) AS rank, n_id, final_score FROM (
          SELECT q_id, n_id, final_score,
            row_number() OVER (PARTITION BY q_id
              ORDER BY final_score DESC, n_id) AS rank
          FROM reranked)
        WHERE rank <= 3 ORDER BY q_id, rank""")),

    // ---- dataset card (the per-source datasheet a training-data release
    // publishes): docs, token mass, English share, exact-duplicate rate,
    // mean quality — per source, from ONE scan (all signals are per-row
    // codegen'd) + one aggregate shuffle on source. ----
    QueryDef(
      "pl_dataset_card",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"source",
            TextOps.langId($"text").as("lg"),
            TextOps.qualityScore($"text").as("q"),
            TextOps.tokenCount($"text").cast("bigint").as("nt"),
            TextOps.fingerprint($"text").as("fp"))
          .groupBy($"source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"nt").as("total_tokens"),
            (round(sum(when($"lg" === "en", 1L).otherwise(0L)) /
              count(lit(1)).cast("double"), 4) + lit(0)).as("pct_en"),
            (round(lit(1.0) - countDistinct($"fp") /
              count(lit(1)).cast("double"), 4) + lit(0)).as("dup_rate"),
            (round(avg($"q"), 4) + lit(0)).as("avg_quality"))
          .orderBy($"source")
      },
      Some("""WITH t AS (
          SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS tk,
                 md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          FROM documents),
        m AS (
          SELECT doc_id, source, fp,
            CAST(len(tk) AS BIGINT) AS n_tokens,
            CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS diversity,
            CAST(len(list_filter(tk, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
              / CAST(len(tk) AS DOUBLE) AS sr,
            CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE)
              / CAST(len(tk) AS DOUBLE) AS mtl,
            len(list_filter(tk, x -> x IN ('the','a','of','and'))) AS s_en,
            len(list_filter(tk, x -> x IN ('der','die','und','ist'))) AS s_de,
            len(list_filter(tk, x -> x IN ('le','la','et','est'))) AS s_fr,
            len(list_filter(tk, x -> x IN ('el','la','y','es'))) AS s_es
          FROM t),
        scored AS (
          SELECT source, fp, n_tokens,
            diversity * 0.6
              + (CASE WHEN sr BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END) * 0.2
              + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2 AS quality,
            CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                 WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                 WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                 WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                 ELSE 'es' END AS lang_guess
          FROM m)
        SELECT source,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
          round(CAST(sum(CASE WHEN lang_guess = 'en' THEN 1 ELSE 0 END) AS BIGINT)
            / CAST(count(*) AS DOUBLE), 4) + 0 AS pct_en,
          round(1.0 - count(DISTINCT fp) / CAST(count(*) AS DOUBLE), 4) + 0 AS dup_rate,
          round(avg(quality), 4) + 0 AS avg_quality
        FROM scored GROUP BY source ORDER BY source""")),

    // ---- tokenizer fertility by language (subwords per word — the
    // multilingual-tokenizer health metric: high-fertility languages burn
    // context budget and train worse): whitespace words vs the BPE-ish
    // subword estimate, both integer sums (exact under any partitioning),
    // per detected language. One scan, one aggregate shuffle. ----
    QueryDef(
      "pl_tokenizer_fertility",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select(TextOps.langId($"text").as("lang_guess"),
            TextOps.tokenCount($"text").cast("bigint").as("nw"),
            TextOps.subwordCountEstimate($"text").as("nsw"))
          .groupBy($"lang_guess")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"nw").as("total_words"),
            sum($"nsw").as("total_subwords"),
            (round(sum($"nsw") / sum($"nw").cast("double"), 4) + lit(0))
              .as("fertility"))
          .orderBy($"lang_guess")
      },
      Some("""WITH t AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk,
                 string_split_regex(lower(trim(text)), '[^a-z0-9]+') AS pieces
          FROM documents),
        m AS (
          SELECT doc_id,
            CAST(len(tk) AS BIGINT) AS nw,
            CAST(list_sum(list_transform(pieces,
              w -> greatest(CAST(ceil(length(w) / 4.0) AS BIGINT), 1))) AS BIGINT) AS nsw,
            len(list_filter(tk, x -> x IN ('the','a','of','and'))) AS s_en,
            len(list_filter(tk, x -> x IN ('der','die','und','ist'))) AS s_de,
            len(list_filter(tk, x -> x IN ('le','la','et','est'))) AS s_fr,
            len(list_filter(tk, x -> x IN ('el','la','y','es'))) AS s_es
          FROM t),
        g AS (
          SELECT nw, nsw,
            CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                 WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                 WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                 WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                 ELSE 'es' END AS lang_guess
          FROM m)
        SELECT lang_guess, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(nw) AS BIGINT) AS total_words,
          CAST(sum(nsw) AS BIGINT) AS total_subwords,
          round(CAST(sum(nsw) AS BIGINT) / CAST(CAST(sum(nw) AS BIGINT) AS DOUBLE), 4) + 0
            AS fertility
        FROM g GROUP BY lang_guess ORDER BY lang_guess""")),

    // ---- right-to-erasure propagation report (the GDPR/CCPA batch every
    // serving stack runs): a deterministic forget-list (stand-in for the
    // erasure-request table) broadcast-probes each fact table; the report
    // counts rows to erase vs keep per table WITHOUT materializing the
    // erased set — semi/anti probes only, the forget list never shuffles
    // the facts. ----
    QueryDef(
      "pl_forget_user",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
        val ord = Tables.load(s, dir, "orders")
        val forget = ev.select($"user_id".as("f_uid")).distinct()
          .filter($"f_uid" % 97 === 0)
        def report(df: DataFrame, key: org.apache.spark.sql.Column,
            table: String): DataFrame = {
          val hit = df.join(broadcast(forget), key === forget("f_uid"), "left_semi")
          val kept = df.join(broadcast(forget), key === forget("f_uid"), "left_anti")
          hit.agg(count(lit(1)).as("n_erase")).crossJoin(
            kept.agg(count(lit(1)).as("n_keep")))
            .select(lit(table).as("table_name"), $"n_erase", $"n_keep")
        }
        report(ev, $"user_id", "events")
          .unionByName(report(ord, $"o_custkey", "orders"))
          .orderBy($"table_name")
      },
      Some("""WITH forget AS (
          SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0)
        SELECT 'events' AS table_name,
          CAST((SELECT count(*) FROM events e
                WHERE EXISTS (SELECT 1 FROM forget f WHERE f.user_id = e.user_id))
            AS BIGINT) AS n_erase,
          CAST((SELECT count(*) FROM events e
                WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.user_id = e.user_id))
            AS BIGINT) AS n_keep
        UNION ALL
        SELECT 'orders',
          CAST((SELECT count(*) FROM orders o
                WHERE EXISTS (SELECT 1 FROM forget f WHERE f.user_id = o.o_custkey))
            AS BIGINT),
          CAST((SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.user_id = o.o_custkey))
            AS BIGINT)
        ORDER BY table_name""")),

    // ---- Preference-pair construction (DPO/RLHF reward-model data prep):
    // within each (source, lang) prompt group, pair the highest-quality
    // document ("chosen") with the lowest ("rejected") and record the score
    // margin. Quality here is the alpha-character fraction — deterministic
    // and replayable in SQL; the production score plugs in the same way
    // (see pl_quality_ensemble). Shape: one per-row codegen'd score map,
    // then both ranking windows and the group count share the SAME
    // (source, lang) exchange, and the final groupBy re-uses that
    // partitioning — one shuffle end to end, no driver materialization.
    // Tie-breaks are total (score, then doc_id) so the pair is unique. ----
    QueryDef(
      "pl_preference_pairs",
      (s, dir) => {
        import s.implicits._
        val grp = Window.partitionBy($"source", $"lang")
        val scored = Tables.load(s, dir, "documents")
          .select($"doc_id", $"source", $"lang",
            (length(regexp_replace($"text", "[^a-zA-Z]", "")).cast("double") /
              expr("nullif(length(text), 0)")).as("score"))
        scored
          // NULL scores (empty text): Spark ASC defaults NULLS FIRST but
          // DuckDB defaults NULLS LAST — pin asc_nulls_last so a null-score
          // doc can never become the "rejected" pick on one engine only
          // (DESC agrees already: both engines put nulls last)
          .withColumn("rb", row_number().over(grp.orderBy($"score".desc, $"doc_id")))
          .withColumn("rw", row_number().over(
            grp.orderBy($"score".asc_nulls_last, $"doc_id")))
          .withColumn("n", count(lit(1)).over(grp))
          .filter($"n" >= 2)
          .groupBy($"source", $"lang")
          .agg(
            max(when($"rb" === 1, $"doc_id")).as("chosen_id"),
            max(when($"rw" === 1, $"doc_id")).as("rejected_id"),
            round(max(when($"rb" === 1, $"score")) -
              max(when($"rw" === 1, $"score")), 6).as("margin"))
          .orderBy($"source", $"lang")
      },
      Some("""WITH scored AS (
          SELECT doc_id, source, lang,
            CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
              / nullif(length(text), 0) AS score
          FROM documents),
        ranked AS (
          SELECT *,
            row_number() OVER (PARTITION BY source, lang
              ORDER BY score DESC, doc_id) AS rb,
            row_number() OVER (PARTITION BY source, lang
              ORDER BY score ASC, doc_id) AS rw,
            count(*) OVER (PARTITION BY source, lang) AS n
          FROM scored)
        SELECT source, lang,
          max(CASE WHEN rb = 1 THEN doc_id END) AS chosen_id,
          max(CASE WHEN rw = 1 THEN doc_id END) AS rejected_id,
          round(max(CASE WHEN rb = 1 THEN score END)
            - max(CASE WHEN rw = 1 THEN score END), 6) AS margin
        FROM ranked WHERE n >= 2 GROUP BY source, lang
        ORDER BY source, lang""")),

    // ---- the pipeline → lakehouse handoff under the oracle gate: a
    // quality-gated corpus lands in a PARTITIONED gdisk table (hive
    // `lang=` dirs, executor fanout writers) and the readback aggregates
    // per partition — at 100 TB this is exactly how a training corpus is
    // laid down (partitioned by the mixing key, so downstream per-lang
    // sampling reads only its dirs). The hash proves the clean gate, the
    // fanout routing, and the partition round-trip all at once. ----
    QueryDef(
      "pl_corpus_to_lake",
      (s, dir) => {
        import s.implicits._
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("documents"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.lake_docs")
        s.sql("""CREATE TABLE gdisk.verify.lake_docs (
          doc_id BIGINT, lang STRING, nchars BIGINT)
          PARTITIONED BY (lang)""")
        s.sql("""INSERT INTO gdisk.verify.lake_docs
          SELECT doc_id, lang, length(text) AS nchars FROM documents
          WHERE length(text) >= 100
            AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) AS DOUBLE)
                / length(text) >= 0.5""")
        s.sql("""SELECT lang, count(*) AS n_docs,
            sum(nchars) AS total_chars, min(doc_id) AS first_doc
          FROM gdisk.verify.lake_docs GROUP BY lang ORDER BY lang""")
      },
      Some("""WITH kept AS (
          SELECT doc_id, lang, length(text) AS nchars FROM documents
          WHERE length(text) >= 100
            AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                / length(text) >= 0.5)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nchars) AS BIGINT) AS total_chars,
               CAST(min(doc_id) AS BIGINT) AS first_doc
        FROM kept GROUP BY lang ORDER BY lang"""))
  )

  /** DuckDB-side Morton interleave: same shift/and/add expansion as
    * [[graft.ops.LayoutOps.zValue2]], generated for `bits` bit positions. */
  private def zOracleExpr(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
}
