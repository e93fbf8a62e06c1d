package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (BASELINE.json north star):
  * token counting, n-gram shingling, quality scoring, language-ID heuristic,
  * document fingerprinting. All are per-row codegen'd expressions — no UDFs,
  * no shuffle — so they stream over a 100 TB corpus.
  */
object TextOps {

  /** Whitespace tokens of lowercased text. */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** One-pass token/char statistics struct ([[graft.functions.TextStats]]):
    * every quality/language leaf below reads a field of it instead of
    * re-running an interpreted higher-order-function chain over a fresh
    * tokenization (HOFs are CodegenFallback — a quality+langid projection
    * cost ~10 interpreted array walks per row). Field values are
    * bit-identical to the HOF compositions they replace (OpsSpec parity);
    * the ratio DIVISIONS stay here in column space, unchanged, so the
    * final doubles are the same IEEE expressions as before. */
  private def stats(c: Column): Column =
    graft.functions.NativeFunctions.text_stats(c)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = stats(c).getField("n_tokens")

  /** BPE-ish subword count estimate: word-piece regex splits on letter/digit
    * boundaries, then ceil(chars/4) per long run approximates merges. The
    * split class is `[^a-z0-9]+` (over lowercased text) — deliberately the
    * same ASCII class the DuckDB oracle uses, so the estimate is
    * engine-agnostic even for non-ASCII corpora. */
  def subwordCountEstimate(c: Column): Column = {
    val pieces = split(lower(trim(c)), "[^a-z0-9]+")
    aggregate(
      pieces, lit(0L),
      (acc, w) => acc + greatest(ceil(length(w) / 4.0).cast("long"), lit(1L)))
  }

  /** Distinct word n-gram shingles (default 3) — the unit for Jaccard
    * near-dup detection. Rows with fewer than n tokens yield an empty set.
    * Native expression ([[graft.functions.WordShingles]]): semantically
    * array_distinct(transform(sequence…, concat_ws(slice…))) but one static
    * call instead of a four-deep HOF tree (which dominates single-shot query
    * time via codegen size). */
  def shingles(c: Column, n: Int = 3): Column =
    graft.functions.NativeFunctions.word_shingles(tokens(c), n)

  /** Unicode canonicalization (NFC default; NFKC + casefold for aggressive
    * cleanup) — run BEFORE dedup/fingerprinting so combining-accent vs
    * precomposed spellings hash identically. Native codegen'd expression
    * ([[graft.functions.UnicodeNormalize]]). */
  def normalizeText(c: Column, form: String = "NFC", casefold: Boolean = false): Column =
    graft.functions.NativeFunctions.unicode_normalize(c, form, casefold)

  /** Accent/diacritic removal (NFD + drop combining marks), the
    * cross-lingual fold applied after [[normalizeText]] — matches DuckDB's
    * `strip_accents`. Native codegen'd ([[graft.functions.StripAccents]]). */
  def stripAccents(c: Column): Column =
    graft.functions.NativeFunctions.strip_accents(c)

  /** Ratio of distinct tokens to tokens — low values indicate repetitive,
    * low-quality text. */
  def uniqueTokenRatio(c: Column): Column = {
    val s = stats(c)
    s.getField("n_distinct").cast("double") / s.getField("n_tokens").cast("double")
  }

  /** Ratio of tokens that are common-word stopwords. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(c: Column): Column = {
    val s = stats(c)
    s.getField("n_stop").cast("double") / s.getField("n_tokens").cast("double")
  }

  /** Mean token length in characters. */
  def meanTokenLen(c: Column): Column = {
    val s = stats(c)
    s.getField("sum_len").cast("double") / s.getField("n_tokens").cast("double")
  }

  /** Composite quality score in [0,1]: rewards vocabulary diversity and a
    * sane stopword share, penalizes degenerate token lengths. ONE stats
    * struct feeds all three legs (shared subtree → one kernel pass per
    * row under subexpression elimination). */
  def qualityScore(c: Column): Column = {
    val s = stats(c)
    val nTok = s.getField("n_tokens").cast("double")
    val diversity = s.getField("n_distinct").cast("double") / nTok
    val stopOk = when(
      (s.getField("n_stop").cast("double") / nTok).between(0.01, 0.6),
      lit(1.0)).otherwise(lit(0.5))
    val lenOk = when(
      (s.getField("sum_len").cast("double") / nTok).between(2.0, 12.0),
      lit(1.0)).otherwise(lit(0.5))
    diversity * lit(0.6) + stopOk * lit(0.2) + lenOk * lit(0.2)
  }

  /** Deflate compressibility (compressed/original bytes) — repetitive
    * boilerplate compresses far below natural prose, so a low ratio is a
    * junk signal. Native codegen'd expression; rows-only for the oracle
    * (zlib output size is library-specific), cross-checked in OpsSpec. */
  def compressionRatio(c: Column): Column =
    graft.functions.NativeFunctions.compress_ratio(c)

  // ------------------------------------------- Gopher-style quality rules

  /** Share of tokens containing at least one alphabetic character — the
    * Gopher "80% of words contain an alphabetic character" rule (Rae et al.
    * 2021, public report). */
  def alphaWordRatio(c: Column): Column = {
    val s = stats(c)
    s.getField("n_alpha").cast("double") / s.getField("n_tokens").cast("double")
  }

  /** Share of non-space characters that are letters or digits — low values
    * mean symbol soup (markup, tables, encoding junk). */
  def symbolRatio(c: Column): Column = {
    val s = stats(c)
    lit(1.0) - s.getField("n_alnum").cast("double") /
      nullif(s.getField("n_nonspace"), lit(0)).cast("double")
  }

  /** Share of lines that start like bullets — boilerplate/list-dump signal. */
  def bulletLineRatio(c: Column): Column = {
    val lines = filter(split(c, "\\n"), l => length(trim(l)) > 0)
    size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double") /
      nullif(size(lines), lit(0)).cast("double")
  }

  /** Share of lines ending in an ellipsis — truncated-scrape signal. */
  def ellipsisLineRatio(c: Column): Column = {
    val lines = filter(split(c, "\\n"), l => length(trim(l)) > 0)
    size(filter(lines, l =>
      trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") /
      nullif(size(lines), lit(0)).cast("double")
  }

  /** Stopword-evidence language-ID heuristic (n-gram-free variant): counts
    * distinctive function words per language; ties/no-evidence → 'und'
    * (undetermined). The marker sets are deliberately tiny and fixed so the
    * heuristic is reproducible in plain SQL by any engine. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "la", "y", "es"))

  def langId(c: Column): Column = stats(c).getField("lang")

  /** Content fingerprint: md5 of whitespace-normalized lowercase text. Exact
    * dedup on near-identical whitespace variants; cheap to compute anywhere. */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  // ---- PII / sensitive-pattern scanning (pre-training redaction pass) ----

  /** The fixed patterns the scan/redact pair share — identical regex on
    * both the Spark and any-other-engine side so counts are reproducible. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^\\s]+"
  val phoneRe = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"

  /** Occurrences of an arbitrary pattern (codegen'd, per-row). */
  def patternCount(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** Replace every email with a placeholder token (the redaction the scan
    * motivates; same per-row shape, no shuffle). */
  def redactEmails(c: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(c, emailRe, token)

  // ---- HTML → text extraction (the crawl-corpus pre-cleaning step) ----

  /** Strip HTML to plain text as codegen'd regex passes — the
    * parser-free 80% cleanup a crawl pipeline runs before any quality
    * filter: drop script/style blocks wholesale, drop every tag, decode
    * the common entities, collapse whitespace. Per-row, no shuffle. Pass
    * ORDER is part of the spec (tags strip before entity decode, so a
    * decoded `&lt;b&gt;` survives as text); the regexes avoid
    * backreferences so the identical patterns run on RE2 engines
    * (DuckDB) for oracle parity. */
  def stripHtml(c: Column): Column = {
    // one pass per block tag: a combined <(script|style)>.*?</(script|style)>
    // alternation would let a <script> block "close" at the next </style>,
    // leaving raw JS in the extracted text
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noBlocks = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val e1 = regexp_replace(noTags, "&nbsp;", " ")
    val e2 = regexp_replace(e1, "&lt;", "<")
    val e3 = regexp_replace(e2, "&gt;", ">")
    val e4 = regexp_replace(e3, "&quot;", "\"")
    val e5 = regexp_replace(e4, "&#39;|&apos;", "'")
    val e6 = regexp_replace(e5, "&amp;", "&")
    trim(regexp_replace(e6, "\\s+", " "))
  }

  /** Markdown → text (docs/README corpora): fenced code BLOCKS drop
    * (code is not prose), inline code keeps its
    * text, image/link syntax keeps alt/anchor text, header/quote/rule
    * markers strip, emphasis asterisks strip, whitespace collapses.
    * Pure codegen'd regexp chain; the oracle replays it pass by pass
    * (RE2-safe subset, no backtracking blowup). */
  def stripMarkdown(c: Column): Column = {
    val noFence = regexp_replace(c, "(?s)```.*?```", " ")
    val code = regexp_replace(noFence, "`([^`]*)`", "$1")
    val img = regexp_replace(code, "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val link = regexp_replace(img, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val hdr = regexp_replace(link, "(?m)^#{1,6}[ \\t]*", "")
    val quote = regexp_replace(hdr, "(?m)^>[ \\t]?", "")
    val rule = regexp_replace(quote, "(?m)^-{3,}[ \\t]*$", "")
    val emph = regexp_replace(rule, "\\*{1,3}", "")
    trim(regexp_replace(emph, "\\s+", " "))
  }

  /** LaTeX → text (papers corpora, documented approximation): comments
    * drop (escaped \% survives), display then inline math drops,
    * \begin/\end vanish, single-brace-arg commands KEEP the braced
    * text (\textbf{x} → x — including \cite keys, a stated tradeoff),
    * remaining commands drop with their optional [..] args, stray
    * braces strip, whitespace collapses. Same oracle discipline as
    * [[stripMarkdown]]. */
  def stripLatex(c: Column): Column = {
    val noComment = regexp_replace(c, "(?m)(^|[^\\\\])%.*$", "$1 ")
    val noDisp = regexp_replace(noComment, "\\$\\$[^$]*\\$\\$", " ")
    val noMath = regexp_replace(noDisp, "\\$[^$]*\\$", " ")
    val noEnv = regexp_replace(noMath, "\\\\(begin|end)\\{[^}]*\\}", " ")
    val keepArg = regexp_replace(noEnv,
      "\\\\[a-zA-Z]+(\\[[^\\]]*\\])?\\{([^}]*)\\}", "$2")
    val noCmd = regexp_replace(keepArg, "\\\\[a-zA-Z]+(\\[[^\\]]*\\])?", " ")
    val noBrace = regexp_replace(noCmd, "[{}]", "")
    trim(regexp_replace(noBrace, "\\s+", " "))
  }

  // ---- repetition / boilerplate detection ----

  /** Repeated-trigram ratio in [0,1]: 1 − distinct/total word trigrams.
    * High values mean template/boilerplate text (the repetition filter
    * every pre-training cleanup applies). Docs under 3 tokens score 0. */
  def repetitionRatio(c: Column): Column = {
    val total = greatest(tokenCount(c) - 2, lit(0))
    val distinctTri = size(shingles(c, 3))
    when(total <= 0, lit(0.0))
      .otherwise(lit(1.0) - distinctTri.cast("double") / total.cast("double"))
  }

  // ---- hashed linear classifier (fastText-style quality model) ----

  /** Per-token weight under the hashing trick: the first two hex digits of
    * md5(token) mapped to [-0.5, 0.5). Stands in for a trained weight
    * vector — the lookup shape (hash token → bucket → weight) is exactly a
    * fastText / VW linear model; swapping in real weights is a
    *`Map[bucket, Double]` broadcast, the plan does not change. */
  private def hashedWeight(t: Column): Column =
    conv(substring(md5(t.cast("binary")), 1, 2), 16, 10).cast("double") /
      255.0 - 0.5

  /** Hashed linear classifier logit: bias + Σ_tokens weight(h(token)),
    * averaged over tokens so length does not dominate. One higher-order-fn
    * fold per row — shuffle-free, codegen'd, no vocabulary broadcast:
    * the layout that scores 100 TB at scan speed. */
  def hashedLinearLogit(c: Column, bias: Double = 0.0): Column = {
    val toks = tokens(c)
    when(size(toks) <= 0, lit(bias)).otherwise(
      lit(bias) + aggregate(toks, lit(0.0), (acc, t) => acc + hashedWeight(t))
        / size(toks).cast("double"))
  }

  /** Sigmoid of the hashed linear logit — a [0,1] quality probability. */
  def hashedLinearScore(c: Column, bias: Double = 0.0): Column = {
    val z = hashedLinearLogit(c, bias)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  // ---- feature-hashing text embedding (RAG/retrieval without a model) ----

  /** Hash a text into a dim-length L2-normalized bag-of-words vector:
    * token t lands in component xxhash64(t) mod dim (the hashing trick —
    * no vocabulary state, identical on any engine/partitioning). The map
    * stand-in for a neural embedder in retrieval plumbing: real model
    * embeddings swap in without touching the index/probe pipeline
    * downstream. Native single-pass expression (graft.functions.Exprs
    * .hashEmbed): the composed HOF form — transform over sequence(0,dim-1)
    * of size(filter(tokens, pmod(xxhash64(t),dim)=i)), normalized — is
    * semantically identical but O(dim × tokens) with interpreted lambda
    * eval, which made every downstream re-inline of the tree cost seconds
    * per row. */
  def hashEmbed(c: Column, dim: Int): Column = {
    require(dim > 0, s"embedding dim must be positive, got $dim")
    graft.functions.NativeFunctions.hash_embed(c, dim)
  }
}
