package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot loops of the dedup/similarity
  * pipelines. The composed higher-order-function forms (`transform` +
  * `aggregate` + `slice` + `concat_ws`…) are semantically identical but cost
  * far more: HOFs evaluate a lambda per element with per-step codegen, and
  * the generated class for a 64-hash MinHash tree is large enough that
  * janino compilation dominates single-shot query time. Each expression here
  * compiles to a single static call (SURVEY.md §7.3 preference (b)).
  */
object Exprs {

  /** Distinct word n-grams of a token array, first-occurrence order —
    * matches array_distinct(transform(sequence…, slice+concat_ws)). */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val count = tokens.numElements()
    if (count < n) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[UTF8String]
    var i = 0
    while (i <= count - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        parts(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      seen += UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature: per hash j, min over shingles of the universal hash
    * a_j*h+b_j of the shingle's FNV-1a 64. One pass over the shingle set. */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      a(j) = splitmix64(2L * j + 1) | 1L
      b(j) = splitmix64(2L * j + 2)
      j += 1
    }
    val out = Array.fill[Long](numHashes)(Long.MaxValue)
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = SimHash64.fnv1a64(shingles.getUTF8String(i).getBytes)
        var k = 0
        while (k < numHashes) {
          val v = a(k) * h + b(k)
          if (v < out(k)) out(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.map(Long.box): Array[Any])
  }

  /** SimHash64 kernel — lives here (a standalone object with a static
    * mirror class) rather than on `SimHash64`'s companion, whose static
    * forwarder scalac suppresses because the case class inherits an
    * overloaded `eval` from `Expression`; generated code calling a
    * non-existent static silently demoted every simhash plan to
    * interpreted execution. */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.fnv1a64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Engine-neutral MinHash kernel — the compiled twin of the
    * column-composed [[graft.ops.DedupOps.neutralMinhashSigColumns]] md5
    * family (hᵢ(s) = (Aᵢ·(md5₄₈(s) mod P) + Bᵢ) mod P, P the largest
    * 32-bit prime): bit-identical output (OpsSpec parity test), one md5 +
    * a tight numHashes loop per shingle instead of 64 array-transform
    * passes. Callers filter empty shingle arrays (parity: the column twin
    * yields nulls there, this kernel Long.MaxValue). */
  def neutralMinhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val P = 4294967291L
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      a(j) = 1L + (j.toLong * 2654435761L) % 1048573L
      b(j) = (j.toLong * 4050313L + 17L) % P
      j += 1
    }
    val out = Array.fill[Long](numHashes)(Long.MaxValue)
    val md = md5Local.get()
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        md.reset()
        val d = md.digest(shingles.getUTF8String(i).getBytes)
        // first 12 hex chars = first 6 digest bytes, big-endian
        var x = 0L
        var k = 0
        while (k < 6) { x = (x << 8) | (d(k) & 0xffL); k += 1 }
        x %= P
        var q = 0
        while (q < numHashes) {
          val v = (a(q) * x + b(q)) % P
          if (v < out(q)) out(q) = v
          q += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.map(Long.box): Array[Any])
  }

  /** Engine-neutral 60-bit SimHash kernel — compiled twin of the
    * column-composed md5 family ([[graft.ops.DedupOps.neutralSimhashFromHashes]]):
    * per-token 60-bit md5-prefix hash (first 15 hex chars), ±1 vote per bit
    * across tokens (repeats counted), bit set iff votes > 0. */
  def neutralSimhash60(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val md = md5Local.get()
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        // first 15 hex chars = bytes 0..6 (56 bits) + high nibble of byte 7
        var x = 0L
        var k = 0
        while (k < 7) { x = (x << 8) | (d(k) & 0xffL); k += 1 }
        x = (x << 4) | ((d(7) >> 4) & 0xfL)
        var b = 0
        while (b < 60) {
          if (((x >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Unicode normalization (+ optional ROOT-locale casefold) — corpus
    * canonicalization before dedup/fingerprinting so visually-identical
    * text (combining accents vs precomposed, compatibility ligatures)
    * hashes identically. Matches DuckDB's nfc_normalize for form=NFC. */
  def unicodeNormalize(s: UTF8String, form: String, casefold: Boolean): UTF8String = {
    val normalized = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form))
    UTF8String.fromString(
      if (casefold) normalized.toLowerCase(java.util.Locale.ROOT) else normalized)
  }

  private val combiningMarks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** Accent/diacritic removal: NFD-decompose, then drop combining marks
    * (category Mn). Matches DuckDB's `strip_accents` (utf8proc) on
    * decomposable Latin — é→e, ñ→n, ç→c — and, like it, leaves
    * non-decomposable letters (ø, ß, æ, ð) untouched. The canonical
    * cross-lingual fold before dedup/fingerprinting: "café" and "café"
    * and "cafe" all hash identically after stripAccents∘NFC. */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: pure ASCII can't carry marks — skip the NFD allocation.
    var i = 0
    var ascii = true
    while (ascii && i < str.length) { ascii = str.charAt(i) < 0x80; i += 1 }
    if (ascii) return s
    val decomposed =
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(combiningMarks.matcher(decomposed).replaceAll(""))
  }

  /** BPE token count: whitespace-tokenize lowercased text, split each word
    * to characters, apply the learned merges in rank order (greedy
    * left-to-right per merge), return the total symbol count. Imperative so
    * the cost is O(tokens × merges) with NO expression-tree growth — the
    * HOF formulation nests one aggregate() per merge and collapses at
    * realistic vocabulary sizes (codegen 64KB limit, analyzer blowup). */
  def bpeEncodeCount(s: UTF8String, merges: Array[Array[String]]): Int = {
    var total = 0
    val words = s.toString.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms = w.map(_.toString).toArray
        var mi = 0
        while (mi < merges.length && syms.length > 1) {
          val l = merges(mi)(0); val r = merges(mi)(1)
          val out = new mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toArray
          mi += 1
        }
        total += syms.length
      }
      wi += 1
    }
    total
  }

  /** Deflate-compressibility ratio (compressed/original bytes, level 6,
    * raw stream): the classic cheap junk detector — repetitive boilerplate
    * compresses far below natural prose. Empty input → 1.0. Only the
    * compressed SIZE is kept; output buffers are discarded per call. */
  def compressRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val deflater = new java.util.zip.Deflater(6, true)
    deflater.setInput(bytes)
    deflater.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!deflater.finished()) total += deflater.deflate(buf)
    deflater.end()
    total.toDouble / bytes.length
  }

  /** Feature-hashed bag-of-words embedding, one pass over the tokens:
    * whitespace-split the lower(trim(text)), each non-empty token adds 1 to
    * component pmod(xxhash64(token), dim) (Spark's xxhash64, seed 42), then
    * L2-normalize. Bit-identical to the composed HOF form
    * transform(sequence(0,dim-1), i -> size(filter(split(lower(trim(c)),
    * '\\s+'), t -> t != '' and pmod(xxhash64(t), dim) = i))) / norm — but
    * O(tokens + dim) instead of O(dim × tokens) with the whole tree
    * re-evaluated per component, and it stays codegen'd where nested HOF
    * lambdas fall back to interpreted eval. */
  def hashEmbed(s: UTF8String, dim: Int): ArrayData = {
    val counts = new Array[Double](dim)
    val toks = s.trim().toLowerCase().toString.split("\\s+", -1)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(UTF8String.fromString(toks(i)), 42L)
        counts((((h % dim) + dim) % dim).toInt) += 1.0
      }
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += counts(j) * counts(j); j += 1 }
    if (ss > 0) {
      val n = math.sqrt(ss)
      j = 0
      while (j < dim) { counts(j) /= n; j += 1 }
    }
    new GenericArrayData(counts)
  }

  private val textStopwords = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
      .foreach(s.add)
    s
  }
  // marker sets in graft.ops.TextOps.langMarkers order (en, de, fr, es)
  private val langMarkerSets: Array[java.util.HashSet[String]] = Array(
    Seq("the", "a", "of", "and"), Seq("der", "die", "und", "ist"),
    Seq("le", "la", "et", "est"), Seq("el", "la", "y", "es")).map { words =>
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }
  private val langNames = Array("en", "de", "fr", "es").map(UTF8String.fromString)
  private val langUnd = UTF8String.fromString("und")

  /** One-pass text statistics over the whitespace tokens of
    * lower(trim(text)) — the counts every TextOps quality/language leaf is
    * a ratio of, computed with ONE tokenization per row instead of one
    * interpreted higher-order-function chain per metric (HOF lambdas are
    * CodegenFallback; a quality+langid projection re-split and re-walked
    * the token array up to 10×). Every field reproduces the corresponding
    * column composition bit-for-bit:
    *
    *   - n_tokens   = size(split(lower(trim(c)), "\\s+"))
    *   - n_distinct = size(array_distinct(tokens))
    *   - n_stop     = size(filter(tokens, isInCollection(stopwords)))
    *   - sum_len    = aggregate(tokens, 0L, acc + length(w))  (codepoints)
    *   - n_alpha    = size(filter(tokens, rlike("[a-z]")))
    *   - lang       = the langMarkers fold (max count, ties → earlier
    *                  marker entry, all-zero → 'und'), repeats counted
    *   - n_nonspace = length(regexp_replace(lowtrim, "\\s+", ""))
    *   - n_alnum    = length(regexp_replace(nonspace, "[^a-z0-9]", ""))
    *
    * Divisions/NULL semantics stay column-side in TextOps so the final
    * doubles are the identical IEEE expressions. */
  def textStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.trim().toLowerCase().toString
    val toks = str.split("\\s+", -1)
    val seen = new java.util.HashSet[String]()
    var nStop = 0
    var sumLen = 0L
    var nAlpha = 0
    val langScores = new Array[Int](4)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      seen.add(t)
      sumLen += t.codePointCount(0, t.length)
      if (textStopwords.contains(t)) nStop += 1
      var hasAlpha = false
      var j = 0
      while (!hasAlpha && j < t.length) {
        val ch = t.charAt(j)
        hasAlpha = ch >= 'a' && ch <= 'z'
        j += 1
      }
      if (hasAlpha) nAlpha += 1
      var m = 0
      while (m < 4) {
        if (langMarkerSets(m).contains(t)) langScores(m) += 1
        m += 1
      }
      i += 1
    }
    var best = langUnd
    var bestScore = 0
    var m = 0
    while (m < 4) {
      if (langScores(m) > bestScore) { best = langNames(m); bestScore = langScores(m) }
      m += 1
    }
    var nonspace = 0
    var alnum = 0
    i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b ||
        cp == '\f' || cp == '\r'
      if (!isWs) {
        nonspace += 1
        if ((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')) alnum += 1
      }
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length, seen.size, nStop, sumLen, nAlpha, best,
        nonspace, alnum))
  }

  /** Count of non-decreasing `bounds` entries strictly below `x` — the
    * first index where bounds(i) >= x, by binary search. Comparison is
    * java.lang.Double.compare (Spark's DoubleType ordering: NaN greatest,
    * -0.0 < 0.0), so the count matches the `b < x` HOF filter this
    * replaces on every input including NaN. */
  def countBelow(bounds: Array[Double], x: Double): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (java.lang.Double.compare(bounds(mid), x) < 0) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** Count of non-null `bounds` elements strictly below `x` under SPARK's
    * double ordering (NaN greatest, -0.0 == 0.0) — exactly
    * size(filter(bounds, b => b < x)) for a non-null bounds array (null
    * elements are skipped, as the lambda's null comparison drops them).
    * The runtime-column twin of [[countBelow]]: bounds here are a
    * percentile_approx result riding every row via a broadcast, a few
    * dozen entries — a linear scan beats set-up-heavy alternatives and
    * is trivially parity-provable against the HOF. */
  def countBelowArr(bounds: ArrayData, x: Double): Long = {
    var i = 0
    var c = 0L
    val n = bounds.numElements()
    while (i < n) {
      if (!bounds.isNullAt(i)) {
        val b = bounds.getDouble(i)
        // Spark `<`: false when equal (-0.0 == 0.0) or b is NaN; true
        // when x is NaN and b is not (NaN sorts greatest)
        if (b != x && !java.lang.Double.isNaN(b) &&
            (java.lang.Double.isNaN(x) || b < x)) c += 1
      }
      i += 1
    }
    c
  }

  /** Multiset overlap Σ_t min(count_a(t), count_b(t)) — identical to
    * aggregate(array_distinct(a), 0, (acc, t) -> acc +
    * least(size(filter(a, x -> x = t)), size(filter(b, x -> x = t))))
    * (the ROUGE-n overlap numerator: both are exact integer sums of the
    * same per-token minima), but one hash-count pass instead of an
    * interpreted O(|distinct a| · (|a| + |b|)) lambda walk per pair.
    * Null elements never match the HOF's null-propagating `=`, so they
    * are skipped here too. */
  def multisetOverlap(a: ArrayData, b: ArrayData): Int = {
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        val c = counts.get(t)
        counts.put(t, if (c == null) 1 else c + 1)
      }
      i += 1
    }
    var ov = 0
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (!b.isNullAt(j)) {
        val t = b.getUTF8String(j)
        val c = counts.get(t)
        if (c != null && c > 0) {
          ov += 1
          counts.put(t, c - 1)
        }
      }
      j += 1
    }
    ov
  }

  /** PQ asymmetric-distance lookup: Σ_j lut[j][codes[j]] — bit-identical
    * to aggregate(zip_with(codes, lut, (c, l) => element_at(l, c+1)), 0.0,
    * +) (same sequential double adds), but one tight loop instead of an
    * interpreted zip_with allocation + fold per candidate row (the ADC
    * scan is the hottest loop of a PQ index probe). */
  def pqAdc(codes: ArrayData, lut: ArrayData): Double = {
    val n = math.min(codes.numElements(), lut.numElements())
    var acc = 0.0
    var j = 0
    while (j < n) {
      acc += lut.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    acc
  }

  /** Bloom membership probe over a packed word array — bit-identical to
    * the column-composed Kirsch–Mitzenmacher probe in
    * [[graft.ops.BloomOps.mightContain]]: h1 = xxhash64(key) (Spark XXH64,
    * seed 42), h2 = 2·murmur3(key)+1 (Spark hash() int result,
    * sign-extended), position i = pmod(h1 + i·h2, m). One tight loop with
    * the words as a plan REFERENCE instead of a 2048-literal array tree
    * re-walked by every analyzer rule and an interpreted per-block lambda. */
  def bloomMightContain(s: UTF8String, words: Array[Long], numHashes: Int): Boolean = {
    val m = words.length * 64L
    val h1 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 42L)
    val h2 = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(s, StringType, 42L).toInt.toLong * 2L + 1L
    var i = 0
    while (i < numHashes) {
      val x = h1 + i.toLong * h2
      val pos = ((x % m) + m) % m
      if (((words((pos / 64).toInt) >> (pos % 64).toInt) & 1L) != 1L) return false
      i += 1
    }
    true
  }

  /** Squared euclidean distance, sequential fold — bit-identical to
    * aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0.0, +) INCLUDING the
    * null semantics: zip_with pads the shorter array with nulls and the
    * fold then yields null, so unequal lengths (or a null element) return
    * null here too. Boxed return for that reason. */
  def sqDist(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val t = a.getDouble(i) - b.getDouble(i)
      acc += t * t
      i += 1
    }
    acc
  }

  /** PQ encode: per subspace j, the codebook index minimizing
    * ‖s−c‖² = ‖c‖² − 2·s·c over the subvector s — bit-identical to the
    * column form transform(books, (book,j) => array_min(transform(book,
    * (cent,c) => struct(n2−2·dot, c))).code): same sequential-fold dot,
    * same precomputed ‖c‖², ties → lowest code, Spark double ordering.
    * One tight loop instead of ~m×k interpreted lambda evaluations (plus
    * slice/struct allocations) per row — the corpus-side hot loop of PQ. */
  def pqEncode(v: ArrayData, cents: Array[Array[Array[Double]]],
      n2: Array[Array[Double]]): ArrayData = {
    val m = cents.length
    val sub = cents(0)(0).length
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      val book = cents(j)
      val bn2 = n2(j)
      var best = 0
      var bestD = Double.NaN
      // slice-past-end parity: slice(vec, base+1, sub) shortens when the
      // vector is narrower than m·sub, and dot folds the shorter length
      val upto = math.max(0, math.min(sub, v.numElements() - base))
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dotAcc = 0.0
        var i = 0
        while (i < upto) { dotAcc += v.getDouble(base + i) * cent(i); i += 1 }
        val d = bn2(c) - 2.0 * dotAcc
        if (c == 0 || java.lang.Double.compare(d, bestD) < 0) {
          bestD = d; best = c
        }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Sequential-fold dot product of two double arrays — bit-identical to
    * aggregate(zip_with(a,b,*), 0.0, +) and to DuckDB's
    * list_sum(list_transform(list_zip(a,b), …)). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"word_shingles requires array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.minhashSig(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.minhashSig($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

case class NeutralMinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"neutral_minhash_sig requires array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.neutralMinhashSig(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.neutralMinhashSig($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): NeutralMinHashSig =
    copy(child = newChild)
  override def prettyName: String = "neutral_minhash_sig"
}

case class NeutralSimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"neutral_simhash60 requires array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.neutralSimhash60(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.neutralSimhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): NeutralSimHash60 =
    copy(child = newChild)
  override def prettyName: String = "neutral_simhash60"
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"dot_product requires two array<double>, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    Exprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Exprs.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

case class BpeEncodeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val mergesArr: Array[Array[String]] =
    merges.map { case (l, r) => Array(l, r) }.toArray
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"bpe_encode_count requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.bpeEncodeCount(input.asInstanceOf[UTF8String], mergesArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergesArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.bpeEncodeCount($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeCount =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode_count"
}

case class CompressRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"compress_ratio requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.compressRatio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.compressRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): CompressRatio =
    copy(child = newChild)
  override def prettyName: String = "compress_ratio"
}

case class UnicodeNormalize(child: Expression, form: String, casefold: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"unicode_normalize requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.unicodeNormalize(input.asInstanceOf[UTF8String], form, casefold)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.functions.Exprs.unicodeNormalize($c, "$form", $casefold)""")
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
  override def prettyName: String = "unicode_normalize"
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"strip_accents requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
  override def prettyName: String = "strip_accents"
}

/** Count of `bounds` entries strictly below the input — the equi-depth
  * rank against a non-decreasing quantile-boundary array. Semantically
  * size(filter(array(bounds…), b => b < x)), but a binary search against a
  * referenced double[] instead of an interpreted 255-lambda HOF walk per
  * row (paid twice in a z-order rewrite: the range-partition sampling pass
  * and the final pass). */
case class CountBelow(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"count_below requires double, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.countBelow(bounds, input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countBelowBounds", bounds, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.countBelow($ref, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): CountBelow =
    copy(child = newChild)
  override def prettyName: String = "count_below"
}

/** Two-column [[CountBelow]]: count of `right` (bounds array) elements
  * strictly below `left` (the value), for bounds that are a RUNTIME column
  * (a percentile_approx result broadcast onto every row) rather than a
  * plan literal. Replaces the interpreted size(filter(bounds, b => b < x))
  * HOF in [[graft.ops.LayoutOps.globalRowNumber]] — Spark double ordering
  * and null-element handling match the lambda exactly (value/bounds NULL
  * inputs are out of the caller's contract: rangeKey is required
  * non-null and percentile_approx bounds come from a non-empty input). */
case class CountBelowCol(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"count_below_arr requires (double, array<double>), got $other")
    }
  override def nullSafeEval(x: Any, arr: Any): Any =
    Exprs.countBelowArr(arr.asInstanceOf[ArrayData], x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, arr) => s"graft.functions.Exprs.countBelowArr($arr, $x)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountBelowCol =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "count_below_arr"
}

/** Multiset n-gram overlap — see [[Exprs.multisetOverlap]]. */
case class MultisetOverlap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"multiset_overlap requires two array<string>, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    Exprs.multisetOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Exprs.multisetOverlap($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultisetOverlap =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "multiset_overlap"
}

/** Bloom membership probe for string keys — see [[Exprs.bloomMightContain]]. */
case class BloomMightContain(child: Expression, words: Array[Long], numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"bloom_might_contain requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.bloomMightContain(input.asInstanceOf[UTF8String], words, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Exprs.bloomMightContain($c, $ref, $numHashes)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

/** Squared euclidean distance — see [[Exprs.sqDist]]. Nullable (unequal
  * lengths / null elements yield null, matching the HOF form). */
case class SqDistExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"sq_dist requires two array<double>, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    Exprs.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.functions.Exprs.sqDist($a, $b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistExpr =
    copy(left = l, right = r)
  override def prettyName: String = "sq_dist"
}

/** PQ codes per subspace — see [[Exprs.pqEncode]]. */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  @transient private lazy val n2: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"pq_encode requires array<double>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.pqEncode(input.asInstanceOf[ArrayData], books, n2)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refB = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val refN = ctx.addReferenceObj("pqN2", n2, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.pqEncode($c, $refB, $refN)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** Σ_j lut[j][codes[j]] — see [[Exprs.pqAdc]]. */
case class PqAdcDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int>, array<array<double>>), got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    Exprs.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Exprs.pqAdc($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcDist =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}

case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextStats.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"text_stats requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.textStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.textStats($c)")
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
  override def prettyName: String = "text_stats"
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_nonspace", IntegerType, nullable = false),
    StructField("n_alnum", IntegerType, nullable = false)))
}

case class HashEmbedExpr(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"hash_embed requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Exprs.hashEmbed(input.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.hashEmbed($c, $dim)")
  override protected def withNewChildInternal(newChild: Expression): HashEmbedExpr =
    copy(child = newChild)
  override def prettyName: String = "hash_embed"
}

object NativeFunctions {
  import org.apache.spark.sql.graftshim._

  def word_shingles(c: Column, n: Int): Column = columnOf(WordShingles(expressionOf(c), n))
  def text_stats(c: Column): Column = columnOf(TextStats(expressionOf(c)))
  def count_below(c: Column, bounds: Array[Double]): Column =
    columnOf(CountBelow(expressionOf(c), bounds))
  def count_below_arr(value: Column, bounds: Column): Column =
    columnOf(CountBelowCol(expressionOf(value), expressionOf(bounds)))
  def multiset_overlap(a: Column, b: Column): Column =
    columnOf(MultisetOverlap(expressionOf(a), expressionOf(b)))
  def pq_adc(codes: Column, lut: Column): Column =
    columnOf(PqAdcDist(expressionOf(codes), expressionOf(lut)))
  def sq_dist(a: Column, b: Column): Column =
    columnOf(SqDistExpr(expressionOf(a), expressionOf(b)))
  def pq_encode(v: Column, books: Array[Array[Array[Double]]]): Column =
    columnOf(PqEncode(expressionOf(v), books))
  def bloom_might_contain(c: Column, words: Array[Long], numHashes: Int): Column =
    columnOf(BloomMightContain(expressionOf(c), words, numHashes))
  def hash_embed(c: Column, dim: Int): Column = columnOf(HashEmbedExpr(expressionOf(c), dim))
  def minhash_sig(c: Column, numHashes: Int): Column = columnOf(MinHashSig(expressionOf(c), numHashes))
  def neutral_minhash_sig(c: Column, numHashes: Int): Column =
    columnOf(NeutralMinHashSig(expressionOf(c), numHashes))
  def neutral_simhash60(c: Column): Column = columnOf(NeutralSimHash60(expressionOf(c)))
  def dot_product(a: Column, b: Column): Column = columnOf(DotProduct(expressionOf(a), expressionOf(b)))
  def unicode_normalize(c: Column, form: String = "NFC", casefold: Boolean = false): Column =
    columnOf(UnicodeNormalize(expressionOf(c), form, casefold))
  def strip_accents(c: Column): Column = columnOf(StripAccents(expressionOf(c)))
  def compress_ratio(c: Column): Column = columnOf(CompressRatio(expressionOf(c)))
  def bpe_encode_count(c: Column, merges: Seq[(String, String)]): Column =
    columnOf(BpeEncodeCount(expressionOf(c), merges))
}
