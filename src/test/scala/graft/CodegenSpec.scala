package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** The native expressions exist for their codegen fast path, so "the
  * generated code compiles" is a correctness property here:
  * `GenerateUnsafeProjection.generate` throws on janino failure (unlike
  * whole-stage codegen, which silently falls back to interpreted execution
  * and defeats the expressions' purpose — the round-1 simhash64 bug).
  * Each test also evaluates the *compiled* projection and checks the value
  * against the interpreted/reference result.
  */
class CodegenSpec extends AnyFunSuite {

  private def strArray(xs: String*) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  private val tokRef = BoundReference(0, ArrayType(StringType), nullable = true)

  test("simhash64 generated code compiles and matches reference") {
    val proj = GenerateUnsafeProjection.generate(Seq(SimHash64(tokRef)))
    val toks = Seq("the", "quick", "brown", "fox")
    val out = proj(InternalRow(strArray(toks: _*)))
    assert(out.getLong(0) == SimHash64.ofTokens(toks))
  }

  test("word_shingles generated code compiles and matches interpreted eval") {
    val expr = WordShingles(tokRef, 2)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val in = InternalRow(strArray("a", "b", "c"))
    val got = proj(in).getArray(0)
    assert((0 until got.numElements()).map(got.getUTF8String(_).toString) ==
      Seq("a b", "b c"))
  }

  test("minhash_sig generated code compiles and matches interpreted eval") {
    val expr = MinHashSig(tokRef, 8)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val in = InternalRow(strArray("x y z", "y z w"))
    val got = proj(in).getArray(0)
    val expected = expr.nullSafeEval(strArray("x y z", "y z w"))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until 8).map(got.getLong) == (0 until 8).map(expected.getLong))
  }

  test("neutral_minhash_sig generated code compiles and matches interpreted eval") {
    val expr = NeutralMinHashSig(tokRef, 8)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val in = strArray("x y z", "y z w")
    val got = proj(InternalRow(in)).getArray(0)
    val expected = expr.nullSafeEval(in)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until 8).map(got.getLong) == (0 until 8).map(expected.getLong))
    // and against the md5 definition directly: base = first 12 md5 hex
    // chars of the shingle, h_i = (A_i*base + B_i) mod P, min over shingles
    val P = 4294967291L
    def base(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16) % P
    }
    val bases = Seq("x y z", "y z w").map(base)
    val ref = (0 until 8).map { i =>
      val a = 1L + (i.toLong * 2654435761L) % 1048573L
      val b = (i.toLong * 4050313L + 17L) % P
      bases.map(x => (a * x + b) % P).min
    }
    assert((0 until 8).map(got.getLong) == ref)
  }

  test("neutral_simhash60 generated code compiles and matches interpreted eval") {
    val expr = NeutralSimHash60(tokRef)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val toks = Seq("the", "quick", "brown", "fox", "the")
    val in = strArray(toks: _*)
    assert(proj(InternalRow(in)).getLong(0) ==
      expr.nullSafeEval(in).asInstanceOf[Long])
    // against the definition: 60-bit md5-prefix votes (repeats counted)
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val sig = (0 until 60).map { j =>
      val v = toks.map(t => if (((h60(t) >> j) & 1L) == 1L) 1 else -1).sum
      if (v > 0) 1L << j else 0L
    }.sum
    assert(proj(InternalRow(in)).getLong(0) == sig)
  }

  test("dot_product generated code compiles and matches interpreted eval") {
    val vecRef = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val vecRef2 = BoundReference(1, ArrayType(DoubleType), nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(DotProduct(vecRef, vecRef2)))
    val a = new GenericArrayData(Array[Any](1.0, 2.0, 3.0))
    val b = new GenericArrayData(Array[Any](4.0, 5.0, 6.0))
    assert(proj(InternalRow(a, b)).getDouble(0) == 32.0)
  }

  test("compress_ratio generated code compiles; repetitive text scores low") {
    val strRef = BoundReference(0, StringType, nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(CompressRatio(strRef)))
    def ratio(s: String): Double =
      proj(InternalRow(UTF8String.fromString(s))).getDouble(0)
    val repetitive = "buy now! " * 200
    val prose = (1 to 200).map(i => s"sentence$i about topic${i * 7 % 13}").mkString(" ")
    assert(ratio(repetitive) < 0.1)
    assert(ratio(prose) > ratio(repetitive) * 2)
    assert(ratio("") == 1.0)
  }

  test("unicode_normalize generated code compiles; NFC/NFKC/casefold correct") {
    val strRef = BoundReference(0, StringType, nullable = true)
    def run(form: String, casefold: Boolean, in: String): String = {
      val proj = GenerateUnsafeProjection.generate(
        Seq(UnicodeNormalize(strRef, form, casefold)))
      proj(InternalRow(UTF8String.fromString(in))).getUTF8String(0).toString
    }
    // combining acute (e + U+0301) composes to precomposed é under NFC
    assert(run("NFC", casefold = false, "café") == "café")
    // NFC preserves compatibility chars; NFKC folds the ﬁ ligature
    assert(run("NFC", casefold = false, "ﬁle") == "ﬁle")
    assert(run("NFKC", casefold = false, "ﬁle") == "file")
    // casefold lowers with ROOT locale (no Turkish-I surprise)
    assert(run("NFKC", casefold = true, "ﬁLE É") == "file é")
    // ASCII is a fixed point
    assert(run("NFC", casefold = false, "plain ascii") == "plain ascii")
  }

  test("strip_accents generated code compiles; NFD marks dropped, non-decomposables kept") {
    val strRef = BoundReference(0, StringType, nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(StripAccents(strRef)))
    def run(in: String): String =
      proj(InternalRow(UTF8String.fromString(in))).getUTF8String(0).toString
    // precomposed AND combining-mark spellings both fold to bare letters
    assert(run("áéíóú ÀÈÌ ñç ý") == "aeiou AEI nc y")
    assert(run("café") == "cafe")
    // non-decomposable letters pass through (matches DuckDB strip_accents)
    assert(run("øßæðł") == "øßæðł")
    // ASCII fast path is a fixed point
    assert(run("plain ascii 123") == "plain ascii 123")
  }

  test("hash_embed generated code compiles; unit norm, token placement exact") {
    val strRef = BoundReference(0, StringType, nullable = true)
    val dim = 16
    val expr = HashEmbedExpr(strRef, dim)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    def run(s: String): Seq[Double] = {
      val got = proj(InternalRow(UTF8String.fromString(s))).getArray(0)
      (0 until got.numElements()).map(got.getDouble)
    }
    // empty / all-whitespace → zero vector (no tokens, norm stays 0)
    assert(run("").forall(_ == 0.0) && run("  \t ").forall(_ == 0.0))
    // non-empty → unit L2 norm
    val v = run("The quick  Brown fox\tthe")
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    // compiled projection matches interpreted eval
    val interp = expr.nullSafeEval(UTF8String.fromString("The quick  Brown fox\tthe"))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until dim).map(interp.getDouble) == v)
    // placement matches a by-hand count map over Spark's xxhash64 (seed 42)
    // mod dim of the lowercased tokens, L2-normalized
    val toks = Seq("the", "quick", "brown", "fox", "the")
    val cm = new Array[Double](dim)
    for (t <- toks) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromString(t), 42L)
      cm((((h % dim) + dim) % dim).toInt) += 1.0
    }
    val n = math.sqrt(cm.map(x => x * x).sum)
    assert(v == cm.map(_ / n).toSeq)
    // case/trim/whitespace-run insensitivity
    assert(run("  THE QUICK  brown FOX the ") == v)
  }
}
