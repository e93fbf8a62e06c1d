package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, built from codegen'd
  * higher-order functions (no UDFs, SURVEY.md §7.3 preference order (a)).
  *
  * All arithmetic is an explicit sequential double fold — `aggregate` folds
  * left-to-right — so results are bit-deterministic and reproducible by any
  * engine that folds the same way (the DuckDB oracle uses
  * `list_sum(list_transform(list_zip(..)))`, verified bit-identical).
  *
  * At scale: these are per-row expressions (narrow, no shuffle) — a 100 TB
  * embedding table streams through them inside whole-stage codegen.
  */
object VectorOps {

  /** array<float> → array<double>, elementwise. */
  def vecD(c: Column): Column = transform(c, x => x.cast("double"))

  /** Dot product of two double arrays (sequential fold). Native expression
    * ([[graft.functions.DotProduct]]) — bit-identical to
    * aggregate(zip_with(a,b,*), 0.0, +) at a fraction of the cost. */
  def dot(a: Column, b: Column): Column =
    graft.functions.NativeFunctions.dot_product(a, b)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Squared euclidean distance. Native expression
    * ([[graft.functions.SqDistExpr]]) — bit-identical to
    * aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0.0, +) including the
    * null/length semantics, without the interpreted zip_with allocation +
    * fold per call (cell assignment evaluates this K times per row). */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.NativeFunctions.sq_dist(a, b)

  // ------------------------------------------------ int8 scalar quantization

  /** Per-vector symmetric int8 quantization: scale = max(|x|)/127, codes =
    * round(x/scale). 4× memory cut for ANN candidate storage (the reason
    * billion-vector indexes fit at all); reconstruction error per element
    * is ≤ scale/2. Returns a struct (scale, codes: array<tinyint>).
    * Zero vectors get scale 0 and all-zero codes. */
  def quantizeInt8(v: Column): Column = {
    val absMax = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val scale = absMax / lit(127.0)
    struct(
      scale.as("scale"),
      transform(v, x =>
        when(scale === 0.0, lit(0).cast("tinyint"))
          .otherwise(round(x / scale).cast("tinyint"))).as("codes"))
  }

  /** Inverse of [[quantizeInt8]]: codes × scale. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))

  // ------------------------------------------------ binary (sign) quantization

  /** Sign-bit signature: bit i set iff v[i] > 0, packed into ONE BIGINT
    * (dims ≤ 63). The most aggressive embedding compression — 32 float
    * dims (128 B) become 8 bytes, a 16× cut — and Hamming distance between
    * signatures tracks angular distance (Charikar 2002 hyperplane LSH with
    * the coordinate axes as planes). Pure integer column arithmetic:
    * engine-neutral, so unlike RNG-projected signatures this one is
    * DuckDB-oracle-checkable bit for bit. */
  def signBits(v: Column): Column = {
    import org.apache.spark.sql.graftshim._
    def shl(a: Column, b: Column): Column = columnOf(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        expressionOf(a), expressionOf(b)))
    aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => when(x > 0.0f, shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two packed signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
