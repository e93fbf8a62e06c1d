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

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
