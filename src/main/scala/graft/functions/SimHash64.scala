package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over an `array<string>` token column — a custom Catalyst
  * `Expression` with codegen (SURVEY.md §7.3 preference (b): a native
  * expression where built-ins can't express the semantics; the reference has
  * no equivalent operator, this is part of the LLM-pipeline extension layer).
  *
  * Per token: a 64-bit FNV-1a hash of its UTF-8 bytes; each hash bit votes
  * ±1 into 64 counters; the sign vector is the document's simhash. Hamming
  * distance between simhashes approximates token-multiset similarity, so
  * near-dup candidates are pairs within a small Hamming radius — O(1) state
  * per row, no shuffle, safe at any corpus size.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    Exprs.simhash(arr)
  }

  // Kernel lives on `Exprs` (standalone object → static mirror class);
  // `graft.functions.SimHash64.eval` has no static forwarder (suppressed by
  // the inherited Expression.eval overload), so calling it here made janino
  // fail and Spark fall back to interpreted eval for the whole stage.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Exprs.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Reference implementation for tests. */
  def ofTokens(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv1a64(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.graftshim._
    columnOf(SimHash64(expressionOf(c)))
  }
}
