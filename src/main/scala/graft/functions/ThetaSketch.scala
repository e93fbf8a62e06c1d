package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (Apache DataSketches, same library Spark's HLL functions
  * use) — mergeable distinct-count sketches that, unlike HLL, support SET
  * INTERSECTION: the overlap question every multi-source corpus asks
  * ("how many shingles do CommonCrawl-A and Wikipedia share?") without
  * shuffling raw keys. Each source reduces to a few-KB sketch once; any
  * pairwise (or k-way) overlap estimate is then driver-cheap arithmetic on
  * the sketches.
  *
  * Theta sketches keep the k smallest hash values of the input set — a
  * DETERMINISTIC function of the set (fixed default seed, order-independent
  * union), so estimates reproduce bit-for-bit across engines and
  * partitionings; registry entries are still rows-only (no DuckDB theta)
  * with SketchSpec pinning error bounds, merge-vs-direct equality, and
  * parquet roundtrip.
  */
object ThetaOps {
  def wrap(bytes: Array[Byte]): Sketch = Sketches.wrapSketch(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val in = SetOperation.builder().buildIntersection()
    in.intersect(wrap(a))
    in.intersect(wrap(b))
    in.getResult().getEstimate
  }

  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(wrap(a))
    u.union(wrap(b))
    u.getResult().getEstimate
  }

  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val d = SetOperation.builder().buildANotB()
    d.aNotB(wrap(a), wrap(b)).getEstimate
  }
}

/** Per-group theta sketch of a string/long/binary column; emits the compact
  * sketch bytes. Partial buffers merge associatively (map-side combine). */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4,26], got $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires string/long/int/binary, got $other")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.update(s.getBytes)
      case l: java.lang.Long => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case b: Array[Byte] => buf.update(b)
      case other => throw new IllegalStateException(s"unexpected input $other")
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult())
    buf
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  // the shuffle payload is the compact RESULT sketch (unions re-absorb it
  // losslessly — theta union is associative and order-independent)
  override def serialize(buf: Union): Array[Byte] = buf.getResult().toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "theta_sketch_agg"
}

/** Union previously-built compact sketches (e.g. read back from parquet)
  * into one — never touches raw values. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg requires binary sketches, got $other")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(ThetaOps.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult())
    buf
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult().toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "theta_union_agg"
}

/** Distinct-count estimate of a compact theta sketch. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"theta_estimate requires binary, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    ThetaOps.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ThetaOps.estimate($c)")
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
  override def prettyName: String = "theta_estimate"
}

/** Intersection-cardinality estimate of two compact theta sketches — the
  * operation HLL cannot do (inclusion-exclusion on HLL estimates explodes
  * in error when the overlap is small; theta intersects the hash sets
  * directly with a bounded relative error). */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect_estimate requires two binary sketches, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaOps.intersectEstimate($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersectEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "theta_intersect_estimate"
}

/** A-not-B cardinality estimate ("how many of A's keys are NOT in B") —
  * the incremental-ingest novelty metric: sketch the corpus once, sketch
  * each arriving batch, and batch-minus-corpus estimates the genuinely new
  * content without touching either raw set again. */
case class ThetaDiffEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_diff_estimate requires two binary sketches, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.aNotBEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaOps.aNotBEstimate($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaDiffEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "theta_diff_estimate"
}

object ThetaFunctions {
  import org.apache.spark.sql.graftshim._

  def theta_sketch_agg(c: Column, lgK: Int = 12): Column =
    columnOf(ThetaSketchAgg(expressionOf(c), lgK).toAggregateExpression())
  def theta_union_agg(c: Column, lgK: Int = 12): Column =
    columnOf(ThetaUnionAgg(expressionOf(c), lgK).toAggregateExpression())
  def theta_estimate(c: Column): Column = columnOf(ThetaEstimate(expressionOf(c)))
  def theta_intersect_estimate(a: Column, b: Column): Column =
    columnOf(ThetaIntersectEstimate(expressionOf(a), expressionOf(b)))
  def theta_diff_estimate(a: Column, b: Column): Column =
    columnOf(ThetaDiffEstimate(expressionOf(a), expressionOf(b)))
}
