package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{CountMinSketch => SparkCms}

/** Count-min sketches (Spark's own `org.apache.spark.util.sketch`) — the
  * mergeable POINT-FREQUENCY leg of the sketch layer (HLL: distinct,
  * Misra-Gries: top-k heavy hitters, theta: set overlap, KLL: quantiles,
  * CMS: per-key counts). Misra-Gries answers "which keys are heavy"; CMS
  * answers "how often does THIS key occur" for any later-chosen key —
  * persisted per-shard sketches give any-key frequency lookups over any
  * slice union without re-scanning raw tokens.
  *
  * Deterministic: hash rows are seeded by an explicit constant, and updates
  * are commutative integer adds, so sketch BYTES are identical on any
  * partitioning/run, and merged-estimate == direct-estimate exactly
  * (elementwise matrix add) — SketchSpec pins both plus the classic
  * guarantees (never under-counts; over-count ≤ eps·N at confidence).
  * Rows-only in the registry (no DuckDB CMS); the entry also emits the
  * exact count so over-count is visible per row.
  */
object CmsOps {
  /** Fixed seed — sketch bytes must reproduce across runs and engines. */
  val Seed = 0x5eed

  def wrap(bytes: Array[Byte]): SparkCms = SparkCms.readFrom(bytes)

  def toBytes(sk: SparkCms): Array[Byte] = sk.toByteArray

  def estimateString(bytes: Array[Byte], key: UTF8String): Long =
    wrap(bytes).estimateCount(key.toString)

  def estimateLong(bytes: Array[Byte], key: Long): Long =
    wrap(bytes).estimateCount(key)

  /** Equi-join cardinality estimate from two sketches built over the two
    * join-key columns with the SAME depth/width/seed (Cormode &
    * Muthukrishnan 2005 §4.2): est = min over rows d of Σ_w t1[d][w]·t2[d][w].
    * Never underestimates the true size Σ_k f1(k)·f2(k); overcount is
    * ≤ (e/width)·N1·N2 with high probability. This is the sketch-only
    * answer to "how big would this join be" a cost-based planner asks at
    * 100 TB — no key enumeration, no scan, just two persisted byte arrays.
    * Spark's impl keeps the counter table private; read via reflection
    * (layout stable across Spark 1.x–4.x). */
  def innerProduct(b1: Array[Byte], b2: Array[Byte]): Long = {
    val s1 = wrap(b1)
    val s2 = wrap(b2)
    val f = s1.getClass.getDeclaredField("table")
    f.setAccessible(true)
    val t1 = f.get(s1).asInstanceOf[Array[Array[Long]]]
    val t2 = f.get(s2).asInstanceOf[Array[Array[Long]]]
    require(t1.length == t2.length && t1.head.length == t2.head.length,
      s"sketch shapes differ: ${t1.length}x${t1.head.length} vs ${t2.length}x${t2.head.length}")
    t1.indices.map { d =>
      var acc = 0L
      var w = 0
      while (w < t1(d).length) { acc += t1(d)(w) * t2(d)(w); w += 1 }
      acc
    }.min
  }
}

/** Per-group count-min sketch of a string/integral column; emits the
  * serialized sketch. Partial buffers merge associatively (map-side
  * combine); depth×width longs per buffer. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SparkCms] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 8, s"width must be >= 8, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch_agg requires string or integral column, got $other")
  }

  override def createAggregationBuffer(): SparkCms =
    SparkCms.create(depth, width, CmsOps.Seed)

  override def update(buf: SparkCms, input: InternalRow): SparkCms = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.addString(s.toString)
      case l: java.lang.Long => buf.addLong(l.longValue())
      case i: java.lang.Integer => buf.addLong(i.longValue())
      case s: java.lang.Short => buf.addLong(s.longValue())
      case b: java.lang.Byte => buf.addLong(b.longValue())
      case other => throw new IllegalStateException(s"unexpected input $other")
    }
    buf
  }

  override def merge(buf: SparkCms, other: SparkCms): SparkCms = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: SparkCms): Any = CmsOps.toBytes(buf)
  override def serialize(buf: SparkCms): Array[Byte] = CmsOps.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): SparkCms = CmsOps.wrap(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_sketch_agg"
}

/** Merge stored CMS sketches (binary column) into one — exact elementwise
  * add, so rollups of persisted sketches lose nothing vs a direct build. */
case class CmsMergeAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SparkCms] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_merge_agg requires binary sketches, got $other")
  }

  override def createAggregationBuffer(): SparkCms =
    SparkCms.create(depth, width, CmsOps.Seed)

  override def update(buf: SparkCms, input: InternalRow): SparkCms = {
    val v = child.eval(input)
    if (v != null) buf.mergeInPlace(CmsOps.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: SparkCms, other: SparkCms): SparkCms = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: SparkCms): Any = CmsOps.toBytes(buf)
  override def serialize(buf: SparkCms): Array[Byte] = CmsOps.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): SparkCms = CmsOps.wrap(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_merge_agg"
}

/** Estimated count of a key (string or integral) under a CMS sketch. */
case class CmsEstimate(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType | IntegerType | ShortType | ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary sketch, string|integral key), got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any = b match {
    case s: UTF8String => CmsOps.estimateString(a.asInstanceOf[Array[Byte]], s)
    case n: java.lang.Number =>
      CmsOps.estimateLong(a.asInstanceOf[Array[Byte]], n.longValue())
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    right.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CmsOps.estimateString($a, $b)")
      case _ =>
        defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CmsOps.estimateLong($a, (long)$b)")
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}

object CmsFunctions {
  import org.apache.spark.sql.graftshim._

  def cms_sketch_agg(c: Column, depth: Int = 5, width: Int = 4096): Column =
    columnOf(CmsSketchAgg(expressionOf(c), depth, width).toAggregateExpression())
  def cms_merge_agg(c: Column, depth: Int = 5, width: Int = 4096): Column =
    columnOf(CmsMergeAgg(expressionOf(c), depth, width).toAggregateExpression())
  def cms_estimate(sketch: Column, key: Column): Column =
    columnOf(CmsEstimate(expressionOf(sketch), expressionOf(key)))
}
