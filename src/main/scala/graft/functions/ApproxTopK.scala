package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate top-k heavy hitters via Misra-Gries summaries — a custom
  * Catalyst `TypedImperativeAggregate` (SURVEY.md §7.3 preference (b) for
  * aggregate functions).
  *
  * Why not exact groupBy-count-orderBy? At 100 TB the distinct-term set
  * itself is enormous: exact top-k shuffles EVERY distinct term. This
  * aggregate keeps a bounded `capacity`-entry summary per partition and
  * merges summaries pairwise — the shuffle payload is O(capacity) per
  * partition, independent of vocabulary size.
  *
  * Guarantees (Misra-Gries, public algorithm): any term with true frequency
  * > N/capacity is present in the final summary, and each reported count is
  * a lower bound within N/capacity of the true count. Counts are NOT exact
  * and merge-order-dependent in their error term, so registry entries using
  * this are rows-only; the spec pins the containment guarantee instead.
  *
  * State is a term→count map serialized with plain length-prefixed UTF-8 —
  * no JVM serialization in the shuffle path.
  */
case class ApproxTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("approx_count", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"mg_top_k requires string, got $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Misra-Gries decrement step: drop every count by `by`, evicting zeros. */
  private def decrementAll(buf: mutable.HashMap[UTF8String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    for ((t, c) <- buf) {
      if (c <= by) dead += t else buf(t) = c - by
    }
    buf --= dead
  }

  override def update(
      buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String]
      buf.get(term) match {
        case Some(c) => buf(term) = c + 1
        case None if buf.size < capacity => buf(term.clone()) = 1L
        case None => decrementAll(buf, 1L)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    for ((t, c) <- other) buf(t) = buf.getOrElse(t, 0L) + c
    if (buf.size > capacity) {
      // shrink back: subtract the (capacity+1)-th largest count (standard
      // MG merge — preserves the N/capacity error bound)
      val counts = buf.values.toArray.sortBy(-_)
      decrementAll(buf, counts(capacity))
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val top = buf.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(k)
      .map { case (t, c) => InternalRow(t, c) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    for ((t, c) <- buf) {
      val bytes = t.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(UTF8String.fromBytes(b)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ApproxTopK =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_top_k"
}

object ApproxTopK {
  import org.apache.spark.sql.graftshim._

  def mg_top_k(c: Column, k: Int, capacity: Int): Column =
    columnOf(ApproxTopK(expressionOf(c), k, capacity).toAggregateExpression())
}
