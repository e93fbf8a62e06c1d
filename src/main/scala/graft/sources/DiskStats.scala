package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Per-file column statistics for manifest-level data skipping.
  *
  * `min`/`max` are value bounds over the file's NON-null values (absent
  * when the file is all-null for the column, when a row group lacked
  * usable statistics, or when the type is not indexed); `nulls` is the
  * file's null count for the column (absent when any row group did not
  * record it); `rows` is the file's row count. All values are stored as
  * strings (JSON-manifest friendly) and decoded against the table schema
  * at scan time. */
case class ColStats(
    min: Option[String], max: Option[String],
    nulls: Option[Long], rows: Long)

/** Manifest-level data skipping for the gdisk tier — the Delta/Iceberg
  * move (their `stats` / manifest `lower_bounds`/`upper_bounds`): each
  * commit records per-file per-column min/max/nullCount harvested from
  * the parquet FOOTERS of the files it adds (executor-side, in the same
  * task that wrote the file), and every scan's pushed filters are
  * evaluated against those bounds BEFORE the inner parquet scan is
  * planned. At 100 TB the win over parquet's own row-group pruning is
  * that skipped files are never listed, opened, or scheduled — the
  * planner touches manifest entries, not storage.
  *
  * The reference has no persistent-table tier at all (its
  * `providers.rs:11-57` chain serves in-memory registrations), so this
  * whole layer is extension surface; semantics follow the public Delta
  * protocol's stats fields.
  *
  * Everything here is CONSERVATIVE: any stat that cannot be decoded, any
  * expression shape not understood, any type not indexed → "may match"
  * → the file is read. Skipping can only ever remove files that provably
  * contain no row satisfying the conjunction of pushed filters. */
object DiskStats {

  /** Stats are harvested for at most this many leading table columns
    * (Delta's `dataSkippingNumIndexedCols` default) — bounds manifest
    * growth on very wide tables. */
  val MaxIndexedCols = 32

  /** Spark types indexed for skipping. Timestamps are indexed only when
    * written as INT64 (micros) — INT96 carries no usable parquet stats. */
  private def indexed(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType => true
    case FloatType | DoubleType => true
    case StringType => true
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Expected parquet physical type for an indexed Spark type. */
  private def physical(dt: DataType): PrimitiveTypeName = dt match {
    case ByteType | ShortType | IntegerType | DateType =>
      PrimitiveTypeName.INT32
    case LongType | TimestampType | TimestampNTZType =>
      PrimitiveTypeName.INT64
    case FloatType => PrimitiveTypeName.FLOAT
    case DoubleType => PrimitiveTypeName.DOUBLE
    case StringType => PrimitiveTypeName.BINARY
    case other => throw new IllegalArgumentException(s"not indexed: $other")
  }

  /** Read one parquet file's footer and fold its row-group statistics
    * into per-column [[ColStats]]. `fileSchema` is the file's schema
    * (table schema minus hive-encoded partition columns). Ran executor-
    * side right after the writer closes the file, or driver-side for the
    * handful of files a maintenance rewrite (OPTIMIZE/rename) moves. */
  def footerStats(
      path: HPath, conf: Configuration,
      fileSchema: StructType): Map[String, ColStats] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.iterator.map(_.getRowCount).sum
      val fields = fileSchema.fields.iterator.take(MaxIndexedCols)
        .filter(f => indexed(f.dataType)).toSeq
      fields.flatMap { f =>
        var minV: Any = null
        var maxV: Any = null
        var boundsOk = true
        var nulls = 0L
        var nullsOk = true
        blocks.foreach { b =>
          b.getColumns.asScala.find { c =>
            val p = c.getPath.toArray
            p.length == 1 && p(0) == f.name
          } match {
            case Some(chunk)
                if chunk.getPrimitiveType.getPrimitiveTypeName == physical(f.dataType) =>
              val st = chunk.getStatistics
              if (st == null || !st.isNumNullsSet) nullsOk = false
              else nulls += st.getNumNulls
              if (st != null && st.isNumNullsSet && st.getNumNulls == b.getRowCount) {
                // all-null row group: contributes no value bounds
              } else if (st != null && st.hasNonNullValue) {
                decode(st.genericGetMin, f.dataType)
                  .zip(decode(st.genericGetMax, f.dataType)) match {
                  case Some((lo, hi)) =>
                    if (minV == null || cmp(lo, minV) < 0) minV = lo
                    if (maxV == null || cmp(hi, maxV) > 0) maxV = hi
                  case None => boundsOk = false
                }
              } else boundsOk = false
            case _ => boundsOk = false; nullsOk = false
          }
        }
        // NaN poisons float/double ordering — drop bounds if present
        val nan = Seq(minV, maxV).exists {
          case d: java.lang.Double => d.isNaN
          case _ => false
        }
        val bounds =
          if (boundsOk && minV != null && !nan) Some((minV, maxV)) else None
        // -0.0/0.0 compare equal in SQL but not byte-wise: widen to be safe
        val widened = bounds.map {
          case (lo: java.lang.Double, hi: java.lang.Double) =>
            (if (lo == 0.0d) java.lang.Double.valueOf(-0.0d) else lo,
             if (hi == 0.0d) java.lang.Double.valueOf(0.0d) else hi)
          case other => other
        }
        Some(f.name -> ColStats(
          widened.map(b => encode(b._1)), widened.map(b => encode(b._2)),
          if (nullsOk) Some(nulls) else None, rows))
      }.toMap
    } finally reader.close()
  }

  // Normalized comparison domain: Long (integral/date/timestamp),
  // Double (float/double), UTF8String (string). Encode/decode round-trip
  // through the manifest's JSON strings exactly.
  private def encode(v: Any): String = v match {
    case d: java.lang.Double => java.lang.Double.toString(d)
    case other => other.toString
  }

  private def decodeStat(s: String, dt: DataType): Any = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType => java.lang.Long.valueOf(s.toLong)
    case FloatType | DoubleType => java.lang.Double.valueOf(s.toDouble)
    case StringType => UTF8String.fromString(s)
    case other => throw new IllegalArgumentException(s"not indexed: $other")
  }

  /** Manifest stat string → the column's CATALYST-INTERNAL value (what
    * `ColumnStat.min/max` and CBO's `EstimationUtils.toDouble` expect —
    * Int for int/date, Long for long/timestamp, Float for float, …),
    * as opposed to [[decodeStat]]'s widened comparison domain. None for
    * types the manifest doesn't index. */
  private[sources] def decodeCatalyst(s: String, dt: DataType): Option[Any] =
    dt match {
      case ByteType => Some(s.toLong.toByte)
      case ShortType => Some(s.toLong.toShort)
      case IntegerType | DateType => Some(s.toLong.toInt)
      case LongType | TimestampType | TimestampNTZType => Some(s.toLong)
      case FloatType => Some(s.toDouble.toFloat)
      case DoubleType => Some(s.toDouble)
      case StringType => Some(UTF8String.fromString(s))
      case _ => None
    }

  /** Merge per-file manifest bounds for `name` into table-level
    * (min, max, nullCount) in catalyst-internal form — the CBO
    * `ColumnStat` feed. Bounds merge only when every planned file either
    * carries decodable bounds or is PROVABLY all-null for the column
    * (contributes no non-null values); any file with undecodable bounds
    * poisons min/max (its rows may lie outside). nullCount sums only
    * when every file recorded one. */
  def mergedBounds(
      perFile: Seq[Map[String, ColStats]], name: String, dt: DataType)
      : (Option[Any], Option[Any], Option[Long]) = {
    var minS: String = null
    var maxS: String = null
    var boundsOk = true
    var nulls = 0L
    var nullsOk = true
    perFile.foreach { st =>
      st.get(name) match {
        case Some(cs) =>
          if (cs.nulls.isDefined) nulls += cs.nulls.get else nullsOk = false
          (cs.min, cs.max) match {
            case (Some(lo), Some(hi)) =>
              if (minS == null ||
                  cmp(decodeStat(lo, dt), decodeStat(minS, dt)) < 0) minS = lo
              if (maxS == null ||
                  cmp(decodeStat(hi, dt), decodeStat(maxS, dt)) > 0) maxS = hi
            case _ =>
              // no bounds: safe only if the file is provably all-null
              if (!cs.nulls.contains(cs.rows)) boundsOk = false
          }
        case None => boundsOk = false; nullsOk = false
      }
    }
    val mm =
      if (boundsOk && minS != null)
        decodeCatalyst(minS, dt).zip(decodeCatalyst(maxS, dt))
      else None
    (mm.map(_._1), mm.map(_._2), if (nullsOk) Some(nulls) else None)
  }

  /** parquet footer value → normalized domain (None = can't use). */
  private def decode(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (i: java.lang.Integer, ByteType | ShortType | IntegerType | DateType) =>
      Some(java.lang.Long.valueOf(i.longValue()))
    case (l: java.lang.Long, LongType | TimestampType | TimestampNTZType) =>
      Some(java.lang.Long.valueOf(l.longValue()))
    case (f: java.lang.Float, FloatType) =>
      Some(java.lang.Double.valueOf(f.doubleValue()))
    case (d: java.lang.Double, DoubleType) => Some(d)
    case (b: org.apache.parquet.io.api.Binary, StringType) =>
      Some(UTF8String.fromBytes(b.getBytes))
    case _ => None
  }

  /** Catalyst-internal value → normalized domain, keyed by the
    * ATTRIBUTE's type (a bare attribute comparison means Catalyst already
    * unified the types). */
  private def internalVal(raw: Any, attrDt: DataType): Option[Any] =
    (raw, attrDt) match {
      case (b: Byte, ByteType) => Some(java.lang.Long.valueOf(b.toLong))
      case (s: Short, ShortType) => Some(java.lang.Long.valueOf(s.toLong))
      case (i: Int, IntegerType | DateType) =>
        Some(java.lang.Long.valueOf(i.toLong))
      case (l2: Long, LongType | TimestampType | TimestampNTZType) =>
        Some(java.lang.Long.valueOf(l2))
      case (f: Float, FloatType) => Some(java.lang.Double.valueOf(f.toDouble))
      case (d: Double, DoubleType) => Some(java.lang.Double.valueOf(d))
      case (u: UTF8String, StringType) => Some(u)
      case _ => None
    }

  private def litVal(l: Literal, attrDt: DataType): Option[Any] =
    if (l.value == null) None else internalVal(l.value, attrDt)

  private def cmp(a: Any, b: Any): Int =
    a.asInstanceOf[Comparable[Any]].compareTo(b)

  /** Conservative "could any row of this file satisfy `e`?" over the
    * file's column stats. `dtOf` resolves a column name to its table
    * type. Unknown shapes/types/missing stats → true. */
  def mayMatch(
      st: Map[String, ColStats], dtOf: String => Option[DataType],
      e: Expression): Boolean = {

    def stats(a: Attribute): Option[ColStats] = st.get(a.name)

    def bounds(a: Attribute): Option[(Any, Any)] = for {
      cs <- stats(a)
      dt <- dtOf(a.name)
      lo <- cs.min
      hi <- cs.max
    } yield (decodeStat(lo, dt), decodeStat(hi, dt))

    /** File provably holds no non-null value for the column. */
    def allNull(a: Attribute): Boolean =
      stats(a).exists(cs => cs.nulls.contains(cs.rows) && cs.rows > 0)

    def cmpPred(a: Attribute, l: Literal)(
        keep: (Any, (Any, Any)) => Boolean): Boolean = {
      if (allNull(a)) return false // comparisons never match NULL
      (for {
        dt <- dtOf(a.name)
        v <- litVal(l, dt)
        b <- bounds(a)
      } yield keep(v, b)).getOrElse(true)
    }

    def eqMay(a: AttributeReference, l: Literal): Boolean =
      cmpPred(a, l)((v, b) => cmp(v, b._1) >= 0 && cmp(v, b._2) <= 0)

    def nullMay(a: AttributeReference): Boolean =
      stats(a).flatMap(_.nulls).forall(_ > 0)

    /** Smallest string strictly greater than every string with prefix
      * `p`: increment the last non-0xFF byte, truncate after it. All-0xFF
      * prefixes have no successor (None → no upper bound). */
    def prefixSucc(p: UTF8String): Option[UTF8String] = {
      val bytes = p.getBytes.clone()
      var i = bytes.length - 1
      while (i >= 0 && bytes(i) == -1) i -= 1
      if (i < 0) None
      else {
        bytes(i) = (bytes(i) + 1).toByte
        Some(UTF8String.fromBytes(java.util.Arrays.copyOf(bytes, i + 1)))
      }
    }

    e match {
      case And(l, r) => mayMatch(st, dtOf, l) && mayMatch(st, dtOf, r)
      case Or(l, r) => mayMatch(st, dtOf, l) || mayMatch(st, dtOf, r)

      case EqualTo(a: AttributeReference, l: Literal) => eqMay(a, l)
      case EqualTo(l: Literal, a: AttributeReference) => eqMay(a, l)
      case EqualNullSafe(a: AttributeReference, l: Literal) =>
        if (l.value == null) nullMay(a) else eqMay(a, l)
      case EqualNullSafe(l: Literal, a: AttributeReference) =>
        if (l.value == null) nullMay(a) else eqMay(a, l)

      case GreaterThan(a: AttributeReference, l: Literal) =>
        cmpPred(a, l)((v, b) => cmp(b._2, v) > 0)
      case GreaterThan(l: Literal, a: AttributeReference) =>
        cmpPred(a, l)((v, b) => cmp(b._1, v) < 0)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        cmpPred(a, l)((v, b) => cmp(b._2, v) >= 0)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        cmpPred(a, l)((v, b) => cmp(b._1, v) <= 0)
      case LessThan(a: AttributeReference, l: Literal) =>
        cmpPred(a, l)((v, b) => cmp(b._1, v) < 0)
      case LessThan(l: Literal, a: AttributeReference) =>
        cmpPred(a, l)((v, b) => cmp(b._2, v) > 0)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        cmpPred(a, l)((v, b) => cmp(b._1, v) <= 0)
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        cmpPred(a, l)((v, b) => cmp(b._2, v) >= 0)

      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        // NULL list entries never equality-match — ignore them
        val lits = vs.collect { case l: Literal if l.value != null => l }
        lits.isEmpty || lits.exists(eqMay(a, _))
      case InSet(a: AttributeReference, vs) =>
        if (allNull(a)) false
        else (for {
          dt <- dtOf(a.name)
          b <- bounds(a)
        } yield vs.exists { raw =>
          raw == null || internalVal(raw, dt)
            .forall(v => cmp(v, b._1) >= 0 && cmp(v, b._2) <= 0)
        }).getOrElse(true)

      case IsNull(a: AttributeReference) => nullMay(a)
      case IsNotNull(a: AttributeReference) =>
        stats(a) match {
          case Some(cs) => cs.nulls.forall(n => cs.rows - n > 0) || cs.rows == 0
          case None => true
        }

      case StartsWith(a: AttributeReference, l: Literal)
          if l.value.isInstanceOf[UTF8String] =>
        if (allNull(a)) false
        else bounds(a) match {
          case Some((lo: UTF8String, hi: UTF8String)) =>
            val p = l.value.asInstanceOf[UTF8String]
            // values with prefix p live in [p, succ(p)): overlap test
            cmp(hi, p) >= 0 && prefixSucc(p).forall(s => cmp(lo, s) < 0)
          case _ => true
        }

      case _ => true
    }
  }
}
