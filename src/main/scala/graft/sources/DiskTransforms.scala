package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Partition TRANSFORMS for gdisk tables — the Iceberg-style temporal /
  * truncate layouts (`PARTITIONED BY (days(ts))`, `months(ts)`,
  * `years(d)`, `hours(ts)`, `truncate(8, url)`) that make time-series and
  * prefix-clustered corpora prunable at 100 TB without asking writers to
  * materialize a derived partition column.
  *
  * Layout contract (mirrors the hash-bucket discipline): a table whose
  * spec contains ANY non-identity transform keeps EVERY column in its
  * data files — the `<col>_<kind>=<value>/` dirs are grouping and pruning
  * metadata only, never inferred (`DiskManifest.hiveParts` is empty, so
  * no reader sets `basePath`). The transform is lossy (many timestamps
  * map to one day), so unlike identity hive layout the source values
  * could never be reconstructed from the path.
  *
  * All temporal math is UTC on the Catalyst INTERNAL representation
  * (timestamps = micros since epoch, dates = days since epoch) — no
  * session-timezone dependence, matching Iceberg's spec. Every kind is
  * MONOTONIC non-decreasing in its source value, which is what makes
  * range predicates on the source column prunable at the dir level:
  * `ts >= X` keeps exactly the dirs with `transform(dir) >= transform(X)`.
  *
  * Kind strings as persisted in `DiskManifest.partFuncs`: `identity`,
  * `years`, `months`, `days`, `hours`, `truncate:<width>`.
  *
  * Reference scope note: qurious has no table partitioning at all (its
  * providers materialize whole tables — `qurious/src/provider/mod.rs`);
  * this layer is part of the Spark-native scale surface.
  */
object DiskTransforms {

  val Identity = "identity"

  def isIdentity(kind: String): Boolean = kind == Identity

  private def truncWidth(kind: String): Int = {
    val w = kind.stripPrefix("truncate:").toInt
    require(w >= 1, s"gdisk: truncate width must be >= 1, got $w")
    w
  }

  /** The dir-segment key for a partition column under `kind` —
    * `ts_day=...`, `ts_month=...`, `url_trunc=...`; identity keeps the
    * plain hive `col=...`. Distinct from any real column name by
    * construction (create-time validation rejects collisions). */
  def segName(col: String, kind: String): String = kind match {
    case Identity => col
    case k if k.startsWith("truncate:") => s"${col}_trunc"
    case k => s"${col}_${k.stripSuffix("s")}" // years -> _year, days -> _day
  }

  /** Create-time validation: is `kind` applicable to a column of `dt`?
    * Returns the error message, or None when valid. */
  def validate(kind: String, col: String, dt: DataType): Option[String] =
    kind match {
      case Identity => None
      case "years" | "months" | "days" => dt match {
        case TimestampType | TimestampNTZType | DateType => None
        case other => Some(s"gdisk: $kind($col) needs a timestamp or date " +
          s"column, got $other")
      }
      case "hours" => dt match {
        case TimestampType | TimestampNTZType => None
        case other => Some(s"gdisk: hours($col) needs a timestamp column, " +
          s"got $other")
      }
      case k if k.startsWith("truncate:") => dt match {
        case StringType | LongType | IntegerType | ShortType | ByteType => None
        case other => Some(s"gdisk: truncate($col) needs a string or " +
          s"integral column, got $other")
      }
      case other => Some(s"gdisk: unknown partition transform '$other'")
    }

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  private def epochDayOf(dt: DataType, v: Any): Long = dt match {
    case DateType => v.asInstanceOf[Number].longValue()
    case _ => Math.floorDiv(v.asInstanceOf[Number].longValue(), MicrosPerDay)
  }

  /** Source value (Catalyst internal, non-null) -> transform value.
    * Domain: java.lang.Long for the temporal kinds and integral
    * truncate; String for string truncate; for identity the internal
    * value passes through unchanged. */
  def apply(kind: String, dt: DataType, v: Any): Any = kind match {
    case Identity => v
    case "days" => Long.box(epochDayOf(dt, v))
    case "hours" =>
      Long.box(Math.floorDiv(v.asInstanceOf[Number].longValue(), MicrosPerHour))
    case "months" =>
      val d = LocalDate.ofEpochDay(epochDayOf(dt, v))
      Long.box(d.getYear.toLong * 12 + (d.getMonthValue - 1))
    case "years" =>
      Long.box(LocalDate.ofEpochDay(epochDayOf(dt, v)).getYear.toLong)
    case k if k.startsWith("truncate:") =>
      val w = truncWidth(k)
      dt match {
        case StringType =>
          val s = v match {
            case u: UTF8String => u.toString
            case s: String => s
          }
          if (s.length <= w) s else s.substring(0, w)
        case _ =>
          val l = v.asInstanceOf[Number].longValue()
          Long.box(Math.floorDiv(l, w.toLong) * w)
      }
  }

  /** Transform value -> the raw dir string (pre URL-encoding). Zero-padded
    * so that for the temporal kinds LEXICOGRAPHIC order equals value
    * order within the representable range. */
  def render(kind: String, tv: Any): String = kind match {
    case "days" => LocalDate.ofEpochDay(tv.asInstanceOf[Long]).toString
    case "hours" =>
      val h = tv.asInstanceOf[Long]
      val d = LocalDate.ofEpochDay(Math.floorDiv(h, 24L))
      f"$d-${Math.floorMod(h, 24L)}%02d"
    case "months" =>
      val m = tv.asInstanceOf[Long]
      f"${Math.floorDiv(m, 12L)}%04d-${Math.floorMod(m, 12L) + 1}%02d"
    case "years" => f"${tv.asInstanceOf[Long]}%04d"
    case _ => String.valueOf(tv)
  }

  /** Raw dir string -> transform value (inverse of [[render]]); the
    * comparable form static/dynamic pruning tests against. */
  def parse(kind: String, dt: DataType, raw: String): Any = kind match {
    case "days" => Long.box(LocalDate.parse(raw).toEpochDay)
    case "hours" =>
      Long.box(LocalDate.parse(raw.substring(0, 10)).toEpochDay * 24L +
        raw.substring(11).toLong)
    case "months" =>
      val y = raw.substring(0, raw.length - 3).toLong
      Long.box(y * 12 + (raw.substring(raw.length - 2).toLong - 1))
    case "years" => Long.box(raw.toLong)
    case k if k.startsWith("truncate:") => dt match {
      case StringType => raw
      case _ => Long.box(raw.toLong)
    }
    case Identity => sys.error("gdisk: identity dirs parse via dirValue")
  }

  /** INCLUSIVE [min, max] bounds of the SOURCE column over a dir whose
    * transform value is `tv`, encoded in the manifest-stat string form
    * ([[DiskStats.ColStats]] / `mayMatch` domain: micros for timestamps,
    * epoch days for dates, plain numerals for integrals). This is what
    * lets metadata-only DELETE prove a whole day/month/hour dir all-match
    * with zero file I/O: `day(dir) = d` implies every row's ts lies in
    * `[d*86400e6, (d+1)*86400e6)`. String truncate has no tight upper
    * bound — returns None (conservative fallback). */
  def sourceBounds(kind: String, dt: DataType, tv: Any)
      : Option[(String, String)] = {
    def ts(loDay: Long, hiDayExcl: Long): (String, String) =
      (String.valueOf(loDay * MicrosPerDay),
        String.valueOf(hiDayExcl * MicrosPerDay - 1))
    def monthsRange(m: Long, monthsSpan: Int): Option[(String, String)] = {
      val lo = LocalDate.of(Math.floorDiv(m, 12L).toInt,
        Math.floorMod(m, 12L).toInt + 1, 1)
      val hiExcl = lo.plusMonths(monthsSpan.toLong)
      dt match {
        case DateType => Some((String.valueOf(lo.toEpochDay),
          String.valueOf(hiExcl.toEpochDay - 1)))
        case TimestampType | TimestampNTZType =>
          Some(ts(lo.toEpochDay, hiExcl.toEpochDay))
        case _ => None
      }
    }
    kind match {
      case "days" => dt match {
        case DateType =>
          val d = String.valueOf(tv.asInstanceOf[Long])
          Some((d, d)) // a date column's day transform is the value itself
        case TimestampType | TimestampNTZType =>
          val d = tv.asInstanceOf[Long]
          Some(ts(d, d + 1))
        case _ => None
      }
      case "hours" => dt match {
        case TimestampType | TimestampNTZType =>
          val h = tv.asInstanceOf[Long]
          Some((String.valueOf(h * MicrosPerHour),
            String.valueOf((h + 1) * MicrosPerHour - 1)))
        case _ => None
      }
      case "months" => monthsRange(tv.asInstanceOf[Long], 1)
      case "years" => monthsRange(tv.asInstanceOf[Long] * 12, 12)
      case k if k.startsWith("truncate:") => dt match {
        case StringType => None // no tight upper bound on a string prefix
        case _ =>
          val w = truncWidth(k)
          val t = tv.asInstanceOf[Long]
          Some((String.valueOf(t), String.valueOf(t + w - 1)))
      }
      case _ => None
    }
  }

  /** A source value encoded in the manifest-stat string domain (micros /
    * epoch days / numerals / raw strings) — for boundary comparisons
    * against [[sourceBounds]]. */
  def statEncode(dt: DataType, v: Any): Option[String] = dt match {
    case TimestampType | TimestampNTZType | DateType |
         LongType | IntegerType | ShortType | ByteType =>
      Some(String.valueOf(v.asInstanceOf[Number].longValue()))
    case StringType => v match {
      case u: UTF8String => Some(u.toString)
      case s: String => Some(s)
      case _ => None
    }
    case _ => None
  }

  /** Is `v` (internal source value of type `dt`) exactly the FIRST value
    * of its transform bucket `tv`? Then a strict `col < v` excludes the
    * whole bucket and the pruning bound tightens by one. */
  def isBucketStart(kind: String, dt: DataType, v: Any, tv: Any): Boolean =
    sourceBounds(kind, dt, tv).exists(b => statEncode(dt, v).contains(b._1))

  /** Is `v` exactly the LAST value of its bucket? Then a strict
    * `col > v` excludes the whole bucket. */
  def isBucketEnd(kind: String, dt: DataType, v: Any, tv: Any): Boolean =
    sourceBounds(kind, dt, tv).exists(b => statEncode(dt, v).contains(b._2))

  /** Ordering over the transform-value domain (Long or String). */
  def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case _ => sys.error(s"gdisk: incomparable transform values $a / $b")
  }

  /** Parse a Spark connector [[org.apache.spark.sql.connector.expressions.Transform]]
    * into (sourceColumn, kind); None when the transform is not one of
    * ours (bucket is handled separately by the caller). */
  def fromV2(t: org.apache.spark.sql.connector.expressions.Transform)
      : Option[(String, String)] = {
    def ref: Option[String] = t.references().toSeq match {
      case Seq(r) => Some(r.fieldNames().mkString("."))
      case _ => None
    }
    t.name() match {
      case "identity" => ref.map((_, Identity))
      case n @ ("years" | "months" | "days" | "hours") => ref.map((_, n))
      // Spark parses `PARTITIONED BY (year(ts))` (singular) to ApplyTransform
      case "year" => ref.map((_, "years"))
      case "month" => ref.map((_, "months"))
      case "day" => ref.map((_, "days"))
      case "hour" => ref.map((_, "hours"))
      case "truncate" =>
        val w = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }
        for { c <- ref; width <- w } yield (c, s"truncate:$width")
      case _ => None
    }
  }

  /** Report (col, kind) back as a Spark connector transform. */
  def toV2(col: String, kind: String)
      : org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    kind match {
      case Identity => Expressions.identity(col)
      case "years" => Expressions.years(col)
      case "months" => Expressions.months(col)
      case "days" => Expressions.days(col)
      case "hours" => Expressions.hours(col)
      case k if k.startsWith("truncate:") =>
        Expressions.apply("truncate",
          Expressions.literal(Int.box(truncWidth(k))), Expressions.column(col))
    }
  }
}
