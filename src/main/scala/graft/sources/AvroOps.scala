package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Avro interchange — the remaining row-oriented exchange format (Kafka
  * pipelines, schema-registry ecosystems). Spark 4 ships the avro-1.12
  * RUNTIME jars but not the spark-avro module, so this is a thin
  * executor-parallel reader/writer over the public `DataFileReader` /
  * `DataFileWriter` API:
  *
  *   - [[readAvro]]: driver reads ONE file header for the schema (O(KB)),
  *     executors decode whole container files in parallel (one task per
  *     file — Avro's sync-marker sub-file splitting is a later
  *     optimization; crawl-scale Avro arrives as many files, which this
  *     layout parallelizes fully). The session Hadoop configuration
  *     ships to tasks, so credentials/filesystem keys survive.
  *   - [[writeAvro]]: per-partition container part files + _SUCCESS,
  *     deflate-compressed, schema derived from the DataFrame's.
  *
  * Type mapping (both directions): long/int/double/float/boolean/
  * string/binary, decimal(bytes + logical), date(int + logical),
  * timestamp-micros, local-timestamp-micros (NTZ), nested records,
  * arrays, string-keyed maps; every field nullable via [null, T] unions
  * (Spark's nullability model). */
object AvroOps {

  // ------------------------------------------------------ schema mapping

  /** Spark type → Avro schema (nullable union at every level). */
  private def toAvro(dt: DataType, path: String): ASchema = {
    val base = dt match {
      case LongType => ASchema.create(ASchema.Type.LONG)
      case IntegerType | ShortType | ByteType =>
        ASchema.create(ASchema.Type.INT)
      case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
      case FloatType => ASchema.create(ASchema.Type.FLOAT)
      case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
      case StringType => ASchema.create(ASchema.Type.STRING)
      case BinaryType => ASchema.create(ASchema.Type.BYTES)
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(ASchema.create(ASchema.Type.BYTES))
      case DateType =>
        LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros()
          .addToSchema(ASchema.create(ASchema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros()
          .addToSchema(ASchema.create(ASchema.Type.LONG))
      case st: StructType => toAvroRecord(st, path)
      case ArrayType(et, _) =>
        ASchema.createArray(toAvro(et, path + "_item"))
      case MapType(StringType, vt, _) =>
        ASchema.createMap(toAvro(vt, path + "_value"))
      case other =>
        throw new IllegalArgumentException(
          s"avro: unsupported Spark type $other at $path")
    }
    ASchema.createUnion(List(ASchema.create(ASchema.Type.NULL), base).asJava)
  }

  private def toAvroRecord(st: StructType, name: String): ASchema = {
    val fields = st.fields.map { f =>
      new ASchema.Field(f.name, toAvro(f.dataType, s"${name}_${f.name}"),
        null, ASchema.Field.NULL_DEFAULT_VALUE)
    }
    ASchema.createRecord(name, null, "graft.avro", false,
      fields.toList.asJava)
  }

  def avroSchemaOf(st: StructType): ASchema = toAvroRecord(st, "row")

  /** Avro schema → Spark type; unwraps [null, T] unions. */
  private def toSpark(s: ASchema): (DataType, Boolean) = s.getType match {
    case ASchema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != ASchema.Type.NULL)
      require(nonNull.size == 1,
        s"avro: only [null, T] unions supported, got $s")
      (toSpark(nonNull.head)._1, branches.size > nonNull.size)
    case ASchema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros => (TimestampType, false)
        case _: LogicalTypes.TimestampMillis => (TimestampType, false)
        case _: LogicalTypes.LocalTimestampMicros => (TimestampNTZType, false)
        case _: LogicalTypes.LocalTimestampMillis => (TimestampNTZType, false)
        case _ => (LongType, false)
      }
    case ASchema.Type.INT =>
      s.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false)
      }
    case ASchema.Type.DOUBLE => (DoubleType, false)
    case ASchema.Type.FLOAT => (FloatType, false)
    case ASchema.Type.BOOLEAN => (BooleanType, false)
    case ASchema.Type.STRING | ASchema.Type.ENUM => (StringType, false)
    case ASchema.Type.BYTES | ASchema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case ASchema.Type.RECORD =>
      (StructType(s.getFields.asScala.map { f =>
        val (dt, nullable) = toSpark(f.schema())
        StructField(f.name(), dt, nullable)
      }.toArray), false)
    case ASchema.Type.ARRAY =>
      val (et, n) = toSpark(s.getElementType)
      (ArrayType(et, n), false)
    case ASchema.Type.MAP =>
      val (vt, n) = toSpark(s.getValueType)
      (MapType(StringType, vt, n), false)
    case other =>
      throw new IllegalArgumentException(s"avro: unsupported type $other")
  }

  def sparkSchemaOf(s: ASchema): StructType =
    toSpark(s)._1.asInstanceOf[StructType]

  // ------------------------------------------------------ value mapping

  private def millisFactor(s: ASchema): Long = s.getLogicalType match {
    case _: LogicalTypes.TimestampMillis | _: LogicalTypes.LocalTimestampMillis =>
      1000L
    case _ => 1L
  }

  /** Avro datum → external Row value for `dt`. */
  private def toRowValue(v: Any, dt: DataType, as: ASchema): Any = {
    if (v == null) return null
    val actual = if (as.getType == ASchema.Type.UNION)
      as.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
    else as
    dt match {
      case StringType => v.toString
      case LongType => v.asInstanceOf[Number].longValue()
      case IntegerType => v.asInstanceOf[Number].intValue()
      case DoubleType => v.asInstanceOf[Number].doubleValue()
      case FloatType => v.asInstanceOf[Number].floatValue()
      case BooleanType => v
      case BinaryType => v match {
        case bb: java.nio.ByteBuffer =>
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case f: GenericData.Fixed => f.bytes()
        case a: Array[Byte] => a
      }
      case d: DecimalType =>
        val bytes = v match {
          case bb: java.nio.ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case f: GenericData.Fixed => f.bytes()
        }
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case DateType =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()))
      case TimestampType =>
        val micros = v.asInstanceOf[Number].longValue() * millisFactor(actual)
        java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(
          micros, java.time.temporal.ChronoUnit.MICROS))
      case TimestampNTZType =>
        val micros = v.asInstanceOf[Number].longValue() * millisFactor(actual)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        // schema evolution applies at every nesting level: a NESTED field
        // absent from a shard's writer schema reads as null, like the
        // top-level path — never an NPE mid-task
        Row.fromSeq(st.fields.map { f =>
          Option(rec.getSchema.getField(f.name)) match {
            case Some(wf) => toRowValue(rec.get(f.name), f.dataType, wf.schema())
            case None => null
          }
        })
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.Collection[Any]].asScala
          .map(toRowValue(_, et, actual.getElementType)).toSeq
      case MapType(_, vt, _) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, mv) =>
          k.toString -> toRowValue(mv, vt, actual.getValueType)
        }.toMap
      case other =>
        throw new IllegalArgumentException(s"avro: unsupported read $other")
    }
  }

  /** External Row value → Avro datum. */
  private def toAvroValue(v: Any, dt: DataType, as: ASchema): Any = {
    if (v == null) return null
    val actual = if (as.getType == ASchema.Type.UNION)
      as.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
    else as
    dt match {
      case StringType | LongType | IntegerType | DoubleType | FloatType |
          BooleanType => v
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case d: DecimalType =>
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
        java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case DateType => v match {
        case sd: java.sql.Date => sd.toLocalDate.toEpochDay.toInt
        case ld: java.time.LocalDate => ld.toEpochDay.toInt
      }
      case TimestampType =>
        val inst = v match {
          case ts: java.sql.Timestamp => ts.toInstant
          case i: java.time.Instant => i
        }
        inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      case TimestampNTZType =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      case st: StructType =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(actual)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvroValue(row.get(i), f.dataType,
            actual.getField(f.name).schema()))
        }
        rec
      case ArrayType(et, _) =>
        // Row array values may be mutable ArraySeq — match the root type
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(toAvroValue(_, et, actual.getElementType)).asJava
      case MapType(_, vt, _) =>
        v.asInstanceOf[scala.collection.Map[String, Any]].map {
          case (k, mv) => k -> toAvroValue(mv, vt, actual.getValueType)
        }.toMap.asJava
      case other =>
        throw new IllegalArgumentException(s"avro: unsupported write $other")
    }
  }

  // ------------------------------------------------------------ read

  private def listAvroFiles(
      spark: SparkSession, path: String): Seq[(String, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile)
          .filter(f => f.getPath.getName.endsWith(".avro") &&
            !f.getPath.getName.startsWith("_"))
      else Seq(st)
    require(files.nonEmpty, s"avro: no .avro files under $path")
    files.map(f => (f.getPath.toString, f.getLen)).sortBy(_._1)
  }

  /** Read an Avro container file/directory as a DataFrame. Files larger
    * than `spark.sql.files.maxPartitionBytes` split into byte ranges on
    * the container's 16-byte sync markers (`DataFileReader.sync/
    * pastSync` — the standard Hadoop input-split contract), so one fat
    * file parallelizes across the cluster instead of serializing into
    * one task. Executor-side decode; the driver touches one header. */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val files = listAvroFiles(spark, path)
    val hconf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val avroSchemaStr = {
      val in = new org.apache.avro.mapred.FsInput(
        new HPath(files.head._1), hconf.value)
      val r = new DataFileReader[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      try r.getSchema.toString finally r.close()
    }
    val schema = sparkSchemaOf(new ASchema.Parser().parse(avroSchemaStr))
    val splitBytes = math.max(1L << 20,
      spark.sessionState.conf.filesMaxPartitionBytes)
    // end is the file-bounded range end, never Long.MaxValue —
    // DataFileReader.pastSync adds SYNC_SIZE to it, which would overflow
    val splits: Seq[(String, Long, Long)] = files.flatMap { case (f, len) =>
      if (len <= splitBytes) Seq((f, 0L, len))
      else (0L until len by splitBytes).map(off =>
        (f, off, math.min(off + splitBytes, len)))
    }
    val rdd = spark.sparkContext
      .parallelize(splits, splits.size)
      .flatMap { case (f, start, end) =>
        val reader = new DataFileReader[GenericRecord](
          new org.apache.avro.mapred.FsInput(new HPath(f), hconf.value),
          new GenericDatumReader[GenericRecord]())
        // sync(start) seeks to the first block boundary at/after start;
        // pastSync(end) stops once the NEXT block starts past the range
        // — together every block lands in exactly one split
        reader.sync(start)
        // early-terminating consumers (LIMIT, take, failed downstream
        // task) must not leak the handle for the executor's lifetime —
        // drain-close alone only covers fully-consumed iterators
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try reader.close() catch { case _: Throwable => () }
          })
        new Iterator[Row] {
          private var closed = false
          override def hasNext: Boolean = {
            val h = !closed && reader.hasNext && !reader.pastSync(end)
            if (!h && !closed) { reader.close(); closed = true }
            h
          }
          override def next(): Row = {
            val rec = reader.next()
            // fields absent from a shard's writer schema read as null
            // (schema-evolution tolerance), never an NPE mid-task
            Row.fromSeq(schema.fields.map { fl =>
              Option(rec.getSchema.getField(fl.name)) match {
                case Some(f) =>
                  toRowValue(rec.get(fl.name), fl.dataType, f.schema())
                case None => null
              }
            })
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  // ------------------------------------------------------------ write

  /** Write a DataFrame as a directory of Avro container part files
    * (deflate codec) + _SUCCESS. Overwrites the target. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val target = new HPath(path)
    val fs = target.getFileSystem(conf)
    if (fs.exists(target)) fs.delete(target, true)
    fs.mkdirs(target)
    val hconf = new SerializableConfiguration(conf)
    val schema = df.schema
    val avroSchemaStr = avroSchemaOf(schema).toString
    df.rdd.foreachPartition { rows =>
      if (rows.nonEmpty) {
        val as = new ASchema.Parser().parse(avroSchemaStr)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val part = new HPath(target, f"part-$pid%05d.avro")
        val pfs = part.getFileSystem(hconf.value)
        val out = pfs.create(part, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](as))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        w.create(as, out)
        try {
          rows.foreach { row =>
            val rec = new GenericData.Record(as)
            schema.fields.zipWithIndex.foreach { case (f, i) =>
              rec.put(f.name, toAvroValue(row.get(i), f.dataType,
                as.getField(f.name).schema()))
            }
            w.append(rec)
          }
        } finally w.close()
      }
    }
    val ok = fs.create(new HPath(target, "_SUCCESS"), true)
    ok.close()
  }
}
