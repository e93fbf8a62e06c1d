package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 `TableCatalog` + `SupportsNamespaces`: the Spark-native form
  * of the reference's three-level provider chain (CatalogProviderList →
  * MemoryCatalogProvider → MemorySchemaProvider,
  * `qurious/src/execution/providers.rs:11-57`) over its `MemoryTable`
  * (`qurious/src/datasource/memory.rs:21`). Where [[graft.tables.MutableTableManager]]
  * implements that surface behind the SQL front door with view-swap, this
  * catalog plugs the SAME semantics into Spark's own resolver, so every
  * native code path works unmodified — multi-part names
  * (`gmem.ns.t`), `CREATE/DROP NAMESPACE`, `SHOW TABLES IN`, CTAS, INSERT
  * INTO/OVERWRITE, `df.writeTo(...)`, column pruning through the scan:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.gmem", classOf[GraftMemCatalog].getName)
  *   spark.sql("CREATE NAMESPACE gmem.lake")
  *   spark.sql("CREATE TABLE gmem.lake.t (id BIGINT, name STRING)")
  *   spark.sql("INSERT INTO gmem.lake.t VALUES (1, 'a')")
  * }}}
  *
  * Storage is driver-held UnsafeRow batches — deliberate parity with the
  * reference's in-memory `Vec<RecordBatch>` tables, which are session-local
  * catalog/dimension tables, not corpus data (corpus tables stay
  * parquet-backed through [[Tables]]; that is the 100 TB path). Reads ship
  * row chunks to executors as `InputPartition`s (~[[GraftMemCatalog.RowsPerPartition]]
  * rows each) so downstream operators still parallelize; writes gather
  * per-task rows through the standard `BatchWrite` commit protocol; and
  * `spark.readStream.table("gmem.ns.t")` tails the table's append log as
  * a `MicroBatchStream` (offset = log position — inserts landing while
  * the stream runs arrive as later micro-batches).
  */
class GraftMemCatalog extends TableCatalog with SupportsNamespaces {
  import GraftMemCatalog._

  private var catalogName: String = _
  private val namespaces = TrieMap[List[String], Map[String, String]](
    List("default") -> Map.empty)
  private val tables = TrieMap[(List[String], String), GraftMemTable]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName
  override def defaultNamespace(): Array[String] = Array("default")

  private def key(ident: Identifier): (List[String], String) =
    (ident.namespace.toList, ident.name)

  // ------------------------------------------------------------- tables
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    tables.keys.filter(_._1 == namespace.toList)
      .map(k => Identifier.of(k._1.toArray, k._2)).toArray.sortBy(_.name)
  }

  override def loadTable(ident: Identifier): Table =
    tables.getOrElse(key(ident), throw new NoSuchTableException(ident))

  /** `SELECT ... FROM gmem.ns.t VERSION AS OF n` — Spark's own time-travel
    * resolution calls this overload; versions are the table's commit
    * snapshots (0 = empty just-created state), same numbering as the
    * front-door manager's `VERSION AS OF`. Snapshots are zero-copy
    * (persistent Vector + immutable schema). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = tables.getOrElse(key(ident), throw new NoSuchTableException(ident))
    val v = try version.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"gmem: VERSION AS OF expects a numeric snapshot id, got '$version'")
    }
    t.snapshotAt(v)
  }

  override def loadTable(ident: Identifier, version: Long): Table =
    tables.getOrElse(key(ident), throw new NoSuchTableException(ident))
      .snapshotAt(version)

  override def tableExists(ident: Identifier): Boolean = tables.contains(key(ident))

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    require(partitions.isEmpty, "gmem tables do not support partition transforms")
    val t = new GraftMemTable(
      (ident.namespace :+ ident.name).mkString("."), schema,
      properties.asScala.toMap)
    // atomic: a concurrent CREATE of the same name must not replace (and
    // silently drop the rows of) an instance another thread just created
    if (tables.putIfAbsent(key(ident), t).isDefined)
      throw new TableAlreadyExistsException(ident)
    t
  }

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(key(ident)).isDefined

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!namespaceExists(to.namespace))
      throw new NoSuchNamespaceException(to.namespace)
    val t = tables.getOrElse(key(from), throw new NoSuchTableException(from))
    // claim the destination FIRST: a failed rename must leave the source
    // untouched (renaming the instance before the conflict check would
    // leave it registered under the old identifier with the new name())
    if (tables.putIfAbsent(key(to), t).isDefined)
      throw new TableAlreadyExistsException(to)
    t.rename((to.namespace :+ to.name).mkString("."))
    tables.remove(key(from))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = tables.getOrElse(key(ident), throw new NoSuchTableException(ident))
    changes.foreach(t.applyChange)
    t
  }

  // --------------------------------------------------------- namespaces
  override def listNamespaces(): Array[Array[String]] =
    namespaces.keys.map(_.toArray).toArray.sortBy(_.mkString("."))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespaces.contains(namespace.toList)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    namespaces.getOrElse(namespace.toList,
      throw new NoSuchNamespaceException(namespace)).asJava

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    namespaces.put(namespace.toList, metadata.asScala.toMap)
  }

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit = {
    val ns = namespace.toList
    val meta = namespaces.getOrElse(ns, throw new NoSuchNamespaceException(namespace))
    val updated = changes.foldLeft(meta) {
      case (m, set: NamespaceChange.SetProperty) => m + (set.property -> set.value)
      case (m, rm: NamespaceChange.RemoveProperty) => m - rm.property
      case (m, _) => m
    }
    namespaces.put(ns, updated)
  }

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = {
    val ns = namespace.toList
    if (ns == List("default"))
      throw new UnsupportedOperationException(
        "gmem: the built-in 'default' namespace cannot be dropped " +
          "(defaultNamespace() resolves two-part names against it)")
    if (!namespaces.contains(ns)) throw new NoSuchNamespaceException(namespace)
    val members = tables.keys.filter(_._1 == ns)
    if (members.nonEmpty && !cascade)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        namespace)
    members.foreach(tables.remove)
    namespaces.remove(ns).isDefined
  }
}

object GraftMemCatalog {
  /** Rows per shipped InputPartition: small enough to parallelize a
    * dimension table across tasks, large enough to amortize task setup. */
  val RowsPerPartition = 4096
}

/** One in-memory table: driver-held UnsafeRow store behind the full V2
  * read/write protocol (BATCH_READ/WRITE, TRUNCATE for INSERT OVERWRITE,
  * column pruning via SupportsPushDownRequiredColumns). */
class GraftMemTable(
    private var tableName: String,
    private var tableSchema: StructType,
    initialProps: Map[String, String])
  extends Table with SupportsRead with SupportsWrite {

  private var rows: Vector[InternalRow] = Vector.empty
  // append-only insert log: what a STREAMING read tails (offsets = log
  // positions, so they stay monotone even across TRUNCATE of the table
  // state — the mem-table equivalent of a CDC insert feed)
  private var log: Vector[InternalRow] = Vector.empty
  private var props: Map[String, String] = initialProps
  // commit snapshots for VERSION AS OF: entry 0 = the empty just-created
  // state; every write commit and ALTER appends one. Zero-copy — Vector is
  // persistent and StructType immutable.
  private var history: Vector[(StructType, Vector[InternalRow])] =
    Vector((tableSchema, Vector.empty))

  override def name(): String = synchronized(tableName)
  override def version(): String = synchronized((history.length - 1).toString)

  /** Read-only view of commit snapshot `v` (served to Spark's time-travel
    * `loadTable(ident, version)` path). Writes addressed to the snapshot
    * table mutate only the detached copy, never the live table. */
  private[sources] def snapshotAt(v: Long): Table = synchronized {
    require(v >= 0 && v < history.length,
      s"gmem: no version $v of $tableName (${history.length} snapshots)")
    val (sch, data) = history(v.toInt)
    val snap = new GraftMemTable(s"$tableName@v$v", sch, Map.empty)
    snap.rows = data
    snap
  }
  override def schema(): StructType = synchronized(tableSchema)
  override def properties(): util.Map[String, String] = synchronized(props.asJava)

  private[sources] def rename(newName: String): Unit =
    synchronized { tableName = newName }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  private[sources] def currentRows: Vector[InternalRow] = synchronized(rows)
  private[sources] def logSize: Long = synchronized(log.length.toLong)
  private[sources] def logSlice(from: Long, until: Long): Vector[InternalRow] =
    synchronized(log.slice(from.toInt, until.toInt))

  private[sources] def commitRows(
      appended: Seq[InternalRow], truncate: Boolean): Unit = synchronized {
    rows = (if (truncate) Vector.empty else rows) ++ appended
    log = log ++ appended
    history = history :+ ((tableSchema, rows))
  }

  /** ALTER TABLE: add (null-filled), drop, and rename top-level columns —
    * existing rows AND the streaming append log migrate eagerly (a stream
    * started after the ALTER must project old rows with the new ordinals),
    * mirroring [[graft.tables.MutableTableManager]] semantics. */
  private[sources] def applyChange(change: TableChange): Unit = synchronized {
    change match {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1, "nested columns not supported")
        val old = tableSchema
        tableSchema = tableSchema.add(add.fieldNames.head, add.dataType, add.isNullable)
        def widen(r: InternalRow) = InternalRow.fromSeq(r.toSeq(old) :+ null)
        rows = rows.map(widen)
        log = log.map(widen)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1, "nested columns not supported")
        val i = tableSchema.fieldIndex(del.fieldNames.head)
        val old = tableSchema
        tableSchema = StructType(tableSchema.fields.patch(i, Nil, 1))
        def narrow(r: InternalRow) = InternalRow.fromSeq(r.toSeq(old).patch(i, Nil, 1))
        rows = rows.map(narrow)
        log = log.map(narrow)
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames.length == 1, "nested columns not supported")
        val i = tableSchema.fieldIndex(rn.fieldNames.head)
        tableSchema = StructType(tableSchema.fields.updated(i,
          tableSchema.fields(i).copy(name = rn.newName)))
      case set: TableChange.SetProperty =>
        props = props + (set.property -> set.value)
      case rm: TableChange.RemoveProperty =>
        props = props - rm.property
      case other =>
        throw new UnsupportedOperationException(s"gmem: unsupported $other")
    }
    history = history :+ ((tableSchema, rows))
  }

  // ---------------------------------------------------------------- read
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new GraftMemScan(GraftMemTable.this, required)
    }

  // --------------------------------------------------------------- write
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              info: PhysicalWriteInfo): DataWriterFactory =
            new GraftMemWriterFactory
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val appended = messages.iterator.flatMap {
              case RowsCommit(rs) => rs
              case _ => Iterator.empty
            }.toVector
            commitRows(appended, doTruncate)
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

/** Pruned scan: batch reads snapshot the table state at `toBatch`;
  * streaming reads tail the append log as micro-batches (offset = log
  * position). The column-pruning projection binds by ordinal on the driver
  * at plan time, so executors only ever see the required columns. */
class GraftMemScan(table: GraftMemTable, requiredSchema: StructType)
  extends Scan {
  import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => SOffset}

  override def readSchema(): StructType = requiredSchema
  override def description(): String = s"GraftMemScan(${table.name()})"

  private def projection(): UnsafeProjection = {
    val full = table.schema()
    UnsafeProjection.create(requiredSchema.fields.map { f =>
      val i = full.fieldIndex(f.name)
      BoundReference(i, full(i).dataType, full(i).nullable)
    }.toSeq)
  }

  private def chunk(data: Vector[InternalRow]): Array[InputPartition] =
    if (data.isEmpty) Array(RowsPartition(Array.empty))
    else data.grouped(GraftMemCatalog.RowsPerPartition)
      .map(c => RowsPartition(c.toArray): InputPartition).toArray

  override def toBatch: Batch = {
    val proj = projection()
    val data = table.currentRows.map(r => proj(r).copy(): InternalRow)
    new Batch {
      override def planInputPartitions(): Array[InputPartition] = chunk(data)
      override def createReaderFactory(): PartitionReaderFactory =
        RowsReaderFactory
    }
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      override def initialOffset(): SOffset = CountOffset(0L)
      override def latestOffset(): SOffset = CountOffset(table.logSize)
      override def deserializeOffset(json: String): SOffset =
        CountOffset(json.trim.toLong)
      override def planInputPartitions(
          start: SOffset, end: SOffset): Array[InputPartition] = {
        val proj = projection()
        chunk(table.logSlice(
            start.asInstanceOf[CountOffset].n, end.asInstanceOf[CountOffset].n)
          .map(r => proj(r).copy(): InternalRow))
      }
      override def createReaderFactory(): PartitionReaderFactory =
        RowsReaderFactory
      override def commit(end: SOffset): Unit = ()
      override def stop(): Unit = ()
    }
}

/** Log position as a streaming offset. */
case class CountOffset(n: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

object RowsReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rs = p.asInstanceOf[RowsPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rs.length }
      override def get(): InternalRow = rs(i)
      override def close(): Unit = ()
    }
}

/** Row chunk shipped to an executor (UnsafeRows serialize). */
case class RowsPartition(rows: Array[InternalRow]) extends InputPartition

/** Per-task writer: copies incoming rows (Spark reuses the instance) and
  * returns them in the commit message for the driver-side append. */
class GraftMemWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[InternalRow]
      override def write(record: InternalRow): Unit = buf += record.copy()
      override def commit(): WriterCommitMessage = RowsCommit(buf.result().toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

case class RowsCommit(rows: Array[InternalRow]) extends WriterCommitMessage
