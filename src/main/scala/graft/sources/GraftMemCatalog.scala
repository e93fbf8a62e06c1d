package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{Column => V2Column, _}
import org.apache.spark.sql.connector.catalog.constraints.{Constraint, ForeignKey, PrimaryKey, Unique}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{StructField, StructType}
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
  *   spark.sql("CREATE TABLE gmem.lake.t (id BIGINT, name STRING DEFAULT 'n/a')")
  *   spark.sql("INSERT INTO gmem.lake.t (id) VALUES (1)")
  * }}}
  *
  * Semantic parity with the front-door stack rides Spark's own Table
  * metadata, not a parallel engine:
  *
  *   - '''Column DEFAULTs''' — `SUPPORT_COLUMN_DEFAULT_VALUE`: the table
  *     stores the analyzer's `Column[]` (default SQL + folded literal) and
  *     Spark's `ResolveDefaultColumns` fills omitted INSERT columns.
  *   - '''CHECK constraints''' — `SUPPORT_TABLE_CONSTRAINT`: declared
  *     constraints surface through `Table.constraints()` and Spark's
  *     `ResolveTableConstraints` injects `CheckInvariant` into every write
  *     plan, so CHECK enforcement runs DISTRIBUTED on the executors (the
  *     right shape at scale — rows are validated where they are produced,
  *     not gathered first).
  *   - '''PRIMARY KEY / UNIQUE''' — enforced at `BatchWrite.commit`, where
  *     the incoming batch and the stored rows meet on the driver (Spark
  *     itself treats them as informational; gmem enforces them on ingest
  *     for parity with the front-door stack). NOT NULL is re-checked there
  *     too as defense-in-depth behind Spark's write-side null checks.
  *   - '''MERGE / UPDATE / DELETE''' — `SupportsRowLevelOperations` with
  *     group-based copy-on-write: Spark rewrites the statement into a join
  *     over the scan and hands the full replacement rowset to a truncating
  *     commit. One shuffle, no per-row driver round trips — the same plan
  *     shape [[graft.tables.MutableTableManager.merge]] builds manually.
  *
  * Storage is driver-held UnsafeRow batches — deliberate parity with the
  * reference's in-memory `Vec<RecordBatch>` tables, which are session-local
  * catalog/dimension tables, not corpus data (corpus tables stay
  * parquet-backed through [[Tables]]; that is the 100 TB path). That scope
  * is ENFORCED: every commit checks the per-table row/byte caps
  * (`spark.sql.catalog.<name>.maxRowsPerTable` / `.maxBytesPerTable`) and
  * an over-cap write fails cleanly with the previous version intact, so a
  * corpus-sized `INSERT INTO gmem...` cannot OOM the driver. Reads ship
  * row chunks to executors as `InputPartition`s (~[[GraftMemCatalog.RowsPerPartition]]
  * rows each) so downstream operators still parallelize; and
  * `spark.readStream.table("gmem.ns.t")` tails the table's append log as
  * a `MicroBatchStream` (offset = log position — inserts landing while
  * the stream runs arrive as later micro-batches).
  */
class GraftMemCatalog extends TableCatalog with SupportsNamespaces {
  import GraftMemCatalog._

  private var catalogName: String = _
  private var maxRows: Long = DefaultMaxRowsPerTable
  private var maxBytes: Long = DefaultMaxBytesPerTable
  private var retainVersions: Int = DefaultRetainVersions
  private var retainLogRows: Long = DefaultRetainLogRows
  private val namespaces = TrieMap[List[String], Map[String, String]](
    List("default") -> Map.empty)
  private val tables = TrieMap[(List[String], String), GraftMemTable]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    maxRows = Option(options.get("maxRowsPerTable")).map(_.toLong)
      .getOrElse(DefaultMaxRowsPerTable)
    maxBytes = Option(options.get("maxBytesPerTable")).map(_.toLong)
      .getOrElse(DefaultMaxBytesPerTable)
    retainVersions = Option(options.get("retainVersions")).map(_.toInt)
      .getOrElse(DefaultRetainVersions)
    retainLogRows = Option(options.get("retainLogRows")).map(_.toLong)
      .getOrElse(DefaultRetainLogRows)
    require(retainVersions >= 1,
      s"spark.sql.catalog.$name.retainVersions must be >= 1")
    require(retainLogRows >= 0,
      s"spark.sql.catalog.$name.retainLogRows must be >= 0")
    // the front door's BEGIN/ROLLBACK needs the live instance (Spark's
    // CatalogManager holds it privately); last-initialized per name wins
    GraftMemCatalog.register(name, this)
  }

  /** All live tables, for the front door's EXPORT DATABASE. */
  private[graft] def listAll(): Seq[(List[String], String, GraftMemTable)] =
    tables.readOnlySnapshot().toSeq
      .map { case ((ns, n), t) => (ns, n, t) }
      .sortBy { case (ns, n, _) => (ns.mkString("."), n) }

  /** Per-table history watermarks for the front door's BEGIN. */
  private[graft] def snapshotVersions(): Map[(List[String], String), Long] =
    tables.readOnlySnapshot().toMap.map { case (k, t) => k -> t.historyLength }

  /** ROLLBACK to a BEGIN watermark: pre-existing tables mutated since are
    * restored to their watermark snapshot (append-only undo versions);
    * tables created inside the transaction are dropped. Mirrors
    * [[graft.GraftSession]]'s view-swap rollback semantics (dropped tables
    * stay dropped — both engines share that documented limitation).
    *
    * A table ABSENT from the marks is dropped only when its creation
    * postdates `beginMs`: absence alone does not prove in-tx creation — a
    * gmem catalog first CONFIGURED after BEGIN re-registers a pre-existing
    * instance whose tables the transaction never touched, and rollback
    * must not destroy those. */
  private[graft] def rollbackTo(
      marks: Map[(List[String], String), Long], beginMs: Long): Unit =
    for ((k, t) <- tables.readOnlySnapshot()) marks.get(k) match {
      case Some(h) if t.historyLength > h => t.restoreTo(h - 1)
      case Some(_) => () // untouched during the transaction
      case None if t.createdAtMs >= beginMs =>
        tables.remove(k) // created inside the transaction
      case None => () // pre-dates BEGIN: not this transaction's to undo
    }
  override def name(): String = catalogName
  override def defaultNamespace(): Array[String] = Array("default")

  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def key(ident: Identifier): (List[String], String) =
    (ident.namespace.toList, ident.name)

  private def caps: TableCaps =
    TableCaps(maxRows, maxBytes, retainVersions, retainLogRows,
      s"spark.sql.catalog.$catalogName")

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

  /** `TIMESTAMP AS OF t` — Spark routes timestamps (MICROseconds) through
    * this overload; numeric `VERSION AS OF` always arrives as the String
    * overload above. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    tables.getOrElse(key(ident), throw new NoSuchTableException(ident))
      .snapshotAtTime(Math.floorDiv(timestamp, 1000L))

  override def tableExists(ident: Identifier): Boolean = tables.contains(key(ident))

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    createV2(ident,
      schema.fields.map(f => V2Column.create(f.name, f.dataType, f.nullable)),
      partitions, properties.asScala.toMap, Array.empty)

  override def createTable(
      ident: Identifier, columns: Array[V2Column], partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    createV2(ident, columns, partitions, properties.asScala.toMap, Array.empty)

  /** The Spark 4 creation path: `TableInfo` carries columns (with DEFAULT
    * metadata) AND declared constraints. */
  override def createTable(ident: Identifier, info: TableInfo): Table =
    createV2(ident, info.columns(), info.partitions(),
      info.properties().asScala.toMap, info.constraints())

  private def createV2(
      ident: Identifier, columns: Array[V2Column], partitions: Array[Transform],
      properties: Map[String, String], constraints: Array[Constraint]): Table = {
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    require(partitions.isEmpty, "gmem tables do not support partition transforms")
    val t = new GraftMemTable(
      (ident.namespace :+ ident.name).mkString("."), columns,
      properties, constraints, caps)
    t.ownerCatalog = this // FOREIGN KEY resolution needs the sibling tables
    // atomic: a concurrent CREATE of the same name must not replace (and
    // silently drop the rows of) an instance another thread just created
    if (tables.putIfAbsent(key(ident), t).isDefined)
      throw new TableAlreadyExistsException(ident)
    t
  }

  /** FK parent resolution: identifiers in `REFERENCES` may carry the
    * catalog name as their first namespace segment — strip it, default the
    * namespace, and look the table up in this catalog. */
  private[sources] def resolveFkTable(
      ident: Identifier): Option[GraftMemTable] = {
    val ns0 = ident.namespace.toList
    val ns = ns0 match {
      case head :: rest if head.equalsIgnoreCase(catalogName) && rest.nonEmpty => rest
      case Nil => List("default")
      case other => other
    }
    tables.get((ns, ident.name))
  }

  /** All (namespace, name, table) triples — parent-side RESTRICT scans
    * these for FKs referencing the mutating table. */
  private[sources] def tableSnapshot(): Seq[(List[String], String, GraftMemTable)] =
    tables.readOnlySnapshot().toSeq.map { case ((ns, n), t) => (ns, n, t) }

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

  /** Driver-heap guards: gmem tables are session/dimension-table scoped; a
    * corpus-sized write must fail cleanly instead of OOMing the driver.
    * Override per catalog with `spark.sql.catalog.<name>.maxRowsPerTable` /
    * `.maxBytesPerTable`. */
  val DefaultMaxRowsPerTable: Long = 10L * 1000 * 1000
  val DefaultMaxBytesPerTable: Long = 1L << 30 // 1 GiB

  /** Lifetime-accumulation bounds (the caps above bound LIVE rows only): a
    * session that repeatedly truncates and reloads a dimension table at
    * cap, or a long-running streaming sink, would otherwise accumulate
    * every commit snapshot and every log row ever written on the driver.
    * Retention compacts both, Kafka-style: `VERSION AS OF` below the
    * oldest retained snapshot and stream restarts from a compacted offset
    * fail with a clean error naming the conf. Override per catalog with
    * `spark.sql.catalog.<name>.retainVersions` / `.retainLogRows`. */
  val DefaultRetainVersions: Int = 64
  val DefaultRetainLogRows: Long = 1L * 1000 * 1000

  /** Per-table write limits + retention + the conf prefix for cap errors. */
  final case class TableCaps(
      maxRows: Long, maxBytes: Long, retainVersions: Int, retainLogRows: Long,
      confPrefix: String)

  /** Caps for detached snapshot copies — never written to. */
  private[sources] val SnapshotCaps =
    TableCaps(Long.MaxValue, Long.MaxValue, Int.MaxValue, Long.MaxValue, "")

  /** Live catalog instances by name (Spark's CatalogManager holds the
    * plugin privately; the front door's transaction surface reaches it
    * here). One instance per name per JVM in practice — last wins. */
  private val instances = TrieMap.empty[String, GraftMemCatalog]
  private def register(name: String, c: GraftMemCatalog): Unit =
    instances.update(name, c)
  private[graft] def instance(name: String): Option[GraftMemCatalog] =
    instances.get(name)

  /** Name of the single copy-on-write group-id metadata column. */
  val GroupIdColumnName = "_grp"

  /** See [[GraftMemTable.metadataColumns]]. */
  object GroupIdColumn extends MetadataColumn {
    override def name(): String = GroupIdColumnName
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.IntegerType
    override def isNullable: Boolean = false
    override def comment(): String =
      "copy-on-write group id (gmem tables are one group)"
  }
}

/** One in-memory table: driver-held UnsafeRow store behind the full V2
  * read/write protocol (BATCH_READ/WRITE, TRUNCATE for INSERT OVERWRITE,
  * column pruning via SupportsPushDownRequiredColumns, row-level MERGE/
  * UPDATE/DELETE via SupportsRowLevelOperations). The canonical column
  * state is Spark's own `Column[]` (DEFAULT metadata included), so the
  * analyzer — not this class — resolves defaults and constraint checks. */
class GraftMemTable(
    private var tableName: String,
    initialCols: Array[V2Column],
    initialProps: Map[String, String],
    initialConstraints: Array[Constraint],
    caps: GraftMemCatalog.TableCaps)
  extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations
  with SupportsMetadataColumns {

  /** The copy-on-write "group id" metadata column. Spark's group-based
    * row-level path only routes rows through its data/metadata projections
    * (`DataAndMetadataWritingSparkTask` — the task that strips the internal
    * `__row_operation` column before the connector's writer sees rows) when
    * the operation requires a metadata attribute, so the table exposes one:
    * a constant 0, because the whole driver-held table is a single rewrite
    * group (a parquet-backed engine would surface file/partition ids here
    * and replace only affected groups). */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(GraftMemCatalog.GroupIdColumn)

  /** Wall-clock of this instance's construction — the transaction surface's
    * creation-attribution record: ROLLBACK drops a table absent from the
    * BEGIN snapshot only when it was created AFTER BEGIN (a catalog
    * configured mid-transaction over a pre-existing instance registry must
    * not have its older tables destroyed by a rollback that never touched
    * them). */
  private[sources] val createdAtMs: Long = System.currentTimeMillis()

  private var cols: Array[V2Column] = initialCols
  private var tableSchema: StructType = toStruct(initialCols)
  private var cons: Array[Constraint] = initialConstraints
  private var rows: Vector[InternalRow] = Vector.empty
  private var storedBytes: Long = 0L
  // append-only insert log: what a STREAMING read tails (offsets = log
  // positions, so they stay monotone even across TRUNCATE of the table
  // state — the mem-table equivalent of a CDC insert feed). `logBase` is
  // the absolute offset of log(0): retention drops the oldest entries and
  // advances the base, so offsets stay monotone and a compacted-away slice
  // fails cleanly instead of silently serving the wrong rows (it also
  // removes the old `.toInt` wrap past 2^31 absolute offsets — slicing is
  // relative to the base and the retained vector is capped).
  private var log: Vector[InternalRow] = Vector.empty
  private var logBase: Long = 0L
  private var props: Map[String, String] = initialProps
  // commit snapshots for VERSION AS OF: entry 0 = the empty just-created
  // state; every write commit and ALTER appends one. Zero-copy — Vector is
  // persistent and the column array immutable. `historyBase` is the
  // absolute version of history(0); retention keeps the newest
  // `retainVersions` snapshots so lifetime accumulation is bounded.
  private var history: Vector[(Array[V2Column], Array[Constraint], Vector[InternalRow])] =
    Vector((initialCols, initialConstraints, Vector.empty))
  private var historyBase: Long = 0L
  // wall-clock commit time of each retained snapshot (parallel to
  // `history`) — the resolution target of TIMESTAMP AS OF
  private var historyTimes: Vector[Long] =
    Vector(System.currentTimeMillis())

  /** Append the current state as a new commit snapshot (always paired
    * with its wall-clock stamp so `historyTimes` can never skew). */
  private def recordSnapshot(): Unit = {
    history = history :+ ((cols, cons, rows))
    historyTimes = historyTimes :+ System.currentTimeMillis()
  }
  // last committed epoch per streaming query id: epoch replays after a
  // checkpoint restart re-deliver the same rows; skipping already-committed
  // epochs makes the sink exactly-once AND keeps replays from tripping
  // PRIMARY KEY/UNIQUE duplicate checks on rows the table already holds
  private val epochCommits = scala.collection.mutable.Map.empty[String, Long]
  // the owning catalog (set at createTable) — FOREIGN KEY checks resolve
  // parent/child tables through it; detached snapshots leave it null
  @volatile private[sources] var ownerCatalog: GraftMemCatalog = null

  private def toStruct(cs: Array[V2Column]): StructType =
    StructType(cs.map(c => StructField(c.name, c.dataType, c.nullable)))

  override def name(): String = synchronized(tableName)
  override def version(): String =
    synchronized((historyBase + history.length - 1).toString)

  /** Read-only view of commit snapshot `v` (served to Spark's time-travel
    * `loadTable(ident, version)` path). Writes addressed to the snapshot
    * table mutate only the detached copy, never the live table. Versions
    * below the retention horizon were compacted — clean error. */
  private[sources] def snapshotAt(v: Long): Table = synchronized {
    require(v >= 0 && v < historyBase + history.length,
      s"gmem: no version $v of $tableName (${historyBase + history.length} commits)")
    require(v >= historyBase,
      s"gmem: version $v of $tableName was compacted by retention " +
        s"(oldest retained: $historyBase; raise ${caps.confPrefix}.retainVersions " +
        "to keep more snapshots)")
    val (cs, cns, data) = history((v - historyBase).toInt)
    val snap = new GraftMemTable(s"$tableName@v$v", cs, Map.empty,
      cns, GraftMemCatalog.SnapshotCaps)
    snap.rows = data
    snap
  }

  /** `TIMESTAMP AS OF` resolution: the newest RETAINED snapshot committed
    * at or before `ms` wall-clock milliseconds. */
  private[sources] def snapshotAtTime(ms: Long): Table = synchronized {
    val idx = historyTimes.lastIndexWhere(_ <= ms)
    require(idx >= 0,
      s"gmem: no retained version of $tableName committed at or before " +
        s"timestamp $ms ms (oldest retained: ${historyTimes.head} ms; " +
        s"raise ${caps.confPrefix}.retainVersions to keep more snapshots)")
    snapshotAt(historyBase + idx)
  }
  override def schema(): StructType = synchronized(tableSchema)
  override def columns(): Array[V2Column] = synchronized(cols)
  override def constraints(): Array[Constraint] = synchronized(cons)
  override def properties(): util.Map[String, String] = synchronized(props.asJava)

  private[sources] def rename(newName: String): Unit =
    synchronized { tableName = newName }

  private[graft] def historyLength: Long =
    synchronized(historyBase + history.length)
  /** Retained (post-compaction) counts — what actually sits on the driver. */
  private[graft] def retainedHistoryCount: Int = synchronized(history.length)
  /** Wall-clock commit times of the retained snapshots (oldest first). */
  private[graft] def retainedHistoryTimes: Vector[Long] =
    synchronized(historyTimes)
  private[graft] def retainedLogCount: Int = synchronized(log.length)

  /** Restore to commit snapshot `v` — columns, constraints and rows roll
    * back together, recorded as a NEW history entry so the log stays
    * append-only (undo is a version, Delta-style — the same discipline as
    * [[graft.tables.MutableTableManager.restore]]). A `v` below the
    * retention horizon fails cleanly (transactions are short-lived; the
    * default horizon far outlasts any BEGIN..ROLLBACK window). */
  private[graft] def restoreTo(v: Long): Unit = synchronized {
    require(v >= 0 && v < historyBase + history.length,
      s"gmem: no version $v of $tableName (${historyBase + history.length} commits)")
    require(v >= historyBase,
      s"gmem: version $v of $tableName was compacted by retention " +
        s"(oldest retained: $historyBase; raise ${caps.confPrefix}.retainVersions)")
    val (cs, cns, data) = history((v - historyBase).toInt)
    cols = cs
    tableSchema = toStruct(cs)
    cons = cns
    rows = data
    storedBytes = data.iterator.map(rowBytes).sum
    recordSnapshot()
    compactRetention()
  }

  /** Drop history/log beyond the retention horizons. Runs inside every
    * state-advancing commit, so lifetime driver-heap use is structurally
    * bounded: live rows (row/byte caps) + `retainLogRows` log entries +
    * `retainVersions` snapshots (zero-copy persistent vectors — dropped
    * snapshots free whatever structure the retained ones don't share). */
  private def compactRetention(): Unit = {
    if (history.length > caps.retainVersions) {
      val drop = history.length - caps.retainVersions
      history = history.drop(drop)
      historyTimes = historyTimes.drop(drop)
      historyBase += drop
    }
    if (log.length > caps.retainLogRows) {
      val drop = (log.length - caps.retainLogRows).toInt
      log = log.drop(drop)
      logBase += drop
    }
  }

  /** Explicit compaction (the front door's VACUUM): keep the newest
    * `retain` snapshots and drop the whole streaming log (a stream started
    * after the vacuum begins at the new base; one holding an older
    * checkpointed offset fails cleanly on its next slice). */
  private[graft] def vacuum(retain: Int = 1): Unit = synchronized {
    require(retain >= 1, "gmem: VACUUM must retain at least 1 version")
    if (history.length > retain) {
      val drop = history.length - retain
      history = history.drop(drop)
      historyTimes = historyTimes.drop(drop)
      historyBase += drop
    }
    logBase += log.length
    log = Vector.empty
  }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE,
      // MERGE ... WITH SCHEMA EVOLUTION: source-only columns become
      // ADD COLUMNs (Spark drives it through alterTable)
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  private[sources] def currentRows: Vector[InternalRow] = synchronized(rows)
  private[sources] def logSize: Long = synchronized(logBase + log.length)
  private[sources] def logStart: Long = synchronized(logBase)
  private[sources] def logSlice(from: Long, until: Long): Vector[InternalRow] =
    synchronized {
      require(from >= logBase,
        s"gmem: streaming offset $from of $tableName was compacted by " +
          s"retention (oldest retained: $logBase). Restart the stream from a " +
          s"fresh checkpoint, or raise ${caps.confPrefix}.retainLogRows.")
      log.slice((from - logBase).toInt, (until - logBase).toInt)
    }

  private def rowBytes(r: InternalRow): Long = r match {
    case u: UnsafeRow => u.getSizeInBytes.toLong
    case other => 16L * other.numFields // rough estimate for non-unsafe rows
  }

  /** The one mutation point for data: cap guard + UNIQUE/PK + NOT NULL run
    * BEFORE any state advances, so a failed write leaves the previous
    * version fully intact (no history entry, no log rows, no row change). */
  private[sources] def commitRows(
      appended: Seq[InternalRow], truncate: Boolean): Unit = synchronized {
    val baseRows = if (truncate) 0L else rows.length.toLong
    val baseBytes = if (truncate) 0L else storedBytes
    val addBytes = appended.iterator.map(rowBytes).sum
    if (baseRows + appended.length > caps.maxRows)
      throw new IllegalStateException(
        s"gmem: write to $tableName rejected — table would hold " +
          s"${baseRows + appended.length} rows, over ${caps.confPrefix}.maxRowsPerTable=" +
          s"${caps.maxRows}. gmem tables are driver-held and scoped to session/" +
          "dimension data; store corpus-scale data in parquet-backed tables.")
    if (baseBytes + addBytes > caps.maxBytes)
      throw new IllegalStateException(
        s"gmem: write to $tableName rejected — table would hold " +
          s"${baseBytes + addBytes} bytes, over ${caps.confPrefix}.maxBytesPerTable=" +
          s"${caps.maxBytes}. gmem tables are driver-held and scoped to session/" +
          "dimension data; store corpus-scale data in parquet-backed tables.")
    enforceOnCommit(appended, truncate)
    // a truncating commit (INSERT OVERWRITE / row-level DELETE/UPDATE/
    // MERGE) may REMOVE referenced keys — RESTRICT if any child still
    // points at them (pure appends cannot orphan anyone)
    if (truncate) enforceFkRestrict(appended.toVector)
    rows = (if (truncate) Vector.empty else rows) ++ appended
    storedBytes = baseBytes + addBytes
    log = log ++ appended
    recordSnapshot()
    compactRetention()
  }

  /** Key tuples of `data` under `keyCols` (schema-ordinal extraction);
    * rows with any NULL key column are skipped (SQL MATCH SIMPLE). */
  private def keyTuples(
      data: Iterable[InternalRow], schema: StructType,
      keyCols: Seq[String]): (Iterator[Option[Seq[Any]]]) = {
    val ords = keyCols.map { c =>
      val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
      require(i >= 0, s"gmem: FOREIGN KEY references unknown column $c")
      i
    }
    data.iterator.map { r =>
      if (ords.exists(r.isNullAt)) None
      else Some(ords.map(i => r.get(i, schema.fields(i).dataType)))
    }
  }

  /** Child-side FOREIGN KEY check: every non-null FK tuple in `appended`
    * must exist in the parent's current rows (for a self-referencing FK,
    * the candidate post-commit state of THIS table). */
  private def enforceFkChild(
      appended: Seq[InternalRow], truncate: Boolean): Unit = {
    val fks = cons.toSeq.collect { case fk: ForeignKey => fk }
    if (fks.isEmpty || appended.isEmpty) return
    val cat = ownerCatalog
    for (fk <- fks) {
      val childCols = fk.columns().map(_.fieldNames().mkString(".")).toSeq
      val parentCols =
        fk.referencedColumns().map(_.fieldNames().mkString(".")).toSeq
      val selfRef = cat == null ||
        cat.resolveFkTable(fk.referencedTable()).exists(_ eq this)
      val (pRows, pSchema): (Iterable[InternalRow], StructType) =
        if (selfRef)
          ((if (truncate) Vector.empty else rows) ++ appended, tableSchema)
        else {
          val p = cat.resolveFkTable(fk.referencedTable()).getOrElse(
            throw new IllegalStateException(
              s"gmem: FOREIGN KEY ${fk.name()} on $tableName references " +
                s"missing table ${fk.referencedTable()}"))
          (p.currentRows, p.schema())
        }
      val parentKeys =
        keyTuples(pRows, pSchema, parentCols).flatten.toSet
      for (k <- keyTuples(appended, tableSchema, childCols); kk <- k)
        if (!parentKeys.contains(kk))
          throw new IllegalStateException(
            s"gmem: FOREIGN KEY ${fk.name()} violated on $tableName: " +
              s"(${childCols.mkString(", ")}) value not present in " +
              s"${fk.referencedTable()}(${parentCols.mkString(", ")})")
    }
  }

  /** Parent-side RESTRICT: with this table's rows about to become
    * `newState`, every OTHER table's FK rows pointing here must still
    * resolve — a DELETE/TRUNCATE/UPDATE that would orphan a child fails. */
  private def enforceFkRestrict(newState: Vector[InternalRow]): Unit = {
    val cat = ownerCatalog
    if (cat == null) return
    lazy val newKeysBy =
      scala.collection.mutable.Map.empty[Seq[String], Set[Seq[Any]]]
    for {
      (_, _, child) <- cat.tableSnapshot() if !(child eq this)
      fk <- child.constraints().toSeq.collect { case f: ForeignKey => f }
      if cat.resolveFkTable(fk.referencedTable()).exists(_ eq this)
    } {
      val parentCols =
        fk.referencedColumns().map(_.fieldNames().mkString(".")).toSeq
      val childCols = fk.columns().map(_.fieldNames().mkString(".")).toSeq
      val keys = newKeysBy.getOrElseUpdate(parentCols,
        keyTuples(newState, tableSchema, parentCols).flatten.toSet)
      for (k <- keyTuples(child.currentRows, child.schema(), childCols);
           kk <- k)
        if (!keys.contains(kk))
          throw new IllegalStateException(
            s"gmem: FOREIGN KEY ${fk.name()} on ${child.name()} RESTRICTs " +
              s"this write to $tableName: child rows still reference " +
              s"removed keys (${parentCols.mkString(", ")})")
    }
  }

  /** Streaming-epoch commit: skip epochs at or below the last committed one
    * for this query id (stable across checkpoint restarts), so post-restart
    * replays neither duplicate rows nor trip PK/UNIQUE duplicate checks. */
  private[sources] def commitEpoch(
      queryId: String, epochId: Long, appended: Seq[InternalRow]): Unit =
    synchronized {
      if (!epochCommits.get(queryId).exists(_ >= epochId)) {
        commitRows(appended, truncate = false)
        epochCommits(queryId) = epochId
      }
    }

  /** Commit-side enforcement, where the incoming batch and the stored rows
    * meet: PRIMARY KEY / UNIQUE key-collision checks (within the batch and
    * against existing rows; NULL-containing keys never collide, SQL UNIQUE
    * semantics) and a NOT NULL re-check as defense-in-depth behind Spark's
    * write-side null handling. CHECK constraints are NOT evaluated here —
    * Spark's `ResolveTableConstraints` already ran them distributed inside
    * the write plan (`CheckInvariant`). Cost is O(existing + batch) per
    * declared key over driver-held rows already bounded by the caps. */
  private def enforceOnCommit(appended: Seq[InternalRow], truncate: Boolean): Unit = {
    val schema = tableSchema
    val notNullOrds = schema.fields.zipWithIndex
      .collect { case (f, i) if !f.nullable => i }
    for (r <- appended; i <- notNullOrds if r.isNullAt(i))
      throw new IllegalStateException(
        s"gmem: NOT NULL constraint violated on $tableName: " +
          s"column ${schema.fields(i).name}")
    val keySets: Seq[(String, Array[String], Boolean)] = cons.toSeq.collect {
      case u: Unique =>
        (u.name(), u.columns().map(_.fieldNames().mkString(".")), false)
      case p: PrimaryKey =>
        (p.name(), p.columns().map(_.fieldNames().mkString(".")), true)
    }
    for ((cname, keyCols, isPk) <- keySets) {
      val ords = keyCols.map { c =>
        val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
        require(i >= 0, s"gmem: constraint $cname references unknown column $c")
        i
      }
      // PRIMARY KEY implies NOT NULL (the front-door engine maps PK =>
      // NOT NULL + UNIQUE); a NULL key value must be rejected, not given
      // the UNIQUE null-skip pass that would admit duplicate NULL-keyed rows
      if (isPk)
        for (r <- appended; i <- ords if r.isNullAt(i))
          throw new IllegalStateException(
            s"gmem: PRIMARY KEY${if (cname.nonEmpty) s" $cname" else ""} on " +
              s"$tableName rejects NULL in key column ${schema.fields(i).name}")
      def keyOf(r: InternalRow): Option[Seq[Any]] = {
        if (ords.exists(r.isNullAt)) None
        else Some(ords.toIndexedSeq.map(i => r.get(i, schema.fields(i).dataType)))
      }
      val seen = scala.collection.mutable.HashSet.empty[Seq[Any]]
      if (!truncate) rows.foreach(r => keyOf(r).foreach(seen += _))
      for (r <- appended; k <- keyOf(r))
        if (!seen.add(k))
          throw new IllegalStateException(
            s"gmem: ${if (cname.nonEmpty) cname else "UNIQUE"} constraint " +
              s"violated on $tableName: duplicate key (${keyCols.mkString(", ")})")
    }
    enforceFkChild(appended, truncate)
  }

  /** ALTER TABLE: add (default- or null-backfilled), drop, and rename
    * top-level columns — existing rows AND the streaming append log migrate
    * eagerly (a stream started after the ALTER must project old rows with
    * the new ordinals), mirroring [[graft.tables.MutableTableManager]]
    * semantics — plus ADD/DROP CONSTRAINT. */
  private[sources] def applyChange(change: TableChange): Unit = synchronized {
    change match {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1, "nested columns not supported")
        val old = tableSchema
        cols = cols :+ V2Column.create(add.fieldNames.head, add.dataType,
          add.isNullable, add.comment(), add.defaultValue(), null)
        tableSchema = toStruct(cols)
        // existing rows backfill with the default's folded literal (Spark
        // ships it pre-evaluated in catalyst-internal form), like the
        // front-door stack's ADD COLUMN ... DEFAULT backfill
        val fill: Any = Option(add.defaultValue())
          .flatMap(d => Option(d.getValue)).map(_.value()).orNull
        def widen(r: InternalRow) = InternalRow.fromSeq(r.toSeq(old) :+ fill)
        rows = rows.map(widen)
        log = log.map(widen)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1, "nested columns not supported")
        val i = tableSchema.fieldIndex(del.fieldNames.head)
        val old = tableSchema
        cols = cols.patch(i, Nil, 1)
        tableSchema = toStruct(cols)
        def narrow(r: InternalRow) = InternalRow.fromSeq(r.toSeq(old).patch(i, Nil, 1))
        rows = rows.map(narrow)
        log = log.map(narrow)
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames.length == 1, "nested columns not supported")
        val i = tableSchema.fieldIndex(rn.fieldNames.head)
        val c = cols(i)
        cols = cols.updated(i, V2Column.create(rn.newName, c.dataType,
          c.nullable, c.comment(), c.defaultValue(), c.metadataInJSON()))
        tableSchema = toStruct(cols)
      case ac: TableChange.AddConstraint =>
        require(!cons.exists(_.name() == ac.constraint().name()),
          s"gmem: constraint ${ac.constraint().name()} already exists on $tableName")
        cons = cons :+ ac.constraint()
        // an FK added after the fact must hold for the EXISTING rows
        ac.constraint() match {
          case _: ForeignKey =>
            try enforceFkChild(rows, truncate = true)
            catch { case e: Throwable => cons = cons.dropRight(1); throw e }
          case _ => ()
        }
      case dc: TableChange.DropConstraint =>
        val before = cons.length
        cons = cons.filterNot(_.name() == dc.name())
        if (cons.length == before && !dc.ifExists())
          throw new IllegalArgumentException(
            s"gmem: no constraint ${dc.name()} on $tableName")
      case set: TableChange.SetProperty =>
        props = props + (set.property -> set.value)
      case rm: TableChange.RemoveProperty =>
        props = props - rm.property
      case other =>
        throw new UnsupportedOperationException(s"gmem: unsupported $other")
    }
    // column-shape changes rewrote rows into a different representation
    // (GenericInternalRow) with a different rowBytes estimator — recompute
    // so the byte-cap accounting doesn't drift until the next truncate
    storedBytes = rows.iterator.map(rowBytes).sum
    recordSnapshot()
    compactRetention()
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
              pwi: PhysicalWriteInfo): DataWriterFactory =
            new GraftMemWriterFactory(info.schema(), schema())
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val appended = messages.iterator.flatMap {
              case RowsCommit(rs) => rs
              case _ => Iterator.empty
            }.toVector
            commitRows(appended, doTruncate)
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }

        /** `df.writeStream.toTable("gmem.ns.t")`: each micro-batch epoch
          * appends through the same cap/constraint-guarded commit as a
          * batch INSERT. Commits are idempotent by (query id, epoch id):
          * replays after a checkpoint restart are skipped, so the sink is
          * exactly-once and safe for key-constrained tables. */
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
            override def createStreamingWriterFactory(
                pwi: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
              new GraftMemStreamingWriterFactory(info.schema(), schema())
            override def commit(
                epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
              val appended = messages.iterator.flatMap {
                case RowsCommit(rs) => rs
                case _ => Iterator.empty
              }.toVector
              commitEpoch(info.queryId(), epochId, appended)
            }
            override def abort(
                epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
          }
      }
    }

  /** Row-level MERGE / UPDATE / DELETE, group-based copy-on-write with ONE
    * group (the whole table): Spark rewrites the statement into a join over
    * this operation's scan and writes the full replacement rowset; commit
    * swaps the table contents atomically (truncate + append — the same
    * "derive the new state, swap" shape as the front-door view-swap). The
    * replacement rows land in the streaming append log like an INSERT
    * OVERWRITE would. Fine for driver-held dimension tables (the caps
    * bound the rewrite); a parquet-backed engine would replace only the
    * affected files via runtime group filtering instead. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()
        override def description(): String =
          s"GraftMemRowLevel(${info.command()}, $tableName)"
        override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
          GraftMemTable.this.newScanBuilder(options)
        // requiring the group-id metadata column routes the rewrite through
        // Spark's data/metadata projections (see metadataColumns())
        override def requiredMetadataAttributes()
            : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .column(GraftMemCatalog.GroupIdColumnName))
        override def newWriteBuilder(lwi: LogicalWriteInfo): WriteBuilder =
          new WriteBuilder {
            override def build(): Write = new Write {
              override def toBatch: BatchWrite = new BatchWrite {
                override def createBatchWriterFactory(
                    pwi: PhysicalWriteInfo): DataWriterFactory =
                  new GraftMemWriterFactory(lwi.schema(), schema())
                override def commit(messages: Array[WriterCommitMessage]): Unit = {
                  val replacement = messages.iterator.flatMap {
                    case RowsCommit(rs) => rs
                    case _ => Iterator.empty
                  }.toVector
                  commitRows(replacement, truncate = true)
                }
                override def abort(messages: Array[WriterCommitMessage]): Unit = ()
              }
            }
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
      if (f.name == GraftMemCatalog.GroupIdColumnName)
        // synthetic metadata column: the whole table is one rewrite group
        org.apache.spark.sql.catalyst.expressions.Literal(0)
          : org.apache.spark.sql.catalyst.expressions.Expression
      else {
        val i = full.fieldIndex(f.name)
        BoundReference(i, full(i).dataType, full(i).nullable)
      }
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
      // a fresh stream begins at the oldest RETAINED log entry (Kafka
      // "earliest available" semantics — entries before it were compacted)
      override def initialOffset(): SOffset = CountOffset(table.logStart)
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

/** Per-task writer: normalizes each incoming row into the TABLE schema's
  * UnsafeRow layout (by-name bind from the write's data schema — row-level
  * rewrites can hand rows whose physical layout differs from the stored
  * one) and returns the copies in the commit message for the driver-side
  * append. The projection is generated executor-side in `createWriter`. */
class GraftMemWriterFactory(writeSchema: StructType, tableSchema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val proj = UnsafeProjection.create(tableSchema.fields.map { f =>
        val i = writeSchema.fieldIndex(f.name)
        BoundReference(i, writeSchema(i).dataType, writeSchema(i).nullable)
      }.toSeq)
      private val buf = Vector.newBuilder[InternalRow]
      override def write(record: InternalRow): Unit = buf += proj(record).copy()
      // carried-over rows in a copy-on-write rewrite arrive with their
      // metadata row; the group id doesn't change what gets stored
      override def write(metadata: InternalRow, record: InternalRow): Unit =
        write(record)
      override def commit(): WriterCommitMessage = RowsCommit(buf.result().toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

case class RowsCommit(rows: Array[InternalRow]) extends WriterCommitMessage

/** Streaming form of [[GraftMemWriterFactory]]: same normalize-and-copy
  * writer per (partition, task, epoch). */
class GraftMemStreamingWriterFactory(writeSchema: StructType, tableSchema: StructType)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  private val batchFactory = new GraftMemWriterFactory(writeSchema, tableSchema)
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    batchFactory.createWriter(partitionId, taskId)
}
