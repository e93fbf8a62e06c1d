package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal => CatalystLiteral, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => SOffset}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The `.changes` METADATA TABLE over a gdisk table — the Iceberg-style
  * resolution (`SELECT * FROM gdisk.ns.t.changes`) of the CDC feed, and
  * the STREAMING half of the CDC stack: `spark.readStream.table(
  * "gdisk.ns.t.changes")` tails the commit log and serves every change
  * row exactly once per micro-batch window, so downstream incremental
  * consumers (MV maintenance, replication, audit) subscribe continuously
  * instead of polling `table_changes(...)` windows themselves.
  *
  * Schema: the base table's CURRENT columns plus `_change_type`
  * (`insert` / `delete`) and `_commit_version`. A COW UPDATE surfaces as
  * the touched groups' full pre-image deletes + post-image inserts;
  * reorganizations (OPTIMIZE, RENAME rewrites) are CDC-silent — the same
  * contract as the batch `table_changes` TVF, proven by the shared
  * [[GraftDiskTable.changeGroups]] diff. Each version's files are read
  * with THAT version's manifest (physical column mapping, hive layout);
  * columns a version did not yet have read as NULL.
  *
  * Offsets are manifest versions ([[CountOffset]]), so restart recovery
  * is exact: a checkpointed stream resumes at the next unserved version
  * — no change row is lost or repeated across a stop/restart. Options:
  * `startingVersion` (serve from that commit; default = the full
  * retained history), `endingVersion` (batch reads only).
  *
  * At 100 TB: each micro-batch plans inner vectorized parquet scans over
  * ONLY the files the window's commits touched — the driver handles file
  * names, executors read columnar, and per-epoch cost scales with the
  * delta, never the table.
  *
  * Reference scope note: qurious has no change-data-capture surface; this
  * is part of the Spark-native lakehouse tier (Delta CDF / Iceberg
  * changelog parity). */
class GraftDiskChangesTable(private[sources] val inner: GraftDiskTable)
  extends Table with SupportsRead {

  override def name(): String = s"${inner.name()}.changes"

  override def schema(): StructType =
    GraftDiskChangesTable.changeSchema(inner.liveSchema)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema()
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan =
        new GraftDiskChangesScan(inner, required, options)
    }
}

object GraftDiskChangesTable {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  def changeSchema(base: StructType): StructType =
    base.add(ChangeTypeCol, StringType, nullable = false)
      .add(CommitVersionCol, LongType, nullable = false)
}

/** Batch + micro-batch scan over the change feed. Batch serves
  * `[startingVersion, endingVersion]` (defaults: full retained history →
  * latest); the micro-batch stream uses manifest versions as offsets and
  * serves each version's change groups exactly once. */
class GraftDiskChangesScan(
    table: GraftDiskTable, required: StructType,
    options: CaseInsensitiveStringMap)
  extends Scan with Batch {

  private def firstOffset: Long = {
    val fromOpt = Option(options.get("startingVersion")).map(_.trim.toLong)
    // offset semantics: "served THROUGH version n" — start one before.
    // Serving version v diffs against v-1's manifest, so the start can
    // never sit below the VACUUM horizon. The DEFAULT is the oldest
    // retained version (serve (head, latest], matching the streaming
    // source's initialOffset = head — head's own predecessor is gone).
    // An EXPLICIT startingVersion that asks for vacuumed-away history is
    // an ERROR, not a silent clamp: a CDC consumer asking for [v, latest]
    // must not receive [head+1, latest] with no signal that change rows
    // it requested were skipped (it may need to fall back to a full
    // re-sync). Opt back into the clamp with allowOutOfRangeStart=true.
    val head = table.log.versions().headOption.getOrElse(0L)
    fromOpt match {
      case None => head
      case Some(v) if v - 1 >= head => v - 1
      case Some(_) if head == 0L =>
        // nothing was ever VACUUMed: startingVersion <= 0 skips only
        // version 0's creation "diff", which has no servable form (a
        // creation has no predecessor manifest to diff against) — the
        // feed starts at version 1 by construction, no history is lost
        head
      case Some(v) =>
        if (options.getBoolean("allowOutOfRangeStart", false)) head
        else throw new IllegalArgumentException(
          s"startingVersion $v predates the earliest retained version " +
            s"$head of ${table.name()} (earlier changes were removed by " +
            s"VACUUM; the earliest servable change version is ${head + 1}). " +
            "Re-sync from a snapshot, or pass allowOutOfRangeStart=true " +
            "to clamp to the retained history.")
    }
  }

  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftDiskChangesScan(${table.name()})"
  override def toBatch: Batch = this

  private def partitionsFor(fromExcl: Long, toIncl: Long)
      : Array[InputPartition] =
    table.changeGroups(fromExcl, toIncl).toArray.flatMap { g =>
      val m = g.m
      // prune the inner scan to the requested DATA columns this
      // version has, translated to its physical names; the reader
      // binds by the scan's ACTUAL output schema (hive partition
      // columns append after data columns), re-labeled to logical.
      // Resolution is case-INSENSITIVE like the rest of the engine —
      // and uses the version's own field (name spelling + type), so
      // the physical-name mapping and the inner scan stay consistent
      val want = StructType(required.fields.flatMap(f =>
        if (f.name == GraftDiskChangesTable.ChangeTypeCol ||
            f.name == GraftDiskChangesTable.CommitVersionCol) None
        else m.schema.fields.find(_.name.equalsIgnoreCase(f.name))))
      val dvMode = g.dvBytes.nonEmpty
      val sb = table.innerTableFor(m, g.files, rowIndex = dvMode)
        .newScanBuilder(CaseInsensitiveStringMap.empty())
      sb.pruneColumns(
        if (dvMode) StructType(m.toPhysical(want).fields :+
          graft.sources.GraftDiskCatalog.RowIndexField)
        else m.toPhysical(want))
      val scan = sb.build()
      val b = scan.toBatch
      val factory = b.createReaderFactory()
      val innerLogical = StructType(scan.readSchema().fields.map(f =>
        f.copy(name = m.logicalOf(f.name))))
      if (!dvMode)
        b.planInputPartitions().map(p =>
          ChangeTagPartition(p, factory, g.ctype, g.version, innerLogical)
            : InputPartition)
      else {
        // deletion-vector-modulated group: regroup ONE PARTITION PER
        // FILE so each reader knows which bitmap applies, filter by the
        // parquet row index the inner scan was asked to generate
        import org.apache.spark.sql.execution.datasources.FilePartition
        val ddPath = table.log.dataDir.toUri.getPath
        b.planInputPartitions().flatMap {
          case fp: FilePartition => fp.files
          case other => sys.error(
            s"gdisk: unexpected non-file partition ${other.getClass}")
        }.groupBy(_.filePath.toUri.getPath).toArray.zipWithIndex.map {
          case ((path, pfs), i) =>
            val rel = path.stripPrefix(ddPath).stripPrefix("/")
            ChangeTagPartition(FilePartition(i, pfs), factory, g.ctype,
              g.version, innerLogical, g.dvBytes.get(rel), g.keepOnly)
              : InputPartition
        }
      }
    }

  // ------------------------------------------------------------- batch
  override def planInputPartitions(): Array[InputPartition] = {
    val to = Option(options.get("endingVersion")).map(_.trim.toLong)
      .getOrElse(table.log.latestVersion())
    partitionsFor(firstOffset, to)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeAppendingReaderFactory(required)

  // --------------------------------------------------------- streaming
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream = new MicroBatchStream {
    override def initialOffset(): SOffset = CountOffset(firstOffset)
    override def latestOffset(): SOffset =
      CountOffset(table.log.latestVersion())
    override def deserializeOffset(json: String): SOffset =
      CountOffset(json.trim.toLong)
    override def planInputPartitions(
        start: SOffset, end: SOffset): Array[InputPartition] =
      partitionsFor(start.asInstanceOf[CountOffset].n,
        end.asInstanceOf[CountOffset].n)
    override def createReaderFactory(): PartitionReaderFactory =
      new ChangeAppendingReaderFactory(required)
    override def commit(end: SOffset): Unit = ()
    override def stop(): Unit = ()
  }
}

/** An inner file-scan partition tagged with its change type, commit
  * version, and the inner scan's actual (logical-named) output schema.
  * `dvBytes` (compressed bitmap over the partition's single file, set
  * only for DV-modulated groups) filters rows by parquet row index:
  * `dvKeepOnly = true` serves only bitmap rows, `false` subtracts them. */
case class ChangeTagPartition(
    inner: InputPartition, factory: PartitionReaderFactory,
    changeType: String, version: Long, innerSchema: StructType,
    dvBytes: Option[Array[Byte]] = None, dvKeepOnly: Boolean = false)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Projects each inner row into the required change-feed shape:
  * `_change_type` / `_commit_version` come from the partition tag; data
  * columns bind by name against the inner scan's output; columns the
  * version's schema did not have read as NULL (schema evolution). */
class ChangeAppendingReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = false
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[ChangeTagPartition]
    val innerSchema = cp.innerSchema
    val r = cp.factory.createReader(cp.inner)
    val proj = UnsafeProjection.create(required.fields.map { f =>
      f.name match {
        case GraftDiskChangesTable.ChangeTypeCol =>
          CatalystLiteral(
            org.apache.spark.unsafe.types.UTF8String.fromString(cp.changeType),
            StringType): org.apache.spark.sql.catalyst.expressions.Expression
        case GraftDiskChangesTable.CommitVersionCol =>
          CatalystLiteral(cp.version, LongType)
        case n =>
          // case-insensitive, like every other column resolution here
          val i = innerSchema.fieldNames.indexWhere(_.equalsIgnoreCase(n))
          if (i >= 0)
            BoundReference(i, innerSchema(i).dataType, innerSchema(i).nullable)
          else CatalystLiteral(null, f.dataType)
      }
    }.toSeq)
    cp.dvBytes match {
      case None =>
        new PartitionReader[InternalRow] {
          override def next(): Boolean = r.next()
          override def get(): InternalRow = proj(r.get())
          override def close(): Unit = r.close()
        }
      case Some(bytes) =>
        val bits = graft.sources.DiskDv.deserialize(bytes)
        val riOrd = innerSchema.fieldIndex(
          graft.sources.GraftDiskCatalog.RowIndexColumnName)
        val keepOnly = cp.dvKeepOnly
        new PartitionReader[InternalRow] {
          private var current: InternalRow = _
          override def next(): Boolean = {
            while (r.next()) {
              val row = r.get()
              if (bits.contains(row.getLong(riOrd)) == keepOnly) {
                current = proj(row)
                return true
              }
            }
            false
          }
          override def get(): InternalRow = current
          override def close(): Unit = r.close()
        }
    }
  }
}
