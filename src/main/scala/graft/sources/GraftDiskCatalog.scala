package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal => CatalystLiteral, UnsafeProjection}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.connector.catalog.{Column => V2Column, _}
import org.apache.spark.sql.connector.catalog.constraints.{Check, Constraint, ForeignKey, PrimaryKey, Unique}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetWriteSupport}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The parquet-backed sibling of [[GraftMemCatalog]] — the corpus-scale
  * (100 TB) tier of the DSv2 stack, with the SAME semantic surface:
  *
  *   - '''Column DEFAULTs''' (`SUPPORT_COLUMN_DEFAULT_VALUE`) and
  *     '''CHECK constraints''' (`SUPPORT_TABLE_CONSTRAINT` — Spark's
  *     `ResolveTableConstraints` injects `CheckInvariant` into every write
  *     plan, so CHECK runs DISTRIBUTED on the executors);
  *   - '''PRIMARY KEY / UNIQUE''' enforced on ingest as DISTRIBUTED Spark
  *     jobs at commit (a groupBy-count over key columns across existing ∪
  *     appended files — never a driver-side hash of table rows);
  *   - '''MERGE / UPDATE / DELETE''' via `SupportsRowLevelOperations`
  *     group-based copy-on-write — Spark rewrites the statement into one
  *     join over the scan; executors write the replacement parquet files;
  *     commit swaps the manifest;
  *   - '''`VERSION AS OF`''' over a commit log of JSON manifests (one
  *     complete file-list snapshot per version, Delta-style);
  *   - '''streaming''' source (tails files added per commit) and sink
  *     (parquet files per epoch, idempotent by (query id, epoch id)).
  *
  * Where gmem holds rows on the driver (capped, dimension-scale — the
  * Spark-native form of the reference's in-memory `MemoryTable`,
  * `qurious/src/datasource/memory.rs:21`), gdisk NEVER materializes table
  * rows on the driver:
  *
  *   - reads delegate to Spark's own vectorized parquet `FileTable` scan
  *     over the manifest's file list, so column pruning, filter pushdown
  *     and whole-stage codegen are the native ones;
  *   - writes stream through executor-side `ParquetWriter`s; the driver
  *     commit sees only file names and row counts;
  *   - constraint checks at commit are Spark jobs whose driver-side result
  *     is a single violation count.
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.gdisk", classOf[GraftDiskCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.gdisk.warehouse", "/data/warehouse")
  *   spark.sql("CREATE TABLE gdisk.lake.docs (id BIGINT, text STRING DEFAULT '')")
  *   spark.sql("INSERT INTO gdisk.lake.docs SELECT id, text FROM staged")
  * }}}
  *
  * Commit concurrency is optimistic: a manifest version is claimed with a
  * create-if-absent on `_graft_log/v<N>.json`; append commits retry on a
  * lost race (re-reading the new base), full-replacement commits fail
  * cleanly. Durability of a half-written manifest on a crashed driver is
  * out of scope (single-writer discipline, as in the reference's
  * single-process engine).
  */
class GraftDiskCatalog extends TableCatalog with SupportsNamespaces
  with FunctionCatalog with StagingTableCatalog {
  import GraftDiskCatalog._

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      sys.error(s"spark.sql.catalog.$name.warehouse must point at a directory"))
    val fs = fileSystem(warehouse)
    fs.mkdirs(new HPath(warehouse, "default"))
    GraftDiskCatalog.register(name, this)
  }

  override def name(): String = catalogName
  override def defaultNamespace(): Array[String] = Array("default")

  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def fileSystem(path: String): FileSystem =
    new HPath(path).getFileSystem(hadoopConf())
  private def hadoopConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  // ---- MV marker registry: CREATE MATERIALIZED VIEW drops one file per
  // MV under `<warehouse>/_graft_mv/`, so the auto-rewrite rule's
  // discovery is one directory listing of O(#MVs) — NEVER a loadTable
  // sweep of every table in the catalog (a bench session accumulates
  // dozens; manifest-reading them all per discovery tick dominated the
  // optimizer). The marker holds the MV identifier; the definition stays
  // in the MV's own manifest (cross-session, no driver registry).
  private def mvMarkerDir = new HPath(warehouse, "_graft_mv")
  private[graft] def writeMvMarker(ident: Identifier): Unit = {
    val fs = fileSystem(warehouse)
    fs.mkdirs(mvMarkerDir)
    val name = java.net.URLEncoder.encode(
      (ident.namespace :+ ident.name).mkString("."), "UTF-8")
    val out = fs.create(new HPath(mvMarkerDir, name), true)
    try out.write((ident.namespace :+ ident.name).mkString("\u0001")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
  private[graft] def listMvIdents(): Seq[Identifier] = {
    val fs = fileSystem(warehouse)
    if (!fs.exists(mvMarkerDir)) return Nil
    fs.listStatus(mvMarkerDir).toSeq.flatMap { st =>
      val in = fs.open(st.getPath)
      val parts =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).split('\u0001')
        finally in.close()
      if (parts.length >= 2)
        Some(Identifier.of(parts.init, parts.last))
      else None
    }
  }
  /** Best-effort sweep of a stale marker (its MV table was dropped). */
  private[graft] def dropMvMarker(ident: Identifier): Unit = {
    val name = java.net.URLEncoder.encode(
      (ident.namespace :+ ident.name).mkString("."), "UTF-8")
    try fileSystem(warehouse).delete(new HPath(mvMarkerDir, name), false)
    catch { case _: Exception => () }
  }

  private def nsDir(namespace: Seq[String]): HPath = {
    require(namespace.forall(n => !n.contains('/') && !n.contains('.')),
      s"gdisk: namespace segments must be plain names: ${namespace.mkString(".")}")
    new HPath(warehouse, namespace.mkString("."))
  }
  private def tableDir(ident: Identifier): HPath = {
    require(!ident.name.contains('/'),
      s"gdisk: table names must be plain names: ${ident.name}")
    new HPath(nsDir(ident.namespace.toIndexedSeq), ident.name)
  }

  // ------------------------------------------------------------- tables
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val fs = fileSystem(warehouse)
    val dir = nsDir(namespace.toIndexedSeq)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => fs.exists(new HPath(p, LogDirName)))
      .map(p => Identifier.of(namespace, p.getName))
      .sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean = {
    val fs = fileSystem(warehouse)
    fs.exists(new HPath(tableDir(ident), LogDirName))
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) {
      // `.changes` METADATA TABLE (Iceberg-style resolution): ns.t.changes
      // resolves to the CDC feed over ns.t — batch SQL and readStream
      if (ident.name() == "changes" && ident.namespace().nonEmpty) {
        val base = Identifier.of(
          ident.namespace().init, ident.namespace().last)
        if (tableExists(base))
          return new GraftDiskChangesTable(
            loadTable(base).asInstanceOf[GraftDiskTable])
      }
      throw new NoSuchTableException(ident)
    }
    val dir = tableDir(ident)
    val log = new DiskCommitLog(dir, hadoopConf())
    new GraftDiskTable(fullName(ident), log, log.latest(), pinned = None)
  }

  /** `VERSION AS OF v` — a read-only view over manifest `v`'s file list. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.trim.toLong catch {
      case _: NumberFormatException =>
        // non-numeric: a TAG name — resolve through the latest manifest
        if (!tableExists(ident)) throw new NoSuchTableException(ident)
        val log = new DiskCommitLog(tableDir(ident), hadoopConf())
        val tags = GraftDiskCatalog.parseTags(log.latest().properties)
        tags.getOrElse(version.trim, throw new IllegalArgumentException(
          s"gdisk: VERSION AS OF expects a numeric commit id or a tag " +
            s"name, got '$version' (tags: " +
            s"${if (tags.isEmpty) "none" else tags.keys.mkString(", ")})"))
    }
    loadVersion(ident, v)
  }

  /** `TIMESTAMP AS OF t` — Spark's time-travel resolution routes
    * timestamps (MICROseconds) through this overload (numeric `VERSION AS
    * OF` always arrives as the String overload above): serve the newest
    * manifest committed at or before `t`. Manifests from before commit
    * times were recorded count as the unknown past (always eligible). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val log = new DiskCommitLog(dir, hadoopConf())
    val ms = Math.floorDiv(timestamp, 1000L)
    val eligible = log.versions().reverseIterator
      .map(v => v -> log.read(v))
      .find { case (_, m) => m.committedAtMs.forall(_ <= ms) }
    val (v, m) = eligible.getOrElse(throw new IllegalArgumentException(
      s"gdisk: no version of ${fullName(ident)} committed at or before " +
        s"timestamp $ms ms (earliest retained commit: " +
        s"${log.read(log.versions().head).committedAtMs.getOrElse(0L)} ms)"))
    new GraftDiskTable(s"${fullName(ident)}@v$v", log, m, pinned = Some(v))
  }

  /** Version-pinned load (the `VERSION AS OF` target and internal
    * time-travel entry). */
  private[graft] def loadVersion(ident: Identifier, version: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val log = new DiskCommitLog(dir, hadoopConf())
    new GraftDiskTable(s"${fullName(ident)}@v$version", log, log.read(version),
      pinned = Some(version))
  }

  private def fullName(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString(".")

  /** All live tables (namespace-dotted, name, table) — the front door's
    * information_schema inventory walks these. */
  private[graft] def listAllTables(): Seq[(String, String, GraftDiskTable)] = {
    val fs = fileSystem(warehouse)
    val root = new HPath(warehouse)
    if (!fs.exists(root)) return Nil
    (for {
      nsDir <- fs.listStatus(root).toSeq if nsDir.isDirectory
      tDir <- fs.listStatus(nsDir.getPath).toSeq if tDir.isDirectory
      if fs.exists(new HPath(tDir.getPath, LogDirName))
    } yield {
      val ident = Identifier.of(
        nsDir.getPath.getName.split('.'), tDir.getPath.getName)
      (nsDir.getPath.getName, tDir.getPath.getName,
        loadTable(ident).asInstanceOf[GraftDiskTable])
    }).sortBy { case (ns, n, _) => (ns, n) }
  }

  /** All live tables' (namespace-dotted, name, commit log) WITHOUT
    * loading any manifest — BEGIN/ROLLBACK watermarks need only
    * `latestVersion()`, one log-dir listing per table, never a
    * checkpoint+delta reconstruction ([[listAllTables]] loads every
    * table and is the information_schema path, not the tx path). */
  private[graft] def listTableLogs(): Seq[(String, String, DiskCommitLog)] = {
    val fs = fileSystem(warehouse)
    val root = new HPath(warehouse)
    if (!fs.exists(root)) return Nil
    (for {
      nsDir <- fs.listStatus(root).toSeq if nsDir.isDirectory
      tDir <- fs.listStatus(nsDir.getPath).toSeq if tDir.isDirectory
      if fs.exists(new HPath(tDir.getPath, LogDirName))
    } yield (nsDir.getPath.getName, tDir.getPath.getName,
      new DiskCommitLog(tDir.getPath, hadoopConf())))
      .sortBy { case (ns, n, _) => (ns, n) }
  }

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

  override def createTable(ident: Identifier, info: TableInfo): Table =
    createV2(ident, info.columns(), info.partitions(),
      info.properties().asScala.toMap, info.constraints())

  private def createV2(
      ident: Identifier, columns: Array[V2Column], partitions: Array[Transform],
      properties: Map[String, String], constraints: Array[Constraint]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val (dir, m) = buildManifest(ident, columns, partitions, properties,
      constraints)
    val log = new DiskCommitLog(dir, hadoopConf())
    log.commitInitial(m)
    new GraftDiskTable(fullName(ident), log, m, pinned = None)
  }

  /** The version-0 manifest for a new (or staged) table — everything
    * createTable validates and records, WITHOUT writing anything. */
  private def buildManifest(
      ident: Identifier, columns: Array[V2Column], partitions: Array[Transform],
      properties: Map[String, String], constraints: Array[Constraint])
      : (HPath, DiskManifest) = {
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    // identity transforms = hive-layout partition dirs; one bucket(n,
    // cols...) transform = hash-bucket layout; temporal / truncate
    // transforms (days/months/years/hours/truncate) = transform layout
    // (all columns stay in files, dirs are pruning metadata only)
    def resolveCol(c: String): String = {
      val colDef = columns.find(_.name.equalsIgnoreCase(c)).getOrElse(
        sys.error(s"gdisk: partition column $c is not a table column"))
      colDef.dataType match {
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.BooleanType |
             org.apache.spark.sql.types.DateType => ()
        case other => sys.error(
          s"gdisk: partition column $c has unsupported type $other " +
            "(string / integral / boolean / date)")
      }
      colDef.name
    }
    val (partCols, numBuckets, partFuncs) = partitions.toSeq match {
      case Seq(b) if b.name() == "bucket" =>
        val n = b.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value().asInstanceOf[Number].intValue()
        }.getOrElse(sys.error(s"gdisk: bucket transform without a count: $b"))
        require(n >= 1, s"gdisk: bucket count must be >= 1, got $n")
        val cols = b.references().toSeq
          .map(r => resolveCol(r.fieldNames().mkString(".")))
        require(cols.nonEmpty, s"gdisk: bucket transform without columns: $b")
        (cols, Some(n), None)
      case ts =>
        val colsKinds = ts.map { t =>
          DiskTransforms.fromV2(t).getOrElse(sys.error(
            "gdisk: only identity / years / months / days / hours / " +
              "truncate(w, col) transforms or a single bucket(n, cols...) " +
              s"transform are supported, got $t"))
        }
        val withTypes = colsKinds.map { case (c0, kind) =>
          val colDef = columns.find(_.name.equalsIgnoreCase(c0)).getOrElse(
            sys.error(s"gdisk: partition column $c0 is not a table column"))
          if (DiskTransforms.isIdentity(kind)) resolveCol(c0)
          else DiskTransforms.validate(kind, colDef.name, colDef.dataType)
            .foreach(sys.error(_))
          (colDef.name, kind, colDef.dataType)
        }
        // transform dir-segment keys must be unambiguous: no duplicates,
        // and no collision with a real column name (a column literally
        // named `ts_day` next to days(ts) would make OPTIMIZE's helper
        // columns and the dir layout ambiguous)
        val segs = withTypes.map { case (c, k, _) => DiskTransforms.segName(c, k) }
        require(segs.distinct.length == segs.length,
          s"gdisk: duplicate partition dir segments: ${segs.mkString(", ")}")
        withTypes.collect {
          case (c, k, _) if !DiskTransforms.isIdentity(k) =>
            DiskTransforms.segName(c, k)
        }.foreach { s =>
          require(!columns.exists(_.name.equalsIgnoreCase(s)),
            s"gdisk: partition transform dir segment '$s' collides with a " +
              "table column of the same name — rename the column")
        }
        val kinds = withTypes.map(_._2)
        (withTypes.map(_._1), None,
          if (kinds.exists(!DiskTransforms.isIdentity(_))) Some(kinds) else None)
    }
    val dir = tableDir(ident)
    val m = DiskManifest(
      version = 0L,
      numBuckets = numBuckets,
      partitionCols = if (partCols.isEmpty) None else Some(partCols),
      schemaJson = toStruct(columns).json,
      defaults = columns.iterator.flatMap { c =>
        Option(c.defaultValue()).map { d =>
          c.name -> DiskDefault(d.getSql,
            CatalystLiteral(d.getValue.value(), d.getValue.dataType()).sql)
        }
      }.toMap,
      comments = columns.iterator
        .flatMap(c => Option(c.comment()).map(c.name -> _)).toMap,
      constraints = constraints.toIndexedSeq.map(DiskConstraint.from),
      files = Nil, added = Nil, properties = properties, epochs = Map.empty,
      partFuncs = partFuncs)
    (dir, m)
  }

  /** CONVERT TO GDISK: adopt an existing parquet file or directory as a
    * gdisk table WITHOUT rewriting any data — the Delta `CONVERT TO
    * DELTA` move. Files RENAME into the table's data dir (an O(1)
    * metadata operation per file on the same filesystem; the source
    * location is consumed), hive `col=value/` dirs become identity
    * partition columns (discovered exactly as Spark's partition inference
    * sees them), and per-file skipping stats harvest from the parquet
    * FOOTERS in one distributed job — so a 100 TB corpus adopts in
    * minutes of metadata work, not a rewrite. The source must be
    * schema-uniform (the scan serves every file with one schema, like
    * any gdisk table). */
  def convertFromParquet(ident: Identifier, src: String): GraftDiskTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    val spark = SparkSession.active
    val conf = hadoopConf()
    val srcPath = new HPath(src)
    val fs = srcPath.getFileSystem(conf)
    require(fs.exists(srcPath), s"gdisk: CONVERT source not found: $src")
    // full schema as Spark sees it (partition discovery includes hive dirs)
    val inferred = spark.read.parquet(src).schema
    val srcIsFile = fs.getFileStatus(srcPath).isFile
    val rel: Seq[String] =
      if (srcIsFile) Seq(srcPath.getName)
      else {
        val base = srcPath.toUri.getPath.stripSuffix("/")
        val it = fs.listFiles(srcPath, true)
        val out = Seq.newBuilder[String]
        while (it.hasNext) {
          val p = it.next().getPath
          if (p.getName.endsWith(".parquet"))
            out += p.toUri.getPath.stripPrefix(base).stripPrefix("/")
        }
        out.result()
      }
    require(rel.nonEmpty, s"gdisk: no parquet files under $src")
    // partition columns = inferred schema minus one file's physical schema
    val sampleFile =
      if (srcIsFile) srcPath else new HPath(srcPath, rel.head)
    val physical = spark.read.parquet(sampleFile.toString).schema.fieldNames.toSet
    val partCols = inferred.fields.map(_.name).filterNot(physical).toSeq
    partCols.foreach { c =>
      inferred.fields.find(_.name == c).get.dataType match {
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.BooleanType |
             org.apache.spark.sql.types.DateType => ()
        case other => sys.error(
          s"gdisk: CONVERT found partition column $c of unsupported type " +
            s"$other (string / integral / boolean / date)")
      }
    }
    // rename every file into the table's data dir, keeping the hive layout
    val dir = tableDir(ident)
    val log = new DiskCommitLog(dir, conf)
    fs.mkdirs(log.dataDir)
    rel.foreach { r =>
      val from = if (srcIsFile) srcPath else new HPath(srcPath, r)
      val to = new HPath(log.dataDir, r)
      fs.mkdirs(to.getParent)
      require(fs.rename(from, to),
        s"gdisk: CONVERT could not move $from into the table dir " +
          "(cross-filesystem sources must be copied first)")
    }
    // distributed footer-stat + byte-size harvest over the adopted files
    // — one task batch per slice of the file list, O(files × cols)
    // metadata back
    val dataSchema = StructType(
      inferred.fields.filterNot(f => partCols.contains(f.name)))
    val dataDirStr = log.dataDir.toString
    val schemaJsonStr = dataSchema.json
    val harvested: Array[(String, Map[String, ColStats], Long)] =
      spark.sparkContext
        .parallelize(rel, math.max(1, math.min(rel.size, 64)))
        .map { r =>
          val c = new Configuration()
          val p = new HPath(dataDirStr, r)
          val sch = DataType.fromJson(schemaJsonStr).asInstanceOf[StructType]
          (r, DiskStats.footerStats(p, c, sch),
            p.getFileSystem(c).getFileStatus(p).getLen)
        }
        .collect() // O(files) metadata triples — DriverActionLint-bounded
    val m = DiskManifest(
      version = 0L,
      schemaJson = inferred.json,
      defaults = Map.empty, comments = Map.empty, constraints = Nil,
      files = rel, added = rel,
      properties = Map("gdisk.converted.from" -> src),
      epochs = Map.empty,
      partitionCols = if (partCols.isEmpty) None else Some(partCols),
      fileStats = Some(harvested.map(h => h._1 -> h._2).toMap),
      fileSizes = Some(harvested.map(h => h._1 -> h._3).toMap))
    log.commitInitial(m, "CONVERT")
    new GraftDiskTable(fullName(ident), log, m, pinned = None)
  }

  // ------------------------------------------------ atomic CTAS / RTAS
  // StagingTableCatalog: CREATE/REPLACE TABLE AS SELECT stage their
  // writes into the table's data dir (uniquely-named files) and only
  // claim a manifest at commitStagedChanges — so a failed CTAS leaves no
  // table behind, and RTAS keeps serving the OLD snapshot until the
  // atomic manifest claim swaps in the new one (readers never see a
  // dropped-then-empty table). REPLACE lands as version latest+1 atop
  // the existing commit log: the pre-replace snapshots stay
  // time-travelable.
  /** ZERO-COPY SHALLOW CLONE (Delta's shallow clone re-expressed for a
    * dir-owned layout): materialize `src`'s state at `version` (default
    * latest) as a NEW table whose data files, bloom sidecars, and
    * deletion-vector sidecars are HARD LINKS into the clone's own data
    * dir — no bytes copied, O(files) metadata. Hard links give exactly
    * the ownership semantics the table-owns-its-dir invariant needs:
    * either table may VACUUM, OPTIMIZE, or DROP independently, and the
    * shared bytes free only when the LAST name referencing an inode
    * drops — no absolute-path coupling, no cross-table corruption.
    * Non-POSIX filesystems fall back to a per-file copy (still
    * O(files) driver metadata — the byte copy runs distributed). Tags
    * do not carry (they name versions the clone's log never had);
    * stream epochs reset. At 100 TB this is the experiment-branch verb:
    * clone, mutate, measure, drop — without touching the source. */
  private[graft] def cloneTable(
      src: GraftDiskTable, ident: Identifier,
      version: Option[Long]): GraftDiskTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val m = version.fold(src.log.latest())(src.log.read)
    val dir = tableDir(ident)
    val dstLog = new DiskCommitLog(dir, hadoopConf())
    val srcData = src.log.dataDir
    val fsrc = srcData.getFileSystem(hadoopConf())
    // referenced sidecars ride along: blooms keep the clone point-lookup
    // skippable, DVs keep its merge-on-read deletes subtracted
    val fileSet = m.files.toSet
    val bloomDir = new HPath(srcData, DiskBloom.DirName)
    val blooms: Seq[String] =
      if (!fsrc.exists(bloomDir)) Nil
      else fsrc.listStatus(bloomDir).toSeq.flatMap { st =>
        DiskBloom.relOfSidecar(st.getPath.getName).collect {
          case rel if fileSet.contains(rel) =>
            s"${DiskBloom.DirName}/${st.getPath.getName}"
        }
      }
    val dvRels = m.dvs.values.map(_.dv).toSeq
    GraftDiskCatalog.linkOrCopyAll(
      srcData.toString, dstLog.dataDir.toString,
      m.files ++ blooms ++ dvRels)
    val m0 = m.copy(version = 0L, added = m.files,
      epochs = Map.empty, committedAtMs = None,
      properties = m.properties - GraftDiskCatalog.TagsProp)
    dstLog.commitInitial(m0, "CLONE")
    new GraftDiskTable(fullName(ident), dstLog, m0, pinned = None)
  }

  override def stageCreate(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    stagedTable(ident, info, replaceExisting = false)
  }

  override def stageReplace(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    stagedTable(ident, info, replaceExisting = true)
  }

  override def stageCreateOrReplace(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    stagedTable(ident, info, replaceExisting = tableExists(ident))

  private def stagedTable(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo,
      replaceExisting: Boolean): StagedTable = {
    val (dir, m) = buildManifest(ident, info.columns(), info.partitions(),
      info.properties().asScala.toMap, info.constraints())
    new GraftDiskStagedTable(fullName(ident),
      new DiskCommitLog(dir, hadoopConf()), m, replaceExisting)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val fs = fileSystem(warehouse)
    val dir = tableDir(ident)
    GraftDiskCatalog.forgetJvmCreation(dir.toUri.getPath)
    if (!fs.exists(new HPath(dir, LogDirName))) false
    else fs.delete(dir, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (!namespaceExists(to.namespace))
      throw new NoSuchNamespaceException(to.namespace)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    val fs = fileSystem(warehouse)
    if (!fs.rename(tableDir(from), tableDir(to)))
      sys.error(s"gdisk: rename ${fullName(from)} -> ${fullName(to)} failed")
    // drop the old dir's creation record (conservative: a renamed table is
    // never rollback-dropped; RENAME is guarded inside a transaction anyway)
    GraftDiskCatalog.forgetJvmCreation(tableDir(from).toUri.getPath)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = loadTable(ident).asInstanceOf[GraftDiskTable]
    changes.foreach(t.applyChange)
    loadTable(ident)
  }

  // --------------------------------------------------------- namespaces
  // ---------------------------------------------------------- functions
  // FunctionCatalog with the one system function storage-partitioned
  // joins need: Spark resolves a scan's reported `bucket(n, cols...)`
  // transform through the table's catalog, and without a bound function
  // the KeyGroupedPartitioning silently degrades to unknown (the join
  // keeps its shuffles). Same pattern as Iceberg's system-function
  // catalog. The bound function computes the EXACT id the ingest
  // writers use: pmod(chained murmur3 seed 42, n).
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name.equalsIgnoreCase("bucket")) GraftDiskCatalog.BucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def listNamespaces(): Array[Array[String]] = {
    val fs = fileSystem(warehouse)
    fs.listStatus(new HPath(warehouse)).filter(_.isDirectory)
      .map(_.getPath.getName.split('.').toArray[String])
      .sortBy(_.mkString("."))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    fileSystem(warehouse).exists(nsDir(namespace.toIndexedSeq))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    fileSystem(warehouse).mkdirs(nsDir(namespace.toIndexedSeq))
  }

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = {
    val ns = namespace.toList
    if (ns == List("default"))
      throw new UnsupportedOperationException(
        "gdisk: the built-in 'default' namespace cannot be dropped")
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    if (listTables(namespace).nonEmpty && !cascade)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        namespace)
    fileSystem(warehouse).delete(nsDir(ns), true)
  }
}

object GraftDiskCatalog {
  val LogDirName = "_graft_log"
  val DataDirName = "data"

  /** Spark's parquet row-index REQUEST column: a read schema carrying
    * this field makes both parquet readers (vectorized and parquet-mr,
    * the DSv2 factory included) populate each row's true index within
    * its file — the mechanism behind `_metadata.row_index`, correct
    * under splits and row-group skipping. The deletion-vector read path
    * keys its subtraction on it. */
  val RowIndexColumnName: String = org.apache.spark.sql.execution
    .datasources.parquet.ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
  // NULLABLE by design: the readers first admit the temp column as a
  // missing column (null vector), then the row-index generator —
  // matching it BY THIS NAME — overwrites it with each row's true index;
  // a non-nullable request would fail the missing-column check before
  // generation ever ran
  val RowIndexField: org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField(
      RowIndexColumnName, org.apache.spark.sql.types.LongType,
      nullable = true)

  /** Executor-side DV membership test over `_metadata` (file path + row
    * index). Carries the COMPRESSED sidecar bytes (small) in the task
    * closure and decompresses once per executor-JVM deserialization. */
  private[sources] case class DvRowFilter(
      dataDirPath: String, bytes: Map[String, Array[Byte]])
      extends Serializable {
    @transient private lazy val maps: Map[String, DvBitmap] =
      bytes.map { case (k, v) => k -> DiskDv.deserialize(v) }
    def deleted(filePath: String, rowIdx: Long): Boolean = {
      val p = org.apache.spark.paths.SparkPath
        .fromUrlString(filePath).toUri.getPath
      val rel = p.stripPrefix(dataDirPath).stripPrefix("/")
      maps.get(rel).exists(_.contains(rowIdx))
    }
  }

  /** One relative path: hard-link `dstBase/rel` to `srcBase/rel` on
    * POSIX filesystems (zero-copy; the inode frees when the LAST name
    * drops, so cloned tables vacuum independently); anything without
    * link support falls back to a byte copy. */
  private[sources] def linkOrCopyOne(
      srcBase: String, dstBase: String, rel: String,
      conf: Configuration): Unit = {
    val sp = new HPath(srcBase, rel)
    val dp = new HPath(dstBase, rel)
    val f = sp.getFileSystem(conf)
    f.mkdirs(dp.getParent)
    if ("file".equalsIgnoreCase(f.getUri.getScheme)) {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dp.toUri.getPath),
          java.nio.file.Paths.get(sp.toUri.getPath))
        return
      } catch {
        case _: UnsupportedOperationException | _: java.io.IOException => ()
      }
    }
    org.apache.hadoop.fs.FileUtil.copy(f, sp, dp.getFileSystem(conf), dp,
      false, conf)
  }

  /** Link-or-copy a file inventory; large sets fan out as ONE Spark job
    * (the deleteBatch/stats-harvest executor pattern) so a 100 TB clone
    * is O(files/parallelism) wall-clock, never a driver loop. */
  private[sources] def linkOrCopyAll(
      srcBase: String, dstBase: String, rels: Seq[String]): Unit = {
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    if (rels.length >= 256 && active.isDefined) {
      active.get.sparkContext
        .parallelize(rels, math.max(1, math.min(rels.length / 64 + 1, 64)))
        .foreachPartition { it =>
          val c = new Configuration()
          it.foreach(rel => GraftDiskCatalog.linkOrCopyOne(
            srcBase, dstBase, rel, c))
        }
    } else {
      val c = new Configuration()
      rels.foreach(rel => linkOrCopyOne(srcBase, dstBase, rel, c))
    }
  }

  /** Subtract DV'd rows from a V1 file-source read (maintenance paths:
    * OPTIMIZE rewrite, key/FK enforcement, CDC pre-images). No-op when
    * `bytes` is empty — the common case pays nothing. */
  private[sources] def dvSubtract(
      df: org.apache.spark.sql.DataFrame, dataDirPath: String,
      bytes: Map[String, Array[Byte]]): org.apache.spark.sql.DataFrame =
    if (bytes.isEmpty) df
    else {
      val f = DvRowFilter(dataDirPath, bytes)
      val keep = org.apache.spark.sql.functions.udf(
        (fp: String, idx: Long) => !f.deleted(fp, idx))
      df.where(keep(
        org.apache.spark.sql.functions.col("_metadata.file_path"),
        org.apache.spark.sql.functions.col("_metadata.row_index")))
    }

  /** KEEP ONLY the rows a per-file bitmap names (CDC's "rows this commit
    * deleted / this restore revived" reads). */
  private[sources] def dvKeepOnly(
      df: org.apache.spark.sql.DataFrame, dataDirPath: String,
      bytes: Map[String, Array[Byte]]): org.apache.spark.sql.DataFrame = {
    val f = DvRowFilter(dataDirPath, bytes)
    val keep = org.apache.spark.sql.functions.udf(
      (fp: String, idx: Long) => f.deleted(fp, idx))
    df.where(keep(
      org.apache.spark.sql.functions.col("_metadata.file_path"),
      org.apache.spark.sql.functions.col("_metadata.row_index")))
  }

  /** Every Nth version is a FULL manifest checkpoint; the rest are delta
    * records (`TBLPROPERTIES ('commitlog.checkpointInterval'='n')`). */
  val CheckpointIntervalProp = "commitlog.checkpointInterval"
  val DefaultCheckpointInterval = 20

  /** Physical column names still present in old data files whose logical
    * column was DROPPED — ADD COLUMN must not hand them out again. */
  val ReservedPhysicalProp = "graft.columnmapping.reserved"

  /** Named tag refs (`name=version` pairs, comma-joined — names are
    * restricted to a safe charset so the encoding is unambiguous). */
  val TagsProp = "graft.tags"

  private[sources] def parseTags(props: Map[String, String]): Map[String, Long] =
    props.get(TagsProp).toSeq.flatMap(_.split(','))
      .filter(_.contains('=')).map { kv =>
        val i = kv.lastIndexOf('=')
        kv.substring(0, i) -> kv.substring(i + 1).toLong
      }.toMap

  private[sources] def renderTags(tags: Map[String, Long]): String =
    tags.toSeq.sortBy(_._1).map { case (n, v) => s"$n=$v" }.mkString(",")

  /** Table dirs whose v0 commit THIS JVM wrote, with the creation
    * wall-clock — the transaction surface's attribution record. ROLLBACK
    * drops a table absent from the BEGIN snapshot only when this JVM
    * created it after BEGIN; absence alone proves nothing (a concurrent
    * process may have created the table in the shared warehouse during
    * the tx window, or the catalog may have been configured mid-tx over a
    * pre-existing warehouse) and rollback must never destroy committed
    * data the transaction never touched. Keyed by table-dir path, not
    * catalog name, so two catalog names over one warehouse agree. */
  private val jvmCreations = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private[sources] def recordJvmCreation(tableDirPath: String): Unit =
    jvmCreations.put(tableDirPath, System.currentTimeMillis())

  /** A dropped dir's record must not outlive it: a same-name table created
    * later by another process would otherwise inherit the attribution. */
  private[sources] def forgetJvmCreation(tableDirPath: String): Unit =
    jvmCreations.remove(tableDirPath)

  private[graft] def createdByThisJvmSince(
      tableDirPath: String, sinceMs: Long): Boolean =
    Option(jvmCreations.get(tableDirPath)).exists(_ >= sinceMs)

  /** Files dropped by RUNTIME (dynamic-partition / dynamic-bucket)
    * pruning since JVM start — the observable evidence plan proofs and
    * specs assert on, since the pruning happens at execution time where
    * a pre-execution `.explain` cannot show it. */
  val runtimePrunedFiles = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Driver-side per-file `getFileStatus` probes since JVM start — the
    * LEGACY fallback for files whose manifest predates the `fileSizes`
    * field. Specs assert OPTIMIZE / DESCRIBE DETAIL on freshly-written
    * tables never advance it: every maintenance size is served from
    * metadata already in hand, no O(files) driver status sweep. */
  val driverFileStatCalls = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The shared core of DYNAMIC partition/bucket pruning (SPARK-35779 v2
    * runtime filtering): extract the allowed partition-key values from
    * the runtime IN/= predicates (the DPP subquery result), then keep
    * only the manifest files whose hive dir value — or, for bucketed
    * layouts, whose `__bucket=` id under the writers' chained murmur3 —
    * can match. Returns Some(kept) only when files were actually
    * dropped (and then advances [[runtimePrunedFiles]]); None means the
    * caller's scan state should stay untouched. */
  private[sources] def runtimeKeepFiles(
      table: GraftDiskTable, relFiles: Seq[String],
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Option[Seq[String]] = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference}
    if (relFiles.isEmpty || table.livePartCols.isEmpty) return None
    // per partition column: allowed (internal value, dataType) pairs from
    // IN/= predicates; conjunction across predicates intersects on values
    val byCol = scala.collection.mutable.Map.empty[String, Set[(Any, DataType)]]
    predicates.foreach { p =>
      if (p.name() == "IN" || p.name() == "=") {
        val kids = p.children()
        val colOpt = kids.collectFirst {
          case r: NamedReference if r.fieldNames().length == 1 =>
            r.fieldNames().head
        }
        val vals = kids.collect {
          case l: V2Literal[_] if l.value() != null =>
            (l.value(): Any, l.dataType())
        }.toSet
        for {
          c0 <- colOpt
          c <- table.livePartCols.find(_.equalsIgnoreCase(c0))
          if vals.nonEmpty
        } byCol(c) = byCol.get(c) match {
          case Some(prev) => prev.filter(v => vals.exists(_._1 == v._1))
          case None => vals
        }
      }
    }
    if (byCol.isEmpty) return None
    val kept = table.liveNumBuckets match {
      case Some(n) => // bucket layout: hash values to allowed dir ids
        byCol.get(table.livePartCols.head) match {
          case None => relFiles
          case Some(vals) =>
            val allowed = vals.map { case (v, dt) =>
              val h = org.apache.spark.sql.catalyst.expressions
                .Murmur3HashFunction.hash(v, dt, 42).toInt
              ((h % n) + n) % n
            }
            relFiles.filter { f =>
              val dir = f.split('/').init.mkString("/")
              !dir.startsWith("__bucket=") ||
                allowed.contains(dir.stripPrefix("__bucket=").toInt)
            }
        }
      case None => // identity hive / transform layout: compare dir values
        val funcs = table.liveFuncs
        val parts = table.livePartCols
        relFiles.filter { f =>
          byCol.forall { case (c, vals) =>
            val kind = funcs(parts.indexOf(c))
            if (DiskTransforms.isIdentity(kind))
              dirValue(table, f, c).forall(dv => vals.exists(_._1 == dv))
            else transformDirValue(table, f, c, kind) match {
              case None => true // no such segment: conservatively keep
              case Some(tvOpt) =>
                // runtime values map through the transform; a null dir
                // only matches if it could equal a value — it cannot
                val allowed = vals.map { case (v, dt) =>
                  DiskTransforms.apply(kind, dt, v) }
                tvOpt.exists(allowed.contains)
            }
          }
        }
    }
    if (kept.length < relFiles.length) {
      runtimePrunedFiles.addAndGet(relFiles.length - kept.length)
      Some(kept)
    } else None
  }

  /** STATIC identity-partition-dir pruning: EqualTo/In literal predicates
    * on the partition columns pin hive dirs driver-side, so excluded
    * files are never listed, opened, or planned — the manifest-level
    * sibling of the inner scan's basePath partition filtering, and what
    * keeps the builder's planned-file list (and its exact numRows
    * statistic) honest under partition predicates. Returns Some(kept)
    * only when files were dropped. */
  private[sources] def identityKeepFiles(
      table: GraftDiskTable, relFiles: Seq[String],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[Seq[String]] = {
    if (table.liveNumBuckets.nonEmpty || table.livePartCols.isEmpty ||
        relFiles.isEmpty) return None
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, In, Literal => CLit}
    val byCol = scala.collection.mutable.Map.empty[String, Set[Any]]
    def add(name: String, vs: Set[Any]): Unit =
      for (c <- table.livePartCols.find(_.equalsIgnoreCase(name)))
        byCol(c) = byCol.get(c).map(_ intersect vs).getOrElse(vs)
    dataFilters.foreach {
      case EqualTo(a: AttributeReference, l: CLit) if l.value != null =>
        add(a.name, Set(l.value))
      case EqualTo(l: CLit, a: AttributeReference) if l.value != null =>
        add(a.name, Set(l.value))
      case In(a: AttributeReference, elems)
          if elems.nonEmpty && elems.forall(_.isInstanceOf[CLit]) =>
        add(a.name, elems.collect {
          case l: CLit if l.value != null => l.value: Any
        }.toSet)
      case _ => ()
    }
    if (byCol.isEmpty) None
    else {
      val kept = relFiles.filter { f =>
        byCol.forall { case (c, vals) =>
          dirValue(table, f, c).forall(vals.contains)
        }
      }
      if (kept.length < relFiles.length) Some(kept) else None
    }
  }

  /** The TRANSFORM value carried by file `f`'s `<c>_<kind>=<value>`
    * dir segment: None = no such segment (the file conservatively
    * survives pruning); Some(None) = the null dir; Some(Some(tv)) = the
    * parsed transform value ([[DiskTransforms.parse]] domain). */
  private[sources] def transformDirValue(
      table: GraftDiskTable, f: String, c: String, kind: String)
      : Option[Option[Any]] = {
    val pre = DiskTransforms.segName(c, kind)
      .toLowerCase(java.util.Locale.ROOT) + "="
    f.split('/').init
      .find(_.toLowerCase(java.util.Locale.ROOT).startsWith(pre))
      .map { seg =>
        val raw = java.net.URLDecoder.decode(
          seg.substring(seg.indexOf('=') + 1), "UTF-8")
        if (raw == "__HIVE_DEFAULT_PARTITION__") None
        else {
          val dt = table.liveSchema.fields
            .find(_.name.equalsIgnoreCase(c)).get.dataType
          Some(DiskTransforms.parse(kind, dt, raw))
        }
      }
  }

  /** STATIC transform-dir pruning: predicates on the SOURCE column of a
    * days/months/years/hours/truncate partition transform prune the
    * `<col>_<kind>=<value>/` dirs driver-side, before the inner parquet
    * scan lists anything. Every transform kind is MONOTONIC
    * non-decreasing in its source value, so range predicates map to
    * INCLUSIVE bounds on the transform value (`ts >= X` keeps dirs with
    * `day(dir) >= day(X)` — the boundary dir may hold rows on both
    * sides, and the pushed filter finishes the job inside it); EqualTo /
    * IN map to point sets; IsNull keeps only the null dir; any
    * comparison drops the null dir (SQL comparisons never match NULL).
    * Identity segments of the same spec are handled by
    * [[identityKeepFiles]]. Files without the segment conservatively
    * survive. Returns Some(kept) only when files were dropped. */
  private[sources] def transformKeepFiles(
      table: GraftDiskTable, relFiles: Seq[String],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[Seq[String]] = {
    val funcs = table.liveFuncs
    if (!funcs.exists(!DiskTransforms.isIdentity(_)) || relFiles.isEmpty ||
        dataFilters.isEmpty) return None
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal => CLit}
    // the pushed filters speak PHYSICAL names; partition columns are
    // logical — key the constraint map by the physical spelling
    case class Cons(
        points: Option[Set[Any]] = None, lo: Option[Any] = None,
        hi: Option[Any] = None, notNull: Boolean = false,
        nullOnly: Boolean = false)
    val transformed: Map[String, (String, String)] = // phys -> (logical, kind)
      table.livePartCols.zip(funcs).collect {
        case (c, k) if !DiskTransforms.isIdentity(k) =>
          table.physicalOf(c).toLowerCase(java.util.Locale.ROOT) -> (c, k)
      }.toMap
    val cons = scala.collection.mutable.Map.empty[String, Cons]
    def kindOf(a: AttributeReference): Option[(String, String)] =
      transformed.get(a.name.toLowerCase(java.util.Locale.ROOT))
    def upd(a: AttributeReference)(f: (Cons, String) => Cons): Unit =
      kindOf(a).foreach { case (c, k) =>
        cons(c) = f(cons.getOrElse(c, Cons()), k) }
    def tv(kind: String, l: CLit): Option[Any] =
      if (l.value == null) None
      else Some(DiskTransforms.apply(kind, l.dataType, l.value))
    def addPoint(a: AttributeReference, vs: Seq[CLit]): Unit =
      upd(a) { (c0, k) =>
        val pts = vs.flatMap(tv(k, _)).toSet
        c0.copy(points = Some(c0.points.fold(pts)(_ intersect pts)))
      }
    // strict comparisons whose literal sits EXACTLY on a bucket boundary
    // tighten by one bucket — `ts < DATE'today'` (midnight) excludes
    // today's whole day dir, the standing retention-scan shape
    def addLo(a: AttributeReference, l: CLit, strict: Boolean): Unit =
      upd(a) { (c0, k) => tv(k, l).fold(c0) { v0 =>
        val v = v0 match {
          case lv: java.lang.Long if strict &&
              DiskTransforms.isBucketEnd(k, l.dataType, l.value, v0) =>
            Long.box(lv + 1)
          case other => other
        }
        c0.copy(lo = Some(
          c0.lo.filter(DiskTransforms.cmp(_, v) >= 0).getOrElse(v)))
      } }
    def addHi(a: AttributeReference, l: CLit, strict: Boolean): Unit =
      upd(a) { (c0, k) => tv(k, l).fold(c0) { v0 =>
        val v = v0 match {
          case lv: java.lang.Long if strict &&
              DiskTransforms.isBucketStart(k, l.dataType, l.value, v0) =>
            Long.box(lv - 1)
          case other => other
        }
        c0.copy(hi = Some(
          c0.hi.filter(DiskTransforms.cmp(_, v) <= 0).getOrElse(v)))
      } }
    dataFilters.foreach {
      case EqualTo(a: AttributeReference, l: CLit) => addPoint(a, Seq(l))
      case EqualTo(l: CLit, a: AttributeReference) => addPoint(a, Seq(l))
      case In(a: AttributeReference, elems)
          if elems.nonEmpty && elems.forall(_.isInstanceOf[CLit]) =>
        addPoint(a, elems.map(_.asInstanceOf[CLit]))
      case GreaterThan(a: AttributeReference, l: CLit) =>
        addLo(a, l, strict = true)
      case GreaterThanOrEqual(a: AttributeReference, l: CLit) =>
        addLo(a, l, strict = false)
      case LessThan(l: CLit, a: AttributeReference) =>
        addLo(a, l, strict = true)
      case LessThanOrEqual(l: CLit, a: AttributeReference) =>
        addLo(a, l, strict = false)
      case LessThan(a: AttributeReference, l: CLit) =>
        addHi(a, l, strict = true)
      case LessThanOrEqual(a: AttributeReference, l: CLit) =>
        addHi(a, l, strict = false)
      case GreaterThan(l: CLit, a: AttributeReference) =>
        addHi(a, l, strict = true)
      case GreaterThanOrEqual(l: CLit, a: AttributeReference) =>
        addHi(a, l, strict = false)
      case IsNull(a: AttributeReference) =>
        upd(a)((c0, _) => c0.copy(nullOnly = true))
      case IsNotNull(a: AttributeReference) =>
        upd(a)((c0, _) => c0.copy(notNull = true))
      case _ => ()
    }
    if (cons.isEmpty) return None
    val kept = relFiles.filter { f =>
      cons.forall { case (c, cc) =>
        val kind = funcs(table.livePartCols.indexOf(c))
        transformDirValue(table, f, c, kind) match {
          case None => true // no segment: keep
          case Some(None) => // the null dir
            cc.nullOnly ||
              (cc.points.isEmpty && cc.lo.isEmpty && cc.hi.isEmpty &&
                !cc.notNull)
          case Some(Some(v)) =>
            !cc.nullOnly &&
              cc.points.forall(_.contains(v)) &&
              cc.lo.forall(DiskTransforms.cmp(v, _) >= 0) &&
              cc.hi.forall(DiskTransforms.cmp(v, _) <= 0)
        }
      }
    }
    if (kept.length < relFiles.length) Some(kept) else None
  }

  /** The hive-dir value of partition column `c` in file path `f`, parsed
    * to the column type's Catalyst internal form (the same representation
    * runtime-filter literals arrive in). None when the path carries no
    * such segment — then the file conservatively survives. */
  private[sources] def dirValue(table: GraftDiskTable, f: String, c: String): Option[Any] = {
    val pre = c.toLowerCase(java.util.Locale.ROOT) + "="
    f.split('/').init.find(_.toLowerCase(java.util.Locale.ROOT).startsWith(pre))
      .map { seg =>
        val raw = java.net.URLDecoder.decode(
          seg.substring(seg.indexOf('=') + 1), "UTF-8")
        if (raw == "__HIVE_DEFAULT_PARTITION__") null
        else table.liveSchema.fields
          .find(_.name.equalsIgnoreCase(c)).get.dataType match {
          case org.apache.spark.sql.types.StringType =>
            org.apache.spark.unsafe.types.UTF8String.fromString(raw)
          case org.apache.spark.sql.types.LongType => raw.toLong
          case org.apache.spark.sql.types.IntegerType => raw.toInt
          case org.apache.spark.sql.types.ShortType => raw.toShort
          case org.apache.spark.sql.types.ByteType => raw.toByte
          case org.apache.spark.sql.types.BooleanType => raw.toBoolean
          case org.apache.spark.sql.types.DateType =>
            java.time.LocalDate.parse(raw).toEpochDay.toInt
          case other => sys.error(
            s"gdisk: unsupported partition key type $other for column $c")
        }
      }
  }

  /** The v2 `bucket` system function SPJ resolution binds a reported
    * `bucket(n, cols...)` transform to. Computes pmod(chained murmur3,
    * seed 42) — identical to the ingest writers' dir assignment, so SQL
    * `pmod(hash(cols), n)`, OPTIMIZE's rewrite and the scan's partition
    * keys all agree. `canonicalName` is what Spark compares across the
    * two join sides to prove co-partitioning. */
  object BucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
    import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, cols...): gdisk hash-bucket id"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length >= 2 &&
        inputType.fields.head.dataType ==
          org.apache.spark.sql.types.IntegerType,
        "bucket(numBuckets int, cols...)")
      val types = inputType.fields.map(_.dataType)
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = types
        override def resultType(): DataType =
          org.apache.spark.sql.types.IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = "gdisk.bucket"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Integer = {
          val n = input.getInt(0)
          var h = 42
          var i = 1
          while (i < types.length) {
            if (!input.isNullAt(i))
              h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
                .hash(input.get(i, types(i)), types(i), h).toInt
            i += 1
          }
          ((h % n) + n) % n
        }
      }
    }
  }

  /** Copy-on-write group id = the data FILE a row lives in. Rewrites
    * replace only the affected files (runtime group filtering narrows the
    * scan to them), the Iceberg-shaped granularity a parquet table needs
    * at scale. */
  val FileColumnName = "_file"

  /** Connector-expression → catalyst conversion for the metadata-DELETE
    * proof, over the closed shape set [[negateForStats]] can complement
    * and [[DiskStats.mayMatch]] understands: comparisons, IN of literals,
    * IS [NOT] NULL, AND/OR. NULL literals refuse (they make the condition
    * NULL-capable regardless of column null counts). None = fall back. */
  private[sources] def v2PredToCatalyst(
      e: org.apache.spark.sql.connector.expressions.Expression,
      schema: StructType)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    def attr(r: NamedReference): Option[AttributeReference] =
      if (r.fieldNames().length != 1) None
      else schema.fields.find(_.name.equalsIgnoreCase(r.fieldNames()(0)))
        .map(f => AttributeReference(f.name, f.dataType, f.nullable)())
    e match {
      case r: NamedReference => attr(r)
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        if (l.value == null) None else Some(Literal(l.value, l.dataType))
      case p: Predicate =>
        val kids = p.children()
        def k(i: Int) = v2PredToCatalyst(kids(i), schema)
        def bin(f: (Expression, Expression) => Expression) =
          for (a <- k(0); b <- k(1)) yield f(a, b)
        p.name() match {
          case "AND" => bin(And)
          case "OR" => bin(Or)
          case "=" => bin(EqualTo)
          case "<" => bin(LessThan)
          case "<=" => bin(LessThanOrEqual)
          case ">" => bin(GreaterThan)
          case ">=" => bin(GreaterThanOrEqual)
          case "IN" =>
            for {
              a <- k(0)
              vs <- kids.toSeq.drop(1)
                .foldLeft(Option(Seq.empty[Expression]))((acc, c) =>
                  acc.flatMap(s => v2PredToCatalyst(c, schema).map(s :+ _)))
            } yield In(a, vs)
          case "IS_NULL" => k(0).map(IsNull)
          case "IS_NOT_NULL" => k(0).map(IsNotNull)
          case "NOT" => k(0).map(Not)
          case "<>" | "!=" => bin((a, b) => Not(EqualTo(a, b)))
          case "<=>" => bin(EqualNullSafe)
          case _ => None
        }
      // scalar arithmetic inside a predicate (`o_orderkey % 5 = 2`): the
      // stats prover treats these shapes conservatively (never proves
      // no-match/all-match), but the DELETION-VECTOR path needs the
      // catalyst form to run the matched-row harvest — without it a
      // modulo delete silently falls back to a full copy-on-write
      case g: org.apache.spark.sql.connector.expressions.GeneralScalarExpression =>
        val kids = g.children()
        def k(i: Int) = v2PredToCatalyst(kids(i), schema)
        def bin(f: (Expression, Expression) => Expression) =
          for (a <- k(0); b <- k(1)) yield f(a, b)
        (g.name(), kids.length) match {
          case ("+", 2) => bin(Add(_, _))
          case ("-", 2) => bin(Subtract(_, _))
          case ("-", 1) => k(0).map(UnaryMinus(_))
          case ("*", 2) => bin(Multiply(_, _))
          case ("/", 2) => bin(Divide(_, _))
          case ("%", 2) => bin(Remainder(_, _))
          case ("ABS", 1) => k(0).map(Abs(_))
          case _ => None
        }
      case _ => None
    }
  }

  /** The complement of a condition over NON-NULL inputs, expressed in
    * shapes [[DiskStats.mayMatch]] evaluates (it has no Not case — the
    * negation is pushed to the leaves). Only valid paired with a per-file
    * null-free check on the referenced columns: for two-valued rows,
    * `!mayMatch(negated)` proves every row satisfies the original. */
  private[sources] def negateForStats(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions._
    def ne(a: Expression, l: Expression) = Or(LessThan(a, l), GreaterThan(a, l))
    e match {
      case And(l, r) =>
        for (a <- negateForStats(l); b <- negateForStats(r)) yield Or(a, b)
      case Or(l, r) =>
        for (a <- negateForStats(l); b <- negateForStats(r)) yield And(a, b)
      case EqualTo(a: AttributeReference, l: Literal) if l.value != null =>
        Some(ne(a, l))
      case EqualTo(l: Literal, a: AttributeReference) if l.value != null =>
        Some(ne(a, l))
      case LessThan(a: AttributeReference, l: Literal) if l.value != null =>
        Some(GreaterThanOrEqual(a, l))
      case LessThan(l: Literal, a: AttributeReference) if l.value != null =>
        Some(LessThanOrEqual(a, l))
      case LessThanOrEqual(a: AttributeReference, l: Literal) if l.value != null =>
        Some(GreaterThan(a, l))
      case LessThanOrEqual(l: Literal, a: AttributeReference) if l.value != null =>
        Some(LessThan(a, l))
      case GreaterThan(a: AttributeReference, l: Literal) if l.value != null =>
        Some(LessThanOrEqual(a, l))
      case GreaterThan(l: Literal, a: AttributeReference) if l.value != null =>
        Some(GreaterThanOrEqual(a, l))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) if l.value != null =>
        Some(LessThan(a, l))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) if l.value != null =>
        Some(GreaterThan(a, l))
      case In(a: AttributeReference, vs)
          if vs.forall { case l: Literal => l.value != null; case _ => false } =>
        Some(vs.map(v => ne(a, v): Expression).reduceOption(And)
          .getOrElse(Literal(true)))
      case IsNull(a: AttributeReference) => Some(IsNotNull(a))
      case IsNotNull(a: AttributeReference) => Some(IsNull(a))
      case _ => None
    }
  }

  /** Writer-side bloom-index arguments for a manifest: the declared
    * columns (identity-partition columns excluded — their values live in
    * dir names and prune exactly already) plus per-file sizing. */
  private[sources] def bloomArgsFor(m: DiskManifest): (Seq[String], Long, Double) = {
    val idParts = m.hiveParts
    // declaration validates against LOGICAL names; sidecars are file-level
    // artifacts, so the resolved list carries PHYSICAL names (immutable
    // across RENAME — existing sidecars stay valid)
    val cols = DiskBloom.spec(m.properties, m.schema)
      .filterNot(c => idParts.exists(_.equalsIgnoreCase(c)))
      .map(m.physicalOf)
    (cols, DiskBloom.expectedItems(m.properties), DiskBloom.fpp(m.properties))
  }

  object FileColumn extends MetadataColumn {
    override def name(): String = FileColumnName
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.StringType
    override def isNullable: Boolean = false
    override def comment(): String =
      "copy-on-write group id (the parquet data file holding the row)"
  }

  val PosColumnName = "_pos"

  /** The row's position within its data file (the parquet readers' own
    * row-index generation — split- and row-group-skip-safe). Together
    * with `_file` it is the STABLE ROW ID the merge-on-read delta write
    * path keys deletion-vector updates on. */
  object PosColumn extends MetadataColumn {
    override def name(): String = PosColumnName
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.LongType
    override def isNullable: Boolean = false
    override def comment(): String =
      "row position within its data file (merge-on-read row id)"
  }

  /** Live catalog instances by name (the front door's VACUUM reaches the
    * plugin here; Spark's CatalogManager holds it privately). */
  private val instances = TrieMap.empty[String, GraftDiskCatalog]
  private def register(name: String, c: GraftDiskCatalog): Unit =
    instances.update(name, c)
  private[graft] def instance(name: String): Option[GraftDiskCatalog] =
    instances.get(name)
  /** Every registered gdisk catalog in this JVM — the MV auto-rewrite
    * rule's discovery surface. */
  private[graft] def allInstances: Seq[(String, GraftDiskCatalog)] =
    instances.toSeq

  private[sources] def toStruct(cs: Array[V2Column]): StructType =
    StructType(cs.map(c => StructField(c.name, c.dataType, c.nullable)))
}

/** A column DEFAULT in manifest form: the user's SQL plus the folded
  * literal rendered back to SQL (`Literal.sql` — parse + eval rebuilds the
  * catalyst-internal value on load without a live analyzer). */
case class DiskDefault(sql: String, valueSql: String)

/** Connector-side literal for rebuilt defaults (Spark's own `LiteralValue`
  * is `private[sql]`). `toString` renders parseable SQL because
  * `CatalogV2Util` encodes `getValue.toString` into the struct field's
  * EXISTS_DEFAULT metadata, which the analyzer re-parses. */
case class GraftV2Literal[T](value: T, dataType: DataType)
  extends org.apache.spark.sql.connector.expressions.Literal[T] {
  override def toString: String = CatalystLiteral(value, dataType).sql
  override def describe(): String = toString
}

/** A declared constraint in manifest form. */
case class DiskConstraint(
    kind: String, name: String, sql: Option[String], columns: Seq[String],
    refTable: Seq[String], refColumns: Seq[String]) {
  def toV2: Constraint = kind match {
    case "check" =>
      Constraint.check(name).predicateSql(sql.get).build()
    case "primaryKey" =>
      Constraint.primaryKey(name,
        columns.map(Expressions.column).toArray).build()
    case "unique" =>
      Constraint.unique(name, columns.map(Expressions.column).toArray).build()
    case "foreignKey" =>
      Constraint.foreignKey(name, columns.map(Expressions.column).toArray,
        Identifier.of(refTable.init.toArray, refTable.last),
        refColumns.map(Expressions.column).toArray).build()
  }
}

object DiskConstraint {
  def from(c: Constraint): DiskConstraint = c match {
    case ck: Check =>
      DiskConstraint("check", ck.name(), Some(ck.predicateSql()), Nil, Nil, Nil)
    case pk: PrimaryKey =>
      DiskConstraint("primaryKey", pk.name(), None,
        pk.columns().map(_.fieldNames().mkString(".")).toIndexedSeq, Nil, Nil)
    case u: Unique =>
      DiskConstraint("unique", u.name(), None,
        u.columns().map(_.fieldNames().mkString(".")).toIndexedSeq, Nil, Nil)
    case fk: ForeignKey =>
      DiskConstraint("foreignKey", fk.name(), None,
        fk.columns().map(_.fieldNames().mkString(".")).toIndexedSeq,
        (fk.referencedTable().namespace() :+ fk.referencedTable().name())
          .toIndexedSeq,
        fk.referencedColumns().map(_.fieldNames().mkString(".")).toIndexedSeq)
    case other =>
      sys.error(s"gdisk: unsupported constraint type ${other.getClass.getName}")
  }
}

/** One column's ANALYZE TABLE statistics: `ndv` (exact, or HLL-estimated
  * under COMPUTE APPROXIMATE STATISTICS); `avgLen`/`maxLen` in bytes for
  * string columns (CBO sizes string projections with them). Min/max/null
  * counts are NOT here — those merge per scan from the per-file manifest
  * stats, so they stay exact under partition/stats pruning. */
case class DiskNdv(
    ndv: Long, avgLen: Option[Long] = None, maxLen: Option[Long] = None,
    hist: Option[DiskHistogram] = None)

/** One equi-height histogram bin: values in (lo, hi] (first bin
  * [lo, hi]), `ndv` the approximate distinct count inside the bin —
  * the catalyst `HistogramBin` shape, persisted in the manifest. */
case class DiskBin(lo: Double, hi: Double, ndv: Long)

/** Equi-height value-distribution histogram from ANALYZE TABLE:
  * `height` = non-null rows per bin. Feeds CBO filter-selectivity
  * through `Statistics.columnStats().histogram()`, so a skewed
  * predicate's row estimate follows the DATA, not the uniformity
  * assumption (which a hot key can put off by 10×+). */
case class DiskHistogram(height: Double, bins: Seq[DiskBin])

/** One commit: a COMPLETE snapshot of the table at `version` (schema,
  * defaults, constraints, the data files composing the version) plus the
  * delta (`added`) the streaming source tails and the per-query epoch
  * watermarks that make the streaming sink exactly-once. */
case class DiskManifest(
    version: Long,
    schemaJson: String,
    defaults: Map[String, DiskDefault],
    comments: Map[String, String],
    constraints: Seq[DiskConstraint],
    files: Seq[String],
    added: Seq[String],
    properties: Map[String, String],
    epochs: Map[String, Long],
    partitionCols: Option[Seq[String]] = None,
    fileStats: Option[Map[String, Map[String, ColStats]]] = None,
    // wall-clock commit time (stamped by DiskCommitLog.write) — the
    // resolution target of TIMESTAMP AS OF; None only on manifests
    // written before the field existed (treated as "the unknown past")
    committedAtMs: Option[Long] = None,
    // ANALYZE TABLE's table-level per-column statistics (exact or
    // approximate NDV; avg/max byte length for strings), carried forward
    // by every subsequent commit until the next ANALYZE — stale-but-
    // useful, the same contract as Delta/Iceberg table stats. Keys are
    // column names; dropped/renamed columns simply stop matching until
    // re-analyzed.
    analyzeStats: Option[Map[String, DiskNdv]] = None,
    // Some(n) = `partitionCols` are HASH-BUCKET columns (PARTITIONED BY
    // (bucket(n, cols...))): files group under `__bucket=<id>/` dirs with
    // id = pmod(hash(cols...), n) (Spark's chained murmur3, seed 42) and
    // the columns stay IN the data files — unlike identity hive layout,
    // where values live in `col=value/` paths only
    numBuckets: Option[Int] = None,
    // COLUMN MAPPING (Delta's rename-without-rewrite): logical name →
    // the PHYSICAL column name data files actually carry. Absent entry =
    // identity. RENAME COLUMN only updates this map (plus the logical
    // schema); data files, per-file stats keys, and bloom sidecar names
    // all stay keyed by the physical name, so a rename is one metadata
    // commit at any table size. Physical names are immutable for a
    // column's lifetime; ADD COLUMN assigns a fresh unique physical name
    // when the logical name would collide with a historical physical one
    physicalNames: Option[Map[String, String]] = None,
    // Per-partition-column TRANSFORM kinds, aligned with `partitionCols`
    // ("identity", "years", "months", "days", "hours", "truncate:<w>" —
    // see [[DiskTransforms]]). Absent = all identity. A spec with ANY
    // non-identity transform follows the bucket-layout discipline: every
    // column stays IN the data files, `<col>_<kind>=<value>/` dirs are
    // grouping/pruning metadata only, never inferred.
    partFuncs: Option[Seq[String]] = None,
    // Per-file byte sizes, harvested executor-side at write like the
    // skipping stats — so OPTIMIZE's bin-packing and DESCRIBE DETAIL read
    // metadata already in hand instead of issuing O(files) driver-side
    // getFileStatus calls (the 100 TB maintenance path). Files written
    // before the field existed are simply absent (callers fall back to a
    // counted file-status probe for those).
    fileSizes: Option[Map[String, Long]] = None,
    // MERGE-ON-READ deletion vectors: data file → its DV sidecar (see
    // [[DiskDv]]). A file with an entry serves only rows whose parquet
    // row index is NOT set in the sidecar's bitset. Keys are always a
    // subset of `files` (commit paths prune entries when files leave the
    // snapshot; DiskCommitLog.write asserts it). Rides delta records in
    // full (O(DV'd files) JSON — bounded because OPTIMIZE purges).
    deleteVectors: Option[Map[String, DvEntry]] = None,
    // What KIND of commit produced this version ("WRITE", "DELETE",
    // "OPTIMIZE", "RESTORE", ...) — DESCRIBE HISTORY's audit label.
    // Stamped by DiskCommitLog.write from its required argument, so a
    // commit path cannot accidentally inherit its base's label; absent
    // only on manifests written before the field existed.
    operation: Option[String] = None) {
  lazy val schema: StructType =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]

  /** Partition columns (identity hive-layout, bucket, or transform
    * source columns). */
  def partCols: Seq[String] = partitionCols.getOrElse(Nil)

  /** Per-column transform kinds, aligned with [[partCols]] (identity
    * when unspecified). */
  def funcs: Seq[String] =
    partFuncs.getOrElse(partCols.map(_ => DiskTransforms.Identity))

  /** True when any partition column carries a non-identity transform
    * (days/months/years/hours/truncate) — then the table follows the
    * bucket-layout discipline (all columns in files, dirs never
    * inferred). */
  def hasTransforms: Boolean = funcs.exists(!DiskTransforms.isIdentity(_))

  /** Partition columns encoded in hive `col=value/` paths and STRIPPED
    * from data files — empty for bucket and transform layouts, whose
    * columns stay in the files (`__bucket=<id>/` / `<col>_<kind>=<v>/`
    * dirs are grouping only, never inferred; no reader may set
    * `basePath` on such tables). */
  def hiveParts: Seq[String] =
    if (numBuckets.isEmpty && !hasTransforms) partCols else Nil

  /** Per-file column stats for manifest-level skipping (absent for files
    * written before stats existed — those are simply never skipped).
    * KEYED BY PHYSICAL column name — what the files actually carry. */
  def stats: Map[String, Map[String, ColStats]] = fileStats.getOrElse(Map.empty)

  /** Per-file byte sizes (empty for pre-field manifests). */
  def sizes: Map[String, Long] = fileSizes.getOrElse(Map.empty)

  /** Per-file deletion vectors (empty = every file serves all rows). */
  def dvs: Map[String, DvEntry] = deleteVectors.getOrElse(Map.empty)

  /** `dvs` restricted to live files — what a manifest built from this one
    * with `files = live` must carry. */
  def dvsAmong(live: Iterable[String]): Option[Map[String, DvEntry]] = {
    val m = dvs
    if (m.isEmpty) None
    else {
      val kept = live.iterator.filter(m.contains).map(f => f -> m(f)).toMap
      if (kept.isEmpty) None else Some(kept)
    }
  }

  /** The physical (in-file) name of a logical column. Identity unless a
    * RENAME created a mapping entry. */
  def physicalOf(logical: String): String =
    physicalNames.flatMap(_.get(logical)).getOrElse(logical)

  /** Logical name of a physical column (reverse mapping; identity when
    * unmapped). */
  def logicalOf(physical: String): String =
    physicalNames.flatMap(_.collectFirst {
      case (l, p) if p == physical => l
    }).getOrElse(physical)

  /** `schema` with every field renamed to its physical name — the schema
    * data files are read and written with. Positionally identical to the
    * logical schema. */
  lazy val physicalSchema: StructType =
    if (physicalNames.forall(_.isEmpty)) schema
    else StructType(schema.fields.map(f => f.copy(name = physicalOf(f.name))))

  /** Rename a pruned/logical struct's fields to physical (positions and
    * types untouched; names not in the table schema — `_file`,
    * `__bucket` — pass through). */
  def toPhysical(s: StructType): StructType =
    if (physicalNames.forall(_.isEmpty)) s
    else StructType(s.fields.map(f => f.copy(name = physicalOf(f.name))))

  def columns: Array[V2Column] = schema.fields.map { f =>
    val default = defaults.get(f.name).map { d =>
      val value = CatalystSqlParser.parseExpression(d.valueSql) match {
        case l: CatalystLiteral if l.dataType == f.dataType => l.value
        case e => org.apache.spark.sql.catalyst.expressions.Cast(
          e, f.dataType, None,
          org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY).eval()
      }
      new ColumnDefaultValue(d.sql, GraftV2Literal(value, f.dataType))
    }.orNull
    V2Column.create(f.name, f.dataType, f.nullable,
      comments.get(f.name).orNull, default, null)
  }
}

/** One commit's record in DELTA form (`d<N>.json`): everything a manifest
  * carries EXCEPT the O(files) bulk — the file list and per-file stats
  * reconstruct from the previous version plus `removed`/`addedFiles`.
  * `full` is the exactness fallback: a commit whose state is not an
  * add/remove of its base (RESTORE's arbitrary re-serve, DROP COLUMN's
  * stats strip) embeds the complete manifest instead, detected by a
  * self-verifying reconstruct-and-compare at write time. */
case class DiskDeltaRecord(
    meta: DiskManifest, // files = Nil, fileStats = None, fileSizes = None
    removed: Seq[String],
    addedFiles: Seq[String],
    addedStats: Map[String, Map[String, ColStats]],
    full: Option[DiskManifest] = None,
    addedSizes: Map[String, Long] = Map.empty)

/** The `_graft_log/` directory: periodic FULL manifests (`v<N>.json` —
  * checkpoints, every `commitlog.checkpointInterval`-th version, default
  * 20) with DELTA records (`d<N>.json`) between them, claimed atomically
  * for optimistic concurrency. Without deltas every commit rewrites the
  * whole file inventory — O(files) JSON per commit, O(files²) cumulative
  * for a streaming sink landing one commit per epoch; with them a commit
  * costs O(changed files) and reads reconstruct through at most one
  * checkpoint interval of deltas (memoized in a driver-side cache —
  * manifests are immutable, so the cache can never go stale). The
  * record KIND is a pure function of the version number, so two racing
  * committers always contend on the SAME file name and rename-exclusivity
  * keeps the claim safe cross-process.
  *
  * A claim writes the FULL content to a temp file first and renames it
  * into place under a JVM-wide per-table lock, so in-process racers
  * serialize on the claim (lost races surface as clean conflicts, never
  * lost updates) and readers never observe a half-written manifest;
  * cross-process readers additionally tolerate a mid-rename window by
  * falling back to the newest PARSEABLE version. */
class DiskCommitLog(val tableDir: HPath, conf: Configuration) {
  import org.json4s._
  import org.json4s.jackson.Serialization

  private implicit val fmts: Formats = DefaultFormats
  private[sources] val fs = tableDir.getFileSystem(conf)
  private def logDir = new HPath(tableDir, GraftDiskCatalog.LogDirName)
  def dataDir: HPath = new HPath(tableDir, GraftDiskCatalog.DataDirName)
  private def manifestPath(v: Long) = new HPath(logDir, f"v$v%020d.json")
  private def deltaPath(v: Long) = new HPath(logDir, f"d$v%020d.json")
  private def horizonPath = new HPath(logDir, "_horizon")
  private def cacheKey = tableDir.toUri.getPath

  def latestVersion(): Long =
    fs.listStatus(logDir).iterator
      .map(_.getPath.getName).filter(_.matches("[vd]\\d+\\.json"))
      .map(n => n.drop(1).stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)

  /** VACUUM's floor: versions below it are gone for USERS even when their
    * records are physically retained as reconstruction-chain links. */
  private[sources] def horizon(): Long =
    try {
      val in = fs.open(horizonPath)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    } catch { case _: Exception => 0L }

  private def tryRead(v: Long): Option[DiskManifest] =
    try {
      DiskCommitLog.recordReads.incrementAndGet()
      val in = fs.open(manifestPath(v))
      try Some(Serialization.read[DiskManifest](new java.io.InputStreamReader(
        in, java.nio.charset.StandardCharsets.UTF_8)))
      finally in.close()
    } catch { case _: Exception => None }

  private def tryReadDelta(v: Long): Option[DiskDeltaRecord] =
    try {
      DiskCommitLog.recordReads.incrementAndGet()
      val in = fs.open(deltaPath(v))
      try Some(Serialization.read[DiskDeltaRecord](new java.io.InputStreamReader(
        in, java.nio.charset.StandardCharsets.UTF_8)))
      finally in.close()
    } catch { case _: Exception => None }

  /** Resolve version `v` to its full manifest: checkpoint directly, delta
    * by reconstructing over the previous version (≤ one checkpoint
    * interval of recursion, memoized). None = missing or mid-rename. */
  private def tryResolve(v: Long): Option[DiskManifest] =
    DiskCommitLog.cachedManifest(cacheKey, v).orElse {
      val m: Option[DiskManifest] =
        if (fs.exists(manifestPath(v))) tryRead(v)
        else if (fs.exists(deltaPath(v))) tryReadDelta(v).flatMap { d =>
          d.full.orElse(tryResolve(v - 1).map { prev =>
            val rm = d.removed.toSet
            d.meta.copy(
              files = prev.files.filterNot(rm) ++ d.addedFiles,
              fileStats = Some((prev.stats -- d.removed) ++ d.addedStats),
              fileSizes =
                if (prev.fileSizes.isEmpty && d.addedSizes.isEmpty) None
                else Some((prev.sizes -- d.removed) ++ d.addedSizes))
          })
        }
        else None
      m.foreach(DiskCommitLog.cacheManifest(cacheKey, v, _))
      m
    }

  def latest(): DiskManifest = {
    // newest version that RESOLVES: a concurrent committer's claim may be
    // mid-rename for an instant — its predecessor is the consistent view
    val vs = versions().reverse
    require(vs.nonEmpty, s"gdisk: no commits under $logDir")
    vs.iterator.flatMap(v => tryResolve(v)).nextOption().getOrElse {
      Thread.sleep(100) // every retained manifest mid-write: settle once
      versions().reverse.iterator.flatMap(v => tryResolve(v)).nextOption()
        .getOrElse(sys.error(s"gdisk: no readable manifest under $logDir"))
    }
  }

  def read(v: Long): DiskManifest = {
    val present = fs.exists(manifestPath(v)) || fs.exists(deltaPath(v))
    if (v < horizon() || !present) {
      val latest = latestVersion()
      throw new IllegalArgumentException(
        if (v >= 0 && v <= latest)
          s"gdisk: version $v of $tableDir was removed by VACUUM"
        else s"gdisk: no version $v of $tableDir (latest: $latest)")
    }
    var attempts = 0
    var out: Option[DiskManifest] = tryResolve(v)
    while (out.isEmpty && attempts < 20) { // mid-rename window
      Thread.sleep(50); attempts += 1; out = tryResolve(v)
    }
    out.getOrElse(sys.error(s"gdisk: manifest v$v of $tableDir unreadable"))
  }

  def commitInitial(m: DiskManifest, operation: String = "CREATE TABLE"): Unit = {
    fs.mkdirs(logDir)
    fs.mkdirs(dataDir)
    write(m, operation)
    // every v0 lands here (CREATE, staged CTAS, CONVERT adopt): stamp the
    // per-JVM creation record the transaction rollback attributes drops by
    GraftDiskCatalog.recordJvmCreation(tableDir.toUri.getPath)
  }

  /** Claim version `m.version`; throws an IOException on a lost race
    * (caller may re-read and retry). Content lands complete-then-visible:
    * full temp write, then rename under the JVM claim lock. Checkpoint
    * versions write the full manifest; the rest write delta records
    * (self-verified — an inexpressible state embeds the full manifest
    * inside the delta file, keeping the name deterministic per version). */
  def write(m: DiskManifest, operation: String): Unit = {
    // commit-path invariant: a DV entry may only reference a live file
    // (every construction site prunes on file removal; catching a missed
    // one here turns a silent wrong-read into a loud commit failure)
    if (m.dvs.nonEmpty) {
      val live = m.files.toSet
      val orphan = m.dvs.keysIterator.filterNot(live).toSeq
      require(orphan.isEmpty,
        s"gdisk: deletion-vector entries for non-live file(s) " +
          s"${orphan.take(3).mkString(", ")} — commit path failed to prune")
    }
    val lock = DiskCommitLog.claimLock(tableDir.toUri.getPath)
    lock.synchronized {
      if (fs.exists(manifestPath(m.version)) || fs.exists(deltaPath(m.version)))
        throw new java.io.IOException(
          s"gdisk: version ${m.version} already claimed under $logDir")
      // operation stamped HERE (required argument, not caller-copied), so
      // a manifest built via base.copy can never inherit a stale label
      val stamped = m.copy(committedAtMs = Some(System.currentTimeMillis()),
        operation = Some(operation))
      val prev = if (m.version == 0) None else tryResolve(m.version - 1)
      // interval from the PREVIOUS manifest, so two racers for the same
      // version number (same immutable base) always pick the same name
      val interval = prev
        .flatMap(_.properties.get(GraftDiskCatalog.CheckpointIntervalProp))
        .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ >= 1)
        .getOrElse(GraftDiskCatalog.DefaultCheckpointInterval)
      val checkpoint =
        m.version == 0 || prev.isEmpty || m.version % interval == 0
      val (target, payload) =
        if (checkpoint) (manifestPath(m.version), Serialization.write(stamped))
        else {
          val p = prev.get
          val newSet = stamped.files.toSet
          val rm = p.files.filterNot(newSet)
          val prevSet = p.files.toSet
          val add = stamped.files.filterNot(prevSet)
          val addSet = add.toSet
          val addStats = stamped.stats.view.filterKeys(addSet).toMap
          val addSizes = stamped.sizes.view.filterKeys(addSet).toMap
          val meta = stamped.copy(files = Nil, fileStats = None,
            fileSizes = None)
          // the recon must mirror tryResolve's reconstruction EXACTLY;
          // any state it cannot express embeds the full manifest instead
          val recon = meta.copy(
            files = p.files.filterNot(rm.toSet) ++ add,
            fileStats = Some((p.stats -- rm) ++ addStats),
            fileSizes =
              if (p.fileSizes.isEmpty && addSizes.isEmpty) None
              else Some((p.sizes -- rm) ++ addSizes))
          val rec =
            if (recon == stamped)
              DiskDeltaRecord(meta, rm, add, addStats, addedSizes = addSizes)
            else DiskDeltaRecord(meta, Nil, Nil, Map.empty, Some(stamped))
          (deltaPath(m.version), Serialization.write(rec))
        }
      val tmp = new HPath(logDir,
        s".v${m.version}.tmp-${java.util.UUID.randomUUID}")
      val out = fs.create(tmp, false)
      try out.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!claimInto(tmp, target)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"gdisk: lost the claim race for version ${m.version} under $logDir")
      }
      DiskCommitLog.cacheManifest(cacheKey, stamped.version, stamped)
    }
  }

  /** Atomically claim `target` with the fully-written `tmp` content;
    * false = a racer already holds the version. On LOCAL filesystems
    * POSIX `rename(2)` silently REPLACES an existing target — two
    * processes racing the same version file would both "win" and one
    * commit would silently vanish — so the local claim is a hard-LINK
    * creation instead (atomic create-if-absent; the loser gets a clean
    * FileAlreadyExistsException). HDFS-style filesystems keep the plain
    * rename, whose contract already fails on an existing destination.
    * Either way the target appears complete-then-visible. */
  private def claimInto(tmp: HPath, target: HPath): Boolean =
    if ("file".equalsIgnoreCase(fs.getUri.getScheme)) {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        // carry the ChecksumFileSystem sidecar over (same bytes → same
        // crc); best-effort — a missing crc just skips verification
        try {
          val dir = java.nio.file.Paths.get(target.toUri.getPath).getParent
          val tmpCrc = dir.resolve(s".${tmp.getName}.crc")
          if (java.nio.file.Files.exists(tmpCrc))
            java.nio.file.Files.createLink(
              dir.resolve(s".${target.getName}.crc"), tmpCrc)
        } catch { case _: Exception => () }
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException => fs.rename(tmp, target)
      }
    } else fs.rename(tmp, target)

  /** USER-visible versions retained on disk, ascending — excludes
    * sub-horizon records kept only as reconstruction-chain links (their
    * data files may already be swept; serving them would be wrong). */
  def versions(): Seq[Long] = {
    val hz = horizon()
    fs.listStatus(logDir).iterator
      .map(_.getPath.getName).filter(_.matches("[vd]\\d+\\.json"))
      .map(n => n.drop(1).stripSuffix(".json").toLong)
      .filter(_ >= hz)
      .toSeq.sorted
  }

  /** All data files on disk, as data-dir-relative paths (recursive —
    * partitioned tables nest `col=value/` dirs). */
  def listDataFiles(): Seq[String] = {
    if (!fs.exists(dataDir)) return Nil
    val base = dataDir.toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(dataDir, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet"))
        out += p.toUri.getPath.stripPrefix(base).stripPrefix("/")
    }
    out.result()
  }

  /** Drop manifests below the newest `retain` and delete data files no
    * retained manifest references. */
  def vacuum(retain: Int): Unit = {
    require(retain >= 1, "gdisk: VACUUM must retain at least 1 version")
    val vs = versions()
    val (_, keepSuffix) = vs.splitAt(math.max(0, vs.length - retain))
    // TAGS pin history: the horizon never crosses the oldest tagged
    // version, so a `VERSION AS OF 'tag'` read stays serviceable for as
    // long as the tag lives (DROP TAG + VACUUM reclaims it)
    val tagged = GraftDiskCatalog.parseTags(latest().properties).values
    val hz0 = keepSuffix.headOption.getOrElse(return)
    val hz = (tagged ++ Seq(hz0)).min
    val keep = vs.filter(_ >= hz)
    // materialize the kept manifests BEFORE the horizon moves (read
    // refuses sub-horizon versions)
    val referenced = keep.flatMap(v => read(v).files).toSet
    // the oldest kept version may be a delta: its reconstruction chain
    // back to the nearest checkpoint must survive as chain-only records
    // (invisible to versions(), unreadable through read() — the horizon
    // marker enforces the user contract)
    var anchor = hz
    while (anchor > 0 && !fs.exists(manifestPath(anchor))) anchor -= 1
    val out = fs.create(horizonPath, true)
    try out.write(hz.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // drop every record below the chain anchor (older chain links from
    // previous vacuums included — the unfiltered listing sees them)
    fs.listStatus(logDir).iterator
      .map(_.getPath.getName).filter(_.matches("[vd]\\d+\\.json"))
      .filter(n => n.drop(1).stripSuffix(".json").toLong < anchor)
      .foreach(n => fs.delete(new HPath(logDir, n), false))
    // bloom sidecars of unreferenced data files go with them (sidecars
    // are keyed by data-file rel; immutable otherwise)
    val bloomDir = new HPath(dataDir, DiskBloom.DirName)
    val deadSidecars: Seq[String] =
      if (!fs.exists(bloomDir)) Nil
      else fs.listStatus(bloomDir).toSeq.flatMap { st =>
        DiskBloom.relOfSidecar(st.getPath.getName).collect {
          case rel if !referenced.contains(rel) =>
            s"${DiskBloom.DirName}/${st.getPath.getName}"
        }
      }
    // DV sidecars referenced by any retained manifest must survive (a
    // time-travel read subtracts THAT version's deletes); the rest sweep
    val liveDvs = keep.flatMap(v => read(v).dvs.values.map(_.dv)).toSet
    val deadDvs = DiskDv.listSidecars(fs, dataDir).filterNot(liveDvs)
    deleteBatch(listDataFiles().filterNot(referenced) ++ deadSidecars ++
      deadDvs)
    if (fs.exists(bloomDir)) DiskBloom.invalidateUnder(bloomDir)
  }

  /** Delete data-dir-relative files. At corpus scale the per-file delete
    * RPCs dominate VACUUM, so a large set fans out as ONE Spark job
    * (the same executor-side pattern as the stats harvest); the driver
    * loop remains for small sets and for Spark-free metadata tooling. */
  private def deleteBatch(rels: Seq[String]): Unit = {
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    if (rels.length >= 256 && active.isDefined) {
      val dd = dataDir.toString
      active.get.sparkContext
        .parallelize(rels, math.max(1, math.min(rels.length / 64 + 1, 64)))
        .foreachPartition { it =>
          val c = new Configuration()
          val base = new HPath(dd)
          val f = base.getFileSystem(c)
          it.foreach(rel => f.delete(new HPath(base, rel), false))
        }
    } else rels.foreach(rel => fs.delete(new HPath(dataDir, rel), false))
  }

  /** Time-based retention (`VACUUM ... RETAIN n HOURS`): keep every
    * version committed at or after `cutoffMs` (always at least the
    * newest). Commit stamps are monotonic per table, so this reduces to
    * a count-based vacuum of the newest k. */
  def vacuumOlderThan(cutoffMs: Long): Unit = {
    val vs = versions()
    val k = vs.count(v => read(v).committedAtMs.exists(_ >= cutoffMs))
    vacuum(math.max(1, k))
  }

  def absolute(fileName: String): String =
    new HPath(dataDir, fileName).toString
}

object DiskCommitLog {
  /** Log-record reads (checkpoint or delta files opened) since JVM start
    * — the structural evidence for the "reconstruction reads ≤ one
    * checkpoint interval of records" claim (`ManifestScaleSpec` asserts
    * the COUNT, not just a wall-clock bound). */
  private[sources] val recordReads =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** JVM-wide per-table claim monitors: in-process committers serialize
    * on the manifest claim, making the optimistic protocol lossless for
    * the single-driver case (cross-process stays best-effort-documented). */
  private val locks = TrieMap.empty[String, Object]
  private[sources] def claimLock(tablePath: String): Object =
    locks.getOrElseUpdate(tablePath, new Object)

  /** Resolved-manifest memo keyed by (table path, version). Committed
    * records are IMMUTABLE (VACUUM deletes, never rewrites), so entries
    * can never go stale; true LRU eviction keeps hot delta chains
    * resident (a clear-all here forced whole-chain re-reads on every
    * overflow, which showed up as optimizer-time metadata stalls). */
  private val ManifestCacheMax = 1024
  private val manifests = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long), DiskManifest](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), DiskManifest]): Boolean =
        size() > ManifestCacheMax
    })
  private[sources] def cachedManifest(
      key: String, v: Long): Option[DiskManifest] =
    Option(manifests.get((key, v)))
  private[sources] def cacheManifest(
      key: String, v: Long, m: DiskManifest): Unit =
    manifests.put((key, v), m)
}

/** One parquet-backed table (possibly pinned to a `VERSION AS OF`
  * snapshot). See [[GraftDiskCatalog]] for the architecture. */
class GraftDiskTable(
    tableName: String,
    val log: DiskCommitLog,
    loaded: DiskManifest,
    pinned: Option[Long])
  extends Table with SupportsRead with SupportsWrite
  with SupportsRowLevelOperations with SupportsMetadataColumns
  with SupportsDeleteV2 {

  import GraftDiskCatalog._

  override def name(): String = tableName
  override def version(): String = loaded.version.toString
  override def schema(): StructType = loaded.schema
  private[sources] lazy val bloomArgs = GraftDiskCatalog.bloomArgsFor(loaded)
  override def columns(): Array[V2Column] = loaded.columns
  override def constraints(): Array[Constraint] =
    loaded.constraints.map(_.toV2).toArray
  override def properties(): util.Map[String, String] =
    loaded.properties.asJava
  override def partitioning(): Array[Transform] =
    loaded.numBuckets match {
      case Some(n) =>
        Array(Expressions.bucket(n, loaded.partCols: _*): Transform)
      case None =>
        loaded.partCols.zip(loaded.funcs)
          .map { case (c, k) => DiskTransforms.toV2(c, k) }.toArray
    }

  /** Copy-on-write groups are data FILES: the `_file` metadata column
    * carries each row's file, runtime group filtering narrows the rewrite
    * scan to the affected files, and commit replaces exactly those. */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(GraftDiskCatalog.FileColumn, GraftDiskCatalog.PosColumn)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC,
      // MERGE ... WITH SCHEMA EVOLUTION: source-only columns become
      // metadata-only ADD COLUMNs (Spark drives it through alterTable)
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  private def spark: SparkSession = SparkSession.active

  private def absFiles(m: DiskManifest): Seq[String] =
    m.files.map(log.absolute)

  /** Inner Spark parquet FileTable over an explicit file list — vectorized
    * scan, native pushdown/pruning. For partitioned tables, `basePath`
    * makes Spark infer the hive-layout partition columns from the file
    * paths, which turns partition-column predicates into PartitionFilters
    * (files outside matching dirs are never opened). Planned driver-side
    * per query. */
  private[sources] def innerTable(files: Seq[String]): ParquetTable = {
    val opts =
      if (loaded.hiveParts.isEmpty) CaseInsensitiveStringMap.empty()
      else new CaseInsensitiveStringMap(
        util.Map.of("basePath", log.dataDir.toString))
    // the delegated scan runs in PHYSICAL names end to end; the wrapping
    // GraftDiskScan re-labels readSchema back to logical (rows are
    // positional, so no data movement is involved)
    ParquetTable(tableName, spark, opts, files,
      Some(loaded.physicalSchema), classOf[ParquetFileFormat])
  }

  /** [[innerTable]] whose data schema additionally carries Spark's
    * row-index request column (`_tmp_metadata_row_index`): the parquet
    * readers (vectorized and parquet-mr, DSv2 factory included) populate
    * it with each row's TRUE index within its file — correct under file
    * splits and row-group skipping, which a wrapper-side counter is not.
    * The deletion-vector read path plans DV'd files through this table
    * and subtracts rows whose index is set in the sidecar bitset. */
  private[sources] def innerTableRI(files: Seq[String]): ParquetTable = {
    val opts =
      if (loaded.hiveParts.isEmpty) CaseInsensitiveStringMap.empty()
      else new CaseInsensitiveStringMap(
        util.Map.of("basePath", log.dataDir.toString))
    ParquetTable(tableName, spark, opts, files,
      Some(loaded.physicalSchema.add(GraftDiskCatalog.RowIndexField)),
      classOf[ParquetFileFormat])
  }

  /** This table version's deletion vectors (time travel reads the pinned
    * manifest's, so DV subtraction is version-consistent). */
  private[sources] def liveDvs: Map[String, DvEntry] = loaded.dvs

  /** The manifest this table instance serves (the pinned one under time
    * travel). */
  private[sources] def loadedManifest: DiskManifest = loaded

  /** Sidecar bytes for the given files' DV entries (the CDC change-feed
    * and maintenance-read paths, which ship bytes in closures; the scan
    * path ships sidecar PATHS and never calls this). Served through the
    * process-wide LRU keyed on the immutable sidecar name, so repeated
    * plans over an unchanged trickle-upsert table re-read nothing. */
  private[sources] def dvBytesFor(
      l: DiskCommitLog, m: DiskManifest, files: Seq[String])
      : Map[String, Array[Byte]] = {
    val dvs = m.dvs
    files.iterator.flatMap(f => dvs.get(f).map(e =>
      f -> DvSidecarCache.get(l.fs, l.dataDir, e.dv))).toMap
  }

  /** Translate a logical-named struct/expression into the physical names
    * the inner parquet scan and the manifest stats are keyed by. */
  private[sources] def toPhysical(s: StructType): StructType =
    loaded.toPhysical(s)
  private[sources] def physicalOf(c: String): String = loaded.physicalOf(c)
  private[sources] def logicalOf(c: String): String = loaded.logicalOf(c)
  private[sources] def toPhysicalExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    if (loaded.physicalNames.forall(_.isEmpty)) e
    else e.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        a.withName(loaded.physicalOf(a.name))
    }
  private[sources] def toLogicalSchema(s: StructType): StructType =
    if (loaded.physicalNames.forall(_.isEmpty)) s
    else StructType(s.fields.map(f => f.copy(name = loaded.logicalOf(f.name))))
  private[sources] def toLogicalExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    if (loaded.physicalNames.forall(_.isEmpty)) e
    else e.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        a.withName(loaded.logicalOf(a.name))
    }

  // ---------------------------------------------------------------- read
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDiskScanBuilder(this, loaded.files, options)

  /** This table version's per-file skipping stats (time travel reads the
    * pinned manifest's, so skipping is version-consistent). */
  private[sources] def manifestStats: Map[String, Map[String, ColStats]] =
    loaded.stats

  /** This table version's partition columns (scan-side SPJ grouping
    * reads the pinned manifest's). */
  private[sources] def livePartCols: Seq[String] = loaded.partCols

  /** Identity hive-layout partition columns (empty for bucket layout). */
  private[sources] def liveHiveParts: Seq[String] = loaded.hiveParts

  /** Table-level ANALYZE statistics (empty until ANALYZE TABLE runs). */
  private[graft] def liveAnalyzeStats: Map[String, DiskNdv] =
    loaded.analyzeStats.getOrElse(Map.empty)

  /** Commit `stats` as a metadata-only version (files unchanged): the
    * ANALYZE TABLE landing. Retries the optimistic claim on lost races —
    * a concurrent data commit just re-bases the stats onto its snapshot
    * (stats describe the analyzed scan; going slightly stale against a
    * racer's rows is the normal ANALYZE contract). */
  private[graft] def commitAnalyzeStats(stats: Map[String, DiskNdv]): Long = {
    var attempts = 0
    while (true) {
      val base = log.latest()
      val next = base.copy(version = base.version + 1, added = Nil,
        analyzeStats = Some(stats))
      try { log.write(next, "ANALYZE"); return next.version }
      catch {
        case e: java.io.IOException if attempts < 5 =>
          attempts += 1; Thread.sleep(50L * attempts)
      }
    }
    -1L // unreachable
  }

  private[graft] def isPartitioned: Boolean = loaded.partCols.nonEmpty

  /** The snapshot this table instance serves (conflict-detection specs
    * model a second driver whose scan read an older version). */
  private[graft] def liveFiles: Seq[String] = loaded.files
  private[graft] def liveSchemaJson: String = loaded.schemaJson

  /** Commit a table property as a metadata-only version (files
    * unchanged) with optimistic retries — the MV freshness hint lands
    * through here AFTER its MERGE commit, so the hint can only ever
    * UNDER-state how fresh the MV is (a crash between the two commits
    * leaves a stale hint, and the auto-rewrite rule conservatively
    * declines; correctness never depends on the hint being current). */
  private[graft] def commitProperty(key: String, value: String): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      val base = log.latest()
      val next = base.copy(version = base.version + 1, added = Nil,
        properties = base.properties + (key -> value))
      try { log.write(next, "SET TBLPROPERTIES"); done = true }
      catch {
        case e: java.io.IOException =>
          attempts += 1
          if (attempts > 5) throw new IllegalStateException(
            s"gdisk: concurrent commit conflict on $tableName", e)
          Thread.sleep(20L * attempts)
      }
    }
  }

  /** DESCRIBE DETAIL's one-row inventory: pure manifest arithmetic —
    * byte sizes were harvested executor-side at write, so the verb costs
    * O(manifest) driver CPU, no Spark job, and no per-file status sweep
    * (the counted fallback covers only files from pre-`fileSizes`
    * manifests). */
  private[graft] def detail: (String, String, Long, Option[Long], Long,
      Long, Option[Long], Seq[String], Option[Int], Map[String, String],
      Long, Long) = {
    lazy val fs = log.dataDir.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf())
    val manifestSizes = loaded.sizes
    val bytes = loaded.files.iterator.map { f =>
      manifestSizes.getOrElse(f, {
        GraftDiskCatalog.driverFileStatCalls.incrementAndGet()
        try fs.getFileStatus(new HPath(log.dataDir, f)).getLen
        catch { case _: Exception => 0L }
      })
    }.sum
    val (nFiles, rows) = convertSummary
    ("parquet", log.tableDir.toString, loaded.version, loaded.committedAtMs,
      nFiles, bytes, rows, loaded.partCols, loaded.numBuckets,
      loaded.properties,
      loaded.dvs.size.toLong, loaded.dvs.values.iterator.map(_.card).sum)
  }

  /** (file count, exact LIVE row count if every file has stats) — the
    * CONVERT verb's summary, pure manifest arithmetic (deletion-vector
    * cardinalities subtract, so the number is what a scan returns). */
  private[graft] def convertSummary: (Long, Option[Long]) = {
    val per = loaded.files.map(f =>
      loaded.stats.get(f).flatMap(_.values.headOption).map(_.rows))
    val dvCard = loaded.dvs.values.iterator.map(_.card).sum
    (loaded.files.length.toLong,
      if (per.nonEmpty && per.forall(_.isDefined))
        Some(per.flatten.sum - dvCard)
      else None)
  }

  /** Manifest-served partition inventory for `SHOW PARTITIONS`: one row
    * per partition dir (hive `col=value` segments, or `__bucket=<id>` for
    * bucketed layouts) with its file count and exact row count (None when
    * any file in the dir predates stats harvesting). Pure driver-side
    * manifest arithmetic — no file listing, no Spark job. */
  private[graft] def partitionSummary: Seq[(String, Long, Option[Long])] = {
    val stats = manifestStats
    // display form: undo the writer's %xx path escaping on each
    // `col=value` segment so values read as the user wrote them
    def display(dir: String): String = dir.split('/').map { seg =>
      val eq = seg.indexOf('=')
      if (eq < 0) seg
      else seg.substring(0, eq + 1) +
        java.net.URLDecoder.decode(seg.substring(eq + 1), "UTF-8")
    }.mkString("/")
    loaded.files.groupBy(f => display(f.split('/').init.mkString("/"))).toSeq
      .sortBy(_._1)
      .map { case (dir, fs) =>
        val rows = fs.map(f =>
          stats.get(f).flatMap(_.values.headOption).map(_.rows))
        (dir, fs.length.toLong,
          if (rows.forall(_.isDefined)) Some(rows.flatten.sum) else None)
      }
  }

  private[sources] def liveNumBuckets: Option[Int] = loaded.numBuckets

  /** Per-partition-column transform kinds (aligned with livePartCols). */
  private[sources] def liveFuncs: Seq[String] = loaded.funcs

  private[sources] def liveSchema: StructType = loaded.schema

  override def toString: String = s"GraftDiskTable($tableName)"

  /** Land a staged CTAS/RTAS snapshot: constraints enforce distributed
    * against the STAGED schema/content, then the manifest claim makes the
    * whole table (create) or the full replacement (replace, as version
    * latest+1 atop the existing log — prior snapshots stay
    * time-travelable) visible atomically. `loaded` must be the staged
    * version-0 manifest. */
  private[sources] def commitStagedSnapshot(
      newFiles: Seq[String],
      newStats: Map[String, Map[String, ColStats]],
      replaceExisting: Boolean,
      newSizes: Map[String, Long] = Map.empty): Unit = {
    enforceKeysDistributed(loaded, newFiles, existingFiles = Nil)
    enforceFkChildDistributed(loaded, newFiles, existingFiles = Nil)
    if (replaceExisting) {
      // other tables' FKs into this one must still resolve against the
      // REPLACEMENT content (read with the staged schema)
      enforceFkRestrictDistributed(newFiles, asManifest = Some(loaded))
      var attempts = 0
      var committed = false
      while (!committed) {
        val base = log.latest()
        try {
          log.write(loaded.copy(version = base.version + 1,
            files = newFiles, added = newFiles,
            fileStats = Some(newStats), fileSizes = Some(newSizes)),
            "REPLACE TABLE AS SELECT")
          committed = true
        } catch {
          case e: java.io.IOException =>
            attempts += 1
            if (attempts > 5) throw new IllegalStateException(
              s"gdisk: concurrent commit conflict replacing $tableName", e)
        }
      }
    } else {
      log.commitInitial(loaded.copy(
        files = newFiles, added = newFiles, fileStats = Some(newStats),
        fileSizes = Some(newSizes)), "CREATE TABLE AS SELECT")
    }
  }

  // --------------------------------------------------------------- write
  private[sources] def writeConfMap(): Map[String, String] = {
    val hc = spark.sessionState.newHadoopConf()
    val sqlc = spark.sessionState.conf
    // the keys ParquetWriteSupport.init asserts on (the normal write path
    // sets them in ParquetUtils.prepareWrite; we are our own write path)
    hc.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlc.getConf(SQLConf.PARQUET_WRITE_LEGACY_FORMAT).toString)
    hc.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlc.getConf(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE).toString)
    hc.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlc.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString)
    hc.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlc.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    hc.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    hc.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    hc.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
  }

  /** Cluster rows by the partition columns on the way in, so each task
    * writes few partition dirs (the fanout writer stays narrow) — and
    * CLUSTERED INGEST: a table with declared clustering (TBLPROPERTIES
    * ('zorder'='c1,c2')) orders every write by those columns, so the
    * manifest's per-file min/max skip from the FIRST ingest instead of
    * waiting for an OPTIMIZE rewrite. Unpartitioned tables get an
    * ORDERED distribution (Spark range-partitions the write → DISJOINT
    * per-file ranges); identity-partitioned tables keep the partition
    * clustering and sort within tasks (tight ranges per file, plus
    * sorted parquet row groups). Bucketed tables are untouched (their
    * layout is the hash). Cluster columns missing from the write schema
    * disable the ordering rather than failing the INSERT. */
  private trait PartitionClustered extends RequiresDistributionAndOrdering {
    private def clusterCols: Seq[String] =
      if (loaded.numBuckets.isDefined) Nil
      else {
        val declared = loaded.properties.get("zorder").toSeq
          .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
        val resolved = declared.flatMap(c =>
          loaded.schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.name))
        if (resolved.length == declared.length) resolved else Nil
      }
    private def orders(cols: Seq[String])
        : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
      cols.map(c => Expressions.sort(Expressions.column(c),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING,
        org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_FIRST)
          : org.apache.spark.sql.connector.expressions.SortOrder).toArray
    override def requiredDistribution()
        : org.apache.spark.sql.connector.distributions.Distribution =
      if (loaded.partCols.nonEmpty)
        org.apache.spark.sql.connector.distributions.Distributions.clustered(
          loaded.partCols.map(c =>
            Expressions.column(c)
              : org.apache.spark.sql.connector.expressions.Expression).toArray)
      else if (clusterCols.nonEmpty)
        org.apache.spark.sql.connector.distributions.Distributions.ordered(
          orders(clusterCols))
      else
        org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    override def requiredOrdering()
        : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
      val cc = clusterCols
      if (cc.isEmpty) Array.empty
      else orders(
        (if (loaded.numBuckets.isEmpty) loaded.partCols else Nil) ++ cc)
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate
      with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite
      with org.apache.spark.sql.connector.write.SupportsOverwriteV2 {
      private var doTruncate = false
      private var dynamicParts = false
      private var overwriteWhere
          : Option[Array[org.apache.spark.sql.connector.expressions.filter.Predicate]] = None
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      /** Hive dynamic-partition-overwrite: replace exactly the partition
        * dirs the incoming rows land in, keep every other dir — the
        * idempotent daily-reload primitive at 100 TB (re-running a day's
        * job replaces that day, touches nothing else). */
      override def overwriteDynamicPartitions(): WriteBuilder = {
        dynamicParts = true; this
      }
      /** Static overwrite (INSERT OVERWRITE ... PARTITION (c=v), or
        * DataFrame overwrite(condition)): delete-by-predicate + append in
        * ONE commit. Predicates must pin identity partition dirs (=/IN on
        * partition columns) so whole files drop from the manifest — row-
        * level static overwrite would silently rewrite the table and is
        * rejected instead (use MERGE/UPDATE for row surgery). */
      override def overwrite(
          predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
          : WriteBuilder = {
        if (predicates.forall(_.name() == "ALWAYS_TRUE")) doTruncate = true
        else overwriteWhere = Some(predicates)
        this
      }
      override def build(): Write = new Write with PartitionClustered {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              pwi: PhysicalWriteInfo): DataWriterFactory =
            new GraftDiskWriterFactory(info.schema(), schema(),
              log.dataDir.toString, writeConfMap(), loaded.partCols,
                loaded.numBuckets, loaded.funcs, bloomArgs._1, bloomArgs._2, bloomArgs._3,
                loaded.physicalNames.getOrElse(Map.empty))
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val files = collectFiles(messages)
            val dropOf: Option[DiskManifest => Set[String]] =
              if (dynamicParts) Some(m => dynamicOverwriteDrop(m, files))
              else overwriteWhere.map(ps => m => staticOverwriteDrop(m, ps))
            commitFiles(files, doTruncate,
              newStats = collectStats(messages), dropOf = dropOf,
              newSizes = collectSizes(messages))
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit =
            deleteFiles(collectFiles(messages))
        }

        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
            override def createStreamingWriterFactory(
                pwi: PhysicalWriteInfo)
                : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
              new GraftDiskWriterFactory(info.schema(), schema(),
                log.dataDir.toString, writeConfMap(), loaded.partCols,
                loaded.numBuckets, loaded.funcs, bloomArgs._1, bloomArgs._2, bloomArgs._3,
                loaded.physicalNames.getOrElse(Map.empty))
            override def commit(
                epochId: Long, messages: Array[WriterCommitMessage]): Unit =
              commitEpochFiles(info.queryId(), epochId, collectFiles(messages),
                collectStats(messages), collectSizes(messages))
            override def abort(
                epochId: Long, messages: Array[WriterCommitMessage]): Unit =
              deleteFiles(collectFiles(messages))
          }
      }
    }

  private def collectFiles(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.iterator.flatMap {
      case DiskFilesCommit(fs, _, _) => fs
      case _ => Iterator.empty
    }.toVector

  private def collectStats(messages: Array[WriterCommitMessage])
      : Map[String, Map[String, ColStats]] =
    messages.iterator.flatMap {
      case DiskFilesCommit(_, st, _) => st
      case _ => Iterator.empty
    }.toMap

  private def collectSizes(messages: Array[WriterCommitMessage])
      : Map[String, Long] =
    messages.iterator.flatMap {
      case DiskFilesCommit(_, _, sz) => sz
      case _ => Iterator.empty
    }.toMap

  /** DISTRIBUTED stats + size harvest for maintenance rewrites — the
    * same one-job pattern CONVERT uses. OPTIMIZE is precisely the verb
    * that touches the most files at 100 TB; the driver must move file
    * NAMES only, never read footers one-by-one (the round-7 version did,
    * and it was the tier's one remaining driver-side scale-killer).
    * Returns (per-file skipping stats, per-file byte sizes). */
  private def statsFor(
      files: Seq[String], fileSchema: StructType)
      : (Map[String, Map[String, ColStats]], Map[String, Long]) = {
    if (files.isEmpty) return (Map.empty, Map.empty)
    val dataDirStr = log.dataDir.toString
    val schemaJsonStr = fileSchema.json
    val harvested: Array[(String, Map[String, ColStats], Long)] =
      spark.sparkContext
        .parallelize(files, math.max(1, math.min(files.size, 64)))
        .map { rel =>
          val c = new Configuration()
          val p = new HPath(dataDirStr, rel)
          val sch = DataType.fromJson(schemaJsonStr).asInstanceOf[StructType]
          (rel, DiskStats.footerStats(p, c, sch),
            p.getFileSystem(c).getFileStatus(p).getLen)
        }
        .collect() // O(files) metadata triples — DriverActionLint-bounded
    (harvested.map(h => h._1 -> h._2).toMap,
      harvested.map(h => h._1 -> h._3).toMap)
  }

  /** File schema = table schema minus hive-encoded partition columns
    * (bucket columns stay in the files, so nothing is stripped there).
    * PHYSICAL names — this schema reads/keys what files actually carry. */
  private def dataFileSchema(m: DiskManifest): StructType =
    StructType(m.physicalSchema.fields
      .filterNot(f => m.hiveParts.exists(_.equalsIgnoreCase(f.name))))

  private def deleteFiles(files: Seq[String]): Unit = {
    val fs = log.dataDir.getFileSystem(
      spark.sessionState.newHadoopConf())
    files.foreach(f => fs.delete(new HPath(log.dataDir, f), false))
  }

  /** Dynamic-partition-overwrite drop set: every existing file in a
    * partition dir the incoming files write into. Bucket layout is
    * rejected — `__bucket=` dirs group by hash, not by partition value,
    * so "replace the dirs new rows land in" would delete unrelated keys
    * that happen to share a bucket. */
  private def dynamicOverwriteDrop(
      m: DiskManifest, newFiles: Seq[String]): Set[String] = {
    require(m.numBuckets.isEmpty,
      s"gdisk: dynamic partition overwrite is not defined for hash-bucketed " +
        s"$tableName — buckets group by hash, not partition value " +
        "(use MERGE, or DELETE + INSERT)")
    def dirOf(f: String) = f.split('/').init.mkString("/")
    val newDirs = newFiles.map(dirOf).toSet
    m.files.filter(f => newDirs.contains(dirOf(f))).toSet
  }

  /** Static-overwrite drop set: the delete predicate must resolve ENTIRELY
    * over identity partition columns (what Spark emits for INSERT
    * OVERWRITE ... PARTITION (c=v) — including the null-safe-equality
    * expansion), because then each file's hive dir values decide the whole
    * file exactly. A file drops when the conjunction evaluates true on its
    * dir values. Any reference to a data column, or an expression shape
    * the evaluator doesn't know, is rejected — row-level static overwrite
    * would lose rows (use MERGE/UPDATE/DELETE instead). */
  private def staticOverwriteDrop(
      m: DiskManifest,
      preds: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Set[String] = {
    import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Literal => V2Lit, NamedReference}
    import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Pred}
    require(m.hiveParts.nonEmpty,
      s"gdisk: static INSERT OVERWRITE with predicates needs an identity-" +
        s"partitioned table ($tableName has no partition dirs to pin)")
    def reject(p: V2Expr): Nothing = throw new IllegalArgumentException(
      s"gdisk: static INSERT OVERWRITE on $tableName supports only " +
        s"predicates over partition columns (${m.hiveParts.mkString(", ")}); " +
        s"got ${p.describe()} — use MERGE/UPDATE/DELETE for row-level surgery")
    // value of a leaf on file f: Some(dir value / literal), None = unknown
    def leaf(e: V2Expr, f: String): Any = e match {
      case l: V2Lit[_] => l.value
      case r: NamedReference =>
        val c = r.fieldNames().mkString(".")
        if (!m.hiveParts.exists(_.equalsIgnoreCase(c))) reject(e)
        GraftDiskCatalog.dirValue(this, f, c).getOrElse(reject(e))
      case other => reject(other)
    }
    def eval(p: V2Pred, f: String): Boolean = p.name() match {
      case "ALWAYS_TRUE" => true
      case "ALWAYS_FALSE" => false
      case "AND" => p.children().forall {
        case c: V2Pred => eval(c, f); case other => reject(other) }
      case "OR" => p.children().exists {
        case c: V2Pred => eval(c, f); case other => reject(other) }
      case "NOT" => p.children().head match {
        case c: V2Pred => !eval(c, f); case other => reject(other) }
      case "IS_NULL" => leaf(p.children().head, f) == null
      case "IS_NOT_NULL" => leaf(p.children().head, f) != null
      case "=" =>
        val Array(a, b) = p.children().map(leaf(_, f))
        a != null && b != null && a == b
      case "<=>" =>
        val Array(a, b) = p.children().map(leaf(_, f))
        (a == null && b == null) || (a != null && a == b)
      case "IN" =>
        val vs = p.children().map(leaf(_, f))
        vs.head != null && vs.tail.exists(v => v != null && v == vs.head)
      case _ => reject(p)
    }
    m.files.filter(f => preds.forall(eval(_, f))).toSet
  }

  /** Append (or replace, for truncate/overwrite/COW) `newFiles` as the
    * next version. PK/UNIQUE run as distributed jobs BEFORE the manifest
    * is claimed; a lost append race re-reads the new base and retries
    * (constraints — and `dropOf`'s drop set — are re-derived against it). */
  private def commitFiles(
      newFiles: Seq[String], truncate: Boolean,
      epochUpdate: Option[(String, Long)] = None,
      newStats: Map[String, Map[String, ColStats]] = Map.empty,
      dropOf: Option[DiskManifest => Set[String]] = None,
      newSizes: Map[String, Long] = Map.empty): Unit = synchronized {
    require(pinned.isEmpty,
      s"gdisk: $tableName is a VERSION AS OF snapshot — snapshots are read-only")
    var attempts = 0
    var committed = false
    while (!committed) {
      val base = log.latest()
      val dropped: Set[String] =
        if (truncate) base.files.toSet
        else dropOf.fold(Set.empty[String])(f => f(base))
      val opLabel =
        if (truncate) "TRUNCATE"
        else if (dropOf.isDefined) "INSERT OVERWRITE"
        else if (epochUpdate.isDefined) "STREAMING WRITE"
        else "WRITE"
      val kept =
        if (dropped.isEmpty) base.files else base.files.filterNot(dropped)
      enforceKeysDistributed(base, newFiles, existingFiles = kept)
      enforceFkChildDistributed(base, newFiles, existingFiles = kept)
      if (dropped.nonEmpty) enforceFkRestrictDistributed(kept ++ newFiles)
      val next = base.copy(
        version = base.version + 1,
        files = kept ++ newFiles,
        added = newFiles,
        epochs = epochUpdate.fold(base.epochs) { case (q, e) =>
          base.epochs + (q -> e) },
        fileStats = Some(
          (if (truncate) Map.empty[String, Map[String, ColStats]]
           else base.stats -- dropped) ++ newStats),
        fileSizes = Some(
          (if (truncate) Map.empty[String, Long]
           else base.sizes -- dropped) ++ newSizes),
        deleteVectors =
          if (truncate) None else base.dvsAmong(kept))
      try {
        log.write(next, opLabel)
        committed = true
      } catch {
        case e: java.io.IOException =>
          attempts += 1
          if (truncate || attempts > 5) throw new IllegalStateException(
            s"gdisk: concurrent commit conflict on $tableName", e)
      }
    }
  }

  private def commitEpochFiles(
      queryId: String, epochId: Long, newFiles: Seq[String],
      newStats: Map[String, Map[String, ColStats]] = Map.empty,
      newSizes: Map[String, Long] = Map.empty): Unit =
    synchronized {
      // idempotent by (query id, epoch): a post-restart replay re-delivers
      // the same epoch — drop its files instead of double-appending
      if (log.latest().epochs.get(queryId).exists(_ >= epochId))
        deleteFiles(newFiles)
      else commitFiles(newFiles, truncate = false,
        epochUpdate = Some(queryId -> epochId), newStats = newStats,
        newSizes = newSizes)
    }

  /** PRIMARY KEY / UNIQUE on ingest, the 100 TB shape: one Spark job per
    * declared key — nulls-in-PK count over the appended files, then a
    * groupBy-count(>1) over (existing ∪ appended) key columns. The driver
    * sees one number per check, never rows. */
  private def enforceKeysDistributed(
      base: DiskManifest, newFiles: Seq[String],
      existingFiles: Seq[String]): Unit = {
    val keys = base.constraints.filter(c =>
      c.kind == "primaryKey" || c.kind == "unique")
    if (keys.isEmpty || newFiles.isEmpty) return
    val schema = base.schema
    def readFiles(fs: Seq[String]) =
      if (fs.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else readTable(log, base, fs)
    val appended = readFiles(newFiles)
    val existing =
      if (existingFiles.isEmpty) None else Some(readFiles(existingFiles))
    for (k <- keys) {
      val keyCols = k.columns.map(col)
      if (k.kind == "primaryKey") {
        val nulls = appended
          .filter(keyCols.map(_.isNull).reduce(_ || _)).limit(1).count()
        if (nulls > 0) throw new IllegalStateException(
          s"gdisk: PRIMARY KEY ${k.name} on $tableName rejects NULL in key " +
            s"(${k.columns.mkString(", ")})")
      }
      val all = existing.fold(appended.select(keyCols: _*))(
        _.select(keyCols: _*).unionAll(appended.select(keyCols: _*)))
      val dup = all.na.drop("any")
        .groupBy(keyCols: _*).count()
        .filter(col("count") > 1).limit(1).count()
      if (dup > 0) throw new IllegalStateException(
        s"gdisk: ${if (k.kind == "primaryKey") "PRIMARY KEY" else "UNIQUE"} " +
          s"constraint ${k.name} violated on $tableName: duplicate key " +
          s"(${k.columns.mkString(", ")})")
    }
  }

  // ------------------------------------------------------- foreign keys
  private def emptyDf(schema: StructType) = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** basePath only for hive layout — a bucketed table's `__bucket=` dirs
    * must never be partition-inferred into the schema. Rows deleted by
    * the manifest's deletion vectors are subtracted (by `_metadata`
    * file path + row index against the sidecar bitsets), so every
    * maintenance read — OPTIMIZE's rewrite, PK/UNIQUE/FK enforcement —
    * sees the table's LIVE rows only. */
  private def readTable(
      l: DiskCommitLog, m: DiskManifest, files: Seq[String]) =
    if (files.isEmpty) emptyDf(m.schema)
    else {
      // files carry PHYSICAL column names; rename back to logical BY NAME
      // (never positionally — the reader appends partition columns at the
      // end regardless of the declared schema order)
      val r = spark.read.schema(m.physicalSchema)
      val raw0 = (if (m.hiveParts.isEmpty) r
                 else r.option("basePath", l.dataDir.toString))
        .parquet(files.map(l.absolute): _*)
      val raw = GraftDiskCatalog.dvSubtract(
        raw0, l.dataDir.toUri.getPath, dvBytesFor(l, m, files))
      if (m.physicalNames.forall(_.isEmpty)) raw
      else raw.select(m.schema.fields.map(f =>
        col(m.physicalOf(f.name)).as(f.name)).toIndexedSeq: _*)
    }

  /** Resolve an FK's parent table within the same warehouse (`REFERENCES`
    * identifiers may carry the catalog name as their first segment). */
  private def fkParentLog(fk: DiskConstraint)
      : Option[(DiskCommitLog, DiskManifest)] = {
    val hc = spark.sessionState.newHadoopConf()
    val root = log.tableDir.getParent.getParent
    val cands = (Seq(fk.refTable) ++
      (if (fk.refTable.length > 2) Seq(fk.refTable.tail) else Nil)).distinct
    cands.iterator.flatMap { rt =>
      if (rt.length < 2) None
      else {
        val dir = new HPath(new HPath(root, rt.init.mkString(".")), rt.last)
        if (dir.getFileSystem(hc).exists(
            new HPath(dir, GraftDiskCatalog.LogDirName))) {
          val l = new DiskCommitLog(dir, hc)
          Some((l, l.latest()))
        } else None
      }
    }.nextOption()
  }

  private def sameTable(l: DiskCommitLog): Boolean =
    l.tableDir.toUri.getPath == log.tableDir.toUri.getPath

  /** Child-side FOREIGN KEY on ingest: one distributed LEFT ANTI probe of
    * the appended files' non-null FK tuples against the parent table's
    * files per declared FK (the referential-ingest price every enforcing
    * engine pays); self-references resolve against the candidate
    * post-commit state. NULL FK values pass (MATCH SIMPLE). */
  private def enforceFkChildDistributed(
      base: DiskManifest, newFiles: Seq[String],
      existingFiles: Seq[String]): Unit = {
    val fks = base.constraints.filter(_.kind == "foreignKey")
    if (fks.isEmpty || newFiles.isEmpty) return
    val appended = readTable(log, base, newFiles)
    for (fk <- fks) {
      val (pl, pm) = fkParentLog(fk).getOrElse(throw new IllegalStateException(
        s"gdisk: FOREIGN KEY ${fk.name} on $tableName references missing " +
          s"table ${fk.refTable.mkString(".")}"))
      val parentKeys =
        (if (sameTable(pl))
          readTable(log, base, existingFiles ++ newFiles)
        else readTable(pl, pm, pm.files))
          .select(fk.refColumns.map(col).toIndexedSeq: _*)
          .toDF(fk.columns: _*)
      val orphans = appended
        .filter(fk.columns.map(col(_).isNotNull).reduce(_ && _))
        .select(fk.columns.map(col).toIndexedSeq: _*).alias("__c")
        .join(parentKeys.alias("__p"),
          fk.columns.map(c => col(s"__c.$c") === col(s"__p.$c")).reduce(_ && _),
          "left_anti")
        .limit(1).count()
      if (orphans > 0) throw new IllegalStateException(
        s"gdisk: FOREIGN KEY ${fk.name} violated on $tableName: " +
          s"(${fk.columns.mkString(", ")}) value not present in " +
          s"${fk.refTable.mkString(".")}(${fk.refColumns.mkString(", ")})")
    }
  }

  /** Parent-side RESTRICT: with this table's rows about to become the
    * content of `newStateFiles`, every other warehouse table's FK rows
    * pointing here must still resolve (one manifest read per table, one
    * anti-join per referencing FK — only on truncating commits). */
  private def enforceFkRestrictDistributed(
      newStateFiles: Seq[String],
      asManifest: Option[DiskManifest] = None): Unit = {
    val hc = spark.sessionState.newHadoopConf()
    val root = log.tableDir.getParent.getParent
    val fs = root.getFileSystem(hc)
    if (!fs.exists(root)) return
    for {
      nsDir <- fs.listStatus(root).toSeq if nsDir.isDirectory
      tDir <- fs.listStatus(nsDir.getPath).toSeq if tDir.isDirectory
      if fs.exists(new HPath(tDir.getPath, GraftDiskCatalog.LogDirName))
      childLog = new DiskCommitLog(tDir.getPath, hc)
      if !sameTable(childLog)
      childM = childLog.latest()
      fk <- childM.constraints if fk.kind == "foreignKey"
      if fkParentLog(fk).exists { case (pl, _) => sameTable(pl) }
    } {
      val parentKeys = readTable(log, asManifest.getOrElse(log.latest()),
        newStateFiles)
        .select(fk.refColumns.map(col).toIndexedSeq: _*)
        .toDF(fk.columns: _*)
      val orphans = readTable(childLog, childM, childM.files)
        .filter(fk.columns.map(col(_).isNotNull).reduce(_ && _))
        .select(fk.columns.map(col).toIndexedSeq: _*).alias("__c")
        .join(parentKeys.alias("__p"),
          fk.columns.map(c => col(s"__c.$c") === col(s"__p.$c")).reduce(_ && _),
          "left_anti")
        .limit(1).count()
      if (orphans > 0) throw new IllegalStateException(
        s"gdisk: FOREIGN KEY ${fk.name} on ${tDir.getPath.getName} RESTRICTs " +
          s"this write to $tableName: child rows still reference removed keys " +
          s"(${fk.refColumns.mkString(", ")})")
    }
  }

  // ---------------------------------------------------------- row-level
  /** MERGE / UPDATE / DELETE — group-based copy-on-write at FILE
    * granularity: Spark joins over this operation's `_file`-tagged scan,
    * runtime group filtering narrows the scan to the files holding
    * matched rows, executors write those groups' full replacement rowset
    * as new parquet files, and commit swaps exactly the served files in
    * the manifest. Rewrite cost scales with touched files, not the table;
    * no rows touch the driver at any point. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        // merge-on-read tables take the DELTA path: deletes/updates write
        // deletion-vector sidecars + appended files instead of rewriting
        // whole touched files
        if (DiskDv.enabled(loaded.properties)) deltaOperation(info)
        else cowOperation(info)
    }

  /** MERGE-ON-READ row-level operations (`'delete.mode'='dv'` tables) via
    * Spark's `SupportsDelta`: the rewrite plan tags each touched row with
    * its STABLE ROW ID — `(_file, _pos)`, the data file and the parquet
    * row index the scan generates — and ships per-row delete/insert ops
    * to the writers (updates split into delete + reinsert, since an
    * updated row moves to a new file). Writers accumulate each file's
    * deleted positions in a bitset (the clustered-by-`_file` write
    * distribution lands one file's deletes in ONE task), union with the
    * file's existing sidecar, and write a NEW sidecar; inserted rows
    * stream through the normal parquet fanout writer. ONE commit lands
    * both: a 1-row UPDATE in a 1 GB file costs one tiny sidecar + a
    * 1-row data file, not a gigabyte rewrite — the at-scale trickle-
    * correction path. Fresh-insert skew note: NOT MATCHED rows carry a
    * NULL `_file`, so on an unpartitioned table all inserts cluster into
    * one task (partitioned tables spread by their partition columns);
    * bulk-insert-heavy MERGEs on unpartitioned tables prefer COW mode. */
  private def deltaOperation(info: RowLevelOperationInfo): RowLevelOperation =
    new RowLevelOperation with org.apache.spark.sql.connector.write.SupportsDelta {
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String =
        s"GraftDiskDeltaRowLevel(${info.command()}, $tableName)"
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new GraftDiskScanBuilder(GraftDiskTable.this, loaded.files, options)
      override def requiredMetadataAttributes()
          : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        Array(Expressions.column(GraftDiskCatalog.FileColumnName),
          Expressions.column(GraftDiskCatalog.PosColumnName))
      override def rowId()
          : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        Array(Expressions.column(GraftDiskCatalog.FileColumnName),
          Expressions.column(GraftDiskCatalog.PosColumnName))
      override def representUpdateAsDeleteAndInsert(): Boolean = true
      override def newWriteBuilder(lwi: LogicalWriteInfo)
          : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
        new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
          override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
            new org.apache.spark.sql.connector.write.DeltaWrite
              with RequiresDistributionAndOrdering {
              // one task owns all of a file's deletes (bitsets merge
              // task-locally); inserts spread by the partition columns
              override def requiredDistribution()
                  : org.apache.spark.sql.connector.distributions.Distribution =
                org.apache.spark.sql.connector.distributions.Distributions
                  .clustered((GraftDiskCatalog.FileColumnName +:
                    loaded.partCols).map(Expressions.column).toArray)
              override def requiredOrdering()
                  : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
                Array.empty
              override def toBatch
                  : org.apache.spark.sql.connector.write.DeltaBatchWrite =
                new org.apache.spark.sql.connector.write.DeltaBatchWrite {
                  override def createBatchWriterFactory(
                      pwi: PhysicalWriteInfo)
                      : org.apache.spark.sql.connector.write.DeltaWriterFactory = {
                    // a pure DELETE's write schema is EMPTY (no insert
                    // rows exist) — the fanout writer only materializes
                    // when rows can actually arrive
                    val innerF =
                      if (lwi.schema().isEmpty) None
                      else Some(new GraftDiskWriterFactory(
                        lwi.schema(), schema(),
                        log.dataDir.toString, writeConfMap(), loaded.partCols,
                        loaded.numBuckets, loaded.funcs, bloomArgs._1,
                        bloomArgs._2, bloomArgs._3,
                        loaded.physicalNames.getOrElse(Map.empty)))
                    val rowIdSch = lwi.rowIdSchema().orElseThrow(() =>
                      new IllegalStateException(
                        "gdisk: delta write without a row-id schema"))
                    GdiskDeltaWriterFactory(innerF,
                      rowIdSch.fieldIndex(GraftDiskCatalog.FileColumnName),
                      rowIdSch.fieldIndex(GraftDiskCatalog.PosColumnName),
                      loaded.dvs.map { case (f, e) => f -> e.dv },
                      log.dataDir.toString,
                      // per-file recorded rows: the writer clamps each
                      // delete's row index against its file's count, so
                      // a corrupt index errors instead of allocating
                      loaded.stats.flatMap { case (f, cs) =>
                        cs.values.headOption.map(f -> _.rows) })
                  }
                  override def commit(messages: Array[WriterCommitMessage]): Unit =
                    commitDeltaRowOps(messages, loaded, info.command().toString)
                  override def abort(messages: Array[WriterCommitMessage]): Unit = {
                    val msgs = messages.collect {
                      case m: GdiskDeltaCommit => m }
                    deleteFiles(msgs.flatMap(_.files.files).toSeq)
                    deleteFiles(msgs.flatMap(_.dvs.values.map(_.dv)).toSeq)
                  }
                }
            }
        }
    }

  /** The delta commit: appended files join the snapshot, touched files'
    * deletion vectors swap to their merged sidecars, and a sidecar that
    * now covers every recorded row collapses its file into a drop.
    * Conflicts: a touched file replaced concurrently, or its DV changed
    * since the snapshot the task-side merges read — either re-runs the
    * statement. Constraint probes run against the CANDIDATE state, so a
    * key-preserving UPDATE does not collide with its own DV'd pre-image
    * and FK RESTRICT sees the post-delete parent set. */
  private def commitDeltaRowOps(
      messages: Array[WriterCommitMessage], snapshot: DiskManifest,
      op: String): Unit =
    synchronized {
      val msgs = messages.collect { case m: GdiskDeltaCommit => m }
      val newFiles = msgs.flatMap(_.files.files).toSeq
      val newStats = msgs.flatMap(_.files.stats).toMap
      val newSizes = msgs.flatMap(_.files.sizes).toMap
      // the clustered distribution gives one task per touched file;
      // merge defensively anyway (two sidecars union driver-side — tiny)
      val dvUpdates = scala.collection.mutable.Map.empty[String, DvEntry]
      msgs.flatMap(_.dvs).foreach { case (f, e) =>
        dvUpdates.get(f) match {
          case None => dvUpdates(f) = e
          case Some(prev) =>
            val a = DiskDv.read(log.fs, log.dataDir, prev.dv)
            a.unionWith(DiskDv.read(log.fs, log.dataDir, e.dv))
            dvUpdates(f) = DvEntry(DiskDv.write(log.fs, log.dataDir, a),
              a.cardinality)
        }
      }
      if (newFiles.isEmpty && dvUpdates.isEmpty) return
      var attempts = 0
      var committed = false
      while (!committed) {
        val base = log.latest()
        val live = base.files.toSet
        val goneTouched = dvUpdates.keysIterator.filterNot(live).toSeq
        if (goneTouched.nonEmpty) throw new IllegalStateException(
          s"gdisk: concurrent commit conflict on $tableName — " +
            s"${goneTouched.size} file(s) this operation's deletes touch " +
            s"were replaced or removed (e.g. ${goneTouched.head}); re-run " +
            "the statement against the current snapshot")
        val dvMoved = dvUpdates.keysIterator.filter(f =>
          base.dvs.get(f) != snapshot.dvs.get(f)).toSeq
        if (dvMoved.nonEmpty) throw new IllegalStateException(
          s"gdisk: concurrent commit conflict on $tableName — the deletion " +
            s"vector of ${dvMoved.head} changed while this operation ran " +
            "(its merge would lose the concurrent deletes); re-run the " +
            "statement against the current snapshot")
        val fullCover = dvUpdates.keysIterator.filter { f =>
          base.stats.get(f).flatMap(_.values.headOption)
            .exists(_.rows == dvUpdates(f).card)
        }.toSet
        val kept = base.files.filterNot(fullCover)
        val nextDvs = (base.dvs -- fullCover) ++ (dvUpdates -- fullCover)
        val candidate = base.copy(
          version = base.version + 1,
          files = kept ++ newFiles,
          added = newFiles,
          fileStats = Some((base.stats -- fullCover) ++ newStats),
          fileSizes = Some((base.sizes -- fullCover) ++ newSizes),
          deleteVectors = if (nextDvs.isEmpty) None else Some(nextDvs))
        enforceKeysDistributed(candidate, newFiles, existingFiles = kept)
        enforceFkChildDistributed(candidate, newFiles, existingFiles = kept)
        enforceFkRestrictDistributed(kept ++ newFiles, Some(candidate))
        try {
          log.write(candidate, op)
          committed = true
        } catch {
          case e: java.io.IOException =>
            attempts += 1
            if (attempts > 5) throw new IllegalStateException(
              s"gdisk: concurrent commit conflict on $tableName", e)
        }
      }
    }

  private def cowOperation(info: RowLevelOperationInfo): RowLevelOperation =
    new RowLevelOperation {
        // the scan instance this operation's rewrite reads — its
        // (runtime-filtered) file set is what commit replaces
        @volatile private var cowScan: GdiskFileScan = null
        override def command(): RowLevelOperation.Command = info.command()
        override def description(): String =
          s"GraftDiskRowLevel(${info.command()}, $tableName)"
        override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
          new GraftDiskScanBuilder(GraftDiskTable.this, loaded.files, options) {
            override def build(): Scan = super.build() match {
              case s: GdiskFileScan => cowScan = s; s
              case other => other
            }
          }
        override def requiredMetadataAttributes()
            : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
          Array(Expressions.column(GraftDiskCatalog.FileColumnName))
        override def newWriteBuilder(lwi: LogicalWriteInfo): WriteBuilder =
          new WriteBuilder {
            override def build(): Write = new Write with PartitionClustered {
              override def toBatch: BatchWrite = new BatchWrite {
                override def createBatchWriterFactory(
                    pwi: PhysicalWriteInfo): DataWriterFactory =
                  new GraftDiskWriterFactory(lwi.schema(), schema(),
                    log.dataDir.toString, writeConfMap(), loaded.partCols,
                loaded.numBuckets, loaded.funcs, bloomArgs._1, bloomArgs._2, bloomArgs._3,
                loaded.physicalNames.getOrElse(Map.empty))
                override def commit(messages: Array[WriterCommitMessage]): Unit = {
                  val removed = Option(cowScan).map(_.servedFiles)
                    .getOrElse(loaded.files)
                  // expectSchemaJson: the rewrite's output was written with
                  // the snapshot's schema — a concurrent column change must
                  // surface as a clean conflict, not a mixed-layout table
                  commitReplace(removed, collectFiles(messages),
                    collectStats(messages), Some(loaded.schemaJson),
                    collectSizes(messages), op = info.command().toString)
                }
                override def abort(messages: Array[WriterCommitMessage]): Unit =
                  deleteFiles(collectFiles(messages))
              }
            }
          }
      }

  /** OPTIMIZE: bin-pack the table's data files into ~`targetFileBytes`
    * outputs — the standing maintenance job for a streaming-ingested
    * table, whose sink lands one small file per epoch per partition. The
    * rewrite is one distributed pass (read all files, repartition to the
    * packed count, write); the driver moves file NAMES only. Returns
    * (filesBefore, filesAfter). Old versions still time-travel until
    * VACUUM drops them.
    *
    * With `zorderBy`, the rewrite CLUSTERS instead of round-robins: each
    * z column is bucketed into equi-depth ranks (approximate percentile
    * boundaries — skew-proof where min/max normalization is not), the
    * ranks Morton-interleave into one z-value, and rows range-partition +
    * sort on it. Every output file (and every row group inside it) then
    * covers a tight box in z-space, so the manifest min/max stats this
    * commit records are narrow on ALL z columns at once — the layout that
    * makes manifest-level skipping bite on multi-column predicates. */
  private[graft] def optimize(
      targetFileBytes: Long = 128L * 1024 * 1024,
      zorderByArg: Seq[String] = Nil,
      whereSql: Option[String] = None,
      purgeDv: Boolean = false): (Int, Int) = synchronized {
    require(pinned.isEmpty,
      s"gdisk: $tableName is a VERSION AS OF snapshot — snapshots are read-only")
    val base = log.latest()
    // no explicit ZORDER BY → fall back to the table's declared clustering
    // (TBLPROPERTIES ('zorder'='c1,c2')), so the standing maintenance job
    // is just `OPTIMIZE t` and keeps the layout the table asked for
    val zorderBy =
      if (zorderByArg.nonEmpty) zorderByArg
      else base.properties.get("zorder").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    if (base.files.isEmpty) return (0, 0)
    // PARTITION-SCOPED maintenance: `OPTIMIZE t WHERE <partition pred>`
    // compacts (or re-clusters) ONLY the matching partition dirs — at
    // 100 TB the standing job targets yesterday's partition, never the
    // table. The predicate is evaluated driver-side against each dir's
    // parsed partition values (metadata only, zero file I/O); it may
    // reference identity partition columns only.
    val scopeDirs: Option[Set[String]] = whereSql.map { w =>
      require(base.hiveParts.nonEmpty || base.hasTransforms,
        "gdisk: OPTIMIZE ... WHERE needs a partitioned table " +
          "(the predicate scopes partition dirs)")
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR, BindReferences, BinaryComparison, Cast => CCast, EvalMode, In => CIn, Literal => CLit}
      val partFields = base.partCols.map(c =>
        base.schema.fields.find(_.name.equalsIgnoreCase(c)).get)
      val attrs = partFields.map(f =>
        AR(f.name, f.dataType, nullable = true)())
      val resolved = spark.sessionState.sqlParser.parseExpression(w)
        .transformUp {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            attrs.find(_.name.equalsIgnoreCase(u.name)).getOrElse(sys.error(
              s"gdisk: OPTIMIZE WHERE may reference only partition columns " +
                s"(${base.partCols.mkString(", ")}), not '${u.name}'"))
        }
      // minimal literal coercion — a '2026-01-01' string against a DATE
      // or TIMESTAMP partition column, an int against BIGINT (timestamp
      // casts need the session zone to evaluate)
      val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
      val coerced = resolved.transformUp {
        case cmp: BinaryComparison =>
          (cmp.left, cmp.right) match {
            case (a: AR, l: CLit) if l.dataType != a.dataType =>
              cmp.withNewChildren(Seq(a,
                CCast(l, a.dataType, tz, EvalMode.LEGACY)))
            case (l: CLit, a: AR) if l.dataType != a.dataType =>
              cmp.withNewChildren(Seq(
                CCast(l, a.dataType, tz, EvalMode.LEGACY), a))
            case _ => cmp
          }
        case in @ CIn(a: AR, elems) if elems.forall(_.isInstanceOf[CLit]) =>
          CIn(a, elems.map {
            case l: CLit if l.dataType != a.dataType =>
              CCast(l, a.dataType, tz, EvalMode.LEGACY)
            case l => l
          })
      }
      def dirOf(f: String) = f.split('/').init.mkString("/")
      if (base.hasTransforms) {
        // TRANSFORM layout: scope = the dirs whose transform-value range
        // INTERSECTS the predicate (the same monotonic-bound logic the
        // scan pruner uses — `OPTIMIZE t WHERE ts < current_date` scopes
        // to the closed days). Compaction preserves rows, so an
        // intersecting boundary dir compacting is semantics-free.
        import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo => CEq, GreaterThan => CGt, GreaterThanOrEqual => CGte, IsNotNull => CNotNull, IsNull => CIsNull, LessThan => CLt, LessThanOrEqual => CLte}
        def split(e: org.apache.spark.sql.catalyst.expressions.Expression)
            : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
          e match {
            case CAnd(l, r) => split(l) ++ split(r)
            case other => Seq(other)
          }
        // fold the coercion casts so the pruner sees plain literals
        val folded = coerced.transformUp {
          case c: CCast if c.child.isInstanceOf[CLit] =>
            CLit.create(c.eval(null), c.dataType)
        }
        val conj = split(folded)
        conj.foreach {
          case CEq(_: AR, _: CLit) | CEq(_: CLit, _: AR) => ()
          case CIn(_: AR, elems) if elems.forall(_.isInstanceOf[CLit]) => ()
          case CGt(_: AR, _: CLit) | CGt(_: CLit, _: AR) => ()
          case CGte(_: AR, _: CLit) | CGte(_: CLit, _: AR) => ()
          case CLt(_: AR, _: CLit) | CLt(_: CLit, _: AR) => ()
          case CLte(_: AR, _: CLit) | CLte(_: CLit, _: AR) => ()
          case CIsNull(_: AR) | CNotNull(_: AR) => ()
          case other => sys.error(
            "gdisk: OPTIMIZE WHERE on a transform layout supports " +
              "=, IN, <, <=, >, >=, IS [NOT] NULL over partition " +
              s"columns; got ${other.sql}")
        }
        val k1 = GraftDiskCatalog.identityKeepFiles(this, base.files, conj)
          .getOrElse(base.files)
        val kept = GraftDiskCatalog.transformKeepFiles(this, k1, conj)
          .getOrElse(k1)
        kept.map(dirOf).toSet
      } else {
        val bound = BindReferences.bindReference(coerced,
          org.apache.spark.sql.catalyst.expressions.AttributeSeq(attrs))
        base.files.map(dirOf).distinct.filter { d =>
          val probe = d + "/x.parquet"
          val vals = base.partCols.map(c =>
            GraftDiskCatalog.dirValue(this, probe, c).orNull)
          bound.eval(new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(vals.toArray)) == true
        }.toSet
      }
    }
    def inScope(f: String): Boolean =
      scopeDirs.forall(_.contains(f.split('/').init.mkString("/")))
    val fs = log.dataDir.getFileSystem(spark.sessionState.newHadoopConf())
    // sidecar BACKFILL for files missing their bloom filters (CONVERT-
    // adopted, written pre-declaration): runs even when compaction is a
    // no-op — `OPTIMIZE t` is the one standing job that makes the whole
    // table bloom-skippable. Sidecars are manifest-external and
    // idempotent, so no commit is needed.
    def backfillBlooms(over: Seq[String]): Unit =
      if (base.properties.contains(DiskBloom.ColumnsProp)) {
        val idParts = base.hiveParts
        val cols = DiskBloom.spec(base.properties, base.schema)
          .filterNot(c => idParts.exists(_.equalsIgnoreCase(c)))
          .map(base.physicalOf) // sidecars key PHYSICAL names
        val missing = over.filter(f => cols.exists(c =>
          !fs.exists(DiskBloom.sidecar(log.dataDir, f, c))))
        if (missing.nonEmpty)
          DiskBloom.rebuild(spark, log.dataDir, missing,
            base.properties, base.physicalSchema, cols)
      }
    if (zorderBy.isEmpty && base.files.length <= 1 && base.dvs.isEmpty) {
      backfillBlooms(base.files)
      return (base.files.length, base.files.length)
    }
    // INCREMENTAL bin-packing: plain OPTIMIZE touches only UNDER-SIZED
    // files — a file already at (or near) target size is left byte-for-
    // byte alone, so the standing maintenance job on a 100 TB table costs
    // O(new small files), not O(table). ZORDER clustering is global by
    // nature and still rewrites everything it's asked to cluster.
    // Sizes come from the MANIFEST (harvested executor-side at write);
    // the per-file driver status probe remains only for files whose
    // manifest predates the field, and is counted so specs can prove the
    // normal path never takes it.
    val manifestSizes = base.sizes
    val sizes = base.files.map(f =>
      f -> manifestSizes.getOrElse(f, {
        GraftDiskCatalog.driverFileStatCalls.incrementAndGet()
        fs.getFileStatus(new HPath(log.dataDir, f)).getLen
      })).toMap
    // WHERE-scoped runs leave out-of-scope files byte-for-byte alone;
    // ZORDER BY under a scope clusters WITHIN the matching partitions.
    // A file carrying a DELETION VECTOR is a rewrite candidate: the
    // rewrite reads it DV-subtracted and the new files carry no DV —
    // OPTIMIZE is the purge that returns the table to the fully-
    // vectorized scan path (Delta's REORG ... PURGE). By default EVERY
    // DV'd file purges; `TBLPROPERTIES ('optimize.dvRatioThreshold'='r')`
    // makes the standing maintenance job purge only files whose deleted
    // fraction reached r (a 1-row DV in a healthy 1 GB file should not
    // cost a nightly gigabyte rewrite at 100 TB) — `OPTIMIZE ... PURGE
    // DELETES` overrides the threshold and clears everything in scope.
    val dvThreshold = base.properties.get("optimize.dvRatioThreshold")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(0.0)
    val scoped = base.files.filter(inScope)
    val outOfScope = base.files.filterNot(inScope)
    def dvd(f: String) = base.dvs.get(f).exists { e =>
      if (purgeDv || dvThreshold <= 0.0) true
      else base.stats.get(f).flatMap(_.values.headOption).map(_.rows) match {
        case Some(rows) if rows > 0 => e.card.toDouble / rows >= dvThreshold
        case _ => true // unknown row count: purge conservatively
      }
    }
    val (rewrite, keep) =
      if (zorderBy.nonEmpty) (scoped, outOfScope)
      else {
        val (rw, kp) = scoped.partition(f =>
          sizes(f) < targetFileBytes || dvd(f))
        (rw, kp ++ outOfScope)
      }
    // compaction of 0/1 files is a no-op — unless that file carries a DV
    // to purge, which makes even a 1-in-1-out rewrite worth the commit
    val purging = rewrite.exists(dvd)
    if (rewrite.isEmpty || (zorderBy.isEmpty && rewrite.length <= 1 &&
        !purging)) {
      backfillBlooms(base.files)
      return (base.files.length, base.files.length)
    }
    val totalBytes = rewrite.iterator.map(sizes).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (zorderBy.isEmpty && nOut >= rewrite.length && !purging) {
      backfillBlooms(base.files)
      return (base.files.length, base.files.length)
    }
    val out = new HPath(log.dataDir,
      s"optimize-${java.util.UUID.randomUUID}").toString
    val df = readTable(log, base, rewrite)
    // partitioned tables keep their hive layout: repartition by the
    // partition columns (plus bin index) and write partitionBy; bucketed
    // tables recompute each row's `__bucket` id with the SAME chained
    // murmur3 the ingest writers use and partitionBy that; transform
    // tables compute one `__seg_<segName>` HELPER column per partition
    // segment (rendered exactly like the ingest writers render dirs) —
    // partitionBy consumes the helpers into the path while every real
    // column stays in the files, and the rename loop below strips the
    // `__seg_` prefix so the final dirs match the ingest layout
    val parts = base.hiveParts
    val bucketize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      base.numBuckets match {
        case Some(n) => d => d.withColumn("__bucket",
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.hash(base.partCols.map(col): _*),
            lit(n)))
        case None if base.hasTransforms => d =>
          base.partCols.zip(base.funcs).foldLeft(d) { case (acc, (c, kind)) =>
            val seg = "__seg_" + DiskTransforms.segName(c, kind)
            val dt = base.schema.fields
              .find(_.name.equalsIgnoreCase(c)).get.dataType
            if (DiskTransforms.isIdentity(kind))
              // cast-to-string matches the ingest writers' raw rendering
              // (ISO dates, plain numerals/booleans)
              acc.withColumn(seg, col(c).cast("string"))
            else dt match {
              case org.apache.spark.sql.types.DateType =>
                val u = org.apache.spark.sql.functions.udf(
                  (days: java.lang.Integer) =>
                    if (days == null) null
                    else DiskTransforms.render(kind, DiskTransforms.apply(
                      kind, org.apache.spark.sql.types.DateType, days)))
                acc.withColumn(seg, u(org.apache.spark.sql.functions.datediff(
                  col(c), org.apache.spark.sql.functions.lit("1970-01-01"))))
              case org.apache.spark.sql.types.TimestampType =>
                val u = org.apache.spark.sql.functions.udf(
                  (micros: java.lang.Long) =>
                    if (micros == null) null
                    else DiskTransforms.render(kind, DiskTransforms.apply(
                      kind, org.apache.spark.sql.types.TimestampType, micros)))
                acc.withColumn(seg, u(org.apache.spark.sql.functions
                  .unix_micros(col(c))))
              case org.apache.spark.sql.types.TimestampNTZType =>
                // NTZ internal micros are wall-clock-as-UTC; the ingest
                // writers render dirs from that RAW value. cast("timestamp")
                // would shift by the session zone and relocate rows into
                // wrong <col>_day= dirs (then transform pruning and the
                // synthesized dir-bound stats silently drop wrong rows) —
                // derive micros from the LocalDateTime without a zone.
                val u = org.apache.spark.sql.functions.udf(
                  (ldt: java.time.LocalDateTime) =>
                    if (ldt == null) null
                    else {
                      val micros =
                        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
                          ldt.getNano / 1000L
                      DiskTransforms.render(kind, DiskTransforms.apply(
                        kind, org.apache.spark.sql.types.TimestampType,
                        Long.box(micros)))
                    })
                acc.withColumn(seg, u(col(c)))
              case org.apache.spark.sql.types.StringType =>
                val u = org.apache.spark.sql.functions.udf(
                  (s: String) =>
                    if (s == null) null
                    else DiskTransforms.render(kind, DiskTransforms.apply(
                      kind, org.apache.spark.sql.types.StringType, s)))
                acc.withColumn(seg, u(col(c)))
              case _ => // integral truncate
                val u = org.apache.spark.sql.functions.udf(
                  (v: java.lang.Long) =>
                    if (v == null) null
                    else DiskTransforms.render(kind, DiskTransforms.apply(
                      kind, org.apache.spark.sql.types.LongType, v)))
                acc.withColumn(seg, u(col(c).cast("long")))
            }
          }
        case None => identity
      }
    val writeParts =
      if (base.numBuckets.isDefined) Seq("__bucket")
      else if (base.hasTransforms)
        base.partCols.zip(base.funcs).map { case (c, k) =>
          "__seg_" + DiskTransforms.segName(c, k) }
      else parts
    // files carry PHYSICAL column names (partition/bucket helpers are
    // never mapped, so this is identity — and a no-op — for them)
    def phys(d: org.apache.spark.sql.DataFrame) =
      if (base.physicalNames.forall(_.isEmpty)) d
      else d.toDF(d.columns.map(c => base.physicalOf(c)).toIndexedSeq: _*)
    if (zorderBy.nonEmpty) {
      val zdf = phys(bucketize(zorderedFrame(df, base, zorderBy, nOut)).drop("__z"))
      if (writeParts.isEmpty) zdf.write.parquet(out)
      else zdf.write.partitionBy(writeParts: _*).parquet(out)
    }
    else if (writeParts.isEmpty) phys(df.repartition(nOut)).write.parquet(out)
    else phys(bucketize(df).repartition(nOut, writeParts.map(col): _*))
      .write.partitionBy(writeParts: _*).parquet(out)
    val outPrefix = new HPath(out).toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(new HPath(out), true)
    val movedB = Vector.newBuilder[String]
    val stamp = s"opt${java.util.UUID.randomUUID.toString.take(8)}"
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet")) {
        val rel0 = p.toUri.getPath.stripPrefix(outPrefix).stripPrefix("/")
        // transform layouts wrote `__seg_<segName>=v/` helper dirs —
        // strip the prefix so the final dirs match the ingest layout
        val rel =
          if (base.hasTransforms)
            rel0.split('/').map(_.stripPrefix("__seg_")).mkString("/")
          else rel0
        val dst = // keep `col=value/` dirs, uniquify the leaf name
          if (rel.contains('/'))
            s"${rel.reverse.dropWhile(_ != '/').reverse}$stamp-${p.getName}"
          else s"$stamp-${p.getName}"
        fs.mkdirs(new HPath(log.dataDir, dst).getParent)
        fs.rename(p, new HPath(log.dataDir, dst))
        movedB += dst
      }
    }
    val moved = movedB.result()
    fs.delete(new HPath(out), true)
    // rebuild bloom sidecars for the rewritten files and backfill any
    // kept file missing its own (one distributed pass; partial filters
    // shuffle as O(sketch) payloads, never rows) — compaction must not
    // cost the table its point-lookup skipping tier
    if (base.properties.contains(DiskBloom.ColumnsProp)) {
      val idParts = base.hiveParts
      val cols = DiskBloom.spec(base.properties, base.schema)
        .filterNot(c => idParts.exists(_.equalsIgnoreCase(c)))
        .map(base.physicalOf) // sidecars key PHYSICAL names
      val backfill = keep.filter(f => cols.exists(c =>
        !fs.exists(DiskBloom.sidecar(log.dataDir, f, c))))
      DiskBloom.rebuild(spark, log.dataDir, moved ++ backfill,
        base.properties, base.physicalSchema, cols)
    }
    // untouched files keep their manifest stats (and bloom sidecars);
    // rewritten files' stats + sizes harvest in ONE distributed job
    val (movedStats, movedSizes) = statsFor(moved, dataFileSchema(base))
    val next = base.copy(version = base.version + 1,
      files = keep ++ moved, added = Nil,
      fileStats = Some(
        base.stats.view.filterKeys(keep.toSet).toMap ++ movedStats),
      fileSizes = Some(
        sizes.view.filterKeys(keep.toSet).toMap ++ movedSizes),
      // rewritten files materialized their deletes (the read above was
      // DV-subtracted); kept files retain theirs
      deleteVectors = base.dvsAmong(keep))
    log.write(next, "OPTIMIZE")
    (base.files.length, keep.length + moved.length)
  }

  /** File-granular change feed over the commit log — the `table_changes`
    * TVF. For every version in [from, to] that ADDED files, emits the
    * added files' rows as `_change_type='insert'` and the files the same
    * commit removed (INSERT OVERWRITE's old snapshot, a copy-on-write
    * rewrite's served groups) as `'delete'` — so a COW UPDATE surfaces as
    * the touched groups' full pre-image deletes + post-image inserts,
    * exactly what the manifest diff proves. A version that only REMOVES
    * files (a COW delete whose touched files had no survivors, TRUNCATE)
    * feeds the removed rows as `'delete'` — distinguishable from
    * reorganizations because OPTIMIZE/rename rewrites always introduce
    * replacement files into the snapshot. Pure-reorganization and
    * metadata versions are silent, matching the streaming source's
    * compaction semantics. Each version's rows are read distributed with
    * THAT version's schema; vacuumed versions error cleanly. */
  private[graft] def changes(from: Long, to: Long): org.apache.spark.sql.DataFrame = {
    // named import: functions._ would shadow this table's `log` member
    import org.apache.spark.sql.functions.lit
    val log = this.log
    require(from >= 0 && to >= from,
      s"gdisk: table_changes range must satisfy 0 <= from <= to, got [$from, $to]")
    val latest = log.latestVersion()
    require(to <= latest,
      s"gdisk: table_changes upper bound $to exceeds latest version $latest")
    def readFiles(m: DiskManifest, files: Seq[String],
        dvAware: Boolean = false,
        keepOnly: Map[String, Array[Byte]] = Map.empty) = {
      // THAT version's physical names, re-labeled BY NAME to its logical
      // schema (the reader appends partition columns at the end)
      val r = spark.read.schema(m.physicalSchema)
      val raw0 = (if (m.hiveParts.isEmpty) r
                 else r.option("basePath", log.dataDir.toString))
        .parquet(files.map(log.absolute): _*)
      val ddPath = log.dataDir.toUri.getPath
      val raw =
        if (keepOnly.nonEmpty) // only the rows a diff bitmap names
          GraftDiskCatalog.dvKeepOnly(raw0, ddPath, keepOnly)
        else if (dvAware) // subtract THAT version's deletion vectors
          GraftDiskCatalog.dvSubtract(raw0, ddPath,
            dvBytesFor(log, m, files))
        else raw0
      if (m.physicalNames.forall(_.isEmpty)) raw
      else raw.select(m.schema.fields.map(f =>
        org.apache.spark.sql.functions.col(m.physicalOf(f.name)).as(f.name))
          .toIndexedSeq: _*)
    }
    val perVersion = log.versions()
      .filter(v => v >= math.max(from, 1) && v <= to)
      .flatMap { v =>
        val m = log.read(v)
        val prev = log.read(v - 1)
        val removed = prev.files.filterNot(m.files.toSet)
        val newFiles = m.files.filterNot(prev.files.toSet)
        // a removed file's pre-image excludes rows its PREVIOUS deletion
        // vector already subtracted — those were reported deleted by the
        // commit that DV'd them, and must not repeat here
        def deletes = readFiles(prev, removed, dvAware = true)
          .withColumn("_change_type", lit("delete"))
          .withColumn("_commit_version", lit(v))
        val fileParts =
          if (m.added.nonEmpty) {
            val ins = readFiles(m, m.added)
              .withColumn("_change_type", lit("insert"))
              .withColumn("_commit_version", lit(v))
            if (removed.isEmpty) Seq(ins) else Seq(ins, deletes)
          } else if (newFiles.isEmpty && removed.nonEmpty) {
            // PURE delete: files left the snapshot and nothing replaced
            // them (a COW rewrite whose touched files had no survivors, or
            // TRUNCATE). Reorganizations can't look like this — OPTIMIZE /
            // rename rewrites always introduce replacement files — so this
            // shape is unambiguously a data deletion and must feed
            // `'delete'` rows (found by the CdcMvSpec tombstone case: a
            // delete-everything commit was silently invisible to CDC).
            Seq(deletes)
          } else Nil // reorganization or metadata-only: CDC-silent
        // DELETION-VECTOR diffs on files retained by this commit: rows
        // newly set in the DV are this commit's deletes (a merge-on-read
        // DELETE); rows cleared (RESTORE to a pre-delete version) revive
        // as inserts. Bitmaps diff driver-side — O(changed sidecars),
        // compressed bytes in hand, never rows.
        val retained = m.files.filter(prev.files.toSet)
        val grew = dvDiffBytes(retained, m, prev)
        val shrank = dvDiffBytes(retained, prev, m)
        val dvParts =
          (if (grew.isEmpty) Nil
           else Seq(readFiles(prev, grew.keys.toSeq, keepOnly = grew)
             .withColumn("_change_type", lit("delete"))
             .withColumn("_commit_version", lit(v)))) ++
          (if (shrank.isEmpty) Nil
           else Seq(readFiles(m, shrank.keys.toSeq, keepOnly = shrank)
             .withColumn("_change_type", lit("insert"))
             .withColumn("_commit_version", lit(v))))
        fileParts ++ dvParts
      }
    if (perVersion.isEmpty) {
      val schema = loaded.schema
        .add("_change_type", org.apache.spark.sql.types.StringType)
        .add("_commit_version", org.apache.spark.sql.types.LongType)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else perVersion.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** TAGS — named immutable refs to versions (Iceberg's tag / Delta's
    * pinned snapshot): `VERSION AS OF 'name'` resolves through the
    * latest manifest's tag map, and VACUUM retains history back to the
    * OLDEST tagged version (the horizon never crosses a tag), so a
    * release-pinned dataset snapshot stays reproducible for as long as
    * its tag lives. Stored as a table property, so tags ride the normal
    * commit protocol (one metadata commit each, visible in history). */
  private[graft] def commitCreateTag(name: String, asOf: Option[Long]): Long =
    synchronized {
      require(pinned.isEmpty,
        s"gdisk: $tableName is a VERSION AS OF snapshot — snapshots are read-only")
      require(name.matches("[A-Za-z][A-Za-z0-9._-]*"),
        s"gdisk: tag name '$name' must match [A-Za-z][A-Za-z0-9._-]*")
      val base = log.latest()
      val tags = GraftDiskCatalog.parseTags(base.properties)
      require(!tags.contains(name),
        s"gdisk: tag '$name' already exists on $tableName " +
          s"(at version ${tags(name)}) — DROP TAG first")
      val v = asOf.getOrElse(base.version)
      require(log.versions().contains(v),
        s"gdisk: cannot tag version $v — not a retained version of $tableName")
      val next = base.copy(version = base.version + 1, added = Nil,
        properties = base.properties +
          (GraftDiskCatalog.TagsProp ->
            GraftDiskCatalog.renderTags(tags + (name -> v))))
      log.write(next, "CREATE TAG")
      next.version
    }

  private[graft] def commitDropTag(name: String): Long = synchronized {
    require(pinned.isEmpty,
      s"gdisk: $tableName is a VERSION AS OF snapshot — snapshots are read-only")
    val base = log.latest()
    val tags = GraftDiskCatalog.parseTags(base.properties)
    require(tags.contains(name),
      s"gdisk: no tag '$name' on $tableName " +
        s"(tags: ${if (tags.isEmpty) "none" else tags.keys.mkString(", ")})")
    val rest = tags - name
    val next = base.copy(version = base.version + 1, added = Nil,
      properties =
        if (rest.isEmpty) base.properties - GraftDiskCatalog.TagsProp
        else base.properties +
          (GraftDiskCatalog.TagsProp -> GraftDiskCatalog.renderTags(rest)))
    log.write(next, "DROP TAG")
    next.version
  }

  private[graft] def liveTags: Map[String, Long] =
    GraftDiskCatalog.parseTags(log.latest().properties)

  /** PARTITION SPEC EVOLUTION (Iceberg's move): replace the table's
    * partition spec in ONE metadata commit — no data rewrite. Old files
    * keep their old dirs and simply always survive new-spec pruning
    * (per-file segment lookup is conservative: no segment → keep); new
    * writes land in the new layout; `OPTIMIZE` migrates lazily by
    * compacting old files into new-spec dirs. Constrained to the
    * all-columns-in-files layout family, where mixing generations is
    * safe by construction: the OLD spec must not be identity hive layout
    * (its files lack the partition column bytes — stripped into dirs),
    * and the NEW spec must contain at least one non-identity transform
    * (or be empty), so `hiveParts` stays empty and no reader ever
    * basePath-infers over mixed dirs. Bucket specs cannot be the target
    * (SPJ key grouping requires every file in a `__bucket=` dir). */
  private[graft] def commitPartitionSpec(
      specs: Seq[(String, String)]): Long = synchronized {
    require(pinned.isEmpty,
      s"gdisk: $tableName is a VERSION AS OF snapshot — snapshots are read-only")
    val base = log.latest()
    require(base.hiveParts.isEmpty,
      s"gdisk: $tableName uses identity hive layout (partition values " +
        "live in paths, not files) — its spec cannot evolve in place; " +
        "CREATE TABLE ... AS SELECT into the new layout instead")
    val kinds = specs.map(_._2)
    require(specs.isEmpty || kinds.exists(!DiskTransforms.isIdentity(_)),
      "gdisk: an evolved spec needs at least one transform " +
        "(days/months/years/hours/truncate) or must be empty — pure " +
        "identity specs would strip columns new files' readers expect")
    val resolved = specs.map { case (c0, kind) =>
      val fld = base.schema.fields.find(_.name.equalsIgnoreCase(c0))
        .getOrElse(sys.error(s"gdisk: partition column $c0 is not a column " +
          s"of $tableName"))
      // identity columns carry the SAME type allowlist as createTable's
      // resolveCol — without it a timestamp/decimal identity column would
      // render divergent dir values between the ingest writers (raw
      // internal form) and OPTIMIZE's cast("string") helper
      if (DiskTransforms.isIdentity(kind)) fld.dataType match {
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.BooleanType |
             org.apache.spark.sql.types.DateType => ()
        case other => sys.error(
          s"gdisk: partition column ${fld.name} has unsupported type $other " +
            "(string / integral / boolean / date)")
      }
      else DiskTransforms.validate(kind, fld.name, fld.dataType)
        .foreach(sys.error(_))
      (fld.name, kind)
    }
    val segs = resolved.map { case (c, k) => DiskTransforms.segName(c, k) }
    require(segs.distinct.length == segs.length,
      s"gdisk: duplicate partition dir segments: ${segs.mkString(", ")}")
    resolved.collect {
      case (c, k) if !DiskTransforms.isIdentity(k) => DiskTransforms.segName(c, k)
    }.foreach { sname =>
      require(!base.schema.fieldNames.exists(_.equalsIgnoreCase(sname)),
        s"gdisk: partition transform dir segment '$sname' collides with a " +
          "table column of the same name")
    }
    val next = base.copy(
      version = base.version + 1,
      added = Nil,
      numBuckets = None,
      partitionCols =
        if (resolved.isEmpty) None else Some(resolved.map(_._1)),
      partFuncs = if (resolved.isEmpty) None else Some(resolved.map(_._2)))
    log.write(next, "SET PARTITION SPEC")
    next.version
  }

  /** The per-version change-file groups the CDC feed is made of —
    * (manifest to read the files WITH, relative files, change type,
    * commit version) for every version in `(fromExcl, toIncl]`. Shared
    * diff logic with [[changes]]: a version that ADDED files feeds its
    * `added` as inserts plus anything it removed as deletes (COW
    * pre-images, overwritten partitions); a PURE removal (metadata
    * DELETE, TRUNCATE) feeds deletes; reorganizations (OPTIMIZE, RENAME
    * rewrites — removals fully replaced by equivalent adds) are
    * CDC-silent. Deleted files read with the PREVIOUS version's manifest
    * (its schema/column mapping is what those bytes carry). */
  /** Per-file bitmaps of rows set in `newer`'s deletion vector but not
    * `older`'s, over the given retained files — the CDC "this commit
    * deleted / this restore revived" diff. Driver-side over compressed
    * sidecar bytes, O(changed sidecars), never rows. */
  private def dvDiffBytes(
      retained: Seq[String], newer: DiskManifest, older: DiskManifest)
      : Map[String, Array[Byte]] =
    retained.iterator.flatMap { f =>
      val nb = newer.dvs.get(f)
      val ob = older.dvs.get(f)
      if (nb == ob || nb.isEmpty) None
      else {
        val newBits = nb.map(e => DiskDv.read(log.fs, log.dataDir, e.dv))
          .getOrElse(new DvBitmap())
        val oldBits = ob.map(e => DiskDv.read(log.fs, log.dataDir, e.dv))
          .getOrElse(new DvBitmap())
        val d = newBits.diff(oldBits)
        if (d.cardinality == 0L) None
        else Some(f -> DiskDv.serialize(d))
      }
    }.toMap

  private[sources] def changeGroups(fromExcl: Long, toIncl: Long)
      : Seq[ChangeGroup] =
    log.versions()
      .filter(v => v > fromExcl && v <= toIncl && v >= 1)
      .flatMap { v =>
        val m = log.read(v)
        val prev = log.read(v - 1)
        val removed = prev.files.filterNot(m.files.toSet)
        val newFiles = m.files.filterNot(prev.files.toSet)
        // pre-images of removed files SUBTRACT their previous deletion
        // vectors (those rows were reported deleted by the DV'ing commit)
        def removedDv: Map[String, Array[Byte]] =
          removed.iterator.flatMap(f => prev.dvs.get(f).map(e =>
            f -> DiskDv.readBytes(log.fs, log.dataDir, e.dv))).toMap
        val fileGroups =
          if (m.added.nonEmpty)
            Seq(ChangeGroup(m, m.added, "insert", v)) ++
              (if (removed.nonEmpty)
                Seq(ChangeGroup(prev, removed, "delete", v, removedDv))
              else Nil)
          else if (newFiles.isEmpty && removed.nonEmpty)
            Seq(ChangeGroup(prev, removed, "delete", v, removedDv))
          else Nil
        val retained = m.files.filter(prev.files.toSet)
        val grew = dvDiffBytes(retained, m, prev)
        val shrank = dvDiffBytes(retained, prev, m)
        fileGroups ++
          (if (grew.isEmpty) Nil
           else Seq(ChangeGroup(prev, grew.keys.toSeq, "delete", v,
             grew, keepOnly = true))) ++
          (if (shrank.isEmpty) Nil
           else Seq(ChangeGroup(m, shrank.keys.toSeq, "insert", v,
             shrank, keepOnly = true)))
      }

  /** Inner parquet FileTable over `files` as MANIFEST `m` describes them
    * (physical schema + hive inference rules of THAT version) — the CDC
    * reader must interpret each version's bytes with its own mapping.
    * With `rowIndex = true` the data schema additionally carries the
    * parquet row-index request column (DV-diff change groups key their
    * bitmap filters on it). */
  private[sources] def innerTableFor(
      m: DiskManifest, files: Seq[String],
      rowIndex: Boolean = false): ParquetTable = {
    val opts =
      if (m.hiveParts.isEmpty) CaseInsensitiveStringMap.empty()
      else new CaseInsensitiveStringMap(
        util.Map.of("basePath", log.dataDir.toString))
    val sch =
      if (rowIndex) m.physicalSchema.add(GraftDiskCatalog.RowIndexField)
      else m.physicalSchema
    ParquetTable(tableName, spark, opts, files.map(log.absolute),
      Some(sch), classOf[ParquetFileFormat])
  }

  /** Range-partition + sort `df` on the Morton interleave of the z
    * columns' equi-depth bucket ranks. Boundaries come from ONE
    * percentile aggregate over the table; each row's rank is the count
    * of boundaries below its value (monotone → order-preserving). NULLs
    * rank below everything (bucket -1 via coalesce), clustering together.
    * Supported: numeric, date, timestamp — the skipping-indexed types
    * minus strings (no percentile surrogate preserves their order). */
  private def zorderedFrame(
      df: org.apache.spark.sql.DataFrame, base: DiskManifest,
      zorderBy: Seq[String], nOut: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val schema = base.schema
    zorderBy.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"gdisk: ZORDER BY column $c not in ${schema.fieldNames.mkString(", ")}")
      require(!base.partCols.exists(_.equalsIgnoreCase(c)),
        s"gdisk: $c is a partition column — already clustered by layout")
    }
    // numeric surrogate preserving order (percentile_approx needs numeric)
    def surrogate(c: String): org.apache.spark.sql.Column = schema(c).dataType match {
      case _: org.apache.spark.sql.types.NumericType => col(c).cast("double")
      case org.apache.spark.sql.types.DateType => unix_date(col(c)).cast("double")
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast("timestamp")).cast("double")
      case other => throw new IllegalArgumentException(
        s"gdisk: ZORDER BY $c: $other is not orderable-numeric " +
          "(numeric, date, timestamp supported)")
    }
    val bits = math.min(8, 63 / math.max(2, zorderBy.length))
    val buckets = 1 << bits
    val probs = typedlit((1 until buckets).map(i => i.toDouble / buckets))
    val boundRow = df.select(zorderBy.map(c =>
      percentile_approx(surrogate(c), probs, lit(10000)).as(c)): _*).head()
    val rankCols = zorderBy.zipWithIndex.map { case (c, j) =>
      val bs = if (boundRow.isNullAt(j)) Seq.empty[Double]
        else boundRow.getSeq[Double](j)
      // strictly-below count = equi-depth rank in [0, buckets); native
      // binary search — the size(filter(array(255 lits), b < x)) HOF form
      // was an interpreted 255-lambda walk per row per z column, and the
      // range-partitioner's sampling pass pays it a second time
      if (bs.isEmpty) lit(0L)
      else coalesce(
        graft.functions.NativeFunctions.count_below(surrogate(c), bs.toArray),
        lit(0L))
    }
    val zcol =
      if (zorderBy.length == 1) rankCols.head
      else graft.ops.LayoutOps.zValueN(rankCols, bits)
    df.withColumn("__z", zcol)
      .repartitionByRange(nOut,
        (base.partCols.map(col) :+ col("__z")): _*)
      .sortWithinPartitions(
        (base.partCols.map(col) :+ col("__z")): _*)
  }

  /** Swap `removed` (the rewrite's served groups) for `added` as the next
    * version; key constraints re-check distributed over (kept ∪ added).
    *
    * Conflict detection (the Delta write-serializable shape): `removed` was
    * derived from the snapshot this operation SCANNED — if a concurrent
    * commit already replaced or dropped any of those files (another COW
    * rewrite, OPTIMIZE, an overwrite), blindly swapping would resurrect the
    * pre-image rows our rewrite copied from them while the concurrent
    * writer's replacement files stay live: duplicated rows and a silently
    * lost update. Likewise a concurrent schema change (ADD/DROP/RENAME
    * COLUMN) invalidates the rewrite's already-written output layout. Both
    * fail CLEANLY here with the table intact — the caller re-runs against
    * the new snapshot. Concurrent blind APPENDS do not conflict: the new
    * files ride through `kept` untouched (snapshot isolation for the
    * statement, Delta's WriteSerializable default). */
  private[graft] def commitReplace(
      removed: Seq[String], added: Seq[String],
      addedStats: Map[String, Map[String, ColStats]] = Map.empty,
      expectSchemaJson: Option[String] = None,
      addedSizes: Map[String, Long] = Map.empty,
      op: String = "REPLACE"): Unit =
    synchronized {
      require(pinned.isEmpty,
        s"gdisk: $tableName is a VERSION AS OF snapshot — snapshots are read-only")
      val base = log.latest()
      val gone = removed.filterNot(base.files.toSet)
      if (gone.nonEmpty) throw new IllegalStateException(
        s"gdisk: concurrent commit conflict on $tableName — ${gone.size} " +
          s"file(s) this rewrite read were already replaced or removed by a " +
          s"concurrent commit (e.g. ${gone.head}); re-run the statement " +
          "against the current snapshot")
      expectSchemaJson.foreach { exp =>
        if (exp != base.schemaJson) throw new IllegalStateException(
          s"gdisk: concurrent commit conflict on $tableName — the table " +
            "schema changed while this rewrite ran; re-run the statement " +
            "against the current snapshot")
      }
      val kept = base.files.filterNot(removed.toSet)
      enforceKeysDistributed(base, added, existingFiles = kept)
      enforceFkChildDistributed(base, added, existingFiles = kept)
      enforceFkRestrictDistributed(kept ++ added)
      val next = base.copy(
        version = base.version + 1,
        files = kept ++ added,
        added = added,
        fileStats = Some((base.stats -- removed) ++ addedStats),
        fileSizes = Some((base.sizes -- removed) ++ addedSizes),
        // replaced files' DVs die with them — the rewrite read was
        // DV-subtracted, so the replacement files materialize the deletes
        deleteVectors = base.dvsAmong(kept))
      try log.write(next, op)
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"gdisk: concurrent commit conflict on $tableName", e)
      }
    }

  /** `RESTORE TABLE ... TO VERSION AS OF v` — Delta's restore shape: the
    * restore is ITSELF a new commit that re-serves version v's full state
    * (files, schema, constraints, properties, stats), so history stays
    * append-only and the restore is time-travelable/undoable like any
    * commit. Metadata-only: no file is read or written; files re-added
    * relative to the current snapshot ride `added` so the CDC feed shows
    * them as inserts (and the dropped ones as deletes). Errors cleanly if
    * VACUUM removed the version's manifest or any of its data files. */
  private[graft] def restoreToVersion(v: Long): Long = synchronized {
    require(pinned.isEmpty,
      s"gdisk: $tableName is a VERSION AS OF snapshot — snapshots are read-only")
    val base = log.latest()
    require(v >= 0 && v <= base.version,
      s"gdisk: no version $v of $tableName (latest: ${base.version})")
    val old = log.read(v)
    val missing = old.files.filterNot(f =>
      log.fs.exists(new HPath(log.dataDir, f)))
    require(missing.isEmpty,
      s"gdisk: cannot RESTORE $tableName to version $v — ${missing.size} " +
        "data file(s) were removed by VACUUM")
    val reAdded = old.files.filterNot(base.files.toSet)
    log.write(old.copy(version = base.version + 1, added = reAdded,
      committedAtMs = None), "RESTORE")
    base.version + 1
  }

  // ------------------------------------------------- metadata-only DELETE
  // SupportsDeleteV2: when every live file is PROVABLY all-match or
  // no-match against the delete condition (manifest min/max + null counts
  // for data columns, exact dir values for identity partition columns),
  // the optimizer's OptimizeMetadataOnlyDeleteFromTable replaces the whole
  // copy-on-write rewrite with one manifest commit that drops the
  // all-match files — ZERO file I/O, the 100 TB retention-delete path
  // (`DELETE WHERE day < x` on a partitioned table never reads a row).
  // Any straddling file makes canDeleteWhere refuse, and Spark falls back
  // to the group-based COW rewrite. FK RESTRICT still enforces: the drop
  // commits through commitReplace like every other removal.

  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean =
    classifyDelete(predicates,
      allowStraddle = DiskDv.enabled(log.latest().properties)).isDefined

  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit =
    if (DiskDv.enabled(log.latest().properties)) deleteWithDvs(predicates)
    else {
      val drop = metadataDeleteDrop(predicates).getOrElse(throw
        new IllegalStateException(s"gdisk: metadata DELETE on $tableName is " +
          "no longer provable (concurrent commit changed the file set)"))
      if (drop.nonEmpty) commitReplace(drop, Nil, op = "DELETE")
    }

  private def metadataDeleteDrop(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Option[Seq[String]] =
    classifyDelete(predicates, allowStraddle = false).map(_._1)

  /** Classify the live files against a delete condition. With
    * `allowStraddle = false` (copy-on-write mode): Some iff the condition
    * PARTITIONS the files — each provably all-match (droppable) or
    * provably no-match (untouched); any straddler → None and Spark falls
    * back to the group-based rewrite. All-match needs both directions —
    * no row satisfies the NEGATED condition (so nothing survives) and
    * the file is NULL-free on every referenced column (a NULL-valued
    * condition KEEPS its row, and the negation argument only covers
    * two-valued rows). With `allowStraddle = true` (deletion-vector
    * mode): straddlers — including stats-less files and conditions whose
    * negation the stats evaluator cannot express — collect into the
    * second seq for the DV row-index harvest; only an unconvertible
    * condition returns None. The returned expression is the condition in
    * PHYSICAL column names (None exactly for TRUNCATE's ALWAYS_TRUE). */
  private def classifyDelete(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate],
      allowStraddle: Boolean)
      : Option[(Seq[String], Seq[String],
          Option[org.apache.spark.sql.catalyst.expressions.Expression])] = {
    import org.apache.spark.sql.catalyst.expressions._
    if (pinned.isDefined) return None
    if (predicates.isEmpty) return None
    val base = log.latest()
    // TRUNCATE arrives as the single ALWAYS_TRUE predicate
    if (predicates.length == 1 && predicates(0).name() == "ALWAYS_TRUE")
      return Some((base.files, Nil, None))
    val sch = base.schema
    val conds = predicates.toSeq.map(p =>
      GraftDiskCatalog.v2PredToCatalyst(p, sch).getOrElse(return None))
    // stats are keyed by PHYSICAL names — translate the condition once
    val cond =
      if (base.physicalNames.forall(_.isEmpty)) conds.reduce(And)
      else conds.reduce(And).transform {
        case a: AttributeReference => a.withName(base.physicalOf(a.name))
      }
    // no stats-expressible negation = no all-match proof: fatal for the
    // partition-only mode, merely "everything that may match straddles"
    // for the DV mode
    val negatedOpt = GraftDiskCatalog.negateForStats(cond)
    if (negatedOpt.isEmpty && !allowStraddle) return None
    val refs = cond.references.toSeq.map(_.name)
    val physSch = base.physicalSchema
    val dtOf = (n: String) =>
      physSch.fields.find(_.name.equalsIgnoreCase(n)).map(_.dataType)
    val hive = base.hiveParts
    val stats = base.stats
    val drop = Seq.newBuilder[String]
    val straddle = Seq.newBuilder[String]
    base.files.foreach { f =>
      val fileSt0 = stats.getOrElse(f,
        if (allowStraddle) { straddle += f; Map.empty[String, ColStats] }
        else return None)
      val rowsOpt = fileSt0.values.headOption.map(_.rows)
      if (rowsOpt.isEmpty && fileSt0.nonEmpty)
        { if (allowStraddle) straddle += f else return None }
      if (fileSt0.nonEmpty && rowsOpt.isDefined) {
      val rows = rowsOpt.get
      // identity partition columns: the dir value is EVERY row's value —
      // synthesize exact single-value stats so the same evaluator serves.
      // Only for types the stat decoder speaks (integral/date/string);
      // others (e.g. boolean partitions) stay stat-less → conservative
      // fallback, never a decode error inside canDeleteWhere.
      val statSafe: DataType => Boolean = {
        import org.apache.spark.sql.types._
        {
          case ByteType | ShortType | IntegerType | LongType | DateType |
              StringType => true
          case _ => false
        }
      }
      // identity dir segments — pure hive layout OR the identity columns
      // of a transform spec (whose `c=value` segments carry exact values)
      val idDirCols =
        if (base.hasTransforms)
          base.partCols.zip(base.funcs).collect {
            case (c, k) if DiskTransforms.isIdentity(k) => c
          }
        else hive
      val fileSt = fileSt0 ++ idDirCols.flatMap { c =>
        if (!dtOf(c).exists(statSafe)) None
        else GraftDiskCatalog.dirValue(this, f, c).map {
          case null => c -> ColStats(None, None, Some(rows), rows)
          case v =>
            val enc = v match {
              case s: org.apache.spark.unsafe.types.UTF8String => s.toString
              case other => other.toString
            }
            c -> ColStats(Some(enc), Some(enc), Some(0L), rows)
        }
      } ++ (if (!base.hasTransforms) Nil
      else base.partCols.zip(base.funcs).flatMap { case (c, kind) =>
        // transform dir segments: day(dir)=d bounds EVERY row's source
        // value inside [day start, day end] — synthesized stats let a
        // retention DELETE drop whole day/month/hour dirs with zero
        // file I/O even when footer stats are absent (e.g. INT96)
        if (DiskTransforms.isIdentity(kind)) None
        else sch.fields.find(_.name.equalsIgnoreCase(c)).flatMap { fld =>
          GraftDiskCatalog.transformDirValue(this, f, c, kind).flatMap {
            case None => Some(c -> ColStats(None, None, Some(rows), rows))
            case Some(tv) =>
              DiskTransforms.sourceBounds(kind, fld.dataType, tv).map {
                case (mn, mx) => c -> ColStats(Some(mn), Some(mx), Some(0L), rows)
              }
          }
        }
      })
      if (rows == 0L) drop += f
      else if (!DiskStats.mayMatch(fileSt, dtOf, cond)) () // provably kept
      else {
        val nullFree = refs.forall(n =>
          fileSt.get(n).exists(_.nulls.contains(0L)))
        if (nullFree && negatedOpt.exists(neg =>
            !DiskStats.mayMatch(fileSt, dtOf, neg))) drop += f
        // straddler — DV harvest (dv mode) or copy-on-write (cow mode)
        else if (allowStraddle) straddle += f
        else return None
      }
      } // fileSt0.nonEmpty && rowsOpt.isDefined
    }
    Some((drop.result(), straddle.result(), Some(cond)))
  }

  /** MERGE-ON-READ delete (`TBLPROPERTIES ('delete.mode'='dv')`):
    * provably all-match files drop from the manifest (the metadata path,
    * unchanged), and STRADDLERS — instead of a copy-on-write rewrite —
    * get deletion-vector sidecars: one distributed pass reads the
    * straddling files, filters to the matching rows, and per file unions
    * the matched ROW INDEXES into a new immutable sidecar (merging any
    * existing one). The driver sees (file, sidecar, cardinality) triples
    * only — O(straddling files), never rows. A sidecar that covers every
    * recorded row collapses into a whole-file drop. One commit lands
    * both. Lost claim races retry against the fresh snapshot; orphaned
    * sidecars from lost attempts are VACUUM's to sweep. */
  private def deleteWithDvs(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = synchronized {
    require(pinned.isEmpty,
      s"gdisk: $tableName is a VERSION AS OF snapshot — snapshots are read-only")
    var attempts = 0
    var committed = false
    while (!committed) {
      val base = log.latest()
      val (drop, straddle, condOpt) =
        classifyDelete(predicates, allowStraddle = true).getOrElse(throw
          new IllegalStateException(s"gdisk: DELETE on $tableName is no " +
            "longer plannable (concurrent commit changed the snapshot)"))
      if (drop.isEmpty && straddle.isEmpty) return
      val newDvs: Map[String, DvEntry] =
        if (straddle.isEmpty) Map.empty
        else {
          val cond = condOpt.getOrElse(sys.error(
            "gdisk: straddlers under TRUNCATE are impossible"))
          val ddStr = log.dataDir.toString
          val ddPath = log.dataDir.toUri.getPath
          val oldDvs: Map[String, String] =
            straddle.flatMap(f => base.dvs.get(f).map(e => f -> e.dv)).toMap
          val r = spark.read.schema(base.physicalSchema)
          // the classifier's condition carries resolved AttributeReferences
          // from the V2 predicate — re-anchor them BY NAME so the analyzer
          // binds against this fresh read's attributes
          val unresolved = cond.transform {
            case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
              org.apache.spark.sql.catalyst.analysis
                .UnresolvedAttribute.quoted(a.name)
          }
          // per-file recorded row counts: the executor-side bound for the
          // bitmap build AND the post-union sanity check (a row index at
          // or past the file's recorded rows means corruption, and must
          // error before it allocates)
          val rowsByFile: Map[String, Long] = straddle.flatMap(f =>
            base.stats.get(f).flatMap(_.values.headOption).map(f -> _.rows))
            .toMap
          // size-derived fallback bound for files with no recorded stats
          // (older manifests carry partial fileStats): rows ≤ bytes×8
          // caps the bitmap a corrupt index can command at the file's
          // OWN size (rows/8 bitmap bytes ≤ file bytes) instead of the
          // former flat 2^34, which admitted a ~2 GiB allocation per
          // aggregation buffer. ×8 leaves headroom for RLE-heavy files
          // whose row count exceeds their byte count; the 64 KiB floor
          // covers degenerate tiny files.
          val sizeBound: Map[String, Long] = straddle.flatMap(f =>
            base.sizes.get(f).map(sz =>
              f -> math.max(sz * 8L, 1L << 16))).toMap
          // the aggregate's bound must cover EVERY straddler: a file
          // with no recorded stats must not inherit a smaller file's
          // row count and fail a legitimate DELETE — per-file exactness
          // is enforced after the union, where the file is known
          val boundsByFile: Map[String, Long] = straddle.map(f =>
            f -> rowsByFile.getOrElse(f,
              sizeBound.getOrElse(f, 1L << 34))).toMap
          val rowBound =
            if (boundsByFile.nonEmpty) boundsByFile.values.max else 1L << 34
          // aggregate matched row indexes per file DIRECTLY into a packed
          // bitmap (O(rows/8) buffer, map-side partial agg) — a boxed
          // index list per file OOMs an executor exactly when DV mode
          // matters most, a DELETE matching half of every file
          val matched = (if (base.hiveParts.isEmpty) r
                         else r.option("basePath", ddStr))
            .parquet(straddle.map(log.absolute): _*)
            .where(org.apache.spark.sql.graftshim.columnOf(unresolved))
            .select(col("_metadata.file_path").as("__fp"),
              col("_metadata.row_index").as("__ri"))
            .groupBy(col("__fp"))
            .agg(org.apache.spark.sql.graftshim.columnOf(
              DvBitmapAgg(org.apache.spark.sql.graftshim
                .expressionOf(col("__ri")), rowBound)
                .toAggregateExpression()).as("__dv"))
          DvDebug.lastHarvestPlan = matched.queryExecution.executedPlan.toString
          // one task per matched file: union with any existing sidecar
          // and write the replacement — the write is executor-side, the
          // driver collects O(matched files) name/count triples only
          matched.rdd.map { row =>
            val conf = new Configuration()
            val ddH = new HPath(ddStr)
            val fsx = ddH.getFileSystem(conf)
            val p = org.apache.spark.paths.SparkPath
              .fromUrlString(row.getString(0)).toUri.getPath
            val rel = p.stripPrefix(ddPath).stripPrefix("/")
            val bits = DiskDv.deserialize(row.getAs[Array[Byte]](1))
            oldDvs.get(rel).foreach(dv =>
              bits.unionWith(DiskDv.read(fsx, ddH, dv)))
            rowsByFile.get(rel) match {
              case Some(rows) =>
                require(bits.maxSetBit < rows,
                  s"gdisk: deletion vector for $rel addresses row " +
                    s"${bits.maxSetBit} but the file records only $rows rows")
              case None =>
                // stats-less file: the size-derived cap still rejects a
                // corrupt index before a later reader trusts the sidecar
                sizeBound.get(rel).foreach(cap =>
                  require(bits.maxSetBit < cap,
                    s"gdisk: deletion vector for $rel addresses row " +
                      s"${bits.maxSetBit}, past the size-derived bound " +
                      s"$cap for a stats-less file — corrupt row index"))
            }
            val newRel = DiskDv.write(fsx, ddH, bits)
            (rel, newRel, bits.cardinality)
          }.collect() // O(straddling files) triples — DriverActionLint-bounded
            .map { case (rel, dvRel, card) => rel -> DvEntry(dvRel, card) }
            .toMap
        }
      // a DV covering every recorded live row degenerates to a file drop
      val fullCover = newDvs.keysIterator.filter { f =>
        base.stats.get(f).flatMap(_.values.headOption)
          .exists(_.rows == newDvs(f).card)
      }.toSet
      val dropAll = drop ++ fullCover
      val kept = base.files.filterNot(dropAll.toSet)
      val nextDvs = (base.dvs -- dropAll) ++ (newDvs -- fullCover)
      val candidate = base.copy(
        version = base.version + 1,
        files = kept, added = Nil,
        fileStats = Some(base.stats -- dropAll),
        fileSizes = Some(base.sizes -- dropAll),
        deleteVectors = if (nextDvs.isEmpty) None else Some(nextDvs))
      // FK RESTRICT sees the candidate state: parent reads subtract the
      // NEW deletion vectors, so a child referencing a DV'd key blocks
      enforceFkRestrictDistributed(kept, Some(candidate))
      try {
        log.write(candidate, "DELETE")
        committed = true
      } catch {
        case e: java.io.IOException =>
          attempts += 1
          if (attempts > 5) throw new IllegalStateException(
            s"gdisk: concurrent commit conflict on $tableName", e)
      }
    }
  }

  // --------------------------------------------------------------- alter
  private[sources] def applyChange(change: TableChange): Unit = synchronized {
    val base = log.latest()
    val schema = base.schema
    val next: DiskManifest = change match {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1, "nested columns not supported")
        val name = add.fieldNames.head
        require(!schema.fieldNames.exists(_.equalsIgnoreCase(name)),
          s"gdisk: column $name already exists on $tableName")
        // metadata-only: old files lack the column and read as NULL; the
        // DEFAULT (if any) applies to future INSERTs (lakehouse semantics).
        // If the LOGICAL name collides with a physical name still present
        // in old files (a renamed-away or dropped column), the new column
        // gets a FRESH physical name — otherwise old files' stale bytes
        // would resurrect under the new column.
        val taken = base.physicalSchema.fieldNames.map(_.toLowerCase).toSet ++
          base.properties.get(GraftDiskCatalog.ReservedPhysicalProp)
            .toSeq.flatMap(_.split(',')).map(_.trim.toLowerCase)
        val mapping =
          if (!taken.contains(name.toLowerCase)) base.physicalNames
          else {
            var candidate = s"${name}_c${base.version + 1}"
            var n = 0
            while (taken.contains(candidate.toLowerCase)) {
              n += 1; candidate = s"${name}_c${base.version + 1}_$n"
            }
            Some(base.physicalNames.getOrElse(Map.empty) + (name -> candidate))
          }
        val withCol = schema.add(StructField(name, add.dataType, add.isNullable))
        val defaults = Option(add.defaultValue()).map { d =>
          base.defaults + (name -> DiskDefault(d.getSql,
            CatalystLiteral(d.getValue.value(), d.getValue.dataType()).sql))
        }.getOrElse(base.defaults)
        base.copy(schemaJson = withCol.json, defaults = defaults,
          physicalNames = mapping)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1, "nested columns not supported")
        val name = del.fieldNames.head
        require(!base.partCols.exists(_.equalsIgnoreCase(name)),
          s"gdisk: cannot drop partition column $name")
        val i = schema.fieldIndex(name)
        val phys = base.physicalOf(name)
        // a dropped column also leaves the bloom index declaration (its
        // sidecars become dead weight VACUUM eventually sweeps)
        val prunedBloom = base.properties.get(DiskBloom.ColumnsProp).map(_
          .split(',').map(_.trim)
          .filter(c => c.nonEmpty && !c.equalsIgnoreCase(name)).mkString(","))
        val props0 = prunedBloom match {
          case Some("") => base.properties - DiskBloom.ColumnsProp
          case Some(v) => base.properties + (DiskBloom.ColumnsProp -> v)
          case None => base.properties
        }
        // RESERVE the physical name: old files still carry its bytes, so
        // a later ADD COLUMN spelling the same name must pick a fresh
        // physical name or the dropped data would resurrect under it
        val reserved = (props0.get(GraftDiskCatalog.ReservedPhysicalProp)
          .toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
          :+ phys).distinct.mkString(",")
        val props = props0 + (GraftDiskCatalog.ReservedPhysicalProp -> reserved)
        base.copy(
          schemaJson = StructType(schema.fields.patch(i, Nil, 1)).json,
          defaults = base.defaults - name, comments = base.comments - name,
          properties = props,
          physicalNames = base.physicalNames.map(_ - name),
          // strip the column's PHYSICAL stats entries
          fileStats = base.fileStats.map(_.map {
            case (f, st) => f -> (st - phys) }))
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames.length == 1, "nested columns not supported")
        // COLUMN MAPPING: a rename is ONE metadata commit at any table
        // size. Data files keep the column's immutable PHYSICAL name;
        // the manifest maps the new logical name onto it. Per-file stats
        // and bloom sidecars are keyed by the physical name, so nothing
        // on storage is touched — the 100 TB rename costs the same as
        // the 100-row one. (Previously this rewrote every data file.)
        val old = rn.fieldNames.head
        require(!base.partCols.exists(_.equalsIgnoreCase(old)),
          s"gdisk: cannot rename partition column $old")
        require(!schema.fieldNames.exists(_.equalsIgnoreCase(rn.newName)),
          s"gdisk: column ${rn.newName} already exists on $tableName")
        val oldWord =
          ("(?i)\\b" + java.util.regex.Pattern.quote(old) + "\\b").r
        base.constraints
          .filter(c => c.sql.exists(s => oldWord.findFirstIn(s).isDefined))
          .foreach(c => throw new IllegalArgumentException(
            s"gdisk: cannot rename $old — CHECK constraint ${c.name} " +
              "references it by name; drop and recreate the constraint"))
        val i = schema.fieldIndex(old)
        val renamed = StructType(schema.fields.updated(i,
          schema.fields(i).copy(name = rn.newName)))
        val phys = base.physicalOf(old)
        val newMap =
          (base.physicalNames.getOrElse(Map.empty) - old) + (rn.newName -> phys)
        def renameIn(cols: Seq[String]): Seq[String] =
          cols.map(c => if (c.equalsIgnoreCase(old)) rn.newName else c)
        def renameCsvProp(p: Map[String, String], key: String) =
          p.get(key).fold(p)(v => p + (key -> v.split(',').map(_.trim)
            .map(c => if (c.equalsIgnoreCase(old)) rn.newName else c)
            .mkString(",")))
        base.copy(schemaJson = renamed.json,
          added = Nil,
          physicalNames = Some(newMap),
          defaults = (base.defaults - old) ++
            base.defaults.get(old).map(rn.newName -> _),
          comments = (base.comments - old) ++
            base.comments.get(old).map(rn.newName -> _),
          // key-constraint column lists follow the logical name (CHECK
          // sql is guarded above; FKs FROM OTHER tables referencing this
          // column keep their old spelling and fail loudly at their next
          // enforcement — same contract as before)
          constraints = base.constraints.map(c =>
            c.copy(columns = renameIn(c.columns))),
          analyzeStats = base.analyzeStats.map(m =>
            (m - old) ++ m.get(old).map(rn.newName -> _)),
          properties = renameCsvProp(
            renameCsvProp(base.properties, DiskBloom.ColumnsProp), "zorder"))
      case ac: TableChange.AddConstraint =>
        val c = DiskConstraint.from(ac.constraint())
        require(!base.constraints.exists(_.name == c.name),
          s"gdisk: constraint ${c.name} already exists on $tableName")
        // validate CHECK against existing data, distributed (readTable
        // serves LOGICAL names, which the CHECK sql speaks)
        if (c.kind == "check" && base.files.nonEmpty) {
          val bad = readTable(log, base, base.files)
            .filter(!org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.expr(c.sql.get), lit(false)))
            .limit(1).count()
          require(bad == 0,
            s"gdisk: existing rows of $tableName violate CHECK ${c.name}")
        }
        base.copy(constraints = base.constraints :+ c)
      case dc: TableChange.DropConstraint =>
        val remaining = base.constraints.filterNot(_.name == dc.name())
        if (remaining.length == base.constraints.length && !dc.ifExists())
          throw new IllegalArgumentException(
            s"gdisk: no constraint ${dc.name()} on $tableName")
        base.copy(constraints = remaining)
      case set: TableChange.SetProperty =>
        base.copy(properties = base.properties + (set.property -> set.value))
      case rm: TableChange.RemoveProperty =>
        base.copy(properties = base.properties - rm.property)
      case other =>
        throw new UnsupportedOperationException(s"gdisk: unsupported $other")
    }
    log.write(next.copy(version = base.version + 1,
      added = if (change.isInstanceOf[TableChange.RenameColumn]) Nil
        else next.added), "ALTER TABLE")
  }
}

/** ScanBuilder that DELEGATES to Spark's parquet FileScanBuilder for
  * pruning/pushdown and only interposes when the copy-on-write `_file`
  * metadata column is requested (then the scan plans per-file inner scans
  * and tags each row with its file). Normal reads return the inner
  * vectorized ParquetScan through a thin wrapper that adds streaming. */
class GraftDiskScanBuilder(
    table: GraftDiskTable, files: Seq[String], options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  import GraftDiskCatalog.FileColumnName

  private var currentFiles: Seq[String] = files
  private def mkInner() =
    table.innerTable(currentFiles.map(table.log.absolute)).newScanBuilder(options)
  private var inner = mkInner()
  private var required: StructType = table.schema()
  private var prunedForInner: Option[StructType] = None
  private var wantsFile = false
  private var wantsPos = false
  private var statsSkipped = 0
  private var pushedDataFilters
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit = {
    wantsFile = requiredSchema.fieldNames.contains(FileColumnName)
    wantsPos = requiredSchema.fieldNames
      .contains(GraftDiskCatalog.PosColumnName)
    required = requiredSchema
    // the inner parquet scan speaks PHYSICAL names end to end
    val forInner = table.toPhysical(StructType(requiredSchema.fields
      .filterNot(f => f.name == FileColumnName ||
        f.name == GraftDiskCatalog.PosColumnName)))
    prunedForInner = Some(forInner)
    inner.pruneColumns(forInner)
  }

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    val (fileFilters, logicalDataFilters) = filters.partition(
      _.references.exists(r => r.name == FileColumnName ||
        r.name == GraftDiskCatalog.PosColumnName))
    // everything below the manifest boundary — per-file stats keys, bloom
    // sidecar names, the inner parquet scan — speaks PHYSICAL names
    val dataFilters = logicalDataFilters.map(table.toPhysicalExpr)
    // manifest-level data skipping: drop files whose recorded min/max/
    // nullCount prove no row can satisfy the conjunction, BEFORE the
    // inner parquet scan lists/plans them. Files without stats always
    // survive; any filter shape the evaluator doesn't know survives.
    val stats = table.manifestStats
    if (dataFilters.nonEmpty && stats.nonEmpty) {
      val physSchema = table.toPhysical(table.schema())
      val dtOf = (n: String) =>
        physSchema.fields.find(_.name == n).map(_.dataType)
      val kept = currentFiles.filter { f =>
        stats.get(f).forall(fileSt =>
          dataFilters.forall(e => DiskStats.mayMatch(fileSt, dtOf, e)))
      }
      if (kept.length < currentFiles.length) {
        statsSkipped += currentFiles.length - kept.length
        currentFiles = kept
        inner = mkInner()
        prunedForInner.foreach(inner.pruneColumns)
      }
    }
    // BUCKET PRUNING: a point predicate on the single bucket column pins
    // the row's `__bucket=<id>` dir — files in every other dir cannot
    // match (same chained-murmur3 id the writers assigned). IN-lists
    // allow the union of their ids; conjunctions intersect.
    (table.liveNumBuckets, table.livePartCols) match {
      case (Some(n), Seq(bc)) if dataFilters.nonEmpty =>
        import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, In, Literal => CLit}
        def idOf(l: CLit): Option[Int] =
          if (l.value == null) None
          else Some({
            val h = org.apache.spark.sql.catalyst.expressions
              .Murmur3HashFunction.hash(l.value, l.dataType, 42).toInt
            ((h % n) + n) % n
          })
        val perFilter: Seq[Set[Int]] = dataFilters.flatMap {
          case EqualTo(a: AttributeReference, l: CLit)
              if a.name.equalsIgnoreCase(bc) => idOf(l).map(Set(_))
          case EqualTo(l: CLit, a: AttributeReference)
              if a.name.equalsIgnoreCase(bc) => idOf(l).map(Set(_))
          case In(a: AttributeReference, elems)
              if a.name.equalsIgnoreCase(bc) &&
                elems.forall(_.isInstanceOf[CLit]) =>
            Some(elems.flatMap(e => idOf(e.asInstanceOf[CLit])).toSet)
          case _ => None
        }
        if (perFilter.nonEmpty) {
          val allowed = perFilter.reduce(_ intersect _)
          val kept = currentFiles.filter { f =>
            val dir = f.split('/').init.mkString("/")
            !dir.startsWith("__bucket=") ||
              allowed.contains(dir.stripPrefix("__bucket=").toInt)
          }
          if (kept.length < currentFiles.length) {
            statsSkipped += currentFiles.length - kept.length
            currentFiles = kept
            inner = mkInner()
            prunedForInner.foreach(inner.pruneColumns)
          }
        }
      case _ => ()
    }
    // IDENTITY partition-dir pruning: literal EqualTo/IN predicates on the
    // partition columns pin hive dirs before the inner scan lists anything
    GraftDiskCatalog.identityKeepFiles(table, currentFiles, dataFilters)
      .foreach { kept =>
        statsSkipped += currentFiles.length - kept.length
        currentFiles = kept
        inner = mkInner()
        prunedForInner.foreach(inner.pruneColumns)
      }
    // TRANSFORM partition-dir pruning: point AND RANGE predicates on the
    // source column of a days/months/years/hours/truncate transform pin
    // `<col>_<kind>=<value>/` dirs (the transforms are monotonic, so
    // `ts >= X` keeps dirs with day >= day(X); the pushed filter finishes
    // inside boundary dirs)
    GraftDiskCatalog.transformKeepFiles(table, currentFiles, dataFilters)
      .foreach { kept =>
        statsSkipped += currentFiles.length - kept.length
        currentFiles = kept
        inner = mkInner()
        prunedForInner.foreach(inner.pruneColumns)
      }
    // BLOOM skipping: point predicates (EqualTo / IN of literals) on a
    // bloom-indexed column test each surviving file's sidecar filter —
    // the skipping tier min/max can't give an UNSORTED high-cardinality
    // column (every file's range overlaps; the bloom proves absence).
    // A file without a sidecar (pre-index, CONVERT-adopted) is kept; a
    // false positive merely keeps a file — skipping is never load-bearing.
    // tolerant on the READ side: a bloom property naming a since-dropped
    // column must not make the table unreadable (the WRITE path still
    // surfaces the config error)
    val bloomIdx =
      try table.bloomArgs._1
      catch { case _: IllegalArgumentException => Nil }
    if (dataFilters.nonEmpty && bloomIdx.nonEmpty) {
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, In, Literal => CLit}
      val idx = bloomIdx
      def colOf(a: AttributeReference): Option[String] =
        idx.find(_.equalsIgnoreCase(a.name))
      val probes: Seq[(String, DataType, Seq[Any])] = dataFilters.flatMap {
        case EqualTo(a: AttributeReference, l: CLit) =>
          colOf(a).map((_, l.dataType, Seq(l.value)))
        case EqualTo(l: CLit, a: AttributeReference) =>
          colOf(a).map((_, l.dataType, Seq(l.value)))
        case In(a: AttributeReference, elems)
            if elems.forall(_.isInstanceOf[CLit]) =>
          colOf(a).map((_, a.dataType,
            elems.map(_.asInstanceOf[CLit].value)))
        case _ => None
      }.filter(_._3.exists(_ != null))
      if (probes.nonEmpty) {
        val fs = table.log.fs
        val dataDir = table.log.dataDir
        val kept = currentFiles.filter { f =>
          probes.forall { case (c, dt, vals) =>
            DiskBloom.load(fs, DiskBloom.sidecar(dataDir, f, c)) match {
              case Some(bf) => vals.exists(v =>
                v != null && DiskBloom.mightContain(bf, dt, v))
              case None => true
            }
          }
        }
        if (kept.length < currentFiles.length) {
          statsSkipped += currentFiles.length - kept.length
          currentFiles = kept
          inner = mkInner()
          prunedForInner.foreach(inner.pruneColumns)
        }
      }
    }
    pushedDataFilters = dataFilters
    // residuals hand back to Spark, which resolves them against the
    // LOGICAL relation output — translate physical forms back
    val back = new java.util.IdentityHashMap[
      org.apache.spark.sql.catalyst.expressions.Expression,
      org.apache.spark.sql.catalyst.expressions.Expression]()
    dataFilters.zip(logicalDataFilters).foreach { case (p, l) => back.put(p, l) }
    val residual = inner.pushFilters(dataFilters).map(e =>
      Option(back.get(e)).getOrElse(table.toLogicalExpr(e)))
    fileFilters ++ residual
  }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters

  // COUNT/MIN/MAX over plain scans answer from the MANIFEST when its
  // per-file stats fully decide the result — the whole aggregate becomes
  // ONE driver-side row with ZERO file I/O and zero tasks (at 100 TB,
  // count(*) is a sum over manifest entries, not a scan). Anything the
  // manifest can't prove falls through to Spark's parquet FOOTER
  // statistics pushdown (never for the _file-tagged COW path, whose
  // readers must see rows).
  private var aggPushed = false
  private var manifestAgg: Option[(StructType, Array[InternalRow])] = None
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    if (wantsFile) false
    else {
      manifestAgg = manifestAggAnswer(agg)
      if (manifestAgg.isDefined) { aggPushed = true; true }
      else {
        aggPushed = inner.pushAggregation(agg)
        aggPushed
      }
    }
  }
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = !wantsFile &&
    (manifestAggAnswer(agg).isDefined || inner.supportCompletePushDown(agg))

  /** The manifest's complete answer to `agg`, when provable: COUNT(*) =
    * Σ per-file rows; COUNT(col) = rows − Σ nulls (dir-derived for
    * identity-partition columns); MIN/MAX(col) = merged exact bounds for
    * integral/date/timestamp columns (floats excluded — NaN and ±0.0
    * widening make footer bounds inexact; strings excluded — writers may
    * truncate binary stats). GROUP BY over ALL the identity partition
    * columns groups the planned files by their hive dir values — one
    * output row per live partition, still zero file I/O (the SQL face of
    * SHOW PARTITIONS). Refuses (None) under pushed data filters,
    * DISTINCT, partial-partition GROUP BY, any planned file without the
    * needed stat, or any unsupported type/function — the parquet-footer
    * path takes over. */
  private def manifestAggAnswer(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Array[InternalRow])] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (pushedDataFilters.nonEmpty) return None
    val tableSchema = table.schema()
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[StructField] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        tableSchema.fields.find(_.name.equalsIgnoreCase(r.fieldNames()(0)))
      case _ => None
    }
    def isHivePart(c: String) =
      table.liveHiveParts.exists(_.equalsIgnoreCase(c))
    // the util enforces: group-by columns (if any) = exactly the partition
    // columns; schema lays out group columns first, aggregates after
    val groupFields: Seq[StructField] =
      agg.groupByExpressions().toSeq.map(e => colOf(e).getOrElse(return None))
    if (groupFields.exists(f => !isHivePart(f.name))) return None
    val schema = org.apache.spark.sql.execution.datasources
      .AggregatePushDownUtils.getSchemaForPushedAggregation(
        agg, tableSchema, table.liveHiveParts.toSet, Nil)
      .getOrElse(return None)
    val stats = table.manifestStats
    val perFile = currentFiles.map(f => stats.get(f))
    if (!perFile.forall(_.isDefined)) return None
    import org.apache.spark.sql.types.{ByteType => BT, ShortType => ST, IntegerType => IT, LongType => LT, DateType => DT, TimestampType => TT, TimestampNTZType => TNT}
    val minMaxOk: DataType => Boolean = {
      case BT | ST | IT | LT | DT | TT | TNT => true
      case _ => false
    }
    // one aggregate row over a file group (the whole table, or one
    // partition's files under GROUP BY)
    val dvs = table.liveDvs
    def groupRow(files: Seq[String]): Option[Seq[Any]] = {
      val fileMaps: Seq[Map[String, ColStats]] = files.map(stats(_))
      // every file's row count (any column's entry carries it; a file
      // with an empty stats map has an unknown count → refuse)
      val rowsPerFile = fileMaps.map(m => m.values.headOption.map(_.rows))
      if (files.nonEmpty && !rowsPerFile.forall(_.isDefined)) return None
      // deletion vectors: COUNT(*) subtracts the recorded cardinalities;
      // per-column nulls and min/max become OVERESTIMATES once rows are
      // DV'd (the deleted rows may have held the nulls or the extremes),
      // so count(col)/MIN/MAX refuse on any DV'd file in the group
      val dvCard = files.iterator.flatMap(dvs.get).map(_.card).sum
      val anyDv = dvCard > 0 || files.exists(dvs.contains)
      val totalRows = rowsPerFile.flatten.sum - dvCard
      def nullsOf(f: StructField): Option[Long] =
        if (isHivePart(f.name)) {
          val per = files.zip(rowsPerFile).map { case (file, r) =>
            GraftDiskCatalog.dirValue(table, file, f.name)
              .zip(r).map { case (v, rows) => if (v == null) rows else 0L }
          }
          if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
        } else {
          val per = fileMaps.map(_.get(table.physicalOf(f.name)).flatMap(_.nulls))
          if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
        }
      // exact merged bound (Some(null) = provably all-null, None = refuse)
      def boundOf(f: StructField, wantMin: Boolean): Option[Any] =
        if (!minMaxOk(f.dataType)) None
        else if (isHivePart(f.name)) {
          val vs = files.map(file =>
            GraftDiskCatalog.dirValue(table, file, f.name))
          if (!vs.forall(_.isDefined)) None
          else {
            val nonNull = vs.flatten.filterNot(_ == null)
            if (nonNull.isEmpty) Some(null)
            else {
              val ord: Ordering[Any] =
                (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
              Some(if (wantMin) nonNull.min(ord) else nonNull.max(ord))
            }
          }
        } else {
          val ph = table.physicalOf(f.name)
          val (mn, mx, _) = DiskStats.mergedBounds(fileMaps, ph, f.dataType)
          val bound = if (wantMin) mn else mx
          bound.orElse {
            // no merged bound is exact only when every file is provably
            // all-null for the column
            val allNull = fileMaps.forall(m =>
              m.get(ph).exists(cs => cs.nulls.contains(cs.rows)))
            if (files.isEmpty || allNull) Some(null) else None
          }
        }
      Some(agg.aggregateExpressions().toSeq.map {
        case _: CountStar => java.lang.Long.valueOf(totalRows): Any
        case c: Count if !c.isDistinct =>
          if (anyDv) return None
          val f = colOf(c.column).getOrElse(return None)
          val nulls = nullsOf(f).getOrElse(return None)
          java.lang.Long.valueOf(totalRows - nulls): Any
        case m: Min =>
          if (anyDv) return None
          val f = colOf(m.column).getOrElse(return None)
          boundOf(f, wantMin = true).getOrElse(return None)
        case m: Max =>
          if (anyDv) return None
          val f = colOf(m.column).getOrElse(return None)
          boundOf(f, wantMin = false).getOrElse(return None)
        case _ => return None
      })
    }
    val rows: Array[InternalRow] =
      if (groupFields.isEmpty)
        Array(new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(groupRow(currentFiles)
            .getOrElse(return None).toArray))
      else {
        // group the planned files by their hive dir values; every file
        // must carry every group column's dir segment
        val keyed = currentFiles.map { f =>
          val key = groupFields.map(g =>
            GraftDiskCatalog.dirValue(table, f, g.name)
              .getOrElse(return None))
          key -> f
        }
        keyed.groupBy(_._1).toSeq.map { case (key, fs) =>
          val aggVals = groupRow(fs.map(_._2)).getOrElse(return None)
          new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow((key ++ aggVals).toArray): InternalRow
        }.toArray
      }
    Some((schema, rows))
  }

  override def build(): Scan = {
    val pruned = StructType(required.fields.filterNot(f =>
      f.name == FileColumnName || f.name == GraftDiskCatalog.PosColumnName))
    manifestAgg match {
      case Some((aggSchema, aggRows)) =>
        return new GdiskManifestAggScan(table.name(), aggSchema, aggRows,
          currentFiles.length)
      case None => ()
    }
    if (wantsFile || wantsPos)
      new GdiskFileScan(table, currentFiles, pruned, required, wantsPos)
    else {
      // exact planned-row count from the manifest's per-file stats (every
      // file records its row count at commit) — numRows feeds Spark's
      // join-side size estimation, so small gdisk tables auto-broadcast
      // on facts, not guesses. Conservative: any planned file without a
      // stats entry, or a pushed-down aggregate (whose output is not the
      // file rows), withholds the number.
      val exactRows: Option[Long] =
        if (aggPushed) None
        else {
          val stats = table.manifestStats
          val dvCard = // deletion-vector'd rows never reach the scan output
            currentFiles.iterator.flatMap(table.liveDvs.get).map(_.card).sum
          val perFile = currentFiles.map(f =>
            stats.get(f).flatMap(_.values.headOption).map(_.rows))
          if (perFile.forall(_.isDefined)) Some(perFile.flatten.sum - dvCard)
          else None
        }
      // Per-column CBO statistics, assembled driver-side from metadata
      // already in hand — no ANALYZE scan, no file I/O: min/max/nullCount
      // merge from the PLANNED files' manifest stats (so they tighten
      // under partition/stats pruning), identity-partition columns derive
      // ndv/min/max from their hive dir values, and NDV/string lengths
      // ride from the last ANALYZE TABLE commit (capped at the planned
      // row count). Feeds Spark CBO filter-selectivity and join-reorder
      // estimation through Statistics.columnStats().
      val colStats: Map[String, GdiskColStat] =
        if (aggPushed || currentFiles.isEmpty) Map.empty
        else {
          val stats = table.manifestStats
          val perFile = currentFiles.map(f => stats.get(f))
          val allHave = perFile.forall(_.isDefined)
          val fileMaps = perFile.flatten
          val analyze = table.liveAnalyzeStats
          val hive = table.liveHiveParts
          def cap(n: Long): Long = exactRows.fold(n)(math.min(n, _))
          pruned.fields.iterator.flatMap { fld =>
            val a = analyze.get(fld.name)
            if (hive.exists(_.equalsIgnoreCase(fld.name))) {
              val vs = currentFiles.map(f =>
                GraftDiskCatalog.dirValue(table, f, fld.name))
              if (vs.forall(_.isDefined)) {
                val vals = vs.flatten
                val nonNull = vals.filterNot(_ == null).distinct
                val ord: Ordering[Any] =
                  (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
                val mm =
                  if (nonNull.isEmpty) (None, None)
                  else (Some(nonNull.min(ord)), Some(nonNull.max(ord)))
                Some(fld.name -> GdiskColStat(mm._1, mm._2,
                  if (vals.contains(null)) None else Some(0L),
                  Some(cap(nonNull.length.toLong)), None, None))
              } else None
            } else if (allHave) {
              val (mn, mx, nulls) = DiskStats.mergedBounds(
                fileMaps, table.physicalOf(fld.name), fld.dataType)
              val ndv = a.map(s => cap(s.ndv))
              if (mn.isEmpty && nulls.isEmpty && ndv.isEmpty) None
              else Some(fld.name -> GdiskColStat(mn, mx, nulls, ndv,
                a.flatMap(_.avgLen), a.flatMap(_.maxLen),
                a.flatMap(_.hist)))
            } else a.map(s => fld.name -> GdiskColStat(None, None, None,
              Some(cap(s.ndv)), s.avgLen, s.maxLen, s.hist))
          }.toMap
        }
      val base = new GraftDiskScan(table, inner.build(), table.toPhysical(pruned),
        currentFiles.length, files.length, currentFiles, pushedDataFilters,
        exactRows, colStats, options)
      // storage-partitioned-join eligibility: identity- or bucket-
      // partitioned table (transform layouts don't SPJ — join keys are
      // the raw source values, not the lossy transform), plain row scan
      // (no pushed-down aggregate), and the user opted into Spark's v2
      // bucketing — then report KeyGroupedPartitioning so co-partitioned
      // joins/aggregations skip their exchanges. Files carrying deletion
      // vectors opt out (their partitions plan through the DV-filtering
      // composite batch); SPJ resumes once OPTIMIZE purges the DVs.
      if ((table.liveHiveParts.nonEmpty || table.liveNumBuckets.isDefined) &&
          !aggPushed &&
          !currentFiles.exists(table.liveDvs.contains) &&
          org.apache.spark.sql.internal.SQLConf.get.v2BucketingEnabled)
        new GraftDiskSpjScan(table, currentFiles, prunedForInner,
          pushedDataFilters, base)
      else base
    }
  }
}

/** The copy-on-write scan: one inner vectorized file scan per data file,
  * every row tagged with its (relative) file name in the `_file` metadata
  * column. Implements `SupportsRuntimeV2Filtering` on `_file`, so Spark's
  * `RowLevelOperationRuntimeGroupFiltering` narrows a MERGE/UPDATE/DELETE
  * rewrite to exactly the files holding matched rows — the rewrite cost
  * scales with the TOUCHED data, not the table. `servedFiles` is what the
  * operation's commit replaces. */
class GdiskFileScan(
    table: GraftDiskTable, allFiles: Seq[String],
    pruned: StructType, required: StructType, wantsPos: Boolean = false)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  import GraftDiskCatalog.FileColumnName

  @volatile private var files: Seq[String] = allFiles
  /** Files this scan will read (post runtime group filtering) — the
    * operation's commit replaces exactly these. */
  def servedFiles: Seq[String] = files

  override def readSchema(): StructType = required
  override def description(): String =
    s"GdiskFileScan(${table.name()}, ${files.length}/${allFiles.length} files)"
  override def toBatch: Batch = this

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column(FileColumnName))

  /** Runtime group filter: keep only files named by IN/= predicates over
    * `_file`. Unparseable predicates leave the scan unfiltered — a
    * correctness-preserving (whole-table rewrite) fallback. */
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal}
    val wanted = predicates.iterator.flatMap { p =>
      if (p.name() == "IN" || p.name() == "=") {
        val vals = p.children().collect {
          case l: V2Literal[_] => String.valueOf(l.value())
        }
        if (vals.nonEmpty) Some(vals.toSet) else None
      } else None
    }.reduceOption(_ ++ _)
    wanted.foreach(w => files = files.filter(w.contains))
  }

  override def planInputPartitions(): Array[InputPartition] =
    files.toArray.flatMap { f =>
      // a file carrying a deletion vector reads through the row-index-
      // requesting inner table and its reader drops DV'd rows — a COW
      // UPDATE/MERGE rewrite must not resurrect deleted rows into the
      // replacement files (and its own commit clears the file's DV).
      // A `_pos` request (the merge-on-read delta row id) needs the row
      // index on EVERY file.
      val dvBytes = table.liveDvs.get(f).map(e =>
        DiskDv.readBytes(table.log.fs, table.log.dataDir, e.dv))
      val needRi = wantsPos || dvBytes.isDefined
      val sb = (if (needRi)
          table.innerTableRI(Seq(table.log.absolute(f)))
        else table.innerTable(Seq(table.log.absolute(f))))
        .newScanBuilder(CaseInsensitiveStringMap.empty())
      val prunedPhys = table.toPhysical(pruned)
      sb.pruneColumns(
        if (needRi)
          StructType(prunedPhys.fields :+ GraftDiskCatalog.RowIndexField)
        else prunedPhys)
      val scan = sb.build()
      val b = scan.toBatch
      val factory = b.createReaderFactory()
      // the inner FileScan emits partition columns APPENDED after the data
      // columns, whatever order we requested — ship its ACTUAL schema so
      // the row projection binds ordinals against reality (re-labeled to
      // LOGICAL names, which is what `required` binds by; positions hold)
      b.planInputPartitions()
        .map(p => FileTagPartition(p, factory, f,
          table.toLogicalSchema(scan.readSchema()), dvBytes): InputPartition)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new FileAppendingReaderFactory(required)
}

/** A per-file inner partition bundled with its reader factory, the
  * (relative) file name its rows carry in `_file`, and the inner scan's
  * actual output schema (data columns then partition columns). */
case class FileTagPartition(
    inner: InputPartition, factory: PartitionReaderFactory, file: String,
    innerSchema: StructType, dvBytes: Option[Array[Byte]] = None)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

class FileAppendingReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = false
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[FileTagPartition]
    val innerSchema = fp.innerSchema
    val r = fp.factory.createReader(fp.inner)
    val proj = UnsafeProjection.create(required.fields.map { f =>
      if (f.name == GraftDiskCatalog.FileColumnName)
        CatalystLiteral(org.apache.spark.unsafe.types.UTF8String.fromString(fp.file),
          org.apache.spark.sql.types.StringType)
          : org.apache.spark.sql.catalyst.expressions.Expression
      else if (f.name == GraftDiskCatalog.PosColumnName) {
        // the delta row id's position half: the inner scan's row-index
        // request column (present whenever `_pos` was asked for)
        val i = innerSchema.fieldIndex(GraftDiskCatalog.RowIndexColumnName)
        BoundReference(i, org.apache.spark.sql.types.LongType,
          nullable = false)
      } else {
        val i = innerSchema.fieldIndex(f.name)
        BoundReference(i, innerSchema(i).dataType, innerSchema(i).nullable)
      }
    }.toSeq)
    fp.dvBytes match {
      case None =>
        new PartitionReader[InternalRow] {
          override def next(): Boolean = r.next()
          override def get(): InternalRow = proj(r.get())
          override def close(): Unit = r.close()
        }
      case Some(bytes) =>
        // DV'd file: the inner scan carries the row-index request column;
        // rows whose index is set in the sidecar bitset never surface
        val bits = DiskDv.deserialize(bytes)
        val riOrd =
          innerSchema.fieldIndex(GraftDiskCatalog.RowIndexColumnName)
        new PartitionReader[InternalRow] {
          private var current: InternalRow = _
          override def next(): Boolean = {
            while (r.next()) {
              val row = r.get()
              if (!bits.contains(row.getLong(riOrd))) {
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

/** One DV'd data file's partition for the composite batch: the inner
  * parquet partition (all split ranges of the SAME file, so one sidecar
  * applies), the inner scan's reader factory, the sidecar's absolute
  * PATH (the reader loads it at partition open — sidecars are immutable
  * so the task-side read is race-free, and plan time never touches the
  * filesystem for them), the inner scan's actual output schema (pruned
  * data columns + the row-index request column + partition columns),
  * and the outer schema rows must project back to. `hconf` carries the
  * SESSION Hadoop configuration (credentials, custom filesystem keys) to
  * the executor-side sidecar open — a fresh `new Configuration()` there
  * would silently drop them on object stores. */
case class DvFilePartition(
    inner: InputPartition, factory: PartitionReaderFactory,
    dvSidecar: String, innerSchema: StructType, target: StructType,
    hconf: org.apache.spark.util.SerializableConfiguration)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** One CDC change group: `files` of manifest `m` feed `ctype` rows for
  * `version`. `dvBytes` (per-file compressed bitmaps) modulate the read:
  * `keepOnly = true` serves ONLY the bitmap rows (a DV diff — the rows
  * one commit deleted or one restore revived); `false` SUBTRACTS them (a
  * removed file's pre-image minus what its DV already reported). */
case class ChangeGroup(
    m: DiskManifest, files: Seq[String], ctype: String, version: Long,
    dvBytes: Map[String, Array[Byte]] = Map.empty,
    keepOnly: Boolean = false)

/** The DV composite batch's ROW factory — the fallback when some inner
  * partition cannot serve columnar batches (Spark forbids mixing
  * columnar and row partitions in one batch, so one such partition
  * drops the whole scan to rows). Clean partitions read through their
  * inner factory's row path; DV partitions additionally drop rows whose
  * parquet row index is set in the sidecar bitset (loaded here, at
  * partition open) and project away the row-index column. */
object RowDelegatingReaderFactory extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = false
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case FactoryPartition(inner, f) => f.createReader(inner)
      case dv: DvFilePartition =>
        val bits = DiskDv.readAbsolute(dv.dvSidecar, dv.hconf.value)
        val r = dv.factory.createReader(dv.inner)
        val innerSchema = dv.innerSchema
        val riOrd = innerSchema.fieldIndex(GraftDiskCatalog.RowIndexColumnName)
        val proj = UnsafeProjection.create(dv.target.fields.map { fl =>
          val i = innerSchema.fieldIndex(fl.name)
          BoundReference(i, innerSchema(i).dataType, innerSchema(i).nullable)
            : org.apache.spark.sql.catalyst.expressions.Expression
        }.toSeq)
        new PartitionReader[InternalRow] {
          private var current: InternalRow = _
          override def next(): Boolean = {
            while (r.next()) {
              val row = r.get()
              if (!bits.contains(row.getLong(riOrd))) {
                current = proj(row)
                return true
              }
            }
            false
          }
          override def get(): InternalRow = current
          override def close(): Unit = r.close()
        }
      case other => sys.error(
        s"gdisk: unexpected partition kind ${other.getClass} in DV batch")
    }
}

/** The DV composite batch's COLUMNAR factory — chosen when every inner
  * partition (clean and DV'd legs both) supports columnar reads. Clean
  * files pass the inner vectorized reader's batches through untouched.
  * A DV'd file's batches pass through too whenever no deleted row index
  * lands in them — deletion vectors are sparse, so for a GDPR-sliver
  * delete almost every batch takes this zero-copy path (the batch is
  * re-wrapped only to project away the row-index column). A batch the
  * bitmap intersects falls back to a survivor copy: rows project to the
  * target schema and append into fresh on-heap vectors via Spark's own
  * RowToColumnConverter (which handles nested types). Keeping the whole
  * scan columnar preserves whole-stage codegen's batch path for the
  * dominant clean-file partitions — the alternative (one DV'd file
  * flipping the entire 100 TB scan row-based) was the round-9 measured
  * 1.35× penalty. */
object DvColumnarReaderFactory extends PartitionReaderFactory {
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  override def supportColumnarReads(partition: InputPartition): Boolean = true
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    sys.error("gdisk: DV columnar batch planned a row read")

  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] = p match {
    case FactoryPartition(inner, f) => f.createColumnarReader(inner)
    case dv: DvFilePartition =>
      val bits = DiskDv.readAbsolute(dv.dvSidecar, dv.hconf.value)
      val r = dv.factory.createColumnarReader(dv.inner)
      val innerSchema = dv.innerSchema
      val riOrd = innerSchema.fieldIndex(GraftDiskCatalog.RowIndexColumnName)
      val targetOrds = dv.target.fields.map(f => innerSchema.fieldIndex(f.name))
      val proj = UnsafeProjection.create(dv.target.fields.map { fl =>
        val i = innerSchema.fieldIndex(fl.name)
        BoundReference(i, innerSchema(i).dataType, innerSchema(i).nullable)
          : org.apache.spark.sql.catalyst.expressions.Expression
      }.toSeq)
      val convert =
        org.apache.spark.sql.execution.GraftRowToColumn.converter(dv.target)
      new PartitionReader[ColumnarBatch] {
        private var current: ColumnarBatch = _
        // survivor-copy batches own their vectors and must free them;
        // pass-through batches share the inner reader's — never close
        private var owned: ColumnarBatch = _
        private def freeOwned(): Unit =
          if (owned != null) { owned.close(); owned = null }

        override def next(): Boolean = {
          freeOwned()
          while (r.next()) {
            val batch = r.get()
            val n = batch.numRows()
            val ri = batch.column(riOrd)
            var deleted = 0
            var i = 0
            while (i < n) {
              if (bits.contains(ri.getLong(i))) deleted += 1
              i += 1
            }
            if (deleted == 0) {
              // zero-copy: same vectors, row-index column projected away
              current = new ColumnarBatch(
                targetOrds.map(batch.column(_): ColumnVector), n)
              return true
            } else if (deleted < n) {
              val survivors = n - deleted
              val vecs = org.apache.spark.sql.execution.vectorized
                .OnHeapColumnVector.allocateColumns(survivors, dv.target)
              val it = batch.rowIterator()
              while (it.hasNext) {
                val row = it.next()
                if (!bits.contains(row.getLong(riOrd)))
                  convert(proj(row),
                    vecs.asInstanceOf[Array[org.apache.spark.sql.execution
                      .vectorized.WritableColumnVector]])
              }
              owned = new ColumnarBatch(
                vecs.map(v => v: ColumnVector), survivors)
              current = owned
              return true
            } // fully-deleted batch: keep scanning
          }
          false
        }
        override def get(): ColumnarBatch = current
        override def close(): Unit = { freeOwned(); r.close() }
      }
    case other => sys.error(
      s"gdisk: unexpected partition kind ${other.getClass} in DV batch")
  }
}

/** Batch reads delegate wholesale to the inner vectorized ParquetScan
  * (partitions, reader factory, columnar batches, size statistics all
  * Spark's own); `toMicroBatchStream` tails the commit log — offset =
  * manifest version, each micro-batch reads exactly the files ADDED by
  * the versions in (start, end], planned as fresh per-batch inner file
  * scans so executors read parquet vectorized there too. */
/** A staged CTAS/RTAS target: writes stream into the table's data dir
  * exactly like a normal gdisk write (executor-side ParquetWriters,
  * footer-stat harvest, partition fanout), but NO manifest exists until
  * [[commitStagedChanges]] claims one — so a failed CTAS leaves no
  * table, and a REPLACE keeps serving the old snapshot until the atomic
  * claim. [[abortStagedChanges]] deletes the staged files (and, for a
  * create, the table dir shell). */
class GraftDiskStagedTable(
    tableName: String, log: DiskCommitLog, staged: DiskManifest,
    replaceExisting: Boolean)
  extends StagedTable with SupportsWrite {

  private val inner = new GraftDiskTable(tableName, log, staged, pinned = None)
  private val gathered = new java.util.concurrent.ConcurrentLinkedQueue[DiskFilesCommit]()
  private lazy val stagedBloomArgs = GraftDiskCatalog.bloomArgsFor(staged)

  override def name(): String = tableName
  override def schema(): StructType = staged.schema
  override def columns(): Array[V2Column] = staged.columns
  override def partitioning(): Array[Transform] = inner.partitioning()
  override def properties(): util.Map[String, String] =
    staged.properties.asJava
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // a staged table is born empty — CTAS/RTAS "truncate then append"
      // is just append
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write
        with RequiresDistributionAndOrdering {
        // same clustered-ingest contract as the main write path: declared
        // `zorder` clustering orders the CTAS/RTAS content so the staged
        // table's per-file min/max skip from birth
        private def clusterCols: Seq[String] =
          if (staged.numBuckets.isDefined) Nil
          else {
            val declared = staged.properties.get("zorder").toSeq
              .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
            val resolved = declared.flatMap(c =>
              staged.schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.name))
            if (resolved.length == declared.length) resolved else Nil
          }
        private def orders(cols: Seq[String])
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          cols.map(c => Expressions.sort(Expressions.column(c),
            org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING,
            org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_FIRST)
              : org.apache.spark.sql.connector.expressions.SortOrder).toArray
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          if (staged.partCols.nonEmpty)
            org.apache.spark.sql.connector.distributions
              .Distributions.clustered(staged.partCols.map(c =>
                Expressions.column(c)
                  : org.apache.spark.sql.connector.expressions.Expression)
                .toArray)
          else if (clusterCols.nonEmpty)
            org.apache.spark.sql.connector.distributions
              .Distributions.ordered(orders(clusterCols))
          else org.apache.spark.sql.connector.distributions
            .Distributions.unspecified()
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
          val cc = clusterCols
          if (cc.isEmpty) Array.empty
          else orders(
            (if (staged.numBuckets.isEmpty) staged.partCols else Nil) ++ cc)
        }
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              pwi: PhysicalWriteInfo): DataWriterFactory =
            new GraftDiskWriterFactory(info.schema(), staged.schema,
              log.dataDir.toString, inner.writeConfMap(), staged.partCols,
              staged.numBuckets, staged.funcs, stagedBloomArgs._1, stagedBloomArgs._2,
              stagedBloomArgs._3, staged.physicalNames.getOrElse(Map.empty))
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            messages.foreach {
              case c: DiskFilesCommit => gathered.add(c)
              case _ => ()
            }
          override def abort(messages: Array[WriterCommitMessage]): Unit =
            abortStagedChanges()
        }
      }
    }

  override def commitStagedChanges(): Unit = {
    val cs = gathered.asScala.toVector
    inner.commitStagedSnapshot(
      cs.flatMap(_.files),
      cs.iterator.flatMap(_.stats).toMap,
      replaceExisting,
      cs.iterator.flatMap(_.sizes).toMap)
  }

  override def abortStagedChanges(): Unit = {
    val fs = log.dataDir.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf())
    gathered.asScala.toVector.flatMap(_.files)
      .foreach(f => fs.delete(new HPath(log.dataDir, f), false))
    // a staged CREATE owns the whole (manifest-less) dir shell
    if (!replaceExisting) fs.delete(log.tableDir, true)
  }
}

/** A manifest-answered aggregate: the COUNT/MIN/MAX result computed
  * entirely driver-side from per-file manifest stats — Spark plans a
  * [[org.apache.spark.sql.connector.read.LocalScan]] as a local table
  * scan, so the query runs with zero file I/O and zero tasks. */
class GdiskManifestAggScan(
    tableName: String, aggSchema: StructType,
    aggRows: Array[org.apache.spark.sql.catalyst.InternalRow], nFiles: Int)
  extends org.apache.spark.sql.connector.read.LocalScan {
  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
    aggRows
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"GdiskManifestAggScan($tableName, manifestAgg=complete, " +
      s"filesSummed=$nFiles)"
}

/** One column's scan-time CBO statistics, catalyst-internal min/max. */
case class GdiskColStat(
    min: Option[Any], max: Option[Any], nullCount: Option[Long],
    ndv: Option[Long], avgLen: Option[Long], maxLen: Option[Long],
    hist: Option[DiskHistogram] = None)

class GraftDiskScan(
    table: GraftDiskTable, inner0: Scan, pruned: StructType,
    keptFiles: Int = -1, totalFiles: Int = -1,
    relFiles: Seq[String] = Nil,
    dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil,
    exactRows: Option[Long] = None,
    colStats: Map[String, GdiskColStat] = Map.empty,
    readOptions: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
  extends Scan with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => SOffset}

  @volatile private var inner: Scan = inner0
  @volatile private var dppInfo: String = ""
  @volatile private var currentRel: Seq[String] = relFiles

  // the inner scan speaks PHYSICAL names; Spark binds the relation's
  // LOGICAL attributes against this schema (rows are positional)
  override def readSchema(): StructType =
    table.toLogicalSchema(inner.readSchema())
  // surface the inner scan's description — it carries the PushedFilters /
  // ReadSchema evidence plan audits (and humans) look for — plus the
  // manifest-stats skipping evidence (files planned / files in manifest)
  override def description(): String = {
    val skip =
      if (keptFiles >= 0 && totalFiles >= 0)
        s" statsFiles=$keptFiles/$totalFiles" else ""
    val dvd = currentRel.count(table.liveDvs.contains)
    val dvInfo = if (dvd > 0) s" dvFiles=$dvd" else ""
    s"GraftDiskScan(${table.name()})$skip$dppInfo$dvInfo ${inner.description()}"
  }

  /** Files without a deletion vector serve through the inner vectorized
    * parquet batch untouched; files WITH one plan per-file partitions
    * whose read schema additionally requests the parquet row index, and
    * a wrapping reader drops rows whose index is set in the sidecar
    * bitset. Each DV partition ships its sidecar's PATH (the sidecars
    * are immutable, so a task-side read is race-free) — plan time never
    * opens a sidecar, so a trickle-upsert table with thousands of DV'd
    * files plans as fast as a clean one. Spark forbids MIXING columnar
    * and row partitions in one batch, so when every inner partition
    * supports columnar reads the whole composite batch stays COLUMNAR:
    * clean files pass their vectorized batches through untouched, and a
    * DV'd file's batches pass through whenever no deleted row index
    * lands in them (the common case — vectors are sparse), falling back
    * to a survivor row-copy only for batches the bitmap actually
    * intersects. Only when an inner leg cannot serve columnar does the
    * scan drop to the row-based wrapper end to end. */
  override def toBatch: Batch = {
    val dvs = table.liveDvs
    val dvd = currentRel.filter(dvs.contains)
    if (dvd.isEmpty) inner.toBatch
    else {
      val clean = currentRel.filterNot(dvs.contains)
      val cleanParts: Array[InputPartition] =
        if (clean.isEmpty) Array.empty
        else {
          val sb = table.innerTable(clean.map(table.log.absolute))
            .newScanBuilder(CaseInsensitiveStringMap.empty())
          sb.pruneColumns(pruned)
          sb match {
            case f: org.apache.spark.sql.internal.connector
                .SupportsPushDownCatalystFilters if dataFilters.nonEmpty =>
              f.pushFilters(dataFilters)
            case _ => ()
          }
          val b = sb.build().toBatch
          val factory = b.createReaderFactory()
          b.planInputPartitions().map(p =>
            FactoryPartition(p, factory): InputPartition)
        }
      val dvParts: Array[InputPartition] = {
        val sb = table.innerTableRI(dvd.map(table.log.absolute))
          .newScanBuilder(CaseInsensitiveStringMap.empty())
        sb.pruneColumns(StructType(
          pruned.fields :+ GraftDiskCatalog.RowIndexField))
        sb match {
          case f: org.apache.spark.sql.internal.connector
              .SupportsPushDownCatalystFilters if dataFilters.nonEmpty =>
            f.pushFilters(dataFilters)
          case _ => ()
        }
        val dvScan = sb.build()
        val b = dvScan.toBatch
        val factory = b.createReaderFactory()
        val actual = dvScan.readSchema()
        val target = inner.readSchema()
        val ddPath = table.log.dataDir.toUri.getPath
        // sidecar PATHS only — the bytes load on the executor at
        // partition open (immutable sidecars make that race-free), so
        // planning a 5k-DV'd-file scan costs zero driver sidecar reads
        val sidecars: Map[String, String] = dvd.map(f =>
          f -> DiskDv.sidecar(table.log.dataDir, dvs(f).dv).toString).toMap
        // regroup the inner partitions ONE PER FILE so each wrapping
        // reader knows which sidecar applies (split ranges of the same
        // file may merge into one partition — same file, same bitset)
        import org.apache.spark.sql.execution.datasources.FilePartition
        val byFile = b.planInputPartitions().flatMap {
          case fp: FilePartition => fp.files
          case other => sys.error(
            s"gdisk: unexpected non-file partition ${other.getClass}")
        }.groupBy(_.filePath.toUri.getPath)
        val shippedConf = new org.apache.spark.util.SerializableConfiguration(
          SparkSession.active.sessionState.newHadoopConf())
        byFile.toArray.zipWithIndex.map { case ((path, pfs), i) =>
          val rel = path.stripPrefix(ddPath).stripPrefix("/")
          DvFilePartition(FilePartition(i, pfs), factory,
            sidecars.getOrElse(rel, sys.error(
              s"gdisk: no deletion-vector sidecar for $rel")),
            actual, target, shippedConf): InputPartition
        }
      }
      // columnar end-to-end whenever every inner partition (both legs)
      // can serve batches; otherwise the row-based wrapper for all
      val allColumnar =
        cleanParts.forall { p =>
          val fp = p.asInstanceOf[FactoryPartition]
          fp.factory.supportColumnarReads(fp.inner)
        } && dvParts.forall { p =>
          val d = p.asInstanceOf[DvFilePartition]
          d.factory.supportColumnarReads(d.inner)
        }
      new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          cleanParts ++ dvParts
        override def createReaderFactory(): PartitionReaderFactory =
          if (allColumnar) DvColumnarReaderFactory
          else RowDelegatingReaderFactory
      }
    }
  }

  // ---- DYNAMIC partition/bucket pruning (SPARK-35779 v2 runtime
  // filtering): a join whose OTHER side filters down to few partition- or
  // bucket-key values delivers those values here at execution time as
  // IN/= predicates (the DPP subquery result, typically reusing the
  // join's broadcast). Identity-partitioned tables drop every file whose
  // hive dir value is outside the allowed set; hash-bucketed tables hash
  // each value with the writers' chained murmur3 (seed 42) and keep only
  // the matching `__bucket=` dirs. The inner vectorized parquet scan is
  // then re-planned over the survivors — at 100 TB this is the
  // difference between scanning a fact table and scanning the handful of
  // partitions a dimension filter actually selects. Spark's own DSv2
  // file sources do not implement this hook; gdisk's manifest makes it a
  // driver-side list filter. ----
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (relFiles.isEmpty) Array.empty
    else table.livePartCols.map(c => Expressions.column(c)).toArray

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit =
    GraftDiskCatalog.runtimeKeepFiles(table, relFiles, predicates).foreach { kept =>
      dppInfo = s" dppFiles=${kept.length}/${relFiles.length}"
      currentRel = kept // the DV composite batch plans over the survivors
      val sb = table.innerTable(kept.map(table.log.absolute))
        .newScanBuilder(CaseInsensitiveStringMap.empty())
      sb.pruneColumns(pruned)
      if (dataFilters.nonEmpty) sb.pushFilters(dataFilters)
      inner = sb.build()
    }
  /** sizeInBytes rides on the inner parquet scan's file sizes; numRows is
    * the manifest's EXACT planned-file row count when available (commit
    * time records it per file) — what join-side size estimation and
    * broadcast decisions actually want. columnStats serves per-column
    * min/max/nullCount merged from the planned files' manifest stats plus
    * ANALYZE TABLE's NDV/length stats — Spark's `transformV2Stats` turns
    * them into catalyst `attributeStats`, so CBO filter-selectivity and
    * join-reorder estimation run on facts without an ANALYZE scan. */
  override def estimateStatistics(): Statistics = {
    val base = inner match {
      case s: SupportsReportStatistics => Some(s.estimateStatistics())
      case _ => None
    }
    def jl(o: Option[Long]): java.util.OptionalLong =
      o.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty())
    val colMap: java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val m = new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      colStats.foreach { case (name, cs) =>
        m.put(Expressions.column(name),
          new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def distinctCount(): java.util.OptionalLong = jl(cs.ndv)
            override def min(): java.util.Optional[Object] =
              cs.min.map(v => java.util.Optional.of(v.asInstanceOf[Object]))
                .getOrElse(java.util.Optional.empty())
            override def max(): java.util.Optional[Object] =
              cs.max.map(v => java.util.Optional.of(v.asInstanceOf[Object]))
                .getOrElse(java.util.Optional.empty())
            override def nullCount(): java.util.OptionalLong = jl(cs.nullCount)
            override def avgLen(): java.util.OptionalLong = jl(cs.avgLen)
            override def maxLen(): java.util.OptionalLong = jl(cs.maxLen)
            // ANALYZE's equi-height histogram — Spark's transformV2Stats
            // carries it into catalyst ColumnStat.histogram, where
            // FilterEstimation replaces the uniformity assumption with
            // the actual value distribution (skewed-predicate estimates)
            override def histogram(): java.util.Optional[
                org.apache.spark.sql.connector.read.colstats.Histogram] =
              cs.hist match {
                // spark.graft.cbo.serveHistograms=false withholds the
                // histogram (min/max/ndv still served) — the A/B switch
                // CboJoinFlipSpec and ddl_v2_cbo_hist_join use to prove
                // the histogram alone changes the join strategy
                case Some(_) if org.apache.spark.sql.SparkSession.active
                    .conf.get("spark.graft.cbo.serveHistograms", "true")
                    .equalsIgnoreCase("false") =>
                  java.util.Optional.empty()
                case Some(h) => java.util.Optional.of(
                  new org.apache.spark.sql.connector.read.colstats.Histogram {
                    override def height(): Double = h.height
                    override def bins(): Array[
                        org.apache.spark.sql.connector.read.colstats.HistogramBin] =
                      h.bins.map { b =>
                        new org.apache.spark.sql.connector.read.colstats.HistogramBin {
                          override def lo(): Double = b.lo
                          override def hi(): Double = b.hi
                          override def ndv(): Long = b.ndv
                        }: org.apache.spark.sql.connector.read.colstats.HistogramBin
                      }.toArray
                  })
                case None => java.util.Optional.empty()
              }
          })
      }
      m
    }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        base.map(_.sizeInBytes()).getOrElse(java.util.OptionalLong.empty())
      override def numRows(): java.util.OptionalLong =
        exactRows.map(java.util.OptionalLong.of).getOrElse(
          base.map(_.numRows()).getOrElse(java.util.OptionalLong.empty()))
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        colMap
    }
  }

  /** The micro-batch source implements ADMISSION CONTROL: with
    * `.option("maxFilesPerTrigger", n)` each micro-batch advances the
    * version offset only as far as n cumulative added files, and with
    * `.option("maxBytesPerTrigger", b)` only as far as b cumulative
    * added BYTES (manifest-recorded file sizes — the per-file count is
    * blind to skewed file sizes: one commit of 10 fat files admits the
    * same as 10 thin ones; the byte form is the real memory-pressure
    * back-pressure, Spark's own file-source contract). Both limits
    * always admit at least one version, so an over-sized commit cannot
    * stall the stream; set together they compose (first budget
    * exhausted wins). Without either, a restart against a
    * long-ingested 100 TB table would swallow every pending version in
    * ONE batch. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
      import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadLimit, ReadMaxBytes, ReadMaxFiles}
      private val maxFiles: Option[Int] =
        Option(readOptions.get("maxFilesPerTrigger")).map(_.toInt)
      private val maxBytes: Option[Long] =
        Option(readOptions.get("maxBytesPerTrigger")).map(_.toLong)
      override def getDefaultReadLimit: ReadLimit =
        (maxFiles, maxBytes) match {
          case (Some(f), Some(b)) =>
            ReadLimit.compositeLimit(
              Array(ReadLimit.maxFiles(f), ReadLimit.maxBytes(b)))
          case (Some(f), None) => ReadLimit.maxFiles(f)
          case (None, Some(b)) => ReadLimit.maxBytes(b)
          case _ => ReadLimit.allAvailable()
        }
      /** Flatten a (possibly composite) limit to (files, bytes) caps. */
      private def caps(limit: ReadLimit): (Option[Int], Option[Long]) =
        limit match {
          case mf: ReadMaxFiles => (Some(mf.maxFiles()), None)
          case mb: ReadMaxBytes => (None, Some(mb.maxBytes()))
          case c: CompositeReadLimit =>
            c.getReadLimits.map(caps).foldLeft(
              (Option.empty[Int], Option.empty[Long])) { case (a, b) =>
              (a._1.orElse(b._1), a._2.orElse(b._2))
            }
          case _ => (None, None)
        }
      override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
        val from = start.asInstanceOf[CountOffset].n
        caps(limit) match {
          case (None, None) => CountOffset(table.log.latestVersion())
          case (fCap, bCap) =>
            var v = from
            var admittedFiles = 0
            var admittedBytes = 0L
            var stop = false
            table.log.versions().filter(_ > from).foreach { next =>
              if (!stop) {
                val m = table.log.read(next)
                val addF = m.added.length
                // unknown sizes (pre-round-8 manifests) count as Spark's
                // default partition target so they still consume budget
                val addB = m.added.map(f =>
                  m.sizes.getOrElse(f, 128L << 20)).sum
                val over =
                  fCap.exists(c => admittedFiles + addF > c) ||
                    bCap.exists(c => admittedBytes + addB > c)
                if (admittedFiles > 0 && over) stop = true
                else {
                  admittedFiles += addF; admittedBytes += addB; v = next
                }
              }
            }
            CountOffset(v)
        }
      }
      override def initialOffset(): SOffset =
        CountOffset(table.log.versions().headOption.getOrElse(0L))
      override def latestOffset(): SOffset =
        CountOffset(table.log.latestVersion())
      override def deserializeOffset(json: String): SOffset =
        CountOffset(json.trim.toLong)
      override def planInputPartitions(
          start: SOffset, end: SOffset): Array[InputPartition] = {
        val from = start.asInstanceOf[CountOffset].n
        val until = end.asInstanceOf[CountOffset].n
        val added = table.log.versions()
          .filter(v => v > from && v <= until)
          .flatMap(v => table.log.read(v).added)
        if (added.isEmpty) Array.empty
        else {
          val sb = table.innerTable(added.map(table.log.absolute))
            .newScanBuilder(CaseInsensitiveStringMap.empty())
          sb.pruneColumns(pruned)
          val b = sb.build().toBatch
          val factory = b.createReaderFactory()
          b.planInputPartitions()
            .map(p => FactoryPartition(p, factory): InputPartition)
        }
      }
      override def createReaderFactory(): PartitionReaderFactory =
        DelegatingReaderFactory
      override def commit(end: SOffset): Unit = ()
      override def stop(): Unit = ()
    }
}

/** Storage-partitioned-join scan over an identity-partitioned gdisk
  * table (SPARK-37375): batch planning groups the manifest's files by
  * their hive partition directory, plans one inner vectorized parquet
  * scan PER partition value, and tags every input partition with its
  * key (`HasPartitionKey`) while reporting `KeyGroupedPartitioning` —
  * so a join or aggregation keyed on the partition columns elides its
  * exchange entirely when `spark.sql.sources.v2.bucketing.enabled` is
  * on. At 100 TB this is the co-located-join layout: two corpus tables
  * partitioned on the same key join with ZERO shuffle, the file groups
  * meeting executor-side. Schema/statistics/streaming delegate to the
  * ordinary scan. */
class GraftDiskSpjScan(
    table: GraftDiskTable, files: Seq[String],
    prunedForInner: Option[StructType],
    dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
    base: GraftDiskScan)
  extends Scan with Batch with SupportsReportPartitioning
  with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  private val partCols = table.livePartCols

  /** Current file set — narrowed by runtime (dynamic-partition) pruning.
    * BatchScanExec re-plans partitions after `filter`, pads the dropped
    * key values with empty partitions, and keeps the key-grouped join
    * layout valid over the subset. */
  @volatile private var curFiles: Seq[String] = files
  @volatile private var dppInfo: String = ""

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    partCols.map(c => Expressions.column(c)).toArray

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit =
    GraftDiskCatalog.runtimeKeepFiles(table, curFiles, predicates).foreach { kept =>
      dppInfo = s" dppFiles=${kept.length}/${curFiles.length}"
      curFiles = kept
    }

  override def readSchema(): StructType = base.readSchema()
  override def description(): String =
    s"${base.description()}$dppInfo spjGroups=${groups.size}"
  override def estimateStatistics(): Statistics = base.estimateStatistics()
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    base.toMicroBatchStream(checkpointLocation)
  override def toBatch: Batch = this

  /** Files grouped by their partition directory, each with the parsed
    * key row (partition-column order, Catalyst values). A def, not a
    * lazy val: runtime filtering narrows `curFiles` between the
    * planner's partitioning probe and execution's partition planning. */
  private def groups: Seq[(InternalRow, Seq[String])] =
    curFiles.groupBy(f => f.split('/').init.mkString("/")).toSeq.sortBy(_._1)
      .map { case (dir, fs) => (keyOf(dir), fs) }

  private def keyOf(dir: String): InternalRow = {
    val segs = dir.split('/').filter(_.nonEmpty)
    table.liveNumBuckets match {
      case Some(_) => // bucket layout: single `__bucket=<id>` segment
        require(segs.length == 1 && segs.head.startsWith("__bucket="),
          s"gdisk: file dir '$dir' is not a bucket dir")
        return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](segs.head.stripPrefix("__bucket=").toInt))
      case None => ()
    }
    require(segs.length == partCols.length,
      s"gdisk: file dir '$dir' does not match partition columns $partCols")
    val schema = table.liveSchema
    val values: Array[Any] = partCols.zip(segs).map { case (c, seg) =>
      val eq = seg.indexOf('=')
      require(eq > 0 && seg.substring(0, eq).equalsIgnoreCase(c),
        s"gdisk: dir segment '$seg' does not match partition column $c")
      val raw = java.net.URLDecoder.decode(seg.substring(eq + 1), "UTF-8")
      if (raw == "__HIVE_DEFAULT_PARTITION__") null
      else schema.fields.find(_.name.equalsIgnoreCase(c)).get.dataType match {
        case org.apache.spark.sql.types.StringType =>
          org.apache.spark.unsafe.types.UTF8String.fromString(raw)
        case org.apache.spark.sql.types.LongType => raw.toLong
        case org.apache.spark.sql.types.IntegerType => raw.toInt
        case org.apache.spark.sql.types.ShortType => raw.toShort
        case org.apache.spark.sql.types.ByteType => raw.toByte
        case org.apache.spark.sql.types.BooleanType => raw.toBoolean
        case org.apache.spark.sql.types.DateType =>
          java.time.LocalDate.parse(raw).toEpochDay.toInt
        case other => sys.error(
          s"gdisk: unsupported partition key type $other for column $c")
      }
    }.toArray
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
      table.liveNumBuckets match {
        case Some(n) => Array(Expressions.bucket(n, partCols: _*)
          : org.apache.spark.sql.connector.expressions.Expression)
        case None => partCols.map(c => Expressions.identity(c)
          : org.apache.spark.sql.connector.expressions.Expression).toArray
      },
      groups.size)

  override def planInputPartitions(): Array[InputPartition] =
    groups.flatMap { case (key, fs) =>
      val sb = table.innerTable(fs.map(table.log.absolute))
        .newScanBuilder(CaseInsensitiveStringMap.empty())
      prunedForInner.foreach(sb.pruneColumns)
      if (dataFilters.nonEmpty) sb.pushFilters(dataFilters)
      val b = sb.build().toBatch
      val factory = b.createReaderFactory()
      b.planInputPartitions()
        .map(p => KeyedFactoryPartition(p, factory, key): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    DelegatingReaderFactory
}

/** A factory-bundled partition additionally tagged with its
  * partition-key row (the `HasPartitionKey` contract SPJ requires). */
case class KeyedFactoryPartition(
    inner: InputPartition, factory: PartitionReaderFactory, key: InternalRow)
  extends WithFactory with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** An input partition bundled with the reader factory of the inner scan
  * that planned it ([[DelegatingReaderFactory]] unwraps the pair). */
sealed trait WithFactory extends InputPartition {
  def inner: InputPartition
  def factory: PartitionReaderFactory
}

/** Micro-batches each plan their own inner scan. */
case class FactoryPartition(inner: InputPartition, factory: PartitionReaderFactory)
  extends WithFactory

object DelegatingReaderFactory extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = {
    val fp = p.asInstanceOf[WithFactory]
    fp.factory.supportColumnarReads(fp.inner)
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[WithFactory]
    fp.factory.createReader(fp.inner)
  }
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val fp = p.asInstanceOf[WithFactory]
    fp.factory.createColumnarReader(fp.inner)
  }
}

case class DiskFilesCommit(
    files: Seq[String],
    stats: Map[String, Map[String, ColStats]] = Map.empty,
    sizes: Map[String, Long] = Map.empty)
  extends WriterCommitMessage

/** One delta-write task's result: the appended files (the inner fanout
  * writer's normal message) plus the touched files' NEW deletion-vector
  * sidecars — names, stats, and counts only, never rows. */
case class GdiskDeltaCommit(
    files: DiskFilesCommit, dvs: Map[String, DvEntry])
  extends WriterCommitMessage

/** Executor side of the merge-on-read delta write: inserts stream through
  * the normal parquet fanout writer; deletes accumulate per-file position
  * bitsets (the clustered distribution gives this task ALL of a touched
  * file's deletes) which commit-time merges with the file's existing
  * sidecar (from the operation's snapshot) and writes as one new
  * immutable sidecar. Updates arrive pre-split (delete + reinsert). */
case class GdiskDeltaWriterFactory(
    inner: Option[GraftDiskWriterFactory], fileOrd: Int, posOrd: Int,
    oldDvs: Map[String, String], dataDirStr: String,
    rowsByFile: Map[String, Long] = Map.empty)
  extends org.apache.spark.sql.connector.write.DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] = {
    val dataWriter = inner.map(_.createWriter(partitionId, taskId))
    new org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
      private val dels = scala.collection.mutable.Map.empty[String, DvBitmap]

      override def delete(meta: InternalRow, id: InternalRow): Unit = {
        val rel = id.getUTF8String(fileOrd).toString
        val bits = dels.getOrElseUpdate(rel, new DvBitmap())
        rowsByFile.get(rel) match {
          case Some(rows) => bits.setBounded(id.getLong(posOrd), rows)
          case None => bits.set(id.getLong(posOrd))
        }
      }

      override def update(
          meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
        // defensive: representUpdateAsDeleteAndInsert pre-splits updates,
        // but the contract is trivially expressible either way
        delete(meta, id)
        insert(row)
      }

      override def insert(row: InternalRow): Unit =
        dataWriter.getOrElse(sys.error(
          "gdisk: insert row in a pure-DELETE delta write")).write(row)

      override def commit(): WriterCommitMessage = {
        val filesMsg = dataWriter.map(_.commit().asInstanceOf[DiskFilesCommit])
          .getOrElse(DiskFilesCommit(Nil))
        val dvEntries: Map[String, DvEntry] =
          if (dels.isEmpty) Map.empty
          else {
            val conf = new Configuration()
            val dd = new HPath(dataDirStr)
            val fs = dd.getFileSystem(conf)
            dels.iterator.map { case (rel, bits) =>
              oldDvs.get(rel).foreach(dv =>
                bits.unionWith(DiskDv.read(fs, dd, dv)))
              rel -> DvEntry(DiskDv.write(fs, dd, bits), bits.cardinality)
            }.toMap
          }
        GdiskDeltaCommit(filesMsg, dvEntries)
      }

      override def abort(): Unit = dataWriter.foreach(_.abort())
      override def close(): Unit = dataWriter.foreach(_.close())
    }
  }
}

/** Executor-side parquet writer: every task streams its rows straight into
  * parquet files under the table's data dir (by-name normalized into the
  * table schema layout); the commit message carries only the file names.
  * For partitioned tables this is a hive-layout FANOUT writer — rows route
  * to `col=value/` subdir files by their partition values (the clustered
  * write distribution keeps the per-task fanout narrow), and partition
  * columns are encoded in the path, not the file. Serves both batch and
  * streaming epochs. */
class GraftDiskWriterFactory(
    writeSchema: StructType, tableSchema: StructType,
    dataDirUri: String, confMap: Map[String, String],
    partitionCols: Seq[String] = Nil,
    numBuckets: Option[Int] = None,
    // per-partition-column transform kinds (aligned with partitionCols);
    // any non-identity kind switches to the transform layout: all
    // columns stay in the files, dirs are `<col>_<kind>=<value>/`
    partFuncs: Seq[String] = Nil,
    bloomCols: Seq[String] = Nil, // PHYSICAL names (sidecars are file-level)
    bloomItems: Long = 100000L,
    bloomFpp: Double = 0.01,
    // COLUMN MAPPING: logical -> physical; data files, footer-stat keys,
    // and bloom sidecars are written under PHYSICAL names so a later
    // RENAME COLUMN never has to touch them
    physicalNames: Map[String, String] = Map.empty)
  extends DataWriterFactory
  with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  private def logicalOf(physical: String): String =
    physicalNames.collectFirst { case (l, p) if p == physical => l }
      .getOrElse(physical)

  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    newWriter(partitionId, taskId, epochId = -1L)

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    newWriter(partitionId, taskId, epochId)

  private def newWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // identity partition columns live in the dir path; data files hold
      // the rest (bucket and transform-layout columns stay IN the files —
      // `__bucket=<id>/` / `<col>_<kind>=<v>/` dirs are grouping only).
      // File columns are written under their PHYSICAL names; the
      // incoming writeSchema speaks logical.
      private val hasTransforms =
        partFuncs.exists(!DiskTransforms.isIdentity(_))
      private val dataFieldsLogical =
        (if (numBuckets.isDefined || hasTransforms) tableSchema.fields
         else tableSchema.fields
           .filterNot(f => partitionCols.exists(_.equalsIgnoreCase(f.name))))
          .toSeq
      private val dataSchema = StructType(dataFieldsLogical.map(f =>
        f.copy(name = physicalNames.getOrElse(f.name, f.name))))
      private val conf = {
        val c = new Configuration(false)
        confMap.foreach { case (k, v) => c.set(k, v) }
        ParquetWriteSupport.setSchema(dataSchema, c)
        c
      }
      private def newFileName = {
        val ep = if (epochId >= 0) s"-e$epochId" else ""
        s"part-$partitionId-$taskId$ep-${java.util.UUID.randomUUID}.parquet"
      }
      private val proj = UnsafeProjection.create(dataFieldsLogical.map { f =>
        val i = writeSchema.fieldIndex(f.name)
        BoundReference(i, writeSchema(i).dataType, writeSchema(i).nullable)
          : org.apache.spark.sql.catalyst.expressions.Expression
      })
      private val partAccess = partitionCols.map { c =>
        val i = writeSchema.fieldIndex(
          writeSchema.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(c))
        (c, i, writeSchema(i).dataType)
      }
      // bloom-indexed columns: fed per ROW as it is written (zero extra
      // I/O); one filter per (open file, column), sidecars persisted at
      // task commit by the task that owns the files. `bloomCols` carries
      // PHYSICAL names (sidecar naming); row access binds via the LOGICAL
      // name the incoming writeSchema speaks.
      private val bloomAccess = bloomCols.map { c =>
        val lg = logicalOf(c)
        val i = writeSchema.fieldIndex(
          writeSchema.fieldNames.find(_.equalsIgnoreCase(lg)).getOrElse(lg))
        (c, i, writeSchema(i).dataType)
      }
      // open file per partition dir ("" for unpartitioned tables)
      private val open = scala.collection.mutable.LinkedHashMap
        .empty[String, (org.apache.parquet.hadoop.ParquetWriter[InternalRow], String)]
      private val blooms = scala.collection.mutable.LinkedHashMap
        .empty[String, Array[org.apache.spark.util.sketch.BloomFilter]]

      private def renderPartValue(r: InternalRow, i: Int,
          dt: org.apache.spark.sql.types.DataType): String = {
        if (r.isNullAt(i)) return "__HIVE_DEFAULT_PARTITION__"
        val raw = dt match {
          case org.apache.spark.sql.types.DateType =>
            java.time.LocalDate.ofEpochDay(r.getInt(i).toLong).toString
          case _ => String.valueOf(r.get(i, dt))
        }
        // %xx escaping, the scheme Spark's partition parsing unescapes
        java.net.URLEncoder.encode(raw, "UTF-8").replace("+", "%20")
      }

      private def writerFor(dir: String)
          : org.apache.parquet.hadoop.ParquetWriter[InternalRow] =
        open.getOrElseUpdate(dir, {
          val rel = if (dir.isEmpty) newFileName else s"$dir/$newFileName"
          val w = new GraftParquetWriterBuilder(new HPath(dataDirUri, rel))
            .withConf(conf)
            .withCompressionCodec(
              org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
            .build()
          (w, rel)
        })._1

      /** pmod(hash(cols...), n) — Spark's chained murmur3 (seed 42,
        * nulls skipped), so SQL `pmod(hash(c1, c2), n)` computes the
        * same id (OPTIMIZE and any external tooling rely on that). */
      private def bucketId(r: InternalRow): Int = {
        var h = 42
        partAccess.foreach { case (_, i, dt) =>
          if (!r.isNullAt(i))
            h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
              .hash(r.get(i, dt), dt, h).toInt
        }
        val n = numBuckets.get
        ((h % n) + n) % n
      }

      /** Transform-layout dir segment for one partition column. */
      private def transformSeg(
          r: InternalRow, c: String, i: Int,
          dt: org.apache.spark.sql.types.DataType, kind: String): String = {
        val key = DiskTransforms.segName(c, kind)
        if (DiskTransforms.isIdentity(kind))
          s"$key=${renderPartValue(r, i, dt)}"
        else if (r.isNullAt(i)) s"$key=__HIVE_DEFAULT_PARTITION__"
        else {
          val raw = DiskTransforms.render(kind,
            DiskTransforms.apply(kind, dt, r.get(i, dt)))
          s"$key=${java.net.URLEncoder.encode(raw, "UTF-8").replace("+", "%20")}"
        }
      }

      override def write(record: InternalRow): Unit = {
        val dir =
          if (numBuckets.isDefined) s"__bucket=${bucketId(record)}"
          else if (hasTransforms)
            partAccess.zip(partFuncs).map { case ((c, i, dt), kind) =>
              transformSeg(record, c, i, dt, kind) }.mkString("/")
          else partAccess.map { case (c, i, dt) =>
            s"$c=${renderPartValue(record, i, dt)}" }.mkString("/")
        writerFor(dir).write(proj(record))
        if (bloomAccess.nonEmpty) {
          val bfs = blooms.getOrElseUpdate(dir,
            Array.fill(bloomAccess.length)(
              org.apache.spark.util.sketch.BloomFilter
                .create(bloomItems, bloomFpp)))
          var bi = 0
          while (bi < bloomAccess.length) {
            val (_, i, dt) = bloomAccess(bi)
            if (!record.isNullAt(i)) DiskBloom.feed(bfs(bi), dt, record.get(i, dt))
            bi += 1
          }
        }
      }
      // copy-on-write rewrites hand (metadata, row) pairs
      override def write(metadata: InternalRow, record: InternalRow): Unit =
        write(record)
      override def commit(): WriterCommitMessage = {
        open.values.foreach(_._1.close())
        val rels = open.values.map(_._2).toVector
        // harvest data-skipping stats AND byte sizes from the just-written
        // files HERE, in the executor task that owns them — the driver's
        // commit merges ready-made manifest entries and never opens
        // storage (OPTIMIZE/DESCRIBE DETAIL then serve sizes from the
        // manifest too, no per-file driver status sweep)
        val sizeFs = new HPath(dataDirUri).getFileSystem(conf)
        val stats = rels.iterator.map { rel =>
          rel -> DiskStats.footerStats(
            new HPath(dataDirUri, rel), conf, dataSchema)
        }.toMap
        val sizes = rels.iterator.map { rel =>
          rel -> sizeFs.getFileStatus(new HPath(dataDirUri, rel)).getLen
        }.toMap
        // persist bloom sidecars alongside (same ownership rule)
        if (bloomAccess.nonEmpty) {
          val fs = new HPath(dataDirUri).getFileSystem(conf)
          open.foreach { case (dir, (_, rel)) =>
            blooms.get(dir).foreach { bfs =>
              bloomAccess.zip(bfs).foreach { case ((c, _, _), bf) =>
                DiskBloom.write(fs,
                  DiskBloom.sidecar(new HPath(dataDirUri), rel, c), bf)
              }
            }
          }
        }
        DiskFilesCommit(rels, stats, sizes)
      }
      override def abort(): Unit = {
        open.values.foreach { case (w, rel) =>
          try w.close() catch { case _: Throwable => () }
          new HPath(dataDirUri, rel).getFileSystem(conf)
            .delete(new HPath(dataDirUri, rel), false)
        }
      }
      override def close(): Unit = ()
    }
}

/** parquet-hadoop builder over Spark's own `ParquetWriteSupport` (the
  * WriteSupport Spark's file sink uses) — InternalRow straight to parquet
  * with Spark's physical layout, no intermediate representation. */
class GraftParquetWriterBuilder(path: HPath)
  extends org.apache.parquet.hadoop.ParquetWriter.Builder[
    InternalRow, GraftParquetWriterBuilder](path) {
  override def self(): GraftParquetWriterBuilder = this
  override def getWriteSupport(conf: Configuration)
      : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
    new ParquetWriteSupport
}
