package graft

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.MutableTableManager

/** The engine's session surface — the Spark-side equivalent of the
  * reference's `ExecuteSession` (`qurious/src/execution/session.rs:33-104`):
  * one `sql(...)` entry point covering SELECT plus the DDL/DML/COPY/TVF
  * surface, table registration, and an information_schema.
  *
  * Catalyst replaces the reference's parser/planner/optimizer/executor
  * wholesale (SURVEY.md §7.1); what remains here is the *front door*:
  *   - statements Spark SQL can't run against temp views (CREATE/DROP TABLE,
  *     INSERT/UPDATE/DELETE, COPY FROM) are routed to [[MutableTableManager]],
  *     with embedded SELECT/VALUES/predicates still parsed by Catalyst via
  *     `spark.sql` / `expr` — there is no hand-written expression parser;
  *   - all statement splitting is quote-aware (single-quoted literals with
  *     `''` escapes, double-quoted identifiers), matching the discipline of
  *     the reference's real tokenizer (`sqlparser/src/lexer.rs`) — a literal
  *     containing `' where '` or `'public.'` passes through untouched;
  *   - statements run in ANSI mode so cast overflow / division by zero error
  *     like the reference (`qurious/src/physical/expr/cast.rs:16` uses
  *     `safe: false`; Arrow div kernels error on zero);
  *   - `read_csv('p', delim=>'|') / read_json / read_parquet` table functions
  *     in FROM (reference `qurious/src/planner/sql.rs:751-774,1347-1399`) are
  *     pre-registered as temp views and substituted by name, mirroring the
  *     reference's path-hash pre-registration (`session.rs:169-192`);
  *   - `SHOW TABLES` rewrites to a SELECT over information_schema.tables
  *     (reference `session.rs:77-83`), built on demand from the catalog
  *     (reference `execution/information_schema.rs:12-90`);
  *   - `qurious.public.` / `public.` qualifiers normalize to bare names
  *     (reference default catalog/schema, `execution/config.rs:1-13`);
  *   - un-aliased aggregate outputs are renamed to the reference's display
  *     names — `COUNT(*)` survives the count(1) rewrite, coercion casts are
  *     stripped (`qurious/src/logical/expr/aggregate.rs:17-54,137-160`).
  *
  * @param pathResolver maps file paths in COPY/read_* statements (e.g. the
  *   reference corpus's `./tests/tpch/data/x.tbl` relative paths) to real
  *   locations; identity by default.
  */
final class GraftSession(
    val spark: SparkSession,
    pathResolver: String => String = identity) {

  val tables = new MutableTableManager(spark)

  // native expressions (simhash64, word_shingles, minhash_sig, dot_product,
  // unicode_normalize) are SQL-callable through the front door
  graft.functions.GraftFunctions.register(spark)

  private var tvfCounter = 0

  // prepared-statement store: name -> statement text with $1..$n params
  private val prepared = scala.collection.concurrent.TrieMap.empty[String, String]

  // ---------------------------------------------------------------- sql()

  def sql(query: String): DataFrame = withAnsi {
    val raw = query.trim.stripSuffix(";").trim
    // VACUUM / OPTIMIZE / DESCRIBE HISTORY are ours, not Spark SQL —
    // intercept before catalog passthrough
    if (raw.toUpperCase(Locale.ROOT).startsWith("VACUUM ")) vacuumTable(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("RESTORE "))
      restoreTableVerb(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("OPTIMIZE "))
      optimizeTable(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("DESCRIBE HISTORY "))
      describeHistory(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("SHOW PARTITIONS "))
      showPartitionsVerb(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("ANALYZE TABLE "))
      analyzeTableVerb(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("CONVERT TO GDISK "))
      convertToGdiskVerb(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("DESCRIBE DETAIL "))
      describeDetailVerb(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("ALTER TABLE ") &&
        raw.toUpperCase(Locale.ROOT).contains(" SET PARTITION SPEC"))
      setPartitionSpecVerb(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("CREATE TABLE ") &&
        raw.toUpperCase(Locale.ROOT).contains(" SHALLOW CLONE "))
      shallowCloneVerb(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("CREATE MATERIALIZED VIEW "))
      createMaterializedView(raw)
    else if (raw.toUpperCase(Locale.ROOT).startsWith("REFRESH MATERIALIZED VIEW "))
      refreshMaterializedView(raw)
    else if (addressesV2Catalog(raw)) {
      guardTxDestructiveV2(raw)
      spark.sql(normalizeV2Ddl(raw))
    }
    else sqlFrontDoor(raw)
  }

  /** Statements that could not participate in ROLLBACK are rejected
    * inside a transaction when they target a gdisk OR gmem table: DROP
    * TABLE / DROP NAMESPACE CASCADE delete real data (files / driver
    * rows) unrecoverably — the view-swap tier rejects DROP inside a tx
    * for the same reason — and ALTER TABLE ... RENAME would orphan the
    * BEGIN watermark (rollback would wrongly treat the renamed table as
    * created inside the tx and drop its data). Everything else —
    * INSERT/UPDATE/DELETE/MERGE/TRUNCATE/OPTIMIZE/CREATE/ALTER column
    * changes — rolls back via the snapshot history (gdisk:
    * restoreToVersion, whose pre-images stay on disk until VACUUM —
    * also guarded). */
  /** `q` with leading SQL comments removed — Spark's parser accepts
    * comment-prefixed statements, so verb guards must see past them. */
  private def stripLeadingComments(q: String): String = {
    var s = q.trim
    var changed = true
    while (changed) {
      val t =
        if (s.startsWith("/*")) {
          val e = s.indexOf("*/")
          if (e < 0) "" else s.substring(e + 2).trim
        } else if (s.startsWith("--")) {
          val e = s.indexOf('\n')
          if (e < 0) "" else s.substring(e + 1).trim
        } else s
      changed = t != s
      s = t
    }
    s
  }

  /** Split a (possibly backquoted) multi-part identifier into unquoted
    * parts: `` `gdisk`.ns.`a``b` `` → Seq(gdisk, ns, a`b). The tx guard
    * and routing compare catalog qualifiers on these parts, so quoting a
    * qualifier can never slip a destructive verb past the guard. */
  private def identParts(ident: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < ident.length) {
      val ch = ident.charAt(i)
      if (inQ) {
        if (ch == '`') {
          if (i + 1 < ident.length && ident.charAt(i + 1) == '`') {
            cur.append('`'); i += 1
          } else inQ = false
        } else cur.append(ch)
      } else if (ch == '`') inQ = true
      else if (ch == '.') { parts += cur.toString; cur.clear() }
      else cur.append(ch)
      i += 1
    }
    parts += cur.toString
    parts.toSeq
  }

  private def guardTxDestructiveV2(q0: String): Unit = {
    if (txWatermarks.isEmpty) return
    val q = stripLeadingComments(q0)
    val up = q.toUpperCase(Locale.ROOT).replaceAll("\\s+", " ")
    val verb =
      if (up.startsWith("DROP TABLE")) Some("DROP TABLE")
      else if (up.startsWith("DROP NAMESPACE") || up.startsWith("DROP SCHEMA")
        || up.startsWith("DROP DATABASE")) Some("DROP NAMESPACE")
      else if (up.startsWith("ALTER TABLE") && up.contains(" RENAME TO"))
        Some("ALTER TABLE RENAME")
      else None
    verb.foreach { v =>
      val guarded = (gdiskCatalogs().keys ++ gmemCatalogs().keys)
        .map(_.toLowerCase(Locale.ROOT)).toSet
      val targetsGuarded = MutatingTargetRe.findFirstMatchIn(q) match {
        case Some(m) =>
          // unquote before comparing: `gdisk`.ns.t guards like gdisk.ns.t
          val parts = identParts(m.group(1)).map(_.toLowerCase(Locale.ROOT))
          parts.lengthCompare(2) >= 0 && guarded(parts.head)
        case None => // DROP NAMESPACE has no MutatingTargetRe shape
          val low = up.toLowerCase(Locale.ROOT)
          guarded.exists { c =>
            val cq = java.util.regex.Pattern.quote(c)
            // catalog names are data, never regex; accept the quoted form
            low.matches(s"(?s).*(?:\\b$cq|`$cq`)\\s*\\..*")
          }
      }
      if (targetsGuarded) requireNoTx(s"$v on a V2 catalog table")
    }
  }

  /** Spark SQL rejects bare `VARCHAR` (DATATYPE_MISSING_SIZE); the
    * front-door engines and the reference both accept it as a STRING
    * synonym (`parseType`). DDL routed to a V2 catalog gets the same
    * courtesy: rewrite bare `varchar` type tokens (no length suffix) to
    * `string`, outside single-quoted literals. Only CREATE/ALTER/REPLACE
    * statements are touched — DML never carries type tokens. `text` is
    * NOT rewritten here: it is a live column NAME in the documents
    * corpus, and only positional parsing could tell the two apart. */
  private def normalizeV2Ddl(q: String): String = {
    val up = q.toUpperCase(Locale.ROOT)
    if (!up.startsWith("CREATE ") && !up.startsWith("ALTER ") &&
        !up.startsWith("REPLACE ")) q
    else q.split("'", -1).zipWithIndex.map { case (seg, i) =>
      if (i % 2 == 1) seg
      else seg.replaceAll("(?i)\\bvarchar\\b(?!\\s*\\()", "string")
    }.mkString("'")
  }

  /** `OPTIMIZE <catalog>.<ns>.<table> [WHERE <partition predicate>]
    * [ZORDER BY (c1, c2, ...)] [TARGET n BYTES]` — bin-pack a gdisk
    * table's data files (the maintenance companion of its streaming
    * sink, which lands one small file per epoch per partition); with
    * ZORDER BY, cluster the rewrite on the Morton interleave of the
    * named columns so per-file manifest stats get tight on all of them
    * (Delta's `OPTIMIZE ... ZORDER BY` surface). WHERE scopes the run to
    * the matching identity-partition dirs — evaluated driver-side over
    * parsed dir values, zero file I/O — so the 100 TB standing job
    * compacts yesterday's partition, never the table. One distributed
    * rewrite pass; returns (table, files_before, files_after). */
  private def optimizeTable(q: String): DataFrame = {
    val m = ("""(?is)OPTIMIZE\s+([A-Za-z_][\w.]*)""" +
      """(?:\s+WHERE\s+(.+?))?""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?""" +
      """(?:\s+TARGET\s+(\d+)\s+BYTES)?""" +
      """(\s+PURGE\s+DELETES)?\s*$""").r
      .findFirstMatchIn(q).getOrElse(sys.error(s"cannot parse OPTIMIZE: $q"))
    val parts = m.group(1).split('.')
    val whereSql = Option(m.group(2)).map(_.trim).filter(_.nonEmpty)
    val zorder = Option(m.group(3)).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val target = Option(m.group(4)).map(_.toLong).getOrElse(128L * 1024 * 1024)
    // PURGE DELETES: rewrite EVERY in-scope file carrying a deletion
    // vector regardless of the table's dvRatioThreshold — the explicit
    // "materialize all merge-on-read deletes now" maintenance verb
    val purgeDv = m.group(5) != null
    require(parts.length >= 3,
      "OPTIMIZE targets a catalog table: OPTIMIZE <catalog>.<namespace>.<table>")
    val cat = graft.sources.GraftDiskCatalog.instance(parts.head).getOrElse(
      sys.error(s"OPTIMIZE: '${parts.head}' is not a registered gdisk catalog " +
        "(driver-held gmem tables have no files to compact)"))
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(parts.tail.init, parts.last)
    val t = cat.loadTable(ident).asInstanceOf[graft.sources.GraftDiskTable]
    val (before, after) = t.optimize(target, zorder, whereSql, purgeDv)
    import spark.implicits._
    Seq((m.group(1), before.toLong, after.toLong))
      .toDF("table_name", "files_before", "files_after")
  }

  /** `ALTER TABLE <catalog>.<ns>.<table> SET PARTITION SPEC
    * (days(ts), region, truncate(8, url), ...)` — Iceberg-style
    * PARTITION SPEC EVOLUTION on a gdisk table: one metadata commit, no
    * data rewrite. Old files keep their old dirs (new-spec pruning keeps
    * them conservatively); new writes land in the new layout; `OPTIMIZE`
    * migrates old files lazily. `()` removes partitioning. Constrained
    * to the all-columns-in-files family — identity hive layouts cannot
    * evolve in place (their files lack the partition column bytes). */
  private def setPartitionSpecVerb(q: String): DataFrame = {
    val m = """(?is)ALTER\s+TABLE\s+([A-Za-z_][\w.]*)\s+SET\s+PARTITION\s+SPEC\s*\((.*)\)\s*$""".r
      .findFirstMatchIn(q).getOrElse(sys.error(s"cannot parse SET PARTITION SPEC: $q"))
    val parts = m.group(1).split('.')
    require(parts.length >= 3, "SET PARTITION SPEC targets a catalog table: " +
      "ALTER TABLE <catalog>.<namespace>.<table> SET PARTITION SPEC (...)")
    val cat = graft.sources.GraftDiskCatalog.instance(parts.head).getOrElse(
      sys.error(s"SET PARTITION SPEC: '${parts.head}' is not a registered " +
        "gdisk catalog (gmem tables are driver-held and unpartitioned)"))
    // split spec items on TOP-LEVEL commas (truncate(8, url) nests one)
    val body = m.group(2).trim
    val items = scala.collection.mutable.Buffer.empty[String]
    var depth = 0; val cur = new StringBuilder
    body.foreach {
      case ',' if depth == 0 => items += cur.toString; cur.clear()
      case ch =>
        if (ch == '(') depth += 1 else if (ch == ')') depth -= 1
        cur += ch
    }
    if (cur.toString.trim.nonEmpty || items.nonEmpty) items += cur.toString
    val specs: Seq[(String, String)] = items.toSeq.map(_.trim).filter(_.nonEmpty)
      .map { item =>
        val fm = """(?is)([A-Za-z_]\w*)\s*\((.*)\)""".r.findFirstMatchIn(item)
        fm match {
          case None => (item, graft.sources.DiskTransforms.Identity)
          case Some(f) =>
            val fn = f.group(1).toLowerCase(Locale.ROOT)
            val args = f.group(2).split(',').map(_.trim).filter(_.nonEmpty)
            fn match {
              case "identity" => (args.head, graft.sources.DiskTransforms.Identity)
              case "years" | "year" => (args.head, "years")
              case "months" | "month" => (args.head, "months")
              case "days" | "day" => (args.head, "days")
              case "hours" | "hour" => (args.head, "hours")
              case "truncate" =>
                require(args.length == 2,
                  s"truncate takes (width, column): $item")
                val (w, c) =
                  if (args(0).forall(_.isDigit)) (args(0), args(1))
                  else (args(1), args(0))
                (c, s"truncate:${w.toInt}")
              case other => sys.error(
                s"SET PARTITION SPEC: unknown transform '$other' in $item")
            }
        }
      }
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(parts.tail.init, parts.last)
    val t = cat.loadTable(ident).asInstanceOf[graft.sources.GraftDiskTable]
    val v = t.commitPartitionSpec(specs)
    import spark.implicits._
    Seq((m.group(1),
      specs.map { case (c, k) =>
        if (k == graft.sources.DiskTransforms.Identity) c
        else if (k.startsWith("truncate:"))
          s"truncate(${k.stripPrefix("truncate:")}, $c)"
        else s"$k($c)"
      }.mkString(", "), v))
      .toDF("table_name", "partition_spec", "version")
  }

  /** `SHOW PARTITIONS <catalog>.<ns>.<table>` — the gdisk partition
    * inventory, answered ENTIRELY from the manifest (no storage listing,
    * no Spark job): one row per partition dir with its file count and
    * exact row count. Works on identity-partitioned (hive `col=value`
    * dirs) and hash-bucketed (`__bucket=<id>` dirs) layouts. */
  private def showPartitionsVerb(q: String): DataFrame = {
    val m = """(?is)SHOW\s+PARTITIONS\s+([A-Za-z_][\w.]*)\s*""".r
      .findFirstMatchIn(q).getOrElse(sys.error(s"cannot parse SHOW PARTITIONS: $q"))
    val parts = m.group(1).split('.')
    require(parts.length >= 3, "SHOW PARTITIONS targets a catalog table: " +
      "SHOW PARTITIONS <catalog>.<namespace>.<table>")
    val cat = graft.sources.GraftDiskCatalog.instance(parts.head).getOrElse(
      sys.error(s"SHOW PARTITIONS: '${parts.head}' is not a registered " +
        "gdisk catalog (gmem tables are driver-held and unpartitioned)"))
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(parts.tail.init, parts.last)
    val t = cat.loadTable(ident).asInstanceOf[graft.sources.GraftDiskTable]
    require(t.isPartitioned,
      s"SHOW PARTITIONS: ${m.group(1)} is not a partitioned table")
    import spark.implicits._
    t.partitionSummary.toDF("partition", "file_count", "row_count")
  }

  /** `DESCRIBE DETAIL <catalog>.<ns>.<table>` — one row of table-level
    * inventory for a gdisk table: format, location, current version and
    * its commit time, file count, total data bytes, exact row count (when
    * every file carries stats), partition/bucket layout, and properties.
    * Manifest arithmetic plus one driver-side file-status sweep — no
    * Spark job. */
  private def describeDetailVerb(q: String): DataFrame = {
    val m = """(?is)DESCRIBE\s+DETAIL\s+([A-Za-z_][\w.]*)\s*""".r
      .findFirstMatchIn(q).getOrElse(sys.error(s"cannot parse DESCRIBE DETAIL: $q"))
    val parts = m.group(1).split('.')
    require(parts.length >= 3, "DESCRIBE DETAIL targets a catalog table: " +
      "DESCRIBE DETAIL <catalog>.<namespace>.<table>")
    val cat = graft.sources.GraftDiskCatalog.instance(parts.head).getOrElse(
      sys.error(s"DESCRIBE DETAIL: '${parts.head}' is not a registered " +
        "gdisk catalog (use DESCRIBE / SHOW CREATE TABLE for other tiers)"))
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(parts.tail.init, parts.last))
      .asInstanceOf[graft.sources.GraftDiskTable]
    val d = t.detail
    import spark.implicits._
    Seq(d).toDF("format", "location", "version", "committed_at_ms",
      "num_files", "size_bytes", "num_rows", "partition_columns",
      "num_buckets", "properties",
      "num_deletion_vectors", "num_deleted_rows")
  }

  /** `CREATE TABLE <cat>.<ns>.<t> SHALLOW CLONE <cat>.<ns>.<src>
    * [VERSION AS OF v]` — zero-copy experiment branch of a gdisk table:
    * the clone's data files, bloom sidecars, and deletion-vector sidecars
    * HARD-LINK into its own dir (bytes shared until the last referencing
    * table drops them), its commit log starts fresh at v0, and both
    * tables evolve/OPTIMIZE/VACUUM/DROP independently from then on.
    * Returns (table_name, source, version_cloned, num_files). */
  private def shallowCloneVerb(q: String): DataFrame = {
    val m = ("""(?is)CREATE\s+TABLE\s+([A-Za-z_][\w.]*)\s+SHALLOW\s+CLONE\s+""" +
      """([A-Za-z_][\w.]*)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*$""").r
      .findFirstMatchIn(q).getOrElse(sys.error(s"cannot parse SHALLOW CLONE: $q"))
    val dst = m.group(1).split('.')
    val srcParts = m.group(2).split('.')
    val version = Option(m.group(3)).map(_.toLong)
    require(dst.length >= 3 && srcParts.length >= 3,
      "SHALLOW CLONE targets catalog tables: CREATE TABLE " +
        "<catalog>.<ns>.<t> SHALLOW CLONE <catalog>.<ns>.<src>")
    val dstCat = graft.sources.GraftDiskCatalog.instance(dst.head).getOrElse(
      sys.error(s"SHALLOW CLONE: '${dst.head}' is not a registered gdisk " +
        "catalog (only file-backed tables can share bytes)"))
    val srcCat = graft.sources.GraftDiskCatalog.instance(srcParts.head)
      .getOrElse(sys.error(
        s"SHALLOW CLONE: '${srcParts.head}' is not a registered gdisk catalog"))
    val src = srcCat.loadTable(org.apache.spark.sql.connector.catalog
      .Identifier.of(srcParts.tail.init, srcParts.last))
      .asInstanceOf[graft.sources.GraftDiskTable]
    val t = dstCat.cloneTable(src,
      org.apache.spark.sql.connector.catalog.Identifier
        .of(dst.tail.init, dst.last), version)
    import spark.implicits._
    Seq((m.group(1), m.group(2),
      version.getOrElse(src.log.latestVersion()),
      t.liveFiles.length.toLong))
      .toDF("table_name", "source", "version_cloned", "num_files")
  }

  /** `CONVERT TO GDISK '<path>' AS <catalog>.<ns>.<table>` — adopt an
    * existing parquet file/directory as a gdisk table WITHOUT rewriting
    * data: files rename into the table dir (O(1) metadata per file,
    * same-filesystem; the source location is consumed), hive dirs become
    * identity partition columns, skipping stats harvest from footers in
    * one distributed job. Returns (table_name, files, row_count). */
  private def convertToGdiskVerb(q: String): DataFrame = {
    // CONVERT consumes its source files (rename into the table dir); a
    // rollback would drop the table and DELETE the adopted data
    requireNoTx("CONVERT TO GDISK")
    val m = ("""(?is)CONVERT\s+TO\s+GDISK\s+'([^']+)'\s+AS\s+""" +
      """([A-Za-z_][\w.]*)\s*""").r
      .findFirstMatchIn(q).getOrElse(sys.error(s"cannot parse CONVERT: $q"))
    val parts = m.group(2).split('.')
    require(parts.length >= 3, "CONVERT TO GDISK targets a catalog table: " +
      "CONVERT TO GDISK '<path>' AS <catalog>.<namespace>.<table>")
    val cat = graft.sources.GraftDiskCatalog.instance(parts.head).getOrElse(
      sys.error(s"CONVERT TO GDISK: '${parts.head}' is not a registered " +
        "gdisk catalog"))
    val t = cat.convertFromParquet(
      org.apache.spark.sql.connector.catalog.Identifier
        .of(parts.tail.init, parts.last),
      m.group(1))
    import spark.implicits._
    val (files, rows) = t.convertSummary
    Seq((m.group(2), files, rows.getOrElse(-1L)))
      .toDF("table_name", "files", "row_count")
  }

  /** `ANALYZE TABLE <catalog>.<ns>.<table> COMPUTE [APPROXIMATE]
    * STATISTICS` — ONE distributed aggregation over the table computing
    * per-column NDV (exact `count(distinct)` by default; HLL
    * `approx_count_distinct` under APPROXIMATE — the 100 TB choice, where
    * exact multi-distinct's Expand multiplies scan rows by column count)
    * plus avg/max byte length for strings, committed to the gdisk
    * manifest as a metadata-only version. Every scan then serves the NDVs
    * through `Statistics.columnStats()` alongside manifest-merged
    * min/max/nullCount, feeding Spark CBO join-reorder and selectivity
    * estimation. Returns one row per analyzed column. */
  private def analyzeTableVerb(q: String): DataFrame = {
    val m = ("""(?is)ANALYZE\s+TABLE\s+([A-Za-z_][\w.]*)\s+COMPUTE\s+""" +
      """(APPROXIMATE\s+)?STATISTICS\s*""").r
      .findFirstMatchIn(q).getOrElse(sys.error(s"cannot parse ANALYZE: $q"))
    val approx = m.group(2) != null
    val parts = m.group(1).split('.')
    require(parts.length >= 3, "ANALYZE TABLE targets a catalog table: " +
      "ANALYZE TABLE <catalog>.<namespace>.<table> COMPUTE STATISTICS")
    val cat = graft.sources.GraftDiskCatalog.instance(parts.head).getOrElse(
      sys.error(s"ANALYZE TABLE: '${parts.head}' is not a registered gdisk " +
        "catalog (gmem tables are dimension-scale; CBO stats target the " +
        "disk tier)"))
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(parts.tail.init, parts.last)
    val t = cat.loadTable(ident).asInstanceOf[graft.sources.GraftDiskTable]
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = spark.table(m.group(1))
    val fields = t.schema().fields.toSeq.filter(_.dataType match {
      case _: NumericType | StringType | DateType | BooleanType |
          TimestampType | TimestampNTZType => true
      case _ => false
    })
    require(fields.nonEmpty, s"ANALYZE TABLE: no analyzable columns in " +
      s"${m.group(1)}")
    // numeric columns additionally get an EQUI-HEIGHT HISTOGRAM: bin
    // endpoints from one percentile sketch in the same pass, per-bin
    // NDVs from one ApproxCountDistinctForIntervals pass (Spark's own
    // ANALYZE ... FOR COLUMNS machinery) — so skewed-predicate
    // selectivity estimates follow the data, not uniformity
    val HistBins = 16
    val histFields = fields.filter(_.dataType match {
      case _: NumericType | DateType | TimestampType | TimestampNTZType =>
        true
      case _ => false
    })
    // histogram domain must match catalyst's EstimationUtils.toDouble
    // internal representation: numerics as-is, dates as epoch DAYS,
    // timestamps as epoch MICROS (NTZ micros equal the LTZ cast's in
    // the UTC sessions every graft entry point pins)
    def histCol(f: StructField): org.apache.spark.sql.Column = f.dataType match {
      case DateType => unix_date(col(f.name)).cast("double")
      case TimestampType => unix_micros(col(f.name)).cast("double")
      case TimestampNTZType =>
        unix_micros(col(f.name).cast("timestamp")).cast("double")
      case _ => col(f.name).cast("double")
    }
    val pcts = (0 to HistBins).map(i => i.toDouble / HistBins)
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val nd = if (approx) approx_count_distinct(c) else countDistinct(c)
      Seq(nd.cast("long").as(s"ndv__${f.name}")) ++ (f.dataType match {
        case StringType => Seq(
          avg(octet_length(c)).cast("long").as(s"avg__${f.name}"),
          max(octet_length(c)).cast("long").as(s"max__${f.name}"))
        case _ => Nil
      }) ++ (if (histFields.contains(f)) Seq(
        count(c).cast("long").as(s"cnt__${f.name}"),
        percentile_approx(histCol(f),
          array(pcts.map(lit): _*), lit(10000)).as(s"pct__${f.name}"))
      else Nil)
    }
    // one row, O(columns) cells — the distributed job's only driver traffic
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def cell(n: String): Option[Long] = {
      val i = row.fieldIndex(n)
      if (row.isNullAt(i)) None else Some(row.getLong(i))
    }
    // endpoints per histogram column (null/empty column → no histogram)
    val endpoints: Map[String, (Long, Seq[Double])] = histFields.flatMap { f =>
      val i = row.fieldIndex(s"pct__${f.name}")
      val nonNull = cell(s"cnt__${f.name}").getOrElse(0L)
      if (row.isNullAt(i) || nonNull == 0) None
      else {
        val eps = row.getSeq[Double](i)
        if (eps.length == HistBins + 1) Some(f.name -> (nonNull, eps))
        else None
      }
    }.toMap
    // pass 2: per-bin distinct counts over the fixed endpoints, ONE
    // distributed aggregation for all columns (O(cols × bins) result)
    val hists: Map[String, graft.sources.DiskHistogram] =
      if (endpoints.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.catalyst.expressions.aggregate.ApproxCountDistinctForIntervals
        import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal => CLit}
        val fieldOf = histFields.map(f => f.name -> f).toMap
        val binAggs: Seq[org.apache.spark.sql.Column] =
          endpoints.toSeq.map { case (name, (_, eps)) =>
            org.apache.spark.sql.graftshim.columnOf(
              ApproxCountDistinctForIntervals(
                org.apache.spark.sql.graftshim.expressionOf(
                  histCol(fieldOf(name))),
                CreateArray(eps.map(e => CLit(e)
                  : org.apache.spark.sql.catalyst.expressions.Expression)),
                0.05d).toAggregateExpression()).as(s"ndvs__$name")
          }
        val rowB = df.agg(binAggs.head, binAggs.tail: _*).collect()(0)
        endpoints.map { case (name, (nonNull, eps)) =>
          val ndvs = rowB.getSeq[Long](rowB.fieldIndex(s"ndvs__$name"))
          name -> graft.sources.DiskHistogram(
            nonNull.toDouble / HistBins,
            (0 until HistBins).map(i =>
              graft.sources.DiskBin(eps(i), eps(i + 1),
                math.max(1L, ndvs(i)))))
        }
      }
    val stats = fields.map { f =>
      f.name -> graft.sources.DiskNdv(
        cell(s"ndv__${f.name}").getOrElse(0L),
        if (f.dataType == StringType) cell(s"avg__${f.name}") else None,
        if (f.dataType == StringType) cell(s"max__${f.name}") else None,
        hists.get(f.name))
    }.toMap
    t.commitAnalyzeStats(stats)
    import spark.implicits._
    fields.map(f => (f.name, stats(f.name).ndv,
        stats(f.name).avgLen, stats(f.name).maxLen))
      .sortBy(_._1)
      .toDF("column_name", "ndv", "avg_len", "max_len")
  }

  /** `VACUUM <catalog>.<ns>.<table> [RETAIN n VERSIONS | RETAIN n HOURS]`
    * — explicit retention compaction. gmem: keeps the newest `n` commit
    * snapshots (default 1) and drops the streaming append log (fresh
    * streams start at the new base; see
    * [[graft.sources.GraftMemCatalog.DefaultRetainVersions]] for the
    * automatic retention that runs on every commit). gdisk: also accepts
    * the time-based form — every version committed within the last `n`
    * hours survives (commit stamps are monotonic, so it reduces to a
    * count-based vacuum of the newest k). */
  private def vacuumTable(q: String): DataFrame = {
    // inside a tx, VACUUM could sweep the very snapshots ROLLBACK needs
    // (gmem history versions, gdisk pre-image data files)
    requireNoTx("VACUUM")
    val m = ("""(?is)VACUUM\s+([A-Za-z_][\w.]*)""" +
      """(?:\s+RETAIN\s+(\d+)\s+(VERSIONS?|HOURS?))?\s*""").r
      .findFirstMatchIn(q).getOrElse(sys.error(s"cannot parse VACUUM: $q"))
    val parts = m.group(1).split('.')
    val n = Option(m.group(2)).map(_.toInt).getOrElse(1)
    val hours = Option(m.group(3))
      .exists(_.toUpperCase(Locale.ROOT).startsWith("HOUR"))
    val retain = if (hours) 1 else n
    require(parts.length >= 3,
      "VACUUM targets a catalog table: VACUUM <catalog>.<namespace>.<table>")
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(parts.tail.init, parts.last)
    val retained: Long = graft.sources.GraftMemCatalog.instance(parts.head) match {
      case Some(cat) =>
        require(!hours,
          "VACUUM ... RETAIN n HOURS applies to gdisk tables (gmem " +
            "snapshots retain by count: RETAIN n VERSIONS)")
        val t = cat.loadTable(ident).asInstanceOf[graft.sources.GraftMemTable]
        t.vacuum(retain)
        t.retainedHistoryCount.toLong
      case None => graft.sources.GraftDiskCatalog.instance(parts.head) match {
        case Some(cat) =>
          val t = cat.loadTable(ident).asInstanceOf[graft.sources.GraftDiskTable]
          if (hours)
            t.log.vacuumOlderThan(System.currentTimeMillis() - n * 3600000L)
          else t.log.vacuum(retain)
          t.log.versions().length.toLong
        case None => sys.error(
          s"VACUUM: '${parts.head}' is not a registered gmem/gdisk catalog " +
            "(front-door tables version through DESCRIBE HISTORY / RESTORE " +
            "and need no vacuum — their snapshots are lazy plans, not stored rows)")
      }
    }
    import spark.implicits._
    Seq((m.group(1), retained)).toDF("table_name", "retained_versions")
  }

  /** `RESTORE [TABLE] <name> [TO] VERSION AS OF <v>` — roll a table back
    * (or forward) to a prior version AS A NEW COMMIT, across all three
    * tiers: front-door view-swap tables (ROLLBACK history entry), gmem
    * (snapshot re-serve within the retention horizon), gdisk (metadata-
    * only manifest commit re-serving version v's files/schema/stats —
    * zero file I/O; the CDC feed sees the diff). History stays
    * append-only everywhere: a restore is itself restorable. */
  private def restoreTableVerb(q: String): DataFrame = {
    val m = ("""(?is)RESTORE\s+(?:TABLE\s+)?([A-Za-z_][\w.]*)\s+""" +
      """(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*""").r
      .findFirstMatchIn(q).getOrElse(sys.error(
        s"cannot parse RESTORE — RESTORE [TABLE] <name> [TO] VERSION AS OF <v>: $q"))
    val name = m.group(1)
    val v = m.group(2).toLong
    val parts = name.split('.')
    val newVersion: Long =
      if (parts.length >= 3) {
        val ident = org.apache.spark.sql.connector.catalog.Identifier
          .of(parts.tail.init, parts.last)
        graft.sources.GraftMemCatalog.instance(parts.head) match {
          case Some(cat) =>
            val t = cat.loadTable(ident).asInstanceOf[graft.sources.GraftMemTable]
            t.restoreTo(v)
            t.historyLength - 1
          case None => graft.sources.GraftDiskCatalog.instance(parts.head) match {
            case Some(cat) =>
              cat.loadTable(ident).asInstanceOf[graft.sources.GraftDiskTable]
                .restoreToVersion(v)
            case None => sys.error(
              s"RESTORE: '${parts.head}' is not a registered gmem/gdisk catalog")
          }
        }
      } else {
        tables.restore(name, v.toInt)
        tables.versionCount(name).toLong - 1
      }
    import spark.implicits._
    Seq((name, v, newVersion))
      .toDF("table_name", "restored_version", "new_version")
  }

  /** `CREATE MATERIALIZED VIEW <cat>.<ns>.<mv> AS SELECT <keys...>,
    * count(*) AS cnt, sum(<expr>) AS total FROM <cat>.<ns>.<src> GROUP BY
    * <keys...>` — the front-door surface over
    * [[graft.ops.CdcMvOps]]: creates the rollup table (key types copied
    * from the source schema) and persists the definition in the MV's own
    * manifest properties, so `REFRESH MATERIALIZED VIEW` works from any
    * session with no driver-side registry. The additive count+sum shape
    * is the one incremental maintenance can fold exactly from the CDC
    * feed; anything else errors with the supported grammar. */
  private def createMaterializedView(q: String): DataFrame = {
    val shape = "CREATE MATERIALIZED VIEW <catalog>.<ns>.<mv> AS SELECT " +
      "<keys...>, count(*) AS cnt, sum(<expr>) AS total " +
      "FROM <catalog>.<ns>.<src> GROUP BY <keys...>"
    val m = ("""(?is)CREATE\s+MATERIALIZED\s+VIEW\s+([A-Za-z_][\w.]*)\s+AS\s+""" +
      """SELECT\s+(.*)\s+FROM\s+([A-Za-z_][\w.]*)\s+GROUP\s+BY\s+(.*)""").r
      .findFirstMatchIn(q)
      .getOrElse(sys.error(s"cannot parse CREATE MATERIALIZED VIEW — $shape"))
    val mv = m.group(1)
    val src = m.group(3)
    val keys = m.group(4).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sel = splitTopLevel(m.group(2), ',').map(_.trim)
    require(sel.length == keys.length + 2 &&
      sel.take(keys.length).map(_.toLowerCase(Locale.ROOT)) ==
        keys.map(_.toLowerCase(Locale.ROOT)) &&
      """(?is)count\s*\(\s*\*\s*\)\s+AS\s+cnt""".r
        .findFirstIn(sel(keys.length)).contains(sel(keys.length)),
      s"unsupported MV select list — $shape")
    val sumM = """(?is)sum\s*\((.*)\)\s+AS\s+total""".r
      .findFirstMatchIn(sel.last)
      .getOrElse(sys.error(s"unsupported MV aggregate — $shape"))
    val valueExpr = sumM.group(1).trim
    val srcSchema = graft.ops.CdcMvOps.diskTable(spark, src).schema()
    val keyDdl = keys.map { k =>
      val f = srcSchema.fields.find(_.name.equalsIgnoreCase(k)).getOrElse(
        sys.error(s"MV key column '$k' is not a column of $src"))
      s"${f.name} ${f.dataType.sql}"
    }.mkString(", ")
    def esc(s: String) = s.replace("'", "''")
    spark.sql(graft.ops.CdcMvOps.createRollupDdl(mv, keyDdl) +
      s""" TBLPROPERTIES(
        'graft.mv.src' = '${esc(src)}',
        'graft.mv.keys' = '${esc(keys.mkString(","))}',
        'graft.mv.value' = '${esc(valueExpr)}')""")
    // marker file: the auto-rewrite rule discovers MVs from the
    // O(#MVs) marker dir, never by sweeping the catalog's tables
    val mvParts = mv.split('.')
    graft.sources.GraftDiskCatalog.instance(mvParts.head).foreach(
      _.writeMvMarker(org.apache.spark.sql.connector.catalog.Identifier
        .of(mvParts.tail.init, mvParts.last)))
    graft.plans.MvRewrite.invalidate() // discoverable by auto-rewrite now
    import spark.implicits._
    Seq((mv, src)).toDF("mv_name", "source_table")
  }

  /** `REFRESH MATERIALIZED VIEW <cat>.<ns>.<mv>` — one incremental fold
    * of the source commits since the MV's watermark (see
    * [[graft.ops.CdcMvOps.refreshRollup]] for the exactly-once
    * construction). Returns the applied source version. */
  private def refreshMaterializedView(q: String): DataFrame = {
    val m = """(?is)REFRESH\s+MATERIALIZED\s+VIEW\s+([A-Za-z_][\w.]*)\s*""".r
      .findFirstMatchIn(q)
      .getOrElse(sys.error(s"cannot parse REFRESH MATERIALIZED VIEW: $q"))
    val mv = m.group(1)
    val props = graft.ops.CdcMvOps.diskTable(spark, mv).properties()
    val src = Option(props.get("graft.mv.src")).getOrElse(sys.error(
      s"$mv is not a materialized view (no graft.mv.* definition in its " +
        "manifest properties — create it with CREATE MATERIALIZED VIEW)"))
    val keys = props.get("graft.mv.keys").split(',').toSeq
    val applied = graft.ops.CdcMvOps.refreshRollup(
      spark, src, mv, keys, props.get("graft.mv.value"))
    import spark.implicits._
    Seq((mv, applied)).toDF("mv_name", "applied_version")
  }

  /** True when the statement addresses a registered DataSourceV2 catalog by
    * name (`gmem.lake.t` — [[graft.sources.GraftMemCatalog]] or any other
    * `spark.sql.catalog.*` plugin): those names belong to Spark's OWN
    * resolver, so the statement passes through untouched. The front-door
    * manager owns only session-local bare names (plus the reference's
    * `qurious.public` aliases, which are stripped, not catalogs).
    *
    * Routing is by the statement's TARGET, not any mention: a DDL/DML verb
    * whose sink is a bare front-door name stays with the front door even
    * when its source side reads a catalog table — `INSERT INTO session_t
    * SELECT * FROM gmem.ns.t` and `CREATE TABLE local_t AS SELECT ... FROM
    * gmem.ns.t` are front-door statements (the embedded SELECT re-enters
    * [[sql]] and passes through on its own), while `INSERT INTO gmem.ns.t
    * SELECT * FROM session_t` belongs to Spark (temp views resolve fine as
    * V2 write sources). Pure queries mentioning a catalog name anywhere
    * still pass through whole — the front door's rewrites don't need to see
    * them. Detection is quote-aware — `'...gmem. ...'` literals and
    * `"gmem"` quoted identifiers never trigger the passthrough — and the
    * per-catalog patterns are compiled once per catalog-name set, not per
    * statement. (A table ALIAS spelled exactly like a registered catalog
    * would still match; don't alias tables with catalog names.) */
  private def addressesV2Catalog(q: String): Boolean = {
    val cats = spark.conf.getAll.keysIterator
      .filter(_.startsWith("spark.sql.catalog."))
      .map(_.stripPrefix("spark.sql.catalog."))
      .filter(n => n.nonEmpty && !n.contains('.'))
      .toSet
    if (cats.isEmpty) false
    else {
      if (v2CatalogPatterns._1 != cats)
        v2CatalogPatterns = (cats, cats.toSeq.sorted.map { c =>
          val cq = java.util.regex.Pattern.quote(c)
          // accept the backquoted spelling too: `gdisk`.ns.t is the same
          // catalog reference as gdisk.ns.t and must route (and be
          // tx-guarded) identically
          java.util.regex.Pattern.compile(s"(?is)(?:\\b$cq|`$cq`)\\s*\\.")
        })
      val unquoted = new StringBuilder
      mapUnquoted(q) { seg => unquoted.append(seg).append(' '); seg }
      val mentionsCatalog = v2CatalogPatterns._2.exists(_.matcher(unquoted).find())
      if (!mentionsCatalog) false
      else MutatingTargetRe.findFirstMatchIn(q) match {
        case Some(m) => // mutating/DDL verb: route by the sink's qualifier
          val parts = identParts(m.group(1)).map(_.toLowerCase(Locale.ROOT))
          parts.lengthCompare(2) >= 0 &&
            cats.exists(c => parts.head == c.toLowerCase(Locale.ROOT))
        case None => true // pure query / other verb: pass through whole
      }
    }
  }

  /** Leading mutating/DDL verb + its target identifier — used to decide
    * whether a catalog-mentioning statement's SINK is the catalog's. */
  private val MutatingTargetRe =
    ("""(?is)^\s*(?:CREATE\s+(?:OR\s+REPLACE\s+)?(?:TABLE|VIEW)\s+(?:IF\s+NOT\s+EXISTS\s+)?""" +
      """|DROP\s+(?:TABLE|VIEW)\s+(?:IF\s+EXISTS\s+)?|INSERT\s+INTO\s+|UPDATE\s+""" +
      """|DELETE\s+FROM\s+|MERGE\s+INTO\s+|ALTER\s+TABLE\s+|TRUNCATE\s+(?:TABLE\s+)?)""" +
      """([A-Za-z_][\w.]*|`[^`]+`(?:\.(?:[\w]+|`[^`]+`))*)""").r

  @volatile private var v2CatalogPatterns
      : (Set[String], Seq[java.util.regex.Pattern]) = (Set.empty, Nil)

  private def sqlFrontDoor(raw: String): DataFrame = {
    val q = stripQualifiers(raw)
    val upper = q.toUpperCase(Locale.ROOT)
    if (upper.startsWith("CREATE TABLE")) createTable(q)
    else if (upper.startsWith("DROP TABLE")) dropTable(q)
    else if (upper.startsWith("CREATE VIEW") ||
             upper.startsWith("CREATE OR REPLACE VIEW")) createView(q)
    else if (upper.startsWith("DROP VIEW")) dropView(q)
    else if (upper.startsWith("CREATE SCHEMA") || upper.startsWith("CREATE DATABASE"))
      // The reference parses these but its planner todo!()s them
      // (`qurious/src/planner/sql.rs:187`); we complete the semantics:
      // schemas are namespaces over the single session catalog, qualified
      // names normalize to a mangled flat name (see [[stripQualifiers]]).
      createSchema(q)
    else if (upper.startsWith("DROP SCHEMA") || upper.startsWith("DROP DATABASE"))
      dropSchema(q)
    else if (upper.startsWith("ALTER TABLE")) alterTable(q)
    else if (upper.startsWith("TRUNCATE ")) truncateTable(q)
    else if (upper.startsWith("INSERT INTO")) insertInto(q)
    else if (upper.startsWith("DELETE FROM")) deleteFrom(q)
    else if (upper.startsWith("UPDATE ")) update(q)
    else if (upper.startsWith("MERGE INTO")) mergeInto(q)
    else if (upper.startsWith("COPY ")) {
      if (indexOfTopLevelKeyword(q, "TO") >= 0 && indexOfTopLevelKeyword(q, "FROM") < 0)
        copyTo(q)
      else copyFrom(q)
    }
    else if (upper.startsWith("SET ")) setStatement(q)
    else if (upper.startsWith("RESET ")) resetStatement(q)
    else if (upper.startsWith("EXPORT DATABASE")) exportDatabase(q)
    else if (upper.startsWith("IMPORT DATABASE")) importDatabase(q)
    else if (upper == "BEGIN" || upper == "BEGIN TRANSACTION" ||
             upper == "START TRANSACTION") beginTx()
    else if (upper == "COMMIT") commitTx()
    else if (upper == "ROLLBACK") rollbackTx()
    else if (upper.startsWith("PREPARE ")) prepareStatement(q)
    else if (upper.startsWith("EXECUTE ")) executePrepared(q)
    else if (upper.startsWith("DEALLOCATE ")) deallocate(q)
    else if (upper.startsWith("SHOW CREATE TABLE ")) showCreateTable(q)
    else if (upper.startsWith("SHOW TABLES")) showTables()
    else if (upper.startsWith("SHOW SCHEMAS") || upper.startsWith("SHOW DATABASES"))
      showSchemas()
    else if (upper.startsWith("SHOW COLUMNS")) showColumns(q)
    else if (upper.startsWith("DESCRIBE HISTORY ")) describeHistory(q)
    else if (upper.startsWith("DESCRIBE ") || upper.startsWith("DESC "))
      describeTable(q)
    else if (upper.startsWith("EXPLAIN ")) explainStatement(q)
    else if (upper.matches("(?s)SELECT\\s+DISTINCT\\s+ON\\s*\\(.*")) distinctOn(q)
    else if (upper.startsWith("SELECT") &&
             indexOfTopLevelKeyword(q, "ASOF") >= 0) asofJoinSql(q)
    else if ((upper.startsWith("SELECT") || upper.startsWith("WITH")) &&
             indexOfTopLevelKeyword(q, "QUALIFY") >= 0) qualifyFilter(q)
    else compatNames(spark.sql(rewriteQuery(q)))
  }

  /** Register an immutable source table (reference `register_table`,
    * `session.rs:106-115`). */
  def registerTable(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name.toLowerCase(Locale.ROOT))

  /** Reference UDF surface parity (`UserDefinedFunction`,
    * `qurious/src/functions/mod.rs:10-21`): register a named scalar function
    * usable from SQL. Catalyst-native expressions are preferred for engine
    * builtins; this is the user-extension hook. */
  def registerUdf[A, B](name: String, f: A => B)(
      implicit ta: scala.reflect.runtime.universe.TypeTag[A],
      tb: scala.reflect.runtime.universe.TypeTag[B]): Unit =
    spark.udf.register(name, f)

  /** Front-door statements run in ANSI mode (cast overflow and integer/
    * decimal division-by-zero raise, like the reference / DuckDB). ANSI-ness
    * is baked into expressions at parse/analysis time, so restoring the conf
    * afterwards does not un-ANSI the returned (lazy) DataFrame. */
  private def withAnsi[A](f: => A): A = {
    val key = "spark.sql.ansi.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // ------------------------------------------------------------------ DDL

  /** Unquoted identifier or double-quoted identifier. */
  private val Ident = """([A-Za-z_][\w]*|"[^"]+")"""

  private def unquoteIdent(s: String): String = {
    val raw =
      if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1)
      else s
    raw.toLowerCase(Locale.ROOT)
  }

  private val CreateRe =
    ("""(?is)CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?""" + Ident + """\s*(.*)""").r

  private def createTable(q: String): DataFrame = q match {
    case CreateRe(ifNot, name0, rest0) =>
      val name = unquoteIdent(name0)
      val ifNotExists = ifNot != null
      val rest = rest0.trim
      // `AS` may be followed by any whitespace (newline included) — a
      // multi-line CTAS is the common pretty-printed form
      val AsRe = """(?is)^AS\s+(.*)""".r
      if (rest.startsWith("(")) {
        val (inner, tail) = matchParen(rest)
        val (schema, defaults, checks, uniques, fks) = parseColumnDefs(inner)
        val data = tail.trim match {
          case AsRe(sel) => Some(sql(sel))
          case _ => None
        }
        tables.create(name, schema, defaults, data, ifNotExists,
          checks = checks, uniques = uniques, foreignKeys = fks)
      } else rest match {
        case AsRe(sel) =>
          val df = sql(sel)
          tables.create(name, df.schema, Map.empty, Some(df), ifNotExists)
        case _ => sys.error(s"cannot parse CREATE TABLE: $q")
      }
      recordMember(name)
      spark.emptyDataFrame
    case _ => sys.error(s"cannot parse CREATE TABLE: $q")
  }

  private val DropRe =
    ("""(?is)DROP\s+TABLE\s+(IF\s+EXISTS\s+)?""" + Ident + """\s*""").r

  private def dropTable(q: String): DataFrame = q match {
    case DropRe(ifEx, name) =>
      if (tables.exists(unquoteIdent(name))) requireNoTx("DROP TABLE")
      tables.drop(unquoteIdent(name), ifEx != null)
      removeMember(unquoteIdent(name))
      spark.emptyDataFrame
    case _ => sys.error(s"cannot parse DROP TABLE: $q")
  }

  // -------------------------------------------------------------- schemas

  /** Registered schema namespaces. Spark temp views live in one flat
    * namespace, so `sch.tbl` mangles to `sch__tbl` (quote-aware, known
    * schemas only — an unknown qualifier errors at resolution, which is
    * the right message for a schema that was never created). The
    * reference parses CREATE SCHEMA but its planner `todo!()`s it
    * (`qurious/src/planner/sql.rs:187`); we execute it. */
  private val schemas = scala.collection.mutable.LinkedHashSet[String]("public")

  /** Flat names that were CREATED through a `sch.tbl` qualifier (or while
    * their schema existed) — the authoritative membership record. A table
    * literally named `sch__x` that predates `CREATE SCHEMA sch` is NOT a
    * member, so DROP SCHEMA ... CASCADE can never claim it by prefix
    * accident. */
  private val schemaMembers =
    scala.collection.mutable.Map[String, scala.collection.mutable.Set[String]]()

  /** Record `flat` as a member of its schema iff that schema is currently
    * registered (called at CREATE TABLE/VIEW time). */
  private def recordMember(flat: String): Unit =
    flat.split("__", 2) match {
      case Array(s, rest) if rest.nonEmpty && schemas.contains(s) && s != "public" =>
        schemaMembers.getOrElseUpdate(s, scala.collection.mutable.Set()) += flat
      case _ =>
    }

  private def removeMember(flat: String): Unit =
    schemaMembers.values.foreach(_ -= flat)

  private val CreateSchemaRe =
    ("""(?is)CREATE\s+(?:SCHEMA|DATABASE)\s+(IF\s+NOT\s+EXISTS\s+)?""" + Ident + """\s*""").r
  private val DropSchemaRe =
    ("""(?is)DROP\s+(?:SCHEMA|DATABASE)\s+(IF\s+EXISTS\s+)?""" + Ident +
      """\s*(?i:(CASCADE|RESTRICT))?\s*""").r

  private def createSchema(q: String): DataFrame = q match {
    case CreateSchemaRe(ifNot, name0) =>
      val name = unquoteIdent(name0)
      require(name != "information_schema", "reserved schema name: information_schema")
      if (schemas.contains(name)) {
        if (ifNot == null) sys.error(s"schema already exists: $name")
      } else schemas += name
      spark.emptyDataFrame
    case _ => sys.error(s"cannot parse CREATE SCHEMA: $q")
  }

  private def dropSchema(q: String): DataFrame = q match {
    case DropSchemaRe(ifEx, name0, mode) =>
      val name = unquoteIdent(name0)
      if (name == "public") sys.error("cannot drop the default schema: public")
      if (!schemas.contains(name)) {
        if (ifEx == null) sys.error(s"schema not found: $name")
      } else {
        // only RECORDED members — a prefix scan would also claim an
        // unrelated table a user literally named `sch__x` before the
        // schema existed
        val members = schemaMembers.getOrElse(name, scala.collection.mutable.Set())
          .toSeq.filter(spark.catalog.tableExists)
        if (members.nonEmpty &&
            (mode == null || !mode.equalsIgnoreCase("CASCADE")))
          sys.error(s"schema not empty: $name (${members.size} tables — use DROP SCHEMA $name CASCADE)")
        members.foreach { t =>
          if (tables.exists(t)) tables.drop(t, ifExists = true)
          else { spark.catalog.dropTempView(t); viewDefs -= t }
        }
        schemaMembers -= name
        schemas -= name
      }
      spark.emptyDataFrame
    case _ => sys.error(s"cannot parse DROP SCHEMA: $q")
  }

  /** (schema, bare table name) decoded from a flat name — by the recorded
    * membership, not prefix shape, so `sch__x` created outside the schema
    * stays public. */
  private def schemaOf(flat: String): (String, String) =
    flat.split("__", 2) match {
      case Array(s, rest) if rest.nonEmpty &&
          schemaMembers.get(s).exists(_.contains(flat)) => (s, rest)
      case _ => ("public", flat)
    }

  // ---------------------------------------------------------- ALTER TABLE

  private val AlterRe =
    ("""(?is)ALTER\s+TABLE\s+""" + Ident + """\s+(.*)""").r
  private val AddColRe = """(?is)ADD\s+COLUMN\s+(.*)""".r
  private val DropColRe = ("""(?is)DROP\s+COLUMN\s+""" + Ident + """\s*""").r
  private val RenameColRe =
    ("""(?is)RENAME\s+COLUMN\s+""" + Ident + """\s+TO\s+""" + Ident + """\s*""").r

  /** `ALTER TABLE t ADD COLUMN def | DROP COLUMN c | RENAME COLUMN a TO b`
    * — schema evolution over the view-swap tables (beyond the reference's
    * grammar; the surface any long-lived data engine needs). ADD COLUMN
    * reuses the CREATE TABLE column-def parser, so types/NOT NULL/DEFAULT
    * behave identically; existing rows backfill with the DEFAULT. */
  private def alterTable(q: String): DataFrame = q match {
    case AlterRe(name0, action) =>
      val name = unquoteIdent(name0)
      action.trim match {
        case AddColRe(colDef) =>
          val (schema, defaults, _, _, _) = parseColumnDefs(colDef.trim)
          require(schema.size == 1, s"ADD COLUMN takes one column: $colDef")
          tables.addColumn(name, schema.fields.head,
            defaults.get(schema.fields.head.name))
        case DropColRe(c) => tables.dropColumn(name, unquoteIdent(c))
        case RenameColRe(a, b) =>
          tables.renameColumn(name, unquoteIdent(a), unquoteIdent(b))
        case other => sys.error(s"cannot parse ALTER TABLE action: $other")
      }
      spark.emptyDataFrame
    case _ => sys.error(s"cannot parse ALTER TABLE: $q")
  }

  private val TruncateRe =
    ("""(?is)TRUNCATE\s+(?:TABLE\s+)?""" + Ident + """\s*""").r

  /** `TRUNCATE [TABLE] t` — delete-all, returning the removed row count. */
  private def truncateTable(q: String): DataFrame = q match {
    case TruncateRe(name0) => countBatch(tables.delete(unquoteIdent(name0), None))
    case _ => sys.error(s"cannot parse TRUNCATE: $q")
  }

  // ---------------------------------------------------------------- views

  /** CREATE VIEW body text, kept for information_schema.views'
    * view_definition column (the plan itself is bound at creation). */
  private val viewDefs = scala.collection.mutable.Map[String, String]()

  private val CreateViewRe =
    ("""(?is)CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+""" + Ident + """\s+AS\s+(.*)""").r
  private val DropViewRe =
    ("""(?is)DROP\s+VIEW\s+(IF\s+EXISTS\s+)?""" + Ident + """\s*""").r

  /** `CREATE [OR REPLACE] VIEW name AS select` — beyond the reference (it
    * has no view DDL). Snapshot-plan semantics: the view binds the SELECT's
    * plan at creation time (like a saved query, not a live macro over
    * later-mutated tables); listed as VIEW in information_schema. */
  private def createView(q: String): DataFrame = q match {
    case CreateViewRe(orReplace, name0, body) =>
      val name = unquoteIdent(name0)
      if (orReplace == null && spark.catalog.tableExists(name))
        sys.error(s"view or table already exists: $name")
      if (tables.exists(name))
        sys.error(s"cannot replace base table with view: $name")
      sql(body).createOrReplaceTempView(name)
      viewDefs(name) = body.trim
      recordMember(name)
      spark.emptyDataFrame
    case _ => sys.error(s"cannot parse CREATE VIEW: $q")
  }

  private def dropView(q: String): DataFrame = q match {
    case DropViewRe(ifEx, name0) =>
      val name = unquoteIdent(name0)
      if (tables.exists(name)) sys.error(s"cannot DROP VIEW a base table: $name")
      val dropped = spark.catalog.dropTempView(name)
      if (dropped) { removeMember(name); viewDefs -= name }
      if (!dropped && ifEx == null) sys.error(s"view not found: $name")
      spark.emptyDataFrame
    case _ => sys.error(s"cannot parse DROP VIEW: $q")
  }

  // ------------------------------------------------------------------ DML

  private val InsertRe =
    ("""(?is)INSERT\s+INTO\s+""" + Ident + """\s*(\([^)]*\))?\s*(.*)""").r

  private def insertInto(q: String): DataFrame = q match {
    case InsertRe(name, colList, body0) =>
      val cols = Option(colList).map(c =>
        splitTopLevel(c.trim.stripPrefix("(").stripSuffix(")"), ',').map(s => unquoteIdent(s.trim)))
      val body = body0.trim
      val input =
        if (body.toUpperCase(Locale.ROOT).startsWith("VALUES")) spark.sql(rewriteQuery(body))
        else sql(body)
      countBatch(tables.insert(unquoteIdent(name), input, cols))
    case _ => sys.error(s"cannot parse INSERT: $q")
  }

  private val DeleteHeadRe = ("""(?is)DELETE\s+FROM\s+""" + Ident + """\s*(.*)""").r

  private def deleteFrom(q: String): DataFrame = q match {
    case DeleteHeadRe(name, rest0) =>
      val rest = rest0.trim
      val where =
        if (rest.isEmpty) None
        else if (rest.toUpperCase(Locale.ROOT).startsWith("WHERE"))
          Some(rest.drop(5).trim)
        else sys.error(s"cannot parse DELETE tail: $rest")
      countBatch(tables.delete(unquoteIdent(name), where))
    case _ => sys.error(s"cannot parse DELETE: $q")
  }

  private val UpdateHeadRe = ("""(?is)UPDATE\s+""" + Ident + """\s+SET\s+(.*)""").r

  private def update(q: String): DataFrame = q match {
    case UpdateHeadRe(name, rest) =>
      // Quote-aware WHERE boundary: a literal containing ' where ' must not
      // split the SET clause (the reference's tokenizer never could).
      val (setClause, where) = indexOfTopLevelKeyword(rest, "WHERE") match {
        case -1 => (rest, None)
        case i => (rest.take(i), Some(rest.drop(i + 5).trim))
      }
      val assignments = splitTopLevel(setClause, ',').map { a =>
        val i = indexOfTopLevel(a, '=')
        require(i > 0, s"cannot parse assignment: $a")
        (unquoteIdent(a.take(i).trim), a.drop(i + 1).trim)
      }
      countBatch(tables.update(unquoteIdent(name), assignments, where))
    case _ => sys.error(s"cannot parse UPDATE: $q")
  }

  // ------------------------------------------------------------ MERGE INTO

  /** `MERGE INTO target [t] USING (subquery)|table [s] ON cond
    *    WHEN MATCHED THEN UPDATE SET c = e, ... | WHEN MATCHED THEN DELETE
    *    WHEN NOT MATCHED THEN INSERT [(cols)] VALUES (exprs)`
    *
    * Beyond the reference (no MERGE in its grammar); executes as one
    * full-outer join + projection in [[MutableTableManager.merge]].
    * Conditional clauses (`WHEN MATCHED AND ...`) are rejected explicitly. */
  private def mergeInto(q: String): DataFrame = {
    val usingIdx = indexOfTopLevelKeyword(q, "USING")
    require(usingIdx > 0, s"cannot parse MERGE (no USING): $q")
    val onIdx = indexOfTopLevelKeyword(q, "ON", usingIdx)
    require(onIdx > usingIdx, s"cannot parse MERGE (no ON): $q")

    // WHEN boundaries: top-level WHEN followed by MATCHED / NOT MATCHED
    // (a CASE WHEN inside the join condition is not a clause boundary)
    val tail = q.substring(onIdx + 2)
    var boundaries = List.empty[Int]
    var from = 0
    var going = true
    while (going) {
      val i = indexOfTopLevelKeyword(tail, "WHEN", from)
      if (i < 0) going = false
      else {
        val rest = tail.substring(i + 4).trim.toUpperCase(Locale.ROOT)
        if (rest.startsWith("MATCHED") || rest.startsWith("NOT MATCHED"))
          boundaries = boundaries :+ i
        from = i + 4
      }
    }
    require(boundaries.nonEmpty, s"cannot parse MERGE (no WHEN clause): $q")
    val cond = tail.take(boundaries.head).trim
    val clauses = boundaries.zip(boundaries.tail :+ tail.length)
      .map { case (a, b) => tail.substring(a, b).trim }

    // target: name [alias]
    val targetPart = q.substring("MERGE INTO".length, usingIdx).trim
    val tParts = targetPart.split("\\s+")
    require(tParts.length <= 2, s"cannot parse MERGE target: $targetPart")
    val (tName, tAlias) = (unquoteIdent(tParts(0)),
      if (tParts.length == 2) unquoteIdent(tParts(1)) else unquoteIdent(tParts(0)))

    // source: (subquery) [AS] [alias]  |  table [AS] [alias]
    val sourcePart = q.substring(usingIdx + "USING".length, onIdx).trim
    val (srcDf, sAliasRaw) =
      if (sourcePart.startsWith("(")) {
        var depth = 0; var i = 0; var close = -1
        while (close < 0 && i < sourcePart.length) {
          sourcePart.charAt(i) match {
            case '\'' => i = endOfQuoted(sourcePart, i, '\'') - 1
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        require(close > 0, s"cannot parse MERGE source: $sourcePart")
        (sql(sourcePart.substring(1, close)), sourcePart.substring(close + 1).trim)
      } else {
        val parts = sourcePart.split("\\s+")
        (sql(s"SELECT * FROM ${parts(0)}"), parts.drop(1).mkString(" "))
      }
    val sAlias = {
      val a = sAliasRaw.replaceAll("(?i)^AS\\s+", "").trim
      if (a.nonEmpty) unquoteIdent(a)
      else if (!sourcePart.startsWith("(")) unquoteIdent(sourcePart.split("\\s+")(0))
      else "src"
    }

    var updateSet: Option[Seq[(String, String)]] = None
    var matchedDelete = false
    var insertClause: Option[(Option[Seq[String]], Seq[String])] = None
    clauses.foreach { c =>
      val u = c.toUpperCase(Locale.ROOT)
      if (u.matches("(?s)WHEN\\s+MATCHED\\s+AND.*") ||
          u.matches("(?s)WHEN\\s+NOT\\s+MATCHED\\s+AND.*"))
        sys.error(s"MERGE conditional WHEN clauses not supported: ${c.take(60)}")
      else if (u.matches("(?s)WHEN\\s+MATCHED\\s+THEN\\s+UPDATE\\s+SET\\s.*")) {
        val setIdx = indexOfTopLevelKeyword(c, "SET")
        val assignments = splitTopLevel(c.substring(setIdx + 3), ',').map { a =>
          val i = indexOfTopLevel(a, '=')
          require(i > 0, s"cannot parse MERGE assignment: $a")
          (unquoteIdent(a.take(i).trim), a.drop(i + 1).trim)
        }
        updateSet = Some(assignments)
      } else if (u.matches("(?s)WHEN\\s+MATCHED\\s+THEN\\s+DELETE\\s*"))
        matchedDelete = true
      else if (u.matches("(?s)WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s.*")) {
        val insIdx = indexOfTopLevelKeyword(c, "INSERT")
        val valIdx = indexOfTopLevelKeyword(c, "VALUES", insIdx)
        require(valIdx > insIdx, s"cannot parse MERGE INSERT (no VALUES): $c")
        val colsPart = c.substring(insIdx + "INSERT".length, valIdx).trim
        val cols =
          if (colsPart.isEmpty) None
          else Some(splitTopLevel(
            colsPart.stripPrefix("(").stripSuffix(")"), ',').map(x => unquoteIdent(x.trim)))
        val valuesPart = c.substring(valIdx + "VALUES".length).trim
        val values = splitTopLevel(
          valuesPart.stripPrefix("(").stripSuffix(")"), ',').map(_.trim)
        insertClause = Some((cols, values))
      } else sys.error(s"cannot parse MERGE clause: ${c.take(60)}")
    }

    countBatch(tables.merge(
      tName, tAlias, srcDf, sAlias, cond, updateSet, matchedDelete, insertClause))
  }

  // ------------------------------------------------------------ COPY FROM

  private val CopyRe =
    ("""(?is)COPY\s+""" + Ident + """\s+FROM\s+'([^']+)'\s*(?:\((.*)\))?\s*""").r

  /** `COPY tbl FROM 'file' (DELIMITER '|', HEADER)` — reference
    * `copy_from_plan` (`qurious/src/planner/sql.rs:324-375`); csv only, read
    * with the target table's declared schema, appended via insert. A dbgen
    * `.tbl` trailing delimiter (one extra empty column) is tolerated, like
    * Arrow's CSV reader with the declared schema. */
  private def copyFrom(q: String): DataFrame = q match {
    case CopyRe(name0, path, optStr) =>
      val name = unquoteIdent(name0)
      val opts = Option(optStr).map(parseOptions).getOrElse(Map.empty)
      val schema = tables.schema(name)
      val raw = spark.read
        .option("delimiter", opts.getOrElse("delimiter", ","))
        .option("header", opts.getOrElse("header", "false"))
        .csv(pathResolver(path))
      // positional mapping; drop a trailing all-empty column from a trailing
      // delimiter, then cast to the declared types
      val trimmed =
        if (raw.columns.length == schema.size + 1) raw.drop(raw.columns.last)
        else raw
      require(trimmed.columns.length == schema.size,
        s"COPY column count ${trimmed.columns.length} != table arity ${schema.size}")
      val df = trimmed.toDF(schema.fieldNames.toIndexedSeq: _*)
      countBatch(tables.insert(name, df, None))
    case _ => sys.error(s"cannot parse COPY: $q")
  }

  // -------------------------------------------------------------- COPY TO

  private val CopyToRe = """(?s)'([^']+)'\s*(?:\((.*)\))?\s*""".r

  /** `COPY tbl TO 'dir' (FORMAT PARQUET|CSV|JSON, DELIMITER ',', HEADER,
    * PARTITION_BY (col, ...))` and `COPY (SELECT ...) TO 'dir' (...)`.
    *
    * The reference parses COPY TO but its planner rejects it
    * (`qurious/src/planner/sql.rs:315-321` is `todo!()`) — we complete the
    * semantics. Output is a directory of part files (the cluster-parallel
    * layout; a single-file export would funnel 100 TB through one task),
    * with Hive-style subdirectories under PARTITION_BY. Returns the
    * exported row count as a DML-style count batch. */
  private def copyTo(q: String): DataFrame = {
    val toIdx = indexOfTopLevelKeyword(q, "TO")
    val src = q.substring("COPY".length, toIdx).trim
    q.substring(toIdx + 2).trim match {
      case CopyToRe(path, optStr) =>
        val opts = Option(optStr).map(parseOptions).getOrElse(Map.empty)
        val df0 =
          if (src.startsWith("(")) sql(src.substring(1, src.length - 1))
          else sql(s"SELECT * FROM $src")
        // observe the exported count on the WRITE pass itself — re-running
        // the query for a count would double the cost and, for a
        // nondeterministic source, report a count that doesn't match the
        // rows actually written
        val obs = new org.apache.spark.sql.Observation()
        val df = df0.observe(obs, count(lit(1)).as("n"))
        val out = pathResolver(path)
        var w = df.write.mode("overwrite")
        opts.get("partition_by").foreach { cols =>
          val names = splitTopLevel(cols.trim.stripPrefix("(").stripSuffix(")"), ',')
            .map(c => unquoteIdent(c.trim))
          w = w.partitionBy(names: _*)
        }
        opts.getOrElse("format", "csv").toLowerCase(Locale.ROOT) match {
          case "parquet" => w.parquet(out)
          case "json" => w.json(out)
          case "csv" => w
            .option("delimiter", opts.getOrElse("delimiter", ","))
            .option("header", opts.getOrElse("header", "false"))
            .csv(out)
          case other => sys.error(s"unsupported COPY TO format: $other")
        }
        countBatch(obs.get("n").asInstanceOf[Long])
      case other => sys.error(s"cannot parse COPY TO target: $other")
    }
  }

  // -------------------------------------------------------------- EXPLAIN

  /** `EXPLAIN [FORMATTED|EXTENDED] <query>` → one row per plan line.
    * Covers SELECT (Catalyst plan) and routed DML/DDL (described, not
    * executed — EXPLAIN must be side-effect-free). */
  private def explainStatement(q: String): DataFrame = {
    import spark.implicits._
    val rest0 = q.drop("EXPLAIN".length).trim
    val (mode, rest) = {
      val u = rest0.toUpperCase(Locale.ROOT)
      if (u.startsWith("FORMATTED ")) ("formatted", rest0.drop("FORMATTED ".length))
      else if (u.startsWith("EXTENDED ")) ("extended", rest0.drop("EXTENDED ".length))
      else ("simple", rest0)
    }
    val upper = rest.toUpperCase(Locale.ROOT)
    val text =
      if (upper.startsWith("SELECT") || upper.startsWith("WITH") ||
          upper.startsWith("VALUES"))
        spark.sql(rewriteQuery(rest)).queryExecution.explainString(
          mode match {
            case "formatted" => org.apache.spark.sql.execution.FormattedMode
            case "extended" => org.apache.spark.sql.execution.ExtendedMode
            case _ => org.apache.spark.sql.execution.SimpleMode
          })
      else s"== Routed Statement ==\n${rest.takeWhile(_ != '\n').take(80)} (executed via GraftSession statement router)"
    text.linesIterator.toSeq.toDF("plan")
  }

  // ----------------------------------------------------- catalog queries

  /** information_schema.tables built on demand (reference
    * `information_schema.rs:12-90`): one row per registered table/view,
    * mangled schema-qualified names decoded back to (schema, table). */
  private def informationSchemaTables(): DataFrame = {
    val rows = spark.catalog.listTables().collect().toSeq.map { t =>
      val tpe = if (tables.exists(t.name)) "BASE TABLE" else "VIEW"
      val (sch, tbl) = schemaOf(t.name)
      Row("qurious", sch, tbl, tpe)
    } ++ gmemCatalogs().toSeq.flatMap { case (cn, c) =>
      c.listAll().map { case (ns, name, _) =>
        Row(cn, ns.mkString("."), name, "BASE TABLE") }
    } ++ gdiskCatalogs().toSeq.flatMap { case (cn, c) =>
      c.listAllTables().map { case (ns, name, _) =>
        Row(cn, ns, name, "BASE TABLE") }
    }
    val schema = StructType(Seq(
      StructField("catalog_name", StringType),
      StructField("schema_name", StringType),
      StructField("table_name", StringType),
      StructField("table_type", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.sortBy(r => (r.getString(1), r.getString(2))), 1), schema)
  }

  /** information_schema.columns from `spark.catalog.listColumns` — the
    * reference declares the table name but implements only `tables`
    * (`information_schema.rs:12-90`); this is the first thing a BI tool or
    * DESCRIBE-shaped query asks for, so we complete it. Type names render
    * in SQL-standard (DuckDB-compatible) spelling. */
  private def informationSchemaColumns(): DataFrame = {
    def fieldRows(cn: String, sch: String, tbl: String, st: StructType) =
      st.fields.toSeq.zipWithIndex.map { case (f, i) =>
        Row(cn, sch, tbl, f.name, (i + 1).toLong,
          sqlTypeName(f.dataType.catalogString), if (f.nullable) "YES" else "NO")
      }
    val rows = spark.catalog.listTables().collect().toSeq.flatMap { t =>
      val (sch, tbl) = schemaOf(t.name)
      // a view whose plan no longer resolves simply has no column rows
      scala.util.Try(spark.catalog.listColumns(t.name).collect().toSeq)
        .getOrElse(Seq.empty).zipWithIndex.map {
          case (c, i) =>
            Row("qurious", sch, tbl, c.name, (i + 1).toLong,
              sqlTypeName(c.dataType), if (c.nullable) "YES" else "NO")
        }
    } ++ gmemCatalogs().toSeq.flatMap { case (cn, c) =>
      c.listAll().flatMap { case (ns, name, t) =>
        fieldRows(cn, ns.mkString("."), name, t.schema()) }
    } ++ gdiskCatalogs().toSeq.flatMap { case (cn, c) =>
      c.listAllTables().flatMap { case (ns, name, t) =>
        fieldRows(cn, ns, name, t.schema()) }
    }
    val schema = StructType(Seq(
      StructField("table_catalog", StringType),
      StructField("table_schema", StringType),
      StructField("table_name", StringType),
      StructField("column_name", StringType),
      StructField("ordinal_position", LongType),
      StructField("data_type", StringType),
      StructField("is_nullable", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.sortBy(r => (r.getString(1), r.getString(2), r.getLong(4))), 1), schema)
  }

  /** information_schema.schemata — the reference declares all five
    * info-table names (`information_schema.rs:20`) but builds only
    * `tables`; this is what a BI tool probes right after `tables`. One row
    * per registered namespace (always at least `public`). */
  private def informationSchemaSchemata(): DataFrame = {
    val schema = StructType(Seq(
      StructField("catalog_name", StringType),
      StructField("schema_name", StringType),
      StructField("schema_owner", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        schemas.toSeq.sorted.map(s => Row("qurious", s, "qurious")), 1), schema)
  }

  /** information_schema.views (declared, never built, in the reference):
    * the VIEW subset of the catalog with the CREATE VIEW body as
    * view_definition (null for views registered outside view DDL, e.g.
    * read_* TVF bindings). */
  private def informationSchemaViews(): DataFrame = {
    val rows = spark.catalog.listTables().collect().toSeq
      .filter(t => !tables.exists(t.name))
      .map { t =>
        val (sch, tbl) = schemaOf(t.name)
        Row("qurious", sch, tbl, viewDefs.get(t.name).orNull)
      }
    val schema = StructType(Seq(
      StructField("table_catalog", StringType),
      StructField("table_schema", StringType),
      StructField("table_name", StringType),
      StructField("view_definition", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.sortBy(r => (r.getString(1), r.getString(2))), 1), schema)
  }

  /** information_schema.table_constraints — the declared-constraint
    * inventory across BOTH mutable-table engines: the view-swap manager's
    * CHECK/UNIQUE sets and every registered gmem catalog's native
    * Constraint metadata (CHECK predicate SQL, PRIMARY KEY / UNIQUE /
    * FOREIGN KEY key columns), one row per constraint with its definition
    * text. What a migration tool or data catalog reads to know which
    * guarantees a table actually enforces. */
  private def informationSchemaTableConstraints(): DataFrame = {
    import org.apache.spark.sql.connector.catalog.constraints.{Check => V2Check, ForeignKey => V2Fk, PrimaryKey => V2Pk, Unique => V2Uq}
    val local = tables.listTables().flatMap { t =>
      val st = tables.stateOf(t)
      val (sch, tbl) = schemaOf(t)
      st.checks.zipWithIndex.map { case (ck, i) =>
        Row("qurious", sch, tbl, s"${tbl}_check_${i + 1}", "CHECK", s"($ck)")
      } ++ st.uniques.zipWithIndex.map { case (cols, i) =>
        Row("qurious", sch, tbl, s"${tbl}_unique_${i + 1}", "UNIQUE",
          cols.mkString("(", ", ", ")"))
      } ++ st.foreignKeys.zipWithIndex.map { case (fk, i) =>
        Row("qurious", sch, tbl,
          if (fk.name.nonEmpty) fk.name else s"${tbl}_fk_${i + 1}",
          "FOREIGN KEY",
          s"(${fk.cols.mkString(", ")}) REFERENCES ${fk.parentTable} " +
            s"(${fk.parentCols.mkString(", ")})")
      }
    }
    def v2Rows(cn: String, ns: String, name: String,
        cons: Seq[org.apache.spark.sql.connector.catalog.constraints.Constraint]) =
      cons.map { con =>
        val (tpe, defn) = con match {
          case ck: V2Check => ("CHECK", s"(${ck.predicateSql()})")
          case pk: V2Pk => ("PRIMARY KEY",
            pk.columns().map(_.fieldNames().mkString(".")).mkString("(", ", ", ")"))
          case uq: V2Uq => ("UNIQUE",
            uq.columns().map(_.fieldNames().mkString(".")).mkString("(", ", ", ")"))
          case _: V2Fk => ("FOREIGN KEY", con.toDDL)
          case other => ("CONSTRAINT", other.toDDL)
        }
        Row(cn, ns, name, con.name(), tpe, defn)
      }
    val v2 = gmemCatalogs().toSeq.flatMap { case (cn, c) =>
      c.listAll().flatMap { case (ns, name, t) =>
        v2Rows(cn, ns.mkString("."), name, t.constraints().toSeq)
      }
    } ++ gdiskCatalogs().toSeq.flatMap { case (cn, c) =>
      c.listAllTables().flatMap { case (ns, name, t) =>
        v2Rows(cn, ns, name, t.constraints().toSeq)
      }
    }
    val schema = StructType(Seq(
      StructField("constraint_catalog", StringType),
      StructField("table_schema", StringType),
      StructField("table_name", StringType),
      StructField("constraint_name", StringType),
      StructField("constraint_type", StringType),
      StructField("definition", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (local ++ v2).sortBy(r =>
          (r.getString(0), r.getString(1), r.getString(2), r.getString(3))), 1),
      schema)
  }

  /** information_schema.df_settings (the reference's DataFusion-style
    * session-settings table, declared at `information_schema.rs:20`): one
    * (name, value) row per session config entry. */
  private def dfSettings(): DataFrame = {
    val rows = spark.conf.getAll.toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("value", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Spark catalog type string (`simpleString`) → SQL-standard spelling. */
  private def sqlTypeName(t: String): String = {
    val lower = t.toLowerCase(Locale.ROOT)
    lower match {
      case "int" => "INTEGER"
      case "string" => "VARCHAR"
      case s if s.startsWith("array<") =>
        sqlTypeName(s.stripPrefix("array<").stripSuffix(">")) + "[]"
      case s => s.toUpperCase(Locale.ROOT)
    }
  }

  // SHOW TABLES stays session-scoped (catalog-qualified listings go
  // through Spark's own SHOW TABLES IN <catalog>.<ns>)
  private def showTables(): DataFrame =
    informationSchemaTables().where("catalog_name = 'qurious'")

  /** `SHOW SCHEMAS` / `SHOW DATABASES` — the registered namespaces
    * (always includes `public`), one VARCHAR column like DuckDB/Postgres. */
  private def showSchemas(): DataFrame = {
    val schema = StructType(Seq(StructField("schema_name", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        schemas.toSeq.sorted.map(Row(_)), 1), schema)
  }

  private val ShowColumnsRe =
    ("""(?is)SHOW\s+COLUMNS\s+(?:FROM|IN)\s+""" + Ident + """\s*""").r

  /** `SHOW COLUMNS FROM|IN name` — same rows as DESCRIBE. */
  private def showColumns(q: String): DataFrame = q match {
    case ShowColumnsRe(name0) => describeTable(s"DESCRIBE ${name0}")
    case _ => sys.error(s"cannot parse SHOW COLUMNS: $q")
  }

  private val DescribeRe =
    ("""(?is)DESC(?:RIBE)?\s+(?:TABLE\s+)?""" + Ident + """\s*""").r

  /** `DESCRIBE [TABLE] name` — the BI-tool/REPL shape, answered from the
    * same catalog rows as information_schema.columns. Schema-qualified
    * names arrive here already mangled by [[stripQualifiers]]. */
  private def describeTable(q: String): DataFrame = q match {
    case DescribeRe(name0) =>
      val flat = unquoteIdent(name0)
      if (!spark.catalog.tableExists(flat)) sys.error(s"table not found: $flat")
      val (sch, tbl) = schemaOf(flat)
      informationSchemaColumns()
        .filter(col("table_schema") === sch && col("table_name") === tbl)
        .select(col("column_name"), col("data_type"), col("is_nullable"))
    case _ => sys.error(s"cannot parse DESCRIBE: $q")
  }

  /** SHOW CREATE TABLE t → one-row DDL reconstructed from the full stored
    * state (types, NOT NULL, DEFAULTs, UNIQUE/PK sets, CHECKs). The
    * emitted statement round-trips: running it recreates an equivalent
    * table with the same constraints enforcing (SessionSpec proves it). */
  private def showCreateTable(q: String): DataFrame = {
    val name = unquoteIdent(q.trim.split("\\s+").last)
    val st = tables.stateOf(name)
    val cols = st.schema.fields.map { f =>
      val notNull = if (!f.nullable) " NOT NULL" else ""
      val dflt = st.defaults.get(f.name.toLowerCase(Locale.ROOT))
        .map(d => s" DEFAULT $d").getOrElse("")
      s"  ${f.name} ${f.dataType.sql}$notNull$dflt"
    }
    val uq = st.uniques.map(cs => s"  UNIQUE (${cs.mkString(", ")})")
    val ck = st.checks.map(c => s"  CHECK ($c)")
    val fk = st.foreignKeys.map(f =>
      s"  FOREIGN KEY (${f.cols.mkString(", ")}) REFERENCES " +
        s"${f.parentTable} (${f.parentCols.mkString(", ")})")
    val ddl =
      s"CREATE TABLE $name (\n${(cols ++ uq ++ ck ++ fk).mkString(",\n")}\n)"
    val s2 = spark
    import s2.implicits._
    Seq(ddl).toDF("create_statement")
  }

  /** DESCRIBE HISTORY t → the table's (version, operation) log, across
    * all three table tiers: front-door view-swap tables (operation names
    * recorded per mutation), gmem (retained commit snapshots; entries
    * below the retention horizon are compacted away), and gdisk (manifest
    * versions with file counts). */
  private def describeHistory(q: String): DataFrame = {
    val name = unquoteIdent(q.trim.split("\\s+").last)
    val s = spark
    import s.implicits._
    if (name.contains('.')) {
      val parts = name.split('.')
      val ident = org.apache.spark.sql.connector.catalog.Identifier
        .of(parts.tail.init, parts.last)
      graft.sources.GraftDiskCatalog.instance(parts.head) match {
        case Some(cat) =>
          val t = cat.loadTable(ident).asInstanceOf[graft.sources.GraftDiskTable]
          return t.log.versions().map { v =>
            val m = t.log.read(v)
            // the manifest's stamped operation kind (pre-field manifests
            // fall back to the generic label)
            val op = m.operation.getOrElse("COMMIT")
            (v.toInt, s"$op(files=${m.files.length}, added=${m.added.length})",
              m.committedAtMs.getOrElse(0L))
          }.toDF("version", "operation", "committed_at_ms")
        case None => graft.sources.GraftMemCatalog.instance(parts.head) match {
          case Some(cat) =>
            val t = cat.loadTable(ident).asInstanceOf[graft.sources.GraftMemTable]
            val latest = t.historyLength - 1
            val oldest = latest - t.retainedHistoryCount + 1
            val times = t.retainedHistoryTimes
            return (oldest to latest).map(v =>
              (v.toInt, if (v == 0) "CREATE" else "COMMIT",
                times((v - oldest).toInt)))
              .toDF("version", "operation", "committed_at_ms")
          case None => () // front-door schema-qualified name: fall through
        }
      }
    }
    // front-door names may carry a schema qualifier — normalize the same
    // way the front door does before hitting the manager
    val local = unquoteIdent(stripQualifiers(q).trim.split("\\s+").last)
    tables.history(local).toDF("version", "operation")
  }

  // ------------------------------------------------------- query rewrite

  /** Pre-pass on plain queries: substitute `read_*` TVFs with registered
    * temp views, `information_schema.tables` with its materialized view,
    * fold the reference's interval-quantity arithmetic, and pin the
    * reference's nulls-first ordering for DESC sorts. */
  private def rewriteQuery(q: String): String = {
    var out = q
    val TvfStart = """(?i)read_(csv|json|parquet|orc|avro|jdbc)\s*\(""".r
    var m = TvfStart.findFirstMatchIn(out)
    while (m.isDefined) {
      val mm = m.get
      val (inner, _) = matchParen(out.substring(mm.end - 1))
      val argsEnd = mm.end - 1 + inner.length + 2
      val kind = mm.group(1).toLowerCase(Locale.ROOT)
      val view =
        if (kind == "jdbc") registerJdbcTvf(inner) else registerTvf(kind, inner)
      out = out.substring(0, mm.start) + view + out.substring(argsEnd)
      m = TvfStart.findFirstMatchIn(out)
    }
    val CdcStart = """(?i)table_changes\s*\(""".r
    var c = CdcStart.findFirstMatchIn(out)
    while (c.isDefined) {
      val mm = c.get
      val (inner, _) = matchParen(out.substring(mm.end - 1))
      val argsEnd = mm.end - 1 + inner.length + 2
      val view = registerTableChanges(inner)
      out = out.substring(0, mm.start) + view + out.substring(argsEnd)
      c = CdcStart.findFirstMatchIn(out)
    }
    if (out.toLowerCase(Locale.ROOT).contains("information_schema.tables")) {
      informationSchemaTables().createOrReplaceTempView("information_schema_tables")
      out = mapUnquoted(out)(
        _.replaceAll("(?i)information_schema\\.tables", "information_schema_tables"))
    }
    if (out.toLowerCase(Locale.ROOT).contains("information_schema.columns")) {
      informationSchemaColumns().createOrReplaceTempView("information_schema_columns")
      out = mapUnquoted(out)(
        _.replaceAll("(?i)information_schema\\.columns", "information_schema_columns"))
    }
    if (out.toLowerCase(Locale.ROOT).contains("information_schema.schemata")) {
      informationSchemaSchemata().createOrReplaceTempView("information_schema_schemata")
      out = mapUnquoted(out)(
        _.replaceAll("(?i)information_schema\\.schemata", "information_schema_schemata"))
    }
    if (out.toLowerCase(Locale.ROOT).contains("information_schema.views")) {
      informationSchemaViews().createOrReplaceTempView("information_schema_views")
      out = mapUnquoted(out)(
        _.replaceAll("(?i)information_schema\\.views", "information_schema_views"))
    }
    if (out.toLowerCase(Locale.ROOT).contains("information_schema.table_constraints")) {
      informationSchemaTableConstraints()
        .createOrReplaceTempView("information_schema_table_constraints")
      out = mapUnquoted(out)(_.replaceAll(
        "(?i)information_schema\\.table_constraints",
        "information_schema_table_constraints"))
    }
    if (out.toLowerCase(Locale.ROOT).contains("information_schema.df_settings")) {
      dfSettings().createOrReplaceTempView("information_schema_df_settings")
      out = mapUnquoted(out)(
        _.replaceAll("(?i)information_schema\\.df_settings", "information_schema_df_settings"))
    }
    out = rewriteVersionAsOf(out)
    out = rewriteTableSample(out)
    out = foldIntervalArith(out)
    out = mapUnquoted(out)(descNullsFirst)
    out
  }

  // ----------------------------------------------- settings + export

  /** `SET key = value` / `SET key TO value` and `RESET key` — session
    * configuration through the SQL front door (the knobs themselves are
    * queryable via `information_schema.df_settings`). */
  private val SetRe = """(?is)SET\s+([\w.]+)\s*(?:=|TO)\s*(.+)""".r

  private def setStatement(q: String): DataFrame = q match {
    case SetRe(key, raw) =>
      spark.conf.set(key, unquote(raw.trim))
      spark.emptyDataFrame
    case _ => sys.error(s"cannot parse SET: $q")
  }

  private def resetStatement(q: String): DataFrame = {
    val m = """(?is)RESET\s+([\w.]+)\s*""".r
    q match {
      case m(key) => spark.conf.unset(key); spark.emptyDataFrame
      case _ => sys.error(s"cannot parse RESET: $q")
    }
  }

  /** `EXPORT DATABASE 'dir'` / `IMPORT DATABASE 'dir'` (the DuckDB verbs):
    * every mutable table round-trips through parquet, and a parquet
    * manifest carries what the data files can't — schema JSON, column
    * DEFAULTs, CHECK expressions and UNIQUE/PK column sets — so an import
    * restores the tables with their constraints ENFORCING again, not just
    * their rows. Parquet on both legs means the export is itself
    * Spark-readable (and the manifest queryable) without this library. */
  private def exportDatabase(q: String): DataFrame = {
    val m = """(?is)EXPORT\s+DATABASE\s+'([^']+)'\s*""".r
    q match {
      case m(path) =>
        val s = spark
        import s.implicits._
        val rows = tables.listTables().map { t =>
          val st = tables.stateOf(t)
          // FKs ride as tab-separated strings (name, cols, parent, pcols)
          // so the manifest schema stays flat parquet
          val fks = st.foreignKeys.map(fk => Seq(fk.name,
            fk.cols.mkString(","), fk.parentTable,
            fk.parentCols.mkString(",")).mkString("\t"))
          (t, st.schema.json, st.defaults, st.checks, st.uniques, fks)
        }
        rows.toDF("name", "schema_json", "defaults", "checks", "uniques", "fks")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/__manifest")
        tables.listTables().foreach(t =>
          tables.table(t).write.mode("overwrite").parquet(s"$path/$t"))
        // gmem (DSv2) tables round-trip too — one EXPORT covers BOTH
        // mutable-table engines. Per table: a re-runnable CREATE column
        // list (types + NOT NULL + DEFAULT) + declared-constraint DDL in
        // the manifest, data as parquet re-applied through the guarded
        // write path on import.
        val v2rows = gmemCatalogs().toSeq.flatMap { case (cn, c) =>
          c.listAll().map { case (ns, name, t) =>
            val colsDdl = t.columns().map { col =>
              val dflt = Option(col.defaultValue())
                .flatMap(d => Option(d.getSql)).map(s => s" DEFAULT $s")
                .getOrElse("")
              s"`${col.name}` ${col.dataType.sql}" +
                (if (!col.nullable) " NOT NULL" else "") + dflt
            }.mkString(", ")
            val consDdl = t.constraints().map(_.toDDL).toSeq
            (cn, ns.mkString("."), name, colsDdl, consDdl)
          }
        }
        if (v2rows.nonEmpty)
          v2rows.toDF("catalog", "namespace", "name", "cols_ddl", "constraints")
            .coalesce(1).write.mode("overwrite").parquet(s"$path/__v2_manifest")
        v2rows.foreach { case (cn, ns, name, _, _) =>
          spark.table(s"$cn.$ns.$name").write.mode("overwrite")
            .parquet(s"$path/__v2/$cn/$ns.$name")
        }
        spark.emptyDataFrame
      case _ => sys.error(s"cannot parse EXPORT DATABASE: $q")
    }
  }

  private def importDatabase(q: String): DataFrame = {
    val m = """(?is)IMPORT\s+DATABASE\s+'([^']+)'\s*""".r
    q match {
      case m(path) =>
        val manifest = spark.read.parquet(s"$path/__manifest").collect().toSeq
        def fksOf(r: org.apache.spark.sql.Row) =
          (if (r.schema.fieldNames.contains("fks")) // pre-FK exports lack it
            r.getSeq[String](r.fieldIndex("fks")) else Nil).map { s =>
            val p = s.split("\t", -1)
            graft.tables.MutableTableManager.FkDef(p(0),
              p(1).split(',').toSeq, p(2), p(3).split(',').toSeq)
          }.toList
        // FK parents must exist (with data) before their children import:
        // repeatedly admit tables whose parents are already restored
        // (self-references count as satisfied); a cycle falls back to
        // name order and surfaces as the create-time validation error
        var pending = manifest.sortBy(_.getString(0))
        var restored = Set.empty[String]
        var progress = true
        while (pending.nonEmpty) {
          val (ready, blocked) =
            if (progress) pending.partition { r =>
              fksOf(r).forall(fk =>
                fk.parentTable.equalsIgnoreCase(r.getString(0)) ||
                  restored.contains(fk.parentTable.toLowerCase(Locale.ROOT)))
            } else (pending, Seq.empty) // cycle: import in name order
          progress = ready.nonEmpty
          (if (progress) ready else pending).foreach { r =>
            val name = r.getString(0)
            val schema = DataType.fromJson(r.getString(1)).asInstanceOf[StructType]
            val defaults = r.getAs[Map[String, String]]("defaults")
            // Row.getSeq hands back mutable ArraySeq — deep-convert to the
            // immutable Seq the manager's API is typed with
            val checks = r.getSeq[String](3).toList
            val uniques =
              r.getSeq[scala.collection.Seq[String]](4).map(_.toList).toList
            val data = spark.read.schema(schema).parquet(s"$path/$name")
            tables.create(name, schema, defaults, Some(data),
              ifNotExists = false, checks = checks, uniques = uniques,
              foreignKeys = fksOf(r))
            recordMember(unquoteIdent(name))
            restored += name.toLowerCase(Locale.ROOT)
          }
          pending = if (progress) blocked else Seq.empty
        }
        // gmem tables (present when the export saw registered catalogs):
        // recreate through Spark SQL so defaults/constraints re-parse into
        // the native Column/Constraint metadata, then append the data
        // through the guarded write path
        // Restore is ADDITIVE for gmem tables: the export spans every
        // registered catalog's live tables, so an import into a session
        // where some still exist recreates only the missing ones and
        // leaves live tables untouched (front-door tables keep strict
        // create-errors-if-exists semantics — their manager is
        // session-scoped, gmem catalogs are not).
        val v2Manifest = new java.io.File(s"$path/__v2_manifest")
        if (v2Manifest.exists()) {
          spark.read.parquet(s"$path/__v2_manifest").collect().foreach { r =>
            val (cn, ns, name) = (r.getString(0), r.getString(1), r.getString(2))
            val exists = graft.sources.GraftMemCatalog.instance(cn).exists(
              _.tableExists(org.apache.spark.sql.connector.catalog.Identifier
                .of(ns.split('.'), name)))
            if (!exists) {
              val consSql = r.getSeq[String](4) match {
                case cs if cs.nonEmpty => cs.mkString(", ", ", ", "")
                case _ => ""
              }
              spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cn.$ns")
              spark.sql(s"CREATE TABLE $cn.$ns.$name (${r.getString(3)}$consSql)")
              spark.read.parquet(s"$path/__v2/$cn/$ns.$name")
                .writeTo(s"$cn.$ns.$name").append()
            }
          }
        }
        spark.emptyDataFrame
      case _ => sys.error(s"cannot parse IMPORT DATABASE: $q")
    }
  }

  // ------------------------------------------------------ transactions

  /** BEGIN / COMMIT / ROLLBACK over the mutable tables, built directly on
    * the snapshot history: BEGIN records each table's version watermark,
    * ROLLBACK restores every pre-existing table to its watermark (schema,
    * defaults and data together — the snapshot holds the full state) and
    * drops tables created inside the transaction, COMMIT forgets the
    * watermarks. Undo is itself a new ROLLBACK version, so the history
    * log stays append-only (Delta-style). Scope: mutable-table DML/DDL;
    * DROP TABLE inside a transaction is rejected (its history would be
    * gone before rollback could need it). */
  private var txWatermarks: Option[Map[String, Int]] = None

  /** Wall-clock at BEGIN — creation-attribution watermark: ROLLBACK drops
    * an absent-from-snapshot V2 table only when its creation is
    * attributable to THIS JVM after this instant (see rollbackTx). */
  private var txBeginAtMs: Long = 0L

  /** Guard for statements that cannot participate in rollback. */
  private def requireNoTx(what: String): Unit =
    require(txWatermarks.isEmpty, s"$what inside a transaction is not supported")

  // per registered gmem catalog: table -> history watermark at BEGIN. One
  // transaction surface spans ALL THREE mutable-table engines — the
  // view-swap manager, every GraftMemCatalog, and every GraftDiskCatalog
  // — so `BEGIN; INSERT INTO gmem.ns.t ...; ROLLBACK` undoes V2 writes
  // exactly like front-door ones.
  private var txV2Marks
      : Map[String, Map[(List[String], String), Long]] = Map.empty

  // per registered gdisk catalog: (namespace, table) -> manifest version
  // at BEGIN. ROLLBACK restores each mutated table via restoreToVersion
  // (itself a new commit — append-only undo, the same discipline as the
  // gmem history) and drops tables created inside the transaction.
  private var txDiskMarks: Map[String, Map[(String, String), Long]] = Map.empty

  /** Names of every CONFIGURED catalog of class `cls`, with Spark's lazy
    * instantiation FORCED for each (a catalog configured but never yet
    * referenced would otherwise be invisible to the instance registry —
    * BEGIN would not watermark it and ROLLBACK would wrongly treat all
    * of its pre-existing tables as created inside the transaction). */
  private def configuredV2Catalogs(cls: String): Seq[String] =
    spark.conf.getAll.iterator.flatMap { case (k, v) =>
      val n = k.stripPrefix("spark.sql.catalog.")
      if (k.startsWith("spark.sql.catalog.") && !n.contains('.') && v == cls)
        Some(n)
      else None
    }.toSeq.sorted.map { n =>
      if (!forcedCatalogs.contains(n)) {
        // public resolution route: instantiates + initializes the plugin
        // (registering it) without touching any table
        try spark.sql(s"SHOW NAMESPACES IN `$n`").collect()
        catch { case _: Exception => () }
        forcedCatalogs += n
      }
      n
    }

  private val forcedCatalogs = scala.collection.mutable.Set.empty[String]

  /** Registered [[graft.sources.GraftMemCatalog]] instances, by name
    * (lazily-configured catalogs are instantiated first). */
  private def gmemCatalogs(): Map[String, graft.sources.GraftMemCatalog] =
    configuredV2Catalogs(classOf[graft.sources.GraftMemCatalog].getName)
      .flatMap(n => graft.sources.GraftMemCatalog.instance(n).map(n -> _))
      .toMap

  /** Registered [[graft.sources.GraftDiskCatalog]] instances, by name
    * (lazily-configured catalogs are instantiated first). */
  private def gdiskCatalogs(): Map[String, graft.sources.GraftDiskCatalog] =
    configuredV2Catalogs(classOf[graft.sources.GraftDiskCatalog].getName)
      .flatMap(n => graft.sources.GraftDiskCatalog.instance(n).map(n -> _))
      .toMap

  private def beginTx(): DataFrame = {
    require(txWatermarks.isEmpty, "transaction already in progress")
    txBeginAtMs = System.currentTimeMillis()
    txWatermarks = Some(
      tables.listTables().map(t => t -> tables.versionCount(t)).toMap)
    txV2Marks = gmemCatalogs().map { case (n, c) => n -> c.snapshotVersions() }
    // log-dir listings only — BEGIN never reconstructs a manifest
    txDiskMarks = gdiskCatalogs().map { case (n, c) =>
      n -> c.listTableLogs().map { case (ns, t, log) =>
        (ns, t) -> log.latestVersion()
      }.toMap
    }
    spark.emptyDataFrame
  }

  private def commitTx(): DataFrame = {
    require(txWatermarks.isDefined, "no transaction in progress")
    txWatermarks = None
    txV2Marks = Map.empty
    txDiskMarks = Map.empty
    spark.emptyDataFrame
  }

  private def rollbackTx(): DataFrame = {
    val marks = txWatermarks.getOrElse(sys.error("no transaction in progress"))
    for (t <- tables.listTables()) marks.get(t) match {
      case Some(v) if tables.versionCount(t) > v => tables.restore(t, v - 1)
      case Some(_) => () // untouched during the transaction
      case None => tables.drop(t) // created inside the transaction
    }
    // gmem catalogs roll back to their BEGIN watermarks too; a table
    // absent from the marks is dropped only when created after BEGIN
    // (a catalog first CONFIGURED during the tx re-registers pre-existing
    // tables the transaction never touched — those survive)
    for ((n, c) <- gmemCatalogs())
      c.rollbackTo(txV2Marks.getOrElse(n, Map.empty), txBeginAtMs)
    // gdisk catalogs: every table mutated since BEGIN restores to its
    // watermark manifest (restoreToVersion — a NEW commit re-serving the
    // old snapshot, so history stays append-only and inside-tx data
    // files stay on disk until VACUUM, which is guarded inside a tx);
    // tables created inside the transaction are dropped, same contract
    // as gmem. Metadata-only inside-tx commits (ANALYZE, tags) roll back
    // with the manifest like everything else.
    //
    // Absence from the BEGIN snapshot is NOT enough to drop: the warehouse
    // is shared cross-process, so a table another process created during
    // the tx window — or one re-surfaced by a catalog configured after
    // BEGIN — is committed data this transaction never touched. A drop
    // needs positive attribution: THIS JVM wrote the table's v0 after
    // BEGIN (per-JVM creation records, stamped at commitInitial). A table
    // created inside the tx by a DIFFERENT process is left standing too —
    // its creator owns it; destroying another writer's committed table
    // would contradict the hard-link commit-claim exclusivity contract.
    for ((n, c) <- gdiskCatalogs()) {
      val diskMarks = txDiskMarks.getOrElse(n, Map.empty)
      for ((ns, t, log) <- c.listTableLogs()) {
        val ident = org.apache.spark.sql.connector.catalog.Identifier
          .of(ns.split('.'), t)
        diskMarks.get((ns, t)) match {
          case Some(v) if log.latestVersion() > v =>
            // only a table that actually MOVED loads its manifest
            c.loadTable(ident).asInstanceOf[graft.sources.GraftDiskTable]
              .restoreToVersion(v)
          case Some(_) => () // untouched during the transaction
          case None if graft.sources.GraftDiskCatalog.createdByThisJvmSince(
              log.tableDir.toUri.getPath, txBeginAtMs) =>
            // created inside the transaction BY THIS JVM
            c.dropMvMarker(ident) // harmless no-op for plain tables
            c.dropTable(ident)
          case None => () // unattributable: not this transaction's to undo
        }
      }
    }
    txWatermarks = None
    txV2Marks = Map.empty
    txDiskMarks = Map.empty
    spark.emptyDataFrame
  }

  // --------------------------------------------- prepared statements

  /** `PREPARE name AS stmt` / `EXECUTE name(args…)` / `DEALLOCATE name` —
    * the Postgres/DuckDB parameterized-statement surface. Parameters are
    * `$1`…`$n`; EXECUTE substitutes the argument SQL literals positionally
    * (outside quoted strings only) and routes the result through the full
    * front door, so prepared DML, DDL and rewritten SELECT forms all work.
    * Re-preparing a name replaces it (DuckDB semantics). */
  private def prepareStatement(q: String): DataFrame = {
    val m = """(?is)PREPARE\s+([A-Za-z_]\w*)\s+AS\s+(.+)""".r
    q match {
      case m(name, stmt) =>
        prepared.update(name.toLowerCase(Locale.ROOT), stmt.trim)
        spark.emptyDataFrame
      case _ => sys.error(s"cannot parse PREPARE: $q")
    }
  }

  private def executePrepared(q: String): DataFrame = {
    val m = """(?is)EXECUTE\s+([A-Za-z_]\w*)\s*(?:\((.*)\))?\s*""".r
    q match {
      case m(name, argStr) =>
        val stmt = prepared.getOrElse(name.toLowerCase(Locale.ROOT),
          sys.error(s"prepared statement not found: $name"))
        val args =
          if (argStr == null || argStr.trim.isEmpty) Seq.empty[String]
          else splitTopLevel(argStr, ',').map(_.trim)
        // arity counts $n references over the UNQUOTED segments only, the
        // same segments substitution sees — a '$2' inside a string literal
        // is data, not a parameter
        val unquotedStmt = new StringBuilder
        mapUnquoted(stmt) { s => unquotedStmt.append(s).append(' '); s }
        val maxRef = """\$(\d+)""".r.findAllMatchIn(unquotedStmt)
          .map(_.group(1).toInt).foldLeft(0)(math.max)
        require(args.size == maxRef,
          s"EXECUTE $name: expected $maxRef argument(s), got ${args.size}")
        val bound = mapUnquoted(stmt)(s =>
          """\$(\d+)""".r.replaceAllIn(s, mm => {
            val i = mm.group(1).toInt
            require(i >= 1 && i <= args.size, s"parameter $$${i} out of range")
            scala.util.matching.Regex.quoteReplacement(args(i - 1))
          }))
        sql(bound)
      case _ => sys.error(s"cannot parse EXECUTE: $q")
    }
  }

  private def deallocate(q: String): DataFrame = {
    val m = """(?is)DEALLOCATE\s+(?:PREPARE\s+)?([A-Za-z_]\w*)\s*""".r
    q match {
      case m(name) =>
        if (prepared.remove(name.toLowerCase(Locale.ROOT)).isEmpty)
          sys.error(s"prepared statement not found: $name")
        spark.emptyDataFrame
      case _ => sys.error(s"cannot parse DEALLOCATE: $q")
    }
  }

  /** Time travel over the mutable tables: `t VERSION AS OF n` (the
    * Delta/Iceberg spelling) resolves to the snapshot after the table's
    * n-th operation (0 = CREATE). Plans are immutable, so superseded table
    * states are held as zero-copy snapshot references — the in-memory
    * analog of a transaction log ([[tables.MutableTableManager.versionOf]]).
    * `DESCRIBE HISTORY t` lists the (version, operation) log. */
  private val VersionAsOfRe =
    ("""(?i)\b""" + Ident + """\s+VERSION\s+AS\s+OF\s+(\d+)""").r

  private def rewriteVersionAsOf(q: String): String =
    VersionAsOfRe.replaceAllIn(q, m => {
      val tbl = unquoteIdent(m.group(1))
      val v = m.group(2).toInt
      val view = s"${tbl}__v$v"
      tables.versionOf(tbl, v).createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(s"$view AS $tbl")
    })

  /** Deterministic TABLESAMPLE: `t TABLESAMPLE (p PERCENT) [REPEATABLE (s)]`
    * keeps the rows whose content-keyed md5 uniform falls below p/100 — a
    * pure function of the row bytes and the seed, so the SAME sample comes
    * back on any engine, partitioning, cluster size, or rerun (and stays
    * stable under appends: old rows never flip). Spark's native TABLESAMPLE
    * draws per-split RNG samples that change with the split layout — useless
    * as a reproducible corpus-subset operator at 100 TB. Tables the session
    * can't resolve fall through to Spark's native sampler untouched. */
  private val TableSampleRe =
    ("""(?i)\b""" + Ident +
      """\s+TABLESAMPLE\s*\(\s*([0-9]+(?:\.[0-9]+)?)\s*PERCENT\s*\)""" +
      """(?:\s*REPEATABLE\s*\(\s*(\d+)\s*\))?""").r

  private def rewriteTableSample(q: String): String =
    TableSampleRe.replaceAllIn(q, m => {
      val tbl = m.group(1)
      val resolved = scala.util.Try(spark.table(unquoteIdent(tbl)).columns)
      resolved match {
        case scala.util.Success(cols) =>
          val pct = m.group(2)
          val seed = Option(m.group(3)).getOrElse("0")
          val key = cols.map(c => s"cast(`$c` as string)")
            .mkString(s"concat_ws('|', 'smp$seed', ", ", ", ")")
          val u = s"(cast(conv(substring(md5($key), 1, 8), 16, 10) as double)" +
            " + 0.5) / 4294967296.0"
          scala.util.matching.Regex.quoteReplacement(
            s"(SELECT * FROM ${unquoteIdent(tbl)} WHERE $u < $pct / 100.0) AS ${unquoteIdent(tbl)}")
        case scala.util.Failure(_) => scala.util.matching.Regex.quoteReplacement(m.matched)
      }
    })

  /** The reference's interval literal accepts an arithmetic quantity:
    * `INTERVAL '1' + '2' DAY` ≡ `INTERVAL '3' DAY`
    * (`qurious/src/planner/sql.rs:1146-1229`); Spark's grammar doesn't, so
    * fold the constant sum here. */
  private val IntervalArithRe =
    """(?i)\binterval\s+'(\d+)'((?:\s*\+\s*'\d+')+)\s+(year|month|week|day|hour|minute|second)s?\b""".r

  private def foldIntervalArith(q: String): String =
    IntervalArithRe.replaceAllIn(q, m => {
      val more = """'(\d+)'""".r.findAllMatchIn(m.group(2)).map(_.group(1).toLong).sum
      val total = m.group(1).toLong + more
      s"interval '$total' ${m.group(3)}"
    })

  /** The reference's sort always puts nulls first regardless of direction
    * (`qurious/src/planner/mod.rs:339-342`); Spark's DESC default is nulls
    * last. `desc` appears as a bare token only in sort specs, so a
    * token-level rewrite outside quotes is safe. */
  private def descNullsFirst(s: String): String =
    """(?i)\bdesc\b(?!\s+nulls)""".r.replaceAllIn(s, "desc nulls first")

  /** `read_csv('p', delim=>'|', header=>false)` → temp view name. Like the
    * reference, the file is registered as a table keyed by its arguments
    * (`qurious/src/common/table_relation.rs:41-52`); schema inference matches
    * `datasource/file/csv.rs:34-72` / `json.rs:17-29` / parquet footer. */
  private def registerTvf(kind: String, argStr: String): String = {
    val args = splitTopLevel(argStr, ',').map(_.trim)
    require(args.nonEmpty, s"read_$kind needs a path argument")
    val path = pathResolver(unquote(args.head))
    val opts = args.tail.map { a =>
      val kv = a.split("=>", 2)
      require(kv.length == 2, s"cannot parse read_$kind option: $a")
      normOptKey(kv(0).trim) -> unquote(kv(1).trim)
    }.toMap
    val df = kind match {
      case "csv" =>
        spark.read
          .option("header", opts.getOrElse("header", "true"))
          .option("delimiter", opts.getOrElse("delimiter", ","))
          .option("quote", opts.getOrElse("quote", "\""))
          .option("escape", opts.getOrElse("escape", "\\"))
          .option("inferSchema", "true")
          .csv(path)
      case "json" => spark.read.json(path)
      case "parquet" => spark.read.parquet(path)
      case "orc" => spark.read.orc(path)
      // Spark 4 bundles the avro runtime but not spark-avro — the thin
      // executor-parallel container reader fills the interchange gap
      case "avro" => graft.sources.AvroOps.readAvro(spark, path)
    }
    tvfCounter += 1
    val view = s"tvf_${kind}_${Integer.toHexString((path + opts).hashCode).replace('-', 'n')}_$tvfCounter"
    df.createOrReplaceTempView(view)
    view
  }

  /** `read_jdbc('<url>', '<table or (query) alias>', partition_column=>
    * 'c', lower_bound=>'0', upper_bound=>'100', num_partitions=>'8',
    * user=>'u', password=>'p', ...)` → temp view over Spark's JDBC
    * relation. The reference carries a (dead-code) Postgres connector
    * (`qurious/src/datasource/connectorx/postgres.rs:1-255`) — this is
    * that row made real for dimension pulls. The four partition options
    * split the scan into `num_partitions` range-predicate queries, so a
    * fat table is not one serialized task; filters and column pruning
    * push into the remote SQL (asserted by JdbcTvfSpec). Extra options
    * pass through (snake_case accepted for the Spark camelCase keys). */
  private def registerJdbcTvf(argStr: String): String = {
    val args = splitTopLevel(argStr, ',').map(_.trim)
    require(args.length >= 2,
      "read_jdbc('<url>', '<table or (query) alias>', options...)")
    val url = unquote(args.head)
    val table = unquote(args(1))
    val keyMap = Map(
      "partition_column" -> "partitionColumn",
      "lower_bound" -> "lowerBound",
      "upper_bound" -> "upperBound",
      "num_partitions" -> "numPartitions",
      "fetch_size" -> "fetchsize",
      "query_timeout" -> "queryTimeout",
      "session_init_statement" -> "sessionInitStatement")
    val opts = args.drop(2).map { a =>
      val kv = a.split("=>", 2)
      require(kv.length == 2, s"cannot parse read_jdbc option: $a")
      val k = kv(0).trim.toLowerCase(Locale.ROOT)
      keyMap.getOrElse(k, k) -> unquote(kv(1).trim)
    }.toMap
    val df = opts.foldLeft(
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
      ) { case (r, (k, v)) => r.option(k, v) }.load()
    tvfCounter += 1
    val view = s"tvf_jdbc_${Integer.toHexString((url + table + opts).hashCode)
      .replace('-', 'n')}_$tvfCounter"
    df.createOrReplaceTempView(view)
    view
  }

  /** `table_changes('<catalog>.<ns>.<table>', from_version, to_version)`
    * — Delta's CDC TVF surface over the gdisk commit log (file-granular
    * insert/delete feed; see [[graft.sources.GraftDiskTable.changes]]).
    * Registered as a temp view keyed like the `read_*` TVFs. */
  private def registerTableChanges(argStr: String): String = {
    val args = splitTopLevel(argStr, ',').map(_.trim)
    require(args.length == 3,
      "table_changes('<catalog>.<ns>.<table>', from_version, to_version)")
    val name = unquote(args.head)
    val parts = name.split('.')
    require(parts.length >= 3,
      "table_changes targets a catalog table: '<catalog>.<namespace>.<table>'")
    val cat = graft.sources.GraftDiskCatalog.instance(parts.head).getOrElse(
      sys.error(s"table_changes: '${parts.head}' is not a registered gdisk " +
        "catalog (gmem tables keep their history driver-side — use VERSION AS OF)"))
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(parts.tail.init, parts.last)
    val t = cat.loadTable(ident).asInstanceOf[graft.sources.GraftDiskTable]
    val df = t.changes(args(1).toLong, args(2).toLong)
    tvfCounter += 1
    val view = s"tvf_cdc_${Integer.toHexString(name.hashCode).replace('-', 'n')}_$tvfCounter"
    df.createOrReplaceTempView(view)
    view
  }

  // ----------------------------------------------------- ASOF JOIN

  private var asofCounter = 0

  /** Restricted `SELECT ... FROM l [la] ASOF [LEFT] JOIN r [ra] ON
    * <lk> = <rk> AND <lts> >= <rts> [WHERE/GROUP/ORDER/LIMIT ...]` surface
    * (DuckDB's ASOF grammar) → [[graft.ops.AsofOps.asofJoin]], the
    * single-shuffle union-scan — never a range-join pair blowup. Plain
    * ASOF JOIN is inner (left rows without a match at-or-before their
    * timestamp drop, matching DuckDB); ASOF LEFT JOIN keeps them with
    * null right payload. Right columns (other than the equi key, which
    * the output carries from the left side) must not collide with left
    * column names; alias qualifiers in the select list and tail resolve
    * against the joined frame by stripping them. */
  private def asofJoinSql(q: String): DataFrame = {
    val fromIdx = indexOfTopLevelKeyword(q, "FROM")
    require(fromIdx >= 0, s"ASOF JOIN requires FROM: $q")
    val selPart = q.take(fromIdx)
    val rest = q.substring(fromIdx + 4)
    val asofIdx = indexOfTopLevelKeyword(rest, "ASOF")
    val leftSpec = rest.take(asofIdx).trim
    val afterAsof = rest.substring(asofIdx + 4).trim
    val (leftJoin, afterJoinKw) =
      if (afterAsof.toUpperCase(Locale.ROOT).startsWith("LEFT"))
        (true, afterAsof.substring(4).trim)
      else (false, afterAsof)
    require(afterJoinKw.toUpperCase(Locale.ROOT).startsWith("JOIN"),
      s"expected JOIN after ASOF: $q")
    val afterJoin = afterJoinKw.substring(4).trim
    val onIdx = indexOfTopLevelKeyword(afterJoin, "ON")
    require(onIdx >= 0, s"ASOF JOIN requires ON: $q")
    val rightSpec = afterJoin.take(onIdx).trim
    val afterOn = afterJoin.substring(onIdx + 2)
    val tailIdx = Seq("WHERE", "GROUP", "ORDER", "LIMIT")
      .map(k => indexOfTopLevelKeyword(afterOn, k)).filter(_ >= 0)
      .sorted.headOption.getOrElse(afterOn.length)
    val condText = afterOn.take(tailIdx).trim
    val tail = afterOn.substring(tailIdx)

    def parseSpec(s: String): (String, String) = {
      val toks = s.split("\\s+").filterNot(_.equalsIgnoreCase("AS"))
      require(toks.nonEmpty && toks.length <= 2, s"cannot parse table spec: $s")
      (unquoteIdent(toks(0)).toLowerCase(Locale.ROOT),
        unquoteIdent(toks(if (toks.length == 2) 1 else 0)).toLowerCase(Locale.ROOT))
    }
    val (lName, lAlias) = parseSpec(leftSpec)
    val (rName, rAlias) = parseSpec(rightSpec)
    val conds = condText.split("(?i)\\s+AND\\s+").map(_.trim)
    require(conds.length == 2,
      s"ASOF JOIN ON must be `<equi> AND <ts >= ts>`: $condText")
    val tsCond = conds.find(_.contains(">="))
    val eqCond = conds.find(c => !c.contains(">=") && !c.contains("<=") && c.contains("="))
    require(tsCond.isDefined && eqCond.isDefined,
      s"ASOF JOIN ON must be `<equi> AND <ts >= ts>`: $condText")

    // (qualifier, column); bare columns resolve by schema membership below
    def operand(e: String): (String, String) = {
      val p = e.split("\\.", 2)
      if (p.length == 2) (unquoteIdent(p(0)).toLowerCase(Locale.ROOT), unquoteIdent(p(1).trim))
      else ("", unquoteIdent(p(0).trim))
    }
    val lDf = spark.table(lName)
    val rDf = spark.table(rName)
    def isLeftSide(qual: String, colName: String): Boolean =
      if (qual.nonEmpty) qual == lAlias || qual == lName
      else lDf.columns.contains(colName) && !rDf.columns.contains(colName)

    val Array(eqA, eqB) = eqCond.get.split("=", 2).map(_.trim)
    val (eqAq, eqAc) = operand(eqA); val (eqBq, eqBc) = operand(eqB)
    val (lKey, rKey) =
      if (isLeftSide(eqAq, eqAc)) (eqAc, eqBc) else (eqBc, eqAc)
    val Array(tsA, tsB) = tsCond.get.split(">=", 2).map(_.trim)
    val (tsAq, tsAc) = operand(tsA); val (tsBq, tsBc) = operand(tsB)
    // ASOF backward: the GREATER side must be the left (probe) timestamp
    require(isLeftSide(tsAq, tsAc),
      s"ASOF JOIN ts condition must be <left ts> >= <right ts>: $condText")
    val (lTs, rTs) = (tsAc, tsBc)

    val rAligned = if (rKey == lKey) rDf else rDf.withColumnRenamed(rKey, lKey)
    val rightCols = rAligned.columns.filterNot(_ == lKey).toIndexedSeq
    val collisions = rightCols.toSet.intersect(lDf.columns.toSet)
    require(collisions.isEmpty,
      s"ASOF JOIN right columns collide with left: ${collisions.mkString(", ")}")
    val joined0 = graft.ops.AsofOps.asofJoin(lDf, rAligned, lKey, lTs, rTs, rightCols)
    val joined = if (leftJoin) joined0
      else joined0.filter(org.apache.spark.sql.functions.col(rTs).isNotNull)
    asofCounter += 1
    val view = s"__asof_$asofCounter"
    joined.createOrReplaceTempView(view)
    val stripAliases = (s: String) => Seq(lAlias, rAlias, lName, rName)
      .distinct.foldLeft(s)((acc, a) => acc.replaceAll(s"(?i)\\b$a\\.", ""))
    compatNames(spark.sql(
      mapUnquoted(selPart)(stripAliases) + s" FROM $view " + mapUnquoted(tail)(stripAliases)))
  }

  // ----------------------------------------------------- DISTINCT ON

  /** `SELECT DISTINCT ON (k1, ...) sel FROM ... [ORDER BY o1, ...] [LIMIT n]`
    * → row_number-window rewrite (Postgres semantics: the first row of each
    * key group under the ORDER BY). The reference PARSES this form
    * (`sqlparser/src/parser.rs:581-599`) but silently drops the ON list at
    * execution; Spark has no DISTINCT ON at all — the rewrite executes it
    * correctly: partition by the ON keys, order by the query's ORDER BY
    * (which, as in Postgres, should start with the ON keys), keep rank 1.
    * Top-level statements only (not inside CTEs/subqueries). */
  private def distinctOn(q: String): DataFrame = {
    val head = """(?is)^SELECT\s+DISTINCT\s+ON\s*""".r.findFirstMatchIn(q)
      .getOrElse(sys.error(s"cannot parse DISTINCT ON: $q"))
    val afterOn = q.substring(head.end).trim
    require(afterOn.startsWith("("), s"cannot parse DISTINCT ON: $q")
    val (keys, tail) = matchParen(afterOn)
    val selTail = tail.trim
    val fromIdx = indexOfTopLevelKeyword(selTail, "FROM")
    require(fromIdx >= 0, s"DISTINCT ON requires FROM: $q")
    val selectList = selTail.take(fromIdx).trim
    val obIdx = indexOfTopLevelKeyword(selTail, "ORDER", fromIdx)
    val limIdx = indexOfTopLevelKeyword(selTail, "LIMIT", fromIdx)
    val cutIdx = Seq(obIdx, limIdx).filter(_ >= 0).sorted.headOption
      .getOrElse(selTail.length)
    val fromPart = selTail.substring(fromIdx + 4, cutIdx).trim
    val trailer = selTail.substring(cutIdx).trim
    val orderExprs =
      if (obIdx >= 0) {
        val obEnd = if (limIdx > obIdx) limIdx else selTail.length
        selTail.substring(obIdx, obEnd)
          .replaceAll("(?is)^ORDER\\s+BY", "").trim
      } else keys
    val rewritten =
      s"""SELECT $selectList FROM (
         |  SELECT *, row_number() OVER (PARTITION BY $keys ORDER BY $orderExprs)
         |    AS __don_rn
         |  FROM $fromPart) __don
         |WHERE __don_rn = 1 ${if (trailer.nonEmpty) trailer else ""}""".stripMargin
    // drop covers the `SELECT DISTINCT ON (k) *` case, harmless otherwise
    compatNames(spark.sql(rewriteQuery(rewritten)).drop("__don_rn"))
  }

  // --------------------------------------------------------- QUALIFY

  /** `SELECT … FROM … [WHERE/GROUP BY/HAVING …] QUALIFY pred [ORDER BY …]
    * [LIMIT n]` → post-window filter rewrite (DuckDB/Snowflake/BigQuery
    * semantics: QUALIFY filters on window-function results the way HAVING
    * filters on aggregates). Spark has no QUALIFY; the rewrite computes the
    * predicate as an extra column in the same select scope (so it can use
    * window expressions AND select-list aliases, via Spark's lateral column
    * alias resolution) and filters outside:
    * `[WITH …] SELECT * FROM (SELECT sel, (pred) AS __qual FROM …) WHERE
    * __qual [trailer]`. Top-level statements only, like [[distinctOn]]. */
  private def qualifyFilter(q: String): DataFrame = {
    val selIdx = indexOfTopLevelKeyword(q, "SELECT")
    require(selIdx >= 0, s"cannot parse QUALIFY statement: $q")
    val prefix = q.take(selIdx) // WITH-clause chain, or empty
    val body = q.substring(selIdx)
    val fromIdx = indexOfTopLevelKeyword(body, "FROM")
    val qIdx = indexOfTopLevelKeyword(body, "QUALIFY")
    require(fromIdx >= 0 && qIdx > fromIdx, s"cannot parse QUALIFY statement: $q")
    val selectList = body.substring("SELECT".length, fromIdx).trim
    val fromPart = body.substring(fromIdx, qIdx).trim
    val afterQualify = body.substring(qIdx + "QUALIFY".length)
    val obIdx = indexOfTopLevelKeyword(afterQualify, "ORDER")
    val limIdx = indexOfTopLevelKeyword(afterQualify, "LIMIT")
    val cut = Seq(obIdx, limIdx).filter(_ >= 0).sorted.headOption
      .getOrElse(afterQualify.length)
    val pred = afterQualify.take(cut).trim
    val trailer = afterQualify.substring(cut).trim
    require(pred.nonEmpty, s"QUALIFY needs a predicate: $q")
    val rewritten =
      s"""$prefix SELECT * FROM (
         |  SELECT $selectList, ($pred) AS __qual
         |  $fromPart) __qual_sub
         |WHERE __qual ${if (trailer.nonEmpty) trailer else ""}""".stripMargin
    compatNames(spark.sql(rewriteQuery(rewritten)).drop("__qual"))
  }

  // ------------------------------------------------- output-name compat

  /** Spark's auto-generated names for un-aliased aggregates differ from the
    * reference's (`qurious/src/logical/expr/aggregate.rs:137-160`):
    * Spark names `count(*)` → `count(1)`; the reference keeps `COUNT(*)`.
    * Spark names `sum(a*b)` → `sum((a * b))`; the reference `SUM(a * b)`.
    * Coercion casts never leak into Spark's auto names (they're minted from
    * the pre-coercion expression), matching the reference's cast-stripping
    * (`fmt_expr_for_name`, `aggregate.rs:17-54`). User aliases never match
    * the agg-name shape and pass through untouched. */
  private val AggAutoName = """(?i)(sum|min|max|avg|count)\((.*)\)""".r

  private def compatNames(df: DataFrame): DataFrame = {
    val renamed = df.columns.map {
      case "count(1)" => "COUNT(*)"
      case n @ AggAutoName(op, arg) =>
        s"${op.toUpperCase(Locale.ROOT)}(${stripRedundantParens(arg)})"
      case other => other
    }
    if (renamed.sameElements(df.columns)) df
    else df.toDF(renamed.toIndexedSeq: _*)
  }

  /** `(a * b)` → `a * b` when the parens wrap the whole argument. */
  private def stripRedundantParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) {
      val (inner, tail) = matchParen(t)
      if (tail.trim.isEmpty) inner.trim else t
    } else t
  }

  // ----------------------------------------------------------- utilities

  /** DML result batch: one row, `row: UInt64` (reference `make_count_batch`,
    * `qurious/src/utils/batch.rs:13-16`). */
  private def countBatch(n: Long): DataFrame = {
    import spark.implicits._
    Seq(n).toDF("row")
  }

  /** Apply `f` only to the segments of `s` outside single-quoted literals
    * (with `''` escapes) and double-quoted identifiers — the quote-aware
    * replacement discipline (reference tokenizer, `sqlparser/src/lexer.rs`). */
  private def mapUnquoted(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val plain = new StringBuilder
    var i = 0
    def flush(): Unit = { out.append(f(plain.toString)); plain.clear() }
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          flush()
          val end = endOfQuoted(s, i, '\'')
          out.append(s.substring(i, end)); i = end - 1
        case '"' =>
          flush()
          val end = endOfQuoted(s, i, '"')
          out.append(s.substring(i, end)); i = end - 1
        case c => plain.append(c)
      }
      i += 1
    }
    flush()
    out.toString
  }

  /** End index (exclusive) of a quoted run starting at `start`; `''` inside
    * a single-quoted literal escapes the quote. */
  private def endOfQuoted(s: String, start: Int, quote: Char): Int = {
    var i = start + 1
    while (i < s.length) {
      if (s.charAt(i) == quote) {
        if (quote == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
        else return i + 1
      } else i += 1
    }
    s.length
  }

  /** Strip `qurious.public.` / `public.` default-catalog qualifiers and
    * mangle registered-schema qualifiers (`sch.tbl` → `sch__tbl` — Spark
    * temp views are one flat namespace), but never inside string literals
    * or quoted identifiers. `information_schema.` is left for
    * [[rewriteQuery]]'s view substitution.
    *
    * The schema rewrite is GUARDED: `sch.x` mangles only when it appears
    * in a table position (preceded by TABLE/INTO/FROM/JOIN/VIEW/UPDATE/
    * COPY/DESCRIBE/TRUNCATE/USING/EXISTS) or when `sch__x` is a known
    * table/view — otherwise `s.col` where `s` is a table ALIAS that merely
    * collides with a schema name would mangle into an unresolvable column
    * (Postgres/DuckDB resolve the alias in that position). */
  private def stripQualifiers(q: String): String =
    mapUnquoted(q) { seg0 =>
      var seg = seg0
        .replaceAll("(?i)\\bqurious\\.public\\.", "")
        .replaceAll("(?i)\\bpublic\\.", "")
        .replaceAll("(?i)\\bqurious\\.(?=[A-Za-z_])", "")
      for (s <- schemas if s != "public") {
        val pat = ("(?i)(\\b(?:TABLE|INTO|FROM|JOIN|VIEW|UPDATE|COPY|DESCRIBE|DESC|TRUNCATE|USING|EXISTS)\\s+)?\\b" +
          java.util.regex.Pattern.quote(s) + "\\.(?=([A-Za-z_][\\w]*|\"[^\"]+\"))").r
        seg = pat.replaceAllIn(seg, m => {
          val kw = Option(m.group(1)).getOrElse("")
          val ident = Option(m.group(2)).getOrElse("")
          val flat = s + "__" + unquoteIdent(ident)
          val isTablePos = kw.nonEmpty || ident.startsWith("\"") ||
            spark.catalog.tableExists(flat) ||
            schemaMembers.get(s).exists(_.contains(flat))
          scala.util.matching.Regex.quoteReplacement(
            if (isTablePos) kw + s + "__" else m.matched)
        })
      }
      seg
    }

  /** Content of the leading parenthesized group + the tail after it. */
  private def matchParen(s: String): (String, String) = {
    require(s.startsWith("("), s"expected '(': $s")
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = endOfQuoted(s, i, '\'') - 1
        case '"' => i = endOfQuoted(s, i, '"') - 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return (s.substring(1, i), s.substring(i + 1))
        case _ =>
      }
      i += 1
    }
    sys.error(s"unbalanced parentheses: $s")
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = endOfQuoted(s, i, '\'') - 1
        case '"' => i = endOfQuoted(s, i, '"') - 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if c == sep && depth == 0 =>
          parts += s.substring(start, i)
          start = i + 1
        case _ =>
      }
      i += 1
    }
    parts += s.substring(start)
    parts.result().filter(_.trim.nonEmpty)
  }

  private def indexOfTopLevel(s: String, target: Char): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = endOfQuoted(s, i, '\'') - 1
        case '"' => i = endOfQuoted(s, i, '"') - 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if c == target && depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** First index of `kw` as a whole word at paren depth 0, outside quotes. */
  private def indexOfTopLevelKeyword(s: String, kw: String, from: Int = 0): Int = {
    val upper = kw.toUpperCase(Locale.ROOT)
    var depth = 0
    var i = from
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = endOfQuoted(s, i, '\'') - 1
        case '"' => i = endOfQuoted(s, i, '"') - 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if depth == 0 && Character.toUpperCase(c) == upper.head =>
          val end = i + upper.length
          if (end <= s.length && s.substring(i, end).toUpperCase(Locale.ROOT) == upper &&
              (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_') &&
              (end == s.length || !Character.isLetterOrDigit(s.charAt(end)) && s.charAt(end) != '_'))
            return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'') s.substring(1, s.length - 1)
    else s

  private def normOptKey(k: String): String = k.toLowerCase(Locale.ROOT) match {
    case "delim" | "delimiter" => "delimiter"
    case other => other
  }

  private def parseOptions(s: String): Map[String, String] =
    splitTopLevel(s, ',').map { o =>
      val parts = o.trim.split("\\s+", 2)
      val key = normOptKey(parts(0))
      val value =
        if (parts.length == 2) unquote(parts(1).trim)
        else "true" // bare flag, e.g. HEADER
      key -> value
    }.toMap

  /** `name TYPE [NOT NULL] [DEFAULT expr]` column definitions → schema +
    * defaults, with the reference's SQL→engine type mapping
    * (`sql_to_arrow_data_type`, `qurious/src/planner/sql.rs:1439-1476`:
    * INTEGER→Int64 etc.). */
  /** Column definitions + declared constraints. Column-level: NOT NULL,
    * PRIMARY KEY (⇒ NOT NULL + UNIQUE), UNIQUE, CHECK (expr), DEFAULT,
    * REFERENCES parent(col). Table-level entries: PRIMARY KEY (a, b…),
    * UNIQUE (a, b…), [CONSTRAINT name] CHECK (expr), [CONSTRAINT name]
    * FOREIGN KEY (a, b…) REFERENCES parent (x, y…). Returns (schema,
    * defaults, check expressions, unique column sets, foreign keys). */
  private def parseColumnDefs(inner: String)
      : (StructType, Map[String, String], Seq[String], Seq[Seq[String]],
         Seq[graft.tables.MutableTableManager.FkDef]) = {
    import graft.tables.MutableTableManager.FkDef
    val defaults = Map.newBuilder[String, String]
    val checks = Seq.newBuilder[String]
    val uniques = Seq.newBuilder[Seq[String]]
    val fks = Seq.newBuilder[FkDef]
    val TablePkRe = """(?is)PRIMARY\s+KEY\s*\((.*)\)\s*""".r
    val TableFkRe =
      ("""(?is)(?:CONSTRAINT\s+(\w+)\s+)?FOREIGN\s+KEY\s*\((.*?)\)\s*""" +
        """REFERENCES\s+([A-Za-z_][\w.]*|`[^`]+`)\s*\((.*?)\)\s*""").r
    val TableUqRe = """(?is)UNIQUE\s*\((.*)\)\s*""".r
    val TableCkRe = """(?is)(?:CONSTRAINT\s+\w+\s+)?CHECK\s*\((.*)\)\s*""".r
    val ColRefRe =
      """(?is)\bREFERENCES\s+([A-Za-z_][\w.]*|`[^`]+`)\s*\(\s*([^)]+?)\s*\)""".r
    def colList(s: String): Seq[String] =
      splitTopLevel(s, ',').map(c => unquoteIdent(c.trim))
    val pkNotNull = scala.collection.mutable.Set[String]()
    val fields = splitTopLevel(inner, ',').flatMap { colDef =>
      colDef.trim match {
        case TablePkRe(cols) =>
          val cs = colList(cols); uniques += cs; pkNotNull ++= cs; None
        case TableFkRe(cname, cols, parent, pcols) =>
          fks += FkDef(Option(cname).getOrElse(""), colList(cols),
            unquoteIdent(parent), colList(pcols))
          None
        case TableUqRe(cols) => uniques += colList(cols); None
        case TableCkRe(e) => checks += e.trim; None
        case d =>
          val nameEnd = d.indexWhere(_.isWhitespace)
          require(nameEnd > 0, s"cannot parse column definition: $d")
          val name = unquoteIdent(d.take(nameEnd))
          var rest = d.drop(nameEnd).trim
          val defaultIdx = rest.toUpperCase(Locale.ROOT).indexOf(" DEFAULT ")
          var default: Option[String] = None
          if (defaultIdx >= 0) {
            // The DEFAULT expression may be followed by more column-level
            // constraints (`v INT DEFAULT 5 CHECK (v > 0)` / `... NOT NULL`)
            // — stop the expression at the first top-level constraint
            // keyword instead of swallowing the tail into the default.
            val (dexpr, remainder) = splitDefaultExpr(rest.substring(defaultIdx + 9))
            default = Some(dexpr)
            rest = (rest.take(defaultIdx) + " " + remainder).trim
          }
          // column-level CHECK (…)
          val ckIdx = rest.toUpperCase(Locale.ROOT).indexOf("CHECK")
          if (ckIdx >= 0) {
            val after = rest.substring(ckIdx + 5).trim
            require(after.startsWith("("), s"cannot parse CHECK in: $d")
            val (ck, _) = matchParen(after)
            checks += ck.trim
            rest = rest.take(ckIdx) + after.drop(ck.length + 2)
          }
          // column-level REFERENCES parent(col) — a single-column FK
          ColRefRe.findFirstMatchIn(rest).foreach { m =>
            fks += FkDef("", Seq(name), unquoteIdent(m.group(1)),
              Seq(unquoteIdent(m.group(2).trim)))
            rest = rest.take(m.start) + rest.drop(m.end)
          }
          val upper = rest.toUpperCase(Locale.ROOT)
          val isPk = upper.contains("PRIMARY KEY")
          if (isPk) uniques += Seq(name)
          else if (upper.matches("(?s).*\\bUNIQUE\\b.*")) uniques += Seq(name)
          val notNull = isPk || upper.contains("NOT NULL")
          // strip constraint keywords, then an explicit NULL modifier
          val typeStr = rest
            .replaceAll("(?i)\\s*PRIMARY\\s+KEY\\s*", " ")
            .replaceAll("(?i)\\s*\\bUNIQUE\\b\\s*", " ")
            .replaceAll("(?i)\\s*NOT\\s+NULL\\s*", " ")
            .replaceAll("(?i)\\s+NULL\\s*$", "").trim
          default.foreach(e => defaults += name -> e)
          Some(StructField(name, sqlType(typeStr), nullable = !notNull))
      }
    }
    val withPk = fields.map(f =>
      if (pkNotNull.contains(f.name)) f.copy(nullable = false) else f)
    (StructType(withPk.toIndexedSeq), defaults.result(),
      checks.result(), uniques.result(), fks.result())
  }

  /** Split the text after DEFAULT into (expression, trailing constraints):
    * consume tokens until a top-level (outside quotes/parens) constraint
    * keyword — NOT NULL / NULL / CHECK / PRIMARY KEY / UNIQUE — taking at
    * least one token first so `DEFAULT NULL` keeps NULL as the expression. */
  private def splitDefaultExpr(tail: String): (String, String) = {
    val upper = tail.toUpperCase(Locale.ROOT)
    def wordAt(k: Int, w: String): Boolean =
      upper.startsWith(w, k) &&
        (k == 0 || { val p = upper(k - 1); !p.isLetterOrDigit && p != '_' }) &&
        (k + w.length >= upper.length ||
          { val n = upper(k + w.length); !n.isLetterOrDigit && n != '_' })
    var depth = 0
    var quote: Char = 0
    var sawToken = false
    var i = 0
    var exprEnd = -1
    while (i < tail.length && exprEnd < 0) {
      val c = tail(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else if (c == '\'' || c == '"') { quote = c; sawToken = true; i += 1 }
      else if (c == '(') { depth += 1; sawToken = true; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && sawToken &&
          (wordAt(i, "NOT") || wordAt(i, "NULL") || wordAt(i, "CHECK") ||
            wordAt(i, "PRIMARY") || wordAt(i, "UNIQUE"))) exprEnd = i
      else { if (!c.isWhitespace) sawToken = true; i += 1 }
    }
    if (exprEnd < 0) (tail.trim, "")
    else (tail.take(exprEnd).trim, tail.drop(exprEnd))
  }

  private val DecimalRe = """(?i)DECIMAL\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r

  private def sqlType(t: String): DataType = t.trim.toUpperCase(Locale.ROOT) match {
    case "INT" | "INTEGER" | "BIGINT" => LongType // reference: INTEGER→Int64
    case "SMALLINT" => ShortType
    case "TINYINT" => ByteType
    case "FLOAT" | "DOUBLE" | "REAL" => DoubleType // reference: FLOAT→Float64
    case "BOOLEAN" | "BOOL" => BooleanType
    case "DATE" => DateType
    case "TIMESTAMP" => TimestampType
    case "DECIMAL" | "NUMERIC" => DecimalType(38, 10) // reference bare DECIMAL
    case s if s.startsWith("DECIMAL") || s.startsWith("NUMERIC") =>
      s match {
        case DecimalRe(p, sc) =>
          val prec = p.toInt
          val scale = Option(sc).map(_.toInt).getOrElse(0)
          // the reference maps 38 < p <= 76 to Arrow Decimal256
          // (qurious/src/planner/sql.rs:1439-1476); Spark's DecimalType is
          // 128-bit and caps at p=38 (SURVEY §1.2 — TPC-H needs <=(15,2)).
          // Silently narrowing the declared precision would corrupt
          // values, so out-of-range DDL errors cleanly instead.
          if (prec > 38) sys.error(
            s"DECIMAL($prec,$scale): precision above 38 is not supported " +
              "(Spark decimals are 128-bit; the reference's Decimal256 " +
              "range 38<p<=76 has no representation here — store the " +
              "value as STRING if you need more than 38 digits)")
          DecimalType(prec, scale)
        case _ => sys.error(s"cannot parse type: $t")
      }
    case s if s.startsWith("VARCHAR") || s == "STRING" || s == "TEXT" || s.startsWith("CHAR") =>
      StringType
    case _ => sys.error(s"unsupported type: $t")
  }
}
