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
  *   - `read_csv('p', delim=>'|') / read_json / read_parquet` table functions
  *     in FROM (reference `qurious/src/planner/sql.rs:751-774,1347-1399`) are
  *     pre-registered as temp views and substituted by name, mirroring the
  *     reference's path-hash pre-registration (`session.rs:169-192`);
  *   - `SHOW TABLES` rewrites to a SELECT over information_schema.tables
  *     (reference `session.rs:77-83`), built on demand from the catalog
  *     (reference `execution/information_schema.rs:12-90`);
  *   - `qurious.public.` / `public.` qualifiers normalize to bare names
  *     (reference default catalog/schema, `execution/config.rs:1-13`).
  */
final class GraftSession(val spark: SparkSession) {

  val tables = new MutableTableManager(spark)

  private var tvfCounter = 0

  // ---------------------------------------------------------------- sql()

  def sql(query: String): DataFrame = {
    val q = stripQualifiers(query.trim.stripSuffix(";"))
    val upper = q.toUpperCase(Locale.ROOT)
    if (upper.startsWith("CREATE TABLE")) createTable(q)
    else if (upper.startsWith("DROP TABLE")) dropTable(q)
    else if (upper.startsWith("INSERT INTO")) insertInto(q)
    else if (upper.startsWith("DELETE FROM")) deleteFrom(q)
    else if (upper.startsWith("UPDATE ")) update(q)
    else if (upper.startsWith("COPY ")) copyFrom(q)
    else if (upper.startsWith("SHOW TABLES")) showTables()
    else spark.sql(rewriteQuery(q))
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

  // ------------------------------------------------------------------ DDL

  private val CreateRe =
    """(?is)CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w]*)\s*(.*)""".r

  private def createTable(q: String): DataFrame = q match {
    case CreateRe(ifNot, name, rest0) =>
      val ifNotExists = ifNot != null
      val rest = rest0.trim
      if (rest.startsWith("(")) {
        val (inner, tail) = matchParen(rest)
        val (schema, defaults) = parseColumnDefs(inner)
        val asSel = tail.trim
        val data =
          if (asSel.toUpperCase(Locale.ROOT).startsWith("AS ")) Some(sql(asSel.drop(3)))
          else None
        tables.create(name, schema, defaults, data, ifNotExists)
      } else if (rest.toUpperCase(Locale.ROOT).startsWith("AS ")) {
        val df = sql(rest.drop(3))
        tables.create(name, df.schema, Map.empty, Some(df), ifNotExists)
      } else sys.error(s"cannot parse CREATE TABLE: $q")
      spark.emptyDataFrame
    case _ => sys.error(s"cannot parse CREATE TABLE: $q")
  }

  private val DropRe =
    """(?is)DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w]*)\s*""".r

  private def dropTable(q: String): DataFrame = q match {
    case DropRe(ifEx, name) =>
      tables.drop(name, ifEx != null)
      spark.emptyDataFrame
    case _ => sys.error(s"cannot parse DROP TABLE: $q")
  }

  // ------------------------------------------------------------------ DML

  private val InsertRe =
    """(?is)INSERT\s+INTO\s+([A-Za-z_][\w]*)\s*(\([^)]*\))?\s*(.*)""".r

  private def insertInto(q: String): DataFrame = q match {
    case InsertRe(name, colList, body0) =>
      val cols = Option(colList).map(c =>
        splitTopLevel(c.trim.stripPrefix("(").stripSuffix(")"), ',').map(_.trim))
      val body = body0.trim
      val input =
        if (body.toUpperCase(Locale.ROOT).startsWith("VALUES")) spark.sql(rewriteQuery(body))
        else sql(body)
      countBatch(tables.insert(name, input, cols))
    case _ => sys.error(s"cannot parse INSERT: $q")
  }

  private val DeleteRe =
    """(?is)DELETE\s+FROM\s+([A-Za-z_][\w]*)\s*(?:WHERE\s+(.*))?""".r

  private def deleteFrom(q: String): DataFrame = q match {
    case DeleteRe(name, where) =>
      countBatch(tables.delete(name, Option(where)))
    case _ => sys.error(s"cannot parse DELETE: $q")
  }

  private val UpdateRe =
    """(?is)UPDATE\s+([A-Za-z_][\w]*)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?""".r

  private def update(q: String): DataFrame = q match {
    case UpdateRe(name, setClause, where) =>
      val assignments = splitTopLevel(setClause, ',').map { a =>
        val i = indexOfTopLevel(a, '=')
        require(i > 0, s"cannot parse assignment: $a")
        (a.take(i).trim, a.drop(i + 1).trim)
      }
      countBatch(tables.update(name, assignments, Option(where)))
    case _ => sys.error(s"cannot parse UPDATE: $q")
  }

  // ------------------------------------------------------------ COPY FROM

  private val CopyRe =
    """(?is)COPY\s+([A-Za-z_][\w]*)\s+FROM\s+'([^']+)'\s*(?:\((.*)\))?\s*""".r

  /** `COPY tbl FROM 'file' (DELIMITER '|', HEADER)` — reference
    * `copy_from_plan` (`qurious/src/planner/sql.rs:324-375`); csv only, read
    * with the target table's declared schema, appended via insert. */
  private def copyFrom(q: String): DataFrame = q match {
    case CopyRe(name, path, optStr) =>
      val opts = Option(optStr).map(parseOptions).getOrElse(Map.empty)
      val reader = spark.read
        .option("delimiter", opts.getOrElse("delimiter", ","))
        .option("header", opts.getOrElse("header", "false"))
        .schema(tables.schema(name))
      val df = reader.csv(path)
      countBatch(tables.insert(name, df, None))
    case _ => sys.error(s"cannot parse COPY: $q")
  }

  // ----------------------------------------------------- catalog queries

  /** information_schema.tables built on demand (reference
    * `information_schema.rs:12-90`): one row per registered table/view. */
  private def informationSchemaTables(): DataFrame = {
    val rows = spark.catalog.listTables().collect().toSeq.map { t =>
      val tpe = if (tables.exists(t.name)) "BASE TABLE" else "VIEW"
      Row("qurious", "public", t.name, tpe)
    }
    val schema = StructType(Seq(
      StructField("catalog_name", StringType),
      StructField("schema_name", StringType),
      StructField("table_name", StringType),
      StructField("table_type", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.sortBy(_.getString(2)), 1), schema)
  }

  private def showTables(): DataFrame = informationSchemaTables()

  // ------------------------------------------------------- query rewrite

  /** Pre-pass on plain queries: substitute `read_*` TVFs with registered
    * temp views and `information_schema.tables` with its materialized view. */
  private def rewriteQuery(q: String): String = {
    var out = q
    val TvfStart = """(?i)read_(csv|json|parquet)\s*\(""".r
    var m = TvfStart.findFirstMatchIn(out)
    while (m.isDefined) {
      val mm = m.get
      val (inner, _) = matchParen(out.substring(mm.end - 1))
      val argsEnd = mm.end - 1 + inner.length + 2
      val view = registerTvf(mm.group(1).toLowerCase(Locale.ROOT), inner)
      out = out.substring(0, mm.start) + view + out.substring(argsEnd)
      m = TvfStart.findFirstMatchIn(out)
    }
    if (out.toLowerCase(Locale.ROOT).contains("information_schema.tables")) {
      informationSchemaTables().createOrReplaceTempView("information_schema_tables")
      out = out.replaceAll("(?i)information_schema\\.tables", "information_schema_tables")
    }
    out
  }

  /** `read_csv('p', delim=>'|', header=>false)` → temp view name. Like the
    * reference, the file is registered as a table keyed by its arguments
    * (`qurious/src/common/table_relation.rs:41-52`); schema inference matches
    * `datasource/file/csv.rs:34-72` / `json.rs:17-29` / parquet footer. */
  private def registerTvf(kind: String, argStr: String): String = {
    val args = splitTopLevel(argStr, ',').map(_.trim)
    require(args.nonEmpty, s"read_$kind needs a path argument")
    val path = unquote(args.head)
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
    }
    tvfCounter += 1
    val view = s"tvf_${kind}_${Integer.toHexString((path + opts).hashCode).replace('-', 'n')}_$tvfCounter"
    df.createOrReplaceTempView(view)
    view
  }

  // ----------------------------------------------------------- utilities

  /** DML result batch: one row, `row: UInt64` (reference `make_count_batch`,
    * `qurious/src/utils/batch.rs:13-16`). */
  private def countBatch(n: Long): DataFrame = {
    import spark.implicits._
    Seq(n).toDF("row")
  }

  private def stripQualifiers(q: String): String =
    q.replaceAll("(?i)\\bqurious\\.public\\.", "").replaceAll("(?i)\\bpublic\\.", "")

  /** Content of the leading parenthesized group + the tail after it. */
  private def matchParen(s: String): (String, String) = {
    require(s.startsWith("("), s"expected '(': $s")
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true
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
    var inQuote = false
    var start = 0
    for (i <- 0 until s.length) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case `sep` if depth == 0 =>
          parts += s.substring(start, i)
          start = i + 1
        case _ =>
      }
    }
    parts += s.substring(start)
    parts.result().filter(_.trim.nonEmpty)
  }

  private def indexOfTopLevel(s: String, target: Char): Int = {
    var depth = 0
    var inQuote = false
    for (i <- 0 until s.length) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case `target` if depth == 0 => return i
        case _ =>
      }
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
  private def parseColumnDefs(inner: String): (StructType, Map[String, String]) = {
    val defaults = Map.newBuilder[String, String]
    val fields = splitTopLevel(inner, ',').map { colDef =>
      val d = colDef.trim
      val nameEnd = d.indexWhere(_.isWhitespace)
      require(nameEnd > 0, s"cannot parse column definition: $d")
      val name = d.take(nameEnd)
      var rest = d.drop(nameEnd).trim
      val defaultIdx = rest.toUpperCase(Locale.ROOT).indexOf(" DEFAULT ")
      var default: Option[String] = None
      if (defaultIdx >= 0) {
        default = Some(rest.substring(defaultIdx + 9).trim)
        rest = rest.take(defaultIdx)
      }
      val notNull = rest.toUpperCase(Locale.ROOT).contains("NOT NULL")
      val typeStr = rest.replaceAll("(?i)\\s*NOT\\s+NULL\\s*", "").trim
      default.foreach(e => defaults += name.toLowerCase(Locale.ROOT) -> e)
      StructField(name.toLowerCase(Locale.ROOT), sqlType(typeStr), nullable = !notNull)
    }
    (StructType(fields.toIndexedSeq), defaults.result())
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
          DecimalType(math.min(p.toInt, 38), Option(sc).map(_.toInt).getOrElse(0))
        case _ => sys.error(s"cannot parse type: $t")
      }
    case s if s.startsWith("VARCHAR") || s == "STRING" || s == "TEXT" || s.startsWith("CHAR") =>
      StringType
    case _ => sys.error(s"unsupported type: $t")
  }
}
