package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.sources.Tables

/** File table functions in FROM (`read_csv/read_json/read_parquet` with
  * options, reference `qurious/src/planner/sql.rs:751-774,1347-1399`),
  * `COPY tbl FROM 'file'` (`sql.rs:324-375`), and the information_schema
  * catalog surface (`execution/information_schema.rs:12-90`).
  *
  * CSV/JSON fixtures are generated at query time from the region table (5
  * dimension rows at every SF) so the DuckDB oracle can check the read path
  * against the same parquet-derived truth.
  */
object SourcesCatalog extends QueryModule {

  private def fixturesDir: String = {
    val d = Paths.get("target", "fixtures").toAbsolutePath
    Files.createDirectories(d)
    d.toString
  }

  private def regionRows(s: SparkSession, dir: String): Seq[(Int, String)] = {
    import s.implicits._
    Tables.load(s, dir, "region")
      .select($"r_regionkey", $"r_name").as[(Int, String)]
      .collect().sortBy(_._1).toSeq // 5-row dimension: fixture-sized
  }

  private def writeFixture(path: String, content: String): String = {
    Files.write(Paths.get(path), content.getBytes(StandardCharsets.UTF_8))
    path
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "src_read_parquet_tvf",
      (s, dir) => {
        val g = new GraftSession(s)
        g.sql(s"""SELECT n_nationkey, n_name
          FROM read_parquet('$dir/nation.parquet')
          WHERE n_regionkey = 2 ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name FROM nation
        WHERE n_regionkey = 2 ORDER BY n_nationkey""")),

    // ---- schema evolution: two parquet parts with different columns
    // merge into one view (the data-lake reality — a pipeline adds a
    // column mid-stream and old files stay). mergeSchema unions the
    // footers; rows from the pre-evolution part surface null for the new
    // column. Oracle states the same union over nation. ----
    QueryDef(
      "src_parquet_schema_evolution",
      (s, dir) => {
        import s.implicits._
        val base = s"$fixturesDir/nation_evolved"
        val nation = Tables.load(s, dir, "nation")
        nation.filter($"n_nationkey" < 10)
          .select($"n_nationkey", $"n_name")
          .write.mode("overwrite").parquet(s"$base/part=old")
        nation.filter($"n_nationkey" >= 10)
          .select($"n_nationkey", $"n_name", $"n_regionkey")
          .write.mode("overwrite").parquet(s"$base/part=new")
        s.read.option("mergeSchema", "true").parquet(base)
          .select($"n_nationkey", $"n_name", $"n_regionkey")
          .orderBy($"n_nationkey")
      },
      Some("""SELECT n_nationkey, n_name,
          CASE WHEN n_nationkey >= 10 THEN n_regionkey END AS n_regionkey
        FROM nation ORDER BY n_nationkey""")),

    // ---- malformed-row handling (100 TB ingest reality: some rows are
    // broken): DROPMALFORMED silently skips rows that do not fit the
    // declared schema; the oracle sees only the surviving clean rows. ----
    QueryDef(
      "src_read_csv_dropmalformed",
      (s, dir) => {
        import s.implicits._
        val rows = regionRows(s, dir)
        val csv = "r_regionkey,r_name\n" +
          rows.map { case (k, n) => s"$k,$n" }.mkString("\n") +
          "\nnot_an_int,broken row\n,,too,many,cols"
        val path = writeFixture(s"$fixturesDir/region_malformed.csv", csv)
        s.read
          .option("header", "true")
          .option("mode", "DROPMALFORMED")
          .schema("r_regionkey INT, r_name STRING")
          .csv(path)
          .orderBy($"r_regionkey")
      },
      Some("""SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""")),

    QueryDef(
      "src_read_orc_tvf",
      (s, dir) => {
        // stage an ORC copy of nation, then read it back through the TVF
        // front door — proves the ORC reader + TVF routing end to end
        val orcPath = s"$fixturesDir/nation_orc"
        s.read.parquet(s"$dir/nation.parquet")
          .write.mode("overwrite").orc(orcPath)
        val g = new GraftSession(s)
        g.sql(s"""SELECT n_nationkey, n_name
          FROM read_orc('$orcPath')
          WHERE n_regionkey = 2 ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name FROM nation
        WHERE n_regionkey = 2 ORDER BY n_nationkey""")),

    QueryDef(
      "src_read_avro_tvf",
      (s, dir) => {
        // stage an Avro copy of nation through OUR writer, then read it
        // back through the TVF front door — writer + reader + routing
        // proven end to end against the parquet oracle
        val avroPath = s"$fixturesDir/nation_avro"
        graft.sources.AvroOps.writeAvro(
          s.read.parquet(s"$dir/nation.parquet"), avroPath)
        val g = new GraftSession(s)
        g.sql(s"""SELECT n_nationkey, n_name
          FROM read_avro('$avroPath')
          WHERE n_regionkey = 2 ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name FROM nation
        WHERE n_regionkey = 2 ORDER BY n_nationkey""")),

    QueryDef(
      "src_read_jdbc_tvf",
      (s, dir) => {
        // the reference's (dead-code) Postgres connector row made real:
        // load nation into an EMBEDDED Derby database (no network —
        // Derby ships on the Spark classpath for the Hive metastore),
        // then read it back through the TVF front door with a
        // PARTITIONED scan (4 range-predicate queries on n_nationkey,
        // never one serialized task). Oracle = the same rows straight
        // from parquet, so type mapping, routing, and the partition
        // ranges (which must tile exactly, no dup/drop rows) all sit
        // under the hash.
        val dbPath = s"$fixturesDir/jdbc_nation_db"
        val rows = s.read.parquet(s"$dir/nation.parquet")
          .selectExpr("n_nationkey", "n_name", "n_regionkey")
          .collect() // 25-row dimension: fixture-sized, driver-local DB
        val conn = java.sql.DriverManager.getConnection(
          s"jdbc:derby:$dbPath;create=true")
        try {
          val st = conn.createStatement()
          try st.execute("DROP TABLE nation")
          catch { case _: java.sql.SQLException => () }
          st.execute("CREATE TABLE nation (n_nationkey INT, " +
            "n_name VARCHAR(64), n_regionkey INT)")
          val ps = conn.prepareStatement("INSERT INTO nation VALUES (?,?,?)")
          rows.foreach { r =>
            ps.setInt(1, r.getInt(0))
            ps.setString(2, r.getString(1))
            ps.setInt(3, r.getInt(2))
            ps.addBatch()
          }
          ps.executeBatch()
        } finally conn.close()
        val g = new GraftSession(s)
        g.sql(s"""SELECT n_nationkey AS n_nationkey, n_name AS n_name
          FROM read_jdbc('jdbc:derby:$dbPath', 'nation',
                         partition_column=>'n_nationkey',
                         lower_bound=>'0', upper_bound=>'25',
                         num_partitions=>'4')
          WHERE n_regionkey = 2 ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name FROM nation
        WHERE n_regionkey = 2 ORDER BY n_nationkey""")),

    QueryDef(
      "src_read_jsonl_zst",
      (s, dir) => {
        import s.implicits._
        // the .jsonl.zst shard layout LLM corpora distribute in — write
        // through OUR zstd sink (one shard per partition), read back
        // through the shard-parallel decompressing reader + Spark's
        // JSON parser; the oracle against the source table proves the
        // whole loop lossless (order, types, text fidelity)
        val src = s.read.parquet(s"$dir/documents.parquet")
          .select($"doc_id", $"lang", $"n_chars", $"text")
          .filter($"doc_id" < 300)
        val path = s"$fixturesDir/docs_jsonl_zst"
        graft.sources.ZstText.writeJsonlZst(src.repartition(4), path)
        graft.sources.ZstText.readJsonl(s, path)
          .select($"doc_id".cast("long").as("doc_id"), $"lang",
            $"n_chars".cast("long").as("n_chars"), $"text")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, lang, n_chars, text FROM documents
        WHERE doc_id < 300 ORDER BY doc_id""")),

    QueryDef(
      "src_read_csv_tvf",
      (s, dir) => {
        val g = new GraftSession(s)
        val rows = regionRows(s, dir)
        val csv = "r_regionkey|r_name\n" +
          rows.map { case (k, n) => s"$k|$n" }.mkString("\n")
        val path = writeFixture(s"$fixturesDir/region.csv", csv)
        g.sql(s"""SELECT r_regionkey, r_name
          FROM read_csv('$path', delim=>'|', header=>true)
          ORDER BY r_regionkey""")
      },
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    QueryDef(
      "src_read_json_tvf",
      (s, dir) => {
        val g = new GraftSession(s)
        val rows = regionRows(s, dir)
        val json = rows.map { case (k, n) =>
          s"""{"r_regionkey":$k,"r_name":"$n"}"""
        }.mkString("\n")
        val path = writeFixture(s"$fixturesDir/region.json", json)
        g.sql(s"SELECT r_regionkey, r_name FROM read_json('$path') ORDER BY r_regionkey")
      },
      // Spark JSON inference reads integers as BIGINT.
      Some("SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    QueryDef(
      "src_copy_from_csv",
      (s, dir) => {
        val g = new GraftSession(s)
        val rows = regionRows(s, dir)
        val csv = rows.map { case (k, n) => s"$k|$n" }.mkString("\n")
        val path = writeFixture(s"$fixturesDir/region_noheader.csv", csv)
        g.sql("DROP TABLE IF EXISTS region_copy")
        g.sql("CREATE TABLE region_copy (r_regionkey INT, r_name STRING)")
        g.sql(s"COPY region_copy FROM '$path' (DELIMITER '|')")
        g.sql("SELECT * FROM region_copy ORDER BY r_regionkey")
      },
      // CREATE TABLE INT maps to Int64 (reference sql_to_arrow_data_type).
      Some("SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    QueryDef(
      "cat_information_schema",
      (s, _) => {
        val g = new GraftSession(s)
        g.sql("DROP TABLE IF EXISTS cat_demo_a")
        g.sql("DROP TABLE IF EXISTS cat_demo_b")
        g.sql("CREATE TABLE cat_demo_a (x INT)")
        g.sql("CREATE TABLE cat_demo_b (y STRING)")
        g.sql("""SELECT table_name, table_type FROM information_schema.tables
          WHERE table_name LIKE 'cat_demo%' ORDER BY table_name""")
      },
      Some("""SELECT * FROM (VALUES ('cat_demo_a', 'BASE TABLE'),
        ('cat_demo_b', 'BASE TABLE')) t(table_name, table_type)
        ORDER BY table_name""")),

    // information_schema.columns (the reference declares the name but
    // implements only `tables`, information_schema.rs:12-90) — oracle is
    // DuckDB's own information_schema over its views of the same parquet,
    // so names, positions, and SQL type spellings must all line up.
    QueryDef(
      "cat_information_schema_columns",
      (s, dir) => {
        val g = new GraftSession(s)
        Tables.register(s, dir, Seq("nation", "region"))
        g.sql("""SELECT table_name, column_name, ordinal_position, data_type
          FROM information_schema.columns
          WHERE table_name IN ('nation', 'region')
          ORDER BY table_name, ordinal_position""")
      },
      Some("""SELECT table_name, column_name,
          CAST(ordinal_position AS BIGINT) AS ordinal_position, data_type
        FROM information_schema.columns
        WHERE table_name IN ('nation', 'region')
        ORDER BY table_name, ordinal_position""")),

    // information_schema.schemata + views + df_settings (the remaining
    // info-table names the reference declares at information_schema.rs:20
    // but never builds). One entry pins all three: schemata rows for
    // created namespaces, the views row (with its CREATE VIEW body as
    // view_definition), and the df_settings row every Spark session pins
    // (session.timeZone=UTC in Verify/tests). Known-state VALUES oracle,
    // same pattern as cat_information_schema.
    QueryDef(
      "cat_information_schema_schemata",
      (s, _) => {
        import s.implicits._
        import org.apache.spark.sql.functions.{coalesce, concat, lit}
        val g = new GraftSession(s)
        g.sql("CREATE SCHEMA IF NOT EXISTS cat_probe")
        g.sql("DROP SCHEMA cat_probe CASCADE")
        g.sql("CREATE SCHEMA cat_probe")
        g.sql("DROP VIEW IF EXISTS cat_probe_view")
        g.sql("CREATE VIEW cat_probe_view AS SELECT 1 AS one")
        val sch = g.sql("""SELECT catalog_name, schema_name
            FROM information_schema.schemata
            WHERE schema_name IN ('public', 'cat_probe')""")
          .select(concat(lit("schema:"), $"catalog_name", lit("."),
            $"schema_name").as("item"))
        val vw = g.sql("""SELECT table_schema, table_name, view_definition
            FROM information_schema.views
            WHERE table_name = 'cat_probe_view'""")
          .select(concat(lit("view:"), $"table_schema", lit("."),
            $"table_name", lit("="),
            coalesce($"view_definition", lit("?"))).as("item"))
        val st = g.sql("""SELECT name, value FROM information_schema.df_settings
            WHERE name = 'spark.sql.session.timeZone'""")
          .select(concat(lit("setting:"), $"name", lit("="), $"value")
            .as("item"))
        g.sql("DROP VIEW cat_probe_view")
        g.sql("DROP SCHEMA cat_probe")
        sch.unionAll(vw).unionAll(st).orderBy($"item")
      },
      Some("""SELECT * FROM (VALUES
          ('schema:qurious.cat_probe'), ('schema:qurious.public'),
          ('setting:spark.sql.session.timeZone=UTC'),
          ('view:public.cat_probe_view=SELECT 1 AS one')) t(item)
        ORDER BY item""")),

    // ---- SHOW PARTITIONS: the gdisk partition inventory answered
    // ENTIRELY from the manifest — one row per hive partition dir with
    // its exact row count, no storage listing, no Spark job. The oracle
    // recomputes each dir's row count from the raw source; file_count is
    // layout-dependent (how many parquet files each ingest task cut) and
    // is projected away from the gated result. ----
    QueryDef(
      "cat_show_partitions",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.shp")
        s.sql("""CREATE TABLE gdisk.verify.shp
          (o_orderkey BIGINT, o_orderpriority STRING)
          PARTITIONED BY (o_orderpriority)""")
        s.sql("INSERT INTO gdisk.verify.shp SELECT o_orderkey, " +
          "o_orderpriority FROM orders")
        new GraftSession(s).sql("SHOW PARTITIONS gdisk.verify.shp")
          .select("partition", "row_count").orderBy("partition")
      },
      Some("""SELECT 'o_orderpriority=' || o_orderpriority AS "partition",
          count(*) AS row_count
        FROM orders GROUP BY o_orderpriority ORDER BY 1""")),

    // ---- CONVERT TO GDISK: adopt existing parquet as a gdisk table with
    // NO data rewrite (files rename in, footer stats harvest distributed
    // — the Delta CONVERT move). The adopted table answers with full
    // gdisk semantics; the oracle recomputes from the original source. ----
    QueryDef(
      "src_convert_to_gdisk",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        // stage a copy OUTSIDE the warehouse (CONVERT consumes its source)
        val src = java.nio.file.Files.createTempDirectory("cnv_verify")
          .resolve("orders")
        java.nio.file.Files.createDirectories(src)
        java.nio.file.Files.copy(
          java.nio.file.Path.of(dir, "orders.parquet"),
          src.resolve("part-00000.parquet"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.cnv")
        new GraftSession(s)
          .sql(s"CONVERT TO GDISK '$src' AS gdisk.verify.cnv")
        s.sql("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM gdisk.verify.cnv
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- DESCRIBE DETAIL: one row of manifest-served table inventory;
    // the oracle replays the layout-independent columns (row count from
    // the raw source, version/partition layout from the DDL issued). ----
    QueryDef(
      "cat_describe_detail",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.dd")
        s.sql("""CREATE TABLE gdisk.verify.dd
          (o_orderkey BIGINT, o_orderpriority STRING)
          PARTITIONED BY (o_orderpriority)""")
        s.sql("INSERT INTO gdisk.verify.dd SELECT o_orderkey, " +
          "o_orderpriority FROM orders")
        new GraftSession(s).sql("DESCRIBE DETAIL gdisk.verify.dd")
          .selectExpr("format", "version", "num_rows",
            "array_join(partition_columns, ',') AS part_cols")
      },
      Some("""SELECT 'parquet' AS format, CAST(1 AS BIGINT) AS version,
          CAST(count(*) AS BIGINT) AS num_rows,
          'o_orderpriority' AS part_cols
        FROM orders""")),

    // ---- ANALYZE TABLE: ONE distributed aggregation computes per-column
    // NDV (exact count(distinct) here, so DuckDB replays it; APPROXIMATE
    // = HLL is the 100 TB flavor) and commits it to the gdisk manifest as
    // a metadata-only version; every scan then serves NDV + manifest-
    // merged min/max/nullCount through Statistics.columnStats(), feeding
    // Spark CBO without an ANALYZE scan at plan time. ----
    QueryDef(
      "cat_analyze_stats",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.anl")
        s.sql("""CREATE TABLE gdisk.verify.anl
          (o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE)""")
        s.sql("INSERT INTO gdisk.verify.anl SELECT o_orderkey, " +
          "o_orderpriority, o_totalprice FROM orders")
        new GraftSession(s)
          .sql("ANALYZE TABLE gdisk.verify.anl COMPUTE STATISTICS")
          .select("column_name", "ndv").orderBy("column_name")
      },
      Some("""SELECT * FROM (
          SELECT 'o_orderkey' AS column_name,
                 count(DISTINCT o_orderkey) AS ndv FROM orders
          UNION ALL
          SELECT 'o_orderpriority', count(DISTINCT o_orderpriority) FROM orders
          UNION ALL
          SELECT 'o_totalprice', count(DISTINCT o_totalprice) FROM orders)
        ORDER BY column_name""")),

    // ---- information_schema.table_constraints: the declared-constraint
    // inventory across BOTH mutable-table engines — a front-door table's
    // CHECK/UNIQUE sets and a gmem table's native Constraint metadata in
    // one catalog view (what a migration tool reads to learn which
    // guarantees are enforced). The info-schema DataFrame materializes the
    // catalog state at query time, so the probe tables can be dropped
    // before returning. ----
    QueryDef(
      "cat_information_schema_constraints",
      (s, _) => {
        import s.implicits._
        val g = new GraftSession(s)
        s.conf.set("spark.sql.catalog.gmem",
          classOf[graft.sources.GraftMemCatalog].getName)
        g.sql("DROP TABLE IF EXISTS cons_child")
        g.sql("DROP TABLE IF EXISTS cons_probe")
        g.sql("CREATE TABLE cons_probe (id INT PRIMARY KEY, bal INT CHECK (bal >= 0))")
        g.sql("CREATE TABLE cons_child (cid INT, pid INT REFERENCES cons_probe(id))")
        g.sql("CREATE NAMESPACE IF NOT EXISTS gmem.consprobe")
        g.sql("DROP TABLE IF EXISTS gmem.consprobe.t3")
        g.sql("DROP TABLE IF EXISTS gmem.consprobe.t2")
        g.sql("""CREATE TABLE gmem.consprobe.t2 (id BIGINT,
          CONSTRAINT pk2 PRIMARY KEY (id), CONSTRAINT pos2 CHECK (id >= 0))""")
        g.sql("""CREATE TABLE gmem.consprobe.t3 (cid BIGINT, pid BIGINT,
          CONSTRAINT fk3 FOREIGN KEY (pid) REFERENCES gmem.consprobe.t2 (id))""")
        // the parquet tier's declared constraints surface in the same view
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.consprobe")
        s.sql("DROP TABLE IF EXISTS gdisk.consprobe.t4")
        s.sql("""CREATE TABLE gdisk.consprobe.t4 (id BIGINT, bal BIGINT,
          CONSTRAINT pk4 PRIMARY KEY (id), CONSTRAINT pos4 CHECK (bal >= 0))""")
        val out = g.sql("""SELECT constraint_catalog, table_schema, table_name,
            constraint_name, constraint_type, definition
          FROM information_schema.table_constraints
          WHERE table_name IN ('cons_probe', 'cons_child', 't2', 't3', 't4')
          ORDER BY constraint_catalog, constraint_name""")
        g.sql("DROP TABLE cons_child")
        g.sql("DROP TABLE cons_probe")
        g.sql("DROP TABLE gmem.consprobe.t3")
        g.sql("DROP TABLE gmem.consprobe.t2")
        g.sql("DROP TABLE gdisk.consprobe.t4")
        out
      },
      Some(CatConstraintsOracle)),

    // CREATE/DROP SCHEMA routing (the last SURVEY §2 row: reference parses
    // these, planner todo!()s — qurious/src/planner/sql.rs:187). Exercises
    // create, IF NOT EXISTS idempotence, duplicate error, create-table-in,
    // qualified DML/SELECT, non-empty drop error, CASCADE drop.
    QueryDef(
      "ddl_create_schema",
      (s, _) => {
        import s.implicits._
        import org.apache.spark.sql.functions.{concat, lit}
        val g = new GraftSession(s)
        // self-cleaning rerun: registering the schema first lets CASCADE
        // clear any leftover staging__* views from a prior (failed) run
        g.sql("CREATE SCHEMA IF NOT EXISTS staging")
        g.sql("DROP SCHEMA staging CASCADE")
        g.sql("CREATE SCHEMA staging")
        g.sql("CREATE SCHEMA IF NOT EXISTS staging")
        val dupErr = scala.util.Try(g.sql("CREATE SCHEMA staging")).isFailure
        g.sql("CREATE TABLE staging.docs (k INT, v STRING)")
        g.sql("INSERT INTO staging.docs VALUES (1, 'a'), (2, 'b')")
        val listed = g.sql("""SELECT schema_name, table_name
          FROM information_schema.tables WHERE schema_name = 'staging'""")
          .select(concat(lit("table:"), $"schema_name", lit("."), $"table_name")
            .as("item"))
        val data = g.sql("SELECT k, v FROM staging.docs ORDER BY k")
          .select(concat(lit("data:"), $"k".cast("string"), lit(":"), $"v")
            .as("item"))
        val notEmptyErr = scala.util.Try(g.sql("DROP SCHEMA staging")).isFailure
        g.sql("DROP SCHEMA staging CASCADE")
        val after = g.sql("""SELECT count(*) AS c FROM information_schema.tables
          WHERE schema_name = 'staging'""").head().getLong(0)
        data.unionAll(listed)
          .unionAll(Seq(
            s"dup_create_errors:$dupErr",
            s"drop_nonempty_errors:$notEmptyErr",
            s"after_drop_tables:$after").toDF("item"))
          .orderBy($"item")
      },
      Some("""SELECT * FROM (VALUES
          ('after_drop_tables:0'), ('data:1:a'), ('data:2:b'),
          ('drop_nonempty_errors:true'), ('dup_create_errors:true'),
          ('table:staging.docs')) t(item)
        ORDER BY item"""))
  )

  /** Literal expected rows of `cat_information_schema_constraints` — the
    * probe tables are fixed, so the inventory is a constant. */
  private val CatConstraintsOracle = """SELECT * FROM (VALUES
      ('gdisk', 'consprobe', 't4', 'pk4', 'PRIMARY KEY', '(id)'),
      ('gdisk', 'consprobe', 't4', 'pos4', 'CHECK', '(bal >= 0)'),
      ('gmem', 'consprobe', 't3', 'fk3', 'FOREIGN KEY',
       'CONSTRAINT fk3 FOREIGN KEY (pid) REFERENCES gmem.consprobe.t2 (id) NOT ENFORCED NORELY'),
      ('gmem', 'consprobe', 't2', 'pk2', 'PRIMARY KEY', '(id)'),
      ('gmem', 'consprobe', 't2', 'pos2', 'CHECK', '(id >= 0)'),
      ('qurious', 'public', 'cons_probe', 'cons_probe_check_1', 'CHECK', '(bal >= 0)'),
      ('qurious', 'public', 'cons_probe', 'cons_probe_unique_1', 'UNIQUE', '(id)'),
      ('qurious', 'public', 'cons_child', 'cons_child_fk_1', 'FOREIGN KEY',
       '(pid) REFERENCES cons_probe (id)'))
    t(constraint_catalog, table_schema, table_name, constraint_name,
      constraint_type, definition)
    ORDER BY constraint_catalog, constraint_name"""
}
