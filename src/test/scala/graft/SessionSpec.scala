package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftSession surface: DDL/DML routing, defaults, error shapes, TVFs,
  * COPY, catalog — the behaviors the reference's slt corpus exercises
  * (create/insert/delete/update/select over in-memory tables). */
class SessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def fresh() = new GraftSession(spark)

  test("create/insert/select round-trip with defaults") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_ses1")
    g.sql("CREATE TABLE t_ses1 (a INT, b STRING DEFAULT 'dflt', c DOUBLE DEFAULT 0.5)")
    assert(g.sql("INSERT INTO t_ses1 VALUES (1, 'x', 1.5)").collect().head.getLong(0) == 1)
    assert(g.sql("INSERT INTO t_ses1 (a) VALUES (2), (3)").collect().head.getLong(0) == 2)
    val rows = g.sql("SELECT a, b, c FROM t_ses1 ORDER BY a").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getString(1) == "dflt" && rows(1).getDouble(2) == 0.5)
  }

  test("insert arity mismatch errors") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_ses2")
    g.sql("CREATE TABLE t_ses2 (a INT, b INT)")
    assertThrows[Exception](g.sql("INSERT INTO t_ses2 VALUES (1)"))
  }

  test("create duplicate errors unless IF NOT EXISTS; drop missing errors unless IF EXISTS") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_ses3")
    g.sql("CREATE TABLE t_ses3 (a INT)")
    assertThrows[Exception](g.sql("CREATE TABLE t_ses3 (a INT)"))
    g.sql("CREATE TABLE IF NOT EXISTS t_ses3 (a INT)") // no-op
    g.sql("DROP TABLE t_ses3")
    assertThrows[Exception](g.sql("DROP TABLE t_ses3"))
    g.sql("DROP TABLE IF EXISTS t_ses3") // no-op
  }

  test("delete without predicate truncates; with predicate is Kleene-safe") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_ses4")
    g.sql("CREATE TABLE t_ses4 (a INT, b INT)")
    g.sql("INSERT INTO t_ses4 VALUES (1, 10), (2, NULL), (3, 30)")
    // predicate NULL on row 2 -> not deleted (NOT TRUE)
    assert(g.sql("DELETE FROM t_ses4 WHERE b > 15").collect().head.getLong(0) == 1)
    assert(g.sql("SELECT a FROM t_ses4 ORDER BY a").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(g.sql("DELETE FROM t_ses4").collect().head.getLong(0) == 2)
    assert(g.sql("SELECT * FROM t_ses4").count() == 0)
  }

  test("update executes (reference only plans it)") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_ses5")
    g.sql("CREATE TABLE t_ses5 (a INT, b STRING)")
    g.sql("INSERT INTO t_ses5 VALUES (1, 'x'), (2, 'y')")
    assert(g.sql("UPDATE t_ses5 SET b = upper(b) WHERE a = 2").collect().head.getLong(0) == 1)
    assert(g.sql("SELECT b FROM t_ses5 ORDER BY a").collect().map(_.getString(0)).toSeq ==
      Seq("x", "Y"))
  }

  test("UPDATE without WHERE touches all rows") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_ses6")
    g.sql("CREATE TABLE t_ses6 (a INT)")
    g.sql("INSERT INTO t_ses6 VALUES (1), (2)")
    assert(g.sql("UPDATE t_ses6 SET a = a * 10").collect().head.getLong(0) == 2)
    assert(g.sql("SELECT a FROM t_ses6 ORDER BY a").collect().map(_.getLong(0)).toSeq ==
      Seq(10L, 20L))
  }

  test("qurious.public qualifier and SHOW TABLES parity") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_ses7")
    g.sql("CREATE TABLE t_ses7 (a INT)")
    g.sql("INSERT INTO qurious.public.t_ses7 VALUES (42)")
    assert(g.sql("SELECT a FROM public.t_ses7").collect().head.getLong(0) == 42L)
    val st = g.sql("SHOW TABLES")
    assert(st.columns.toSeq ==
      Seq("catalog_name", "schema_name", "table_name", "table_type"))
    assert(st.collect().exists(r => r.getString(2) == "t_ses7" && r.getString(3) == "BASE TABLE"))
  }

  test("read_csv TVF honors delimiter/header options") {
    val g = fresh()
    val p = java.nio.file.Files.createTempFile("graft_tvf", ".csv")
    java.nio.file.Files.writeString(p, "a;b\n1;x\n2;y\n")
    val rows = g.sql(s"SELECT a, b FROM read_csv('$p', delim=>';', header=>true) ORDER BY a")
      .collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "x"), (2, "y")))
  }

  test("COPY FROM appends with target schema") {
    val g = fresh()
    val p = java.nio.file.Files.createTempFile("graft_copy", ".csv")
    java.nio.file.Files.writeString(p, "1|one\n2|two\n")
    g.sql("DROP TABLE IF EXISTS t_ses8")
    g.sql("CREATE TABLE t_ses8 (k INT, v STRING)")
    assert(g.sql(s"COPY t_ses8 FROM '$p' (DELIMITER '|')").collect().head.getLong(0) == 2)
    assert(g.sql("SELECT v FROM t_ses8 ORDER BY k").collect().map(_.getString(0)).toSeq ==
      Seq("one", "two"))
  }

  test("COPY TO exports csv and parquet, round-trips, counts rows") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_cpt")
    g.sql("CREATE TABLE t_cpt (k INT, v STRING)")
    g.sql("INSERT INTO t_cpt VALUES (1, 'one'), (2, 'two'), (3, 'three')")

    val csvDir = java.nio.file.Files.createTempDirectory("graft_copyto").toString + "/csv"
    assert(g.sql(s"COPY t_cpt TO '$csvDir' (HEADER, DELIMITER '|')")
      .collect().head.getLong(0) == 3)
    val back = spark.read.option("header", "true").option("delimiter", "|")
      .csv(csvDir)
    assert(back.collect().map(_.getString(1)).sorted.toSeq == Seq("one", "three", "two"))

    val pqDir = java.nio.file.Files.createTempDirectory("graft_copyto").toString + "/pq"
    assert(g.sql(s"COPY (SELECT k, v FROM t_cpt WHERE k < 3) TO '$pqDir' (FORMAT PARQUET)")
      .collect().head.getLong(0) == 2)
    assert(spark.read.parquet(pqDir).count() == 2)

    // a literal containing ' to ' must not confuse the router
    g.sql("DROP TABLE IF EXISTS t_cpt2")
    g.sql("CREATE TABLE t_cpt2 (v STRING)")
    g.sql("INSERT INTO t_cpt2 VALUES ('from a to b')")
    val pqDir2 = java.nio.file.Files.createTempDirectory("graft_copyto").toString + "/pq2"
    assert(g.sql(s"COPY t_cpt2 TO '$pqDir2' (FORMAT PARQUET)").collect().head.getLong(0) == 1)
    assert(spark.read.parquet(pqDir2).head.getString(0) == "from a to b")
  }

  test("MERGE INTO upserts: update matched, insert unmatched, delete matched") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_mrg")
    g.sql("CREATE TABLE t_mrg (k INT, v STRING, n INT DEFAULT 0)")
    g.sql("INSERT INTO t_mrg VALUES (1, 'one', 10), (2, 'two', 20), (3, 'three', 30)")

    // upsert: k=2 updated, k=4 inserted (n takes its DEFAULT)
    val n1 = g.sql("""MERGE INTO t_mrg t
        USING (SELECT 2 AS k, 'TWO' AS v UNION ALL SELECT 4 AS k, 'four' AS v) s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v, n = t.n + 1
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      .collect().head.getLong(0)
    assert(n1 == 2)
    val rows = g.sql("SELECT k, v, n FROM t_mrg ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "one", 10L), (2L, "TWO", 21L), (3L, "three", 30L),
      (4L, "four", 0L)))

    // matched delete
    val n2 = g.sql("""MERGE INTO t_mrg t
        USING (SELECT 1 AS k UNION ALL SELECT 4 AS k) s
        ON t.k = s.k
        WHEN MATCHED THEN DELETE""")
      .collect().head.getLong(0)
    assert(n2 == 2)
    assert(g.sql("SELECT k FROM t_mrg ORDER BY k").collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 3L))

    // conditional clauses rejected loudly
    assertThrows[Exception](g.sql("""MERGE INTO t_mrg t USING t_mrg s ON t.k = s.k
        WHEN MATCHED AND t.k > 1 THEN DELETE"""))
  }

  test("CREATE VIEW / DROP VIEW lifecycle") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_vw")
    g.sql("DROP VIEW IF EXISTS v_vw")
    g.sql("CREATE TABLE t_vw (a INT, b INT)")
    g.sql("INSERT INTO t_vw VALUES (1, 10), (2, 20), (3, 30)")
    g.sql("CREATE VIEW v_vw AS SELECT a, b * 2 AS b2 FROM t_vw WHERE a > 1")
    assert(g.sql("SELECT a, b2 FROM v_vw ORDER BY a").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 40L), (3L, 60L)))
    // listed as VIEW, not BASE TABLE
    val tpe = g.sql(
      "SELECT table_type FROM information_schema.tables WHERE table_name = 'v_vw'")
      .collect().head.getString(0)
    assert(tpe == "VIEW")
    assertThrows[Exception](g.sql("CREATE VIEW v_vw AS SELECT 1 AS x"))
    g.sql("CREATE OR REPLACE VIEW v_vw AS SELECT count(*) AS n FROM t_vw")
    assert(g.sql("SELECT n FROM v_vw").collect().head.getLong(0) == 3)
    g.sql("DROP VIEW v_vw")
    assertThrows[Exception](g.sql("DROP VIEW v_vw"))
    g.sql("DROP VIEW IF EXISTS v_vw") // no-op
    // views cannot shadow or drop base tables
    assertThrows[Exception](g.sql("CREATE OR REPLACE VIEW t_vw AS SELECT 1 AS x"))
    assertThrows[Exception](g.sql("DROP VIEW t_vw"))
  }

  test("EXPLAIN returns a plan without executing") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_expl")
    g.sql("CREATE TABLE t_expl (a INT)")
    g.sql("INSERT INTO t_expl VALUES (1), (2)")
    val plan = g.sql("EXPLAIN SELECT a FROM t_expl WHERE a > 1")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("Physical Plan"), plan)
    val formatted = g.sql("EXPLAIN FORMATTED SELECT count(*) FROM t_expl")
      .collect().map(_.getString(0)).mkString("\n")
    assert(formatted.contains("HashAggregate") || formatted.contains("Aggregate"), formatted)
    // EXPLAIN of DML must not execute it
    g.sql("EXPLAIN DELETE FROM t_expl")
    assert(g.sql("SELECT count(*) AS n FROM t_expl").collect().head.getLong(0) == 2)
  }

  test("CTAS and information_schema") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_ses9")
    g.sql("CREATE TABLE t_ses9 AS SELECT 1 AS x, 'a' AS y")
    val info = g.sql(
      "SELECT table_type FROM information_schema.tables WHERE table_name = 't_ses9'")
    assert(info.collect().head.getString(0) == "BASE TABLE")
  }

  test("information_schema.columns lists names, positions, SQL type spellings") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_cols")
    g.sql("CREATE TABLE t_cols (a INT, b STRING, c DOUBLE, d DATE)")
    val rows = g.sql("""SELECT column_name, ordinal_position, data_type
        FROM information_schema.columns WHERE table_name = 't_cols'
        ORDER BY ordinal_position""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    // CREATE TABLE INT maps to Int64 (reference sql_to_arrow_data_type)
    assert(rows == Seq(("a", 1L, "BIGINT"), ("b", 2L, "VARCHAR"),
      ("c", 3L, "DOUBLE"), ("d", 4L, "DATE")))
  }

  test("ALTER TABLE: add/rename/drop column with defaults and TRUNCATE") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_alt")
    g.sql("CREATE TABLE t_alt (a INT, b STRING)")
    g.sql("INSERT INTO t_alt VALUES (1, 'x'), (2, 'y')")
    g.sql("ALTER TABLE t_alt ADD COLUMN c DOUBLE DEFAULT 1.5")
    // backfill: existing rows get the default
    assert(g.sql("SELECT c FROM t_alt").collect().forall(_.getDouble(0) == 1.5))
    // new inserts with a column subset also take the default
    g.sql("INSERT INTO t_alt (a, b) VALUES (3, 'z')")
    assert(g.sql("SELECT count(*) AS n FROM t_alt WHERE c = 1.5")
      .head().getLong(0) == 3)
    g.sql("ALTER TABLE t_alt RENAME COLUMN b TO label")
    assert(g.sql("SELECT label FROM t_alt WHERE a = 1").head().getString(0) == "x")
    g.sql("ALTER TABLE t_alt DROP COLUMN c")
    assert(g.sql("SELECT * FROM t_alt").columns.toSeq == Seq("a", "label"))
    assertThrows[Exception](g.sql("ALTER TABLE t_alt ADD COLUMN a INT")) // dup
    assertThrows[Exception](g.sql("ALTER TABLE t_alt DROP COLUMN nope"))
    val n = g.sql("TRUNCATE TABLE t_alt").head().getLong(0)
    assert(n == 3 && g.sql("SELECT count(*) AS n FROM t_alt").head().getLong(0) == 0)
  }

  test("multi-line CTAS parses (AS followed by newline)") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_ml")
    g.sql("CREATE TABLE t_ml AS\n  SELECT 1 AS a, 'x' AS b")
    assert(g.sql("SELECT a, b FROM t_ml").collect().head.getInt(0) == 1)
    g.sql("DROP TABLE IF EXISTS t_ml2")
    g.sql("CREATE TABLE t_ml2 (a INT, b STRING) AS\n  SELECT 2, 'y'")
    assert(g.sql("SELECT a FROM t_ml2").collect().head.getLong(0) == 2L)
  }

  test("DESCRIBE answers from the catalog, schema-qualified included") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_desc")
    g.sql("CREATE TABLE t_desc (a INT NOT NULL, b STRING, c DATE)")
    val rows = g.sql("DESCRIBE t_desc")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(("a", "BIGINT", "NO"), ("b", "VARCHAR", "YES"),
      ("c", "DATE", "YES")))
    assertThrows[Exception](g.sql("DESCRIBE no_such_table"))
    // schema-qualified
    g.sql("CREATE SCHEMA IF NOT EXISTS s_desc")
    g.sql("DROP SCHEMA s_desc CASCADE")
    g.sql("CREATE SCHEMA s_desc")
    g.sql("CREATE TABLE s_desc.u (x DOUBLE)")
    val qual = g.sql("DESC s_desc.u").collect()
    assert(qual.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "DOUBLE")))
    g.sql("DROP SCHEMA s_desc CASCADE")
  }

  test("SHOW SCHEMAS and SHOW COLUMNS answer from the catalog") {
    val g = fresh()
    val base = g.sql("SHOW SCHEMAS").collect().map(_.getString(0)).toSeq
    assert(base.contains("public"))
    g.sql("CREATE SCHEMA IF NOT EXISTS s_show")
    g.sql("DROP SCHEMA s_show CASCADE")
    g.sql("CREATE SCHEMA s_show")
    assert(g.sql("SHOW DATABASES").collect().map(_.getString(0))
      .contains("s_show"))
    g.sql("DROP TABLE IF EXISTS t_showc")
    g.sql("CREATE TABLE t_showc (a INT, b STRING)")
    val cols = g.sql("SHOW COLUMNS FROM t_showc")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cols == Seq(("a", "BIGINT"), ("b", "VARCHAR")))
    assert(g.sql("SHOW COLUMNS IN t_showc").collect().length == 2)
    assertThrows[Exception](g.sql("SHOW COLUMNS FROM no_such"))
    g.sql("DROP SCHEMA s_show CASCADE")
  }

  test("CREATE/DROP SCHEMA lifecycle: namespaces, errors, CASCADE") {
    val g = fresh()
    g.sql("CREATE SCHEMA IF NOT EXISTS s_life")
    g.sql("DROP SCHEMA s_life CASCADE") // clean slate for reruns
    g.sql("CREATE SCHEMA s_life")
    assertThrows[Exception](g.sql("CREATE SCHEMA s_life")) // duplicate
    g.sql("CREATE SCHEMA IF NOT EXISTS s_life") // idempotent
    g.sql("CREATE TABLE s_life.t (a INT)")
    g.sql("INSERT INTO s_life.t VALUES (1), (2)")
    assert(g.sql("SELECT count(*) AS n FROM s_life.t").head().getLong(0) == 2)
    // schema-qualified name is invisible unqualified, and vice versa
    assertThrows[Exception](g.sql("SELECT * FROM t"))
    // catalog reports the schema
    val cat = g.sql("""SELECT schema_name, table_name FROM information_schema.tables
        WHERE schema_name = 's_life'""").collect()
    assert(cat.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("s_life", "t")))
    assertThrows[Exception](g.sql("DROP SCHEMA s_life")) // not empty
    assertThrows[Exception](g.sql("DROP SCHEMA public")) // default schema
    g.sql("DROP SCHEMA s_life CASCADE")
    assertThrows[Exception](g.sql("SELECT * FROM s_life.t")) // table gone
    assertThrows[Exception](g.sql("DROP SCHEMA s_life")) // already gone
    g.sql("DROP SCHEMA IF EXISTS s_life")
  }

  test("DISTINCT ON keeps the first row per key under the ORDER BY") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_don")
    g.sql("CREATE TABLE t_don (k INT, v STRING, n INT)")
    g.sql("INSERT INTO t_don VALUES (1,'a',10), (1,'b',30), (2,'c',20), (2,'d',5)")
    val rows = g.sql("""SELECT DISTINCT ON (k) k, v, n FROM t_don
        ORDER BY k, n DESC""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "b", 30L), (2L, "c", 20L)))
    // star select: the helper rank column must not leak into the output
    val star = g.sql("SELECT DISTINCT ON (k) * FROM t_don ORDER BY k, n DESC")
    assert(star.columns.toSeq == Seq("k", "v", "n"))
    assert(star.count() == 2)
  }

  test("PIVOT and UNPIVOT SQL route through the front door") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_piv")
    g.sql("CREATE TABLE t_piv (grp STRING, kind STRING, n INT)")
    g.sql("""INSERT INTO t_piv VALUES
        ('a','x',1), ('a','y',2), ('b','x',3), ('b','x',4)""")
    val piv = g.sql("""SELECT * FROM (SELECT grp, kind, n FROM t_piv)
        PIVOT (sum(n) FOR kind IN ('x' AS x, 'y' AS y)) ORDER BY grp""")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSeq
    assert(piv == Seq(("a", 1L, 2L), ("b", 7L, null)))
    val unp = g.sql("""SELECT grp, metric, v FROM t_piv
        UNPIVOT (v FOR metric IN (n)) ORDER BY grp, v""")
    assert(unp.count() == 4 && unp.columns.toSeq == Seq("grp", "metric", "v"))
  }

  test("ASOF JOIN SQL: inner drops unmatched, LEFT keeps with null payload") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_trades")
    g.sql("DROP TABLE IF EXISTS t_quotes")
    g.sql("CREATE TABLE t_trades (sym STRING, t_ts INT, qty INT)")
    g.sql("CREATE TABLE t_quotes (q_sym STRING, q_ts INT, px INT)")
    g.sql("INSERT INTO t_trades VALUES ('a',5,1), ('a',10,2), ('b',3,3)")
    g.sql("INSERT INTO t_quotes VALUES ('a',4,100), ('a',9,110), ('b',7,200)")
    val inner = g.sql("""SELECT sym, t_ts, qty, q_ts, px
        FROM t_trades tr ASOF JOIN t_quotes q
          ON tr.sym = q.q_sym AND tr.t_ts >= q.q_ts
        ORDER BY sym, t_ts""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
    // each trade ← latest quote at-or-before it; b@3 has no quote ≤ 3
    assert(inner == Seq(("a", 5L, 4L, 100L), ("a", 10L, 9L, 110L)))
    val left = g.sql("""SELECT sym, t_ts, px
        FROM t_trades tr ASOF LEFT JOIN t_quotes q
          ON tr.sym = q.q_sym AND tr.t_ts >= q.q_ts
        ORDER BY sym, t_ts""")
    assert(left.count() == 3)
    assert(left.filter("px IS NULL").count() == 1)
  }

  test("schema name colliding with a table alias does not mangle the alias") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_alias_n")
    g.sql("CREATE TABLE t_alias_n (n_nationkey INT)")
    g.sql("INSERT INTO t_alias_n VALUES (7)")
    g.sql("CREATE SCHEMA IF NOT EXISTS s")
    // `s` is both a registered schema and the table alias here; Postgres/
    // DuckDB resolve the alias, so s.n_nationkey must NOT mangle to s__...
    val r = g.sql("SELECT s.n_nationkey FROM t_alias_n AS s").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(7L))
    g.sql("DROP SCHEMA s")
    g.sql("DROP TABLE t_alias_n")
  }

  test("DROP SCHEMA CASCADE drops only recorded members, not prefix lookalikes") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS cascprefix__x")
    // a PUBLIC table that merely looks like a schema-qualified name
    g.sql("CREATE TABLE cascprefix__x (k INT)")
    g.sql("INSERT INTO cascprefix__x VALUES (1)")
    g.sql("CREATE SCHEMA cascprefix")
    g.sql("CREATE TABLE cascprefix.t (k INT)")
    g.sql("INSERT INTO cascprefix.t VALUES (2)")
    g.sql("DROP SCHEMA cascprefix CASCADE")
    // the real member is gone, the lookalike survives with its data
    val r = g.sql("SELECT k FROM cascprefix__x").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L))
    g.sql("DROP TABLE cascprefix__x")
  }

  test("EXPORT/IMPORT DATABASE round-trips tables with defaults and constraints") {
    val g = fresh()
    g.sql("CREATE TABLE exp_a (id INT PRIMARY KEY, v INT NOT NULL DEFAULT 7, CHECK (v >= 0))")
    g.sql("INSERT INTO exp_a (id) VALUES (1), (2)")
    g.sql("CREATE TABLE exp_b (s VARCHAR)")
    g.sql("INSERT INTO exp_b VALUES ('x')")
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    g.sql(s"EXPORT DATABASE '$dir'")
    g.sql("DROP TABLE exp_a")
    g.sql("DROP TABLE exp_b")
    g.sql(s"IMPORT DATABASE '$dir'")
    assert(g.sql("SELECT id, v FROM exp_a ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 7L), (2L, 7L)))
    assert(g.sql("SELECT s FROM exp_b").head.getString(0) == "x")
    // constraints enforce again after import; DEFAULT persists
    intercept[Exception](g.sql("INSERT INTO exp_a VALUES (1, 5)")) // PK duplicate
    intercept[Exception](g.sql("INSERT INTO exp_a VALUES (3, -1)")) // CHECK
    g.sql("INSERT INTO exp_a (id) VALUES (3)")
    assert(g.sql("SELECT v FROM exp_a WHERE id = 3").head().getLong(0) == 7L)
    g.sql("DROP TABLE exp_a")
    g.sql("DROP TABLE exp_b")
  }

  test("SHOW CREATE TABLE emits DDL that round-trips with constraints enforcing") {
    val g = fresh()
    g.sql("CREATE TABLE sct_t (id INT PRIMARY KEY, v INT NOT NULL DEFAULT 3, CHECK (v >= 0))")
    val ddl = g.sql("SHOW CREATE TABLE sct_t").head().getString(0)
    assert(ddl.contains("NOT NULL") && ddl.contains("DEFAULT 3")
      && ddl.contains("UNIQUE (id)") && ddl.contains("CHECK (v >= 0)"), ddl)
    g.sql("DROP TABLE sct_t")
    g.sql(ddl) // the emitted statement recreates the table
    g.sql("INSERT INTO sct_t (id) VALUES (1)")
    assert(g.sql("SELECT v FROM sct_t").head().getLong(0) == 3L) // DEFAULT kept
    intercept[Exception](g.sql("INSERT INTO sct_t VALUES (1, 5)")) // PK kept
    intercept[Exception](g.sql("INSERT INTO sct_t VALUES (2, -1)")) // CHECK kept
    g.sql("DROP TABLE sct_t")
  }

  test("SET and RESET session configuration through the front door") {
    val g = fresh()
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    g.sql(s"SET $key = 12345")
    assert(spark.conf.get(key) == "12345")
    g.sql(s"SET $key TO '23456'")
    assert(spark.conf.get(key) == "23456")
    g.sql(s"RESET $key")
    assert(spark.conf.get(key) != "23456")
    spark.conf.set(key, prev)
  }

  test("PREPARE/EXECUTE/DEALLOCATE parameterized statements") {
    val g = fresh()
    graft.sources.Tables.register(spark, TestSpark.sfDir, Seq("nation"))
    g.sql("PREPARE nat_by_region AS SELECT n_name FROM nation WHERE n_regionkey = $1 AND n_name <> '$1 literal stays' ORDER BY n_name")
    val r1 = g.sql("EXECUTE nat_by_region(1)").collect().map(_.getString(0))
    val r2 = g.sql("EXECUTE nat_by_region(2)").collect().map(_.getString(0))
    assert(r1.nonEmpty && r2.nonEmpty && r1.toSet != r2.toSet)
    // arity is checked
    intercept[Exception](g.sql("EXECUTE nat_by_region()"))
    intercept[Exception](g.sql("EXECUTE nat_by_region(1, 2)"))
    // re-prepare replaces; string args substitute as literals
    g.sql("PREPARE nat_by_region AS SELECT count(*) AS n FROM nation WHERE n_name < $1")
    val n = g.sql("EXECUTE nat_by_region('zzz')").head().getLong(0)
    assert(n > 0)
    g.sql("DEALLOCATE nat_by_region")
    intercept[Exception](g.sql("EXECUTE nat_by_region(1)"))
    intercept[Exception](g.sql("DEALLOCATE nat_by_region"))
  }

  test("VERSION AS OF time travel and DESCRIBE HISTORY across the mutation chain") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS tt_x")
    g.sql("CREATE TABLE tt_x (k INT, v INT)") // v0: empty
    g.sql("INSERT INTO tt_x VALUES (1, 10), (2, 20)") // v1
    g.sql("UPDATE tt_x SET v = 99 WHERE k = 1") // v2
    g.sql("DELETE FROM tt_x WHERE k = 2") // v3
    def vals(sql: String): Seq[(Long, Long)] =
      g.sql(sql).collect()
        .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
        .toSeq.sorted
    assert(g.sql("SELECT * FROM tt_x VERSION AS OF 0").count() == 0)
    assert(vals("SELECT k, v FROM tt_x VERSION AS OF 1") == Seq((1L, 10L), (2L, 20L)))
    assert(vals("SELECT k, v FROM tt_x VERSION AS OF 2") == Seq((1L, 99L), (2L, 20L)))
    assert(vals("SELECT k, v FROM tt_x VERSION AS OF 3") == Seq((1L, 99L)))
    assert(vals("SELECT k, v FROM tt_x") == Seq((1L, 99L))) // current == latest
    val hist = g.sql("DESCRIBE HISTORY tt_x").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(hist == Seq(0 -> "CREATE", 1 -> "INSERT", 2 -> "UPDATE", 3 -> "DELETE"))
    intercept[Exception](g.sql("SELECT * FROM tt_x VERSION AS OF 9").collect())
    g.sql("DROP TABLE tt_x")
  }

  test("TABLESAMPLE is deterministic across reruns and seed-sensitive") {
    val g = fresh()
    graft.sources.Tables.register(spark, TestSpark.sfDir, Seq("documents"))
    def ids(seed: Int): Seq[Long] =
      g.sql(s"SELECT doc_id FROM documents TABLESAMPLE (20 PERCENT) REPEATABLE ($seed) ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
    val a = ids(7)
    assert(a == ids(7), "same seed must return the identical sample")
    assert(a != ids(8), "different seeds must draw different samples")
    val n = spark.table("documents").count()
    // content-keyed Bernoulli: expect ~20%, loose bounds
    assert(a.size > n / 10 && a.size < n / 2, s"sample size ${a.size} of $n")
  }

  test("EXECUTE arity ignores $n references inside string literals") {
    val g = fresh()
    g.sql("PREPARE p_lit AS SELECT '$2' AS tag WHERE 1 = $1")
    // highest unquoted ref is $1 → exactly one argument expected
    assert(g.sql("EXECUTE p_lit(1)").collect().map(_.getString(0)).toSeq == Seq("$2"))
    intercept[Exception](g.sql("EXECUTE p_lit(1, 2)"))
    g.sql("DEALLOCATE p_lit")
  }

  test("DEFAULT followed by column constraints parses both") {
    val g = fresh()
    g.sql("DROP TABLE IF EXISTS t_defck")
    g.sql("CREATE TABLE t_defck (id INT, v INT DEFAULT 5 CHECK (v > 0), w INT DEFAULT 2 NOT NULL, s STRING DEFAULT NULL)")
    g.sql("INSERT INTO t_defck (id) VALUES (1)") // defaults fill
    val r = g.sql("SELECT v, w, s FROM t_defck").head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L && r.isNullAt(2))
    // the CHECK after DEFAULT is enforced
    intercept[Exception](g.sql("INSERT INTO t_defck VALUES (2, -1, 1, 'x')"))
    // the NOT NULL after DEFAULT is enforced
    intercept[Exception](g.sql("INSERT INTO t_defck VALUES (3, 1, NULL, 'x')"))
    g.sql("DROP TABLE t_defck")
  }

  test("front door keeps statements whose sink is a managed table even when the source reads a V2 catalog") {
    val g = fresh()
    spark.conf.set("spark.sql.catalog.gmem",
      classOf[graft.sources.GraftMemCatalog].getName)
    g.sql("CREATE NAMESPACE IF NOT EXISTS gmem.mix")
    g.sql("DROP TABLE IF EXISTS gmem.mix.src")
    g.sql("CREATE TABLE gmem.mix.src (id BIGINT, v BIGINT)")
    g.sql("INSERT INTO gmem.mix.src VALUES (1, 10), (2, 20)")
    // CTAS with a bare-name sink stays front-door-managed...
    g.sql("DROP TABLE IF EXISTS mix_local")
    g.sql("CREATE TABLE mix_local AS SELECT id, v FROM gmem.mix.src")
    assert(g.tables.exists("mix_local"), "CTAS sink must be a managed mutable table")
    // ...and front-door DML can read the catalog as a source
    assert(g.sql("INSERT INTO mix_local SELECT id + 10, v FROM gmem.mix.src")
      .head().getLong(0) == 2L)
    assert(g.sql("SELECT count(*) AS n FROM mix_local").head().getLong(0) == 4L)
    g.sql("UPDATE mix_local SET v = 0 WHERE id IN (SELECT id FROM gmem.mix.src)")
    assert(g.sql("SELECT sum(v) AS s FROM mix_local").head().getLong(0) == 30L)
    // catalog-sink statements still pass through to Spark's resolver
    g.sql("INSERT INTO gmem.mix.src SELECT id, v FROM mix_local WHERE id = 11")
    assert(spark.table("gmem.mix.src").count() == 3)
    g.sql("DROP TABLE mix_local")
    g.sql("DROP TABLE gmem.mix.src")
  }
}
