package graft.queries

import graft.GraftSession
import graft.sources.Tables

/** DDL/DML surface via [[graft.GraftSession]] — CREATE TABLE with declared
  * schema + per-column DEFAULTs, CTAS, INSERT VALUES / column-subset /
  * INSERT-SELECT, DELETE WHERE, UPDATE SET (executed — the reference only
  * plans it, `qurious/src/execution/session.rs:130-134`), and the `row`
  * count batches DML returns (`make_count_batch`,
  * `qurious/src/utils/batch.rs:13-16`).
  *
  * Each query is self-contained: it re-creates its tables (DROP IF EXISTS
  * first) so reruns in a shared session are idempotent.
  */
object DdlDml extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ddl_create_insert_defaults",
      (s, dir) => {
        val g = new GraftSession(s)
        Tables.register(s, dir, Seq("nation"))
        g.sql("DROP TABLE IF EXISTS ddl_demo")
        g.sql("""CREATE TABLE ddl_demo (
            k INT, name STRING, score DOUBLE DEFAULT 1.5, tag VARCHAR DEFAULT 'none')""")
        g.sql("INSERT INTO ddl_demo VALUES (1, 'a', 2.0, 'x'), (2, 'b', 3.0, 'y')")
        g.sql("INSERT INTO ddl_demo (k, name) VALUES (3, 'c')") // defaults fill score/tag
        g.sql("INSERT INTO ddl_demo SELECT n_nationkey, n_name, 9.9, 'nation' FROM nation WHERE n_nationkey < 3")
        g.sql("SELECT * FROM ddl_demo ORDER BY k, name")
      },
      Some("""SELECT CAST(k AS BIGINT) AS k, name, CAST(score AS DOUBLE) AS score, tag FROM (
          SELECT * FROM (VALUES (1, 'a', 2.0, 'x'), (2, 'b', 3.0, 'y'),
                                (3, 'c', 1.5, 'none')) v(k, name, score, tag)
          UNION ALL
          SELECT n_nationkey, n_name, 9.9, 'nation' FROM nation WHERE n_nationkey < 3)
        ORDER BY k, name""")),

    QueryDef(
      "dml_delete_where",
      (s, dir) => {
        val g = new GraftSession(s)
        Tables.register(s, dir, Seq("supplier"))
        g.sql("DROP TABLE IF EXISTS dml_del")
        g.sql("CREATE TABLE dml_del AS SELECT * FROM supplier")
        g.sql("DELETE FROM dml_del WHERE s_acctbal < 3000 OR s_nationkey = 7")
        g.sql("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM dml_del ORDER BY s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        WHERE NOT (s_acctbal < 3000 OR s_nationkey = 7) ORDER BY s_suppkey""")),

    QueryDef(
      "dml_update_set",
      (s, dir) => {
        val g = new GraftSession(s)
        Tables.register(s, dir, Seq("nation"))
        g.sql("DROP TABLE IF EXISTS dml_upd")
        g.sql("CREATE TABLE dml_upd AS SELECT n_nationkey, n_name, n_regionkey FROM nation")
        g.sql("UPDATE dml_upd SET n_name = concat(n_name, '_EU'), n_regionkey = n_regionkey + 10 WHERE n_regionkey = 3")
        g.sql("SELECT * FROM dml_upd ORDER BY n_nationkey")
      },
      Some("""SELECT n_nationkey,
        CASE WHEN n_regionkey = 3 THEN n_name || '_EU' ELSE n_name END AS n_name,
        CASE WHEN n_regionkey = 3 THEN n_regionkey + 10 ELSE n_regionkey END AS n_regionkey
        FROM nation ORDER BY n_nationkey""")),

    // ALTER TABLE schema evolution as a driver-checked row: add a defaulted
    // column (backfill), rename, drop, then mutate + insert through the
    // evolved schema. The oracle reconstructs the final table from the base
    // relation.
    QueryDef(
      "ddl_alter_table",
      (s, dir) => {
        val g = new GraftSession(s)
        Tables.register(s, dir, Seq("nation"))
        g.sql("DROP TABLE IF EXISTS alt_t")
        g.sql("CREATE TABLE alt_t AS SELECT n_nationkey, n_name, n_regionkey FROM nation")
        g.sql("ALTER TABLE alt_t ADD COLUMN zone STRING DEFAULT 'zz'")
        g.sql("ALTER TABLE alt_t RENAME COLUMN n_regionkey TO region_id")
        g.sql("ALTER TABLE alt_t DROP COLUMN n_name")
        g.sql("UPDATE alt_t SET zone = 'eu' WHERE region_id = 3")
        g.sql("INSERT INTO alt_t (n_nationkey, region_id) VALUES (99, 9)")
        g.sql("SELECT * FROM alt_t ORDER BY n_nationkey")
      },
      Some("""SELECT n_nationkey, n_regionkey AS region_id,
          CASE WHEN n_regionkey = 3 THEN 'eu' ELSE 'zz' END AS zone
        FROM nation
        UNION ALL SELECT 99, 9, 'zz'
        ORDER BY n_nationkey""")),

    // MERGE INTO as a driver-checked row (beyond the reference's grammar;
    // executes as ONE full-outer join + projection). Upsert semantics:
    // matched rows update, unmatched source rows insert — the oracle
    // reconstructs the post-merge table from base relations.
    QueryDef(
      "dml_merge_upsert",
      (s, dir) => {
        val g = new GraftSession(s)
        Tables.register(s, dir, Seq("nation"))
        g.sql("DROP TABLE IF EXISTS m_tgt")
        g.sql("""CREATE TABLE m_tgt AS
          SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey < 15""")
        g.sql("""MERGE INTO m_tgt t USING (
            SELECT n_nationkey, n_name, n_regionkey FROM nation
            WHERE n_nationkey >= 10) s
          ON t.n_nationkey = s.n_nationkey
          WHEN MATCHED THEN UPDATE SET n_regionkey = t.n_regionkey + 100
          WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)
            VALUES (s.n_nationkey, s.n_name, s.n_regionkey)""")
        g.sql("SELECT * FROM m_tgt ORDER BY n_nationkey")
      },
      Some("""SELECT n_nationkey, n_name,
          CASE WHEN n_nationkey >= 10 AND n_nationkey < 15
               THEN n_regionkey + 100 ELSE n_regionkey END AS n_regionkey
        FROM nation ORDER BY n_nationkey""")),

    // CREATE VIEW as a driver-checked row: snapshot-plan semantics (the
    // view binds its SELECT at creation; later base-table mutations don't
    // leak in), exercised by mutating the base AFTER the view exists.
    QueryDef(
      "ddl_view_snapshot",
      (s, dir) => {
        val g = new GraftSession(s)
        Tables.register(s, dir, Seq("supplier"))
        g.sql("DROP VIEW IF EXISTS v_rich")
        g.sql("DROP TABLE IF EXISTS v_base")
        g.sql("CREATE TABLE v_base AS SELECT s_suppkey, s_name, s_acctbal, s_nationkey FROM supplier")
        // decimal-cast before summing (Tpch.scala discipline): double sums
        // are partition-order-dependent; decimal sums are exact/associative
        g.sql("""CREATE VIEW v_rich AS
          SELECT s_nationkey, count(*) AS n_rich,
                 CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
          FROM v_base WHERE s_acctbal > 5000 GROUP BY s_nationkey""")
        // post-view mutation must NOT affect the snapshot view
        g.sql("DELETE FROM v_base WHERE s_acctbal > 5000")
        g.sql("SELECT * FROM v_rich ORDER BY s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS n_rich,
          CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
        FROM supplier WHERE s_acctbal > 5000
        GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // DML count batches: `row` counts returned by INSERT/DELETE/UPDATE.
    QueryDef(
      "dml_count_batches",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.functions.lit
        val g = new GraftSession(s)
        Tables.register(s, dir, Seq("supplier"))
        g.sql("DROP TABLE IF EXISTS dml_cnt")
        g.sql("CREATE TABLE dml_cnt AS SELECT * FROM supplier")
        val del = g.sql("DELETE FROM dml_cnt WHERE s_acctbal < 500")
        val upd = g.sql("UPDATE dml_cnt SET s_acctbal = s_acctbal + 1000 WHERE s_acctbal > 9000")
        val ins = g.sql("INSERT INTO dml_cnt SELECT * FROM supplier WHERE s_suppkey < 5")
        del.select(lit("delete").as("op"), $"row")
          .unionAll(upd.select(lit("update").as("op"), $"row"))
          .unionAll(ins.select(lit("insert").as("op"), $"row"))
          .orderBy($"op")
      },
      Some("""SELECT 'delete' AS op, CAST((SELECT count(*) FROM supplier WHERE s_acctbal < 500) AS BIGINT) AS row
        UNION ALL
        SELECT 'insert', CAST((SELECT count(*) FROM supplier WHERE s_suppkey < 5) AS BIGINT)
        UNION ALL
        SELECT 'update', CAST((SELECT count(*) FROM supplier WHERE s_acctbal >= 500 AND s_acctbal > 9000) AS BIGINT)
        ORDER BY op""")),

    // Time travel over the mutable tables (Delta/Iceberg VERSION AS OF,
    // beyond the reference): snapshots are zero-copy plan references kept
    // per mutation; one statement joins the table's CREATE-time state to
    // its state two mutations later. The oracle reconstructs both versions
    // from the source table with plain CASE logic — a hash match proves
    // the whole history chain (CTAS → DELETE → UPDATE) snapshotted
    // correctly.
    QueryDef(
      "ddl_time_travel",
      (s, dir) => {
        val g = new GraftSession(s)
        Tables.register(s, dir, Seq("nation"))
        g.sql("DROP TABLE IF EXISTS tt_nat")
        g.sql("CREATE TABLE tt_nat AS SELECT n_nationkey, n_name, n_regionkey FROM nation") // v0
        g.sql("DELETE FROM tt_nat WHERE n_regionkey <> 1") // v1
        g.sql("UPDATE tt_nat SET n_name = 'GONE'") // v2
        g.sql("""SELECT a.n_nationkey, a.n_name AS name_v0, b.n_name AS name_v2
          FROM (SELECT * FROM tt_nat VERSION AS OF 0) a
          LEFT JOIN (SELECT * FROM tt_nat VERSION AS OF 2) b
            ON a.n_nationkey = b.n_nationkey
          ORDER BY a.n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name AS name_v0,
          CASE WHEN n_regionkey = 1 THEN 'GONE' END AS name_v2
        FROM nation ORDER BY n_nationkey""")),

    // ---- the DataSourceV2 catalog under the oracle gate: namespace DDL,
    // CTAS from parquet, INSERT VALUES, and an ALTER migration all flow
    // through Spark's own resolver into [[graft.sources.GraftMemCatalog]]
    // (no front-door rewrite involved), and the read-back is hash-compared
    // against DuckDB like any other query. ----
    QueryDef(
      "ddl_v2_catalog",
      (s, dir) => {
        s.conf.set("spark.sql.catalog.gmem",
          classOf[graft.sources.GraftMemCatalog].getName)
        Tables.register(s, dir, Seq("nation"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gmem.verify")
        s.sql("DROP TABLE IF EXISTS gmem.verify.nations_eu")
        s.sql("""CREATE TABLE gmem.verify.nations_eu AS
          SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 3""")
        s.sql("INSERT INTO gmem.verify.nations_eu VALUES (999, 'SYNTHETIC')")
        s.sql("ALTER TABLE gmem.verify.nations_eu ADD COLUMN flag STRING")
        s.sql("""SELECT n_nationkey, n_name, flag
          FROM gmem.verify.nations_eu ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name, CAST(NULL AS VARCHAR) AS flag
        FROM (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 3
              UNION ALL SELECT CAST(999 AS INTEGER), 'SYNTHETIC')
        ORDER BY n_nationkey""")),

    // ---- V2 catalog semantic parity under the oracle gate: column
    // DEFAULTs fill omitted INSERT columns (Spark's ResolveDefaultColumns
    // over the table's Column metadata), CHECK + PRIMARY KEY violations
    // fail cleanly WITHOUT advancing table state (CheckInvariant in the
    // write plan / key checks at BatchWrite.commit), and MERGE INTO
    // executes natively through SupportsRowLevelOperations. The hash match
    // proves the rejected writes left zero residue and the merge produced
    // exactly the expected upsert. ----
    QueryDef(
      "ddl_v2_constraints",
      (s, dir) => {
        s.conf.set("spark.sql.catalog.gmem",
          classOf[graft.sources.GraftMemCatalog].getName)
        Tables.register(s, dir, Seq("nation"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gmem.verify")
        s.sql("DROP TABLE IF EXISTS gmem.verify.nat_gate")
        s.sql("""CREATE TABLE gmem.verify.nat_gate (
          n_nationkey INT, n_name STRING, grade STRING DEFAULT 'std',
          CONSTRAINT pk PRIMARY KEY (n_nationkey),
          CONSTRAINT keyrange CHECK (n_nationkey < 100))""")
        // DEFAULT fills the omitted grade column
        s.sql("""INSERT INTO gmem.verify.nat_gate (n_nationkey, n_name)
          SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2""")
        // both rejected writes must leave no residue in the final hash
        scala.util.Try(s.sql(
          "INSERT INTO gmem.verify.nat_gate VALUES (999, 'TOO_BIG', 'std')")) // CHECK
        scala.util.Try(s.sql("""INSERT INTO gmem.verify.nat_gate (n_nationkey, n_name)
          SELECT n_nationkey, 'DUP' FROM gmem.verify.nat_gate LIMIT 1""")) // PK dup
        // native MERGE: matched rows regrade to 'eu', unmatched insert 'new'
        s.sql("""MERGE INTO gmem.verify.nat_gate t
          USING (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 2 = 0) s
          ON t.n_nationkey = s.n_nationkey
          WHEN MATCHED THEN UPDATE SET grade = 'eu'
          WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, grade)
            VALUES (s.n_nationkey, s.n_name, 'new')""")
        s.sql("""SELECT n_nationkey, n_name, grade
          FROM gmem.verify.nat_gate ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey, n_name,
          CASE WHEN n_regionkey = 2 AND n_nationkey % 2 = 0 THEN 'eu'
               WHEN n_regionkey = 2 THEN 'std'
               ELSE 'new' END AS grade
        FROM nation WHERE n_regionkey = 2 OR n_nationkey % 2 = 0
        ORDER BY n_nationkey""")),

    // ---- the PARQUET-BACKED DSv2 tier (gdisk) under the oracle gate: the
    // same DEFAULT/CHECK/PK/MERGE surface as ddl_v2_constraints, but rows
    // live in executor-written parquet files behind a manifest commit log —
    // never on the driver — and the rejected writes, the copy-on-write
    // MERGE, and a VERSION AS OF read are all inside the hash. ----
    QueryDef(
      "ddl_v2_disk",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("nation"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.nat_disk")
        s.sql("""CREATE TABLE gdisk.verify.nat_disk (
          n_nationkey INT, n_name STRING, grade STRING DEFAULT 'std',
          CONSTRAINT pk PRIMARY KEY (n_nationkey),
          CONSTRAINT keyrange CHECK (n_nationkey < 100))""")
        // v1: DEFAULT fills the omitted grade column
        s.sql("""INSERT INTO gdisk.verify.nat_disk (n_nationkey, n_name)
          SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1""")
        // rejected writes must leave no residue: CHECK runs distributed in
        // the write plan, the PK duplicate check is a distributed job at
        // commit — neither claims a manifest version
        scala.util.Try(s.sql(
          "INSERT INTO gdisk.verify.nat_disk VALUES (999, 'TOO_BIG', 'std')"))
        scala.util.Try(s.sql(
          """INSERT INTO gdisk.verify.nat_disk (n_nationkey, n_name)
          SELECT n_nationkey, 'DUP' FROM gdisk.verify.nat_disk LIMIT 1"""))
        // v2: copy-on-write MERGE (executors rewrite the parquet files)
        s.sql("""MERGE INTO gdisk.verify.nat_disk t
          USING (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 3 = 0) s
          ON t.n_nationkey = s.n_nationkey
          WHEN MATCHED THEN UPDATE SET grade = 'eu'
          WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, grade)
            VALUES (s.n_nationkey, s.n_name, 'new')""")
        s.sql("""SELECT n_nationkey, n_name, grade FROM gdisk.verify.nat_disk
          UNION ALL
          SELECT CAST(-1 AS INT), 'ROWS_AT_V1', CAST(
            (SELECT count(*) FROM gdisk.verify.nat_disk VERSION AS OF 1) AS STRING)
          ORDER BY n_nationkey, n_name""")
      },
      Some("""WITH base AS (
          SELECT n_nationkey, n_name, 'std' AS grade FROM nation WHERE n_regionkey = 1),
        merged AS (
          SELECT b.n_nationkey, b.n_name,
                 CASE WHEN b.n_nationkey % 3 = 0 THEN 'eu' ELSE b.grade END AS grade
          FROM base b
          UNION ALL
          SELECT n.n_nationkey, n.n_name, 'new' AS grade FROM nation n
          WHERE n.n_nationkey % 3 = 0
            AND n.n_nationkey NOT IN (SELECT n_nationkey FROM base))
        SELECT n_nationkey, n_name, grade FROM merged
        UNION ALL
        SELECT -1, 'ROWS_AT_V1', CAST((SELECT count(*) FROM base) AS VARCHAR)
        ORDER BY n_nationkey, n_name""")),

    // ---- RESTORE under the oracle gate: delete half the table, RESTORE
    // to the pre-delete version (a metadata-only commit — no file read or
    // written), and hash the restored content plus a row-count probe of
    // the still-time-travelable post-delete version. Append-only history:
    // the restore itself is a version. ----
    QueryDef(
      "ddl_v2_disk_restore",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("nation"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.nat_rs")
        s.sql("CREATE TABLE gdisk.verify.nat_rs (n_nationkey INT, n_name STRING)")
        s.sql("""INSERT INTO gdisk.verify.nat_rs
          SELECT n_nationkey, n_name FROM nation""")
        s.sql("DELETE FROM gdisk.verify.nat_rs WHERE n_nationkey % 2 = 0")
        val g = new graft.GraftSession(s)
        g.sql("RESTORE TABLE gdisk.verify.nat_rs TO VERSION AS OF 1")
        s.sql("""SELECT n_nationkey, n_name FROM gdisk.verify.nat_rs
          UNION ALL
          SELECT CAST(-1 AS INT), CAST((SELECT count(*)
            FROM gdisk.verify.nat_rs VERSION AS OF 2) AS STRING)
          ORDER BY n_nationkey, n_name""")
      },
      Some("""SELECT n_nationkey, n_name FROM nation
        UNION ALL
        SELECT -1, CAST((SELECT count(*) FROM nation
          WHERE n_nationkey % 2 <> 0) AS VARCHAR)
        ORDER BY n_nationkey, n_name""")),

    // ---- METADATA-ONLY DELETE under the oracle gate: the partition
    // delete drops whole files from the manifest with ZERO file I/O
    // (SupportsDeleteV2 + the stats/dir-value all-match proof — the
    // 100 TB retention path), the straddling modulo delete falls back to
    // copy-on-write, and the hash proves the two compose correctly. The
    // plan-level zero-I/O proof is DiskCatalogSpec's executed-plan
    // assertions. ----
    QueryDef(
      "ddl_v2_disk_meta_delete",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ord_md")
        s.sql("""CREATE TABLE gdisk.verify.ord_md (
          o_orderkey BIGINT, o_totalprice DOUBLE, bucket STRING)
          PARTITIONED BY (bucket)""")
        s.sql("""INSERT INTO gdisk.verify.ord_md
          SELECT o_orderkey, o_totalprice, concat('b', o_orderkey % 3)
          FROM orders""")
        // metadata delete: whole hive dir drops from the manifest
        s.sql("DELETE FROM gdisk.verify.ord_md WHERE bucket = 'b1'")
        // straddling predicate: copy-on-write rewrite of the touched files
        s.sql("DELETE FROM gdisk.verify.ord_md WHERE o_orderkey % 2 = 0")
        s.sql("""SELECT bucket, count(*) AS n,
            CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
          FROM gdisk.verify.ord_md GROUP BY bucket ORDER BY bucket""")
      },
      Some("""SELECT concat('b', o_orderkey % 3) AS bucket,
          count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderkey % 3 <> 1 AND o_orderkey % 2 <> 0
        GROUP BY 1 ORDER BY bucket""")),

    // ---- MERGE-ON-READ DELETION VECTORS under the oracle gate
    // (TBLPROPERTIES 'delete.mode'='dv'): a straddling DELETE writes a
    // row-index sidecar instead of rewriting the file, a second DELETE
    // unions into it, reads/time-travel subtract the pinned version's
    // vectors, and the CDC feed carries each commit's DV'd rows as
    // deletes. The hash proves all four compose; the bytes-untouched /
    // purge / vacuum proofs are DeletionVectorSpec's. ----
    QueryDef(
      "ddl_v2_disk_dv",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ord_dv")
        s.sql("""CREATE TABLE gdisk.verify.ord_dv (
          o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
          TBLPROPERTIES ('delete.mode'='dv')""")
        s.sql("""INSERT INTO gdisk.verify.ord_dv
          SELECT o_orderkey, o_custkey, o_totalprice FROM orders""")
        // v2: straddling merge-on-read DELETE — sidecar, zero file rewrite
        s.sql("DELETE FROM gdisk.verify.ord_dv WHERE o_orderkey % 5 = 2")
        // v3: second DELETE unions into the same files' vectors
        s.sql("DELETE FROM gdisk.verify.ord_dv WHERE o_custkey % 11 = 3")
        val g = new GraftSession(s)
        // the TVF resolves at FROM level — materialize v3's CDC delete
        // count as a view the sentinel row can reference
        g.sql("""SELECT count(*) AS c
            FROM table_changes('gdisk.verify.ord_dv', 3, 3)
            WHERE _change_type = 'delete'""")
          .createOrReplaceTempView("ord_dv_cdc3")
        g.sql("""SELECT o_orderkey % 3 AS grp, count(*) AS n,
            CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
          FROM gdisk.verify.ord_dv GROUP BY o_orderkey % 3
          UNION ALL
          SELECT CAST(-1 AS BIGINT),
            (SELECT count(*) FROM gdisk.verify.ord_dv VERSION AS OF 1),
            CAST(-1.0 AS DOUBLE)
          UNION ALL
          SELECT CAST(-2 AS BIGINT),
            (SELECT count(*) FROM gdisk.verify.ord_dv VERSION AS OF 2),
            CAST(-2.0 AS DOUBLE)
          UNION ALL
          SELECT CAST(-3 AS BIGINT), (SELECT c FROM ord_dv_cdc3),
            CAST(-3.0 AS DOUBLE)
          ORDER BY grp""")
      },
      Some("""WITH cur AS (
          SELECT * FROM orders
          WHERE NOT (o_orderkey % 5 = 2) AND NOT (o_custkey % 11 = 3))
        SELECT o_orderkey % 3 AS grp, count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        FROM cur GROUP BY 1
        UNION ALL
        SELECT -1, (SELECT count(*) FROM orders), -1.0
        UNION ALL
        SELECT -2, (SELECT count(*) FROM orders
          WHERE NOT (o_orderkey % 5 = 2)), -2.0
        UNION ALL
        SELECT -3, (SELECT count(*) FROM orders
          WHERE NOT (o_orderkey % 5 = 2) AND o_custkey % 11 = 3), -3.0
        ORDER BY grp""")),

    // ---- MERGE-ON-READ UPDATE under the oracle gate: on a
    // 'delete.mode'='dv' table the row-level rewrite takes Spark's DELTA
    // path — each UPDATE grows the touched files' deletion vectors and
    // appends only the replacement rows (no data file rewrites; the
    // bytes-untouched digest proof is DeletionVectorSpec's). Two
    // OVERLAPPING updates prove sidecar union across commits; the CDC
    // sentinel proves the feed carries each commit's pre-image deletes;
    // the time-travel sentinel pins version isolation. ----
    QueryDef(
      "ddl_v2_disk_dv_update",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ord_dvu")
        s.sql("""CREATE TABLE gdisk.verify.ord_dvu (
          o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
          TBLPROPERTIES ('delete.mode'='dv')""")
        s.sql("""INSERT INTO gdisk.verify.ord_dvu
          SELECT o_orderkey, o_custkey, o_totalprice FROM orders""")
        // v2: delta UPDATE — DV the pre-images, append the post-images
        s.sql("""UPDATE gdisk.verify.ord_dvu
          SET o_totalprice = o_totalprice + 1000.0 WHERE o_orderkey % 10 = 3""")
        // v3: overlapping delta UPDATE (some rows updated twice — the
        // second commit DVs rows the first one appended)
        s.sql("""UPDATE gdisk.verify.ord_dvu
          SET o_totalprice = 500.0 WHERE o_custkey % 13 = 5""")
        val g = new GraftSession(s)
        g.sql("""SELECT count(*) AS c
            FROM table_changes('gdisk.verify.ord_dvu', 2, 2)
            WHERE _change_type = 'delete'""")
          .createOrReplaceTempView("ord_dvu_cdc2")
        g.sql("""SELECT o_orderkey % 7 AS grp, count(*) AS n,
            CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
          FROM gdisk.verify.ord_dvu GROUP BY o_orderkey % 7
          UNION ALL
          SELECT CAST(-1 AS BIGINT),
            (SELECT count(*) FROM gdisk.verify.ord_dvu VERSION AS OF 1),
            CAST((SELECT sum(CAST(o_totalprice AS DECIMAL(14,2)))
              FROM gdisk.verify.ord_dvu VERSION AS OF 1) AS DOUBLE)
          UNION ALL
          SELECT CAST(-2 AS BIGINT), (SELECT c FROM ord_dvu_cdc2),
            CAST(-2.0 AS DOUBLE)
          ORDER BY grp""")
      },
      Some("""WITH cur AS (
          SELECT o_orderkey,
            CASE WHEN o_custkey % 13 = 5 THEN 500.0
                 WHEN o_orderkey % 10 = 3 THEN o_totalprice + 1000.0
                 ELSE o_totalprice END AS price
          FROM orders)
        SELECT o_orderkey % 7 AS grp, count(*) AS n,
          CAST(sum(CAST(price AS DECIMAL(14,2))) AS DOUBLE) AS total
        FROM cur GROUP BY 1
        UNION ALL
        SELECT -1, (SELECT count(*) FROM orders),
          CAST((SELECT sum(CAST(o_totalprice AS DECIMAL(14,2)))
            FROM orders) AS DOUBLE)
        UNION ALL
        SELECT -2, (SELECT count(*) FROM orders WHERE o_orderkey % 10 = 3),
          -2.0
        ORDER BY grp""")),

    // ---- ZERO-COPY SHALLOW CLONE under the oracle gate: the clone
    // hard-links the source's files + deletion-vector sidecars (bytes
    // shared; inode/vacuum-independence proofs are CloneSpec's), then the
    // two tables DIVERGE — a DV delete on the clone, an append on the
    // source — and the hash proves complete isolation in both
    // directions plus the cloned snapshot's DV subtraction. ----
    QueryDef(
      "ddl_v2_disk_clone",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ord_cs")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ord_cc")
        s.sql("""CREATE TABLE gdisk.verify.ord_cs (
          o_orderkey BIGINT, o_totalprice DOUBLE)
          TBLPROPERTIES ('delete.mode'='dv')""")
        s.sql("""INSERT INTO gdisk.verify.ord_cs
          SELECT o_orderkey, o_totalprice FROM orders""")
        // v2: merge-on-read delete rides the clone as a shared sidecar
        s.sql("DELETE FROM gdisk.verify.ord_cs WHERE o_orderkey % 4 = 1")
        val g = new GraftSession(s)
        g.sql("CREATE TABLE gdisk.verify.ord_cc SHALLOW CLONE gdisk.verify.ord_cs")
        // diverge: clone deletes more, source appends — NO cross-talk
        s.sql("DELETE FROM gdisk.verify.ord_cc WHERE o_orderkey % 4 = 2")
        s.sql("""INSERT INTO gdisk.verify.ord_cs
          SELECT o_orderkey + 10000000, 1.0 FROM orders WHERE o_orderkey % 100 = 0""")
        g.sql("""SELECT 'src' AS side, count(*) AS n,
            CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
          FROM gdisk.verify.ord_cs
          UNION ALL
          SELECT 'clone', count(*),
            CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
          FROM gdisk.verify.ord_cc
          ORDER BY side""")
      },
      Some("""WITH base AS (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_orderkey % 4 <> 1)
        SELECT 'src' AS side,
          CAST((SELECT count(*) FROM base) +
            (SELECT count(*) FROM orders WHERE o_orderkey % 100 = 0)
            AS BIGINT) AS n,
          CAST((SELECT sum(CAST(o_totalprice AS DECIMAL(14,2))) FROM base) +
            (SELECT count(*) FROM orders WHERE o_orderkey % 100 = 0)
            AS DOUBLE) AS total
        UNION ALL
        SELECT 'clone',
          CAST((SELECT count(*) FROM base WHERE o_orderkey % 4 <> 2) AS BIGINT),
          CAST((SELECT sum(CAST(o_totalprice AS DECIMAL(14,2))) FROM base
                WHERE o_orderkey % 4 <> 2) AS DOUBLE)
        ORDER BY side""")),

    // ---- BLOOM-INDEXED gdisk table under the oracle gate: four
    // interleaved ingests (mod-4 key classes) give every parquet file a
    // min/max range spanning the whole key domain — the worst case for
    // range skipping — and point/IN/absent lookups run against the
    // per-file bloom sidecars the ingest writers built row-by-row. The
    // hash proves correctness UNDER skipping (a bloom bug that drops a
    // live file loses rows; the plan-level skip proof is DiskCatalogSpec's
    // statsFiles assertions). ----
    QueryDef(
      "ddl_v2_disk_bloom",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("customer"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.cust_bloom")
        s.sql("""CREATE TABLE gdisk.verify.cust_bloom (
          c_custkey BIGINT, c_name STRING)
          TBLPROPERTIES ('bloom.columns'='c_custkey,c_name',
                         'bloom.expectedItems'='10000')""")
        for (i <- 0 until 4)
          s.sql(s"""INSERT INTO gdisk.verify.cust_bloom
            SELECT c_custkey, c_name FROM customer WHERE c_custkey % 4 = $i""")
        s.sql("""SELECT c_custkey, c_name FROM gdisk.verify.cust_bloom
          WHERE c_custkey IN (1, 7, 500, 999999)
          UNION ALL
          SELECT CAST(-1 AS BIGINT), CAST((SELECT count(*)
            FROM gdisk.verify.cust_bloom WHERE c_name = 'NO_SUCH_NAME') AS STRING)
          UNION ALL
          SELECT CAST(-2 AS BIGINT), CAST((SELECT count(*)
            FROM gdisk.verify.cust_bloom) AS STRING)
          ORDER BY c_custkey, c_name""")
      },
      Some("""SELECT c_custkey, c_name FROM customer
          WHERE c_custkey IN (1, 7, 500, 999999)
        UNION ALL SELECT -1, '0'
        UNION ALL SELECT -2, CAST((SELECT count(*) FROM customer) AS VARCHAR)
        ORDER BY c_custkey, c_name""")),

    // ---- OPTIMIZE under the oracle gate: five per-region ingests land
    // five separate parquet files; bin-packing compacts them to one and
    // the hash proves the rewrite is byte-preserving. The maintenance
    // companion of gdisk's streaming sink (one small file per epoch). ----
    QueryDef(
      "ddl_v2_disk_optimize",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("nation"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.nat_opt")
        s.sql("CREATE TABLE gdisk.verify.nat_opt (n_nationkey INT, n_name STRING)")
        for (r <- 0 until 5)
          s.sql("INSERT INTO gdisk.verify.nat_opt " +
            s"SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = $r")
        new GraftSession(s).sql("OPTIMIZE gdisk.verify.nat_opt")
        s.sql("""SELECT n_nationkey, n_name FROM gdisk.verify.nat_opt
          ORDER BY n_nationkey""")
      },
      Some("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey")),

    // ---- PARTITIONED gdisk tables under the oracle gate: hive-layout
    // identity partitioning (values encoded in dirs, pruned reads), a
    // copy-on-write UPDATE scoped to one partition, and a
    // partition-filtered readback — the 100 TB table layout, hash-checked.
    QueryDef(
      "ddl_v2_disk_partitioned",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("nation"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.nat_part")
        s.sql("""CREATE TABLE gdisk.verify.nat_part (
          n_nationkey INT, n_name STRING, n_regionkey INT)
          PARTITIONED BY (n_regionkey)""")
        s.sql("""INSERT INTO gdisk.verify.nat_part
          SELECT n_nationkey, n_name, n_regionkey FROM nation""")
        s.sql("""UPDATE gdisk.verify.nat_part
          SET n_name = concat(n_name, '_X') WHERE n_regionkey = 2""")
        s.sql("""SELECT n_nationkey, n_name, n_regionkey
          FROM gdisk.verify.nat_part WHERE n_regionkey IN (1, 2)
          ORDER BY n_nationkey""")
      },
      Some("""SELECT n_nationkey,
          CASE WHEN n_regionkey = 2 THEN n_name || '_X' ELSE n_name END AS n_name,
          n_regionkey
        FROM nation WHERE n_regionkey IN (1, 2) ORDER BY n_nationkey""")),

    // ---- MANIFEST-LEVEL DATA SKIPPING under the oracle gate: every gdisk
    // commit records per-file min/max/nullCount (harvested executor-side
    // from the parquet footers the writer just closed), and scans prune
    // files against those bounds BEFORE planning — the Delta/Iceberg move
    // that keeps a 100 TB point query from listing 100 TB of files. Three
    // ingests land priority-disjoint files; the filtered readback must
    // both hash-match DuckDB AND prove in-plan that it skipped files. ----
    QueryDef(
      "ddl_v2_disk_skipping",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ord_skip")
        s.sql("""CREATE TABLE gdisk.verify.ord_skip (
          o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE)""")
        // three commits with disjoint STRING ranges (priority domain is
        // fixed '1-URGENT'..'5-LOW' at every SF) → disjoint file stats
        for ((lo, hi) <- Seq(("1", "3"), ("3", "4"), ("4", "9")))
          s.sql("INSERT INTO gdisk.verify.ord_skip " +
            "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders " +
            s"WHERE o_orderpriority >= '$lo' AND o_orderpriority < '$hi'")
        val df = s.sql("""SELECT o_orderkey, o_orderpriority, o_totalprice
          FROM gdisk.verify.ord_skip WHERE o_orderpriority = '1-URGENT'
          ORDER BY o_orderkey""")
        // the correctness row carries the PLAN proof too: files from the
        // other two ingests must be pruned by manifest stats, not read
        val m = """statsFiles=(\d+)/(\d+)""".r
          .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        require(m.exists(g => g.group(1).toLong < g.group(2).toLong),
          s"no manifest-stats skipping in plan: ${m.map(_.matched)}")
        df
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        WHERE o_orderpriority = '1-URGENT' ORDER BY o_orderkey""")),

    // ---- OPTIMIZE ZORDER BY under the oracle gate: cluster the rewrite
    // on the Morton interleave of two fixed-domain columns (equi-depth
    // percentile ranks → range partition → sort), so per-file stats get
    // tight on BOTH and a two-sided box predicate prunes files. The data
    // must stay byte-identical through the clustering rewrite. ----
    QueryDef(
      "ddl_v2_disk_zorder",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("lineitem"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        // stage the 600k-row fixture ONCE per (session, sf dir): the
        // bench re-runs each heavy entry for a median of 3, and the
        // timed body must measure the operator under test — the ZORDER
        // rewrite and the skipping readback — not a fixture ingest
        // (which dominated the old 20 s timing and tripped the
        // regression gate on noise). The table name carries a SHA-256
        // digest of the canonicalized source dir (collision-resistant,
        // unlike String.hashCode, and spelling-insensitive) so a session
        // that switches sf dirs can never serve stale rows against the
        // other dir's oracle; a row-count probe against the source
        // catches in-place data changes under a reused dir.
        val canon = new java.io.File(dir).getCanonicalPath
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .take(8).map(b => f"$b%02x").mkString
        val tbl = s"gdisk.verify.li_z_$digest"
        val srcCount = s.table("lineitem").count()
        val stale = s.catalog.tableExists(tbl) &&
          s.table(tbl).count() != srcCount
        if (stale) s.sql(s"DROP TABLE $tbl")
        if (stale || !s.catalog.tableExists(tbl)) {
          s.sql(s"""CREATE TABLE $tbl (
            l_orderkey BIGINT, l_linenumber INT,
            l_quantity DOUBLE, l_discount DOUBLE)""")
          s.sql(s"""INSERT INTO $tbl
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem""")
        }
        val opt = new GraftSession(s).sql(
          s"OPTIMIZE $tbl ZORDER BY (l_quantity, l_discount) " +
            "TARGET 65536 BYTES").head()
        val df = s.sql(s"""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
          FROM $tbl
          WHERE l_quantity <= 12 AND l_discount <= 0.02
          ORDER BY l_orderkey, l_linenumber""")
        // plan proof scales with file count (tiny SFs may pack to 1 file)
        val m = """statsFiles=(\d+)/(\d+)""".r
          .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        require(m.nonEmpty, "no statsFiles marker in gdisk plan")
        if (opt.getLong(2) >= 4)
          require(m.exists(g => g.group(1).toLong < g.group(2).toLong),
            s"z-ordered box predicate skipped nothing: ${m.map(_.matched)}")
        df
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem WHERE l_quantity <= 12 AND l_discount <= 0.02
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- CDC `table_changes` TVF under the oracle gate: a file-granular
    // change feed read straight off the manifest log — three appends
    // surface as versioned inserts, OPTIMIZE is silent (pure
    // reorganization, added=[]), and a copy-on-write UPDATE surfaces as
    // the touched groups' full pre-image deletes + post-image inserts.
    // The oracle reconstructs the entire feed from the base table. ----
    QueryDef(
      "ddl_v2_disk_changes",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ord_cdc")
        s.sql("""CREATE TABLE gdisk.verify.ord_cdc (
          o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE)""")
        for ((lo, hi) <- Seq(("1", "3"), ("3", "4"), ("4", "9"))) // v1..v3
          s.sql("INSERT INTO gdisk.verify.ord_cdc " +
            "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders " +
            s"WHERE o_orderpriority >= '$lo' AND o_orderpriority < '$hi'")
        val g = new GraftSession(s)
        g.sql("OPTIMIZE gdisk.verify.ord_cdc") // v4: CDC-silent
        s.sql("""UPDATE gdisk.verify.ord_cdc
          SET o_totalprice = o_totalprice * 2
          WHERE o_orderpriority LIKE '3%'""") // v5: COW delete+insert
        g.sql("""SELECT _commit_version, _change_type,
            o_orderkey, o_orderpriority, o_totalprice
          FROM table_changes('gdisk.verify.ord_cdc', 0, 5)
          ORDER BY _commit_version, _change_type, o_orderkey""")
      },
      Some("""WITH s AS (
          SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders),
        feed AS (
          SELECT 1 AS _commit_version, 'insert' AS _change_type, *
          FROM s WHERE o_orderpriority >= '1' AND o_orderpriority < '3'
          UNION ALL SELECT 2, 'insert', *
          FROM s WHERE o_orderpriority >= '3' AND o_orderpriority < '4'
          UNION ALL SELECT 3, 'insert', *
          FROM s WHERE o_orderpriority >= '4'
          UNION ALL SELECT 5, 'delete', * FROM s
          UNION ALL SELECT 5, 'insert', o_orderkey, o_orderpriority,
            CASE WHEN o_orderpriority LIKE '3%'
                 THEN o_totalprice * 2 ELSE o_totalprice END
          FROM s)
        SELECT _commit_version, _change_type,
          o_orderkey, o_orderpriority, o_totalprice
        FROM feed ORDER BY _commit_version, _change_type, o_orderkey""")),

    // ---- Storage-partitioned join under the oracle gate: two gdisk
    // tables identity-partitioned on the same column report
    // KeyGroupedPartitioning from their hive file groups, so the
    // aggregate-then-join plan runs with ZERO hash exchanges when
    // Spark's v2 bucketing is on (SPARK-37375) — the co-located-join
    // layout at 100 TB. The plan proof runs inside the builder under the
    // SPJ confs (restored after); the returned result is value-gated
    // against a direct DuckDB reconstruction. ----
    QueryDef(
      "ddl_v2_disk_spj",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.spj_a")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.spj_b")
        for (t <- Seq("spj_a", "spj_b"))
          s.sql(s"CREATE TABLE gdisk.verify.$t " +
            "(o_orderkey BIGINT, o_orderpriority STRING) " +
            "PARTITIONED BY (o_orderpriority)")
        s.sql("INSERT INTO gdisk.verify.spj_a SELECT o_orderkey, " +
          "o_orderpriority FROM orders WHERE o_orderkey % 2 = 0")
        s.sql("INSERT INTO gdisk.verify.spj_b SELECT o_orderkey, " +
          "o_orderpriority FROM orders WHERE o_orderkey % 2 = 1")
        val q = """SELECT a.o_orderpriority, ca, cb FROM
            (SELECT o_orderpriority, count(*) AS ca
             FROM gdisk.verify.spj_a GROUP BY o_orderpriority) a
          JOIN
            (SELECT o_orderpriority, count(*) AS cb
             FROM gdisk.verify.spj_b GROUP BY o_orderpriority) b
          ON a.o_orderpriority = b.o_orderpriority
          ORDER BY a.o_orderpriority"""
        val confs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.adaptive.enabled" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
        try {
          confs.foreach { case (k, v) => s.conf.set(k, v) }
          val plan = s.sql(q).queryExecution.executedPlan.toString
          require(!plan.contains("Exchange hashpartitioning"),
            s"storage-partitioned join did not elide its shuffles:\n$plan")
          require(plan.contains("spjGroups="),
            s"expected the SPJ scan in the plan:\n$plan")
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
        s.sql(q)
      },
      Some("""SELECT a.o_orderpriority, ca, cb FROM
          (SELECT o_orderpriority, count(*) AS ca FROM orders
           WHERE o_orderkey % 2 = 0 GROUP BY o_orderpriority) a
        JOIN
          (SELECT o_orderpriority, count(*) AS cb FROM orders
           WHERE o_orderkey % 2 = 1 GROUP BY o_orderpriority) b
        ON a.o_orderpriority = b.o_orderpriority
        ORDER BY a.o_orderpriority""")),

    // ---- HASH-BUCKETED storage-partitioned join under the oracle gate:
    // identity partitioning explodes dirs on high-cardinality keys, so
    // bucket(n, col) is the co-located layout for corpus-scale join
    // keys — files land in `__bucket=pmod(hash(col), n)/` dirs, the scan
    // reports bucket(n, col) KeyGroupedPartitioning, and the catalog's
    // FunctionCatalog binds the transform so Spark can PROVE both sides
    // co-partitioned. The equi-join on the bucketed key then runs with
    // zero hash exchanges (the ORDER BY's range exchange is the only
    // shuffle in the plan). ----
    QueryDef(
      "ddl_v2_disk_spj_bucket",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.bk_a")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.bk_b")
        s.sql("""CREATE TABLE gdisk.verify.bk_a
          (o_orderkey BIGINT, o_totalprice DOUBLE)
          PARTITIONED BY (bucket(8, o_orderkey))""")
        s.sql("""CREATE TABLE gdisk.verify.bk_b
          (o_orderkey BIGINT, o_orderpriority STRING)
          PARTITIONED BY (bucket(8, o_orderkey))""")
        s.sql("INSERT INTO gdisk.verify.bk_a " +
          "SELECT o_orderkey, o_totalprice FROM orders")
        s.sql("INSERT INTO gdisk.verify.bk_b " +
          "SELECT o_orderkey, o_orderpriority FROM orders")
        val q = """SELECT a.o_orderkey, a.o_totalprice, b.o_orderpriority
          FROM gdisk.verify.bk_a a JOIN gdisk.verify.bk_b b
            ON a.o_orderkey = b.o_orderkey
          WHERE b.o_orderpriority = '1-URGENT' AND a.o_orderkey % 10 = 0
          ORDER BY a.o_orderkey"""
        val confs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.adaptive.enabled" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
        try {
          confs.foreach { case (k, v) => s.conf.set(k, v) }
          val plan = s.sql(q).queryExecution.executedPlan.toString
          require(!plan.contains("Exchange hashpartitioning"),
            s"bucketed SPJ did not elide its join shuffles:\n$plan")
          require(plan.contains("spjGroups="),
            s"expected the SPJ scan in the plan:\n$plan")
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
        s.sql(q)
      },
      Some("""SELECT a.o_orderkey, a.o_totalprice, b.o_orderpriority
        FROM (SELECT o_orderkey, o_totalprice FROM orders) a
        JOIN (SELECT o_orderkey, o_orderpriority FROM orders) b
          ON a.o_orderkey = b.o_orderkey
        WHERE b.o_orderpriority = '1-URGENT' AND a.o_orderkey % 10 = 0
        ORDER BY a.o_orderkey""")),

    // ---- DYNAMIC partition pruning on gdisk under the oracle gate: the
    // fact table is identity-partitioned on o_orderpriority, the dim's
    // selective filter only yields its matching priorities at RUNTIME —
    // Spark's DPP subquery (reusing the join's broadcast) delivers them
    // to the scan through `SupportsRuntimeV2Filtering`, and the manifest
    // drops every file outside the matching hive dirs before the inner
    // parquet scan plans anything. Spark's own DSv2 file sources don't
    // implement this hook; at 100 TB it is the difference between
    // scanning the fact table and scanning one partition. Proof runs
    // in-builder: the executed plan must carry the dynamicpruning
    // runtime filter AND the global runtime-pruned-file counter must
    // advance across a collect; the returned result is value-gated
    // against a direct DuckDB reconstruction. ----
    QueryDef(
      "ddl_v2_disk_dpp",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.dpp_fact")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.dpp_dim")
        s.sql("""CREATE TABLE gdisk.verify.dpp_fact
          (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING)
          PARTITIONED BY (o_orderpriority)""")
        s.sql("INSERT INTO gdisk.verify.dpp_fact SELECT o_orderkey, " +
          "o_totalprice, o_orderpriority FROM orders")
        s.sql("""CREATE TABLE gdisk.verify.dpp_dim
          (o_orderpriority STRING, keep INT)""")
        s.sql("INSERT INTO gdisk.verify.dpp_dim SELECT o_orderpriority, " +
          "CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END " +
          "FROM orders GROUP BY o_orderpriority")
        val q = """SELECT f.o_orderpriority, count(*) AS cnt,
            CAST(sum(CAST(f.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM gdisk.verify.dpp_fact f
          JOIN gdisk.verify.dpp_dim d ON f.o_orderpriority = d.o_orderpriority
          WHERE d.keep = 1
          GROUP BY f.o_orderpriority ORDER BY f.o_orderpriority"""
        val before = graft.sources.GraftDiskCatalog.runtimePrunedFiles.get()
        val df = s.sql(q)
        val plan = df.queryExecution.executedPlan.toString
        require(plan.toLowerCase(java.util.Locale.ROOT).contains("dynamicpruning"),
          s"expected a dynamic-partition-pruning runtime filter in:\n$plan")
        df.collect()
        require(graft.sources.GraftDiskCatalog.runtimePrunedFiles.get() > before,
          "dynamic partition pruning dropped no files at runtime")
        s.sql(q)
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderpriority LIKE '1%'
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- CBO histogram CONSUMPTION proof: the committed equi-height
    // histograms must change PLANS, not just row estimates. The fact
    // table is the classic skew shape (99% of rows on one hot value,
    // a thin tail over ~8000 values); the probe side is too big to
    // broadcast. Under min/max-uniform selectivity the tail predicate
    // looks like ~50% of the fact (≈24 MB → sort-merge join); the
    // histogram knows it is <1% (≈1.5 MB → broadcast the filtered
    // fact). Both directions are REQUIRED in-builder on every run —
    // with histograms served the join must broadcast, with them
    // withheld (spark.graft.cbo.serveHistograms=false) it must not —
    // so stats that stop flowing into the optimizer fail the entry,
    // not just a spec. Result rows are identical either way; the
    // oracle recomputes them from the generation formulas. ----
    QueryDef(
      "ddl_v2_cbo_hist_join",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.cbo_fact")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.cbo_probe")
        s.sql("CREATE TABLE gdisk.verify.cbo_fact " +
          "(k BIGINT, v BIGINT, pad STRING)")
        s.sql("INSERT INTO gdisk.verify.cbo_fact SELECT id % 1000, " +
          "CASE WHEN id % 100 < 99 THEN 1 ELSE 1 + (id % 8000) END, " +
          "lpad(CAST(id AS STRING), 1600, 'x') FROM range(0, 30000, 1, 4)")
        s.sql("CREATE TABLE gdisk.verify.cbo_probe (k BIGINT, tag STRING)")
        s.sql("INSERT INTO gdisk.verify.cbo_probe SELECT id % 1000, " +
          "concat('t', CAST(id % 7 AS STRING), '_', " +
          "lpad(CAST(id AS STRING), 280, 'y')) " +
          "FROM range(0, 100000, 1, 4)")
        val g = new GraftSession(s)
        g.sql("ANALYZE TABLE gdisk.verify.cbo_fact " +
          "COMPUTE APPROXIMATE STATISTICS")
        g.sql("ANALYZE TABLE gdisk.verify.cbo_probe " +
          "COMPUTE APPROXIMATE STATISTICS")
        val q = """SELECT substring(p.tag, 1, 2) AS tag2,
            count(*) AS cnt, CAST(sum(f.v) AS BIGINT) AS sum_v,
            CAST(sum(octet_length(f.pad)) AS BIGINT) AS sum_pad
          FROM gdisk.verify.cbo_fact f
          JOIN gdisk.verify.cbo_probe p ON f.k = p.k
          WHERE f.v >= 4000
          GROUP BY substring(p.tag, 1, 2) ORDER BY tag2"""
        val cbo0 = s.conf.getOption("spark.sql.cbo.enabled")
        val hist0 = s.conf.getOption("spark.graft.cbo.serveHistograms")
        s.conf.set("spark.sql.cbo.enabled", "true")
        try {
          s.conf.set("spark.graft.cbo.serveHistograms", "false")
          val noHist = s.sql(q).queryExecution.executedPlan.toString
          require(!noHist.contains("BroadcastHashJoin"),
            "without the histogram the uniform estimate (~50% of the " +
              s"fact) must NOT broadcast:\n$noHist")
          s.conf.set("spark.graft.cbo.serveHistograms", "true")
          val df = s.sql(q)
          val withHist = df.queryExecution.executedPlan.toString
          require(withHist.contains("BroadcastHashJoin"),
            "histogram selectivity (<1% of the fact) must broadcast " +
              s"the filtered fact side:\n$withHist")
          df.count() // execute the broadcast-side plan under the window
        } finally {
          cbo0.fold(s.conf.unset("spark.sql.cbo.enabled"))(
            s.conf.set("spark.sql.cbo.enabled", _))
          hist0.fold(s.conf.unset("spark.graft.cbo.serveHistograms"))(
            s.conf.set("spark.graft.cbo.serveHistograms", _))
        }
        s.sql(q)
      },
      Some("""WITH fact AS (
          SELECT id % 1000 AS k,
            CASE WHEN id % 100 < 99 THEN 1 ELSE 1 + (id % 8000) END AS v
          FROM range(0, 30000) t(id)),
        probe AS (
          SELECT id % 1000 AS k, 't' || CAST(id % 7 AS VARCHAR) AS tag2
          FROM range(0, 100000) t(id))
        SELECT p.tag2, count(*) AS cnt, CAST(sum(f.v) AS BIGINT) AS sum_v,
          CAST(count(*) AS BIGINT) * 1600 AS sum_pad
        FROM fact f JOIN probe p ON f.k = p.k
        WHERE f.v >= 4000
        GROUP BY p.tag2 ORDER BY tag2""")),

    // ---- Atomic staged CTAS / RTAS (StagingTableCatalog): CREATE TABLE
    // AS SELECT stages its executor-side parquet writes and only claims a
    // manifest at commit (a failed CTAS leaves NO table); REPLACE TABLE
    // AS SELECT keeps serving the OLD snapshot until the atomic claim
    // swaps in the replacement as version latest+1 — schema change and
    // all — with prior snapshots still time-travelable. In-builder proof
    // pins the version arithmetic; the replaced content value-gates
    // against DuckDB. ----
    QueryDef(
      "ddl_v2_disk_rtas",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.rt")
        s.sql("CREATE TABLE gdisk.verify.rt AS " +
          "SELECT o_orderkey, o_totalprice FROM orders")
        s.sql("REPLACE TABLE gdisk.verify.rt AS " +
          "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt " +
          "FROM orders GROUP BY o_orderpriority")
        // the pre-replace snapshot (version 0, the CTAS) still serves
        val pre = s.sql(
          "SELECT count(*) FROM gdisk.verify.rt VERSION AS OF 0")
          .head().getLong(0)
        val base = s.table("orders").count()
        require(pre == base,
          s"pre-replace snapshot lost: $pre != $base")
        s.sql("SELECT o_orderpriority, cnt FROM gdisk.verify.rt " +
          "ORDER BY o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Manifest-answered aggregates: COUNT(*)/COUNT(col)/MIN/MAX over
    // a gdisk table complete entirely from the manifest's per-file stats —
    // ONE driver-side row, ZERO file I/O, ZERO tasks (the plan is a bare
    // LocalTableScan; at 100 TB, count(*) is a sum over manifest entries,
    // not a scan). NULL accounting rides the footer null counts; proof
    // runs in-builder (no BatchScan/Exchange/HashAggregate in the plan),
    // values gate against DuckDB's direct recomputation. ----
    QueryDef(
      "ddl_v2_disk_agg_manifest",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.mag")
        s.sql("""CREATE TABLE gdisk.verify.mag
          (o_orderkey BIGINT, custkey BIGINT, o_orderpriority STRING)
          PARTITIONED BY (o_orderpriority)""")
        s.sql("INSERT INTO gdisk.verify.mag SELECT o_orderkey, " +
          "IF(o_orderkey % 7 = 0, NULL, o_custkey), o_orderpriority " +
          "FROM orders")
        val global = """SELECT count(*) AS c, count(custkey) AS cc,
            count(o_orderpriority) AS cp,
            min(o_orderkey) AS mn, max(o_orderkey) AS mx
          FROM gdisk.verify.mag"""
        val gPlan = s.sql(global).queryExecution.executedPlan.toString
        require(gPlan.contains("LocalTableScan") &&
          !gPlan.contains("BatchScan") && !gPlan.contains("Exchange") &&
          !gPlan.contains("HashAggregate"),
          s"expected a zero-task manifest-answered aggregate plan:\n$gPlan")
        // GROUP BY the partition column: one row per hive dir, still no
        // scan, no aggregate exec — SHOW PARTITIONS as SQL (the final
        // ORDER BY's range exchange over 5 local rows is the plan's only
        // non-local operator)
        val q = """SELECT o_orderpriority, count(*) AS c,
            count(custkey) AS cc,
            min(o_orderkey) AS mn, max(o_orderkey) AS mx
          FROM gdisk.verify.mag
          GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        val plan = s.sql(q).queryExecution.executedPlan.toString
        require(plan.contains("LocalTableScan") &&
          !plan.contains("BatchScan") && !plan.contains("HashAggregate"),
          s"expected a zero-task grouped manifest aggregate plan:\n$plan")
        s.sql(q)
      },
      Some("""SELECT o_orderpriority, count(*) AS c,
          count(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                     ELSE o_custkey END) AS cc,
          min(o_orderkey) AS mn, max(o_orderkey) AS mx
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Partition-scoped INSERT OVERWRITE on gdisk, both flavors under
    // one oracle gate. STATIC (`PARTITION (c=v)`): Spark delivers the
    // partition pin as a delete predicate (`SupportsOverwriteV2`) — the
    // manifest drops exactly the matching hive dirs' files and appends
    // the replacement in ONE commit. DYNAMIC
    // (`partitionOverwriteMode=dynamic`): only the partitions the new
    // rows land in are replaced (`SupportsDynamicOverwrite`) — the
    // idempotent daily-reload primitive at 100 TB (re-running a day's
    // job replaces that day, never touches the others). The final state
    // after overwriting two of five partitions must hash-match DuckDB's
    // direct reconstruction; untouched partitions prove isolation. ----
    QueryDef(
      "ddl_v2_disk_overwrite",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ow")
        s.sql("""CREATE TABLE gdisk.verify.ow
          (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING)
          PARTITIONED BY (o_orderpriority)""")
        s.sql("INSERT INTO gdisk.verify.ow SELECT o_orderkey, " +
          "o_totalprice, o_orderpriority FROM orders")
        // STATIC: replace 1-URGENT with its negated-key rows (one commit)
        s.sql("INSERT OVERWRITE gdisk.verify.ow " +
          "PARTITION (o_orderpriority = '1-URGENT') " +
          "SELECT -o_orderkey, o_totalprice FROM orders " +
          "WHERE o_orderpriority = '1-URGENT'")
        // DYNAMIC: re-land only 2-HIGH with doubled prices
        val saved = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        try {
          s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          s.sql("INSERT OVERWRITE gdisk.verify.ow " +
            "SELECT o_orderkey, o_totalprice * 2, o_orderpriority " +
            "FROM orders WHERE o_orderpriority = '2-HIGH'")
        } finally saved match {
          case Some(v) =>
            s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None =>
            s.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
        s.sql("""SELECT o_orderpriority, count(*) AS cnt,
            CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM gdisk.verify.ow
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
          CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
              THEN -o_orderkey ELSE o_orderkey END) AS BIGINT) AS key_sum,
          CAST(sum(CAST(CASE WHEN o_orderpriority = '2-HIGH'
              THEN o_totalprice * 2 ELSE o_totalprice END
            AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Incremental MV maintenance over the CDC feed, under the oracle
    // gate: each refresh folds ONLY the source commits since the last
    // applied version into the rollup (one delta groupBy + one
    // file-granular COW MERGE — never a corpus re-aggregate). The
    // exactly-once watermark rides INSIDE the MV commit (`__as_of` on
    // touched rows, recovered as max(__as_of)), so there is no moment
    // where the delta is applied but progress unrecorded. DECIMAL
    // arithmetic keeps incremental add/subtract exact: the oracle's
    // DIRECT aggregate over the final source state must hash-match an MV
    // that was built through inserts, a COW UPDATE's pre-image
    // delete/post-image insert pairs, row deletes, a CDC-silent
    // OPTIMIZE, and two deliberately replayed no-op refreshes. ----
    QueryDef(
      "ddl_v2_disk_mv_incremental",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        import graft.ops.CdcMvOps
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ord_mv_src")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ord_mv")
        s.sql("""CREATE TABLE gdisk.verify.ord_mv_src (
          o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE)""")
        s.sql(CdcMvOps.createRollupDdl(
          "gdisk.verify.ord_mv", "o_orderpriority STRING"))
        def refresh(): Long = CdcMvOps.refreshRollup(s,
          "gdisk.verify.ord_mv_src", "gdisk.verify.ord_mv",
          Seq("o_orderpriority"), "o_totalprice")
        def ins(pred: String): Unit =
          s.sql("INSERT INTO gdisk.verify.ord_mv_src " +
            "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders " +
            s"WHERE $pred")
        ins("o_orderpriority < '3'") // v1
        ins("o_orderpriority >= '3' AND o_orderpriority < '4'") // v2
        refresh() // applies v1..v2
        ins("o_orderpriority >= '4'") // v3
        s.sql("""UPDATE gdisk.verify.ord_mv_src
          SET o_totalprice = o_totalprice * 2
          WHERE o_orderkey % 5 = 0""") // v4: COW delete+insert pairs
        s.sql("DELETE FROM gdisk.verify.ord_mv_src WHERE o_orderkey % 7 = 0") // v5
        new GraftSession(s).sql("OPTIMIZE gdisk.verify.ord_mv_src") // v6: CDC-silent
        refresh() // applies v3..v6
        val w1 = refresh() // no-op: watermark already at the head
        val w2 = refresh()
        require(w1 == w2, s"MV watermark moved on a no-op refresh: $w1 -> $w2")
        CdcMvOps.serve(s, "gdisk.verify.ord_mv", Seq("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
          SELECT o_orderkey, o_orderpriority,
            CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                 ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 7 <> 0)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Transparent MV auto-rewrite ([[graft.plans.MvRewriteRule]]):
    // a plain user aggregate in the MV's shape is served from the rollup
    // — the optimized plan is REQUIRED to scan the MV and not the source
    // (the 100 TB read path: a rollup orders of magnitude smaller than
    // the corpus), while the DuckDB oracle re-aggregates the source
    // directly, proving the rewrite is invisible in the results. The run
    // exercises the freshness gate (refresh after a tombstoning DELETE)
    // and the tombstone filter (the deleted group must not resurface
    // through the MV serving path). ----
    QueryDef(
      "ddl_v2_disk_mv_rewrite",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.mvr_src")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.mvr_mv")
        s.sql("""CREATE TABLE gdisk.verify.mvr_src (
          o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE)""")
        s.sql("INSERT INTO gdisk.verify.mvr_src " +
          "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders")
        val g = new GraftSession(s)
        g.sql("CREATE MATERIALIZED VIEW gdisk.verify.mvr_mv AS " +
          "SELECT o_orderpriority, count(*) AS cnt, " +
          "sum(o_totalprice) AS total FROM gdisk.verify.mvr_src " +
          "GROUP BY o_orderpriority")
        g.sql("REFRESH MATERIALIZED VIEW gdisk.verify.mvr_mv")
        // tombstone one whole group, then re-freshen
        s.sql("DELETE FROM gdisk.verify.mvr_src " +
          "WHERE o_orderpriority = '5-LOW'")
        g.sql("REFRESH MATERIALIZED VIEW gdisk.verify.mvr_mv")
        val df = s.sql("""SELECT o_orderpriority, count(*) AS cnt,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM gdisk.verify.mvr_src
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
        val plan = df.queryExecution.optimizedPlan.toString
        require(plan.contains("mvr_mv") && !plan.contains("mvr_src"),
          s"MV auto-rewrite must serve this aggregate from the rollup:\n$plan")
        df
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderpriority <> '5-LOW'
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Metadata-only RENAME COLUMN via column mapping: the rename is
    // REQUIRED to leave every data file untouched (at 100 TB a rename is
    // one manifest commit, not a table rewrite), old files keep the
    // column's immutable physical name, new writes and a COW UPDATE land
    // under the new logical name, and the DuckDB oracle recomputes the
    // final state directly. ----
    QueryDef(
      "ddl_v2_disk_rename_mapping",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.rnm")
        s.sql("""CREATE TABLE gdisk.verify.rnm (
          o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE)""")
        s.sql("INSERT INTO gdisk.verify.rnm SELECT o_orderkey, " +
          "o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 2 = 0")
        s.sql("INSERT INTO gdisk.verify.rnm SELECT o_orderkey, " +
          "o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 2 = 1")
        def tbl = graft.sources.GraftDiskCatalog.instance("gdisk").get
          .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
            Array("verify"), "rnm"))
          .asInstanceOf[graft.sources.GraftDiskTable]
        val before = tbl.liveFiles
        s.sql("ALTER TABLE gdisk.verify.rnm RENAME COLUMN o_totalprice TO price")
        require(tbl.liveFiles == before,
          "RENAME COLUMN must be metadata-only: no data file may change")
        // post-rename ingest and a COW UPDATE, both under the new name
        s.sql("INSERT INTO gdisk.verify.rnm SELECT -o_orderkey, " +
          "o_orderpriority, o_totalprice * 2 FROM orders " +
          "WHERE o_orderpriority = '1-URGENT'")
        s.sql("UPDATE gdisk.verify.rnm SET price = price + 1 " +
          "WHERE o_orderkey % 10 = 0")
        s.sql("""SELECT o_orderpriority, count(*) AS cnt,
            CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM gdisk.verify.rnm
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
          CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
          SELECT o_orderpriority,
            o_totalprice + CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END
              AS price
          FROM orders
          UNION ALL
          SELECT o_orderpriority,
            (o_totalprice * 2) +
              CASE WHEN (-o_orderkey) % 10 = 0 THEN 1 ELSE 0 END AS price
          FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- MERGE WITH SCHEMA EVOLUTION under the oracle gate: the source
    // carries a column the target lacks; Spark lands it through the
    // catalog's metadata-only ADD COLUMN (old rows read NULL), the MERGE
    // itself is the usual file-granular COW, and DuckDB recomputes the
    // evolved final state directly. ----
    QueryDef(
      "ddl_v2_disk_merge_evolution",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.mevo")
        s.sql("""CREATE TABLE gdisk.verify.mevo (
          o_orderkey BIGINT, o_totalprice DOUBLE)""")
        s.sql("INSERT INTO gdisk.verify.mevo SELECT o_orderkey, " +
          "o_totalprice FROM orders WHERE o_orderkey % 3 <> 0")
        s.sql("""MERGE WITH SCHEMA EVOLUTION INTO gdisk.verify.mevo t
          USING (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
                   o_orderpriority
                 FROM orders WHERE o_orderkey % 2 = 0) s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
        s.sql("""SELECT o_orderpriority, count(*) AS cnt,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM gdisk.verify.mevo
          GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST""")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
          SELECT CASE WHEN o_orderkey % 2 = 0 THEN o_orderpriority END
              AS o_orderpriority,
            CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
                 ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 3 <> 0 OR o_orderkey % 2 = 0)
        GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST""")),

    // ---- Partition-scoped OPTIMIZE under the oracle gate: the WHERE
    // form is REQUIRED to leave out-of-scope partitions' files
    // byte-for-byte alone (in-query file-set proof) while the scoped
    // partition compacts; DuckDB recomputes the data directly, proving
    // the maintenance pass is invisible in results. ----
    QueryDef(
      "ddl_v2_disk_optimize_where",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("orders"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ows")
        s.sql("""CREATE TABLE gdisk.verify.ows (
          o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING)
          PARTITIONED BY (o_orderpriority)""")
        // several small files per partition (one insert per key-slice)
        (0 until 3).foreach(i =>
          s.sql("INSERT INTO gdisk.verify.ows SELECT o_orderkey, " +
            "o_totalprice, o_orderpriority FROM orders " +
            s"WHERE o_orderkey % 3 = $i"))
        def tbl = graft.sources.GraftDiskCatalog.instance("gdisk").get
          .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
            Array("verify"), "ows"))
          .asInstanceOf[graft.sources.GraftDiskTable]
        val outBefore = tbl.liveFiles
          .filterNot(_.startsWith("o_orderpriority=1-URGENT/")).toSet
        new GraftSession(s).sql("OPTIMIZE gdisk.verify.ows " +
          "WHERE o_orderpriority = '1-URGENT' TARGET 134217728 BYTES")
        val after = tbl.liveFiles
        require(after.filterNot(
          _.startsWith("o_orderpriority=1-URGENT/")).toSet == outBefore,
          "OPTIMIZE WHERE must leave out-of-scope partitions untouched")
        require(after.count(_.startsWith("o_orderpriority=1-URGENT/")) == 1,
          "the scoped partition must compact to one file")
        s.sql("""SELECT o_orderpriority, count(*) AS cnt,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM gdisk.verify.ows
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- TEMPORAL PARTITION TRANSFORMS under the oracle gate: Iceberg's
    // days(ts) layout — writers derive `ts_day=YYYY-MM-DD/` dirs from the
    // timestamp (every column stays IN the files; the transform is
    // lossy), RANGE predicates on the raw timestamp prune whole day dirs
    // driver-side (monotonic transform, in-plan statsFiles proof), and a
    // retention DELETE of the oldest week is REQUIRED to execute as one
    // metadata-only manifest commit (day dirs bound every row's ts, so
    // all-match is provable with zero file I/O). DuckDB recomputes the
    // surviving window from the raw events directly. ----
    QueryDef(
      "ddl_v2_disk_time_partitions",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("events"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.ev_days")
        s.sql("""CREATE TABLE gdisk.verify.ev_days (
          event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE)
          PARTITIONED BY (days(ts))""")
        s.sql("""INSERT INTO gdisk.verify.ev_days
          SELECT event_id, ts, event_type, value FROM events""")
        // retention: drop everything before Jan 8 — whole day dirs are
        // provably all-match from their transform values alone, so the
        // plan must be the bare metadata DeleteFromTable (no COW rewrite)
        val del = s.sql("""DELETE FROM gdisk.verify.ev_days
          WHERE ts < timestamp'2024-01-08 00:00:00'""")
        val dplan = del.queryExecution.executedPlan.toString
        require(dplan.contains("DeleteFromTable") &&
          !dplan.contains("ReplaceData"),
          s"retention delete must be metadata-only, got:\n$dplan")
        val df = s.sql("""SELECT event_id, ts, event_type, value
          FROM gdisk.verify.ev_days
          WHERE ts < timestamp'2024-01-22 00:00:00'
          ORDER BY event_id""")
        // plan proof: day dirs outside [Jan 8, Jan 22) never plan
        val m = """statsFiles=(\d+)/(\d+)""".r
          .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        require(m.exists(g => g.group(1).toLong < g.group(2).toLong),
          s"no day-dir pruning in plan: ${m.map(_.matched)}")
        df
      },
      Some("""SELECT event_id, ts, event_type, value FROM events
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts < TIMESTAMP '2024-01-22 00:00:00'
        ORDER BY event_id""")),

    // ---- STREAMING CDC under the oracle gate: `readStream` over the
    // `.changes` metadata table (Iceberg-style resolution of the CDC
    // feed) tails the commit log — two ingests stream through as insert
    // rows with their commit versions, and a metadata-only retention
    // DELETE of the oldest days streams through as pure delete rows —
    // the continuous-subscription surface downstream incremental
    // consumers (MV maintenance, replication) build on. The stream runs
    // to completion (AvailableNow) into a memory sink; DuckDB recomputes
    // every expected change row from the raw events windows. ----
    QueryDef(
      "ddl_v2_disk_cdf_stream",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("events"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.cdf")
        s.sql("""CREATE TABLE gdisk.verify.cdf (
          event_id BIGINT, ts TIMESTAMP, value DOUBLE)
          PARTITIONED BY (days(ts))""")
        s.sql("""INSERT INTO gdisk.verify.cdf SELECT event_id, ts, value
          FROM events WHERE ts < TIMESTAMP '2024-01-10 00:00:00'""")
        s.sql("""INSERT INTO gdisk.verify.cdf SELECT event_id, ts, value
          FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
            AND ts < TIMESTAMP '2024-01-20 00:00:00'""")
        s.sql("""DELETE FROM gdisk.verify.cdf
          WHERE ts < TIMESTAMP '2024-01-05 00:00:00'""")
        s.catalog.dropTempView("gdisk_cdf_sink")
        val ckpt = java.nio.file.Files
          .createTempDirectory("gdisk_cdf_stream").toString
        val q = s.readStream.table("gdisk.verify.cdf.changes")
          .writeStream.queryName("gdisk_cdf_sink")
          .option("checkpointLocation", ckpt)
          .format("memory")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination() // AvailableNow: bounded — drains the log, stops
        s.sql("""SELECT _change_type, _commit_version, event_id, ts, value
          FROM gdisk_cdf_sink
          ORDER BY _commit_version, _change_type, event_id""")
      },
      Some("""SELECT * FROM (
          SELECT 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version,
            event_id, ts, value FROM events
            WHERE ts < TIMESTAMP '2024-01-10 00:00:00'
          UNION ALL
          SELECT 'insert', CAST(2 AS BIGINT), event_id, ts, value FROM events
            WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts < TIMESTAMP '2024-01-20 00:00:00'
          UNION ALL
          SELECT 'delete', CAST(3 AS BIGINT), event_id, ts, value FROM events
            WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
        ) ORDER BY _commit_version, _change_type, event_id""")),

    // ---- PARTITION SPEC EVOLUTION under the oracle gate: an
    // unpartitioned ingest evolves to days(ts) in ONE metadata commit
    // (in-query proof: zero files touched), the second ingest lands in
    // the new day-dir layout, a range query prunes the new generation
    // while conservatively keeping the old (statsFiles proof), and
    // OPTIMIZE migrates the old files into day dirs (in-query proof:
    // every live file under ts_day=). DuckDB recomputes the final state
    // from the raw events — three layout generations, same answers. ----
    QueryDef(
      "ddl_v2_disk_spec_evolution",
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.gdisk").isEmpty) {
          s.conf.set("spark.sql.catalog.gdisk",
            classOf[graft.sources.GraftDiskCatalog].getName)
          s.conf.set("spark.sql.catalog.gdisk.warehouse",
            java.nio.file.Files.createTempDirectory("gdisk_verify").toString)
        }
        Tables.register(s, dir, Seq("events"))
        s.sql("CREATE NAMESPACE IF NOT EXISTS gdisk.verify")
        s.sql("DROP TABLE IF EXISTS gdisk.verify.sev")
        s.sql("""CREATE TABLE gdisk.verify.sev (
          event_id BIGINT, ts TIMESTAMP, value DOUBLE)""")
        s.sql("""INSERT INTO gdisk.verify.sev SELECT event_id, ts, value
          FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'""")
        def tbl = graft.sources.GraftDiskCatalog.instance("gdisk").get
          .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
            Array("verify"), "sev"))
          .asInstanceOf[graft.sources.GraftDiskTable]
        val beforeEvo = tbl.liveFiles.toSet
        val g = new GraftSession(s)
        g.sql("ALTER TABLE gdisk.verify.sev SET PARTITION SPEC (days(ts))")
        require(tbl.liveFiles.toSet == beforeEvo,
          "spec evolution must be metadata-only (zero files touched)")
        s.sql("""INSERT INTO gdisk.verify.sev SELECT event_id, ts, value
          FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'""")
        require(tbl.liveFiles.exists(_.startsWith("ts_day=")),
          "post-evolution writes must land in the transform layout")
        // mixed generations prune: the filter excludes some NEW day dirs
        val probe = s.sql("""SELECT count(*) FROM gdisk.verify.sev
          WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'""")
        val m = """statsFiles=(\d+)/(\d+)""".r
          .findFirstMatchIn(probe.queryExecution.executedPlan.toString)
        require(m.exists(x => x.group(1).toLong < x.group(2).toLong),
          s"no pruning over mixed generations: ${m.map(_.matched)}")
        // OPTIMIZE migrates the pre-evolution generation into day dirs
        g.sql("OPTIMIZE gdisk.verify.sev")
        require(tbl.liveFiles.forall(_.startsWith("ts_day=")),
          s"OPTIMIZE must migrate all files: ${tbl.liveFiles.take(3)}")
        s.sql("""SELECT event_id, ts, value FROM gdisk.verify.sev
          WHERE ts >= TIMESTAMP '2024-01-12 00:00:00'
            AND ts < TIMESTAMP '2024-01-18 00:00:00'
          ORDER BY event_id""")
      },
      Some("""SELECT event_id, ts, value FROM events
        WHERE ts >= TIMESTAMP '2024-01-12 00:00:00'
          AND ts < TIMESTAMP '2024-01-18 00:00:00'
        ORDER BY event_id"""))
  )
}
