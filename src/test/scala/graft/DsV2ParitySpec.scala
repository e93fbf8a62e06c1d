package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftMemCatalog

/** Semantic parity between the DSv2 `gmem` catalog and the front-door
  * view-swap stack: column DEFAULTs, NOT NULL/CHECK/UNIQUE/PK enforcement,
  * row-level MERGE/UPDATE/DELETE, and the driver-heap caps. DEFAULT filling
  * and CHECK enforcement are Spark's own (ResolveDefaultColumns /
  * CheckInvariant in the write plan); key uniqueness and the caps live in
  * the BatchWrite commit path. */
class DsV2ParitySpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gmem", classOf[GraftMemCatalog].getName)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gmem.par")
    s
  }

  test("column DEFAULTs fill omitted INSERT columns") {
    spark.sql("DROP TABLE IF EXISTS gmem.par.d")
    spark.sql("CREATE TABLE gmem.par.d (id BIGINT, v BIGINT DEFAULT 7, s STRING DEFAULT 'x')")
    spark.sql("INSERT INTO gmem.par.d (id) VALUES (1)")
    spark.sql("INSERT INTO gmem.par.d VALUES (2, 8, 'y')")
    spark.sql("INSERT INTO gmem.par.d (id, v) VALUES (3, DEFAULT)")
    val rows = spark.sql("SELECT id, v, s FROM gmem.par.d ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 7L, "x"), (2L, 8L, "y"), (3L, 7L, "x")))
  }

  test("CHECK constraints are enforced in the write plan") {
    spark.sql("DROP TABLE IF EXISTS gmem.par.ck")
    spark.sql("CREATE TABLE gmem.par.ck (id BIGINT, bal BIGINT, CONSTRAINT pos CHECK (bal >= 0))")
    spark.sql("INSERT INTO gmem.par.ck VALUES (1, 100)")
    val e = intercept[Exception](
      spark.sql("INSERT INTO gmem.par.ck VALUES (2, -5)"))
    assert(e.getMessage.toLowerCase.contains("pos") ||
      e.getMessage.toLowerCase.contains("check"), e.getMessage)
    // failed write left the previous state intact
    assert(spark.table("gmem.par.ck").count() == 1)
  }

  test("PRIMARY KEY rejects NULL keys identically across all three tiers") {
    // front door (view-swap): PK maps to NOT NULL + UNIQUE at create
    val g = new GraftSession(spark)
    g.sql("DROP TABLE IF EXISTS fd_pkn")
    g.sql("CREATE TABLE fd_pkn (id BIGINT PRIMARY KEY, v STRING)")
    g.sql("INSERT INTO fd_pkn VALUES (1, 'a')")
    intercept[Exception](
      g.sql("INSERT INTO fd_pkn VALUES (CAST(NULL AS BIGINT), 'n')"))
    assert(g.sql("SELECT count(*) AS c FROM fd_pkn").head().getLong(0) == 1L)
    // gmem: rejected at BatchWrite.commit
    spark.sql("DROP TABLE IF EXISTS gmem.par.pkn")
    spark.sql("CREATE TABLE gmem.par.pkn (id BIGINT, v STRING, " +
      "CONSTRAINT pkn PRIMARY KEY (id))")
    spark.sql("INSERT INTO gmem.par.pkn VALUES (1, 'a')")
    intercept[Exception](
      spark.sql("INSERT INTO gmem.par.pkn VALUES (CAST(NULL AS BIGINT), 'n')"))
    assert(spark.table("gmem.par.pkn").count() == 1L)
    // gdisk: rejected by the distributed key probe before the manifest claim
    spark.conf.set("spark.sql.catalog.gdpar",
      classOf[graft.sources.GraftDiskCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdpar.warehouse",
      java.nio.file.Files.createTempDirectory("gdpar_wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdpar.par")
    spark.sql("CREATE TABLE gdpar.par.pkn (id BIGINT, v STRING, " +
      "CONSTRAINT pkn PRIMARY KEY (id))")
    spark.sql("INSERT INTO gdpar.par.pkn VALUES (1, 'a')")
    intercept[Exception](
      spark.sql("INSERT INTO gdpar.par.pkn VALUES (CAST(NULL AS BIGINT), 'n')"))
    assert(spark.table("gdpar.par.pkn").count() == 1L)
    // NULL-free duplicates still reject on every tier (PK = NOT NULL + UNIQUE)
    intercept[Exception](g.sql("INSERT INTO fd_pkn VALUES (1, 'dup')"))
    intercept[Exception](
      spark.sql("INSERT INTO gmem.par.pkn VALUES (1, 'dup')"))
    intercept[Exception](
      spark.sql("INSERT INTO gdpar.par.pkn VALUES (1, 'dup')"))
  }

  test("NOT NULL columns reject null writes") {
    spark.sql("DROP TABLE IF EXISTS gmem.par.nn")
    spark.sql("CREATE TABLE gmem.par.nn (id BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO gmem.par.nn VALUES (1, 'a')")
    intercept[Exception](
      spark.sql("INSERT INTO gmem.par.nn VALUES (CAST(NULL AS BIGINT), 'b')"))
    assert(spark.table("gmem.par.nn").count() == 1)
  }

  test("PRIMARY KEY / UNIQUE keys are enforced at commit") {
    spark.sql("DROP TABLE IF EXISTS gmem.par.pk")
    spark.sql("CREATE TABLE gmem.par.pk (id BIGINT, email STRING, " +
      "CONSTRAINT pk PRIMARY KEY (id), CONSTRAINT uq UNIQUE (email))")
    spark.sql("INSERT INTO gmem.par.pk VALUES (1, 'a@x.io'), (2, 'b@x.io')")
    // duplicate key against existing rows
    intercept[Exception](spark.sql("INSERT INTO gmem.par.pk VALUES (1, 'c@x.io')"))
    // duplicate within one batch
    intercept[Exception](
      spark.sql("INSERT INTO gmem.par.pk VALUES (3, 'd@x.io'), (3, 'e@x.io')"))
    // UNIQUE collision
    intercept[Exception](spark.sql("INSERT INTO gmem.par.pk VALUES (4, 'a@x.io')"))
    // NULL keys never collide (SQL UNIQUE semantics)
    spark.sql("INSERT INTO gmem.par.pk VALUES (5, NULL), (6, NULL)")
    assert(spark.table("gmem.par.pk").count() == 4)
  }

  test("MERGE INTO upserts through the row-level operation") {
    spark.sql("DROP TABLE IF EXISTS gmem.par.mt")
    spark.sql("CREATE TABLE gmem.par.mt (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gmem.par.mt VALUES (1, 'a'), (2, 'b')")
    spark.sql("""MERGE INTO gmem.par.mt t
      USING (SELECT * FROM VALUES (2, 'B'), (3, 'C') AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val rows = spark.sql("SELECT k, v FROM gmem.par.mt ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "C")))
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns on gmem too") {
    spark.sql("DROP TABLE IF EXISTS gmem.par.mse")
    spark.sql("CREATE TABLE gmem.par.mse (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gmem.par.mse VALUES (1, 'a'), (2, 'b')")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gmem.par.mse t
      USING (SELECT CAST(k AS BIGINT) AS k, v, score FROM VALUES
        (2, 'B', 20L), (3, 'C', 30L) AS s(k, v, score)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql("SELECT k, v, score FROM gmem.par.mse ORDER BY k")
      .collect().map(r =>
        (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "B", Some(20L)),
      (3L, "C", Some(30L))))
  }

  test("UPDATE and DELETE execute through the row-level operation") {
    spark.sql("DROP TABLE IF EXISTS gmem.par.ud")
    spark.sql("CREATE TABLE gmem.par.ud (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gmem.par.ud VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql("UPDATE gmem.par.ud SET v = v + 1 WHERE k >= 2")
    assert(spark.sql("SELECT sum(v) FROM gmem.par.ud").head().getLong(0) == 62L)
    spark.sql("DELETE FROM gmem.par.ud WHERE k = 1")
    assert(spark.sql("SELECT count(*) FROM gmem.par.ud").head().getLong(0) == 2L)
  }

  test("MERGE respects CHECK constraints on the rewritten rows") {
    spark.sql("DROP TABLE IF EXISTS gmem.par.mc")
    spark.sql("CREATE TABLE gmem.par.mc (k BIGINT, bal BIGINT, CONSTRAINT p CHECK (bal >= 0))")
    spark.sql("INSERT INTO gmem.par.mc VALUES (1, 5)")
    intercept[Exception](spark.sql("""MERGE INTO gmem.par.mc t
      USING (SELECT * FROM VALUES (1, -9) AS s(k, bal)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET bal = s.bal"""))
    assert(spark.sql("SELECT bal FROM gmem.par.mc").head().getLong(0) == 5L)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT") {
    spark.sql("DROP TABLE IF EXISTS gmem.par.ac")
    spark.sql("CREATE TABLE gmem.par.ac (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gmem.par.ac VALUES (1, 1)")
    spark.sql("ALTER TABLE gmem.par.ac ADD CONSTRAINT vpos CHECK (v > 0)")
    intercept[Exception](spark.sql("INSERT INTO gmem.par.ac VALUES (2, -1)"))
    spark.sql("ALTER TABLE gmem.par.ac DROP CONSTRAINT vpos")
    spark.sql("INSERT INTO gmem.par.ac VALUES (2, -1)") // now allowed
    assert(spark.table("gmem.par.ac").count() == 2)
  }

  test("writeStream.toTable appends micro-batches into a gmem table") {
    spark.sql("DROP TABLE IF EXISTS gmem.par.sfeed")
    spark.sql("DROP TABLE IF EXISTS gmem.par.ssink")
    spark.sql("CREATE TABLE gmem.par.sfeed (id BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE gmem.par.ssink (id BIGINT, dbl BIGINT)")
    spark.sql("INSERT INTO gmem.par.sfeed VALUES (1, 10), (2, 20)")
    val ckpt = java.nio.file.Files.createTempDirectory("gmem_ssink").toString
    // gmem reads AND writes streaming: tail one table's append log,
    // transform, land in another through the same guarded commit
    val q = spark.readStream.table("gmem.par.sfeed")
      .selectExpr("id", "v * 2 AS dbl")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gmem.par.ssink")
    try {
      q.processAllAvailable()
      spark.sql("INSERT INTO gmem.par.sfeed VALUES (3, 30)") // mid-stream
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("gmem.par.ssink").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 20L), (2L, 40L), (3L, 60L)))
  }

  test("EXPORT/IMPORT DATABASE round-trips gmem tables with their metadata") {
    val g = new GraftSession(spark)
    spark.sql("DROP TABLE IF EXISTS gmem.par.expo")
    g.sql("CREATE TABLE gmem.par.expo (id BIGINT NOT NULL, grade STRING DEFAULT 'std', " +
      "bal BIGINT, CONSTRAINT pk PRIMARY KEY (id), CONSTRAINT pos CHECK (bal >= 0))")
    g.sql("INSERT INTO gmem.par.expo VALUES (1, 'a', 5), (2, 'b', 7)")
    val dir = java.nio.file.Files.createTempDirectory("gmem_export").toString
    g.sql(s"EXPORT DATABASE '$dir'")
    g.sql("DROP TABLE gmem.par.expo")
    g.sql(s"IMPORT DATABASE '$dir'")
    // data back
    val rows = spark.sql("SELECT id, grade, bal FROM gmem.par.expo ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a", 5L), (2L, "b", 7L)))
    // defaults and constraints survived the round trip
    g.sql("INSERT INTO gmem.par.expo (id, bal) VALUES (3, 1)")
    assert(spark.sql("SELECT grade FROM gmem.par.expo WHERE id = 3")
      .head().getString(0) == "std")
    intercept[Exception](g.sql("INSERT INTO gmem.par.expo VALUES (4, 'x', -1)")) // CHECK
    intercept[Exception](g.sql("INSERT INTO gmem.par.expo VALUES (1, 'dup', 1)")) // PK
    assert(spark.table("gmem.par.expo").count() == 3)
    g.sql("DROP TABLE gmem.par.expo")
  }

  test("front-door transactions span gmem tables") {
    val g = new GraftSession(spark)
    spark.sql("DROP TABLE IF EXISTS gmem.par.txb")
    g.sql("CREATE TABLE gmem.par.txb (id BIGINT, v BIGINT)")
    g.sql("INSERT INTO gmem.par.txb VALUES (1, 10)")
    g.sql("BEGIN")
    g.sql("INSERT INTO gmem.par.txb VALUES (2, 20)")
    g.sql("UPDATE gmem.par.txb SET v = 99 WHERE id = 1")
    g.sql("CREATE TABLE gmem.par.txnew (x BIGINT)") // created inside tx
    assert(spark.table("gmem.par.txb").count() == 2)
    g.sql("ROLLBACK")
    // pre-existing table restored to its BEGIN state...
    val rows = spark.sql("SELECT id, v FROM gmem.par.txb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 10L)), rows.toString)
    // ...and the inside-tx table is gone
    intercept[Exception](spark.table("gmem.par.txnew").count())
    // COMMIT keeps V2 writes
    g.sql("BEGIN")
    g.sql("INSERT INTO gmem.par.txb VALUES (3, 30)")
    g.sql("COMMIT")
    assert(spark.table("gmem.par.txb").count() == 2)
    // destructive verbs on gmem refuse inside a tx (driver rows would be
    // unrecoverable on rollback), same guard as gdisk
    g.sql("BEGIN")
    val e = intercept[Exception](g.sql("DROP TABLE gmem.par.txb"))
    assert(e.getMessage.contains("transaction"), e.getMessage)
    g.sql("ROLLBACK")
    g.sql("DROP TABLE gmem.par.txb")
  }

  test("row cap: over-cap write fails cleanly, previous version intact") {
    spark.conf.set("spark.sql.catalog.gcap", classOf[GraftMemCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcap.maxRowsPerTable", "10")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcap.ns")
    spark.sql("DROP TABLE IF EXISTS gcap.ns.t")
    spark.sql("CREATE TABLE gcap.ns.t (id BIGINT)")
    spark.sql("INSERT INTO gcap.ns.t SELECT id FROM range(8)") // under cap
    val e = intercept[Exception](
      spark.sql("INSERT INTO gcap.ns.t SELECT id FROM range(5)")) // 13 > 10
    assert(e.getMessage.contains("maxRowsPerTable") &&
      e.getMessage.contains("gcap"), e.getMessage)
    // previous state intact, table still writable under the cap
    assert(spark.table("gcap.ns.t").count() == 8)
    spark.sql("INSERT INTO gcap.ns.t VALUES (99)")
    assert(spark.table("gcap.ns.t").count() == 9)
    // CTAS over the cap fails cleanly too
    intercept[Exception](
      spark.sql("CREATE TABLE gcap.ns.big AS SELECT id FROM range(100)"))
  }

  test("byte cap triggers on oversized rows") {
    spark.conf.set("spark.sql.catalog.gbyte", classOf[GraftMemCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbyte.maxBytesPerTable", "4096")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbyte.ns")
    spark.sql("CREATE TABLE gbyte.ns.t (s STRING)")
    val e = intercept[Exception](
      spark.sql("INSERT INTO gbyte.ns.t SELECT repeat('x', 1000) FROM range(10)"))
    assert(e.getMessage.contains("maxBytesPerTable"), e.getMessage)
    assert(spark.table("gbyte.ns.t").count() == 0)
  }
}
