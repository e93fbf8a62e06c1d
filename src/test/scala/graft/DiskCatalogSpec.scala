package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftDiskCatalog, GraftDiskTable}

/** The parquet-backed `gdisk` DSv2 tier: same semantic surface as `gmem`
  * (DEFAULTs, distributed CHECK, PK/UNIQUE on ingest, copy-on-write
  * MERGE/UPDATE/DELETE, VERSION AS OF, streaming source/sink) with
  * corpus-scale mechanics — executor-side parquet writers, Spark's own
  * vectorized parquet scan, and a JSON manifest commit log. Includes the
  * no-driver-rows and scan-parallelism proofs the 100 TB story rests on. */
class DiskCatalogSpec extends AnyFunSuite {
  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("gdisk_wh").toString

  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gdspec", classOf[GraftDiskCatalog].getName)
    s.conf.set("spark.sql.catalog.gdspec.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gdspec.lake")
    s
  }

  test("create / insert / select round-trips through parquet files") {
    spark.sql("CREATE TABLE gdspec.lake.t0 (id BIGINT, name STRING)")
    spark.sql("INSERT INTO gdspec.lake.t0 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gdspec.lake.t0 VALUES (3, 'c')")
    val rows = spark.sql("SELECT id, name FROM gdspec.lake.t0 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // rows live in parquet files under the table dir, not on the driver
    val dataDir = new java.io.File(s"$warehouse/lake/t0/data")
    assert(dataDir.listFiles().count(_.getName.endsWith(".parquet")) >= 2)
  }

  test("column DEFAULTs fill omitted INSERT columns") {
    spark.sql("CREATE TABLE gdspec.lake.d (id BIGINT, v BIGINT DEFAULT 7, " +
      "s STRING DEFAULT 'x')")
    spark.sql("INSERT INTO gdspec.lake.d (id) VALUES (1)")
    spark.sql("INSERT INTO gdspec.lake.d VALUES (2, 8, 'y')")
    spark.sql("INSERT INTO gdspec.lake.d (id, v) VALUES (3, DEFAULT)")
    val rows = spark.sql("SELECT id, v, s FROM gdspec.lake.d ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 7L, "x"), (2L, 8L, "y"), (3L, 7L, "x")))
  }

  test("defaults survive a catalog reload (manifest round trip)") {
    spark.sql("CREATE TABLE gdspec.lake.dr (id BIGINT, grade STRING DEFAULT 'std')")
    spark.sql("INSERT INTO gdspec.lake.dr (id) VALUES (1)")
    // force a FRESH load path (new table instance from the manifest)
    spark.catalog.clearCache()
    spark.sql("INSERT INTO gdspec.lake.dr (id) VALUES (2)")
    val rows = spark.sql("SELECT id, grade FROM gdspec.lake.dr ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "std"), (2L, "std")))
  }

  test("CHECK constraints are enforced distributed in the write plan") {
    spark.sql("CREATE TABLE gdspec.lake.ck (id BIGINT, bal BIGINT, " +
      "CONSTRAINT pos CHECK (bal >= 0))")
    spark.sql("INSERT INTO gdspec.lake.ck VALUES (1, 100)")
    val e = intercept[Exception](
      spark.sql("INSERT INTO gdspec.lake.ck VALUES (2, -5)"))
    assert(e.getMessage.toLowerCase.contains("pos") ||
      e.getMessage.toLowerCase.contains("check"), e.getMessage)
    assert(spark.table("gdspec.lake.ck").count() == 1)
  }

  test("PRIMARY KEY / UNIQUE run as distributed jobs at commit") {
    spark.sql("CREATE TABLE gdspec.lake.pk (id BIGINT, email STRING, " +
      "CONSTRAINT pk PRIMARY KEY (id), CONSTRAINT uq UNIQUE (email))")
    spark.sql("INSERT INTO gdspec.lake.pk VALUES (1, 'a@x.io'), (2, 'b@x.io')")
    // duplicate vs existing files
    intercept[Exception](spark.sql("INSERT INTO gdspec.lake.pk VALUES (1, 'c@x.io')"))
    // duplicate within the batch
    intercept[Exception](
      spark.sql("INSERT INTO gdspec.lake.pk VALUES (3, 'd@x.io'), (3, 'e@x.io')"))
    // UNIQUE collision
    intercept[Exception](spark.sql("INSERT INTO gdspec.lake.pk VALUES (4, 'a@x.io')"))
    // NULL UNIQUE keys never collide
    spark.sql("INSERT INTO gdspec.lake.pk VALUES (5, NULL), (6, NULL)")
    assert(spark.table("gdspec.lake.pk").count() == 4)
    // failed commits left no orphan rows
    val ids = spark.sql("SELECT id FROM gdspec.lake.pk ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L, 5L, 6L))
  }

  test("MERGE / UPDATE / DELETE rewrite through copy-on-write") {
    spark.sql("CREATE TABLE gdspec.lake.mt (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gdspec.lake.mt VALUES (1, 'a'), (2, 'b')")
    spark.sql("""MERGE INTO gdspec.lake.mt t
      USING (SELECT * FROM VALUES (2, 'B'), (3, 'C') AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(spark.sql("SELECT k, v FROM gdspec.lake.mt ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "C")))
    spark.sql("UPDATE gdspec.lake.mt SET v = upper(v) WHERE k = 1")
    assert(spark.sql("SELECT v FROM gdspec.lake.mt WHERE k = 1")
      .head().getString(0) == "A")
    spark.sql("DELETE FROM gdspec.lake.mt WHERE k = 2")
    assert(spark.table("gdspec.lake.mt").count() == 2)
  }

  test("copy-on-write rewrites only the files holding matched rows") {
    spark.sql("CREATE TABLE gdspec.lake.cow (id BIGINT, v STRING)")
    // three separate commits → three parquet files, disjoint key ranges
    spark.sql("INSERT INTO gdspec.lake.cow SELECT id, 'a' FROM range(0, 100)")
    spark.sql("INSERT INTO gdspec.lake.cow SELECT id, 'b' FROM range(100, 200)")
    spark.sql("INSERT INTO gdspec.lake.cow SELECT id, 'c' FROM range(200, 300)")
    val t = graft.sources.GraftDiskCatalog.instance("gdspec").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "cow")).asInstanceOf[GraftDiskTable]
    val before = t.log.latest().files.toSet
    assert(before.size >= 3)
    // touches keys in ONE file: runtime group filtering must keep the
    // other files' manifest entries (a whole-table rewrite would replace
    // every file and this intersection would be empty)
    spark.sql("UPDATE gdspec.lake.cow SET v = 'A' WHERE id = 42")
    val after = t.log.latest().files.toSet
    assert((before & after).nonEmpty,
      s"whole-table rewrite: no file survived ($before -> $after)")
    assert((before -- after).nonEmpty, "no file was rewritten at all")
    // and the data is right: one row changed, everything else intact
    assert(spark.sql("SELECT v FROM gdspec.lake.cow WHERE id = 42")
      .head().getString(0) == "A")
    assert(spark.table("gdspec.lake.cow").count() == 300)
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.cow WHERE v = 'a'")
      .head().getLong(0) == 99L)
  }

  test("VERSION AS OF time-travels over the manifest log") {
    spark.sql("CREATE TABLE gdspec.lake.tt (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.tt VALUES (1)") // v1
    spark.sql("INSERT INTO gdspec.lake.tt VALUES (2)") // v2
    spark.sql("INSERT OVERWRITE gdspec.lake.tt VALUES (9)") // v3
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.tt VERSION AS OF 2")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.tt VERSION AS OF 0")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT id FROM gdspec.lake.tt").head().getLong(0) == 9L)
    // snapshots are read-only
    intercept[Exception](
      spark.sql("INSERT INTO gdspec.lake.tt VERSION AS OF 1 VALUES (5)"))
  }

  test("filter pushdown and column pruning reach the parquet scan") {
    spark.sql("CREATE TABLE gdspec.lake.push (id BIGINT, a STRING, b STRING)")
    spark.sql("INSERT INTO gdspec.lake.push " +
      "SELECT id, concat('a', id), concat('b', id) FROM range(1000)")
    val df = spark.sql("SELECT a FROM gdspec.lake.push WHERE id = 7")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan)
    // pruned read schema: only the two referenced columns, not b
    assert(plan.contains("ReadSchema") && !plan.matches("(?s).*ReadSchema[^\\n]*\\bb\\b.*"),
      plan)
    assert(df.head().getString(0) == "a7")
  }

  test("COUNT(*) answers from parquet footer statistics (aggregate pushdown)") {
    spark.sql("CREATE TABLE gdspec.lake.agg (id BIGINT, v STRING, d DOUBLE)")
    spark.sql("INSERT INTO gdspec.lake.agg SELECT id, concat('v', id), " +
      "CAST(id AS DOUBLE) FROM range(5000)")
    // tier 1: the MANIFEST answers COUNT/MIN/MAX(integral) outright — no
    // conf, no file I/O, no tasks (LocalTableScan, no BatchScan)
    val df = spark.sql("SELECT count(*), min(id), max(id) FROM gdspec.lake.agg")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"), plan)
    val r = df.head()
    assert(r.getLong(0) == 5000L && r.getLong(1) == 0L && r.getLong(2) == 4999L)
    // tier 2: shapes the manifest refuses (float bounds — NaN/±0.0 footer
    // caveats) fall through to Spark's parquet FOOTER statistics under
    // its own opt-in conf
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val mm = spark.sql("SELECT min(d), max(d) FROM gdspec.lake.agg")
      assert(mm.queryExecution.executedPlan.toString.contains("PushedAggregation"),
        mm.queryExecution.executedPlan.toString)
      assert(mm.head().getDouble(0) == 0.0 && mm.head().getDouble(1) == 4999.0)
    } finally spark.conf.unset("spark.sql.parquet.aggregatePushdown")
  }

  test("scan parallelism: a multi-file table reads as multiple partitions") {
    spark.sql("CREATE TABLE gdspec.lake.par (id BIGINT)")
    // several INSERTs from a parallelized source → several parquet files
    spark.sql("INSERT INTO gdspec.lake.par SELECT id FROM range(0, 4000, 1, 8)")
    val parts = spark.table("gdspec.lake.par").rdd.getNumPartitions
    assert(parts >= 2, s"expected parallel scan, got $parts partition(s)")
    assert(spark.table("gdspec.lake.par").count() == 4000)
  }

  test("ALTER TABLE: add (null-backfilled), drop, rename (rewrites files), constraints") {
    spark.sql("CREATE TABLE gdspec.lake.al (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.al VALUES (1, 10)")
    spark.sql("ALTER TABLE gdspec.lake.al ADD COLUMN note STRING")
    spark.sql("INSERT INTO gdspec.lake.al VALUES (2, 20, 'n2')")
    val rows = spark.sql("SELECT id, note FROM gdspec.lake.al ORDER BY id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(rows == Seq((1L, None), (2L, Some("n2"))))
    spark.sql("ALTER TABLE gdspec.lake.al RENAME COLUMN v TO val")
    assert(spark.sql("SELECT sum(val) FROM gdspec.lake.al").head().getLong(0) == 30L)
    spark.sql("ALTER TABLE gdspec.lake.al DROP COLUMN note")
    assert(!spark.table("gdspec.lake.al").columns.contains("note"))
    spark.sql("ALTER TABLE gdspec.lake.al ADD CONSTRAINT vpos CHECK (val > 0)")
    intercept[Exception](spark.sql("INSERT INTO gdspec.lake.al VALUES (3, -1)"))
    spark.sql("ALTER TABLE gdspec.lake.al DROP CONSTRAINT vpos")
    spark.sql("INSERT INTO gdspec.lake.al VALUES (3, -1)")
    assert(spark.table("gdspec.lake.al").count() == 3)
  }

  test("RENAME COLUMN is metadata-only: column mapping, zero data files touched") {
    spark.sql("CREATE TABLE gdspec.lake.cm (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('bloom.columns'='v', 'bloom.expectedItems'='100')")
    spark.sql("INSERT INTO gdspec.lake.cm VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO gdspec.lake.cm VALUES (3, 30)")
    def t = graft.sources.GraftDiskCatalog.instance("gdspec").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "cm")).asInstanceOf[GraftDiskTable]
    val before = t.log.latest()
    spark.sql("ALTER TABLE gdspec.lake.cm RENAME COLUMN v TO val")
    val after = t.log.latest()
    // THE claim: a rename at 100 TB costs one manifest commit
    assert(after.files == before.files, "no data file may be touched")
    assert(after.physicalOf("val") == "v")
    assert(after.properties("bloom.columns") == "val")
    // stats keys stay physical — skipping still proves with the mapping
    assert(after.stats.values.forall(_.contains("v")))
    // reads, filters, manifest aggregates, and writes under the new name
    assert(spark.sql("SELECT sum(val) FROM gdspec.lake.cm").head().getLong(0) == 60)
    assert(spark.sql("SELECT id FROM gdspec.lake.cm WHERE val = 20")
      .head().getLong(0) == 2)
    assert(spark.sql("SELECT max(val) FROM gdspec.lake.cm").head().getLong(0) == 30)
    spark.sql("INSERT INTO gdspec.lake.cm VALUES (4, 40)")
    spark.sql("UPDATE gdspec.lake.cm SET val = 99 WHERE id = 1")
    assert(spark.sql("SELECT sum(val) FROM gdspec.lake.cm").head().getLong(0) == 189)
    // post-rename files still write the PHYSICAL name, so the whole
    // table stays uniformly keyed
    assert(t.log.latest().stats.values.forall(_.contains("v")))
    // time travel BEFORE the rename serves the old logical name
    assert(spark.sql("SELECT sum(v) FROM gdspec.lake.cm VERSION AS OF 2")
      .head().getLong(0) == 60)
    // OPTIMIZE keeps physical names (and rebuilds blooms) — reads hold
    new GraftSession(spark).sql("OPTIMIZE gdspec.lake.cm TARGET 134217728 BYTES")
    assert(spark.sql("SELECT sum(val) FROM gdspec.lake.cm").head().getLong(0) == 189)
    // drop-then-re-add under the freed name: the dropped column's bytes
    // (physical 'v') must NOT resurrect under the new logical 'v'
    spark.sql("ALTER TABLE gdspec.lake.cm DROP COLUMN val")
    spark.sql("ALTER TABLE gdspec.lake.cm ADD COLUMN v BIGINT")
    val vRows = spark.sql("SELECT v FROM gdspec.lake.cm").collect()
    assert(vRows.length == 4 && vRows.forall(_.isNullAt(0)),
      "dropped column bytes resurrected under a re-added name")
    // a CHECK referencing the old name blocks the rename with guidance
    spark.sql("ALTER TABLE gdspec.lake.cm ADD CONSTRAINT idpos CHECK (id > 0)")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gdspec.lake.cm RENAME COLUMN id TO ident"))
    assert(e.getMessage.contains("idpos"), e.getMessage)
  }

  test("ADD CONSTRAINT validates existing rows distributed") {
    spark.sql("CREATE TABLE gdspec.lake.acv (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.acv VALUES (1, -5)")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gdspec.lake.acv ADD CONSTRAINT p CHECK (v >= 0)"))
    assert(e.getMessage.contains("violate"), e.getMessage)
  }

  test("streaming sink: writeStream.toTable lands parquet epochs exactly-once") {
    spark.sql("CREATE TABLE gdspec.lake.sfeed (id BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE gdspec.lake.ssink (id BIGINT, dbl BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.sfeed VALUES (1, 10), (2, 20)")
    val ckpt = java.nio.file.Files.createTempDirectory("gdisk_ssink").toString
    val q = spark.readStream.table("gdspec.lake.sfeed")
      .selectExpr("id", "v * 2 AS dbl")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gdspec.lake.ssink")
    try {
      q.processAllAvailable()
      spark.sql("INSERT INTO gdspec.lake.sfeed VALUES (3, 30)") // mid-stream
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("gdspec.lake.ssink").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 20L), (2L, 40L), (3L, 60L)))
  }

  test("streaming sink fans out into a PARTITIONED table's hive layout") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("gdisk_psrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gdisk_pckpt").toString
    spark.sql("CREATE TABLE gdspec.lake.psink (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    (0 until 90).map(i => (i.toLong, Seq("en", "de", "fr")(i % 3)))
      .toDF("id", "lang").repartition(3).write.mode("append").parquet(srcDir)
    val q = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gdspec.lake.psink")
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("gdspec.lake.psink").count() == 90)
    val t = graft.sources.GraftDiskCatalog.instance("gdspec").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "psink")).asInstanceOf[GraftDiskTable]
    assert(t.log.latest().files.forall(_.matches("lang=(en|de|fr)/.*\\.parquet")),
      t.log.latest().files.mkString(","))
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.psink WHERE lang = 'de'")
      .head().getLong(0) == 30L)
  }

  test("streaming source resumes from its checkpoint across restarts") {
    spark.sql("CREATE TABLE gdspec.lake.rfeed (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.rfeed VALUES (1), (2)")
    val ckpt = java.nio.file.Files.createTempDirectory("gdisk_restart").toString
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Boolean]
    def run(): Unit = {
      val q = spark.readStream.table("gdspec.lake.rfeed")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => seen.put(r.getLong(0), true)); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.keySet == Set(1L, 2L))
    seen.clear() // part 2 must deliver ONLY post-checkpoint files
    spark.sql("INSERT INTO gdspec.lake.rfeed VALUES (3)")
    run()
    assert(seen.keySet == Set(3L), seen.keySet.toString)
  }

  test("PARTITIONED BY: hive-layout writes, partition-pruned reads, COW + OPTIMIZE keep layout") {
    spark.sql("CREATE TABLE gdspec.lake.pt (id BIGINT, lang STRING, txt STRING) " +
      "PARTITIONED BY (lang)")
    spark.sql("INSERT INTO gdspec.lake.pt SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' ELSE 'fr' END, " +
      "concat('t', id) FROM range(300)")
    // hive layout on disk: lang=<v> dirs, partition col NOT in the files
    val dataDir = new java.io.File(s"$warehouse/lake/pt/data")
    val dirs = dataDir.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("lang=en", "lang=de", "lang=fr"), dirs.toString)
    // partition-column predicate becomes a PartitionFilter (pruned scan)
    val df = spark.sql("SELECT id, txt FROM gdspec.lake.pt WHERE lang = 'de'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
    assert(df.count() == 100)
    // only the lang=de files are read
    assert(df.queryExecution.executedPlan.collectLeaves().toString.contains("lang=de") ||
      df.inputFiles.forall(_.contains("lang=de")), df.inputFiles.mkString(","))
    // partition values round-trip exactly
    assert(spark.sql("SELECT lang, count(*) c FROM gdspec.lake.pt GROUP BY lang ORDER BY lang")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("de", 100L), ("en", 100L), ("fr", 100L)))
    // copy-on-write UPDATE touches only the matched partition's files
    val t = graft.sources.GraftDiskCatalog.instance("gdspec").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "pt")).asInstanceOf[GraftDiskTable]
    val before = t.log.latest().files.toSet
    spark.sql("UPDATE gdspec.lake.pt SET txt = upper(txt) WHERE lang = 'de' AND id = 1")
    val after = t.log.latest().files.toSet
    assert((before & after).exists(!_.startsWith("lang=de/")),
      "non-de files must survive a de-partition UPDATE")
    assert(spark.sql("SELECT txt FROM gdspec.lake.pt WHERE id = 1").head().getString(0) == "T1")
    assert(spark.table("gdspec.lake.pt").count() == 300)
    // OPTIMIZE preserves the hive layout
    val g = new GraftSession(spark)
    g.sql("OPTIMIZE gdspec.lake.pt")
    assert(spark.table("gdspec.lake.pt").count() == 300)
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.pt WHERE lang = 'fr'")
      .head().getLong(0) == 100L)
    assert(t.log.latest().files.forall(_.matches("lang=(en|de|fr)/.*\\.parquet")),
      t.log.latest().files.mkString(","))
    // RENAME COLUMN rewrites the files but keeps the hive layout too
    spark.sql("ALTER TABLE gdspec.lake.pt RENAME COLUMN txt TO body")
    assert(t.log.latest().files.forall(_.matches("lang=(en|de|fr)/.*\\.parquet")),
      t.log.latest().files.mkString(","))
    assert(spark.sql("SELECT body FROM gdspec.lake.pt WHERE id = 1")
      .head().getString(0) == "T1")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.pt WHERE lang = 'de'")
      .head().getLong(0) == 100L)
  }

  test("OPTIMIZE WHERE compacts only the matching partitions; VACUUM RETAIN HOURS") {
    spark.sql("CREATE TABLE gdspec.lake.ow (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    for (i <- 0 until 4)
      spark.sql("INSERT INTO gdspec.lake.ow SELECT id, " +
        s"CASE WHEN id % 2 = 0 THEN 'de' ELSE 'fr' END FROM range(${i * 10}, ${i * 10 + 10})")
    def t = graft.sources.GraftDiskCatalog.instance("gdspec").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "ow")).asInstanceOf[GraftDiskTable]
    val before = t.log.latest().files
    val frBefore = before.filter(_.startsWith("lang=fr/")).toSet
    assert(before.count(_.startsWith("lang=de/")) == 4)
    val g = new GraftSession(spark)
    g.sql("OPTIMIZE gdspec.lake.ow WHERE lang = 'de' TARGET 134217728 BYTES")
    val after = t.log.latest().files
    // de compacted to one file; fr files byte-for-byte untouched
    assert(after.count(_.startsWith("lang=de/")) == 1, after.mkString(","))
    assert(after.filter(_.startsWith("lang=fr/")).toSet == frBefore)
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.ow WHERE lang = 'de'")
      .head().getLong(0) == 20L)
    assert(spark.table("gdspec.lake.ow").count() == 40L)
    // predicate on a non-partition column refuses with guidance
    val e = intercept[Exception](
      g.sql("OPTIMIZE gdspec.lake.ow WHERE id > 5"))
    assert(e.getMessage.contains("partition columns"), e.getMessage)
    // time-based retention: everything is seconds old, so RETAIN 1 HOURS
    // keeps all versions; RETAIN 0 HOURS collapses to the newest
    g.sql("VACUUM gdspec.lake.ow RETAIN 1 HOURS")
    assert(t.log.versions().length >= 5)
    g.sql("VACUUM gdspec.lake.ow RETAIN 0 HOURS")
    assert(t.log.versions().length == 1)
    assert(spark.table("gdspec.lake.ow").count() == 40L)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns as a metadata change") {
    spark.sql("CREATE TABLE gdspec.lake.mse (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.mse VALUES (1, 10), (2, 20)")
    import spark.implicits._
    Seq((2L, 25L, "note2"), (3L, 30L, "note3"))
      .toDF("id", "v", "note").createOrReplaceTempView("mse_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gdspec.lake.mse t
      USING mse_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql(
      "SELECT id, v, note FROM gdspec.lake.mse ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq
    assert(rows == Seq((1L, 10L, None), (2L, 25L, Some("note2")),
      (3L, 30L, Some("note3"))))
    // the evolved column is a metadata ADD COLUMN: file rows written
    // before it read as NULL, and the new column accepts later DML
    spark.sql("UPDATE gdspec.lake.mse SET note = 'n1' WHERE id = 1")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.mse WHERE note IS NOT NULL")
      .head().getLong(0) == 3L)
  }

  test("OPTIMIZE bin-packs small files; data and old versions intact") {
    spark.sql("CREATE TABLE gdspec.lake.opt (id BIGINT)")
    for (i <- 0 until 6)
      spark.sql(s"INSERT INTO gdspec.lake.opt SELECT id FROM range(${i * 10}, ${i * 10 + 10})")
    val g = new GraftSession(spark)
    val r = g.sql("OPTIMIZE gdspec.lake.opt TARGET 1048576 BYTES").head()
    assert(r.getLong(1) >= 6 && r.getLong(2) == 1L, r.toString)
    // data byte-identical through the rewrite
    assert(spark.table("gdspec.lake.opt").count() == 60)
    assert(spark.sql("SELECT sum(id) FROM gdspec.lake.opt").head().getLong(0) ==
      (0 until 60).sum.toLong)
    // pre-optimize versions still time-travel (VACUUM is the forgetter)
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.opt VERSION AS OF 3")
      .head().getLong(0) == 30L)
    // already-packed tables are a no-op, not a rewrite loop
    val r2 = g.sql("OPTIMIZE gdspec.lake.opt").head()
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 1L)
    intercept[Exception](g.sql("OPTIMIZE no_such.ns.t"))
  }

  test("OPTIMIZE is incremental: at-target files are left byte-for-byte alone") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.inc (id BIGINT)")
    // one file well over the compaction target + three tiny ones
    spark.sql("INSERT INTO gdspec.lake.inc SELECT id FROM range(0, 60000, 1, 1)")
    for (i <- 0 until 3)
      spark.sql("INSERT INTO gdspec.lake.inc " +
        s"SELECT id FROM range(${100000 + i * 10}, ${100000 + i * 10 + 10}, 1, 1)")
    val bigFile = spark.sql(
      "SELECT DISTINCT _file FROM gdspec.lake.inc WHERE id = 0")
      .head().getString(0)
    val r = g.sql("OPTIMIZE gdspec.lake.inc TARGET 65536 BYTES").head()
    // 4 files in, 2 out: the big one KEPT, the three smalls packed to one
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L, r.toString)
    val after = spark.sql("SELECT DISTINCT _file FROM gdspec.lake.inc")
      .collect().map(_.getString(0)).toSet
    assert(after.size == 2)
    assert(after.contains(bigFile),
      "the at-target file must survive the rewrite untouched")
    assert(spark.table("gdspec.lake.inc").count() == 60030L)
    assert(spark.sql(
      "SELECT count(*) FROM gdspec.lake.inc WHERE id >= 100000")
      .head().getLong(0) == 30L)
  }

  test("a live stream crossing an OPTIMIZE commit never replays compacted rows") {
    spark.sql("CREATE TABLE gdspec.lake.os (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.os VALUES (1)")
    spark.sql("INSERT INTO gdspec.lake.os VALUES (2)")
    val ckpt = java.nio.file.Files.createTempDirectory("gdisk_os").toString
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Int]
    val q = spark.readStream.table("gdspec.lake.os")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r =>
          seen.updateWith(r.getLong(0))(c => Some(c.getOrElse(0) + 1)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      // compaction rewrites the files but ADDS no rows — the stream must
      // skip that manifest version entirely (added = [])
      new GraftSession(spark).sql("OPTIMIZE gdspec.lake.os")
      spark.sql("INSERT INTO gdspec.lake.os VALUES (3)")
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.toMap == Map(1L -> 1, 2L -> 1, 3L -> 1), seen.toMap.toString)
  }

  test("VACUUM drops old manifests and unreferenced files; live reads survive") {
    spark.sql("CREATE TABLE gdspec.lake.vac (id BIGINT)")
    for (i <- 1 to 4) spark.sql(s"INSERT INTO gdspec.lake.vac VALUES ($i)")
    spark.sql("INSERT OVERWRITE gdspec.lake.vac VALUES (99)")
    val g = new GraftSession(spark)
    g.sql("VACUUM gdspec.lake.vac")
    assert(spark.sql("SELECT id FROM gdspec.lake.vac").head().getLong(0) == 99L)
    // pre-overwrite files are gone from disk
    val dataDir = new java.io.File(s"$warehouse/lake/vac/data")
    assert(dataDir.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    // vacuumed version errors cleanly
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gdspec.lake.vac VERSION AS OF 2").collect())
    assert(e.getMessage.contains("VACUUM"), e.getMessage)
  }

  test("no rows on the driver: commits carry file names, reads stream from executors") {
    spark.sql("CREATE TABLE gdspec.lake.nd (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gdspec.lake.nd SELECT id, repeat('x', 100) FROM range(10000)")
    val t = graft.sources.GraftDiskCatalog.instance("gdspec").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "nd")).asInstanceOf[GraftDiskTable]
    // the manifest records file names only — the driver-held state of a
    // 10k-row (or 10-billion-row) table is a list of strings
    val m = t.log.latest()
    assert(m.files.nonEmpty && m.files.forall(_.endsWith(".parquet")))
    // and the batch scan is Spark's own parquet scan (vectorized, columnar)
    val plan = spark.table("gdspec.lake.nd").queryExecution.executedPlan.toString
    assert(plan.contains("Parquet") || plan.contains("BatchScan"), plan)
    assert(spark.table("gdspec.lake.nd").count() == 10000)
  }

  test("end to end: streaming ingest -> restart -> OPTIMIZE -> vacuum, data exact throughout") {
    import spark.implicits._
    // the 100 TB ingest loop in miniature: a corpus lands incrementally in
    // a parquet dir, a checkpointed stream ingests it into a gdisk table
    // (one small file per epoch), survives a stop/restart without
    // duplicating or dropping rows, OPTIMIZE bin-packs the accumulated
    // small files, VACUUM forgets pre-compaction versions
    val srcDir = java.nio.file.Files.createTempDirectory("gdisk_e2e_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gdisk_e2e_ckpt").toString
    spark.sql("CREATE TABLE gdspec.lake.e2e (id BIGINT, txt STRING)")
    def land(from: Int, until: Int): Unit =
      (from until until).map(i => (i.toLong, s"doc_$i")).toDF("id", "txt")
        .repartition(2).write.mode("append").parquet(srcDir)
    def runIngest(): Unit = {
      val q = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", 2).parquet(srcDir)
        .writeStream.option("checkpointLocation", ckpt)
        .toTable("gdspec.lake.e2e")
      try q.processAllAvailable() finally q.stop()
    }
    land(0, 50); runIngest()
    land(50, 100); runIngest() // restart from checkpoint, new arrivals only
    assert(spark.table("gdspec.lake.e2e").count() == 100)
    val t = graft.sources.GraftDiskCatalog.instance("gdspec").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "e2e")).asInstanceOf[GraftDiskTable]
    val smallFiles = t.log.latest().files.length
    assert(smallFiles >= 2, s"expected per-epoch small files, got $smallFiles")
    val g = new GraftSession(spark)
    val r = g.sql("OPTIMIZE gdspec.lake.e2e").head()
    assert(r.getLong(2) < r.getLong(1), r.toString)
    g.sql("VACUUM gdspec.lake.e2e")
    // exactness after the whole loop: every id exactly once, text intact
    val rows = spark.sql("SELECT id, txt FROM gdspec.lake.e2e ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(rows.length == 100 &&
      rows.zipWithIndex.forall { case ((id, tx), i) =>
        id == i.toLong && tx == s"doc_$i" })
  }

  test("FOREIGN KEY: distributed ingest probes + parent-side RESTRICT") {
    spark.sql("CREATE TABLE gdspec.lake.fkp (id BIGINT, " +
      "CONSTRAINT pk PRIMARY KEY (id))")
    spark.sql("INSERT INTO gdspec.lake.fkp VALUES (1), (2)")
    spark.sql("CREATE TABLE gdspec.lake.fkc (cid BIGINT, pid BIGINT, " +
      "CONSTRAINT fkc FOREIGN KEY (pid) REFERENCES gdspec.lake.fkp (id))")
    spark.sql("INSERT INTO gdspec.lake.fkc VALUES (10, 1), (11, NULL)")
    // orphan insert rejected by the distributed anti-probe
    val e = intercept[Exception](
      spark.sql("INSERT INTO gdspec.lake.fkc VALUES (12, 99)"))
    assert(e.getMessage.contains("FOREIGN KEY"), e.getMessage)
    assert(spark.table("gdspec.lake.fkc").count() == 2)
    // deleting a still-referenced parent key RESTRICTs...
    val e2 = intercept[Exception](
      spark.sql("DELETE FROM gdspec.lake.fkp WHERE id = 1"))
    assert(e2.getMessage.contains("RESTRICT"), e2.getMessage)
    // ...an unreferenced one deletes fine
    spark.sql("DELETE FROM gdspec.lake.fkp WHERE id = 2")
    assert(spark.table("gdspec.lake.fkp").count() == 1)
    assert(spark.sql("SELECT cid, pid FROM gdspec.lake.fkc ORDER BY cid")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq == Seq((10L, 1L), (11L, -1L)))
  }

  test("concurrent appends all land through optimistic commit retries") {
    spark.sql("CREATE TABLE gdspec.lake.cc (id BIGINT)")
    // four INSERTs race from separate threads: each loads its OWN table
    // instance, so the only coordination is the create-if-absent manifest
    // claim — losers must re-read the new base and retry, never drop rows
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(4))
    val futures = (1 to 4).map { i =>
      Future(spark.sql(s"INSERT INTO gdspec.lake.cc VALUES ($i)"))(pool)
    }
    futures.foreach(f => Await.result(f, Duration("180s")))
    assert(spark.sql("SELECT id FROM gdspec.lake.cc ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val t = graft.sources.GraftDiskCatalog.instance("gdspec").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "cc")).asInstanceOf[GraftDiskTable]
    assert(t.log.latestVersion() == 4L) // one commit per insert, no gaps
  }

  test("concurrent COW rewrites conflict cleanly, never lose updates") {
    // Models two DRIVERS: a rewrite whose scan read version v commits
    // after a concurrent commit already replaced the files it read. A
    // blind swap would resurrect the pre-image rows the stale rewrite
    // copied (duplicate + lost update); the commit must instead fail
    // cleanly with the table intact.
    spark.sql("CREATE TABLE gdspec.lake.ccow (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.ccow VALUES (1, 10), (2, 20)")
    def load() = graft.sources.GraftDiskCatalog.instance("gdspec").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "ccow")).asInstanceOf[GraftDiskTable]
    val stale = load() // this instance's snapshot: version 1's file set
    val staleFiles = stale.liveFiles
    val staleSchema = stale.liveSchemaJson
    // a concurrent UPDATE replaces that file before the stale commit lands
    spark.sql("UPDATE gdspec.lake.ccow SET v = 99 WHERE id = 1")
    val e = intercept[IllegalStateException](
      stale.commitReplace(staleFiles, Nil, Map.empty, Some(staleSchema)))
    assert(e.getMessage.contains("concurrent commit conflict"), e.getMessage)
    assert(e.getMessage.contains("already replaced or removed"), e.getMessage)
    // the concurrent writer's update survives, nothing duplicated or lost
    assert(spark.sql("SELECT id, v FROM gdspec.lake.ccow ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 99L), (2L, 20L)))

    // schema conflict: files intact, but a concurrent column change means
    // the rewrite's written output no longer matches the table layout
    val stale2 = load()
    spark.sql("ALTER TABLE gdspec.lake.ccow ADD COLUMN note STRING")
    val e2 = intercept[IllegalStateException](
      stale2.commitReplace(stale2.liveFiles, Nil, Map.empty,
        Some(stale2.liveSchemaJson)))
    assert(e2.getMessage.contains("schema changed"), e2.getMessage)

    // benign race: a concurrent blind APPEND does not conflict — the new
    // file rides through untouched while the rewrite swaps its own files
    // (snapshot isolation for the statement, Delta's WriteSerializable)
    val stale3 = load()
    spark.sql("INSERT INTO gdspec.lake.ccow VALUES (3, 30, 'n')")
    stale3.commitReplace(stale3.liveFiles, Nil, Map.empty,
      Some(stale3.liveSchemaJson)) // drops every pre-append file
    assert(spark.sql("SELECT id, v FROM gdspec.lake.ccow ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 30L)))
  }

  test("commit log: deltas between checkpoints, exact reconstruction, chain-aware VACUUM") {
    spark.sql("CREATE TABLE gdspec.lake.dl (id BIGINT) " +
      "TBLPROPERTIES ('commitlog.checkpointInterval'='5')")
    (1 to 12).foreach(i => spark.sql(s"INSERT INTO gdspec.lake.dl VALUES ($i)"))
    val logDir = new java.io.File(s"$warehouse/lake/dl/_graft_log")
    def records() = logDir.listFiles().map(_.getName)
      .filter(_.matches("[vd]\\d+\\.json")).sorted.toSeq
    // v0 (create) + checkpoints v5, v10; every other version is a delta
    assert(records().count(_.startsWith("v")) == 3, records().mkString(","))
    assert(records().count(_.startsWith("d")) == 10)
    // an append's delta record is O(changed files), NOT O(table files):
    // the newest delta must be well under the checkpoint that carries the
    // full 11-file inventory
    def size(n: String) = new java.io.File(logDir, n).length()
    assert(size("d00000000000000000012.json") * 2 <
      size("v00000000000000000010.json"),
      records().map(n => s"$n=${size(n)}").mkString(","))
    // reads reconstruct exactly through the delta chain
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.dl VERSION AS OF 7")
      .head().getLong(0) == 7)
    assert(spark.sql("SELECT sum(id) FROM gdspec.lake.dl").head().getLong(0) == 78)
    // a COW rewrite rides a delta (removed + added both round-trip)
    spark.sql("UPDATE gdspec.lake.dl SET id = 100 WHERE id = 3") // v13
    assert(spark.sql("SELECT sum(id) FROM gdspec.lake.dl").head().getLong(0) == 175)
    // RESTORE re-serves an arbitrary file set — not delta-expressible, so
    // the record self-detects and embeds the full manifest (same name)
    val g = new GraftSession(spark)
    g.sql("RESTORE TABLE gdspec.lake.dl TO VERSION AS OF 12") // v14
    assert(spark.sql("SELECT sum(id) FROM gdspec.lake.dl").head().getLong(0) == 78)
    assert(records().contains("d00000000000000000014.json"))
    // VACUUM: horizon moves to v12; the v10 checkpoint + d11 survive ONLY
    // as chain links — invisible to history, unreadable as versions
    g.sql("VACUUM gdspec.lake.dl RETAIN 3 VERSIONS")
    assert(spark.sql("SELECT sum(id) FROM gdspec.lake.dl").head().getLong(0) == 78)
    val hist = g.sql("DESCRIBE HISTORY gdspec.lake.dl").collect()
      .map(_.getInt(0)).toSeq
    assert(hist == Seq(12, 13, 14), hist.toString)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gdspec.lake.dl VERSION AS OF 11").collect())
    assert(e.getMessage.contains("removed by VACUUM"), e.getMessage)
    // post-vacuum commits continue the chain unbroken
    spark.sql("INSERT INTO gdspec.lake.dl VALUES (200)") // v15 = checkpoint
    assert(spark.sql("SELECT sum(id) FROM gdspec.lake.dl").head().getLong(0) == 278)
    assert(records().contains("v00000000000000000015.json"), records().mkString(","))
  }

  test("DESCRIBE HISTORY lists gdisk manifest versions") {
    spark.sql("CREATE TABLE gdspec.lake.dh (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.dh VALUES (1)")
    spark.sql("INSERT INTO gdspec.lake.dh VALUES (2)")
    val g = new GraftSession(spark)
    val hist = g.sql("DESCRIBE HISTORY gdspec.lake.dh").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(hist.map(_._1) == Seq(0, 1, 2), hist.toString)
    assert(hist.last._2.contains("files=2") && hist.last._2.contains("added=1"),
      hist.toString)
  }

  test("TIMESTAMP AS OF serves the newest commit at or before the timestamp") {
    spark.sql("CREATE TABLE gdspec.lake.tt_ts (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.tt_ts VALUES (1)")
    Thread.sleep(20) // commit stamps are wall-clock milliseconds
    val mid = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    Thread.sleep(20)
    spark.sql("INSERT INTO gdspec.lake.tt_ts VALUES (2)")
    assert(spark.sql(
      s"SELECT count(*) FROM gdspec.lake.tt_ts TIMESTAMP AS OF '$mid'")
      .head().getLong(0) == 1L, "mid-point timestamp must serve only v1")
    val late = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now().plusSeconds(2))
    assert(spark.sql(
      s"SELECT count(*) FROM gdspec.lake.tt_ts TIMESTAMP AS OF '$late'")
      .head().getLong(0) == 2L)
    val early = intercept[Exception](spark.sql(
      "SELECT * FROM gdspec.lake.tt_ts TIMESTAMP AS OF '2000-01-01'").collect())
    assert(early.getMessage.contains("at or before"), early.getMessage)
    // DESCRIBE HISTORY exposes the stamps TIMESTAMP AS OF resolves against
    val hist = new GraftSession(spark)
      .sql("DESCRIBE HISTORY gdspec.lake.tt_ts").collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(hist.map(_._1).toSeq == Seq(0, 1, 2))
    assert(hist.forall(_._2 > 0) &&
      hist.sliding(2).forall(p => p(0)._2 <= p(1)._2), hist.mkString(","))
  }

  test("CTAS creates and populates a gdisk table in one statement") {
    spark.sql("CREATE TABLE gdspec.lake.ctas AS " +
      "SELECT id, id * 2 AS dbl FROM range(5)")
    val rows = spark.sql("SELECT id, dbl FROM gdspec.lake.ctas ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == (0L until 5L).map(i => (i, i * 2)))
    // staged CTAS lands as ONE commit: version 0 already carries the data
    // (no empty-shell version exists), and it time-travels normally
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.ctas VERSION AS OF 0")
      .head().getLong(0) == 5L)
    spark.sql("INSERT INTO gdspec.lake.ctas VALUES (99, 198)")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.ctas VERSION AS OF 0")
      .head().getLong(0) == 5L)
    assert(spark.table("gdspec.lake.ctas").count() == 6L)
  }

  test("storage-partitioned join: co-partitioned gdisk tables join and aggregate with zero shuffle") {
    val c = spark.conf
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.sources.v2.bucketing.enabled", "true")
      c.set("spark.sql.adaptive.enabled", "false")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // no broadcast escape
      spark.sql("CREATE TABLE gdspec.lake.spj_a (src STRING, v BIGINT) " +
        "PARTITIONED BY (src)")
      spark.sql("CREATE TABLE gdspec.lake.spj_b (src STRING, w BIGINT) " +
        "PARTITIONED BY (src)")
      spark.sql("INSERT INTO gdspec.lake.spj_a VALUES " +
        "('web', 1), ('web', 2), ('book', 3), ('code', 4)")
      spark.sql("INSERT INTO gdspec.lake.spj_b VALUES " +
        "('web', 10), ('book', 20), ('code', 30), ('code', 31)")
      val joined = spark.sql("""SELECT a.src, a.v, b.w
        FROM gdspec.lake.spj_a a JOIN gdspec.lake.spj_b b ON a.src = b.src
        ORDER BY a.src, a.v, b.w""")
      val got = joined.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq(("book", 3L, 20L), ("code", 4L, 30L),
        ("code", 4L, 31L), ("web", 1L, 10L), ("web", 2L, 10L)))
      // the join itself must carry no exchange: both sides report
      // KeyGroupedPartitioning over src, so the file groups meet in place
      val plan = joined.queryExecution.executedPlan.toString
      val joinPart = plan.substring(plan.indexOf("Join"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"SPJ did not elide the join shuffle:\n$plan")
      // aggregation keyed on the partition column: same elision
      val agg = spark.sql(
        "SELECT src, count(*) AS c FROM gdspec.lake.spj_a GROUP BY src")
      assert(agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("web" -> 2L, "book" -> 1L, "code" -> 1L))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"SPJ did not elide the aggregation shuffle:\n$aggPlan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("hash-bucketed tables: bucket(n, k) layout, SPJ on a high-cardinality key, OPTIMIZE keeps buckets") {
    val c = spark.conf
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.sources.v2.bucketing.enabled", "true")
      c.set("spark.sql.adaptive.enabled", "false")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("CREATE TABLE gdspec.lake.bk_a (k BIGINT, v BIGINT) " +
        "PARTITIONED BY (bucket(4, k))")
      spark.sql("CREATE TABLE gdspec.lake.bk_b (k BIGINT, w BIGINT) " +
        "PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO gdspec.lake.bk_a SELECT id, id * 2 FROM range(100)")
      spark.sql("INSERT INTO gdspec.lake.bk_b SELECT id, id + 1 FROM range(100)")
      // files land under __bucket=<id>/ dirs; the key column stays IN them
      val dataDir = new java.io.File(s"$warehouse/lake/bk_a/data")
      val bucketDirs = dataDir.listFiles().filter(_.isDirectory).map(_.getName)
      assert(bucketDirs.nonEmpty &&
        bucketDirs.forall(_.matches("__bucket=[0-3]")), bucketDirs.mkString(","))
      assert(spark.sql("SELECT sum(k) FROM gdspec.lake.bk_a").head().getLong(0)
        == (0L until 100L).sum)
      // the dir id is pmod(hash(k), 4) — verify one file agrees with SQL
      val perBucket = spark.sql("SELECT pmod(hash(k), 4) AS b, count(*) AS n " +
        "FROM gdspec.lake.bk_a GROUP BY 1").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val dirCounts = bucketDirs.map { d =>
        d.stripPrefix("__bucket=").toInt ->
          spark.read.parquet(s"$dataDir/$d").count()
      }.toMap
      assert(dirCounts == perBucket, s"$dirCounts vs $perBucket")
      // SPJ: join on the bucketed high-cardinality key — zero hash exchange
      val joined = spark.sql("""SELECT a.k, a.v, b.w FROM
        gdspec.lake.bk_a a JOIN gdspec.lake.bk_b b ON a.k = b.k""")
      assert(joined.count() == 100)
      assert(joined.filter("k = 37").collect().map(r =>
        (r.getLong(1), r.getLong(2))).toSeq == Seq((74L, 38L)))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed SPJ did not elide the join shuffle:\n$plan")
      // OPTIMIZE recomputes the same bucket ids and keeps the layout
      new GraftSession(spark).sql("OPTIMIZE gdspec.lake.bk_a TARGET 1048576 BYTES")
      val after = dataDir.listFiles().filter(_.isDirectory).map(_.getName)
      assert(after.forall(_.matches("__bucket=[0-3]")), after.mkString(","))
      assert(spark.sql("SELECT sum(k), sum(v) FROM gdspec.lake.bk_a").head()
        .getLong(1) == (0L until 100L).map(_ * 2).sum)
      val joined2 = spark.sql("""SELECT a.k, a.v, b.w FROM
        gdspec.lake.bk_a a JOIN gdspec.lake.bk_b b ON a.k = b.k""")
      assert(joined2.count() == 100)
      assert(!joined2.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "post-OPTIMIZE bucketed SPJ lost its shuffle elision")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("bucket pruning: a point predicate on the bucket column plans only its dir's files") {
    spark.sql("CREATE TABLE gdspec.lake.bkp (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gdspec.lake.bkp SELECT id, id * 3 FROM range(200)")
    def statsFiles(sql: String): (Int, Int, Seq[(Long, Long)]) = {
      val df = spark.sql(sql)
      val m = """statsFiles=(\d+)/(\d+)""".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString).get
      (m.group(1).toInt, m.group(2).toInt,
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    }
    val (kept, total, rows) =
      statsFiles("SELECT k, v FROM gdspec.lake.bkp WHERE k = 37")
    assert(rows == Seq((37L, 111L)))
    assert(total >= 4 && kept < total, s"no bucket pruning: $kept/$total")
    // IN-list: union of the listed keys' buckets, still pruned
    val (keptIn, totalIn, rowsIn) = statsFiles(
      "SELECT k, v FROM gdspec.lake.bkp WHERE k IN (37, 38) ORDER BY k")
    assert(rowsIn == Seq((37L, 111L), (38L, 114L)))
    assert(keptIn < totalIn, s"no IN-list bucket pruning: $keptIn/$totalIn")
    // a range predicate cannot pin a bucket (manifest min/max stats may
    // still skip files — that's the OTHER pruning tier); rows stay exact
    val (_, _, rowsR) = statsFiles(
      "SELECT k, v FROM gdspec.lake.bkp WHERE k < 3 ORDER BY k")
    assert(rowsR == Seq((0L, 0L), (1L, 3L), (2L, 6L)))
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    spark.sql("CREATE TABLE gdspec.lake.dppf (id BIGINT, grp STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gdspec.lake.dppf " +
      "SELECT id, concat('g', CAST(id % 8 AS STRING)) FROM range(400)")
    spark.sql("CREATE TABLE gdspec.lake.dppd (grp STRING, keep INT)")
    spark.sql("INSERT INTO gdspec.lake.dppd " +
      "SELECT concat('g', CAST(id AS STRING)), " +
      "CASE WHEN id < 2 THEN 1 ELSE 0 END FROM range(8)")
    val q = """SELECT f.grp, count(*) AS c
      FROM gdspec.lake.dppf f JOIN gdspec.lake.dppd d ON f.grp = d.grp
      WHERE d.keep = 1 GROUP BY f.grp ORDER BY f.grp"""
    val df = spark.sql(q)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP runtime filter in plan:\n$plan")
    val before = GraftDiskCatalog.runtimePrunedFiles.get()
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("g0", 50L), ("g1", 50L)))
    assert(GraftDiskCatalog.runtimePrunedFiles.get() > before,
      "runtime filter pruned no fact files")
  }

  test("dynamic bucket pruning: runtime join-key values pin the fact's bucket dirs") {
    spark.sql("CREATE TABLE gdspec.lake.dbpf (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(16, k))")
    spark.sql("INSERT INTO gdspec.lake.dbpf SELECT id, id * 2 FROM range(2000)")
    spark.sql("CREATE TABLE gdspec.lake.dbpd (k BIGINT, tag STRING)")
    spark.sql("INSERT INTO gdspec.lake.dbpd " +
      "SELECT id, IF(id IN (3, 7), 'hot', 'cold') FROM range(100)")
    val q = """SELECT f.k, f.v FROM gdspec.lake.dbpf f
      JOIN gdspec.lake.dbpd d ON f.k = d.k
      WHERE d.tag = 'hot' ORDER BY f.k"""
    val df = spark.sql(q)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP runtime filter in plan:\n$plan")
    val before = GraftDiskCatalog.runtimePrunedFiles.get()
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((3L, 6L), (7L, 14L)))
    assert(GraftDiskCatalog.runtimePrunedFiles.get() > before,
      "runtime join-key values pruned no bucket dirs")
  }

  test("manifest-exact numRows feeds plan statistics; partition predicates shrink it") {
    spark.sql("CREATE TABLE gdspec.lake.nr (id BIGINT, grp STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gdspec.lake.nr " +
      "SELECT id, IF(id % 2 = 0, 'even', 'odd') FROM range(1000)")
    val full = spark.table("gdspec.lake.nr").queryExecution.optimizedPlan.stats
    assert(full.rowCount.contains(BigInt(1000)),
      s"expected exact rowCount=1000, got ${full.rowCount}")
    // a literal partition predicate pins dirs driver-side: the scan's
    // planned files (and its reported numRows) cover only matching dirs
    val filtered = spark.table("gdspec.lake.nr").where("grp = 'even'")
    val scanStats = filtered.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats
    }.head
    assert(scanStats.rowCount.contains(BigInt(500)),
      s"expected partition-pruned rowCount=500, got ${scanStats.rowCount}")
    assert(filtered.count() == 500L)
  }

  test("SHOW PARTITIONS serves the manifest's partition inventory") {
    spark.sql("CREATE TABLE gdspec.lake.shp (id BIGINT, grp STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gdspec.lake.shp " +
      "SELECT id, IF(id % 4 = 0, 'a', 'b') FROM range(100)")
    val g = new GraftSession(spark)
    val rows = g.sql("SHOW PARTITIONS gdspec.lake.shp").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows == Map("grp=a" -> 25L, "grp=b" -> 75L))
    // bucketed layout: one row per __bucket dir, counts sum to the table
    spark.sql("CREATE TABLE gdspec.lake.shb (k BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gdspec.lake.shb SELECT id FROM range(64)")
    val b = g.sql("SHOW PARTITIONS gdspec.lake.shb").collect()
    assert(b.forall(_.getString(0).startsWith("__bucket=")))
    assert(b.map(_.getLong(2)).sum == 64L)
    // unpartitioned tables error, like Spark's own SHOW PARTITIONS
    spark.sql("CREATE TABLE gdspec.lake.shu (id BIGINT)")
    val e = intercept[Exception](g.sql("SHOW PARTITIONS gdspec.lake.shu"))
    assert(e.getMessage.contains("not a partitioned table"))
  }

  test("ANALYZE TABLE commits manifest NDV stats; scans serve CBO column statistics") {
    spark.sql("CREATE TABLE gdspec.lake.cbo (id BIGINT, cat STRING, grp STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gdspec.lake.cbo SELECT id, " +
      "concat('c', id % 10), IF(id < 800, 'hot', 'cold') FROM range(1000)")
    val g = new GraftSession(spark)
    val out = g.sql("ANALYZE TABLE gdspec.lake.cbo COMPUTE STATISTICS")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("id" -> 1000L, "cat" -> 10L, "grp" -> 2L))
    // the scan relation's catalyst stats carry per-column facts: NDV from
    // the ANALYZE commit, min/max/nullCount merged from per-file manifest
    // stats, partition-column bounds/NDV from the hive dir values
    val rel = spark.table("gdspec.lake.cbo").queryExecution.optimizedPlan
      .collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
    val byName = rel.stats.attributeStats.map { case (a, s) => a.name -> s }
    val id = byName("id")
    assert(id.distinctCount.contains(BigInt(1000)))
    assert(id.min.contains(0L) && id.max.contains(999L))
    assert(id.nullCount.contains(BigInt(0)))
    val grp = byName("grp")
    assert(grp.distinctCount.contains(BigInt(2)))
    assert(grp.min.map(_.toString).contains("cold") &&
      grp.max.map(_.toString).contains("hot"))
    val cat = byName("cat")
    assert(cat.distinctCount.contains(BigInt(10)))
    assert(cat.avgLen.contains(2L) && cat.maxLen.contains(2L))
    // with CBO on, a range predicate's estimated output uses those stats:
    // id < 100 over uniform [0, 999] estimates ~10% of 1000 rows
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val est = spark.table("gdspec.lake.cbo").where("id < 100")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(rc => rc >= BigInt(80) && rc <= BigInt(130)),
        s"expected ~100 estimated rows from CBO selectivity, got $est")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    // APPROXIMATE flavor: one HLL pass, estimates within 10%
    val approx = g.sql(
      "ANALYZE TABLE gdspec.lake.cbo COMPUTE APPROXIMATE STATISTICS")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(approx("id") - 1000L) <= 100L &&
      approx("cat") == 10L && approx("grp") == 2L)
  }

  test("dynamic partition overwrite replaces only the partitions new rows land in") {
    spark.sql("CREATE TABLE gdspec.lake.dyn (id BIGINT, grp STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gdspec.lake.dyn VALUES " +
      "(1, 'a'), (2, 'a'), (3, 'b'), (4, 'c')")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE gdspec.lake.dyn VALUES (10, 'a'), (30, 'b')")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // a and b replaced wholesale, c untouched
    val rows = spark.table("gdspec.lake.dyn").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(rows == Set(10L -> "a", 30L -> "b", 4L -> "c"))
    // time travel still serves the pre-overwrite snapshot
    assert(spark.sql(
      "SELECT count(*) FROM gdspec.lake.dyn VERSION AS OF 1").head().getLong(0) == 4L)
    // bucketed layout rejects dynamic overwrite (buckets group by hash,
    // not partition value — replacing a bucket dir would delete
    // unrelated keys)
    spark.sql("CREATE TABLE gdspec.lake.dynb (k BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gdspec.lake.dynb VALUES (1), (2)")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val e = intercept[Exception](
      spark.sql("INSERT OVERWRITE gdspec.lake.dynb VALUES (9)"))
    spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(e.getMessage.contains("dynamic partition overwrite") ||
      Option(e.getCause).exists(_.getMessage.contains("dynamic partition overwrite")))
  }

  test("static INSERT OVERWRITE PARTITION pins dirs; non-partition predicates reject") {
    spark.sql("CREATE TABLE gdspec.lake.sov (id BIGINT, grp STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gdspec.lake.sov VALUES " +
      "(1, 'a'), (2, 'a'), (3, 'b'), (4, 'c')")
    // static mode (the default): only the named partition is replaced
    spark.sql("INSERT OVERWRITE gdspec.lake.sov PARTITION (grp = 'a') " +
      "VALUES (100)")
    val rows = spark.table("gdspec.lake.sov").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(rows == Set(100L -> "a", 3L -> "b", 4L -> "c"))
    // the overwrite is ONE commit: delete-dir + append together
    val hist = new GraftSession(spark)
      .sql("DESCRIBE HISTORY gdspec.lake.sov").collect()
    assert(hist.length == 3, s"expected 3 versions, got ${hist.length}")
    // DataFrame overwrite(condition) on a non-partition column rejects —
    // whole files can't be provably covered
    val e = intercept[Exception] {
      spark.table("gdspec.lake.sov").where("id > 0").limit(1)
        .writeTo("gdspec.lake.sov").overwrite(
          org.apache.spark.sql.functions.col("id") > 0)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(5).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("partition columns"), msgs)
  }

  test("COUNT/MIN/MAX answer from the manifest with zero file I/O") {
    spark.sql("CREATE TABLE gdspec.lake.magg (id BIGINT, v DOUBLE, grp STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gdspec.lake.magg SELECT " +
      "IF(id % 10 = 0, NULL, id), CAST(id AS DOUBLE), " +
      "IF(id < 800, 'hot', 'cold') FROM range(1000)")
    val q = "SELECT count(*) AS c, count(id) AS ci, count(grp) AS cg, " +
      "min(id) AS mn, max(id) AS mx FROM gdspec.lake.magg"
    val df = spark.sql(q)
    val plan = df.queryExecution.executedPlan.toString
    // complete manifest answer: the whole query is one LocalTableScan over
    // the pushed aggregate columns — no parquet scan, no exchange, no
    // aggregate exec anywhere
    assert(plan.contains("LocalTableScan [count(*)"),
      s"expected a local (zero-task) manifest-aggregate scan in:\n$plan")
    assert(!plan.contains("BatchScan") && !plan.contains("Exchange") &&
      !plan.contains("HashAggregate"),
      s"manifest aggregate still planned distributed work:\n$plan")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan
    }
    assert(scans.exists(_.isInstanceOf[graft.sources.GdiskManifestAggScan]),
      s"expected GdiskManifestAggScan, got ${scans.map(_.getClass.getName)}")
    val r = df.head()
    assert(r.getLong(0) == 1000L && r.getLong(1) == 900L &&
      r.getLong(2) == 1000L && r.getLong(3) == 1L && r.getLong(4) == 999L,
      s"wrong manifest aggregate values: $r")
    // a data filter defeats the manifest answer — falls back to a real scan
    val filtered = spark.sql(
      "SELECT count(*) FROM gdspec.lake.magg WHERE id > 10")
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("GdiskManifestAggScan"))
    assert(filtered.head().getLong(0) == 891L)
    // GROUP BY over the partition column: one row per hive dir, still
    // zero tasks — the SQL face of SHOW PARTITIONS
    val grouped = spark.sql("SELECT grp, count(*) AS c, min(id) AS mn, " +
      "max(id) AS mx FROM gdspec.lake.magg GROUP BY grp")
    val gPlan = grouped.queryExecution.executedPlan.toString
    assert(gPlan.contains("LocalTableScan") && !gPlan.contains("BatchScan"),
      s"expected a zero-task grouped manifest aggregate:\n$gPlan")
    val g = grouped.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(g == Map("hot" -> ((800L, 1L, 799L)), "cold" -> ((200L, 801L, 999L))),
      s"wrong grouped manifest aggregates: $g")
    // results stay right across a COW delete (stats follow the rewrite):
    // BETWEEN matches the 90 non-null ids in [1,99] (multiples of 10 are
    // NULL), so 910 rows remain and the smallest surviving id is 101
    spark.sql("DELETE FROM gdspec.lake.magg WHERE id BETWEEN 1 AND 99")
    val r2 = spark.sql(q).head()
    assert(r2.getLong(0) == 910L && r2.getLong(1) == 810L &&
      r2.getLong(3) == 101L && r2.getLong(4) == 999L,
      s"wrong post-delete manifest aggregates: $r2")
  }

  test("staged CTAS/RTAS: atomic create, atomic replace, failure leaves no trace") {
    // CTAS routes through stageCreate: no manifest exists until commit
    spark.sql("CREATE TABLE gdspec.lake.sct AS " +
      "SELECT id, id % 3 AS g FROM range(100)")
    assert(spark.table("gdspec.lake.sct").count() == 100L)
    // a FAILED CTAS leaves no table and no dir shell behind
    intercept[Exception](spark.sql("CREATE TABLE gdspec.lake.sctf AS " +
      "SELECT assert_true(id < 10) AS a, id FROM range(100)"))
    intercept[Exception](spark.table("gdspec.lake.sctf").count())
    assert(!new java.io.File(s"$warehouse/lake/sctf").exists(),
      "failed staged CTAS left a table dir behind")
    // RTAS: new schema lands atomically as the next version; the old
    // snapshot stays time-travelable
    spark.sql("REPLACE TABLE gdspec.lake.sct AS " +
      "SELECT concat('x', id) AS s FROM range(5)")
    val rows = spark.table("gdspec.lake.sct").collect().map(_.getString(0))
    assert(rows.toSet == (0 until 5).map(i => s"x$i").toSet)
    assert(spark.sql(
      "SELECT count(*) FROM gdspec.lake.sct VERSION AS OF 0").head()
      .getLong(0) == 100L, "pre-replace snapshot lost")
    // a FAILED RTAS leaves the current table fully intact
    intercept[Exception](spark.sql("REPLACE TABLE gdspec.lake.sct AS " +
      "SELECT assert_true(false) AS b FROM range(1)"))
    assert(spark.table("gdspec.lake.sct").count() == 5L,
      "failed staged replace damaged the serving table")
    assert(spark.table("gdspec.lake.sct").columns.toSeq == Seq("s"),
      "failed staged replace changed the schema")
    // partitioned staged CTAS keeps the hive layout
    spark.sql("CREATE TABLE gdspec.lake.sctp PARTITIONED BY (g) AS " +
      "SELECT id, IF(id % 2 = 0, 'e', 'o') AS g FROM range(20)")
    val dirs = new java.io.File(s"$warehouse/lake/sctp/data").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("g=e", "g=o"), s"unexpected layout: ${dirs.toSeq}")
    assert(spark.table("gdspec.lake.sctp").where("g = 'e'").count() == 10L)
  }

  test("CONVERT TO GDISK adopts existing parquet without rewriting data") {
    // stage a hive-partitioned parquet dir OUTSIDE the warehouse
    val src = java.nio.file.Files.createTempDirectory("cnv_src").toString
    spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v",
        "IF(id % 2 = 0, 'e', 'o') AS g")
      .write.partitionBy("g").parquet(s"$src/t")
    val g = new GraftSession(spark)
    val out = g.sql(s"CONVERT TO GDISK '$src/t' AS gdspec.lake.cnv").head()
    assert(out.getString(0) == "gdspec.lake.cnv")
    assert(out.getLong(2) == 100L, s"expected exact converted rows: $out")
    // the adopted table is a full citizen: partition-pruned reads, exact
    // manifest row counts, time travel from version 0
    assert(spark.table("gdspec.lake.cnv").count() == 100L)
    assert(spark.table("gdspec.lake.cnv").where("g = 'e'").count() == 50L)
    val stats = spark.table("gdspec.lake.cnv")
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(100)),
      s"converted table should carry exact numRows, got ${stats.rowCount}")
    // manifest-answered aggregate works on adopted footers
    val agg = spark.sql(
      "SELECT count(*), min(id), max(id) FROM gdspec.lake.cnv")
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val r = agg.head()
    assert(r.getLong(0) == 100L && r.getLong(1) == 0L && r.getLong(2) == 99L)
    // mutations land as new versions on the adopted manifest
    spark.sql("DELETE FROM gdspec.lake.cnv WHERE id < 10")
    assert(spark.table("gdspec.lake.cnv").count() == 90L)
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.cnv VERSION AS OF 0")
      .head().getLong(0) == 100L)
    // the source dir was consumed (files renamed, not copied)
    val left = new java.io.File(s"$src/t")
    def parquets(f: java.io.File): Int =
      if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
      else Option(f.listFiles()).toSeq.flatten.map(parquets).sum
    assert(parquets(left) == 0, "CONVERT should rename files, not copy")
  }

  test("DESCRIBE DETAIL serves the manifest inventory") {
    spark.sql("CREATE TABLE gdspec.lake.dd (id BIGINT, grp STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gdspec.lake.dd SELECT id, " +
      "IF(id % 2 = 0, 'a', 'b') FROM range(50)")
    val g = new GraftSession(spark)
    val d = g.sql("DESCRIBE DETAIL gdspec.lake.dd").head()
    assert(d.getString(0) == "parquet")
    assert(d.getLong(2) == 1L, s"expected version 1: $d") // create + insert
    assert(d.getLong(4) >= 1L, "file count")
    assert(d.getLong(5) > 0L, "byte size")
    assert(d.getLong(6) == 50L, s"exact row count: $d")
    assert(d.getSeq[String](7) == Seq("grp"))
    assert(d.isNullAt(8), "identity layout has no bucket count")
    // gmem tables route users to the right verb
    val e = intercept[Exception](g.sql("DESCRIBE DETAIL gmem.x.y"))
    assert(e.getMessage.contains("gdisk"))
  }

  test("DROP TABLE / RENAME TABLE / SHOW TABLES") {
    spark.sql("CREATE TABLE gdspec.lake.sh1 (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.sh1 VALUES (1)")
    spark.sql("ALTER TABLE gdspec.lake.sh1 RENAME TO lake.sh2")
    assert(spark.sql("SELECT id FROM gdspec.lake.sh2").head().getLong(0) == 1L)
    val shown = spark.sql("SHOW TABLES IN gdspec.lake").collect()
      .map(_.getString(1)).toSet
    assert(shown.contains("sh2") && !shown.contains("sh1"))
    spark.sql("DROP TABLE gdspec.lake.sh2")
    intercept[Exception](spark.table("gdspec.lake.sh2").count())
  }

  test("table_changes: versioned insert/delete feed off the manifest log") {
    spark.sql("CREATE TABLE gdspec.lake.cdc (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gdspec.lake.cdc SELECT id, 'a' FROM range(0, 50, 1, 1)")
    spark.sql("INSERT INTO gdspec.lake.cdc SELECT id, 'b' FROM range(50, 100, 1, 1)")
    val g = new GraftSession(spark)
    g.sql("OPTIMIZE gdspec.lake.cdc") // v3: pure reorganization, CDC-silent
    spark.sql("UPDATE gdspec.lake.cdc SET v = 'B' WHERE id >= 50") // v4: COW
    spark.sql("INSERT OVERWRITE gdspec.lake.cdc VALUES (999, 'z')") // v5
    val feed = g.sql("""SELECT _commit_version, _change_type, count(*) AS n
        FROM table_changes('gdspec.lake.cdc', 0, 5)
        GROUP BY _commit_version, _change_type
        ORDER BY _commit_version, _change_type""").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(feed == Seq(
      (1L, "insert", 50L), (2L, "insert", 50L),
      (4L, "delete", 100L), (4L, "insert", 100L),
      (5L, "delete", 100L), (5L, "insert", 1L)), feed.toString)
    // post-image values ride the feed: the COW insert carries the update
    val v4 = g.sql("""SELECT count(*) FROM
        table_changes('gdspec.lake.cdc', 4, 4)
        WHERE _change_type = 'insert' AND v = 'B'""").head().getLong(0)
    assert(v4 == 50L)
    // a metadata/reorganization-only span is empty, with the CDC schema
    val silent = g.sql("SELECT * FROM table_changes('gdspec.lake.cdc', 3, 3)")
    assert(silent.count() == 0)
    assert(silent.columns.contains("_change_type") &&
      silent.columns.contains("_commit_version"))
    // bounds and target validation
    intercept[Exception](
      g.sql("SELECT * FROM table_changes('gdspec.lake.cdc', 3, 99)"))
    intercept[Exception](
      g.sql("SELECT * FROM table_changes('nope.ns.t', 0, 1)"))
  }

  test("manifest stats skipping: files whose min/max exclude the filter are never planned") {
    spark.sql("CREATE TABLE gdspec.lake.sk (id BIGINT, name STRING)")
    for (i <- 0 until 4)
      spark.sql("INSERT INTO gdspec.lake.sk SELECT id, concat('n', id) " +
        s"FROM range(${i * 100}, ${i * 100 + 100}, 1, 1)")
    def planOf(sql: String) = {
      val df = spark.sql(sql)
      (df, df.queryExecution.executedPlan.toString)
    }
    // point lookup: the manifest's per-file min/max narrow the plan to
    // the ONE file that can hold the row — the others are never listed
    val (df1, p1) = planOf("SELECT name FROM gdspec.lake.sk WHERE id = 250")
    assert(p1.contains("statsFiles=1/4"), p1)
    assert(df1.head().getString(0) == "n250")
    // provably-empty predicate: zero files planned, no storage touched
    val (df0, p0) = planOf("SELECT * FROM gdspec.lake.sk WHERE id > 5000")
    assert(p0.contains("statsFiles=0/4"), p0)
    assert(df0.count() == 0)
    // range straddling two files
    val (df2, p2) = planOf(
      "SELECT count(*) FROM gdspec.lake.sk WHERE id BETWEEN 150 AND 250")
    assert(p2.contains("statsFiles=2/4"), p2)
    assert(df2.head().getLong(0) == 101L)
    // string bounds participate (UTF8 byte order, same as Spark's)
    val (dfs, ps) = planOf("SELECT * FROM gdspec.lake.sk WHERE name = 'zzz'")
    assert(ps.contains("statsFiles=0/4"), ps)
    assert(dfs.count() == 0)
    // null-count stats: a column with zero recorded nulls skips IS NULL
    val (dfn, pn) = planOf("SELECT * FROM gdspec.lake.sk WHERE name IS NULL")
    assert(pn.contains("statsFiles=0/4"), pn)
    assert(dfn.count() == 0)
    // IN lists skip by membership against the range
    val (dfi, pi) = planOf(
      "SELECT count(*) FROM gdspec.lake.sk WHERE id IN (10, 20)")
    assert(pi.contains("statsFiles=1/4"), pi)
    assert(dfi.head().getLong(0) == 2L)
    // LIKE 'prefix%' compiles to StartsWith and skips by prefix range
    val (dfl, pl) = planOf(
      "SELECT count(*) FROM gdspec.lake.sk WHERE name LIKE 'zz%'")
    assert(pl.contains("statsFiles=0/4"), pl)
    assert(dfl.head().getLong(0) == 0L)
    // stats live in the manifest: a FRESH table load still skips
    spark.catalog.clearCache()
    val (_, pf) = planOf("SELECT name FROM gdspec.lake.sk WHERE id = 50")
    assert(pf.contains("statsFiles=1/4"), pf)
  }

  test("stats skipping is version-consistent under time travel and COW") {
    spark.sql("CREATE TABLE gdspec.lake.skv (id BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO gdspec.lake.skv SELECT id, 'a' FROM range(0, 100, 1, 1)")
    spark.sql(
      "INSERT INTO gdspec.lake.skv SELECT id, 'b' FROM range(100, 200, 1, 1)")
    // COW rewrite: UPDATE moves a row's value; new file's stats replace
    // the old file's in the manifest
    spark.sql("UPDATE gdspec.lake.skv SET v = 'hit' WHERE id = 150")
    val df = spark.sql("SELECT v FROM gdspec.lake.skv WHERE id = 150")
    assert(df.queryExecution.executedPlan.toString.contains("statsFiles=1/2"),
      df.queryExecution.executedPlan.toString)
    assert(df.head().getString(0) == "hit")
    assert(spark.table("gdspec.lake.skv").count() == 200)
    // the pre-update version still reads (and skips) from ITS manifest
    val tt = spark.sql(
      "SELECT v FROM gdspec.lake.skv VERSION AS OF 2 WHERE id = 150")
    assert(tt.head().getString(0) == "b")
  }

  test("OPTIMIZE ZORDER BY clusters files so single-column predicates skip") {
    spark.sql("CREATE TABLE gdspec.lake.zo (x BIGINT, y BIGINT, v BIGINT)")
    // each ingest file spans nearly the FULL x and y ranges (hash-shuffled
    // y): before clustering, a y-filter can skip nothing
    for (i <- 0 until 4)
      spark.sql("INSERT INTO gdspec.lake.zo " +
        "SELECT id % 64, pmod(hash(id), 64), id " +
        s"FROM range(${i * 1024}, ${(i + 1) * 1024}, 1, 1)")
    val pre = spark.sql("SELECT count(*) FROM gdspec.lake.zo WHERE y < 16")
    assert(pre.queryExecution.executedPlan.toString.contains("statsFiles=4/4"),
      pre.queryExecution.executedPlan.toString)
    val expected = pre.head().getLong(0)
    val g = new GraftSession(spark)
    val r = g.sql(
      "OPTIMIZE gdspec.lake.zo ZORDER BY (x, y) TARGET 2048 BYTES").head()
    val filesAfter = r.getLong(2)
    assert(filesAfter >= 8, r.toString)
    // clustered layout: a y-only box predicate (quarter of y space) now
    // plans a strict subset — z-contiguous files cover tight y ranges
    val post = spark.sql("SELECT count(*) FROM gdspec.lake.zo WHERE y < 16")
    val plan = post.queryExecution.executedPlan.toString
    val m = """statsFiles=(\d+)/(\d+)""".r.findFirstMatchIn(plan)
      .getOrElse(fail(s"no statsFiles in $plan"))
    assert(m.group(2).toLong == filesAfter, plan)
    assert(m.group(1).toLong <= filesAfter / 2,
      s"zorder should let y<16 skip at least half the files: $plan")
    assert(post.head().getLong(0) == expected)
    // x predicates benefit from the same layout (that's the point of z)
    val px = spark.sql("SELECT count(*) FROM gdspec.lake.zo WHERE x < 16")
    val mx = """statsFiles=(\d+)/(\d+)""".r
      .findFirstMatchIn(px.queryExecution.executedPlan.toString).get
    assert(mx.group(1).toLong <= filesAfter / 2,
      px.queryExecution.executedPlan.toString)
    assert(px.head().getLong(0) ==
      spark.table("gdspec.lake.zo").where("x < 16").collect().length.toLong)
    // full-table integrity through the clustering rewrite
    assert(spark.sql("SELECT sum(v) FROM gdspec.lake.zo").head().getLong(0) ==
      (0L until 4096L).sum)
    intercept[Exception](
      g.sql("OPTIMIZE gdspec.lake.zo ZORDER BY (nope)"))
    // declared clustering: plain OPTIMIZE picks up the zorder property,
    // so the standing maintenance job keeps the layout without repeating
    // the keys
    spark.sql(
      "ALTER TABLE gdspec.lake.zo SET TBLPROPERTIES ('zorder'='x,y')")
    g.sql("OPTIMIZE gdspec.lake.zo TARGET 2048 BYTES")
    val pprop = spark.sql("SELECT count(*) FROM gdspec.lake.zo WHERE y < 16")
    val mp = """statsFiles=(\d+)/(\d+)""".r
      .findFirstMatchIn(pprop.queryExecution.executedPlan.toString).get
    assert(mp.group(1).toLong <= mp.group(2).toLong / 2,
      pprop.queryExecution.executedPlan.toString)
    assert(pprop.head().getLong(0) == expected)
  }

  test("bloom skipping: point lookups on an unsorted column skip files min/max cannot") {
    spark.sql("CREATE TABLE gdspec.lake.bl (id BIGINT, name STRING) " +
      "TBLPROPERTIES ('bloom.columns'='id,name', 'bloom.expectedItems'='1000')")
    // 4 files of INTERLEAVED ids (file i holds {8k+i}): every file's
    // [min,max] spans nearly the whole domain, so min/max skipping is
    // structurally blind here — only the blooms can prune
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO gdspec.lake.bl SELECT id * 8 + $i, " +
        s"concat('n', id * 8 + $i) FROM range(0, 100, 1, 1)")
    def planOf(sql: String) = {
      val df = spark.sql(sql)
      (df, df.queryExecution.executedPlan.toString)
    }
    // present value: in every file's min/max range, in exactly one bloom
    val (df1, p1) = planOf("SELECT name FROM gdspec.lake.bl WHERE id = 402")
    assert(p1.contains("statsFiles=1/4"), p1)
    assert(df1.head().getString(0) == "n402")
    // absent-but-in-range value (404 % 8 = 4; no file writes that class):
    // min/max keeps all four files, the blooms drop all four
    val (df0, p0) = planOf("SELECT * FROM gdspec.lake.bl WHERE id = 404")
    assert(p0.contains("statsFiles=0/4"), p0)
    assert(df0.count() == 0)
    // IN lists union their membership
    val (dfi, pi) = planOf(
      "SELECT count(*) FROM gdspec.lake.bl WHERE id IN (401, 402)")
    assert(pi.contains("statsFiles=2/4"), pi)
    assert(dfi.head().getLong(0) == 2L)
    // string blooms: every file's name range covers 'n402' lexically
    val (dfs, ps) = planOf(
      "SELECT id FROM gdspec.lake.bl WHERE name = 'n402'")
    assert(ps.contains("statsFiles=1/4"), ps)
    assert(dfs.head().getLong(0) == 402L)
    // correctness under skipping: full scan agrees
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.bl").head().getLong(0) == 400L)
  }

  test("bloom index: late ALTER keeps unindexed files; OPTIMIZE rebuilds; VACUUM sweeps") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.bl2 (id BIGINT)")
    // file A written BEFORE the index exists — no sidecar, never skipped
    spark.sql("INSERT INTO gdspec.lake.bl2 SELECT id * 8 FROM range(0, 100, 1, 1)")
    spark.sql("ALTER TABLE gdspec.lake.bl2 SET TBLPROPERTIES " +
      "('bloom.columns'='id', 'bloom.expectedItems'='1000')")
    spark.sql("INSERT INTO gdspec.lake.bl2 SELECT id * 8 + 1 FROM range(0, 100, 1, 1)")
    def planOf(sql: String) = {
      val df = spark.sql(sql)
      (df, df.queryExecution.executedPlan.toString)
    }
    // value only in A: A survives (missing sidecar = keep), B's bloom
    // proves absence — exactly one file planned
    val (dfa, pa) = planOf("SELECT count(*) FROM gdspec.lake.bl2 WHERE id = 400")
    assert(pa.contains("statsFiles=1/2"), pa)
    assert(dfa.head().getLong(0) == 1L)
    // OPTIMIZE (bin-pack rewrite — the compacted file spans the whole
    // domain) rebuilds sidecars in one distributed job: an
    // absent-in-range value now skips EVERY file even though the
    // unindexed pre-ALTER file was folded in and min/max proves nothing
    g.sql("OPTIMIZE gdspec.lake.bl2 TARGET 1048576 BYTES")
    val (dfo, po) = planOf("SELECT count(*) FROM gdspec.lake.bl2 WHERE id = 4")
    val mo = """statsFiles=(\d+)/(\d+)""".r.findFirstMatchIn(po).get
    assert(mo.group(1).toInt == 0 && mo.group(2).toInt >= 1, po)
    assert(dfo.head().getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.bl2").head().getLong(0) == 200L)
    // VACUUM deletes the sidecars of the files it removes, keeps the live ones
    g.sql("VACUUM gdspec.lake.bl2 RETAIN 1 VERSIONS")
    val live = spark.sql("SELECT count(*) FROM gdspec.lake.bl2").head().getLong(0)
    assert(live == 200L)
    val bloomDir = new java.io.File(s"$warehouse/lake/bl2/data/_bloom")
    val dataDir = new java.io.File(s"$warehouse/lake/bl2/data")
    val liveRels = dataDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getName).toSet
    val sidecarRels = bloomDir.listFiles()
      .filter(_.getName.endsWith(".bloom")) // (skip local-FS .crc siblings)
      .map(f => graft.sources.DiskBloom.relOfSidecar(f.getName).get).toSet
    assert(sidecarRels == liveRels,
      s"sidecars $sidecarRels vs live files $liveRels")
    // and the survivors still skip
    val (dfv, pv) = planOf("SELECT count(*) FROM gdspec.lake.bl2 WHERE id = 4")
    val mv2 = """statsFiles=(\d+)/(\d+)""".r.findFirstMatchIn(pv).get
    assert(mv2.group(1).toInt == 0, pv)
    assert(dfv.head().getLong(0) == 0L)
  }

  test("OPTIMIZE backfills bloom sidecars for pre-index files without rewriting") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.bf (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.bf SELECT id * 8 FROM range(0, 100, 1, 1)")
    spark.sql("ALTER TABLE gdspec.lake.bf SET TBLPROPERTIES " +
      "('bloom.columns'='id', 'bloom.expectedItems'='1000')")
    def kept(): (Int, Int) = {
      val p = spark.sql("SELECT count(*) FROM gdspec.lake.bf WHERE id = 4")
        .queryExecution.executedPlan.toString
      val m = """statsFiles=(\d+)/(\d+)""".r.findFirstMatchIn(p).get
      (m.group(1).toInt, m.group(2).toInt)
    }
    // pre-backfill: no sidecar → the (absent-value) probe keeps the file
    assert(kept() == ((1, 1)))
    // single-file table: OPTIMIZE is a compaction NO-OP (same version,
    // same bytes) but backfills the missing sidecars
    val vBefore = spark.sql("SELECT count(*) FROM gdspec.lake.bf").count()
    val r = g.sql("OPTIMIZE gdspec.lake.bf").head()
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(kept() == ((0, 1)), "backfilled bloom must now skip the file")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.bf WHERE id = 80")
      .head().getLong(0) == 1L)
    val _ = vBefore
  }

  test("metadata-only DELETE: provable predicates drop files with zero file I/O") {
    def files(t: String): Set[String] = {
      val d = new java.io.File(s"$warehouse/lake/$t/data")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(d).filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSet
    }
    def delete(sql: String): String =
      spark.sql(sql).queryExecution.executedPlan.toString
    // identity-partitioned: DELETE on the partition column is pure
    // manifest work — the executed plan is the bare metadata
    // DeleteFromTable, no ReplaceData rewrite, and NO new file is written
    spark.sql("CREATE TABLE gdspec.lake.md (id BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    for (d <- Seq("d1", "d2", "d3"))
      spark.sql(s"INSERT INTO gdspec.lake.md SELECT id, '$d' FROM range(0, 50, 1, 1)")
    val before = files("md")
    val p1 = delete("DELETE FROM gdspec.lake.md WHERE day = 'd2'")
    assert(p1.contains("DeleteFromTable") && !p1.contains("ReplaceData"), p1)
    assert(files("md") == before, "metadata delete writes nothing")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.md").head().getLong(0) == 100L)
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.md WHERE day = 'd2'")
      .head().getLong(0) == 0L)

    // data-column range provable from manifest min/max (clustered ingests)
    spark.sql("CREATE TABLE gdspec.lake.md2 (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.md2 SELECT id FROM range(0, 100, 1, 1)")
    spark.sql("INSERT INTO gdspec.lake.md2 SELECT id FROM range(100, 200, 1, 1)")
    val b2 = files("md2")
    val p2 = delete("DELETE FROM gdspec.lake.md2 WHERE id < 100")
    assert(p2.contains("DeleteFromTable") && !p2.contains("ReplaceData"), p2)
    assert(files("md2") == b2)
    assert(spark.sql("SELECT min(id), count(*) FROM gdspec.lake.md2").head()
      .toSeq == Seq(100L, 100L))

    // a straddling predicate falls back to copy-on-write: ReplaceData
    // executes and the touched file is rewritten (a new file appears)
    val p3 = delete("DELETE FROM gdspec.lake.md2 WHERE id % 2 = 0")
    assert(p3.contains("ReplaceData"), p3)
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.md2").head().getLong(0) == 50L)
    assert((files("md2") -- b2).nonEmpty,
      "COW fallback rewrites the touched file")

    // NULLs block the all-match proof: a NULL-valued condition KEEPS its
    // row, so the file must go through COW, never a metadata drop
    spark.sql("CREATE TABLE gdspec.lake.md3 (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.md3 VALUES (150), (NULL)")
    spark.sql("DELETE FROM gdspec.lake.md3 WHERE id >= 120")
    val left = spark.sql("SELECT id FROM gdspec.lake.md3").collect()
    assert(left.length == 1 && left(0).isNullAt(0),
      "the NULL row survives a range delete")

    // time travel still serves the pre-delete snapshot of md
    val v = spark.sql("SELECT count(*) FROM gdspec.lake.md VERSION AS OF 3")
      .head().getLong(0)
    assert(v == 150L)
    // and the CDC feed records the dropped partition as deletes
    val ch = new GraftSession(spark).sql(
      "SELECT count(*) FROM table_changes('gdspec.lake.md', 4, 4) " +
        "WHERE _change_type = 'delete'").head().getLong(0)
    assert(ch == 50L)
  }

  test("streaming source admission control: maxFilesPerTrigger bounds each micro-batch") {
    spark.sql("CREATE TABLE gdspec.lake.rl (id BIGINT)")
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO gdspec.lake.rl SELECT id FROM range(${i * 10}, ${i * 10 + 10}, 1, 1)")
    def run(opts: Map[String, String]): Seq[Long] = {
      val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
      var r = spark.readStream
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.table("gdspec.lake.rl").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count(); if (n > 0) sizes.synchronized { sizes += n }; ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      sizes.toSeq
    }
    // capped: one 10-row version per micro-batch, four batches
    val capped = run(Map("maxFilesPerTrigger" -> "1"))
    assert(capped.length == 4 && capped.forall(_ == 10L), capped.toString)
    // uncapped: the backlog lands in one batch
    val all = run(Map.empty)
    assert(all == Seq(40L), all.toString)

    // BYTE-based admission: the same backlog under a budget of one
    // file's recorded size admits one version per micro-batch — the
    // file-count limit is blind to fat files, this one is not
    val cat = graft.sources.GraftDiskCatalog.instance("gdspec").get
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("lake"), "rl"))
      .asInstanceOf[graft.sources.GraftDiskTable]
    val m = t.log.read(t.log.latestVersion())
    val oneFile = m.added.map(f => m.sizes(f)).max
    val byBytes = run(Map("maxBytesPerTrigger" -> oneFile.toString))
    assert(byBytes.length == 4 && byBytes.forall(_ == 10L), byBytes.toString)
    // a budget covering two versions halves the batch count
    val byTwo = run(Map("maxBytesPerTrigger" -> (oneFile * 2 + 16).toString))
    assert(byTwo.length == 2 && byTwo.forall(_ == 20L), byTwo.toString)
    // composed with the file cap, the tighter budget (files) wins
    val both = run(Map("maxBytesPerTrigger" -> (oneFile * 2 + 16).toString,
      "maxFilesPerTrigger" -> "1"))
    assert(both.length == 4 && both.forall(_ == 10L), both.toString)
  }

  test("ANALYZE histograms: skewed-predicate estimates follow the data, not uniformity") {
    spark.sql("CREATE TABLE gdspec.lake.hist (k BIGINT, v BIGINT)")
    // 90% of rows carry the hot key v=1; the tail spreads over ~1000
    // distinct values — the shape where uniform selectivity (rows/ndv)
    // is off by ~900×
    spark.sql("INSERT INTO gdspec.lake.hist SELECT id, " +
      "CASE WHEN id < 9000 THEN 1 ELSE id - 8997 END " +
      "FROM range(0, 10000, 1, 4)")
    val g = new GraftSession(spark)
    g.sql("ANALYZE TABLE gdspec.lake.hist COMPUTE APPROXIMATE STATISTICS")
    // the histogram landed in the manifest: 16 equi-height bins
    val cat = graft.sources.GraftDiskCatalog.instance("gdspec").get
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("lake"), "hist"))
      .asInstanceOf[graft.sources.GraftDiskTable]
    val vh = t.liveAnalyzeStats("v").hist
      .getOrElse(fail("ANALYZE recorded no histogram for v"))
    assert(vh.bins.length == 16 && vh.height > 0)
    // most bins sit on the hot key: [1, 1]
    assert(vh.bins.count(b => b.lo == 1.0 && b.hi == 1.0) >= 8)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def estimate(pred: String): BigInt =
        spark.sql(s"SELECT * FROM gdspec.lake.hist WHERE $pred")
          .queryExecution.optimizedPlan.stats.rowCount
          .getOrElse(fail(s"no CBO row estimate for $pred"))
      // hot key: true 9000; uniform assumption would say ~10000/ndv ≈ 10
      val hot = estimate("v = 1")
      assert(hot >= 4500 && hot <= 18000,
        s"hot-key estimate $hot should be within 2x of the true 9000")
      // tail key: true ≈ 1; the histogram keeps it small, never ~9000
      val tail = estimate("v = 900")
      assert(tail <= 700, s"tail-key estimate $tail should stay small")

      // DATE columns histogram too (epoch-day domain): the 90%-hot
      // ingest-date shape every event table has
      spark.sql("CREATE TABLE gdspec.lake.hist2 (d DATE)")
      spark.sql("INSERT INTO gdspec.lake.hist2 SELECT " +
        "CASE WHEN id < 9000 THEN DATE'2024-01-01' " +
        "ELSE date_add(DATE'2024-01-02', CAST(id % 365 AS INT)) END " +
        "FROM range(0, 10000, 1, 4)")
      g.sql("ANALYZE TABLE gdspec.lake.hist2 COMPUTE APPROXIMATE STATISTICS")
      val hotDate = spark
        .sql("SELECT * FROM gdspec.lake.hist2 WHERE d = DATE'2024-01-01'")
        .queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("no CBO row estimate for the date predicate"))
      assert(hotDate >= 4500 && hotDate <= 18000,
        s"hot-date estimate $hotDate should be within 2x of the true 9000")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("RESTORE TABLE: a prior version re-serves as a new metadata-only commit") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.rs (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.rs SELECT id FROM range(0, 10, 1, 1)")
    spark.sql("INSERT INTO gdspec.lake.rs SELECT id FROM range(10, 20, 1, 1)")
    spark.sql("DELETE FROM gdspec.lake.rs WHERE id < 10") // v3
    assert(spark.table("gdspec.lake.rs").count() == 10L)
    def parquetFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$warehouse/lake/rs/data"))
        .count(_.getName.endsWith(".parquet"))
    }
    val filesBefore = parquetFiles()
    val r = g.sql("RESTORE TABLE gdspec.lake.rs TO VERSION AS OF 2").head()
    assert(r.getLong(2) == 4L, r.toString)
    // the restore re-serves v2's 20 rows, wrote NO data file, and the
    // deleted-at-v3 state is still time-travelable (append-only history)
    assert(spark.table("gdspec.lake.rs").count() == 20L)
    assert(parquetFiles() == filesBefore)
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.rs VERSION AS OF 3")
      .head().getLong(0) == 10L)
    // the CDC feed shows the restore re-inserting the dropped rows
    val ch = g.sql("SELECT count(*) FROM table_changes('gdspec.lake.rs', 4, 4) " +
      "WHERE _change_type = 'insert'").head().getLong(0)
    assert(ch == 10L)
    // restore to the empty birth version, then back again — restorable
    g.sql("RESTORE gdspec.lake.rs VERSION AS OF 0")
    assert(spark.table("gdspec.lake.rs").count() == 0L)
    g.sql("RESTORE gdspec.lake.rs VERSION AS OF 4")
    assert(spark.table("gdspec.lake.rs").count() == 20L)
    intercept[Exception](g.sql("RESTORE gdspec.lake.rs VERSION AS OF 99"))
    // front-door tier: same verb, ROLLBACK commit semantics
    g.sql("DROP TABLE IF EXISTS fd_rs")
    g.sql("CREATE TABLE fd_rs (id INT)")
    g.sql("INSERT INTO fd_rs VALUES (1), (2)")
    g.sql("INSERT INTO fd_rs VALUES (3)")
    g.sql("RESTORE TABLE fd_rs TO VERSION AS OF 1")
    assert(g.sql("SELECT count(*) FROM fd_rs").head().getLong(0) == 2L)
    // gmem tier: snapshot re-serve within the retention horizon
    spark.conf.set("spark.sql.catalog.gmrs",
      classOf[graft.sources.GraftMemCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmrs.ns")
    spark.sql("CREATE TABLE gmrs.ns.t (id BIGINT)")
    spark.sql("INSERT INTO gmrs.ns.t VALUES (1), (2)")
    spark.sql("INSERT INTO gmrs.ns.t VALUES (3)")
    g.sql("RESTORE TABLE gmrs.ns.t TO VERSION AS OF 1")
    assert(spark.table("gmrs.ns.t").count() == 2L)
    // the pre-restore state stays reachable: history is append-only
    assert(spark.sql("SELECT count(*) FROM gmrs.ns.t VERSION AS OF 2")
      .head().getLong(0) == 3L)
  }

  test("clustered ingest: declared zorder orders every write, min/max skip from birth") {
    // one multi-partition INSERT of SHUFFLED ids: without the ordered
    // write distribution every output file would span the whole domain;
    // with it, Spark range-partitions the write and the very first
    // ingest's files carry disjoint min/max ranges
    spark.sql("CREATE TABLE gdspec.lake.ci (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('zorder'='id')")
    // AQE would (correctly) coalesce this tiny range shuffle to one
    // partition — disable it so the multi-file layout is observable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      spark.sql("INSERT INTO gdspec.lake.ci " +
        "SELECT (id * 2654435761) % 4096 AS id, id AS v FROM range(0, 4096, 1, 8)")
    val df = spark.sql(
      "SELECT count(*) FROM gdspec.lake.ci WHERE id BETWEEN 100 AND 200")
    val m = """statsFiles=(\d+)/(\d+)""".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString).get
    assert(m.group(2).toInt > 1, "the write must produce multiple files")
    assert(m.group(1).toInt < m.group(2).toInt,
      s"first-ingest files must already skip: ${m.group(1)}/${m.group(2)}")
    val expected = spark.sql(
      "SELECT count(*) FROM (SELECT (id * 2654435761) % 4096 AS id " +
        "FROM range(0, 4096)) WHERE id BETWEEN 100 AND 200").head().getLong(0)
    assert(df.head().getLong(0) == expected)
      // the CTAS path gets the same contract
      spark.sql("CREATE TABLE gdspec.lake.ci2 TBLPROPERTIES ('zorder'='id') " +
        "AS SELECT (id * 40503) % 4096 AS id FROM range(0, 4096, 1, 8)")
      val df2 = spark.sql(
        "SELECT count(*) FROM gdspec.lake.ci2 WHERE id BETWEEN 100 AND 200")
      val m2 = """statsFiles=(\d+)/(\d+)""".r
        .findFirstMatchIn(df2.queryExecution.executedPlan.toString).get
      assert(m2.group(2).toInt > 1 && m2.group(1).toInt < m2.group(2).toInt,
        df2.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // ---- partition TRANSFORMS (days/months/years/hours/truncate) --------

  private def statsFilesOf(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val m = """statsFiles=(\d+)/(\d+)""".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      .getOrElse(fail("no statsFiles in plan:\n" +
        df.queryExecution.executedPlan.toString))
    (m.group(1).toInt, m.group(2).toInt)
  }

  private def dataDirs(t: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new java.io.File(s"$warehouse/lake/$t/data")
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(_.getParentFile.getName).toSet
  }

  test("days(ts) layout: transform dirs, columns stay in files, range pruning") {
    spark.sql("CREATE TABLE gdspec.lake.tp (id BIGINT, ts TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    // three days plus one NULL-ts row, several inserts so days span files
    spark.sql("INSERT INTO gdspec.lake.tp SELECT id, " +
      "timestamp'2024-03-01 06:00:00' + make_interval(0,0,0,CAST(id/4 AS INT),CAST(id AS INT),0,0), id * 10 " +
      "FROM range(12)")
    spark.sql("INSERT INTO gdspec.lake.tp VALUES (99, NULL, 990)")
    // dirs are `ts_day=YYYY-MM-DD` (plus the null dir); never inferred
    val dirs = dataDirs("tp")
    assert(dirs.contains("ts_day=2024-03-01") && dirs.contains("ts_day=2024-03-02"),
      s"unexpected dirs: $dirs")
    assert(dirs.contains("ts_day=__HIVE_DEFAULT_PARTITION__"), s"dirs: $dirs")
    // the ts column stays IN the data files (the transform is lossy)
    val oneFile = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$warehouse/lake/tp/data"))
        .find(f => f.getName.endsWith(".parquet") &&
          f.getParentFile.getName == "ts_day=2024-03-01").get
    }
    assert(spark.read.parquet(oneFile.getAbsolutePath)
      .columns.toSet == Set("id", "ts", "v"))
    // full scan is exact
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.tp").head().getLong(0) == 13L)
    // RANGE predicate on ts prunes whole day dirs (monotonic transform)
    val dfR = spark.sql("SELECT id, v FROM gdspec.lake.tp " +
      "WHERE ts >= timestamp'2024-03-03 00:00:00' ORDER BY id")
    val (keptR, totalR) = statsFilesOf(dfR)
    assert(keptR < totalR, s"no day-range pruning: $keptR/$totalR")
    assert(dfR.collect().map(_.getLong(0)).toSeq == Seq(8L, 9L, 10L, 11L))
    // point predicate prunes to one day dir
    val dfE = spark.sql("SELECT id FROM gdspec.lake.tp " +
      "WHERE ts = timestamp'2024-03-01 06:00:00'")
    val (keptE, totalE) = statsFilesOf(dfE)
    assert(keptE < totalE && dfE.collect().map(_.getLong(0)).toSeq == Seq(0L))
    // IS NULL keeps only the null dir; comparisons drop it
    val dfN = spark.sql("SELECT id FROM gdspec.lake.tp WHERE ts IS NULL")
    val (keptN, totalN) = statsFilesOf(dfN)
    assert(keptN < totalN && dfN.collect().map(_.getLong(0)).toSeq == Seq(99L))
    // BETWEEN combines both bounds
    val dfB = spark.sql("SELECT count(*) FROM gdspec.lake.tp WHERE ts BETWEEN " +
      "timestamp'2024-03-02 00:00:00' AND timestamp'2024-03-02 23:59:59'")
    assert(dfB.head().getLong(0) == 4L)
  }

  test("identity + months(ts) mixed spec prunes on both segments") {
    spark.sql("CREATE TABLE gdspec.lake.tpm (region STRING, ts TIMESTAMP, " +
      "amt BIGINT) PARTITIONED BY (region, months(ts))")
    spark.sql("INSERT INTO gdspec.lake.tpm SELECT " +
      "IF(id % 2 = 0, 'EU', 'US'), " +
      "timestamp'2024-01-15 00:00:00' + make_interval(0, CAST(id % 4 AS INT)), id " +
      "FROM range(40)")
    val dirs = dataDirs("tpm")
    assert(dirs.contains("ts_month=2024-01"), s"dirs: $dirs")
    // identity segment appears as plain hive `region=`; month range prunes
    val df = spark.sql("SELECT count(*), sum(amt) FROM gdspec.lake.tpm " +
      "WHERE region = 'EU' AND ts >= timestamp'2024-03-01 00:00:00'")
    val (kept, total) = statsFilesOf(df)
    assert(kept < total, s"no mixed pruning: $kept/$total")
    // oracle: even ids (EU) with id % 4 in (2, 3) -> months Mar/Apr
    val exp = (0 until 40).filter(i => i % 2 == 0 && i % 4 >= 2)
    assert(df.head().toSeq == Seq(exp.size.toLong, exp.map(_.toLong).sum))
  }

  test("truncate(w, col) prunes string prefixes and integral ranges") {
    spark.sql("CREATE TABLE gdspec.lake.tpt (url STRING, n BIGINT) " +
      "PARTITIONED BY (truncate(4, url))")
    spark.sql("INSERT INTO gdspec.lake.tpt VALUES " +
      "('http://a.com', 1), ('http://b.com', 2), ('ftp://c.org', 3), ('s3://d', 4)")
    val dirs = dataDirs("tpt")
    assert(dirs.contains("url_trunc=http") && dirs.contains("url_trunc=ftp%3A"),
      s"dirs: $dirs")
    val df = spark.sql("SELECT n FROM gdspec.lake.tpt WHERE url = 'ftp://c.org'")
    val (kept, total) = statsFilesOf(df)
    assert(kept < total && df.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // integral truncate: floor-to-width buckets prune range predicates
    spark.sql("CREATE TABLE gdspec.lake.tpi (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (truncate(100, k))")
    spark.sql("INSERT INTO gdspec.lake.tpi SELECT id * 7, id FROM range(100)")
    val dfI = spark.sql("SELECT count(*) FROM gdspec.lake.tpi WHERE k >= 600")
    val (keptI, totalI) = statsFilesOf(dfI)
    assert(keptI < totalI, s"no integral truncate pruning: $keptI/$totalI")
    assert(dfI.head().getLong(0) == (0 until 100).count(_ * 7 >= 600).toLong)
  }

  test("transform tables: COW row-level ops, OPTIMIZE keeps the layout, dynamic overwrite replaces days") {
    spark.sql("CREATE TABLE gdspec.lake.tpo (id BIGINT, ts TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    for (b <- 0 until 3)
      spark.sql(s"INSERT INTO gdspec.lake.tpo SELECT id + ${b * 10}, " +
        "timestamp'2024-05-01 12:00:00' + make_interval(0,0,0,CAST(id % 2 AS INT)), " +
        s"id FROM range(10)")
    // COW UPDATE only rewrites touched day files; values stay exact
    spark.sql("UPDATE gdspec.lake.tpo SET v = v + 1000 " +
      "WHERE ts = timestamp'2024-05-02 12:00:00' AND id < 2")
    val upd = spark.sql("SELECT count(*) FROM gdspec.lake.tpo WHERE v >= 1000")
      .head().getLong(0)
    assert(upd == 1L) // id=1 is the only id<2 row on day 2
    // more small appends (4 input partitions each → several files per day)
    for (b <- 3 until 5)
      spark.sql(s"INSERT INTO gdspec.lake.tpo SELECT id + ${b * 10}, " +
        "timestamp'2024-05-01 12:00:00' + make_interval(0,0,0,CAST(id % 2 AS INT)), " +
        s"id FROM range(0, 10, 1, 4)")
    val sumsBefore =
      spark.sql("SELECT count(*), sum(v) FROM gdspec.lake.tpo").head().toSeq
    // OPTIMIZE compacts into the SAME ts_day= layout
    val cat = spark.sessionState.catalogManager.catalog("gdspec")
      .asInstanceOf[GraftDiskCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("lake"), "tpo")).asInstanceOf[GraftDiskTable]
    val (beforeN, afterN) = t.optimize(targetFileBytes = 512L * 1024 * 1024)
    assert(afterN < beforeN, s"no compaction: $beforeN -> $afterN")
    val dirs = dataDirs("tpo")
    assert(dirs.forall(d => d.startsWith("ts_day=")), s"layout lost: $dirs")
    assert(spark.sql("SELECT count(*), sum(v) FROM gdspec.lake.tpo")
      .head().toSeq == sumsBefore)
    // pruning still works over the compacted files
    val dfP = spark.sql("SELECT count(*) FROM gdspec.lake.tpo " +
      "WHERE ts < timestamp'2024-05-02 00:00:00'")
    val (keptP, totalP) = statsFilesOf(dfP)
    assert(keptP < totalP && dfP.head().getLong(0) == 25L)
    // DYNAMIC overwrite replaces exactly the day the new rows land in
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      spark.sql("INSERT OVERWRITE gdspec.lake.tpo SELECT 777, " +
        "timestamp'2024-05-02 01:00:00', 7")
    finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    val after = spark.sql("SELECT count(*) FROM gdspec.lake.tpo").head().getLong(0)
    assert(after == 26L, s"day 2 replaced by 1 row, day 1 untouched: $after")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.tpo " +
      "WHERE ts < timestamp'2024-05-02 00:00:00'").head().getLong(0) == 25L)
  }

  test("transform tables: retention DELETE of old days is metadata-only via file stats") {
    spark.sql("CREATE TABLE gdspec.lake.tpd (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    for (d <- 1 to 3)
      spark.sql(s"INSERT INTO gdspec.lake.tpd SELECT id, " +
        s"timestamp'2024-06-0$d 08:00:00' FROM range(20)")
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$warehouse/lake/tpd/data"))
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSet
    }
    val before = files()
    // every file is day-pure, so footer min/max prove all-match: the
    // whole retention delete is ONE manifest commit, zero file I/O
    val plan = spark.sql("DELETE FROM gdspec.lake.tpd " +
      "WHERE ts < timestamp'2024-06-02 00:00:00'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("DeleteFromTable") && !plan.contains("ReplaceData"), plan)
    assert(files() == before, "metadata delete writes nothing")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.tpd").head().getLong(0) == 40L)
  }

  // ---- `.changes` metadata table: batch + streaming CDC ---------------

  test(".changes metadata table serves the CDC feed as batch SQL") {
    spark.sql("CREATE TABLE gdspec.lake.cdb (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.cdb VALUES (1, 10), (2, 20)") // v1
    spark.sql("INSERT INTO gdspec.lake.cdb VALUES (3, 30)")          // v2
    spark.sql("UPDATE gdspec.lake.cdb SET v = 99 WHERE id = 3")      // v3 COW
    val rows = spark.sql(
      "SELECT _change_type, _commit_version, id, v " +
        "FROM gdspec.lake.cdb.changes ORDER BY _commit_version, _change_type, id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rows == Seq(
      ("insert", 1L, 1L, 10L), ("insert", 1L, 2L, 20L),
      ("insert", 2L, 3L, 30L),
      // the COW UPDATE: pre-image delete + post-image insert
      ("delete", 3L, 3L, 30L), ("insert", 3L, 3L, 99L)), rows.toString)
    // startingVersion narrows the window (DataFrameReader options)
    val fromV3 = spark.read.option("startingVersion", "3")
      .table("gdspec.lake.cdb.changes")
      .select("_commit_version").collect().map(_.getLong(0)).toSet
    assert(fromV3 == Set(3L), fromV3.toString)
    // column pruning binds by name; pruned reads stay exact
    val pruned = spark.sql(
      "SELECT id FROM gdspec.lake.cdb.changes WHERE _change_type = 'delete'")
      .collect().map(_.getLong(0)).toSeq
    assert(pruned == Seq(3L))
  }

  test(".changes streaming source delivers each change once across a stop/restart") {
    spark.sql("CREATE TABLE gdspec.lake.cds (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO gdspec.lake.cds SELECT id, " +
      "timestamp'2024-07-01 08:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT)) " +
      "FROM range(9)") // v1: 9 rows over 3 days
    val ckpt = java.nio.file.Files.createTempDirectory("gdisk_cdf").toString
    val seen = scala.collection.concurrent.TrieMap.empty[(String, Long, Long), Boolean]
    def run(): Unit = {
      val q = spark.readStream.table("gdspec.lake.cds.changes")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("_change_type", "_commit_version", "id").collect()
            .foreach(r => seen.put((r.getString(0), r.getLong(1), r.getLong(2)), true))
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.keySet == (0L until 9L).map(i => ("insert", 1L, i)).toSet,
      seen.keySet.toString)
    seen.clear() // the restart must deliver ONLY post-checkpoint changes
    spark.sql("INSERT INTO gdspec.lake.cds VALUES " +
      "(100, timestamp'2024-07-05 09:00:00')") // v2
    // v3: metadata-only retention delete of day 1 → pure delete rows
    spark.sql("DELETE FROM gdspec.lake.cds " +
      "WHERE ts < timestamp'2024-07-02 00:00:00'")
    run()
    val expectDeletes = (0L until 9L).filter(_ % 3 == 0)
      .map(i => ("delete", 3L, i)).toSet
    assert(seen.keySet == expectDeletes + (("insert", 2L, 100L)),
      seen.keySet.toString)
  }

  test("OPTIMIZE WHERE scopes to the matching transform dirs only") {
    spark.sql("CREATE TABLE gdspec.lake.tow (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    for (b <- 0 until 3)
      spark.sql(s"INSERT INTO gdspec.lake.tow SELECT id, " +
        "timestamp'2024-09-01 06:00:00' + make_interval(0,0,0,CAST(id % 2 AS INT)) " +
        "FROM range(0, 8, 1, 2)")
    def t = graft.sources.GraftDiskCatalog.instance("gdspec").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "tow")).asInstanceOf[GraftDiskTable]
    val day2Before = t.liveFiles.filter(_.startsWith("ts_day=2024-09-02/")).toSet
    assert(day2Before.size > 1, s"need multiple day-2 files: $day2Before")
    val g = new GraftSession(spark)
    // strict `<` at midnight excludes day 2 entirely (boundary tighten)
    g.sql("OPTIMIZE gdspec.lake.tow WHERE ts < '2024-09-02 00:00:00'")
    val after = t.liveFiles
    assert(after.filter(_.startsWith("ts_day=2024-09-02/")).toSet == day2Before,
      "out-of-scope day 2 must stay byte-for-byte untouched")
    assert(after.count(_.startsWith("ts_day=2024-09-01/")) == 1,
      s"day 1 must compact to one file: ${after.filter(_.startsWith("ts_day=2024-09-01/"))}")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.tow").head().getLong(0) == 24L)
    // non-prunable predicate shapes refuse with guidance
    val e = intercept[Exception](
      g.sql("OPTIMIZE gdspec.lake.tow WHERE id % 2 = 0"))
    assert(e.getMessage.contains("partition columns"), e.getMessage)
  }

  // ---- partition spec EVOLUTION ---------------------------------------

  test("partition spec evolution: metadata-only, mixed generations prune safely, OPTIMIZE migrates") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.pse (id BIGINT, ts TIMESTAMP, v BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.pse SELECT id, " +
      "timestamp'2024-08-01 10:00:00' + make_interval(0,0,0,CAST(id % 4 AS INT)), " +
      "id FROM range(40)") // v1: unpartitioned files
    def files(): Seq[String] = {
      val t = graft.sources.GraftDiskCatalog.instance("gdspec").get
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("lake"), "pse")).asInstanceOf[GraftDiskTable]
      t.liveFiles
    }
    val beforeEvo = files().toSet
    // v2: evolve to days(ts) — ONE metadata commit, zero files touched
    val out = g.sql("ALTER TABLE gdspec.lake.pse SET PARTITION SPEC (days(ts))")
      .collect().head
    assert(out.getString(1) == "days(ts)" && files().toSet == beforeEvo)
    // v3: new writes land in the new layout
    spark.sql("INSERT INTO gdspec.lake.pse SELECT id + 100, " +
      "timestamp'2024-08-01 10:00:00' + make_interval(0,0,0,CAST(id % 4 AS INT)), " +
      "id FROM range(40)")
    assert(files().exists(_.startsWith("ts_day=")), files().mkString(","))
    // mixed generations: range pruning drops out-of-range NEW files and
    // conservatively keeps every pre-evolution file; rows stay exact
    val dfM = spark.sql("SELECT count(*), sum(v) FROM gdspec.lake.pse " +
      "WHERE ts >= timestamp'2024-08-03 00:00:00'")
    val (keptM, totalM) = statsFilesOf(dfM)
    assert(keptM < totalM, s"no pruning over mixed generations: $keptM/$totalM")
    val expN = 2 * (0 until 40).count(_ % 4 >= 2)
    val expS = 2L * (0 until 40).filter(_ % 4 >= 2).map(_.toLong).sum
    assert(dfM.head().toSeq == Seq(expN.toLong, expS))
    // OPTIMIZE migrates the old generation into the new layout
    g.sql("OPTIMIZE gdspec.lake.pse")
    assert(files().forall(_.startsWith("ts_day=")), files().mkString(","))
    val dfA = spark.sql("SELECT count(*), sum(v) FROM gdspec.lake.pse " +
      "WHERE ts >= timestamp'2024-08-03 00:00:00'")
    val (keptA, totalA) = statsFilesOf(dfA)
    assert(keptA < totalA && dfA.head().toSeq == Seq(expN.toLong, expS))
    // time travel serves the PRE-evolution spec's snapshot
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.pse VERSION AS OF 1")
      .head().getLong(0) == 40L)
    // removing partitioning is also one metadata commit
    g.sql("ALTER TABLE gdspec.lake.pse SET PARTITION SPEC ()")
    spark.sql("INSERT INTO gdspec.lake.pse VALUES " +
      "(999, timestamp'2024-08-09 00:00:00', 9)")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.pse").head().getLong(0) == 81L)
  }

  test("partition spec evolution rejects identity hive layouts and pure-identity targets") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.psid (id BIGINT, grp STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gdspec.lake.psid VALUES (1, 'a')")
    val e1 = intercept[Exception](
      g.sql("ALTER TABLE gdspec.lake.psid SET PARTITION SPEC (truncate(1, grp))"))
    assert(e1.getMessage.contains("identity hive layout"), e1.getMessage)
    spark.sql("CREATE TABLE gdspec.lake.psu (id BIGINT, grp STRING)")
    val e2 = intercept[Exception](
      g.sql("ALTER TABLE gdspec.lake.psu SET PARTITION SPEC (grp)"))
    assert(e2.getMessage.contains("at least one transform"), e2.getMessage)
  }

  test("transform specs reject invalid types and segment collisions") {
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE gdspec.lake.bad1 (id BIGINT, s STRING) " +
        "PARTITIONED BY (days(s))"))
    assert(e1.getMessage.contains("timestamp or date"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE gdspec.lake.bad2 (ts TIMESTAMP, ts_day STRING) " +
        "PARTITIONED BY (days(ts))"))
    assert(e2.getMessage.contains("collides"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      "CREATE TABLE gdspec.lake.bad3 (ts DATE) PARTITIONED BY (hours(ts))"))
    assert(e3.getMessage.contains("timestamp"), e3.getMessage)
  }

  test("SET PARTITION SPEC applies createTable's identity-column type allowlist") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.psal (id BIGINT, ts TIMESTAMP_NTZ)")
    // a timestamp identity column would render divergent dir values
    // between the ingest writers (raw micros) and OPTIMIZE's helper
    val e = intercept[Exception](
      g.sql("ALTER TABLE gdspec.lake.psal SET PARTITION SPEC (days(ts), ts)"))
    assert(e.getMessage.contains("unsupported type"), e.getMessage)
    // the allowlisted identity type (integral) still passes
    g.sql("ALTER TABLE gdspec.lake.psal SET PARTITION SPEC (days(ts), id)")
  }

  private def parquetDirsOf(table: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(s"$warehouse/lake/$table/data"))
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getParentFile.getName).toSet
  }

  test("OPTIMIZE keeps TIMESTAMP_NTZ rows in their ingest day dirs under a non-UTC session") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/Los_Angeles")
      spark.sql("CREATE TABLE gdspec.lake.ntzo (id BIGINT, ts TIMESTAMP_NTZ) " +
        "PARTITIONED BY (days(ts))")
      // 20:00 wall time: a session-zone shift (+8h to UTC) would relocate
      // it into the NEXT day's dir during the OPTIMIZE re-layout
      spark.sql("INSERT INTO gdspec.lake.ntzo VALUES " +
        "(1, TIMESTAMP_NTZ'2026-03-01 20:00:00'), " +
        "(2, TIMESTAMP_NTZ'2026-03-01 01:00:00'), " +
        "(3, TIMESTAMP_NTZ'2026-03-02 05:00:00')")
      val before = parquetDirsOf("ntzo")
      assert(before == Set("ts_day=2026-03-01", "ts_day=2026-03-02"), before)
      new GraftSession(spark).sql("OPTIMIZE gdspec.lake.ntzo").collect()
      val after = parquetDirsOf("ntzo")
      assert(after == before, s"OPTIMIZE relocated NTZ rows: $after")
      // the day-bounded prune still returns exactly the ingest-day rows
      val got = spark.sql("SELECT id FROM gdspec.lake.ntzo WHERE " +
        "ts >= TIMESTAMP_NTZ'2026-03-01 00:00:00' AND " +
        "ts < TIMESTAMP_NTZ'2026-03-02 00:00:00' ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L, 2L))
    } finally spark.conf.set(tzKey, saved)
  }

  test(".changes reads: default starts past the VACUUM horizon, explicit pre-horizon starts error") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.chv (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.chv VALUES (1)") // v1
    spark.sql("INSERT INTO gdspec.lake.chv VALUES (2)") // v2
    spark.sql("INSERT INTO gdspec.lake.chv VALUES (3)") // v3
    g.sql("VACUUM gdspec.lake.chv RETAIN 2 VERSIONS").collect() // keep v2,v3
    // default window: (oldest retained, latest] — v2's predecessor is
    // gone, so only v3's changes are servable (and nothing throws)
    val got = spark.read.table("gdspec.lake.chv.changes")
      .select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((3L, "insert", 3L)), got.toString)
    // the boundary start is servable: v3 diffs against retained v2
    assert(spark.read.option("startingVersion", "3")
      .table("gdspec.lake.chv.changes").count() == 1L)
    // an EXPLICIT pre-horizon startingVersion is an error a CDC consumer
    // can react to, never a silent gap: [1, latest] cannot be served
    // once v1's record is vacuumed away
    val e = intercept[Exception](spark.read.option("startingVersion", "1")
      .table("gdspec.lake.chv.changes").count())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("predates the earliest retained version"), msg)
    // ... unless the consumer opts into the clamp explicitly
    val clamped = spark.read.option("startingVersion", "1")
      .option("allowOutOfRangeStart", "true")
      .table("gdspec.lake.chv.changes").count()
    assert(clamped == 1L)
  }

  test(".changes startingVersion=0 boundary: never-VACUUMed tables serve from v1, post-VACUUM clamp is exact") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.chv0 (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.chv0 VALUES (1)") // v1
    spark.sql("INSERT INTO gdspec.lake.chv0 VALUES (2)") // v2
    // startingVersion=0 on a never-VACUUMed table: version 0 is the
    // creation commit, whose "diff" has no servable form (no predecessor
    // manifest) — the feed starts at version 1 by construction and no
    // error fires (nothing requested was removed)
    val fromZero = spark.read.option("startingVersion", "0")
      .table("gdspec.lake.chv0.changes")
      .select("_commit_version").collect().map(_.getLong(0)).toSeq.sorted
    assert(fromZero == Seq(1L, 2L), fromZero.toString)
    // identical to the default (full retained history) window
    assert(spark.read.table("gdspec.lake.chv0.changes").count() == 2L)
    // post-VACUUM the opted-in clamp serves exactly (head, latest]
    spark.sql("INSERT INTO gdspec.lake.chv0 VALUES (3)") // v3
    g.sql("VACUUM gdspec.lake.chv0 RETAIN 2 VERSIONS").collect() // keep v2,v3
    val clamped = spark.read.option("startingVersion", "0")
      .option("allowOutOfRangeStart", "true")
      .table("gdspec.lake.chv0.changes")
      .select("_commit_version").collect().map(_.getLong(0)).toSeq.sorted
    assert(clamped == Seq(3L), clamped.toString)
  }

  test("OPTIMIZE and DESCRIBE DETAIL serve byte sizes from the manifest — zero driver file-status probes") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.szm (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gdspec.lake.szm SELECT id, uuid() FROM range(200)")
    spark.sql("INSERT INTO gdspec.lake.szm SELECT id, uuid() FROM range(200)")
    spark.sql("INSERT INTO gdspec.lake.szm SELECT id, uuid() FROM range(200)")
    // the manifest carries every file's size, matching the filesystem
    val cat = GraftDiskCatalog.instance("gdspec").get
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("lake"), "szm")
    val t = cat.loadTable(ident).asInstanceOf[GraftDiskTable]
    val m = t.log.latest()
    assert(m.sizes.keySet == m.files.toSet)
    m.files.foreach { f =>
      assert(m.sizes(f) ==
        new java.io.File(s"$warehouse/lake/szm/data/$f").length())
    }
    val before = GraftDiskCatalog.driverFileStatCalls.get()
    g.sql("OPTIMIZE gdspec.lake.szm").collect()
    val detail = g.sql("DESCRIBE DETAIL gdspec.lake.szm").collect()
    assert(detail.length == 1)
    assert(GraftDiskCatalog.driverFileStatCalls.get() == before,
      "maintenance verbs issued per-file driver status probes")
    // post-OPTIMIZE the manifest still carries every (rewritten) file
    val m2 = cat.loadTable(ident).asInstanceOf[GraftDiskTable].log.latest()
    assert(m2.sizes.keySet == m2.files.toSet)
  }

  test("transactions watermark catalogs that Spark has not instantiated yet") {
    // a SECOND catalog name over a shared warehouse, never referenced
    // before BEGIN — Spark instantiates V2 catalogs lazily, so without
    // forced instantiation the BEGIN snapshot would miss it and ROLLBACK
    // would wrongly treat its pre-existing tables as created inside the
    // tx (and recursively DELETE them)
    val wh = java.nio.file.Files.createTempDirectory("gdisk_late_wh").toString
    spark.conf.set("spark.sql.catalog.gsetup8", classOf[GraftDiskCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsetup8.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsetup8.lake")
    spark.sql("CREATE TABLE gsetup8.lake.pre (id BIGINT)")
    spark.sql("INSERT INTO gsetup8.lake.pre VALUES (1), (2)")
    // same warehouse under a FRESH catalog name: configured, uninstantiated
    spark.conf.set("spark.sql.catalog.glate8", classOf[GraftDiskCatalog].getName)
    spark.conf.set("spark.sql.catalog.glate8.warehouse", wh)
    val g = new GraftSession(spark)
    g.sql("BEGIN")
    // first-ever reference to glate8 lands MID-transaction
    assert(spark.sql("SELECT count(*) FROM glate8.lake.pre").head().getLong(0) == 2L)
    g.sql("ROLLBACK")
    // the pre-existing table SURVIVED the rollback with its data
    assert(spark.sql("SELECT count(*) FROM glate8.lake.pre").head().getLong(0) == 2L)
    // and destructive verbs on the late catalog are guarded inside a tx
    g.sql("BEGIN")
    val e = intercept[Exception](g.sql("DROP TABLE glate8.lake.pre"))
    assert(e.getMessage.contains("transaction"), e.getMessage)
    // ... including behind a leading SQL comment (Spark's parser accepts
    // comment-prefixed statements; the guard must see past them)
    val e2 = intercept[Exception](
      g.sql("/* cleanup */ DROP TABLE glate8.lake.pre"))
    assert(e2.getMessage.contains("transaction"), e2.getMessage)
    g.sql("ROLLBACK")
    assert(spark.sql("SELECT count(*) FROM glate8.lake.pre").head().getLong(0) == 2L)
    spark.sql("DROP TABLE gsetup8.lake.pre")
  }

  test("VACUUM fans a large unreferenced-file sweep out as one distributed job") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.vacd (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.vacd VALUES (1), (2)")
    // 300 orphans (a crashed write's leftovers): enough to take the
    // distributed delete path instead of a 300-RPC driver loop
    val dataDir = java.nio.file.Paths.get(s"$warehouse/lake/vacd/data")
    (0 until 300).foreach(i => java.nio.file.Files.write(
      dataDir.resolve(f"orphan-$i%03d.parquet"), Array.empty[Byte]))
    g.sql("VACUUM gdspec.lake.vacd RETAIN 1 VERSIONS").collect()
    val left = java.nio.file.Files.list(dataDir).iterator()
    var names = List.empty[String]
    while (left.hasNext) names ::= left.next().getFileName.toString
    assert(!names.exists(_.startsWith("orphan-")),
      s"orphans survived: ${names.count(_.startsWith("orphan-"))}")
    // the referenced data is intact
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.vacd")
      .head().getLong(0) == 2L)
  }

  test("ROLLBACK never drops a table it cannot attribute to this JVM") {
    // "another process" creates a table in the shared warehouse during the
    // tx window — simulated the way it actually looks to this JVM: bytes
    // appear on disk with no in-JVM creation record. ROLLBACK must leave
    // that committed table standing; destroying another writer's data
    // would contradict the cross-process commit-claim exclusivity contract.
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.txsrc (id BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.txsrc VALUES (1), (2)")
    g.sql("BEGIN")
    // byte-copy the table dir under a new name (a pure filesystem write,
    // exactly what a concurrent process's CREATE looks like from here)
    val src = java.nio.file.Paths.get(s"$warehouse/lake/txsrc")
    val dst = java.nio.file.Paths.get(s"$warehouse/lake/txalien")
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
    // this JVM's own inside-tx creation IS attributable and must roll back
    spark.sql("CREATE TABLE gdspec.lake.txmine (id BIGINT)")
    g.sql("ROLLBACK")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.txalien")
      .head().getLong(0) == 2L,
      "ROLLBACK destroyed a concurrent process's committed table")
    assert(!GraftDiskCatalog.instance("gdspec").get.tableExists(
      org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("lake"), "txmine")))
    spark.sql("DROP TABLE gdspec.lake.txalien")
    spark.sql("DROP TABLE gdspec.lake.txsrc")
  }

  test("front-door transactions span gdisk: ROLLBACK restores BEGIN manifests, drops inside-tx creations") {
    val g = new GraftSession(spark)
    spark.sql("CREATE TABLE gdspec.lake.txg (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gdspec.lake.txg VALUES (1, 10)")
    val cat = GraftDiskCatalog.instance("gdspec").get
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("lake"), "txg")
    def latestV = cat.loadTable(ident)
      .asInstanceOf[GraftDiskTable].log.latestVersion()
    val atBegin = latestV
    g.sql("BEGIN")
    spark.sql("INSERT INTO gdspec.lake.txg VALUES (2, 20)")
    spark.sql("UPDATE gdspec.lake.txg SET v = 99 WHERE id = 1")
    spark.sql("CREATE TABLE gdspec.lake.txg_new (k INT)")
    spark.sql("INSERT INTO gdspec.lake.txg_new VALUES (7)")
    // destructive verbs refuse inside the tx
    val e1 = intercept[Exception](g.sql("DROP TABLE gdspec.lake.txg"))
    assert(e1.getMessage.contains("transaction"), e1.getMessage)
    val e2 = intercept[Exception](g.sql("VACUUM gdspec.lake.txg"))
    assert(e2.getMessage.contains("transaction"), e2.getMessage)
    // ... and a BACKQUOTED qualifier is the same catalog reference — it
    // must route and be guarded identically, not slip past the check
    val e3 = intercept[Exception](g.sql("DROP TABLE `gdspec`.lake.txg"))
    assert(e3.getMessage.contains("transaction"), e3.getMessage)
    val e4 = intercept[Exception](
      g.sql("ALTER TABLE `gdspec`.`lake`.`txg` RENAME TO gdspec.lake.txg2"))
    assert(e4.getMessage.contains("transaction"), e4.getMessage)
    g.sql("ROLLBACK")
    // restored — as a NEW commit (append-only undo, gmem discipline)
    assert(latestV > atBegin)
    val rows = spark.sql("SELECT id, v FROM gdspec.lake.txg ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 10L)))
    assert(!cat.tableExists(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("lake"), "txg_new")))
    // COMMIT makes gdisk changes permanent
    g.sql("BEGIN")
    spark.sql("INSERT INTO gdspec.lake.txg VALUES (3, 30)")
    g.sql("COMMIT")
    assert(spark.sql("SELECT count(*) FROM gdspec.lake.txg")
      .head().getLong(0) == 2L)
  }
}
