package graft

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftMemCatalog

/** The DSv2 catalog behind Spark's own resolver: multi-part names, namespace
  * DDL, INSERT INTO/OVERWRITE, CTAS, writeTo, ALTER migrations, and column
  * pruning through the V2 scan. */
class DsV2CatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gmem", classOf[GraftMemCatalog].getName)
    s
  }

  test("namespace DDL: create, list, metadata, drop") {
    spark.sql("CREATE NAMESPACE gmem.lake COMMENT 'dim tables'")
    val ns = spark.sql("SHOW NAMESPACES IN gmem").collect().map(_.getString(0))
    assert(ns.contains("lake") && ns.contains("default"))
    spark.sql("CREATE NAMESPACE gmem.scratch")
    spark.sql("DROP NAMESPACE gmem.scratch")
    val after = spark.sql("SHOW NAMESPACES IN gmem").collect().map(_.getString(0))
    assert(!after.contains("scratch"))
  }

  test("create + insert + select through a three-part name") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("CREATE TABLE gmem.lake.dim (id BIGINT, name STRING)")
    spark.sql("INSERT INTO gmem.lake.dim VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(spark.sql("SELECT name FROM gmem.lake.dim WHERE id = 2")
      .collect().map(_.getString(0)).toSeq == Seq("b"))
    // append composes
    spark.sql("INSERT INTO gmem.lake.dim VALUES (4, 'd')")
    assert(spark.table("gmem.lake.dim").count() == 4)
  }

  test("INSERT OVERWRITE truncates through SupportsTruncate") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("CREATE TABLE gmem.lake.ow (k INT, v STRING)")
    spark.sql("INSERT INTO gmem.lake.ow VALUES (1, 'old'), (2, 'old')")
    spark.sql("INSERT OVERWRITE gmem.lake.ow VALUES (9, 'new')")
    val rows = spark.table("gmem.lake.ow").collect()
    assert(rows.length == 1 && rows.head.getInt(0) == 9)
  }

  test("CTAS and SHOW TABLES") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("CREATE TABLE gmem.lake.squares AS " +
      "SELECT id, id * id AS sq FROM range(5)")
    assert(spark.sql("SELECT sum(sq) FROM gmem.lake.squares")
      .head().getLong(0) == 30L)
    val shown = spark.sql("SHOW TABLES IN gmem.lake").collect()
      .map(_.getString(1))
    assert(shown.contains("squares"))
  }

  test("df.writeTo append API") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("CREATE TABLE gmem.lake.wt (x BIGINT, y DOUBLE)")
    Seq((1L, 1.5), (2L, 2.5)).toDF("x", "y").writeTo("gmem.lake.wt").append()
    assert(spark.table("gmem.lake.wt").count() == 2)
  }

  test("ALTER TABLE add/rename/drop column migrates existing rows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("CREATE TABLE gmem.lake.alt (id INT, v STRING)")
    spark.sql("INSERT INTO gmem.lake.alt VALUES (1, 'x')")
    spark.sql("ALTER TABLE gmem.lake.alt ADD COLUMN note STRING")
    val r1 = spark.sql("SELECT id, v, note FROM gmem.lake.alt").head()
    assert(r1.getInt(0) == 1 && r1.getString(1) == "x" && r1.isNullAt(2))
    spark.sql("ALTER TABLE gmem.lake.alt RENAME COLUMN v TO label")
    spark.sql("ALTER TABLE gmem.lake.alt DROP COLUMN note")
    assert(spark.table("gmem.lake.alt").columns.toSeq == Seq("id", "label"))
    assert(spark.sql("SELECT label FROM gmem.lake.alt").head().getString(0) == "x")
  }

  test("RENAME TABLE moves data") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("CREATE TABLE gmem.lake.rn_src (id INT)")
    spark.sql("INSERT INTO gmem.lake.rn_src VALUES (7)")
    spark.sql("ALTER TABLE gmem.lake.rn_src RENAME TO lake.rn_dst")
    assert(spark.table("gmem.lake.rn_dst").head().getInt(0) == 7)
  }

  test("a failed RENAME TABLE leaves the source fully intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("DROP TABLE IF EXISTS gmem.lake.rn_a")
    spark.sql("DROP TABLE IF EXISTS gmem.lake.rn_b")
    spark.sql("CREATE TABLE gmem.lake.rn_a (id INT)")
    spark.sql("INSERT INTO gmem.lake.rn_a VALUES (5)")
    spark.sql("CREATE TABLE gmem.lake.rn_b (id INT)")
    intercept[Exception](
      spark.sql("ALTER TABLE gmem.lake.rn_a RENAME TO lake.rn_b"))
    // still registered AND self-reporting under the old identifier
    assert(spark.table("gmem.lake.rn_a").head().getInt(0) == 5)
    assert(spark.sql("SELECT * FROM gmem.lake.rn_a").queryExecution
      .optimizedPlan.collectFirst { case r: DataSourceV2ScanRelation => r }
      .get.scan.description().contains("lake.rn_a"))
  }

  test("column pruning reaches the V2 scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("CREATE TABLE gmem.lake.pr (a INT, b STRING, c DOUBLE)")
    spark.sql("INSERT INTO gmem.lake.pr VALUES (1, 's', 2.0)")
    val df = spark.sql("SELECT b FROM gmem.lake.pr")
    val scan = df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.scan
    }.get
    assert(scan.readSchema().fieldNames.toSeq == Seq("b"),
      scan.readSchema().treeString)
    assert(df.head().getString(0) == "s")
  }

  test("VERSION AS OF serves commit snapshots through Spark's time travel") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("DROP TABLE IF EXISTS gmem.lake.tt")
    spark.sql("CREATE TABLE gmem.lake.tt (id INT)") // v0: empty
    spark.sql("INSERT INTO gmem.lake.tt VALUES (1), (2)") // v1
    spark.sql("INSERT OVERWRITE gmem.lake.tt VALUES (9)") // v2
    assert(spark.sql("SELECT count(*) FROM gmem.lake.tt VERSION AS OF 0")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT id FROM gmem.lake.tt VERSION AS OF 1 ORDER BY id")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(spark.sql("SELECT id FROM gmem.lake.tt VERSION AS OF 2")
      .head().getInt(0) == 9)
    // live table = latest
    assert(spark.table("gmem.lake.tt").head().getInt(0) == 9)
    // snapshots survive a post-hoc ALTER (schema is versioned with data)
    spark.sql("ALTER TABLE gmem.lake.tt ADD COLUMN note STRING") // v3
    assert(spark.sql("SELECT * FROM gmem.lake.tt VERSION AS OF 1")
      .columns.toSeq == Seq("id"))
  }

  test("streaming read tails the mem table's append log across inserts") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("DROP TABLE IF EXISTS gmem.lake.feed")
    spark.sql("CREATE TABLE gmem.lake.feed (id BIGINT, tag STRING)")
    spark.sql("INSERT INTO gmem.lake.feed VALUES (1, 'a'), (2, 'b')")
    val q = spark.readStream.table("gmem.lake.feed")
      .writeStream.outputMode("append").format("memory")
      .queryName("gmem_feed").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gmem_feed").count() == 2)
      spark.sql("INSERT INTO gmem.lake.feed VALUES (3, 'c')") // arrives mid-stream
      q.processAllAvailable()
      val got = spark.table("gmem_feed").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("TIMESTAMP AS OF serves the newest gmem snapshot at or before the timestamp") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("DROP TABLE IF EXISTS gmem.lake.tt_ts")
    spark.sql("CREATE TABLE gmem.lake.tt_ts (id BIGINT)")
    spark.sql("INSERT INTO gmem.lake.tt_ts VALUES (1)")
    Thread.sleep(20)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    val mid = fmt.format(java.time.Instant.now())
    Thread.sleep(20)
    spark.sql("INSERT INTO gmem.lake.tt_ts VALUES (2)")
    assert(spark.sql(
      s"SELECT count(*) FROM gmem.lake.tt_ts TIMESTAMP AS OF '$mid'")
      .head().getLong(0) == 1L)
    val late = fmt.format(java.time.Instant.now().plusSeconds(2))
    assert(spark.sql(
      s"SELECT count(*) FROM gmem.lake.tt_ts TIMESTAMP AS OF '$late'")
      .head().getLong(0) == 2L)
    val early = intercept[Exception](spark.sql(
      "SELECT * FROM gmem.lake.tt_ts TIMESTAMP AS OF '2000-01-01'").collect())
    assert(early.getMessage.contains("at or before"), early.getMessage)
  }

  test("a joined dimension from the catalog broadcasts against parquet facts") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmem.lake")
    spark.sql("CREATE TABLE gmem.lake.regions2 AS " +
      s"SELECT r_regionkey, r_name FROM parquet.`${TestSpark.sfDir}/region.parquet`")
    val joined = graft.sources.Tables.load(spark, TestSpark.sfDir, "nation")
      .join(spark.table("gmem.lake.regions2"),
        org.apache.spark.sql.functions.col("n_regionkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
    assert(joined.count() == 25)
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
