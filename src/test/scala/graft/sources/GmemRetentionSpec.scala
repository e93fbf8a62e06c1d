package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.InternalRow

import graft.TestSpark

/** Lifetime-accumulation bounds for the `gmem` store: the row/byte caps
  * bound LIVE rows, and retention (`retainVersions` / `retainLogRows`)
  * bounds what a table accumulates over its lifetime — commit snapshots
  * and the streaming append log — so repeated truncate+reload at cap or a
  * long-running streaming sink cannot grow driver heap without bound.
  * Also covers the streaming-epoch idempotence and PK NULL-rejection
  * commit semantics (this spec lives in `graft.sources` to reach the
  * `private[sources]` commit internals directly). */
class GmemRetentionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gret", classOf[GraftMemCatalog].getName)
    s.conf.set("spark.sql.catalog.gret.retainVersions", "4")
    s.conf.set("spark.sql.catalog.gret.retainLogRows", "8")
    s.sql("CREATE NAMESPACE IF NOT EXISTS gret.ns")
    s
  }

  private def liveTable(name: String): GraftMemTable = {
    import org.apache.spark.sql.connector.catalog.Identifier
    GraftMemCatalog.instance("gret").get
      .loadTable(Identifier.of(Array("ns"), name)).asInstanceOf[GraftMemTable]
  }

  test("history retention: version numbering stays absolute, old snapshots compact away") {
    spark.sql("DROP TABLE IF EXISTS gret.ns.h")
    spark.sql("CREATE TABLE gret.ns.h (id BIGINT)")
    for (i <- 1 to 10) spark.sql(s"INSERT INTO gret.ns.h VALUES ($i)")
    val t = liveTable("h")
    // 11 absolute commits (create + 10 inserts), only 4 retained on-heap
    assert(t.historyLength == 11L)
    assert(t.retainedHistoryCount == 4)
    // a retained version still time-travels with the ABSOLUTE number
    assert(spark.sql("SELECT count(*) c FROM gret.ns.h VERSION AS OF 9")
      .head().getLong(0) == 9L)
    // a compacted version fails cleanly, naming the conf
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gret.ns.h VERSION AS OF 2").collect())
    assert(e.getMessage.contains("retention") &&
      e.getMessage.contains("retainVersions"), e.getMessage)
  }

  test("repeated truncate+reload keeps retained state bounded") {
    spark.sql("DROP TABLE IF EXISTS gret.ns.cyc")
    spark.sql("CREATE TABLE gret.ns.cyc (id BIGINT)")
    for (_ <- 1 to 20)
      spark.sql("INSERT OVERWRITE gret.ns.cyc SELECT id FROM range(5)")
    val t = liveTable("cyc")
    assert(t.historyLength == 21L)
    assert(t.retainedHistoryCount == 4) // not 21 snapshots of 5 rows each
    assert(t.retainedLogCount <= 8) // not 100 lifetime log rows
    assert(spark.table("gret.ns.cyc").count() == 5)
  }

  test("log retention: fresh streams start at the oldest retained offset; stale offsets fail cleanly") {
    spark.sql("DROP TABLE IF EXISTS gret.ns.lg")
    spark.sql("CREATE TABLE gret.ns.lg (id BIGINT)")
    for (i <- 1 to 12) spark.sql(s"INSERT INTO gret.ns.lg VALUES ($i)")
    val t = liveTable("lg")
    assert(t.logSize == 12L && t.logStart == 4L && t.retainedLogCount == 8)
    // Kafka "earliest available": a fresh stream sees only the retained tail
    val q = spark.readStream.table("gret.ns.lg")
      .writeStream.format("memory").queryName("gret_lg").start()
    try q.processAllAvailable() finally q.stop()
    val seen = spark.table("gret_lg").collect().map(_.getLong(0)).toSet
    assert(seen == (5 to 12).map(_.toLong).toSet, seen.toString)
    // an offset below the retention horizon errors with the remedy
    val e = intercept[Exception](t.logSlice(0L, 5L))
    assert(e.getMessage.contains("compacted") &&
      e.getMessage.contains("retainLogRows"), e.getMessage)
  }

  test("VACUUM keeps the newest snapshot and drops the log") {
    spark.sql("DROP TABLE IF EXISTS gret.ns.vac")
    spark.sql("CREATE TABLE gret.ns.vac (id BIGINT)")
    spark.sql("INSERT INTO gret.ns.vac VALUES (1), (2)")
    spark.sql("INSERT INTO gret.ns.vac VALUES (3)")
    val t = liveTable("vac")
    t.vacuum()
    assert(t.retainedHistoryCount == 1 && t.retainedLogCount == 0)
    assert(t.logStart == t.logSize)
    assert(spark.table("gret.ns.vac").count() == 3) // live rows untouched
    intercept[Exception](
      spark.sql("SELECT * FROM gret.ns.vac VERSION AS OF 1").collect())
    spark.sql("INSERT INTO gret.ns.vac VALUES (4)") // still writable
    assert(spark.table("gret.ns.vac").count() == 4)
  }

  test("front-door VACUUM verb compacts a gmem table") {
    val g = new graft.GraftSession(spark)
    spark.sql("DROP TABLE IF EXISTS gret.ns.fdv")
    spark.sql("CREATE TABLE gret.ns.fdv (id BIGINT)")
    spark.sql("INSERT INTO gret.ns.fdv VALUES (1)")
    spark.sql("INSERT INTO gret.ns.fdv VALUES (2)")
    val out = g.sql("VACUUM gret.ns.fdv RETAIN 2 VERSIONS").collect()
    assert(out.head.getLong(1) == 2L)
    val t = liveTable("fdv")
    assert(t.retainedHistoryCount == 2 && t.retainedLogCount == 0)
    assert(spark.table("gret.ns.fdv").count() == 2)
    intercept[Exception](g.sql("VACUUM no_such_cat.ns.t"))
  }

  test("DESCRIBE HISTORY lists only the RETAINED gmem versions") {
    spark.sql("DROP TABLE IF EXISTS gret.ns.dh")
    spark.sql("CREATE TABLE gret.ns.dh (id BIGINT)")
    for (i <- 1 to 6) spark.sql(s"INSERT INTO gret.ns.dh VALUES ($i)")
    val g = new graft.GraftSession(spark)
    val hist = g.sql("DESCRIBE HISTORY gret.ns.dh").collect()
      .map(_.getInt(0)).toSeq
    // 7 absolute commits, retainVersions=4 → versions 3..6 remain listed
    assert(hist == Seq(3, 4, 5, 6), hist.toString)
  }

  test("streaming epoch replay is idempotent per query id") {
    spark.sql("DROP TABLE IF EXISTS gret.ns.ep")
    spark.sql("CREATE TABLE gret.ns.ep (id BIGINT, CONSTRAINT pk PRIMARY KEY (id))")
    val t = liveTable("ep")
    def row(i: Long) = {
      val p = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(t.schema())
      p(InternalRow(i)).copy(): InternalRow
    }
    t.commitEpoch("q1", 0L, Seq(row(1), row(2)))
    // a post-restart replay of the same epoch re-delivers the same rows:
    // must be skipped, NOT fail the PK duplicate check
    t.commitEpoch("q1", 0L, Seq(row(1), row(2)))
    assert(t.currentRows.length == 2)
    t.commitEpoch("q1", 1L, Seq(row(3)))
    assert(t.currentRows.length == 3)
    // a DIFFERENT query's epoch 0 is its own stream, not a replay
    t.commitEpoch("q2", 0L, Seq(row(4)))
    assert(t.currentRows.length == 4)
  }

  test("PRIMARY KEY rejects NULL key values at commit (UNIQUE keeps null-skip)") {
    spark.sql("DROP TABLE IF EXISTS gret.ns.pkn")
    spark.sql("CREATE TABLE gret.ns.pkn (id BIGINT, email STRING, " +
      "CONSTRAINT pk PRIMARY KEY (id), CONSTRAINT uq UNIQUE (email))")
    spark.sql("INSERT INTO gret.ns.pkn VALUES (1, 'a@x.io')")
    // NULL PK value: rejected (front-door parity: PK => NOT NULL + UNIQUE),
    // not silently admitted via the UNIQUE null-skip path. A CREATE-declared
    // PK is already non-nullable through Spark's own write-plan assert:
    val e = intercept[Exception](
      spark.sql("INSERT INTO gret.ns.pkn VALUES (CAST(NULL AS BIGINT), 'b@x.io')"))
    assert(e.getMessage.contains("NOT_NULL") ||
      (e.getMessage.contains("PRIMARY KEY") && e.getMessage.contains("NULL")),
      e.getMessage)
    assert(spark.table("gret.ns.pkn").count() == 1)
    // UNIQUE columns keep SQL null-skip semantics
    spark.sql("INSERT INTO gret.ns.pkn VALUES (2, NULL), (3, NULL)")
    assert(spark.table("gret.ns.pkn").count() == 3)
    // a PK added AFTER create leaves the column nullable in the write plan,
    // so the commit-side check is the only line of defense there
    spark.sql("DROP TABLE IF EXISTS gret.ns.pka")
    spark.sql("CREATE TABLE gret.ns.pka (id BIGINT, v STRING)")
    spark.sql("ALTER TABLE gret.ns.pka ADD CONSTRAINT pk2 PRIMARY KEY (id)")
    val e2 = intercept[Exception](
      spark.sql("INSERT INTO gret.ns.pka VALUES (CAST(NULL AS BIGINT), 'x')"))
    assert(e2.getMessage.contains("PRIMARY KEY") && e2.getMessage.contains("NULL"),
      e2.getMessage)
    assert(spark.table("gret.ns.pka").count() == 0)
  }
}
