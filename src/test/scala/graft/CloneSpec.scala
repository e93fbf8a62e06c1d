package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftDiskCatalog, GraftDiskTable}

/** ZERO-COPY SHALLOW CLONE: the experiment-branch verb. Data files, bloom
  * sidecars, and deletion-vector sidecars hard-link into the clone's own
  * dir — proven by inode identity, not just content — and the two tables
  * then evolve, OPTIMIZE, and VACUUM fully independently, with shared
  * bytes freed only when the LAST referencing table drops them. */
class CloneSpec extends AnyFunSuite {
  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("gdisk_clone_wh").toString

  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gcl", classOf[GraftDiskCatalog].getName)
    s.conf.set("spark.sql.catalog.gcl.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcl.lake")
    s
  }

  private def diskTable(name: String): GraftDiskTable =
    GraftDiskCatalog.instance("gcl").get
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), name)).asInstanceOf[GraftDiskTable]

  private def inode(table: String, rel: String): Long =
    java.nio.file.Files.getAttribute(
      java.nio.file.Paths.get(s"$warehouse/lake/$table/data/$rel"),
      "unix:ino").asInstanceOf[Long]

  test("a shallow clone shares bytes by hard link and reads identically") {
    spark.sql("""CREATE TABLE gcl.lake.src (id BIGINT, v STRING)
      TBLPROPERTIES ('delete.mode'='dv',
        'bloom.columns'='id', 'bloom.expectedItems'='1000')""")
    spark.sql("INSERT INTO gcl.lake.src SELECT id, concat('v', id) FROM range(0, 500, 1, 1)")
    spark.sql("DELETE FROM gcl.lake.src WHERE id = 42") // DV rides the clone
    val g = new GraftSession(spark)
    val res = g.sql("CREATE TABLE gcl.lake.cl SHALLOW CLONE gcl.lake.src").head()
    assert(res.getString(0) == "gcl.lake.cl" && res.getLong(3) >= 1L)
    // content identical, DV subtracted on both sides
    assert(spark.table("gcl.lake.cl").count() == 499L)
    assert(spark.sql("SELECT count(*) FROM gcl.lake.cl WHERE id = 42")
      .head().getLong(0) == 0L)
    // ZERO COPY: every data file and the DV sidecar share an inode
    val src = diskTable("src")
    val cl = diskTable("cl")
    src.log.latest().files.foreach { f =>
      assert(inode("src", f) == inode("cl", f), s"copied, not linked: $f")
    }
    val (srcDv, clDv) =
      (src.log.latest().dvs.values.head.dv, cl.log.latest().dvs.values.head.dv)
    assert(srcDv == clDv && inode("src", srcDv) == inode("cl", clDv))
    // the clone's history starts fresh; its creation is labeled
    val hist = g.sql("DESCRIBE HISTORY gcl.lake.cl").collect()
    assert(hist.length == 1 && hist.head.getString(1).startsWith("CLONE("))
  }

  test("clone and source evolve independently; VACUUM on one never breaks the other") {
    val g = new GraftSession(spark)
    // diverge: delete more from the clone, append to the source
    spark.sql("DELETE FROM gcl.lake.cl WHERE id < 100")
    spark.sql("INSERT INTO gcl.lake.src SELECT id, 'new' FROM range(1000, 1100, 1, 1)")
    assert(spark.table("gcl.lake.cl").count() == 400L)
    assert(spark.table("gcl.lake.src").count() == 599L)
    // source rewrites everything (purge) and vacuums its old files away —
    // the clone still reads its full content through the shared inodes
    g.sql("OPTIMIZE gcl.lake.src PURGE DELETES")
    g.sql("VACUUM gcl.lake.src RETAIN 1 VERSIONS")
    assert(spark.table("gcl.lake.src").count() == 599L)
    assert(spark.table("gcl.lake.cl").count() == 400L)
    assert(spark.sql("SELECT v FROM gcl.lake.cl WHERE id = 200")
      .head().getString(0) == "v200")
    // and the clone purges/vacuums without disturbing the source
    g.sql("OPTIMIZE gcl.lake.cl PURGE DELETES")
    g.sql("VACUUM gcl.lake.cl RETAIN 1 VERSIONS")
    assert(spark.table("gcl.lake.src").count() == 599L)
    assert(spark.table("gcl.lake.cl").count() == 400L)
  }

  test("a clone created inside a transaction rolls back without touching the source") {
    spark.sql("CREATE TABLE gcl.lake.txsrc (id BIGINT)")
    spark.sql("INSERT INTO gcl.lake.txsrc SELECT id FROM range(0, 25, 1, 1)")
    val g = new GraftSession(spark)
    g.sql("BEGIN")
    g.sql("CREATE TABLE gcl.lake.txcl SHALLOW CLONE gcl.lake.txsrc")
    assert(spark.table("gcl.lake.txcl").count() == 25L)
    g.sql("ROLLBACK")
    // the clone (created inside the tx, attributed to this JVM) dropped —
    // and dropping its hard-linked names cannot touch the source's bytes
    intercept[Exception](spark.table("gcl.lake.txcl").count())
    assert(spark.table("gcl.lake.txsrc").count() == 25L)
  }

  test("VERSION AS OF clones a historical snapshot; tags do not carry") {
    spark.sql("CREATE TABLE gcl.lake.vsrc (id BIGINT)")
    spark.sql("INSERT INTO gcl.lake.vsrc SELECT id FROM range(0, 10, 1, 1)")
    spark.sql("INSERT INTO gcl.lake.vsrc SELECT id FROM range(10, 30, 1, 1)")
    val g = new GraftSession(spark)
    diskTable("vsrc").commitCreateTag("rel1", None)
    g.sql("CREATE TABLE gcl.lake.vcl SHALLOW CLONE gcl.lake.vsrc VERSION AS OF 1")
    assert(spark.table("gcl.lake.vcl").count() == 10L)
    assert(spark.table("gcl.lake.vsrc").count() == 30L)
    assert(diskTable("vcl").log.latest().properties
      .get(GraftDiskCatalog.TagsProp).isEmpty, "tags must not carry")
    // cloning over an existing table is a clean error
    val e = intercept[Exception](
      g.sql("CREATE TABLE gcl.lake.vcl SHALLOW CLONE gcl.lake.vsrc"))
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
  }
}
