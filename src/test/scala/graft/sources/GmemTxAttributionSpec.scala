package graft.sources

import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** ROLLBACK's creation-attribution contract on the gmem tier: a table
  * ABSENT from the BEGIN watermark map is dropped only when it was created
  * after BEGIN. A catalog first configured (or re-registered) mid-
  * transaction carries pre-existing tables the transaction never touched —
  * rollback must not destroy those (the gdisk twin of this proof is
  * DiskCatalogSpec "ROLLBACK never drops a table it cannot attribute"). */
class GmemTxAttributionSpec extends AnyFunSuite {

  private def mkTable(c: GraftMemCatalog, name: String): Unit =
    c.createTable(
      Identifier.of(Array("ns"), name),
      new StructType().add("id", LongType),
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      new java.util.HashMap[String, String]())

  test("rollbackTo drops only tables created after the BEGIN instant") {
    val c = new GraftMemCatalog
    c.initialize("gmtx_attr", CaseInsensitiveStringMap.empty())
    c.createNamespace(Array("ns"), new java.util.HashMap[String, String]())
    mkTable(c, "pre") // exists BEFORE the transaction
    Thread.sleep(5)
    val beginMs = System.currentTimeMillis()
    Thread.sleep(5)
    mkTable(c, "inside") // created inside the transaction window
    // the catalog was never watermarked (configured mid-tx): marks empty
    c.rollbackTo(Map.empty, beginMs)
    assert(c.tableExists(Identifier.of(Array("ns"), "pre")),
      "rollback destroyed a pre-BEGIN table it never watermarked")
    assert(!c.tableExists(Identifier.of(Array("ns"), "inside")),
      "rollback kept a table created inside the transaction")
  }
}
