package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.WarcOps

/** WARC record walk + HTTP split: framing exactness, gzip member
  * layout, malformed-record quarantine. */
class WarcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fixture(id: Long, text: String): Array[Byte] = {
    import spark.implicits._
    val df = Seq((id, text)).toDF("doc_id", "text")
    WarcOps.asWarcPayload(spark, df, "doc_id", "text")
      .collect()(0).getAs[Array[Byte]](1)
  }

  test("plain and gzip-member files parse to identical records") {
    val plain = WarcOps.parseWarc(fixture(2L, "hello world"))
    val gz = WarcOps.parseWarc(fixture(3L, "hello world"))
    assert(plain.map(_.recType) == Seq("warcinfo", "request", "response"))
    assert(gz.map(_.recType) == Seq("warcinfo", "request", "response"))
    assert(plain(2).targetUri == "https://example.com/doc/2")
    val (status, hdrs, body) = WarcOps.httpResponse(plain(2).payload).get
    assert(status == 200)
    assert(hdrs("content-type") == "text/html; charset=utf-8")
    assert(new String(body, "UTF-8") == "hello world")
    // gzip lane recovers the same body through the member-wise inflate
    val (_, _, gzBody) = WarcOps.httpResponse(gz(2).payload).get
    assert(new String(gzBody, "UTF-8") == "hello world")
  }

  test("content-length framing is exact: body may contain CRLFCRLF") {
    val tricky = "line1\r\n\r\nline2\r\n\r\nline3"
    val recs = WarcOps.parseWarc(fixture(4L, tricky))
    assert(recs.length == 3)
    val (_, _, body) = WarcOps.httpResponse(recs(2).payload).get
    assert(new String(body, "UTF-8") == tricky,
      "framing must come from Content-Length, not separator scanning")
  }

  test("malformed tails quarantine per record, prefix records survive") {
    val full = fixture(6L, "abcdef")
    // truncate inside the LAST record: the first two still parse
    val cut = full.take(full.length - 10)
    val recs = WarcOps.parseWarc(cut)
    assert(recs.length >= 1 && recs.length < 3)
    // lying Content-Length (past EOF) stops cleanly
    val s = new String(full, "ISO-8859-1")
    val lied = s.replaceFirst("Content-Length: ", "Content-Length: 9")
      .getBytes("ISO-8859-1")
    WarcOps.parseWarc(lied) // no throw
    // garbage is no records
    assert(WarcOps.parseWarc("not a warc at all".getBytes).isEmpty)
    assert(WarcOps.httpResponse("junk".getBytes).isEmpty)
    // truncation sweep never throws
    for (at <- 0 until full.length by 13) WarcOps.parseWarc(full.take(at))
  }
}
