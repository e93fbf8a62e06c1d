package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PdfText

/** PDF content-stream walk beyond the fixture's shapes. */
class PdfTextSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def content(ops: String): String =
    PdfText.contentText(
      ops.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  test("escapes, nesting, octal, hex strings, line continuation") {
    assert(content("BT (a\\(b\\)c) Tj ET") == "a(b)c")
    assert(content("BT ((nested) ok) Tj ET") == "(nested) ok")
    assert(content("BT (\\101\\102\\103) Tj ET") == "ABC")
    assert(content("BT (a\\\nb) Tj ET") == "ab", "continuation joins lines")
    assert(content("BT <48656C6C6F> Tj ET") == "Hello")
    assert(content("BT <48656C6C6F7> Tj ET") == "Hellop",
      "odd hex digit pads a trailing zero nibble")
  }

  test("TJ kern numbers do not drop collected strings; ' breaks lines") {
    assert(content("BT [(a) -250 (b) 120 (c)] TJ ET") == "abc")
    assert(content("BT (one) Tj (two) ' ET") == "one\ntwo")
    assert(content("BT (x) Tj 0 -14 Td (y) Tj T* (z) Tj ET") == "x\ny\nz")
  }

  test("text outside BT/ET is ignored; no-text files are None") {
    assert(content("(outside) Tj BT (inside) Tj ET") == "inside")
    assert(PdfText.extractText("not a pdf at all".getBytes).isEmpty)
    assert(PdfText.extractText(
      "%PDF-1.4\n1 0 obj << >> endobj\n%%EOF".getBytes).isEmpty,
      "a PDF with no content stream text must quarantine, not mis-decode")
  }

  test("plain and Flate-compressed content streams extract identically") {
    import spark.implicits._
    val df = Seq((2L, "same body"), (3L, "same body"))
      .toDF("doc_id", "text")
    val payloads = PdfText.asPdfPayload(spark, df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val plain = PdfText.extractText(payloads(2L)).get
    val flate = PdfText.extractText(payloads(3L)).get
    assert(plain.replace("2", "9") == flate.replace("3", "9"),
      "the two filter lanes must decode the same ops")
    assert(plain == "Title PDF 2\nsame body\n(esc) \\ A probe")
    // the fixture writes a structurally real PDF: header, xref, trailer
    val s = new String(payloads(2L),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s.startsWith("%PDF-1.4") && s.contains("xref") &&
      s.contains("/Root 1 0 R") && s.endsWith("%%EOF\n"))
    // xref offsets are byte-accurate: each points at "N 0 obj"
    val offs = """(\d{10}) 00000 n""".r.findAllMatchIn(s)
      .map(_.group(1).toInt).toSeq
    offs.zipWithIndex.foreach { case (o, k) =>
      assert(s.startsWith(s"${k + 1} 0 obj", o),
        s"xref entry $k points at offset $o")
    }
  }
}
