package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DocFormats

/** DOCX/EPUB container walks: run concatenation, spine-vs-manifest
  * order, entity decoding, and the non-container negatives. */
class DocFormatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def payload(
      fixture: (org.apache.spark.sql.SparkSession, org.apache.spark.sql.DataFrame,
        String, String) => org.apache.spark.sql.DataFrame,
      id: Long, text: String): Array[Byte] = {
    import spark.implicits._
    fixture(spark, Seq((id, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0).getAs[Array[Byte]](1)
  }

  test("docx: runs concatenate, tab materializes, entities decode") {
    val b = payload(DocFormats.asDocxPayload, 42L, "body & <b>text</b>")
    val t = DocFormats.docxText(b).get
    assert(t == "Title\t42\n& <tag> body & <b>text</b>",
      s"got: ${t.replace("\t", "\\t").replace("\n", "\\n")}")
  }

  test("epub: chapters come out in SPINE order, not zip/manifest order") {
    val b = payload(DocFormats.asEpubPayload, 7L, "hello book")
    val ch = DocFormats.epubChapters(b).get
    assert(ch.map(_._1) == Seq(0, 1))
    assert(ch(0)._2.contains("Chapter head 7"),
      "spine lists head first although the manifest lists body first")
    assert(ch(1)._2.contains("hello book"))
  }

  test("odt: whitespace elements, spans, empty paragraphs, entities") {
    def odtOf(contentBody: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("content.xml"))
      z.write(("<office:document-content><office:body><office:text>" +
        contentBody + "</office:text></office:body>" +
        "</office:document-content>").getBytes("UTF-8"))
      z.closeEntry(); z.close()
      bos.toByteArray
    }
    // empty paragraph form <text:p/> contributes an empty line
    val t = DocFormats.odtText(odtOf(
      "<text:h text:outline-level=\"1\">H<text:span>ead</text:span></text:h>" +
        "<text:p/>" +
        "<text:p>a<text:s text:c=\"2\"/>b<text:tab/>c<text:line-break/>d" +
        "<text:s/>&amp;&lt;x&gt;</text:p>")).get
    assert(t == "Head\n\na  b\tc\nd &<x>", t.replace("\n", "\\n"))
    // link/span markup drops but keeps inner text
    val t2 = DocFormats.odtText(odtOf(
      "<text:p><text:a xlink:href=\"https://x\">anchor</text:a> tail</text:p>"))
      .get
    assert(t2 == "anchor tail", t2)
    assert(DocFormats.odtText("not a zip".getBytes).isEmpty)
  }

  test("rtf: escapes, unicode fallback, destination nesting, literals") {
    // literal braces and backslash; \line like \par
    val t1 = DocFormats.rtfText(
      "{\\rtf1 a\\{b\\}c\\\\d\\line e}").get
    assert(t1 == "a{b}c\\d\ne", t1)
    // nested groups inside a skipped destination stay skipped
    val t2 = DocFormats.rtfText(
      "{\\rtf1{\\fonttbl{\\f0{\\deep x}y}z}kept}").get
    assert(t2 == "kept", t2)
    // \uN with a SPACE delimiter still consumes the fallback char
    val t3 = DocFormats.rtfText("{\\rtf1 \\u945 ?x}").get
    assert(t3 == "αx", t3)
    // negative \uN params wrap to the 16-bit code unit
    val t4 = DocFormats.rtfText("{\\rtf1 \\u-3512?}").get
    assert(t4 == "", t4)
    // non-rtf input is None
    assert(DocFormats.rtfText("plain text").isEmpty)
  }

  test("negatives: non-zip and zip-without-document yield None, no throw") {
    assert(DocFormats.docxText("not a zip".getBytes).isEmpty)
    assert(DocFormats.epubChapters(Array[Byte](0x50, 0x4b, 3, 4)).isEmpty)
    // a zip missing word/document.xml is not a docx
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    z.write("x".getBytes); z.closeEntry(); z.close()
    assert(DocFormats.docxText(bos.toByteArray).isEmpty)
  }

  test("zip entry cap: an over-cap entry is skipped, siblings survive") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("big.bin"))
    val chunk = new Array[Byte](1 << 16)
    for (_ <- 0 until 4) z.write(chunk)
    z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("small.txt"))
    z.write("ok".getBytes); z.closeEntry(); z.close()
    val names = DocFormats.zipEntries(bos.toByteArray,
      maxEntryBytes = 1 << 12).map(_._1).toSeq
    assert(names == Seq("small.txt"),
      "the bomb-guarded entry must drop without dropping the file")
  }
}
