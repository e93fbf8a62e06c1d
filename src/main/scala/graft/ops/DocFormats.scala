package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Office/book document containers — the other place text corpora come
  * from beside the crawl: DOCX (OOXML, ECMA-376) and EPUB (OCF/OPF,
  * ISO/IEC 23736) are both ZIP containers holding XML, so the real
  * work is (a) a bounded ZIP entry walk and (b) the format's own
  * document-structure walk:
  *
  *   - [[docxText]]: `word/document.xml` → paragraphs (`<w:p>`) of
  *     runs (`<w:r>`/`<w:t>`), run text concatenated within a
  *     paragraph, paragraphs joined with `\n`, `<w:tab/>` → tab, XML
  *     entities decoded. Formatting/revision markup is ignored by
  *     construction (only `w:t` text nodes surface).
  *   - [[epubChapters]]: `META-INF/container.xml` → OPF rootfile →
  *     manifest id→href map → SPINE ORDER (the reading order, which
  *     need not be the zip or manifest order) → one row per XHTML
  *     chapter. HTML stripping is left to the caller's column chain
  *     ([[TextOps.stripHtml]]) so the oracle can replay it verbatim.
  *
  * Per-partition byte work over opaque payload columns, zero shuffle —
  * the same discipline as the WARC/image/audio decode lanes. */
object DocFormats {

  /** ZIP entry walk over an in-memory payload: (name, bytes) per entry,
    * each entry capped (decompression-bomb guard — a capped entry is
    * skipped, not partially returned). */
  def zipEntries(
      b: Array[Byte], maxEntryBytes: Long = 1L << 28)
      : Iterator[(String, Array[Byte])] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(b))
    Iterator.continually(
        try zin.getNextEntry catch { case _: java.io.IOException => null })
      .takeWhile(_ != null)
      .flatMap { e =>
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = zin.read(buf)
        var over = false
        while (n >= 0 && !over) {
          out.write(buf, 0, n)
          if (out.size > maxEntryBytes) over = true
          else n = zin.read(buf)
        }
        if (over) None else Some(e.getName -> out.toByteArray)
      }
  }

  private def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&#39;", "'").replace("&amp;", "&")

  private val WpRe = java.util.regex.Pattern.compile(
    "<w:p[ >].*?</w:p>|<w:p/>", java.util.regex.Pattern.DOTALL)
  private val WtRe = java.util.regex.Pattern.compile(
    "<w:t(?: [^>]*)?>(.*?)</w:t>|<w:tab/>", java.util.regex.Pattern.DOTALL)

  /** DOCX text: the `word/document.xml` paragraph/run walk. None when
    * the payload is not a ZIP or carries no document part. */
  def docxText(b: Array[Byte]): Option[String] =
    zipEntries(b).collectFirst {
      case (name, bytes) if name == "word/document.xml" =>
        val xml = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        val paras = Seq.newBuilder[String]
        val pm = WpRe.matcher(xml)
        while (pm.find()) {
          val sb = new StringBuilder
          val tm = WtRe.matcher(pm.group())
          while (tm.find())
            sb.append(
              if (tm.group(1) == null) "\t" else xmlUnescape(tm.group(1)))
          paras += sb.toString
        }
        paras.result().mkString("\n")
    }

  private val OdtParaRe = java.util.regex.Pattern.compile(
    "<text:(p|h)[ >].*?</text:\\1>|<text:(p|h)/>",
    java.util.regex.Pattern.DOTALL)
  private val OdtSpaceRe = java.util.regex.Pattern.compile(
    """<text:s(?: text:c="(\d+)")?\s*/>""")

  /** ODT (OpenDocument Text) text: the `content.xml` paragraph/heading
    * walk — `<text:p>`/`<text:h>` in document order, `<text:tab/>` →
    * TAB, `<text:line-break/>` → newline, `<text:s text:c="n"/>` → n
    * spaces (1 when the count attribute is absent), remaining markup
    * (spans, links) contributes its inner text, entities decode.
    * None when the payload is not a ZIP or carries no content part. */
  def odtText(b: Array[Byte]): Option[String] =
    zipEntries(b).collectFirst {
      case (name, bytes) if name == "content.xml" =>
        val xml = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        val paras = Seq.newBuilder[String]
        val pm = OdtParaRe.matcher(xml)
        while (pm.find()) {
          var p = pm.group()
          p = p.replace("<text:tab/>", "\t")
            .replace("<text:line-break/>", "\n")
          val sm = OdtSpaceRe.matcher(p)
          val sb = new StringBuffer
          while (sm.find()) {
            val n = Option(sm.group(1)).map(_.toInt).getOrElse(1)
            sm.appendReplacement(sb,
              java.util.regex.Matcher.quoteReplacement(" " * n))
          }
          sm.appendTail(sb)
          paras += xmlUnescape(sb.toString.replaceAll("<[^>]+>", ""))
        }
        paras.result().mkString("\n")
    }

  /** EPUB chapters in SPINE order: (seq, xhtml source). None when the
    * container/rootfile/manifest walk fails. */
  def epubChapters(b: Array[Byte]): Option[Seq[(Int, String)]] = {
    val entries = zipEntries(b).toMap
    val container = entries.get("META-INF/container.xml")
      .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
      .getOrElse(return None)
    val opfPath = """full-path="([^"]+)"""".r
      .findFirstMatchIn(container).map(_.group(1)).getOrElse(return None)
    val opf = entries.get(opfPath)
      .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
      .getOrElse(return None)
    val opfDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }
    // manifest: id -> href (attribute order in <item> is not fixed)
    val items = """<item\b[^>]*>""".r.findAllIn(opf).flatMap { tag =>
      for {
        id <- """\bid="([^"]+)"""".r.findFirstMatchIn(tag).map(_.group(1))
        href <- """\bhref="([^"]+)"""".r.findFirstMatchIn(tag).map(_.group(1))
      } yield id -> href
    }.toMap
    val spine = """<itemref\b[^>]*\bidref="([^"]+)"""".r
      .findAllMatchIn(opf).map(_.group(1)).toSeq
    Some(spine.zipWithIndex.flatMap { case (idref, i) =>
      items.get(idref)
        .flatMap(href => entries.get(opfDir + href))
        .map(bytes => (i,
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
    })
  }

  /** DOCX payloads → (doc_id, n_entries, text). */
  def extractDocx(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        docxText(bytes).map(t => (id, zipEntries(bytes).size, t))
      }).toDF("doc_id", "n_entries", "text")
  }

  /** Destination groups whose content is formatting metadata, not
    * document text (RTF 1.9 spec §"Destination Text"). */
  private val RtfSkipDest = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "themedata",
    "header", "footer")

  /** RTF → text (the legacy office corpus lane): control-word walk —
    * `\par`/`\line` → newline, `\tab` → TAB, `\'hh` hex bytes decode
    * as cp1252-approximated latin-1, `\uN` unicode with its fallback
    * character consumed, `\\ \{ \}` escapes, destination groups
    * (fonttbl/colortbl/stylesheet/info/pict/… and every `{\*…}`
    * starred group) SKIP with proper brace nesting, raw newlines
    * ignored per spec. None when the magic is absent. */
  def rtfText(src: String): Option[String] = {
    if (!src.startsWith("{\\rtf")) return None
    val sb = new StringBuilder
    val len = src.length
    var i = 0
    var skipDepth = 0
    var pendingDest = false
    while (i < len) {
      src.charAt(i) match {
        case '{' =>
          if (skipDepth > 0) skipDepth += 1 else pendingDest = true
          i += 1
        case '}' =>
          if (skipDepth > 0) skipDepth -= 1
          pendingDest = false
          i += 1
        case '\\' if i + 1 < len =>
          val d = src.charAt(i + 1)
          if (d == '\\' || d == '{' || d == '}') {
            if (skipDepth == 0) sb.append(d)
            pendingDest = false
            i += 2
          } else if (d == '\'' && i + 3 < len) {
            if (skipDepth == 0)
              sb.append(Integer.parseInt(src.substring(i + 2, i + 4), 16)
                .toChar)
            pendingDest = false
            i += 4
          } else if (d == '*') {
            // {\*\dest ...}: an unrecognized starred destination skips
            if (skipDepth == 0 && pendingDest) skipDepth = 1
            i += 2
          } else if (d.isLetter) {
            var j = i + 1
            while (j < len && src.charAt(j).isLetter) j += 1
            val word = src.substring(i + 1, j)
            var k = j
            if (k < len && (src.charAt(k) == '-' || src.charAt(k).isDigit)) {
              k += 1
              while (k < len && src.charAt(k).isDigit) k += 1
            }
            val param = src.substring(j, k)
            if (k < len && src.charAt(k) == ' ') k += 1 // delimiter space
            if (skipDepth == 0) {
              if (pendingDest && RtfSkipDest(word)) skipDepth = 1
              else word match {
                case "par" | "line" => sb.append('\n')
                case "tab" => sb.append('\t')
                case "u" if param.nonEmpty =>
                  sb.append((((param.toInt % 65536) + 65536) % 65536).toChar)
                  if (k < len && src.charAt(k) != '\\' &&
                    src.charAt(k) != '{' && src.charAt(k) != '}') k += 1
                case _ => ()
              }
            }
            pendingDest = false
            i = k
          } else i += 2
        case '\n' | '\r' => i += 1
        case c =>
          if (skipDepth == 0) sb.append(c)
          pendingDest = false
          i += 1
      }
    }
    Some(sb.toString)
  }

  /** ODT payloads → (doc_id, n_entries, text). */
  def extractOdt(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        odtText(bytes).map(t => (id, zipEntries(bytes).size, t))
      }).toDF("doc_id", "n_entries", "text")
  }

  /** RTF payloads (string column `rtf`) → (doc_id, text). */
  def extractRtf(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("rtf")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, src) =>
        rtfText(src).map(t => (id, t))
      }).toDF("doc_id", "text")
  }

  /** RTF fixture: header destinations (fonttbl/colortbl), a starred
    * generator group, a tabbed title, an entity-free plain paragraph
    * with the doc text, and a hex-escape + unicode-escape probe line.
    * Expected text: `Title\t<id>\n& <tag> <text>\ncafé αnd\n`. */
  def asRtfPayload(
      spark: SparkSession, df: DataFrame, id: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(
        df.select(col(id).cast("long").as("doc_id"), col(textCol).as("t")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val rtf = "{\\rtf1\\ansi\\deff0" +
          "{\\fonttbl{\\f0\\fswiss Calibri;}}" +
          "{\\*\\generator graft}" +
          "{\\colortbl;\\red0\\green0\\blue0;}" +
          s"\\f0\\fs22 Title\\tab $docId\\par\n" +
          s"& <tag> $text\\par\n" +
          "caf\\'e9 \\u945?nd\\par}"
        (docId, rtf)
      }).toDF("doc_id", "rtf")
  }

  /** EPUB payloads → (doc_id, chapter_seq, xhtml) — one row per spine
    * chapter, stripping left to the caller's column chain. */
  def extractEpub(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        epubChapters(bytes).toSeq.flatten.map { case (i, xhtml) =>
          (id, i, xhtml)
        }
      }).toDF("doc_id", "chapter_seq", "xhtml")
  }

  private def zipBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(data)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** DOCX fixture: a real ZIP with [Content_Types].xml + document.xml —
    * two paragraphs, the first split across THREE runs (title word,
    * tab, id) so run concatenation and `<w:tab/>` sit under the
    * oracle, plus an entity-escape probe constant. Expected text:
    * `Title\t<id>\n& <tag> ` + doc text. */
  def asDocxPayload(
      spark: SparkSession, df: DataFrame, id: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(
        df.select(col(id).cast("long").as("doc_id"), col(textCol).as("t")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val doc =
          """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            "<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
            "wordprocessingml/2006/main\"><w:body>" +
            "<w:p ><w:r><w:t>Title</w:t></w:r><w:r><w:tab/></w:r>" +
            s"<w:r><w:t xml:space=\"preserve\">$docId</w:t></w:r></w:p>" +
            "<w:p ><w:r><w:t xml:space=\"preserve\">&amp; &lt;tag&gt; " +
            s"${xmlEscape(text)}</w:t></w:r></w:p>" +
            "</w:body></w:document>"
        val ct =
          """<?xml version="1.0"?><Types xmlns="http://schemas.""" +
            """openxmlformats.org/package/2006/content-types"/>"""
        (docId, zipBytes(Seq(
          "[Content_Types].xml" -> ct.getBytes("UTF-8"),
          "word/document.xml" -> doc.getBytes("UTF-8"))))
      }).toDF("doc_id", "payload")
  }

  /** ODT fixture: mimetype + manifest + content.xml — a heading split
    * across a span + tab + id (span markup must contribute inner text),
    * an entity-escape probe paragraph with the doc text, and a third
    * paragraph exercising `<text:s text:c="3"/>` run-length spaces,
    * `<text:line-break/>`, and a count-less `<text:s/>`. Expected text:
    * `Title\t<id>\n& <tag> <text>\na   b\nc `. */
  def asOdtPayload(
      spark: SparkSession, df: DataFrame, id: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(
        df.select(col(id).cast("long").as("doc_id"), col(textCol).as("t")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val content =
          """<?xml version="1.0" encoding="UTF-8"?>""" +
            "<office:document-content " +
            "xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" " +
            "xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\">" +
            "<office:body><office:text>" +
            "<text:h text:outline-level=\"1\"><text:span>Title</text:span>" +
            s"<text:tab/>$docId</text:h>" +
            s"<text:p>&amp; &lt;tag&gt; ${xmlEscape(text)}</text:p>" +
            "<text:p>a<text:s text:c=\"3\"/>b<text:line-break/>" +
            "c<text:s/></text:p>" +
            "</office:text></office:body></office:document-content>"
        val manifest =
          """<?xml version="1.0"?><manifest:manifest xmlns:manifest=""" +
            "\"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0\"/>"
        (docId, zipBytes(Seq(
          "mimetype" ->
            "application/vnd.oasis.opendocument.text".getBytes("US-ASCII"),
          "META-INF/manifest.xml" -> manifest.getBytes("UTF-8"),
          "content.xml" -> content.getBytes("UTF-8"))))
      }).toDF("doc_id", "payload")
  }

  /** EPUB fixture: mimetype + container.xml + OPF + two XHTML chapters
    * whose SPINE order (head chapter, then body) reverses their
    * manifest order — a reader that walks the zip or the manifest
    * instead of the spine emits chapters swapped and breaks the hash. */
  def asEpubPayload(
      spark: SparkSession, df: DataFrame, id: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(
        df.select(col(id).cast("long").as("doc_id"), col(textCol).as("t")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val container =
          """<?xml version="1.0"?><container version="1.0" """ +
            """xmlns="urn:oasis:names:tc:opendocument:xmlns:container">""" +
            """<rootfiles><rootfile full-path="OEBPS/content.opf" """ +
            """media-type="application/oebps-package+xml"/></rootfiles>""" +
            "</container>"
        val opf =
          """<?xml version="1.0"?><package version="3.0" """ +
            """xmlns="http://www.idpf.org/2007/opf"><manifest>""" +
            """<item id="body" href="body.xhtml" """ +
            """media-type="application/xhtml+xml"/>""" +
            """<item href="head.xhtml" id="head" """ +
            """media-type="application/xhtml+xml"/>""" +
            """</manifest><spine><itemref idref="head"/>""" +
            """<itemref idref="body"/></spine></package>"""
        val head = "<html><body><h1>Chapter head " + docId +
          "</h1></body></html>"
        val body = "<html><body><p>" + xmlEscape(text) +
          "</p></body></html>"
        (docId, zipBytes(Seq(
          "mimetype" -> "application/epub+zip".getBytes("US-ASCII"),
          "META-INF/container.xml" -> container.getBytes("UTF-8"),
          "OEBPS/content.opf" -> opf.getBytes("UTF-8"),
          "OEBPS/head.xhtml" -> head.getBytes("UTF-8"),
          "OEBPS/body.xhtml" -> body.getBytes("UTF-8"))))
      }).toDF("doc_id", "payload")
  }
}
