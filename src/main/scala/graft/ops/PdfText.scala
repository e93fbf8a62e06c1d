package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PDF text extraction (ISO 32000) — the papers/books lane of a
  * document corpus: real byte-level parsing of the common text shape,
  * from the public spec only.
  *
  *   - [[streams]]: object scan — `N 0 obj <<dict>> stream…endstream`
  *     blocks, payload framed by the dict's `/Length` when present
  *     (binary-safe) with an `endstream` scan fallback, `/FlateDecode`
  *     inflated via the JDK inflater (bounded by a decompression cap).
  *   - [[contentText]]: content-stream walk — `BT…ET` text blocks,
  *     literal strings with the full escape set (\\ \( \) \n \r \t \b
  *     \f, octal \ddd, line continuations) and nested parens, hex
  *     strings, `Tj` / `'` / `"` / `TJ` (array form, kern numbers
  *     ignored), line breaks on `Td`/`TD`/`T*`/`'`/`"`.
  *
  * SCOPE (documented, quarantine-honest): string bytes decode as
  * Latin-1 — identity for the StandardEncoding/WinAnsi ASCII range
  * that covers western text PDFs; CID/Type0 composite fonts, CMaps,
  * and encrypted files yield no text here and belong to the ledger's
  * quarantine lane, not a mis-decode. Per-partition byte work, zero
  * shuffle — the same discipline as the WARC/DOCX/EPUB lanes. */
object PdfText {

  /** Stream objects as (dict, decoded payload); Flate payloads are
    * inflated (cap-guarded), others pass through raw. */
  def streams(
      b: Array[Byte], maxStreamBytes: Long = 1L << 28)
      : Seq[(String, Array[Byte])] = {
    val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = Seq.newBuilder[(String, Array[Byte])]
    var i = 0
    while (i >= 0 && i < s.length) {
      val si = s.indexOf("stream", i)
      if (si < 0) return out.result()
      // the dict sits between the enclosing "obj" and "stream"
      val oi = s.lastIndexOf("obj", si)
      val dict = if (oi < 0) "" else s.substring(oi + 3, si)
      // payload starts after the EOL that must follow the keyword
      var ds = si + 6
      if (ds < s.length && s.charAt(ds) == '\r') ds += 1
      if (ds < s.length && s.charAt(ds) == '\n') ds += 1
      val len = """/Length\s+(\d+)""".r.findFirstMatchIn(dict)
        .map(_.group(1).toLong)
      val de = len match {
        case Some(n) if ds + n <= b.length => ds + n.toInt
        case _ =>
          val e = s.indexOf("endstream", ds)
          if (e < 0) return out.result() else e
      }
      val raw = java.util.Arrays.copyOfRange(b, ds, de)
      val payload =
        if (dict.contains("/FlateDecode")) inflate(raw, maxStreamBytes)
        else Some(raw)
      payload.foreach(p => out += dict -> p)
      i = s.indexOf("endstream", de) match {
        case -1 => -1
        case e => e + 9
      }
    }
    out.result()
  }

  private def inflate(
      raw: Array[Byte], cap: Long): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return None
        out.write(buf, 0, n)
        if (out.size > cap) return None
      }
      if (inf.finished()) Some(out.toByteArray) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Text of one content stream: BT…ET walk (see object doc). */
  def contentText(content: Array[Byte]): String = {
    val s = new String(content, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    var inText = false
    val pendingStrings = scala.collection.mutable.ArrayBuffer.empty[String]
    def newline(): Unit =
      if (sb.nonEmpty && !sb.endsWith("\n")) sb.append('\n')
    var i = 0
    def parseLiteral(): String = {
      // i sits on '('
      val t = new StringBuilder
      var depth = 1
      i += 1
      while (i < s.length && depth > 0) {
        s.charAt(i) match {
          case '\\' if i + 1 < s.length =>
            s.charAt(i + 1) match {
              case 'n' => t.append('\n'); i += 2
              case 'r' => t.append('\r'); i += 2
              case 't' => t.append('\t'); i += 2
              case 'b' => t.append('\b'); i += 2
              case 'f' => t.append('\f'); i += 2
              case '(' => t.append('('); i += 2
              case ')' => t.append(')'); i += 2
              case '\\' => t.append('\\'); i += 2
              case '\n' => i += 2 // line continuation
              case '\r' =>
                i += 2
                if (i < s.length && s.charAt(i) == '\n') i += 1
              case d if d >= '0' && d <= '7' =>
                var code = 0
                var k = 0
                i += 1
                while (k < 3 && i < s.length &&
                    s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                  code = code * 8 + (s.charAt(i) - '0')
                  i += 1; k += 1
                }
                t.append((code & 0xff).toChar)
              case other => t.append(other); i += 2
            }
          case '(' => depth += 1; t.append('('); i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) t.append(')')
            i += 1
          case c => t.append(c); i += 1
        }
      }
      t.toString
    }
    def parseHex(): String = {
      // i sits on '<' (single)
      val t = new StringBuilder
      i += 1
      var hi = -1
      while (i < s.length && s.charAt(i) != '>') {
        val c = s.charAt(i)
        val v = Character.digit(c, 16)
        if (v >= 0) {
          if (hi < 0) hi = v
          else { t.append(((hi << 4) | v).toChar); hi = -1 }
        }
        i += 1
      }
      if (hi >= 0) t.append((hi << 4).toChar) // odd count: trailing 0
      if (i < s.length) i += 1
      t.toString
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') {
        val str = parseLiteral()
        if (inText) pendingStrings += str
      } else if (c == '<') {
        if (i + 1 < s.length && s.charAt(i + 1) == '<') {
          i += 2 // dict open — tokens inside are skipped naturally
        } else {
          val str = parseHex()
          if (inText) pendingStrings += str
        }
      } else if (c == '[' || c == ']' || c == '>') {
        i += 1
      } else if (c.isWhitespace) {
        i += 1
      } else if (c == '%') {
        while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r')
          i += 1
      } else {
        val start = i
        while (i < s.length && !s.charAt(i).isWhitespace &&
            !"()<>[]/%".contains(s.charAt(i)))
          i += 1
        if (i == start) i += 1 // lone delimiter (e.g. '/'): skip
        else {
          val tok = s.substring(start, i)
          tok match {
            case "BT" => inText = true; pendingStrings.clear()
            case "ET" => inText = false; pendingStrings.clear()
            case "Tj" | "TJ" if inText =>
              pendingStrings.foreach(sb.append)
              pendingStrings.clear()
            case "'" | "\"" if inText =>
              newline()
              pendingStrings.foreach(sb.append)
              pendingStrings.clear()
            case "Td" | "TD" | "T*" if inText =>
              newline()
              pendingStrings.clear()
            // numeric operands (TJ kern values, Td offsets, ' spacing)
            // accumulate BEFORE their operator — they must not drop the
            // strings already collected for it
            case t if t.matches("[-+]?[0-9.]+") => ()
            case _ => pendingStrings.clear()
          }
        }
      }
    }
    sb.toString
  }

  /** Full-file text: every BT/ET block of every content stream, in
    * stream order; None when no stream yields text (the quarantine
    * signal for encrypted/CID files). */
  def extractText(b: Array[Byte]): Option[String] = {
    val parts = streams(b).map(p => contentText(p._2)).filter(_.nonEmpty)
    if (parts.isEmpty) None else Some(parts.mkString("\n"))
  }

  /** PDF payloads → (doc_id, n_streams, text). */
  def extractPdf(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        extractText(bytes).map(t => (id, streams(bytes).size, t))
      }).toDF("doc_id", "n_streams", "text")
  }

  /** Fixture: a REAL single-page PDF (catalog/pages/page/font objects,
    * byte-accurate xref, trailer) whose content stream carries three
    * text lines — a title split across two Tj ops on one line, the doc
    * text, and an escape probe (`\(`, `\)`, `\\`, octal) through the
    * TJ array form with kern numbers. Odd ids Flate-compress the
    * content stream (`/Filter /FlateDecode` + correct /Length).
    * Expected text: `Title PDF <id>\n<text>\n(esc) \ A probe`. */
  def asPdfPayload(
      spark: SparkSession, df: DataFrame, id: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(
        df.select(col(id).cast("long").as("doc_id"), col(textCol).as("t")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val esc = text.replace("\\", "\\\\")
          .replace("(", "\\(").replace(")", "\\)")
        val content = ("BT /F1 12 Tf 72 720 Td " +
          s"(Title PDF ) Tj ($docId) Tj T* " +
          s"($esc) Tj T* " +
          "[(\\(esc\\) ) -250 (\\\\ \\101 probe)] TJ ET")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        val (body, filter) =
          if (docId % 2 == 1) {
            val d = new java.util.zip.Deflater()
            d.setInput(content); d.finish()
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            while (!d.finished()) out.write(buf, 0, d.deflate(buf))
            d.end()
            (out.toByteArray, " /Filter /FlateDecode")
          } else (content, "")
        val objs = Seq(
          "<< /Type /Catalog /Pages 2 0 R >>".getBytes("US-ASCII"),
          "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes("US-ASCII"),
          ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
            .getBytes("US-ASCII"),
          s"<< /Length ${body.length}$filter >>".getBytes("US-ASCII") ++
            "\nstream\n".getBytes("US-ASCII") ++ body ++
            "\nendstream".getBytes("US-ASCII"),
          "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
            .getBytes("US-ASCII"))
        val out = new java.io.ByteArrayOutputStream()
        def w(x: Array[Byte]): Unit = out.write(x)
        w("%PDF-1.4\n".getBytes("US-ASCII"))
        val offsets = objs.zipWithIndex.map { case (o, k) =>
          val off = out.size
          w(s"${k + 1} 0 obj\n".getBytes("US-ASCII"))
          w(o)
          w("\nendobj\n".getBytes("US-ASCII"))
          off
        }
        val xrefOff = out.size
        w(s"xref\n0 ${objs.size + 1}\n0000000000 65535 f \n"
          .getBytes("US-ASCII"))
        offsets.foreach(o => w(f"$o%010d 00000 n \n".getBytes("US-ASCII")))
        w((s"trailer\n<< /Size ${objs.size + 1} /Root 1 0 R >>\n" +
          s"startxref\n$xrefOff\n%%EOF\n").getBytes("US-ASCII"))
        (docId, out.toByteArray)
      }).toDF("doc_id", "payload")
  }
}
