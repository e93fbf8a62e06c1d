package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** mbox / MIME email extraction — the mailing-list corpus lane
  * (RFC 4155 mbox framing, RFC 2045/2046 MIME, RFC 2047 encoded
  * words, RFC 2822 header folding).
  *
  * Scope: the shapes list corpora actually ship —
  *   - mbox "From " line framing (">From " unstuffing in bodies);
  *   - header unfolding (continuation lines), Subject/From/Content-*
  *     extraction;
  *   - RFC 2047 encoded-words in headers (Q with underscore→space and
  *     =HH, B base64);
  *   - transfer decodings: 7bit/8bit (identity), quoted-printable
  *     (=HH + soft line breaks), base64 (MIME decoder, whitespace
  *     tolerant);
  *   - multipart walk by boundary with the text/plain part preferred
  *     (first match depth-first; nested multiparts recurse).
  * Non-text and undecodable parts yield an empty body rather than a
  * task failure — the quarantine discipline of every other lane.
  *
  * Everything is deterministic byte/string work per message —
  * per-partition, zero shuffle; the oracle recomputes expected
  * subjects/bodies closed-form from the fixture shape with no MIME
  * code in SQL.
  *
  * Reference behavior studied (not ported): qurious has no mail layer;
  * this is extension surface (SURVEY.md §2.9).
  */
object MailOps {

  /** One extracted message. */
  final case class MailRow(
      doc_id: Long, msg_seq: Int, subject: String, from: String,
      content_type: String, body: String)

  // ---------------------------------------------------------- framing

  /** Split an mbox into raw messages: a message starts at a line
    * beginning "From " (the envelope line, which is dropped); ">From "
    * body lines unstuff one '>'. */
  def splitMbox(mbox: String): Seq[String] = {
    val lines = mbox.split("\n", -1)
    val msgs = Seq.newBuilder[String]
    var cur: StringBuilder = null
    lines.foreach { line =>
      if (line.startsWith("From ")) {
        if (cur != null) msgs += cur.toString
        cur = new StringBuilder
      } else if (cur != null) {
        val l = if (line.startsWith(">From ")) line.substring(1) else line
        if (cur.nonEmpty) cur.append('\n')
        cur.append(l)
      }
    }
    if (cur != null) msgs += cur.toString
    msgs.result()
  }

  // ---------------------------------------------------------- headers

  /** Header block (up to the first empty line) unfolded into (name →
    * value) pairs (last occurrence wins), plus the body offset. */
  def parseHeaders(msg: String): (Map[String, String], String) = {
    val sep = msg.indexOf("\n\n")
    val (head, body) =
      if (sep < 0) (msg, "") else (msg.substring(0, sep), msg.substring(sep + 2))
    val unfolded = scala.collection.mutable.ListBuffer.empty[String]
    head.split("\n", -1).foreach { line =>
      if ((line.startsWith(" ") || line.startsWith("\t")) && unfolded.nonEmpty)
        unfolded(unfolded.length - 1) = unfolded.last + " " + line.trim
      else unfolded += line
    }
    val hs = unfolded.toList.flatMap { l =>
      val i = l.indexOf(':')
      if (i <= 0) None
      else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    (hs, body)
  }

  /** RFC 2047 encoded-word decode inside a header value: Q (underscore
    * → space, =HH) and B (base64); adjacent encoded words join without
    * intervening whitespace per spec. Charset is honored for UTF-8 /
    * ASCII / latin-1 (the corpus shapes); others fall back to UTF-8. */
  private val EncWordRe =
    """=\?([^?]+)\?([QqBb])\?([^?]*)\?=""".r

  def decodeHeader(v: String): String = {
    // adjacent encoded words: whitespace BETWEEN two encoded words drops
    val joined = v.replaceAll("""\?=\s+=\?""", "?==?")
    EncWordRe.replaceAllIn(joined, m => {
      val cs = m.group(1).toLowerCase match {
        case "us-ascii" => java.nio.charset.StandardCharsets.US_ASCII
        case "iso-8859-1" => java.nio.charset.StandardCharsets.ISO_8859_1
        case _ => java.nio.charset.StandardCharsets.UTF_8
      }
      val bytes = m.group(2).toLowerCase match {
        case "q" => qpDecode(m.group(3).replace('_', ' '), header = true)
        case _ =>
          try java.util.Base64.getMimeDecoder.decode(m.group(3))
          catch { case _: IllegalArgumentException => Array.empty[Byte] }
      }
      java.util.regex.Matcher.quoteReplacement(new String(bytes, cs))
    })
  }

  // -------------------------------------------------------- decodings

  /** Quoted-printable: =HH byte escapes and (body form) soft line
    * breaks "=\n"; malformed escapes pass through literally (the
    * robustness rule mail parsers follow). */
  def qpDecode(s: String, header: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && !header && i + 1 < s.length && s.charAt(i + 1) == '\n') {
        i += 2 // soft break
      } else if (c == '=' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        val bs = c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.write(bs, 0, bs.length)
        i += 1
      }
    }
    out.toByteArray
  }
  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  private def decodeBody(body: String, cte: String): String = {
    cte.toLowerCase match {
      case "quoted-printable" =>
        new String(qpDecode(body), java.nio.charset.StandardCharsets.UTF_8)
      case "base64" =>
        try new String(java.util.Base64.getMimeDecoder.decode(body),
          java.nio.charset.StandardCharsets.UTF_8)
        catch { case _: IllegalArgumentException => "" }
      case _ => body // 7bit / 8bit / binary / absent
    }
  }

  // -------------------------------------------------------- multipart

  private def boundaryOf(ct: String): Option[String] =
    """(?i)boundary="?([^";]+)"?""".r.findFirstMatchIn(ct).map(_.group(1))

  /** The message's text: for multipart types, the first text/plain part
    * depth-first (nested multiparts recurse); otherwise the decoded
    * top-level body when its type is text (or untyped). Returns ""
    * when no text part exists. */
  def textOf(headers: Map[String, String], body: String): String = {
    val ct = headers.getOrElse("content-type", "text/plain")
    val mime = ct.split(";")(0).trim.toLowerCase
    if (mime.startsWith("multipart/")) {
      boundaryOf(ct) match {
        case None => ""
        case Some(b) =>
          val parts = body.split(
            java.util.regex.Pattern.quote("--" + b), -1)
            .drop(1) // preamble
            .takeWhile(p => !p.startsWith("--"))
            .map(_.stripPrefix("\n"))
          parts.iterator.map { p =>
            val (ph, pb) = parseHeaders(p)
            textOf(ph, pb)
          }.find(_.nonEmpty).getOrElse("")
      }
    } else if (mime.startsWith("text/plain") || !headers.contains("content-type")) {
      decodeBody(body,
        headers.getOrElse("content-transfer-encoding", "7bit")).trim
    } else ""
  }

  /** Full extraction: mbox text → one MailRow per message. */
  def extractMbox(docId: Long, mbox: String): Seq[MailRow] =
    splitMbox(mbox).zipWithIndex.map { case (msg, i) =>
      val (hs, body) = parseHeaders(msg)
      MailRow(docId, i,
        decodeHeader(hs.getOrElse("subject", "")),
        decodeHeader(hs.getOrElse("from", "")),
        hs.getOrElse("content-type", "text/plain").split(";")(0).trim
          .toLowerCase,
        textOf(hs, body))
    }

  // ------------------------------------------------------------ spark

  def extract(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("mbox")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, mbox) => extractMbox(id, mbox) })
      .toDF()
  }

  /** Fixture: a 3-message mbox per doc — (0) plain 7bit with the doc
    * text as body and a FOLDED subject; (1) quoted-printable body with
    * =HH escapes, a soft line break, an mbox-stuffed ">From " line, and
    * an RFC 2047 Q encoded-word subject; (2) multipart/alternative
    * whose text/plain part is base64 (html sibling ignored). Expected
    * values are closed-form in doc_id/text for the oracle. */
  def asMboxPayload(
      spark: SparkSession, df: DataFrame, id: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(
        df.select(col(id).cast("long").as("doc_id"), col(textCol).as("t")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val b64 = java.util.Base64.getEncoder.encodeToString(
          s"b64 body $docId".getBytes("UTF-8"))
        val mbox =
          s"From a$docId@example.com Thu Jan  1 00:00:00 2026\n" +
            s"From: Alice <a$docId@example.com>\n" +
            s"Subject: plain report\n  part $docId\n" +
            "Content-Type: text/plain; charset=UTF-8\n" +
            "\n" +
            text + "\n" +
            s"From b$docId@example.com Thu Jan  1 00:00:01 2026\n" +
            s"From: Bob <b$docId@example.com>\n" +
            s"Subject: =?US-ASCII?Q?Re=3A_item_$docId?=\n" +
            "Content-Type: text/plain\n" +
            "Content-Transfer-Encoding: quoted-printable\n" +
            "\n" +
            "qp =68=69 soft=\nbreak\n" +
            s">From the archive $docId\n" +
            s"From c$docId@example.com Thu Jan  1 00:00:02 2026\n" +
            s"From: Carol <c$docId@example.com>\n" +
            s"Subject: digest $docId\n" +
            s"""Content-Type: multipart/alternative; boundary="b$docId"\n""" +
            "\n" +
            s"--b$docId\n" +
            "Content-Type: text/html\n\n<p>ignored</p>\n" +
            s"--b$docId\n" +
            "Content-Type: text/plain\n" +
            "Content-Transfer-Encoding: base64\n\n" +
            b64 + "\n" +
            s"--b$docId--\n"
        (docId, mbox)
      }).toDF("doc_id", "mbox")
  }
}
