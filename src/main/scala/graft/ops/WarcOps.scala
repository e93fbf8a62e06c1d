package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingestion — the container format
  * web-crawl corpora actually arrive in (Common Crawl publishes WARC):
  * the missing first step in front of the existing text-analysis tier
  * (HTML strip, langid, quality, dedup all consume the documents this
  * layer extracts).
  *
  * Real byte-level parsing from the public spec:
  *   - [[parseWarc]]: record walk — `WARC/1.x` version line, CRLF
  *     header block (folded-header tolerant), `Content-Length`-framed
  *     payload, the CRLF CRLF record separator. Handles plain files AND
  *     the standard per-record-gzip-member layout (each record its own
  *     deflate stream, members concatenated — the JDK inflater is
  *     driven member by member so record boundaries survive).
  *   - [[httpResponse]]: the response record's payload is an HTTP/1.x
  *     message — status line + headers + body split at the blank line.
  *
  * Malformed records quarantine per record (the rest of the file still
  * parses) — at crawl scale a single truncated record must not drop a
  * whole 1 GB segment. Per-partition byte work, zero shuffle. */
object WarcOps {

  /** One extracted response document. */
  final case class WarcDoc(
      doc_id: Long, n_records: Int, target_uri: String,
      http_status: Int, content_type: String, body_len: Long,
      body_md5: String)

  /** One parsed WARC record (any type). */
  final case class WarcRecord(
      recType: String, targetUri: String, contentType: String,
      payload: Array[Byte])

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Decompress concatenated gzip members; None when not gzip. */
  private def gunzipAll(b: Array[Byte]): Option[Array[Byte]] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b)
      return None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > (1 << 28)) return None // decompression bomb guard
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  private def indexOf(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = from
    while (i + pat.length <= b.length) {
      var k = 0
      while (k < pat.length && b(i + k) == pat(k)) k += 1
      if (k == pat.length) return i
      i += 1
    }
    -1
  }

  /** Parse every well-formed record; malformed tails drop silently. */
  def parseWarc(raw: Array[Byte]): Seq[WarcRecord] = {
    val b = gunzipAll(raw).getOrElse(raw)
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    val sep = "\r\n\r\n".getBytes("US-ASCII")
    while (i < b.length) {
      // skip inter-record CRLFs
      while (i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n') i += 2
      if (i >= b.length) return out.result()
      val headEnd = indexOf(b, sep, i)
      if (headEnd < 0) return out.result()
      val head = new String(b, i, headEnd - i, "UTF-8")
      val lines = head.split("\r\n")
      if (lines.isEmpty || !lines(0).startsWith("WARC/")) return out.result()
      // header block: Name: value, with obs-fold continuation lines
      var recType = ""
      var uri = ""
      var ctype = ""
      var clen = -1L
      var last = ""
      lines.drop(1).foreach { ln =>
        val l =
          if (ln.startsWith(" ") || ln.startsWith("\t")) last + ln.trim
          else ln
        last = l
        val c = l.indexOf(':')
        if (c > 0) {
          val k = l.substring(0, c).trim.toLowerCase
          val v = l.substring(c + 1).trim
          k match {
            case "warc-type" => recType = v
            case "warc-target-uri" => uri = v.stripPrefix("<").stripSuffix(">")
            case "content-type" => ctype = v
            case "content-length" =>
              clen = try v.toLong catch { case _: Exception => -1L }
            case _ => ()
          }
        }
      }
      if (clen < 0 || headEnd + 4 + clen > b.length) return out.result()
      val payload = java.util.Arrays.copyOfRange(
        b, headEnd + 4, (headEnd + 4 + clen).toInt)
      out += WarcRecord(recType, uri, ctype, payload)
      i = (headEnd + 4 + clen).toInt
    }
    out.result()
  }

  /** HTTP/1.x message split: (status, headers map lowercased, body). */
  def httpResponse(b: Array[Byte])
      : Option[(Int, Map[String, String], Array[Byte])] = {
    val sep = "\r\n\r\n".getBytes("US-ASCII")
    val he = indexOf(b, sep, 0)
    if (he < 0) return None
    val head = new String(b, 0, he, "UTF-8")
    val lines = head.split("\r\n")
    if (lines.isEmpty) return None
    val st = lines(0).split(" ")
    if (st.length < 2 || !st(0).startsWith("HTTP/")) return None
    val status = try st(1).toInt catch { case _: Exception => return None }
    val hdrs = lines.drop(1).flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0) None
      else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
    }.toMap
    Some((status, hdrs, java.util.Arrays.copyOfRange(b, he + 4, b.length)))
  }

  /** Response records → extracted documents (the corpus front door):
    * per file, count records and surface the FIRST response's URI,
    * status, declared type, and body statistics. */
  def extractDocs(spark: SparkSession, media: DataFrame): Dataset[WarcDoc] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, bytes) =>
          val recs = parseWarc(bytes)
          recs.find(_.recType.equalsIgnoreCase("response")).flatMap { r =>
            httpResponse(r.payload).map { case (status, hdrs, body) =>
              md.reset()
              WarcDoc(id, recs.length, r.targetUri, status,
                hdrs.getOrElse("content-type", ""), body.length.toLong,
                md.digest(body).map("%02x".format(_)).mkString)
            }
          }
        }
      }
  }

  /** Response bodies as text — the handoff row the cleaning tier
    * consumes (doc_id, UTF-8 body). */
  def extractBodies(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWarc(bytes).find(_.recType.equalsIgnoreCase("response"))
          .flatMap(r => httpResponse(r.payload))
          .map { case (_, _, body) =>
            (id, new String(body, java.nio.charset.StandardCharsets.UTF_8))
          }
      }).toDF("doc_id", "body")
  }

  /** Fixture: REAL WARC files — warcinfo + request + response records
    * with spec-exact framing; odd ids additionally gzip EACH record as
    * its own member and concatenate (the Common Crawl layout), so the
    * multi-member inflate path sits under the oracle. The response
    * body is the document text, so DuckDB recomputes length/md5 with
    * no parser. */
  def asWarcPayload(
      spark: SparkSession, df: DataFrame, id: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(id).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, body) =>
          def record(
              tpe: String, uri: String, ctype: String,
              payload: Array[Byte]): Array[Byte] = {
            val sb = new StringBuilder
            sb.append("WARC/1.0\r\n")
            sb.append(s"WARC-Type: $tpe\r\n")
            sb.append(s"WARC-Record-ID: <urn:graft:$docId:$tpe>\r\n")
            sb.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
            if (uri.nonEmpty) sb.append(s"WARC-Target-URI: $uri\r\n")
            sb.append(s"Content-Type: $ctype\r\n")
            sb.append(s"Content-Length: ${payload.length}\r\n")
            sb.append("\r\n")
            sb.toString.getBytes("UTF-8") ++ payload ++
              "\r\n\r\n".getBytes("US-ASCII")
          }
          val uri = s"https://example.com/doc/$docId"
          val http = (s"HTTP/1.1 200 OK\r\n" +
            "Content-Type: text/html; charset=utf-8\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n")
            .getBytes("US-ASCII") ++ body
          val info = record("warcinfo", "",
            "application/warc-fields",
            "software: graft-fixture\r\n".getBytes("US-ASCII"))
          val req = record("request", uri, "application/http;msgtype=request",
            s"GET /doc/$docId HTTP/1.1\r\nHost: example.com\r\n\r\n"
              .getBytes("US-ASCII"))
          val resp = record("response", uri,
            "application/http;msgtype=response", http)
          val records = Seq(info, req, resp)
          val bytes =
            if (docId % 2 == 1) {
              // per-record gzip members, concatenated (Common Crawl)
              records.map { r =>
                val bos = new java.io.ByteArrayOutputStream()
                val gz = new java.util.zip.GZIPOutputStream(bos)
                gz.write(r); gz.finish()
                bos.toByteArray
              }.reduce(_ ++ _)
            } else records.reduce(_ ++ _)
          (docId, bytes)
        }
      }.toDF("doc_id", "payload")
  }
}
