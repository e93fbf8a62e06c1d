package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingestion — the container format
  * web-crawl corpora actually arrive in (Common Crawl publishes WARC):
  * the missing first step in front of the existing text-analysis tier
  * (HTML strip, langid, quality, dedup all consume the documents this
  * layer extracts).
  *
  * Real byte-level STREAMING parsing from the public spec — a Common
  * Crawl segment is ~1 GB gzipped / 3-5 GB decompressed, so nothing
  * here ever holds a whole file (or a whole decompressed member) in
  * memory:
  *   - [[GzipMemberStream]]: concatenated gzip members (RFC 1952)
  *     hand-framed over a 64 KiB compressed window, per-member
  *     CRC32/ISIZE verification, and member-boundary RESYNC on
  *     corruption — one truncated member cannot drop the rest of a
  *     segment.
  *   - [[parseWarcStream]]: incremental record walk — `WARC/1.x`
  *     version line, CRLF header block (folded-header tolerant),
  *     `Content-Length`-framed payload — one record in memory at a
  *     time, payloads capped at a configurable per-RECORD bound
  *     (oversized payloads are streamed past, never buffered), and
  *     every drop surfaced as a [[WarcQuarantine]] instead of a
  *     silent zero-row file.
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

  /** One observable drop: why bytes produced no record. */
  final case class WarcQuarantine(reason: String, detail: String)

  /** Per-RECORD payload cap (not per-file): a single WARC record is one
    * fetched page — 1 GiB is far past any sane crawl payload, while a
    * multi-GB segment of normal records streams through unharmed. */
  val DefaultMaxRecordBytes: Long = 1L << 30

  /** InputStream over concatenated gzip members (RFC 1952), hand-framed:
    * bounded memory (one 64 KiB compressed window + the inflater),
    * per-member CRC32/ISIZE verification, and member-boundary resync on
    * corruption — a truncated or corrupt member records a quarantine
    * event in [[events]], the stream scans the compressed bytes for the
    * next member magic and resumes. (The JDK GZIPInputStream is not
    * used because it aborts the whole stream at the first bad member.)
    * Every resync bumps [[generation]]; the record walker checks it at
    * buffer-refill boundaries so a half-read record is invalidated
    * instead of silently splicing bytes across the gap. */
  private[ops] final class GzipMemberStream(raw: java.io.InputStream)
      extends java.io.InputStream {
    private val win = new Array[Byte](1 << 16)
    private var wPos = 0
    private var wLen = 0
    private var rawEof = false
    private val inf = new java.util.zip.Inflater(true)
    private val crc = new java.util.zip.CRC32
    private var inBody = false
    private var eof = false
    val events = scala.collection.mutable.ArrayBuffer.empty[WarcQuarantine]
    var generation: Int = 0

    private def fill(): Boolean = {
      if (wPos < wLen) return true
      if (rawEof) return false
      wPos = 0; wLen = 0
      var n = raw.read(win)
      while (n == 0) n = raw.read(win)
      if (n < 0) { rawEof = true; false } else { wLen = n; true }
    }
    private def readU8(): Int =
      if (fill()) { val b = win(wPos) & 0xff; wPos += 1; b } else -1
    private def skipN(n: Int): Boolean = {
      var left = n
      while (left > 0) {
        if (!fill()) return false
        val take = math.min(left, wLen - wPos)
        wPos += take; left -= take
      }
      true
    }
    private def skipZeroTerminated(): Boolean = {
      var b = readU8()
      while (b > 0) b = readU8()
      b == 0
    }
    /** FLG byte onward (magic + CM already consumed). */
    private def headerTail(): Boolean = {
      val flg = readU8()
      if (flg < 0 || !skipN(6)) return false
      if ((flg & 4) != 0) { // FEXTRA: LE16 length + data
        val l1 = readU8(); val l2 = readU8()
        if (l2 < 0 || !skipN(l1 | (l2 << 8))) return false
      }
      if ((flg & 8) != 0 && !skipZeroTerminated()) return false
      if ((flg & 16) != 0 && !skipZeroTerminated()) return false
      if ((flg & 2) != 0 && !skipN(2)) return false
      true
    }
    /** Right(true)=member body follows; Right(false)=clean EOF before
      * any header byte; Left(reason)=malformed. */
    private def header(): Either[String, Boolean] = {
      val m1 = readU8()
      if (m1 < 0) return Right(false)
      val m2 = readU8()
      if (m1 != 0x1f || m2 != 0x8b) return Left("gzip_bad_magic")
      val cm = readU8()
      if (cm != 8) return Left("gzip_bad_method")
      if (!headerTail()) Left("gzip_header_truncated") else Right(true)
    }
    private def trailerOk(): Boolean = {
      val t = new Array[Long](8)
      var i = 0
      while (i < 8) {
        val b = readU8(); if (b < 0) return false; t(i) = b.toLong; i += 1
      }
      val expCrc = t(0) | (t(1) << 8) | (t(2) << 16) | (t(3) << 24)
      val expLen = t(4) | (t(5) << 8) | (t(6) << 16) | (t(7) << 24)
      expCrc == crc.getValue &&
        expLen == (inf.getBytesWritten & 0xffffffffL)
    }
    /** Skip compressed bytes to the next member magic and resume. */
    private def resync(reason: String): Unit = {
      events += WarcQuarantine(reason,
        "member dropped; resyncing at next gzip member magic")
      generation += 1
      inf.reset(); crc.reset(); inBody = false
      var p2 = -1; var p1 = -1
      while (true) {
        val b = readU8()
        if (b < 0) { eof = true; return }
        if (p2 == 0x1f && p1 == 0x8b && b == 8) {
          if (headerTail()) { inf.reset(); crc.reset(); inBody = true; return }
        }
        p2 = p1; p1 = b
      }
    }
    override def read(): Int = {
      val b = new Array[Byte](1)
      val n = read(b, 0, 1)
      if (n < 0) -1 else b(0) & 0xff
    }
    override def read(out: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (!eof) {
        if (!inBody) {
          header() match {
            case Right(false) => eof = true
            case Right(true) => inf.reset(); crc.reset(); inBody = true
            case Left(r) => resync(r)
          }
        } else {
          try {
            if (inf.needsInput) {
              if (!fill()) {
                events += WarcQuarantine("gzip_truncated",
                  "EOF inside a gzip member")
                generation += 1
                eof = true
                return -1
              }
              inf.setInput(win, wPos, wLen - wPos)
              wPos = wLen // logically handed over; remainder reclaimed below
            }
            val n = inf.inflate(out, off, len)
            if (n > 0) { crc.update(out, off, n); return n }
            if (inf.finished()) {
              wPos = wLen - inf.getRemaining
              if (!trailerOk()) resync("gzip_trailer_mismatch")
              else { inf.reset(); crc.reset(); inBody = false }
            }
          } catch {
            case _: java.util.zip.DataFormatException =>
              wPos = wLen - inf.getRemaining
              resync("gzip_corrupt")
          }
        }
      }
      -1
    }
    override def close(): Unit = {
      inf.end()
      raw.close()
    }
  }

  /** Bounded reader for the record walk: CRLF lines (cap-bounded) and
    * exact/skip payload reads over one small buffer. Reads never cross
    * a decompressor resync ([[GzipMemberStream.generation]] checked at
    * refill boundaries), so a corrupt member invalidates only the
    * record it landed in — the next member's records parse cleanly. */
  private final class ByteReader(in: java.io.InputStream, gen: () => Int) {
    private val buf = new Array[Byte](1 << 16)
    private var pos = 0
    private var len = 0
    private var eofFlag = false
    private def fill(): Boolean = {
      if (pos < len) return true
      if (eofFlag) return false
      pos = 0; len = 0
      var n = in.read(buf)
      while (n == 0) n = in.read(buf)
      if (n < 0) { eofFlag = true; false } else { len = n; true }
    }
    /** Next LF-terminated line, CR stripped, UTF-8; null at EOF. Bytes
      * past maxLen are consumed but dropped (header-bomb guard). */
    def readLine(maxLen: Int = 1 << 16): String = {
      if (!fill()) return null
      val bos = new java.io.ByteArrayOutputStream(96)
      var done = false
      while (!done) {
        if (!fill()) done = true
        else {
          val b = buf(pos); pos += 1
          if (b == '\n') done = true
          else if (bos.size < maxLen) bos.write(b)
        }
      }
      val raw = bos.toByteArray
      val n = if (raw.nonEmpty && raw(raw.length - 1) == '\r')
        raw.length - 1 else raw.length
      new String(raw, 0, n, java.nio.charset.StandardCharsets.UTF_8)
    }
    /** Read exactly n bytes: (bytes, complete). Incomplete means EOF or
      * a member resync landed mid-record (bytes after the resync stay
      * buffered for the NEXT record). */
    def readFully(n: Int): (Array[Byte], Boolean) = {
      val g0 = gen()
      val out = new Array[Byte](n)
      var got = 0
      var boundary = false
      while (got < n && !boundary) {
        if (pos >= len) {
          if (!fill()) boundary = true
          else if (gen() != g0) { boundary = true } // don't consume spliced bytes
        }
        if (!boundary) {
          val take = math.min(n - got, len - pos)
          System.arraycopy(buf, pos, out, got, take)
          pos += take; got += take
        }
      }
      if (got == n) (out, true) else (java.util.Arrays.copyOf(out, got), false)
    }
    /** Skip exactly n bytes without buffering them (oversized records). */
    def skipFully(n: Long): Boolean = {
      val g0 = gen()
      var left = n
      while (left > 0) {
        if (pos >= len) {
          if (!fill()) return false
          if (gen() != g0) return false
        }
        val take = math.min(left, (len - pos).toLong).toInt
        pos += take; left -= take
      }
      true
    }
  }

  /** Streaming WARC record walk: one record in memory at a time,
    * payloads capped at `maxRecordBytes` (oversized payloads are
    * streamed past and quarantined, never buffered), malformed regions
    * quarantined with the walk resuming at the next `WARC/` version
    * line. Gzip input (plain, whole-file, or the Common Crawl
    * record-per-member layout) is detected by magic and decompressed
    * member-by-member with corruption resync. The caller owns `in`. */
  def parseWarcStream(
      in: java.io.InputStream,
      maxRecordBytes: Long = DefaultMaxRecordBytes)
      : Iterator[Either[WarcQuarantine, WarcRecord]] = {
    val pb = new java.io.PushbackInputStream(in, 2)
    val b0 = pb.read()
    val b1 = if (b0 < 0) -1 else pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    val gz: Option[GzipMemberStream] =
      if (b0 == 0x1f && b1 == 0x8b) Some(new GzipMemberStream(pb)) else None
    val r = new ByteReader(gz.getOrElse(pb),
      () => gz.map(_.generation).getOrElse(0))

    new Iterator[Either[WarcQuarantine, WarcRecord]] {
      private val pending =
        scala.collection.mutable.Queue.empty[Either[WarcQuarantine, WarcRecord]]
      private var done = false

      private def drainGz(): Unit = gz.foreach { g =>
        g.events.foreach(e => pending.enqueue(Left(e)))
        g.events.clear()
      }

      private def step(): Unit = {
        // 1. find a version line; one quarantine per garbage run
        var line = r.readLine()
        if (line == null) { done = true; return }
        var skipped = 0
        while (line != null &&
            !(line.startsWith("WARC/") && line.length <= 16)) {
          if (line.nonEmpty) skipped += 1
          line = r.readLine()
        }
        if (skipped > 0)
          pending.enqueue(Left(WarcQuarantine("resync",
            s"$skipped non-record line(s) before next version line")))
        if (line == null) { done = true; return }
        // 2. header block (obs-fold tolerant), bounded
        var recType = ""
        var uri = ""
        var ctype = ""
        var clen = -1L
        var last = ""
        var nHeader = 0
        var h = r.readLine()
        while (h != null && h.nonEmpty && nHeader <= 512) {
          nHeader += 1
          val l =
            if (h.startsWith(" ") || h.startsWith("\t")) last + h.trim
            else h
          last = l
          val c = l.indexOf(':')
          if (c > 0) {
            val k = l.substring(0, c).trim.toLowerCase
            val v = l.substring(c + 1).trim
            k match {
              case "warc-type" => recType = v
              case "warc-target-uri" =>
                uri = v.stripPrefix("<").stripSuffix(">")
              case "content-type" => ctype = v
              case "content-length" =>
                clen = try v.toLong catch { case _: Exception => -1L }
              case _ => ()
            }
          }
          h = r.readLine()
        }
        if (nHeader > 512) {
          pending.enqueue(Left(WarcQuarantine("header_overflow",
            s"$recType $uri: >512 header lines")))
          return // version-line scan resyncs
        }
        if (h == null) {
          pending.enqueue(Left(WarcQuarantine("truncated_header",
            s"EOF or member break inside record header ($recType $uri)")))
          return
        }
        if (clen < 0) {
          pending.enqueue(Left(WarcQuarantine("missing_content_length",
            s"$recType $uri")))
          return
        }
        // 3. payload: Content-Length framed, capped per RECORD
        if (clen > maxRecordBytes || clen > Int.MaxValue - 8) {
          pending.enqueue(Left(WarcQuarantine("record_too_large",
            s"$recType $uri content-length=$clen cap=$maxRecordBytes")))
          if (!r.skipFully(clen)) return // EOF/member break while skipping
        } else {
          val (payload, complete) = r.readFully(clen.toInt)
          if (!complete)
            pending.enqueue(Left(WarcQuarantine("truncated_payload",
              s"$recType $uri got=${payload.length} want=$clen")))
          else
            pending.enqueue(Right(WarcRecord(recType, uri, ctype, payload)))
        }
        // trailing CRLF CRLF is consumed by the next version-line scan
      }

      private def advance(): Unit =
        while (pending.isEmpty && !done) {
          step()
          drainGz()
        }

      override def hasNext: Boolean = { advance(); pending.nonEmpty }
      override def next(): Either[WarcQuarantine, WarcRecord] = {
        advance()
        pending.dequeue()
      }
    }
  }

  /** Full parse of in-memory bytes: (records, quarantine events). */
  def parseWarcAll(
      raw: Array[Byte], maxRecordBytes: Long = DefaultMaxRecordBytes)
      : (Seq[WarcRecord], Seq[WarcQuarantine]) = {
    val recs = Seq.newBuilder[WarcRecord]
    val qs = Seq.newBuilder[WarcQuarantine]
    parseWarcStream(new java.io.ByteArrayInputStream(raw), maxRecordBytes)
      .foreach {
        case Right(rec) => recs += rec
        case Left(q) => qs += q
      }
    (recs.result(), qs.result())
  }

  /** Every well-formed record of an in-memory file (quarantines
    * dropped — use [[parseWarcAll]]/[[parseWarcStream]] where drops
    * must be observable). */
  def parseWarc(raw: Array[Byte]): Seq[WarcRecord] = parseWarcAll(raw)._1

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

  /** One decode-ledger row per file: how many records parsed, how many
    * drops, and the first (alphabetical) drop reason — the same honest
    * quarantine lane every other decode surface carries, so a file
    * that yields zero documents is observable, never silent. */
  final case class WarcLedger(
      doc_id: Long, n_ok_records: Int, n_quarantine: Int,
      quarantined: Boolean, first_reason: String,
      target_uri: String, body_len: Long)

  def extractLedger(
      spark: SparkSession, media: DataFrame,
      maxRecordBytes: Long = DefaultMaxRecordBytes): Dataset[WarcLedger] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (recs, qs) = parseWarcAll(bytes, maxRecordBytes)
        val resp = recs.find(_.recType.equalsIgnoreCase("response"))
        val body = resp.flatMap(r => httpResponse(r.payload)).map(_._3)
        WarcLedger(id, recs.size, qs.size, qs.nonEmpty,
          qs.map(_.reason).sorted.headOption.getOrElse(""),
          resp.map(_.targetUri).getOrElse(""),
          body.map(_.length.toLong).getOrElse(-1L))
      })
  }

  /** One ingest row: lane `doc` per response record, lane `quarantine`
    * per drop — shared by the batch and streaming file front doors. */
  private def ingestRows(
      f: String, in: java.io.InputStream, maxRecordBytes: Long)
      : Iterator[(String, String, String, Int, String, Long, String)] =
    parseWarcStream(in, maxRecordBytes).flatMap {
      case Left(q) =>
        Some((f, "quarantine", "", -1, "", -1L, q.reason))
      case Right(rec) if rec.recType.equalsIgnoreCase("response") =>
        httpResponse(rec.payload).map { case (status, hdrs, body) =>
          (f, "doc", rec.targetUri, status,
            hdrs.getOrElse("content-type", ""), body.length.toLong, "")
        }
      case Right(_) => None
    }

  private val IngestCols = Seq(
    "path", "lane", "uri", "status", "content_type", "n_body_bytes",
    "reason")

  /** Path-based crawl ingestion — the at-scale front door: one task per
    * file, each file opened as a STREAM through the session Hadoop
    * filesystem (a 5 GB-decompressed Common Crawl segment flows through
    * a few hundred KB of task memory; nothing materializes a whole
    * segment), per-record size cap, and a quarantine lane so every
    * drop is a row. Columns: (path, lane, uri, status, content_type,
    * n_body_bytes, reason) — lane `doc` rows carry one entry per
    * response record, lane `quarantine` rows the drops. */
  def ingestFiles(
      spark: SparkSession, dir: String,
      maxRecordBytes: Long = DefaultMaxRecordBytes): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = spark.sessionState.newHadoopConf()
    val root = new HPath(dir)
    val fs = root.getFileSystem(conf)
    val st = fs.getFileStatus(root)
    val files =
      (if (st.isDirectory)
        fs.listStatus(root).toSeq.filter(_.isFile).map(_.getPath)
          .filter(p => p.getName.contains(".warc") &&
            !p.getName.startsWith("_"))
      else Seq(root)).map(_.toString).sorted
    require(files.nonEmpty, s"warc: no .warc files under $dir")
    val hconf = new org.apache.spark.util.SerializableConfiguration(conf)
    spark.sparkContext.parallelize(files, files.size)
      .flatMap { f =>
        val p = new HPath(f)
        val in = p.getFileSystem(hconf.value).open(p)
        // early-terminating consumers (LIMIT, take) must not leak the
        // handle for the executor's lifetime
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        ingestRows(f, in, maxRecordBytes)
      }
      .toDF(IngestCols: _*)
  }

  /** Streaming twin of [[ingestFiles]]: tails a directory of crawl
    * segments through the binaryFile source with ONLY the path column
    * projected (content never rides the source row — each task opens
    * its file as a stream, same bounded-memory walk as batch), and the
    * quarantine lane appends exactly like the doc lane so drops stay
    * observable under continuous ingestion. Admission control
    * (maxFilesPerTrigger / maxBytesPerTrigger) composes at the source. */
  def ingestFilesStream(
      spark: SparkSession, dir: String,
      maxRecordBytes: Long = DefaultMaxRecordBytes): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField => SF, StructType => ST, TimestampType}
    val binarySchema = ST(Seq(
      SF("path", StringType),
      SF("modificationTime", TimestampType),
      SF("length", LongType),
      SF("content", BinaryType)))
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val cap = maxRecordBytes
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .schema(binarySchema)
      .load(dir)
      .select(col("path")).as[String]
      .flatMap { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val in = p.getFileSystem(hconf.value).open(p)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        ingestRows(f, in, cap)
      }
      .toDF(IngestCols: _*)
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
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("body")))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val gz = new MemberGzipper()
        rows.map { case (docId, body) =>
          val records = fixtureRecords(docId, body,
            s"https://example.com/doc/$docId", lieContentLength = false)
          val bytes =
            if (docId % 2 == 1) records.map(gz.member).reduce(_ ++ _)
            else records.reduce(_ ++ _)
          (docId, bytes)
        }
      }.toDF("doc_id", "payload")
  }

  /** WET-layout extraction: Common Crawl's text derivative ships the
    * SAME container with `WARC-Type: conversion` records whose payload
    * IS the extracted plain text (no HTTP envelope) — the corpus most
    * LLM pipelines actually start from. One row per conversion record:
    * (doc_id, target_uri, text). */
  def extractConversions(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWarc(bytes).filter(_.recType.equalsIgnoreCase("conversion"))
          .map { r =>
            (id, r.targetUri,
              new String(r.payload, java.nio.charset.StandardCharsets.UTF_8))
          }
      }).toDF("doc_id", "target_uri", "text")
  }

  /** WET fixture: warcinfo + one `conversion` record per doc whose
    * payload is the document text verbatim (the WET contract); odd ids
    * take the gzip-member lane. */
  def asWetPayload(
      spark: SparkSession, df: DataFrame, id: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("body")))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val gz = new MemberGzipper()
        rows.map { case (docId, body) =>
          def record(
              tpe: String, uri: String, ctype: String,
              payload: Array[Byte]): Array[Byte] = {
            val head = s"WARC/1.0\r\nWARC-Type: $tpe\r\n" +
              s"WARC-Record-ID: <urn:graft:wet:$docId:$tpe>\r\n" +
              "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
              (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
              s"Content-Type: $ctype\r\nContent-Length: ${payload.length}" +
              "\r\n\r\n"
            head.getBytes("UTF-8") ++ payload ++
              "\r\n\r\n".getBytes("US-ASCII")
          }
          val records = Seq(
            record("warcinfo", "", "application/warc-fields",
              "software: graft-wet-fixture\r\n".getBytes("US-ASCII")),
            record("conversion", s"https://example.com/doc/$docId",
              "text/plain", body))
          val bytes =
            if (docId % 2 == 1) records.map(gz.member).reduce(_ ++ _)
            else records.reduce(_ ++ _)
          (docId, bytes)
        }
      }.toDF("doc_id", "payload")
  }

  /** Routed fixture for the composed curation pipeline: same record
    * shapes as [[asWarcPayload]] but the response URI spreads over 17
    * hosts and three path families (`/private/doc/N` for id%3==0,
    * `/private/ok/doc/N` for id%3==1, `/pub/doc/N` otherwise), so the
    * robots verdict downstream varies per document. */
  def asWarcPayloadRouted(
      spark: SparkSession, df: DataFrame, id: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("body")))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val gz = new MemberGzipper()
        rows.map { case (docId, body) =>
          val pathFamily = (docId % 3) match {
            case 0 => "/private/doc/"
            case 1 => "/private/ok/doc/"
            case _ => "/pub/doc/"
          }
          val uri =
            s"https://host${docId % 17}.example.com$pathFamily$docId"
          val records = fixtureRecords(docId, body, uri,
            lieContentLength = false)
          val bytes =
            if (docId % 2 == 1) records.map(gz.member).reduce(_ ++ _)
            else records.reduce(_ ++ _)
          (docId, bytes)
        }
      }.toDF("doc_id", "payload")
  }

  /** Fault-injection fixture — all files in the gzip-member layout,
    * two deterministic fault lanes for the quarantine oracle:
    * `doc_id % 7 == 0` truncates the response MEMBER to its first 24
    * compressed bytes (mid-deflate — the member dies, the two earlier
    * members must still parse), `doc_id % 7 == 3` lies a huge
    * Content-Length (an over-cap record that must be skipped, not
    * buffered). Every other id is clean. */
  def asWarcPayloadFaulty(
      spark: SparkSession, df: DataFrame, id: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("body")))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val gz = new MemberGzipper()
        rows.map { case (docId, body) =>
          val records = fixtureRecords(docId, body,
            s"https://example.com/doc/$docId",
            lieContentLength = docId % 7 == 3)
          val members = records.map(gz.member)
          val bytes =
            if (docId % 7 == 0)
              (members.init :+ members.last.take(24)).reduce(_ ++ _)
            else members.reduce(_ ++ _)
          (docId, bytes)
        }
      }.toDF("doc_id", "payload")
  }

  /** Per-partition reusable gzip-member encoder for the fixtures. The old
    * shape (a fresh GZIPOutputStream per record at the default compression
    * level) paid a Deflater allocation + native init and level-6 deflate
    * for every ~1-4 KB record — the dominant cost of the WARC/WET fixture
    * lanes. One Deflater at BEST_SPEED, reset between members, produces a
    * spec-valid RFC 1952 member stream; the compressed bytes differ from
    * the old ones but every declared output is computed from the PARSED
    * payloads, which are bit-identical. */
  private final class MemberGzipper {
    private val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED, true)
    private val crc = new java.util.zip.CRC32
    private val buf = new Array[Byte](1 << 16)
    def member(r: Array[Byte]): Array[Byte] = {
      defl.reset(); crc.reset()
      crc.update(r)
      defl.setInput(r); defl.finish()
      val bos = new java.io.ByteArrayOutputStream(r.length / 2 + 32)
      // RFC 1952 header: magic, CM=deflate, FLG=0, MTIME=0, XFL=0, OS=0
      bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
      while (!defl.finished()) {
        val n = defl.deflate(buf)
        bos.write(buf, 0, n)
      }
      def le32(v: Long): Unit = {
        bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
        bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
      }
      le32(crc.getValue)
      le32(r.length.toLong & 0xffffffffL)
      bos.toByteArray
    }
  }

  private def gzipMember(r: Array[Byte]): Array[Byte] =
    new MemberGzipper().member(r)

  /** The three fixture records (warcinfo, request, response) for one
    * doc; `lieContentLength` frames the response with a 1 TiB
    * Content-Length (the oversized-record fault lane). */
  private def fixtureRecords(
      docId: Long, body: Array[Byte], uri: String,
      lieContentLength: Boolean): Seq[Array[Byte]] = {
    def record(
        tpe: String, u: String, ctype: String,
        payload: Array[Byte], lie: Boolean): Array[Byte] = {
      val sb = new StringBuilder
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: $tpe\r\n")
      sb.append(s"WARC-Record-ID: <urn:graft:$docId:$tpe>\r\n")
      sb.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      if (u.nonEmpty) sb.append(s"WARC-Target-URI: $u\r\n")
      sb.append(s"Content-Type: $ctype\r\n")
      val declared = if (lie) 1L << 40 else payload.length.toLong
      sb.append(s"Content-Length: $declared\r\n")
      sb.append("\r\n")
      sb.toString.getBytes("UTF-8") ++ payload ++
        "\r\n\r\n".getBytes("US-ASCII")
    }
    val http = (s"HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes("US-ASCII") ++ body
    Seq(
      record("warcinfo", "", "application/warc-fields",
        "software: graft-fixture\r\n".getBytes("US-ASCII"), lie = false),
      record("request", uri, "application/http;msgtype=request",
        s"GET /doc/$docId HTTP/1.1\r\nHost: example.com\r\n\r\n"
          .getBytes("US-ASCII"), lie = false),
      record("response", uri, "application/http;msgtype=response",
        http, lie = lieContentLength))
  }
}
