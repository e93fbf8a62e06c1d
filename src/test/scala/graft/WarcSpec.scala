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

  test("zst/gz shard readers: both compressors, line fidelity, sink loop") {
    import graft.sources.ZstText
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_zst").toString
    // hand-write one .zst and one .gz shard with known lines
    val zstF = new java.io.File(s"$tmp/a.jsonl.zst")
    val z = new com.github.luben.zstd.ZstdOutputStream(
      new java.io.FileOutputStream(zstF), 3)
    z.write("{\"k\":1,\"v\":\"uno\"}\n{\"k\":2,\"v\":\"dos\"}\n".getBytes("UTF-8"))
    z.close()
    val gzF = new java.io.File(s"$tmp/b.jsonl.gz")
    val g = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gzF))
    g.write("{\"k\":3,\"v\":\"trés\"}\n".getBytes("UTF-8"))
    g.close()
    val lines = ZstText.readLines(spark, tmp).collect()
    assert(lines.length == 3)
    assert(lines.count(_._1.endsWith(".zst")) == 2)
    val df = ZstText.readJsonl(spark, tmp).orderBy("k").collect()
    assert(df.map(_.getAs[String]("v")).toSeq == Seq("uno", "dos", "trés"),
      "UTF-8 content survives both decompressors")
    // sink loop: write shards from a DataFrame, read back exactly
    import spark.implicits._
    val src = spark.range(500).select($"id",
      md5($"id".cast("string")).as("h"))
    ZstText.writeJsonlZst(src.repartition(3), s"$tmp/out")
    val back = ZstText.readJsonl(spark, s"$tmp/out")
    assert(back.count() == 500)
    assert(back.agg(sum($"id".cast("long"))).head().getLong(0) ==
      500L * 499 / 2)
    assert(new java.io.File(s"$tmp/out/_SUCCESS").exists())
  }

  test("streaming twin: binaryFile WARC tail matches the batch pipeline") {
    import org.apache.spark.sql.functions._
    import graft.ops.WarcOps
    import graft.streaming.StreamingOps
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_stream").toString
    // 30 docs wrapped in the HTML shell, one .warc FILE each (half the
    // ids take the gzip-member lane via the fixture's odd-id rule)
    val pre = "<html><body><p>"
    val post = "</p><script>x</script></html>"
    val staged = spark.range(30).select($"id".as("doc_id"),
      concat(lit(pre), lit("text for doc "), $"id".cast("string"),
        lit(" lorem ipsum dolor sit amet consectetur adipiscing elit"),
        lit(post)).as("text"))
    val payloads = WarcOps.asWarcPayload(spark, staged, "doc_id", "text")
      .collect()
    payloads.foreach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"seg-${r.getLong(0)}.warc"),
        r.getAs[Array[Byte]](1))
    }
    val streamed = StreamingOps.runToCompletion(spark,
      StreamingOps.warcIngestStream(spark, dir),
      "warc_stream_parity", mode = "append")
      .select("uri", "status", "n_clean", "clean_md5")
      .collect().map(_.toSeq).toSet
    val media = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(payloads.toSeq).asJava,
      payloads.head.schema)
    val batch = WarcOps.extractBodies(spark, media)
      .select($"doc_id",
        graft.ops.TextOps.stripHtml($"body").as("clean"))
      .filter(length($"clean") >= 60)
      .join(media.select($"doc_id"), "doc_id")
      .select(
        concat(lit("https://example.com/doc/"), $"doc_id".cast("string"))
          .as("uri"),
        lit(200).as("status"), length($"clean").as("n_clean"),
        md5($"clean".cast("binary")).as("clean_md5"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty, "the gate must admit the long docs")
    assert(streamed == batch, "stream and batch pipelines must agree")
  }

  test(">256 MiB decompressed multi-member segment parses record-by-record") {
    // three gzip members, each one record with a 96 MiB payload —
    // 288 MiB decompressed total, past the old whole-file cap; the
    // streaming walk must yield all three with no quarantine (bounded
    // memory: one record at a time, never the whole decompression)
    val payloadLen = 96 * (1 << 20)
    val chunk = new Array[Byte](1 << 20)
    java.util.Arrays.fill(chunk, 'a'.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    for (i <- 0 until 3) {
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write((s"WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"WARC-Target-URI: https://example.com/big/$i\r\n" +
        s"Content-Length: $payloadLen\r\n\r\n").getBytes("US-ASCII"))
      var left = payloadLen
      while (left > 0) {
        val n = math.min(left, chunk.length)
        gz.write(chunk, 0, n); left -= n
      }
      gz.write("\r\n\r\n".getBytes("US-ASCII"))
      gz.finish()
    }
    val compressed = bos.toByteArray
    assert(compressed.length < (1 << 22), "fixture must stay small on disk")
    var n = 0
    var total = 0L
    graft.ops.WarcOps.parseWarcStream(
      new java.io.ByteArrayInputStream(compressed)).foreach {
      case Right(r) =>
        n += 1
        total += r.payload.length
        assert(r.payload(0) == 'a'.toByte && r.payload.last == 'a'.toByte)
      case Left(q) => fail(s"unexpected quarantine: $q")
    }
    assert(n == 3)
    assert(total == 3L * payloadLen)
    assert(total > (1L << 28), "must exceed the old per-file cap")
  }

  test("oversized record is skipped (not buffered) and later records parse") {
    val full = fixture(8L, "short body") // plain layout (even id)
    // parse with a tiny per-record cap: the response record's HTTP
    // payload exceeds it, the two small records before it do not
    val results = WarcOps.parseWarcStream(
      new java.io.ByteArrayInputStream(full), maxRecordBytes = 60).toSeq
    val recs = results.collect { case Right(r) => r }
    val qs = results.collect { case Left(q) => q }
    assert(recs.map(_.recType) == Seq("warcinfo", "request"))
    assert(qs.exists(_.reason == "record_too_large"))
    // a record AFTER the oversized one still parses: response first
    val reordered = {
      val s = new String(full, "ISO-8859-1")
      val blocks = s.split("(?=WARC/1\\.0)").filter(_.nonEmpty)
      (blocks(2) + blocks(0) + blocks(1)).getBytes("ISO-8859-1")
    }
    val r2 = WarcOps.parseWarcStream(
      new java.io.ByteArrayInputStream(reordered), maxRecordBytes = 60).toSeq
    assert(r2.collect { case Right(r) => r.recType } ==
      Seq("warcinfo", "request"),
      "records after the skipped oversized record must survive")
    assert(r2.collect { case Left(q) => q }
      .exists(_.reason == "record_too_large"))
  }

  test("truncated gzip member quarantines observably, prior members survive") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val staged = spark.range(21).select($"id".as("doc_id"),
      concat(lit("document body for id "), $"id".cast("string"),
        lit(" with some padding text to compress")).as("text"))
    val ledger = WarcOps.extractLedger(spark,
      WarcOps.asWarcPayloadFaulty(spark, staged, "doc_id", "text"))
      .collect().map(l => l.doc_id -> l).toMap
    for (id <- 0L until 21L) {
      val l = ledger(id)
      if (id % 7 == 0) {
        assert(l.n_ok_records == 2, s"doc $id: warcinfo+request survive")
        assert(l.quarantined && l.n_quarantine >= 1)
        assert(l.first_reason == "gzip_truncated", s"doc $id: $l")
        assert(l.target_uri == "" && l.body_len == -1L)
      } else if (id % 7 == 3) {
        assert(l.n_ok_records == 2 && l.quarantined)
        assert(l.first_reason == "record_too_large", s"doc $id: $l")
      } else {
        assert(l.n_ok_records == 3 && !l.quarantined, s"doc $id: $l")
        assert(l.first_reason == "")
        assert(l.target_uri == s"https://example.com/doc/$id")
      }
    }
  }

  test("path-based ingest streams files with a quarantine lane") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_ingest").toString
    val staged = spark.range(14).select($"id".as("doc_id"),
      concat(lit("body text for doc "), $"id".cast("string")).as("text"))
    WarcOps.asWarcPayloadFaulty(spark, staged, "doc_id", "text")
      .collect().foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"seg-${r.getLong(0)}.warc.gz"),
          r.getAs[Array[Byte]](1))
      }
    val rows = WarcOps.ingestFiles(spark, dir)
    val docs = rows.filter($"lane" === "doc")
    val quarantine = rows.filter($"lane" === "quarantine")
    // ids 0,7 truncate (no doc row), 3,10 lie content-length (no doc
    // row) → 10 of 14 produce documents; all four faults are VISIBLE
    assert(docs.count() == 10)
    assert(quarantine.select($"path").distinct().count() == 4)
    assert(docs.select($"status").distinct().collect().map(_.getInt(0))
      .toSeq == Seq(200))
    // early termination (LIMIT) must not throw or leak
    assert(rows.limit(3).collect().length == 3)
  }

  test("streaming ingest twin: doc AND quarantine lanes match batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_ingest_s").toString
    val staged = spark.range(14).select($"id".as("doc_id"),
      concat(lit("streamed body for doc "), $"id".cast("string")).as("text"))
    WarcOps.asWarcPayloadFaulty(spark, staged, "doc_id", "text")
      .collect().foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"seg-${r.getLong(0)}.warc.gz"),
          r.getAs[Array[Byte]](1))
      }
    val streamed = graft.streaming.StreamingOps.runToCompletion(spark,
      WarcOps.ingestFilesStream(spark, dir),
      "warc_ingest_lanes", mode = "append")
      .collect().map(_.toSeq).toSet
    val batch = WarcOps.ingestFiles(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      "stream and batch front doors must emit identical doc+quarantine rows")
    assert(batch.exists(_(1) == "quarantine"),
      "the faulty fixture must surface quarantine rows in both")
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
