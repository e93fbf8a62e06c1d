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
