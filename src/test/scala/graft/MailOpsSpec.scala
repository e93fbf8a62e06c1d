package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MailOps

/** MIME/mbox edge cases the registry fixture doesn't reach: nested
  * multiparts, B encoded-words, malformed QP passthrough, boundary
  * parameters in quotes, and framing corner cases. */
class MailOpsSpec extends AnyFunSuite {

  test("mbox framing: envelope drops, stuffing unstuffs, no-text tail") {
    val mbox = "From a@x Thu Jan  1 00:00:00 2026\nSubject: s1\n\nbody1\n" +
      ">From stuffed\nFrom b@x Thu Jan  1 00:00:01 2026\nSubject: s2\n\nbody2"
    val msgs = MailOps.splitMbox(mbox)
    assert(msgs.length == 2)
    assert(msgs(0).endsWith("body1\nFrom stuffed"))
    assert(msgs(1).endsWith("body2"))
    // text before the first "From " line is not a message
    assert(MailOps.splitMbox("garbage\nno envelope").isEmpty)
  }

  test("header unfolding and case-insensitive names") {
    val (hs, body) = MailOps.parseHeaders(
      "SUBJECT: one\n two\n\tthree\nX-Other: v\n\nB")
    assert(hs("subject") == "one two three")
    assert(hs("x-other") == "v")
    assert(body == "B")
  }

  test("encoded words: B base64, adjacent-word joining, charset") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "héllo".getBytes("UTF-8"))
    assert(MailOps.decodeHeader(s"=?UTF-8?B?$b64?=") == "héllo")
    // whitespace between two encoded words drops; around plain text stays
    assert(MailOps.decodeHeader(
      "=?US-ASCII?Q?ab?=   =?US-ASCII?Q?cd?= tail") == "abcd tail")
    // latin-1 Q: =E9 is é in ISO-8859-1
    assert(MailOps.decodeHeader("=?ISO-8859-1?Q?caf=E9?=") == "café")
  }

  test("quoted-printable: malformed escapes pass through, soft breaks") {
    assert(new String(MailOps.qpDecode("a=ZZb=4"), "UTF-8") == "a=ZZb=4")
    assert(new String(MailOps.qpDecode("one=\ntwo"), "UTF-8") == "onetwo")
    // header form: '=' + newline is NOT a soft break (headers are unfolded
    // before decode)
    assert(new String(
      MailOps.qpDecode("x=41", header = true), "UTF-8") == "xA")
  }

  test("nested multipart recurses to the inner text/plain") {
    val inner = "Content-Type: multipart/mixed; boundary=\"in\"\n\n" +
      "--in\nContent-Type: image/png\n\nPNG\n" +
      "--in\nContent-Type: text/plain\n\ndeep text\n--in--\n"
    val outer = Map(
      "content-type" -> "multipart/alternative; boundary=out")
    val body = "--out\n" + inner + "--out--\n"
    assert(MailOps.textOf(outer, body) == "deep text")
  }

  test("non-text single-part yields empty, untyped decodes as plain") {
    assert(MailOps.textOf(
      Map("content-type" -> "application/pdf"), "%PDF") == "")
    assert(MailOps.textOf(Map.empty, " plain \n") == "plain")
  }

  test("streaming twin: mbox files extract with batch parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_mbox").toString
    val staged = spark.range(12).select($"id".as("doc_id"),
      concat(lit("body words for doc "), $"id".cast("string")).as("text"))
    val payloads = MailOps.asMboxPayload(spark, staged, "doc_id", "text")
      .collect()
    payloads.foreach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"box-${r.getLong(0)}.mbox"),
        r.getString(1).getBytes("UTF-8"))
    }
    val streamed = graft.streaming.StreamingOps.runToCompletion(spark,
      graft.streaming.StreamingOps.mboxIngestStream(spark, dir),
      "mbox_stream_parity", mode = "append")
      .withColumn("doc_id",
        regexp_extract($"file", "box-(\\d+)\\.mbox", 1).cast("long"))
      .select("doc_id", "msg_seq", "subject", "from", "content_type",
        "body_len", "body_md5")
      .collect().map(_.toSeq).toSet
    val media = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(payloads.toSeq).asJava,
      payloads.head.schema)
    val batch = MailOps.extract(spark, media)
      .select($"doc_id", $"msg_seq", $"subject", $"from", $"content_type",
        length($"body").as("body_len"),
        md5($"body".cast("binary")).as("body_md5"))
      .collect().map(_.toSeq).toSet
    assert(streamed.size == 36, s"12 mailboxes x 3 messages: ${streamed.size}")
    assert(streamed == batch, "stream and batch mail pipelines must agree")
  }
}
