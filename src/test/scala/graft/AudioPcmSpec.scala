package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

/** The PCM decode + quality-statistics layer.
  *
  * Three independent anchors:
  *   1. the fixture contract — [[MultimodalOps.asPcmWavPayload]] bytes
  *      decode bit-for-bit to the generation formula (the DuckDB
  *      oracle's leg);
  *   2. the JDK's own javax.sound WAV reader agrees with our decoder on
  *      our fixtures (so the fixture bytes are standards-valid WAV, not
  *      a private dialect we happen to round-trip);
  *   3. hand-computed statistics on a tiny known sample stream pin every
  *      measure's definition (peak/energy/DC/clip/silence/ZCR).
  */
class AudioPcmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def formula(docId: Long): (Int, Array[Short]) = {
    val channels = 1 + (docId % 2).toInt
    val n = 128 + (docId % 8).toInt * 32
    val div = 65536 >> (4 * (docId % 4).toInt)
    (channels, Array.tabulate(n)(i =>
      (((docId * 7919 + i.toLong * 2641) % div) - div / 2).toShort))
  }

  private def fixtureBytes(docId: Long): Array[Byte] = {
    import spark.implicits._
    val df = Seq(docId).toDF("doc_id")
    MultimodalOps.asPcmWavPayload(spark, df, "doc_id")
      .collect()(0).getAs[Array[Byte]]("payload") // bounded: 1 fixture row
  }

  test("fixture decodes bit-for-bit to the generation formula (all tiers)") {
    for (docId <- 0L to 15L) { // covers every (channels, n, amplitude) shape
      val (ch, want) = formula(docId)
      val (gotCh, got) = MultimodalOps.wavPcm(fixtureBytes(docId))
        .getOrElse(fail(s"doc $docId failed to decode"))
      assert(gotCh == ch)
      assert(got.toSeq == want.toSeq)
    }
  }

  test("javax.sound decodes our fixture WAVs to the same samples") {
    import javax.sound.sampled.AudioSystem
    for (docId <- Seq(0L, 1L, 5L, 10L)) {
      val bytes = fixtureBytes(docId)
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = in.getFormat
      assert(f.getSampleSizeInBits == 16 && !f.isBigEndian)
      assert(f.getChannels == 1 + (docId % 2).toInt)
      assert(f.getSampleRate == 16000f)
      val raw = in.readAllBytes()
      val jdk = Array.tabulate(raw.length / 2)(i =>
        ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort)
      val (_, ours) = MultimodalOps.wavPcm(bytes).get
      assert(jdk.toSeq == ours.toSeq)
    }
  }

  test("statistics match hand computation on a known stream") {
    // samples: 100, -200, 0, -32700, 32767, 63, -63, 5
    val s = Array[Short](100, -200, 0, -32700, 32767, 63, -63, 5)
    val st = MultimodalOps.pcmStats(7L, 2, s)
    assert(st.doc_id == 7L && st.channels == 2 && st.n_samples == 8)
    assert(st.peak == 32767)
    assert(st.sum_sq == s.map(v => v.toLong * v).sum)
    assert(st.dc_sum == s.map(_.toLong).sum)
    assert(st.clip_count == 2)    // -32700 and 32767
    assert(st.silence_count == 4) // 0, 63, -63, 5
    // sign pattern (>=0): + - + - + + - +  -> 6 transitions
    assert(st.zero_crossings == 6)
  }

  test("malformed and out-of-scope payloads quarantine to None") {
    assert(MultimodalOps.wavPcm("not a wav at all".getBytes).isEmpty)
    val ok = fixtureBytes(0L)
    // truncate mid-data: the data chunk overruns the payload -> malformed
    assert(MultimodalOps.wavPcm(ok.take(60)).isEmpty)
    // 8-bit PCM is IN scope since the width-matrix round: the same data
    // bytes reinterpret as 8-bit samples (2x the count, unsigned scale)
    val b8 = ok.clone(); b8(34) = 8
    val dec8 = MultimodalOps.wavPcm(b8)
    assert(dec8.isDefined)
    assert(dec8.get._2.length == 2 * MultimodalOps.wavPcm(ok).get._2.length)
    // a width NO integer-PCM profile defines (12-bit) quarantines
    val b12 = ok.clone(); b12(34) = 12
    assert(MultimodalOps.wavPcm(b12).isEmpty)
    // a float tag must carry 32-bit samples — 16-bit "float" is malformed
    val bf = ok.clone(); bf(20) = 3
    assert(MultimodalOps.wavPcm(bf).isEmpty)
  }
}
