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

  test("G.711 mu-law/A-law expansion matches javax.sound's own converters") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // every codeword 0..255, both laws: the JDK ships its OWN G.711
    // tables (an unrelated CCITT implementation) — its ULAW/ALAW →
    // PCM16 conversion must agree with our expansion on all 256 codes
    for ((enc, mulaw) <- Seq(
        (AudioFormat.Encoding.ULAW, true), (AudioFormat.Encoding.ALAW, false))) {
      val codes = Array.tabulate(256)(_.toByte)
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(codes),
        new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false), 256L)
      val pcm = AudioSystem.getAudioInputStream(
        new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          8000f, 16, 1, 2, 8000f, false), src)
      val raw = pcm.readAllBytes()
      assert(raw.length == 512)
      for (c <- 0 until 256) {
        val jdk = ((raw(2 * c) & 0xff) | (raw(2 * c + 1) << 8)).toShort
        val ours =
          if (mulaw) {
            val u = (~c) & 0xff
            val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
            (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
          } else {
            val a = (c ^ 0x55) & 0xff
            val seg = (a >> 4) & 7
            var t = (a & 0x0f) << 4
            if (seg == 0) t += 8
            else if (seg == 1) t += 0x108
            else t = (t + 0x108) << (seg - 1)
            (if ((a & 0x80) != 0) t else -t).toShort
          }
        assert(jdk == ours,
          s"${if (mulaw) "ULAW" else "ALAW"} code $c: jdk=$jdk ours=$ours")
      }
    }
    // and end-to-end through the WAV container: fixture bytes decode to
    // what javax.sound produces for the same codeword stream
    import spark.implicits._
    for (docId <- Seq(0L, 1L, 2L, 3L, 7L)) {
      val bytes = MultimodalOps.asG711WavPayload(
        spark, Seq(docId).toDF("doc_id"), "doc_id")
        .collect()(0).getAs[Array[Byte]]("payload") // bounded: 1 fixture row
      val (ch, ours) = MultimodalOps.wavPcm(bytes)
        .getOrElse(fail(s"g711 doc $docId quarantined"))
      assert(ch == 1 + ((docId / 2) % 2).toInt)
      val n = 128 + (docId % 8).toInt * 32
      assert(ours.length == n)
      val codes = Array.tabulate(n)(i =>
        ((docId * 31 + i.toLong * 7) % 256).toByte)
      val enc = if (docId % 2 == 0) AudioFormat.Encoding.ULAW
                else AudioFormat.Encoding.ALAW
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(codes),
        new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false), n.toLong)
      val pcm = AudioSystem.getAudioInputStream(
        new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          8000f, 16, 1, 2, 8000f, false), src)
      val raw = pcm.readAllBytes()
      val jdk = Array.tabulate(raw.length / 2)(i =>
        ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort)
      assert(jdk.toSeq == ours.toSeq, s"doc $docId samples diverge")
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
