package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Vp8Codec, Vp8Encoder}
import graft.ops.Vp8Codec._
import graft.ops.Vp8Encoder.MbSpec

/** VP8 (lossy WebP) key-frame luma decode: the bool-coder pair is
  * property-tested (the encoder is DEFINED by round-trip against the
  * spec-faithful decoder), and frame reconstruction is pinned against
  * an independent integer model of the §12.2/§14 math — no codec code
  * in the expectations. */
class Vp8Spec extends AnyFunSuite {

  // ------------------------------------------------------- bool coder

  test("bool encoder/decoder round-trips random sequences") {
    val rnd = new scala.util.Random(4217)
    for (_ <- 0 until 20) {
      val n = 500 + rnd.nextInt(1500)
      val seq = Array.fill(n)((1 + rnd.nextInt(254), rnd.nextBoolean()))
      val e = new BoolEnc
      seq.foreach { case (p, b) => e.bool(p, b) }
      val bytes = e.flush()
      val d = new BoolDec(bytes, 0, bytes.length)
      seq.foreach { case (p, b) =>
        assert(d.bool(p) == (if (b) 1 else 0))
      }
    }
  }

  test("literals and signed literals round-trip") {
    val e = new BoolEnc
    e.literal(7, 93); e.literal(1, 1); e.literal(8, 255)
    e.signedLiteral(4, -11); e.signedLiteral(6, 31); e.literal(2, 0)
    val bytes = e.flush()
    val d = new BoolDec(bytes, 0, bytes.length)
    assert(d.literal(7) == 93)
    assert(d.literal(1) == 1)
    assert(d.literal(8) == 255)
    assert(d.signedLiteral(4) == -11)
    assert(d.signedLiteral(6) == 31)
    assert(d.literal(2) == 0)
  }

  test("token trees round-trip every leaf, including the post-zero start") {
    val probs = Array.fill(11)(87)
    val leaves = Seq(EOB, ZERO, ONE, TWO, THREE, FOUR, CAT1, CAT2, CAT3,
      CAT4, CAT5, CAT6)
    val e = new BoolEnc
    leaves.foreach(l => e.tree(coefTree, probs, l))
    leaves.drop(1).foreach(l => e.tree(coefTree, probs, l, startNode = 2))
    val bytes = e.flush()
    val d = new BoolDec(bytes, 0, bytes.length)
    leaves.foreach(l => assert(d.tree(coefTree, probs) == l))
    leaves.drop(1).foreach(l => assert(d.tree(coefTree, probs, 2) == l))
  }

  // --------------------------------------- independent pixel model

  /** The closed-form recurrence for uniform-per-MB fixtures (single MB
    * row): written against the RFC math directly, not the codec. */
  private def modelRow(qi: Int, modes: Seq[Int], y2dc: Seq[Int]): Seq[Int] = {
    val q2 = (4 + 2 * qi) * 2 // y2dc quant (library lookup, ×2 per spec)
    var prev = -1
    modes.zip(y2dc).map { case (mode, v) =>
      val d2 = v * q2
      val blockDc = (d2 + 3) >> 3 // IWHT of a DC-only Y2 block
      val r = (blockDc + 4) >> 3  // IDCT of a DC-only luma block
      val base = (mode, prev) match {
        case (0, -1) => 128 // DC, no neighbors
        case (0, u)  => u   // DC from a uniform left edge
        case (1, _)  => 127 // V: virtual above row
        case (2, -1) => 129 // H: virtual left column
        case (2, u)  => u
        case (3, -1) => 129 // TM: clamp(129 + 127 - 127)
        case (_, u)  => u   // TM: clamp(u + 127 - 127)
      }
      val u = math.max(0, math.min(255, base + r))
      prev = u
      u
    }
  }

  test("single-row frame reconstructs the closed-form chain (all modes)") {
    for (doc <- Seq(0L, 1L, 7L, 38L, 123L, 9999L)) {
      val qi = ((doc % 16) * 8).toInt
      val modes = (0 until 4).map(k => ((doc + k) % 4).toInt)
      val y2 = (0 until 4).map(k => (((doc * 7 + k * 5) % 13) - 6).toInt)
      val mbs = modes.zip(y2).map { case (m, v) => MbSpec(m, v) }
      val file = Vp8Encoder.webpFile(64, 16, qi, mbs)
      val out = Vp8Codec.decodeWebp(file)
      assert(out.isRight, s"doc=$doc → $out")
      val luma = out.toOption.get
      assert(luma.width == 64 && luma.height == 16 && luma.qi == qi)
      assert(luma.modes == modes.map("DVHT"(_)).mkString)
      val expect = modelRow(qi, modes, y2)
      for (k <- 0 until 4; r <- 0 until 16; c <- 0 until 16) {
        val got = luma.y(r * 64 + k * 16 + c) & 0xff
        assert(got == expect(k),
          s"doc=$doc mb=$k px($r,$c): $got != ${expect(k)}")
      }
    }
  }

  test("2x2 grid: second-row prediction uses reconstructed edges") {
    // all-DC grid: u00 = clamp(128+r00); u10 = clamp(u00+r10) (left);
    // u01 = clamp(u00+r01) (above only: (16*u00+8)>>4 = u00);
    // u11 = clamp(((16*u10 + 16*u01 + 16) >> 5) + r11)  (both edges)
    val qi = 40
    val q2 = (4 + 2 * qi) * 2
    def res(v: Int) = ((((v * q2) + 3) >> 3) + 4) >> 3
    val v = Seq(3, -2, 5, 1) // raster: (0,0),(1,0),(0,1),(1,1)
    val mbs = v.map(MbSpec(0, _))
    val file = Vp8Encoder.webpFile(32, 32, qi, mbs)
    val luma = Vp8Codec.decodeWebp(file).toOption.get
    val u00 = math.min(255, 128 + res(v(0)))
    val u10 = math.max(0, math.min(255, u00 + res(v(1))))
    val u01 = math.max(0, math.min(255, u00 + res(v(2))))
    val u11 = math.max(0,
      math.min(255, ((16 * u10 + 16 * u01 + 16) >> 5) + res(v(3))))
    def px(x: Int, y: Int) = luma.y(y * 32 + x) & 0xff
    assert(px(0, 0) == u00 && px(15, 15) == u00)
    assert(px(16, 0) == u10 && px(31, 15) == u10)
    assert(px(0, 16) == u01 && px(15, 31) == u01)
    assert(px(16, 16) == u11 && px(31, 31) == u11, s"$u00 $u10 $u01 $u11")
  }

  test("luma AC coefficients: zigzag + dequant + IDCT on a real block") {
    // one MB, DC_PRED (base 128), no Y2 DC, one AC term in sub-block 5:
    // quantized value 7 at zigzag position 2 (→ coefficient index 4).
    // Expected residual computed by the spec's own IDCT call on the
    // dequantized array — independent of the codec's token walk.
    val qi = 10
    val mbs = Seq(MbSpec(0, 0, ac = Seq((5, 2, 7))))
    val file = Vp8Encoder.webpFile(16, 16, qi, mbs)
    val luma = Vp8Codec.decodeWebp(file).toOption.get
    val acq = 4 + 3 * qi
    val deq = new Array[Int](16)
    deq(Vp8Codec.zigzag(2)) = 7 * acq
    val r4 = Vp8Codec.idct4x4(deq)
    // sub-block 5 sits at block row 1, col 1 → pixels (4..7, 4..7)
    for (i <- 0 until 16) {
      val x = 4 + i % 4; val y = 4 + i / 4
      val got = luma.y(y * 16 + x) & 0xff
      val want = math.max(0, math.min(255, 128 + r4(i)))
      assert(got == want, s"px($x,$y): $got != $want")
    }
    // every other sub-block stays flat 128
    assert((luma.y(0) & 0xff) == 128 && (luma.y(16 * 16 - 1) & 0xff) == 128)
  }

  test("skip macroblocks interleave with coded ones") {
    // v=0 → MbSpec is coded as SKIP (no tokens); the chain still holds
    val qi = 24
    val modes = Seq(0, 0, 0, 0)
    val y2 = Seq(4, 0, -3, 0)
    val mbs = modes.zip(y2).map { case (m, v) => MbSpec(m, v) }
    val file = Vp8Encoder.webpFile(64, 16, qi, mbs)
    val luma = Vp8Codec.decodeWebp(file).toOption.get
    val expect = modelRow(qi, modes, y2)
    for (k <- 0 until 4)
      assert((luma.y(k * 16) & 0xff) == expect(k), s"mb$k")
  }

  test("chroma planes reconstruct their own closed-form chain") {
    for (doc <- Seq(2L, 5L, 13L, 40L, 77L)) {
      val qi = ((doc % 16) * 8).toInt
      val qc = math.min(132, 4 + 2 * qi)
      val muv = (doc % 4).toInt
      val mbs = (0 until 4).map { k =>
        MbSpec(((doc + k) % 4).toInt, (((doc * 7 + k * 5) % 13) - 6).toInt,
          uDc = (((doc * 3 + k * 7) % 11) - 5).toInt,
          vDc = (((doc * 5 + k * 3) % 9) - 4).toInt)
      }
      val luma = Vp8Codec.decodeWebp(
        Vp8Encoder.webpFile(64, 16, qi, mbs, uvMode = muv)).toOption.get
      assert(luma.uv_modes == ("" + "DVHT"(muv)) * 4)
      // model: chroma DC goes straight through the IDCT (no WHT)
      def chain(vs: Seq[Int]): Seq[Int] = {
        var prev = -1
        vs.map { v =>
          val r = (v * qc + 4) >> 3
          val base =
            if (prev < 0) Seq(128, 127, 129, 129)(muv)
            else if (muv == 1) 127
            else prev
          val u = math.max(0, math.min(255, base + r)); prev = u; u
        }
      }
      val eu = chain(mbs.map(_.uDc))
      val ev = chain(mbs.map(_.vDc))
      for (k <- 0 until 4; i <- 0 until 8; j <- 0 until 8) {
        assert((luma.u(i * 32 + k * 8 + j) & 0xff) == eu(k),
          s"doc=$doc U mb$k ($i,$j)")
        assert((luma.v(i * 32 + k * 8 + j) & 0xff) == ev(k),
          s"doc=$doc V mb$k ($i,$j)")
      }
    }
  }

  test("non-MB-multiple dims decode and crop (the triage-lane shape)") {
    // 100×80: 7×5 MB grid, plane 112×80, cropped to 100 wide
    val nMb = 7 * 5
    val mbs = (0 until nMb).map(k => MbSpec(k % 4, (k % 5) - 2))
    val out = Vp8Codec.decodeWebp(Vp8Encoder.webpFile(100, 80, 30, mbs))
    assert(out.isRight, out)
    val l = out.toOption.get
    assert(l.width == 100 && l.height == 80)
    assert(l.y.length == 100 * 80)
    assert(l.u.length == 50 * 40 && l.v.length == 50 * 40)
    assert(l.modes.length == nMb)
    // the cropped right edge belongs to MB column 6 (pixels 96..99)
    val edge = l.y(99) & 0xff
    assert((0 to 255).contains(edge))
  }

  // ------------------------------------------------- quarantine lanes

  test("quarantine: interframe, b_pred, loop filter, stub, truncation") {
    val mbs = Seq(MbSpec(0, 3))
    val good = Vp8Encoder.webpFile(16, 16, 20, mbs)
    assert(Vp8Codec.decodeWebp(good).isRight)

    // interframe: set the frame-type bit in the tag (chunk payload
    // starts at RIFF 12 + 8 header bytes = offset 20)
    val inter = good.clone(); inter(20) = (inter(20) | 1).toByte
    assert(Vp8Codec.decodeWebp(inter) == Left("interframe"))

    // loop filter level > 0 quarantines (decode would not be bit-exact
    // without the §15 filter)
    val lf = {
      val p1 = new BoolEnc
      p1.literal(1, 0); p1.literal(1, 0); p1.literal(1, 0)
      p1.literal(1, 0); p1.literal(6, 12) // filter level 12
      p1.flush()
    }
    val lfFrame = good.clone()
    // splice: rebuild via encoder is simpler — encode with a patched
    // header is not exposed, so just check decodeFrame on a hand-built
    // minimal header
    val hand = Array[Byte](
      ((1 << 4) | (lf.length << 5)).toByte,
      (((1 << 4) | (lf.length << 5)) >> 8).toByte,
      (((1 << 4) | (lf.length << 5)) >> 16).toByte,
      0x9d.toByte, 0x01, 0x2a, 16, 0, 16, 0) ++ lf
    assert(Vp8Codec.decodeFrame(hand, 0, hand.length) == Left("loop_filter"))
    assert(lfFrame.length > 0) // (clone used only for the splice note)

    // b_pred: a mode stream selecting B_PRED
    val bp = {
      val p1 = new BoolEnc
      p1.literal(1, 0); p1.literal(1, 0); p1.literal(1, 0)
      p1.literal(1, 0); p1.literal(6, 0); p1.literal(3, 0)
      p1.literal(1, 0); p1.literal(2, 0); p1.literal(7, 0)
      for (_ <- 0 until 5) p1.bool(128, bit = false)
      p1.literal(1, 1)
      for (p <- 0 until 4; b <- 0 until 8; c <- 0 until 3; t <- 0 until 11)
        p1.bool(Vp8Codec.coefUpdateProbs(p)(b)(c)(t), bit = false)
      p1.literal(1, 0) // no skip flag
      p1.tree(kfYmodeTree, kfYmodeProb, B_PRED)
      p1.flush()
    }
    val bpf = Array[Byte](
      ((1 << 4) | (bp.length << 5)).toByte,
      (((1 << 4) | (bp.length << 5)) >> 8).toByte,
      (((1 << 4) | (bp.length << 5)) >> 16).toByte,
      0x9d.toByte, 0x01, 0x2a, 16, 0, 16, 0) ++ bp
    assert(Vp8Codec.decodeFrame(bpf, 0, bpf.length) == Left("b_pred"))

    // the triage-only stub (zero first_part_size) quarantines
    assert(Vp8Codec.decodeWebp(
      graft.ops.Vp8lEncoder.lossyStubFile(100, 80)) == Left("truncated"))

    // truncation mid-stream: drop the tail of a real file
    val cut = java.util.Arrays.copyOf(good, good.length - 6)
    assert(Vp8Codec.decodeWebp(cut).isLeft)
  }

  test("transforms: DC-only shortcuts match the full integer transforms") {
    // IWHT of a DC-only block = (dc+3)>>3 everywhere (incl. negatives)
    for (v <- Seq(-975, -9, 0, 7, 500)) {
      val in = new Array[Int](16); in(0) = v
      val out = Vp8Codec.iwht4x4(in)
      assert(out.forall(_ == ((v + 3) >> 3)), s"iwht dc=$v")
    }
    // IDCT of a DC-only block = (dc+4)>>3 everywhere
    for (v <- Seq(-321, -1, 0, 9, 444)) {
      val in = new Array[Int](16); in(0) = v
      val out = Vp8Codec.idct4x4(in)
      assert(out.forall(_ == ((v + 4) >> 3)), s"idct dc=$v")
    }
  }
}
