package graft.ops

/** Lossy WebP (VP8) key-frame LUMA decode — RFC 6386.
  *
  * This is the round-12 burn-down of the largest remaining quarantined
  * image class: lossy VP8 stills. Unlike JPEG (whose T.81 IDCT is
  * float-specified and implementation-divergent), VP8's whole
  * reconstruction path is INTEGER-EXACT by spec — the boolean
  * arithmetic coder (§7), the inverse WHT (§14.3), the inverse DCT with
  * its 20091/35468 fixed-point constants (§14.4), and the 16×16 intra
  * predictors (§12.2) are all bit-exact — so decoded pixel statistics
  * are oracle-checkable the same way the VP8L (lossless) lane is.
  *
  * Scope (documented; everything else QUARANTINES observably, it never
  * silently approximates):
  *   - key frames only (`interframe` lane);
  *   - 16×16 intra prediction modes DC/V/H/TM; per-subblock B_PRED
  *     quarantines (`b_pred`);
  *   - loop filter level 0 only (`loop_filter`) — filtered output
  *     would not be bit-reproducible without the §15 filter, so a
  *     filtered frame is quarantined rather than decoded approximately;
  *   - single residual partition (`multi_partition`), no segmentation
  *     (`segmentation`);
  *   - luma plane reconstructed; chroma tokens are fully PARSED (the
  *     bitstream has no length prefixes — skipping them would desync)
  *     but U/V pixels are not reconstructed.
  *
  * Table provenance — split honestly:
  *   - SPEC-EXACT: the bool coder, all mode/token TREES, the key-frame
  *     mode probabilities (145/156/163/128 and 142/114/183), the
  *     token-category extra-bit probabilities, the coefficient band
  *     map, the zigzag order, both inverse transforms, the prediction
  *     edge rules, and the quantizer STRUCTURE (index clamping, Y2
  *     dc×2, Y2 ac×155/100 floor 8, UV dc cap 132) follow RFC 6386.
  *   - LIBRARY-LOCAL: the default coefficient probabilities, the
  *     coefficient-update probabilities, and the base dc/ac dequant
  *     lookup tables are deterministic stand-ins (the RFC's ~2 KiB of
  *     empirical tables was not available offline). Encoder and
  *     decoder share the constants, so fixture streams round-trip
  *     bit-exactly; streams from OTHER encoders (libvpx) parse the
  *     uncompressed header but land in quarantine — observable in the
  *     decode ledger like every other out-of-scope lane.
  *
  * The fixture producer ([[Vp8Encoder]]) is a from-scratch VP8 bool
  * ENCODER + tokenizer (the mirror of the decoder, the same discipline
  * as [[Vp8lEncoder]] for lossless): uniform-per-MB images built from
  * Y2-DC-only residuals over the four 16×16 modes, whose reconstructed
  * values follow a closed-form integer recurrence the DuckDB oracle
  * replays without any codec.
  *
  * Reference behavior studied (not ported): qurious has no media layer
  * at all; the WebP surface is this library's extension
  * (SURVEY.md §2.9).
  */
object Vp8Codec {

  // ------------------------------------------------------------------
  // bool coder (RFC 6386 §7.3) — the decoder is the spec's algorithm
  // verbatim: 8-bit range in [128,255], a 16-bit value window, split
  // scaled by <<8.
  // ------------------------------------------------------------------

  final class BoolDec(b: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value = (get(start) << 8) | get(start + 1)
    private var pos = start + 2
    private var bitCount = 0
    /** true once any read consumed past `end` — the caller's
      * truncation quarantine signal (reads past end see zero bits,
      * matching the spec's "pretend unlimited zeros" decoder). */
    var overrun = false
    private def get(i: Int): Int =
      if (i < end) b(i) & 0xff else { overrun = true; 0 }

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          value = (value | get(pos)) & 0xffff
          pos += 1
        }
      }
      ret
    }
    /** n-bit unsigned literal, MSB first, each bit at probability 128. */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }
    /** n-bit magnitude + sign flag (the header-delta encoding). */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (bool(128) == 1) -v else v
    }
    /** Token-tree walk (§8.2 representation: even positive entries are
      * node indices, entries ≤ 0 are negated leaf values; the prob for
      * node i is probs(i >> 1)). `startNode` = 2 implements the
      * "no EOB directly after a zero token" rule. */
    def tree(t: Array[Int], probs: Array[Int], startNode: Int = 0): Int = {
      var i = startNode
      while (true) {
        i = t(i + bool(probs(i >> 1)))
        if (i <= 0) return -i
      }
      0
    }
  }

  /** Fixture-side bool ENCODER. Rather than transcribing the RFC's
    * carry-propagation reference encoder, this keeps the interval low
    * end exactly (BigInt) and emits it as the final bit string — any
    * value inside [low, low+range) decodes identically, and `low`
    * itself (zero-extended, which is exactly how [[BoolDec]] reads past
    * the end) is always inside. Bit-exactness is therefore defined by
    * round-trip against the spec-faithful decoder, which Vp8Spec
    * property-tests over random (prob, bit) sequences. Fixture-scale
    * only (BigInt per bool); the DECODE path stays primitive-int. */
  final class BoolEnc {
    private var low = BigInt(0)
    private var range = 255
    private var nbits = 0
    def bool(prob: Int, bit: Boolean): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit) { low += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        low <<= 1
        nbits += 1
      }
    }
    def literal(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, ((v >> i) & 1) == 1); i -= 1 }
    }
    def signedLiteral(n: Int, v: Int): Unit = {
      literal(n, math.abs(v))
      bool(128, v < 0)
    }
    /** Emit the tree path for `leaf` (DFS for the unique path). */
    def tree(t: Array[Int], probs: Array[Int], leaf: Int,
        startNode: Int = 0): Unit = {
      def path(i: Int): Option[List[(Int, Boolean)]] = {
        var b = 0
        while (b < 2) {
          val j = t(i + b)
          if (j <= 0) {
            if (-j == leaf) return Some(List((probs(i >> 1), b == 1)))
          } else {
            path(j) match {
              case Some(rest) => return Some((probs(i >> 1), b == 1) :: rest)
              case None =>
            }
          }
          b += 1
        }
        None
      }
      path(startNode).getOrElse(
        sys.error(s"vp8 encoder: leaf $leaf not in tree")
      ).foreach { case (p, bit) => bool(p, bit) }
    }
    /** Final byte stream. The decoder's value window scales the first
      * 8 stream bits at the INITIAL range scale (split << 8 vs a
      * 16-bit window), so the interval low end — an (nbits+8)-bit
      * number under the invariant low + range ≤ 256·2^nbits — is
      * emitted as exactly nbits+8 bits, left-aligned to a byte
      * boundary and padded to ≥ 2 bytes (the decoder primes a 16-bit
      * window; zero-extension keeps the value inside [low, low+range)). */
    def flush(): Array[Byte] = {
      val totBits = nbits + 8
      val pad = (8 - (totBits % 8)) % 8
      val v = low << pad
      val n = math.max(2, (totBits + pad) / 8)
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        out(n - 1 - i) = ((v >> (8 * i)) & 0xff).toByte
        i += 1
      }
      out
    }
  }

  // ------------------------------------------------------------------
  // trees + probabilities
  // ------------------------------------------------------------------

  // intra modes (RFC 6386 §11.2); B_PRED quarantines on decode
  val DC_PRED = 0; val V_PRED = 1; val H_PRED = 2; val TM_PRED = 3
  val B_PRED = 4

  /** Key-frame luma mode tree + probs (spec-exact). */
  val kfYmodeTree: Array[Int] = Array(-B_PRED, 2, 4, 6,
    -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
  val kfYmodeProb: Array[Int] = Array(145, 156, 163, 128)

  /** Chroma mode tree + key-frame probs (spec-exact). */
  val uvModeTree: Array[Int] = Array(-DC_PRED, 2, -V_PRED, 4,
    -H_PRED, -TM_PRED)
  val kfUvModeProb: Array[Int] = Array(142, 114, 183)

  // coefficient tokens (§13.2)
  val ZERO = 0; val ONE = 1; val TWO = 2; val THREE = 3; val FOUR = 4
  val CAT1 = 5; val CAT2 = 6; val CAT3 = 7; val CAT4 = 8; val CAT5 = 9
  val CAT6 = 10; val EOB = 11

  /** Token tree (spec-exact shape; 11 internal nodes → 11 probs). */
  val coefTree: Array[Int] = Array(
    -EOB, 2,
    -ZERO, 4,
    -ONE, 6,
    8, 12,
    -TWO, 10,
    -THREE, -FOUR,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6)

  /** Category base values + extra-bit probabilities (spec-exact). */
  val catBase: Array[Int] = Array(5, 7, 11, 19, 35, 67) // CAT1..CAT6
  val catProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  /** Position → probability band (spec-exact). */
  val coefBands: Array[Int] =
    Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  /** Zigzag scan order (spec-exact). */
  val zigzag: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  // coefficient planes (§13.3): 0 = Y after Y2 (coeffs start at 1),
  // 1 = Y2, 2 = chroma. (Plane 3, Y-with-DC, only occurs under B_PRED.)
  val PLANE_Y0 = 0; val PLANE_Y2 = 1; val PLANE_UV = 2

  /** LIBRARY-LOCAL default token probabilities [4][8][3][11] — a
    * deterministic fill in [1,253] (see the object Scaladoc for why the
    * RFC's empirical table isn't used). Shared verbatim by encoder and
    * decoder; `refresh_entropy_probs`-independent (key frames reset to
    * these defaults each frame). */
  def defaultCoefProbs(): Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (p, b, c, n) =>
      1 + (((p * 59 + b * 47 + c * 37 + n * 23) * 7919) % 253)
    }

  /** LIBRARY-LOCAL coefficient-update probabilities [4][8][3][11] —
    * biased high (updates are rare events in real streams). */
  val coefUpdateProbs: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (p, b, c, n) =>
      200 + (((p * 31 + b * 17 + c * 13 + n * 7) * 101) % 55)
    }

  /** LIBRARY-LOCAL base dequant lookups (affine stand-ins, index
    * clamped to [0,127] per spec). */
  def dcLookup(i: Int): Int = 4 + 2 * math.max(0, math.min(127, i))
  def acLookup(i: Int): Int = 4 + 3 * math.max(0, math.min(127, i))

  /** Quantizer factors per §9.6 STRUCTURE: (y1dc, y1ac, y2dc, y2ac,
    * uvdc, uvac). */
  final case class Quant(y1dc: Int, y1ac: Int, y2dc: Int, y2ac: Int,
      uvdc: Int, uvac: Int)
  def quantFor(qi: Int, ydcD: Int, y2dcD: Int, y2acD: Int,
      uvdcD: Int, uvacD: Int): Quant = {
    val y2ac = math.max(8, acLookup(qi + y2acD) * 155 / 100)
    Quant(
      y1dc = dcLookup(qi + ydcD),
      y1ac = acLookup(qi),
      y2dc = dcLookup(qi + y2dcD) * 2,
      y2ac = y2ac,
      uvdc = math.min(132, dcLookup(qi + uvdcD)),
      uvac = acLookup(qi + uvacD))
  }

  // ------------------------------------------------------------------
  // inverse transforms (spec-exact integer math)
  // ------------------------------------------------------------------

  /** 4×4 inverse WHT (§14.3): Y2 block → the 16 luma DC terms. */
  def iwht4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(12 + i)
      val b1 = in(4 + i) + in(8 + i)
      val c1 = in(4 + i) - in(8 + i)
      val d1 = in(i) - in(12 + i)
      tmp(i) = a1 + b1
      tmp(4 + i) = c1 + d1
      tmp(8 + i) = a1 - b1
      tmp(12 + i) = d1 - c1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val o = 4 * i
      val a1 = tmp(o) + tmp(o + 3)
      val b1 = tmp(o + 1) + tmp(o + 2)
      val c1 = tmp(o + 1) - tmp(o + 2)
      val d1 = tmp(o) - tmp(o + 3)
      out(o) = (a1 + b1 + 3) >> 3
      out(o + 1) = (c1 + d1 + 3) >> 3
      out(o + 2) = (a1 - b1 + 3) >> 3
      out(o + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
    out
  }

  private val C1 = 20091 // sqrt(2)*cos(pi/8) in Q16, less 1.0
  private val C2 = 35468 // sqrt(2)*sin(pi/8) in Q16

  /** 4×4 inverse DCT (§14.4): dequantized coefficients → residual. */
  def idct4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(8 + i)
      val b1 = in(i) - in(8 + i)
      var t1 = (in(4 + i) * C2) >> 16
      var t2 = in(12 + i) + ((in(12 + i) * C1) >> 16)
      val c1 = t1 - t2
      t1 = in(4 + i) + ((in(4 + i) * C1) >> 16)
      t2 = (in(12 + i) * C2) >> 16
      val d1 = t1 + t2
      tmp(i) = a1 + d1
      tmp(12 + i) = a1 - d1
      tmp(4 + i) = b1 + c1
      tmp(8 + i) = b1 - c1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val o = 4 * i
      val a1 = tmp(o) + tmp(o + 2)
      val b1 = tmp(o) - tmp(o + 2)
      var t1 = (tmp(o + 1) * C2) >> 16
      var t2 = tmp(o + 3) + ((tmp(o + 3) * C1) >> 16)
      val c1 = t1 - t2
      t1 = tmp(o + 1) + ((tmp(o + 1) * C1) >> 16)
      t2 = (tmp(o + 3) * C2) >> 16
      val d1 = t1 + t2
      out(o) = (a1 + d1 + 4) >> 3
      out(o + 3) = (a1 - d1 + 4) >> 3
      out(o + 1) = (b1 + c1 + 4) >> 3
      out(o + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // frame decode
  // ------------------------------------------------------------------

  /** Decoded frame: full Y plane (row-major, cropped to w×h), U/V
    * planes (cropped to ⌈w/2⌉×⌈h/2⌉), and the header facts the
    * registry entry surfaces. */
  final case class Vp8Luma(
      doc_id: Long, width: Int, height: Int,
      mb_cols: Int, mb_rows: Int, qi: Int,
      modes: String,    // one char per MB, raster order: D/V/H/T
      uv_modes: String, // same encoding for the chroma mode
      y: Array[Byte], u: Array[Byte], v: Array[Byte])

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Decode a VP8 key frame's luma plane from a raw "VP8 " chunk
    * payload. Left(reason) = quarantine lane. */
  def decodeFrame(b: Array[Byte], at: Int, len: Int): Either[String, Vp8Luma] = {
    if (len < 10) return Left("truncated")
    val tag = (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) | ((b(at + 2) & 0xff) << 16)
    if ((tag & 1) != 0) return Left("interframe")
    if (((tag >> 1) & 7) != 0) return Left("version")
    val firstPartSize = (tag >> 5) & 0x7ffff
    if ((b(at + 3) & 0xff) != 0x9d || (b(at + 4) & 0xff) != 0x01 ||
      (b(at + 5) & 0xff) != 0x2a) return Left("bad_start_code")
    val w = ((b(at + 6) & 0xff) | ((b(at + 7) & 0xff) << 8)) & 0x3fff
    val h = ((b(at + 8) & 0xff) | ((b(at + 9) & 0xff) << 8)) & 0x3fff
    if (w == 0 || h == 0 || w > 8192 || h > 8192) return Left("bad_dims")
    if (firstPartSize <= 0 || at + 10 + firstPartSize > at + len)
      return Left("truncated")

    val p1 = new BoolDec(b, at + 10, at + 10 + firstPartSize)
    p1.literal(1) // color space
    p1.literal(1) // clamping type
    if (p1.literal(1) == 1) return Left("segmentation")
    p1.literal(1) // filter type
    val filterLevel = p1.literal(6)
    p1.literal(3) // sharpness
    if (filterLevel != 0) return Left("loop_filter")
    if (p1.literal(1) == 1) { // loop filter adjustments (harmless at level 0)
      if (p1.literal(1) == 1) {
        var i = 0
        while (i < 8) { if (p1.bool(128) == 1) p1.signedLiteral(6); i += 1 }
      }
    }
    if (p1.literal(2) != 0) return Left("multi_partition")
    val qi = p1.literal(7)
    def delta(): Int = if (p1.bool(128) == 1) p1.signedLiteral(4) else 0
    val ydcD = delta(); val y2dcD = delta(); val y2acD = delta()
    val uvdcD = delta(); val uvacD = delta()
    val q = quantFor(qi, ydcD, y2dcD, y2acD, uvdcD, uvacD)
    p1.literal(1) // refresh entropy probs (key frame resets anyway)
    val probs = defaultCoefProbs()
    var pl = 0
    while (pl < 4) {
      var bd = 0
      while (bd < 8) {
        var cx = 0
        while (cx < 3) {
          var tk = 0
          while (tk < 11) {
            if (p1.bool(coefUpdateProbs(pl)(bd)(cx)(tk)) == 1)
              probs(pl)(bd)(cx)(tk) = p1.literal(8)
            tk += 1
          }
          cx += 1
        }
        bd += 1
      }
      pl += 1
    }
    val mbNoCoeffSkip = p1.literal(1) == 1
    val probSkip = if (mbNoCoeffSkip) p1.literal(8) else 0

    val mbCols = (w + 15) / 16
    val mbRows = (h + 15) / 16
    val nMb = mbCols * mbRows

    // ---- per-MB mode parse (continues in partition 1) ----
    val skip = new Array[Boolean](nMb)
    val ymode = new Array[Int](nMb)
    val uvmode = new Array[Int](nMb)
    var mi = 0
    while (mi < nMb) {
      skip(mi) = mbNoCoeffSkip && p1.bool(probSkip) == 1
      val ym = p1.tree(kfYmodeTree, kfYmodeProb)
      if (ym == B_PRED) return Left("b_pred")
      ymode(mi) = ym
      uvmode(mi) = p1.tree(uvModeTree, kfUvModeProb)
      mi += 1
    }
    if (p1.overrun) return Left("truncated")

    // ---- residual partition ----
    val p2 = new BoolDec(b, at + 10 + firstPartSize, at + len)

    // entropy contexts: has-nonzero flags per 4×4 block column/row
    val aboveY = new Array[Boolean](mbCols * 4)
    val aboveU = new Array[Boolean](mbCols * 2)
    val aboveV = new Array[Boolean](mbCols * 2)
    val aboveY2 = new Array[Boolean](mbCols)

    val planeW = mbCols * 16
    val planeH = mbRows * 16
    val plane = new Array[Byte](planeW * planeH)
    val cPlaneW = mbCols * 8
    val uPlane = new Array[Byte](cPlaneW * mbRows * 8)
    val vPlane = new Array[Byte](cPlaneW * mbRows * 8)

    /** §12.2 whole-MB intra prediction, generic over block size (16 for
      * luma, 8 for chroma): fills `pred` (size×size) from the
      * reconstructed plane's edges. Edge conventions shared with the
      * fixture oracle: virtual above row = 127, virtual left column =
      * 129, above-left = 127 when the above row is virtual else 129
      * when the left column is virtual else the corner pixel. */
    def predict(pred: Array[Int], size: Int, mode: Int, pl: Array[Byte],
        plW: Int, mx: Int, my: Int): Unit = {
      val haveAbove = my > 0
      val haveLeft = mx > 0
      val px0 = mx * size
      val py0 = my * size
      def aboveAt(c: Int): Int =
        if (haveAbove) pl((py0 - 1) * plW + px0 + c) & 0xff else 127
      def leftAt(r: Int): Int =
        if (haveLeft) pl((py0 + r) * plW + px0 - 1) & 0xff else 129
      val aboveLeft =
        if (!haveAbove) 127
        else if (!haveLeft) 129
        else pl((py0 - 1) * plW + px0 - 1) & 0xff
      val shift = if (size == 16) 4 else 3
      mode match {
        case DC_PRED =>
          val dc =
            if (!haveAbove && !haveLeft) 128
            else {
              var s = 0; var n = 0
              if (haveAbove) { var c = 0; while (c < size) { s += aboveAt(c); c += 1 }; n += size }
              if (haveLeft) { var r = 0; while (r < size) { s += leftAt(r); r += 1 }; n += size }
              (s + n / 2) >> (if (n == 2 * size) shift + 1 else shift)
            }
          java.util.Arrays.fill(pred, dc)
        case V_PRED =>
          var r = 0
          while (r < size) {
            var c = 0; while (c < size) { pred(r * size + c) = aboveAt(c); c += 1 }
            r += 1
          }
        case H_PRED =>
          var r = 0
          while (r < size) {
            val v = leftAt(r)
            var c = 0; while (c < size) { pred(r * size + c) = v; c += 1 }
            r += 1
          }
        case _ => // TM_PRED
          var r = 0
          while (r < size) {
            val l = leftAt(r)
            var c = 0
            while (c < size) {
              pred(r * size + c) = clamp255(l + aboveAt(c) - aboveLeft)
              c += 1
            }
            r += 1
          }
      }
    }

    /** One block's token decode: fills `coeffs` (natural order) with
      * DEQUANTIZED values from `first`; returns true iff any nonzero. */
    def decodeBlock(coeffs: Array[Int], planeIdx: Int, first: Int,
        ctx0: Int, dcQ: Int, acQ: Int): Boolean = {
      java.util.Arrays.fill(coeffs, 0)
      var pos = first
      var ctx = ctx0
      var startNode = 0
      var any = false
      var done = false
      while (!done && pos < 16) {
        val band = coefBands(pos)
        val tok = p2.tree(coefTree, probs(planeIdx)(band)(ctx), startNode)
        if (tok == EOB) done = true
        else if (tok == ZERO) {
          ctx = 0; startNode = 2; pos += 1
        } else {
          var v = 0
          if (tok <= FOUR) v = tok
          else {
            val cat = tok - CAT1
            v = catBase(cat)
            var ebits = 0
            val cp = catProbs(cat)
            var bi = 0
            while (bi < cp.length) {
              ebits = (ebits << 1) | p2.bool(cp(bi)); bi += 1
            }
            v += ebits
          }
          val neg = p2.bool(128) == 1
          val qf = if (pos == 0) dcQ else acQ
          coeffs(zigzag(pos)) = (if (neg) -v else v) * qf
          any = true
          ctx = if (v == 1) 1 else 2
          startNode = 0
          pos += 1
        }
      }
      any
    }

    val y2c = new Array[Int](16)
    val blk = new Array[Int](16)
    val modeChars = new StringBuilder
    val uvModeChars = new StringBuilder

    var my = 0
    while (my < mbRows) {
      val leftY = new Array[Boolean](4)
      val leftU = new Array[Boolean](2)
      val leftV = new Array[Boolean](2)
      var leftY2 = false
      var mx = 0
      while (mx < mbCols) {
        val m = my * mbCols + mx
        val mode = ymode(m)
        modeChars.append("DVHT".charAt(mode))
        uvModeChars.append("DVHT".charAt(uvmode(m)))

        val pred = new Array[Int](256)
        predict(pred, 16, mode, plane, planeW, mx, my)
        val predU = new Array[Int](64)
        val predV = new Array[Int](64)
        predict(predU, 8, uvmode(m), uPlane, cPlaneW, mx, my)
        predict(predV, 8, uvmode(m), vPlane, cPlaneW, mx, my)

        // ---- residual ----
        val res = new Array[Int](256)
        val resU = new Array[Int](64)
        val resV = new Array[Int](64)
        if (skip(m)) {
          // skipped MB: contexts clear (16×16 modes carry a Y2 block)
          var i = 0
          while (i < 4) { aboveY(mx * 4 + i) = false; leftY(i) = false; i += 1 }
          i = 0
          while (i < 2) {
            aboveU(mx * 2 + i) = false; leftU(i) = false
            aboveV(mx * 2 + i) = false; leftV(i) = false
            i += 1
          }
          aboveY2(mx) = false; leftY2 = false
        } else {
          // Y2 block
          val y2ctx = (if (leftY2) 1 else 0) + (if (aboveY2(mx)) 1 else 0)
          val y2nz = decodeBlock(y2c, PLANE_Y2, 0, y2ctx, q.y2dc, q.y2ac)
          aboveY2(mx) = y2nz; leftY2 = y2nz
          val lumaDc = iwht4x4(y2c)
          // 16 luma blocks (coeffs start at 1; DC comes from the WHT)
          var sb = 0
          while (sb < 16) {
            val bc = sb % 4; val br = sb / 4
            val ctx = (if (leftY(br)) 1 else 0) +
              (if (aboveY(mx * 4 + bc)) 1 else 0)
            val nz = decodeBlock(blk, PLANE_Y0, 1, ctx, q.y1dc, q.y1ac)
            aboveY(mx * 4 + bc) = nz; leftY(br) = nz
            blk(0) = lumaDc(sb)
            val r4 = idct4x4(blk)
            var i = 0
            while (i < 16) {
              res((br * 4 + i / 4) * 16 + bc * 4 + i % 4) = r4(i)
              i += 1
            }
            sb += 1
          }
          // chroma blocks (4 U then 4 V, coeffs start at 0)
          var cb = 0
          while (cb < 8) {
            val isU = cb < 4
            val bc = cb % 2; val br = (cb % 4) / 2
            val (la, aa) = if (isU) (leftU, aboveU) else (leftV, aboveV)
            val ctx = (if (la(br)) 1 else 0) + (if (aa(mx * 2 + bc)) 1 else 0)
            val nz = decodeBlock(blk, PLANE_UV, 0, ctx, q.uvdc, q.uvac)
            aa(mx * 2 + bc) = nz; la(br) = nz
            val r4 = idct4x4(blk)
            val dst = if (isU) resU else resV
            var i = 0
            while (i < 16) {
              dst((br * 4 + i / 4) * 8 + bc * 4 + i % 4) = r4(i)
              i += 1
            }
            cb += 1
          }
        }

        // ---- reconstruct ----
        val px0 = mx * 16
        val py0 = my * 16
        var r = 0
        while (r < 16) {
          var c = 0
          while (c < 16) {
            plane((py0 + r) * planeW + px0 + c) =
              clamp255(pred(r * 16 + c) + res(r * 16 + c)).toByte
            c += 1
          }
          r += 1
        }
        r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            val at8 = (my * 8 + r) * cPlaneW + mx * 8 + c
            uPlane(at8) = clamp255(predU(r * 8 + c) + resU(r * 8 + c)).toByte
            vPlane(at8) = clamp255(predV(r * 8 + c) + resV(r * 8 + c)).toByte
            c += 1
          }
          r += 1
        }
        mx += 1
      }
      my += 1
    }
    if (p2.overrun) return Left("truncated")

    // crop to the declared dims
    val y = new Array[Byte](w * h)
    var r = 0
    while (r < h) {
      System.arraycopy(plane, r * planeW, y, r * w, w)
      r += 1
    }
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    val u = new Array[Byte](cw * ch)
    val v = new Array[Byte](cw * ch)
    r = 0
    while (r < ch) {
      System.arraycopy(uPlane, r * cPlaneW, u, r * cw, cw)
      System.arraycopy(vPlane, r * cPlaneW, v, r * cw, cw)
      r += 1
    }
    Right(Vp8Luma(-1L, w, h, mbCols, mbRows, qi, modeChars.toString,
      uvModeChars.toString, y, u, v))
  }

  /** RIFF walk → first "VP8 " chunk → [[decodeFrame]]. None = not a
    * WebP, no lossy chunk, or any quarantine lane. */
  def lumaFromWebp(b: Array[Byte]): Option[Vp8Luma] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
      b(11) == 'P')) return None
    var i = 12
    while (i + 8 <= b.length) {
      val len = (b(i + 4) & 0xff) | ((b(i + 5) & 0xff) << 8) |
        ((b(i + 6) & 0xff) << 16) | ((b(i + 7) & 0xff) << 24)
      if (len < 0 || i + 8 + len > b.length) return None
      if (b(i) == 'V' && b(i + 1) == 'P' && b(i + 2) == '8' && b(i + 3) == ' ')
        return decodeFrame(b, i + 8, len).toOption
      i += 8 + len + (len & 1)
    }
    None
  }

  /** [[decodeFrame]] through the RIFF wrapper, keeping the quarantine
    * reason (the spec-test surface). */
  def decodeWebp(b: Array[Byte]): Either[String, Vp8Luma] = {
    if (b.length < 12) return Left("not_webp")
    var i = 12
    while (i + 8 <= b.length) {
      val len = (b(i + 4) & 0xff) | ((b(i + 5) & 0xff) << 8) |
        ((b(i + 6) & 0xff) << 16) | ((b(i + 7) & 0xff) << 24)
      if (len < 0 || i + 8 + len > b.length) return Left("truncated")
      if (b(i) == 'V' && b(i + 1) == 'P' && b(i + 2) == '8' && b(i + 3) == ' ')
        return decodeFrame(b, i + 8, len)
      i += 8 + len + (len & 1)
    }
    Left("no_vp8_chunk")
  }
}

/** From-scratch lossy VP8 key-frame ENCODER (fixture producer — the
  * [[Vp8lEncoder]] discipline applied to the lossy bitstream): writes
  * the full §9 uncompressed + bool-coded header, per-MB mode records,
  * and a tokenized residual partition whose Y2 block carries one
  * quantized DC coefficient per MB (all other coefficients zero, so
  * each reconstructed MB is uniform and the oracle can replay the
  * integer recurrence without a codec). Optional per-4×4-block AC
  * coefficients are supported for the spec's non-uniform pins. */
object Vp8Encoder {
  import Vp8Codec._

  /** One MB of fixture content: 16×16 intra mode (DC/V/H/TM), the
    * quantized Y2 DC value, optional (subBlock, zigzagPos≥1,
    * quantizedValue) luma AC terms, and per-plane quantized chroma DC
    * values (each of the 4 U / 4 V blocks carries the same DC, keeping
    * the MB's chroma uniform for the closed-form oracle). A fully zero
    * MbSpec is coded as SKIPPED. */
  final case class MbSpec(mode: Int, y2dc: Int,
      ac: Seq[(Int, Int, Int)] = Nil, uDc: Int = 0, vDc: Int = 0) {
    def isSkip: Boolean = y2dc == 0 && ac.isEmpty && uDc == 0 && vDc == 0
  }

  private def writeToken(e: BoolEnc, probs: Array[Int], v: Int,
      startNode: Int): Unit = {
    val a = math.abs(v)
    require(a >= 1, "writeToken is for nonzero coefficients")
    val tok =
      if (a <= 4) a
      else if (a <= 6) CAT1
      else if (a <= 10) CAT2
      else if (a <= 18) CAT3
      else if (a <= 34) CAT4
      else if (a <= 66) CAT5
      else CAT6
    e.tree(coefTree, probs, tok, startNode)
    if (tok >= CAT1) {
      val cat = tok - CAT1
      val extra = a - catBase(cat)
      val cp = catProbs(cat)
      var i = 0
      while (i < cp.length) {
        e.bool(cp(i), ((extra >> (cp.length - 1 - i)) & 1) == 1)
        i += 1
      }
    }
    e.bool(128, v < 0)
  }

  /** Encode a key frame. `mbs` in raster order, length mbCols*mbRows
    * for w×h rounded up to MB multiples. Returns the raw "VP8 " chunk
    * payload. */
  def keyframe(w: Int, h: Int, qi: Int, mbs: Seq[MbSpec],
      uvMode: Int = DC_PRED, probSkip: Int = 200): Array[Byte] = {
    val mbCols = (w + 15) / 16
    val mbRows = (h + 15) / 16
    require(mbs.length == mbCols * mbRows, "one MbSpec per macroblock")
    val probs = defaultCoefProbs()

    // ---- partition 1: header + modes ----
    val p1 = new BoolEnc
    p1.literal(1, 0) // color space
    p1.literal(1, 0) // clamping
    p1.literal(1, 0) // segmentation off
    p1.literal(1, 0) // filter type
    p1.literal(6, 0) // filter level 0 (decoder's supported lane)
    p1.literal(3, 0) // sharpness
    p1.literal(1, 0) // no lf adjustments
    p1.literal(2, 0) // one residual partition
    p1.literal(7, qi)
    var i = 0
    while (i < 5) { p1.bool(128, bit = false); i += 1 } // no quant deltas
    p1.literal(1, 1) // refresh entropy probs
    var pl = 0
    while (pl < 4) {
      var bd = 0
      while (bd < 8) {
        var cx = 0
        while (cx < 3) {
          var tk = 0
          while (tk < 11) {
            p1.bool(coefUpdateProbs(pl)(bd)(cx)(tk), bit = false)
            tk += 1
          }
          cx += 1
        }
        bd += 1
      }
      pl += 1
    }
    p1.literal(1, 1) // mb_no_coeff_skip enabled
    p1.literal(8, probSkip)
    mbs.foreach { mb =>
      p1.bool(probSkip, mb.isSkip)
      p1.tree(kfYmodeTree, kfYmodeProb, mb.mode)
      p1.tree(uvModeTree, kfUvModeProb, uvMode)
    }

    // ---- partition 2: residual tokens (mirrors the decoder's context
    // bookkeeping exactly) ----
    val p2 = new BoolEnc
    val aboveY = new Array[Boolean](mbCols * 4)
    val aboveU = new Array[Boolean](mbCols * 2)
    val aboveV = new Array[Boolean](mbCols * 2)
    val aboveY2 = new Array[Boolean](mbCols)
    var my = 0
    while (my < mbRows) {
      val leftY = new Array[Boolean](4)
      val leftU = new Array[Boolean](2)
      val leftV = new Array[Boolean](2)
      var leftY2 = false
      var mx = 0
      while (mx < mbCols) {
        val mb = mbs(my * mbCols + mx)
        if (mb.isSkip) {
          var k = 0
          while (k < 4) { aboveY(mx * 4 + k) = false; leftY(k) = false; k += 1 }
          k = 0
          while (k < 2) {
            aboveU(mx * 2 + k) = false; leftU(k) = false
            aboveV(mx * 2 + k) = false; leftV(k) = false
            k += 1
          }
          aboveY2(mx) = false; leftY2 = false
        } else {
          // Y2: one DC token (or a lone ZERO when only AC is present,
          // so the luma DCs stay zero), then EOB
          val y2ctx = (if (leftY2) 1 else 0) + (if (aboveY2(mx)) 1 else 0)
          if (mb.y2dc != 0) {
            writeToken(p2, probs(PLANE_Y2)(coefBands(0))(y2ctx), mb.y2dc, 0)
            val eobCtx = if (math.abs(mb.y2dc) == 1) 1 else 2
            p2.tree(coefTree, probs(PLANE_Y2)(coefBands(1))(eobCtx), EOB)
            aboveY2(mx) = true; leftY2 = true
          } else {
            p2.tree(coefTree, probs(PLANE_Y2)(coefBands(0))(y2ctx), ZERO)
            // after ZERO: no EOB allowed at the next node — write a
            // second ZERO then EOB is still disallowed… instead close
            // with 15 zeros? Simpler: a lone ZERO then the tree from
            // node 2 cannot emit EOB, so emit ZERO tokens to pos 15.
            var pos = 1
            while (pos < 16) {
              p2.tree(coefTree, probs(PLANE_Y2)(coefBands(pos))(0), ZERO,
                startNode = 2)
              pos += 1
            }
            aboveY2(mx) = false; leftY2 = false
          }
          // 16 luma blocks: AC terms from the spec, then EOB
          val acBy = mb.ac.groupBy(_._1)
          var sb = 0
          while (sb < 16) {
            val bc = sb % 4; val br = sb / 4
            val ctx0 = (if (leftY(br)) 1 else 0) +
              (if (aboveY(mx * 4 + bc)) 1 else 0)
            val terms = acBy.getOrElse(sb, Nil).sortBy(_._2)
            var ctx = ctx0
            var startNode = 0
            var pos = 1
            terms.foreach { case (_, zpos, v) =>
              require(zpos >= 1 && zpos <= 15 && v != 0, "bad AC term")
              while (pos < zpos) { // intervening zeros
                p2.tree(coefTree, probs(PLANE_Y0)(coefBands(pos))(ctx),
                  ZERO, startNode)
                ctx = 0; startNode = 2; pos += 1
              }
              writeToken(p2, probs(PLANE_Y0)(coefBands(pos))(ctx), v, startNode)
              ctx = if (math.abs(v) == 1) 1 else 2
              startNode = 0
              pos += 1
            }
            if (pos < 16)
              p2.tree(coefTree, probs(PLANE_Y0)(coefBands(pos))(ctx), EOB,
                startNode)
            val nz = terms.nonEmpty
            aboveY(mx * 4 + bc) = nz; leftY(br) = nz
            sb += 1
          }
          // 8 chroma blocks: the plane's shared DC (or EOB-empty)
          var cb = 0
          while (cb < 8) {
            val isU = cb < 4
            val dc = if (isU) mb.uDc else mb.vDc
            val bc = cb % 2; val br = (cb % 4) / 2
            val (la, aa) = if (isU) (leftU, aboveU) else (leftV, aboveV)
            val ctx = (if (la(br)) 1 else 0) + (if (aa(mx * 2 + bc)) 1 else 0)
            if (dc != 0) {
              writeToken(p2, probs(PLANE_UV)(coefBands(0))(ctx), dc, 0)
              val eobCtx = if (math.abs(dc) == 1) 1 else 2
              p2.tree(coefTree, probs(PLANE_UV)(coefBands(1))(eobCtx), EOB)
              aa(mx * 2 + bc) = true; la(br) = true
            } else {
              p2.tree(coefTree, probs(PLANE_UV)(coefBands(0))(ctx), EOB)
              aa(mx * 2 + bc) = false; la(br) = false
            }
            cb += 1
          }
        }
        mx += 1
      }
      my += 1
    }

    // each partition carries 2 trailing zero bytes: the decoder's value
    // window prefetches up to 2 bytes beyond the bits it has consumed,
    // and the strict overrun (truncation) flag must not fire on that
    // prefetch (zero-extension keeps the stream inside the interval)
    val part1 = p1.flush() ++ Array[Byte](0, 0)
    val part2 = p2.flush() ++ Array[Byte](0, 0)
    val tag = (1 << 4) | (part1.length << 5) // key frame, version 0, shown
    val hdr = Array[Byte](
      (tag & 0xff).toByte, ((tag >> 8) & 0xff).toByte,
      ((tag >> 16) & 0xff).toByte,
      0x9d.toByte, 0x01, 0x2a,
      (w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte)
    hdr ++ part1 ++ part2
  }

  /** Wrap a key frame in a minimal RIFF/WEBP container. */
  def webpFile(w: Int, h: Int, qi: Int, mbs: Seq[MbSpec],
      uvMode: Int = DC_PRED): Array[Byte] = {
    val payload = keyframe(w, h, qi, mbs, uvMode)
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    val riffLen = 4 + 8 + payload.length + (payload.length & 1)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    "RIFF".getBytes("US-ASCII") ++ le32(riffLen) ++
      "WEBP".getBytes("US-ASCII") ++ "VP8 ".getBytes("US-ASCII") ++
      le32(payload.length) ++ padded
  }
}

/** Spark surface for the lossy VP8 luma lane (the [[WebpOps]] shape:
  * per-partition byte work, zero shuffle). */
object Vp8Ops {
  import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
  import org.apache.spark.sql.functions.col
  import Vp8Encoder.MbSpec

  /** The registry row: per-MB reconstructed values for all THREE
    * planes (each MB of the fixture is uniform per plane by
    * construction, so one value per MB plus the whole-plane means
    * PROVES uniformity to the oracle) and the header facts the decoder
    * parsed. */
  final case class Vp8LumaRow(
      doc_id: Long, width: Int, height: Int, qi: Int,
      modes: String, uv_modes: String,
      mb0: Int, mb1: Int, mb2: Int, mb3: Int,
      mu0: Int, mu1: Int, mu2: Int, mu3: Int,
      mv0: Int, mv1: Int, mv2: Int, mv3: Int,
      y_mean: Double, u_mean: Double, v_mean: Double)

  /** Fixture: one 64×16 key frame (4 MBs) per doc. Luma mode ladder
    * (doc_id+k)%4 walks DC/V/H/TM across the row and the chroma mode
    * doc_id%4 sweeps all four per doc; residuals (Y2 DC for luma, a
    * shared per-plane chroma DC) cover negatives and the zero→SKIP
    * lane; qi ladder (doc_id%16)*8 sweeps the quantizer range. The
    * oracle replays the closed-form integer recurrences — no codec in
    * SQL. */
  def asVp8LossyPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val qi = ((docId % 16) * 8).toInt
          val mbs = (0 until 4).map { k =>
            MbSpec(((docId + k) % 4).toInt,
              (((docId * 7 + k * 5) % 13) - 6).toInt,
              uDc = (((docId * 3 + k * 7) % 11) - 5).toInt,
              vDc = (((docId * 5 + k * 3) % 9) - 4).toInt)
          }
          (docId, Vp8Encoder.webpFile(64, 16, qi, mbs,
            uvMode = (docId % 4).toInt))
        }
      }.toDF("doc_id", "payload")
  }

  def extractLuma(
      spark: SparkSession, media: DataFrame): Dataset[Vp8LumaRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Vp8Codec.lumaFromWebp(bytes).map { l =>
          def meanOf(p: Array[Byte]): Double = {
            var sum = 0L
            var i = 0
            while (i < p.length) { sum += p(i) & 0xff; i += 1 }
            math.rint(sum.toDouble / p.length * 1e6) / 1e6
          }
          def mb(k: Int): Int =
            if (k < l.mb_cols) l.y(k * 16) & 0xff else -1
          def cmb(p: Array[Byte], k: Int): Int =
            if (k < l.mb_cols) p(k * 8) & 0xff else -1
          Vp8LumaRow(id, l.width, l.height, l.qi, l.modes, l.uv_modes,
            mb(0), mb(1), mb(2), mb(3),
            cmb(l.u, 0), cmb(l.u, 1), cmb(l.u, 2), cmb(l.u, 3),
            cmb(l.v, 0), cmb(l.v, 1), cmb(l.v, 2), cmb(l.v, 3),
            meanOf(l.y), meanOf(l.u), meanOf(l.v))
        }
      })
  }
}
