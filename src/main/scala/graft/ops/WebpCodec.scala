package graft.ops

/** WebP (RIFF) container triage + a COMPLETE from-scratch VP8L lossless
  * decoder — the #3 web-crawl image format, formerly classified `raw`.
  *
  * Implemented against the PUBLIC specs only: RFC 9649 (WebP image
  * format: container layout, VP8L bitstream) and RFC 6386 (VP8 lossy
  * frame header, used for triage dimensions). Layers:
  *
  *   - [[triage]]: RIFF/WEBP chunk walk → codec variant (vp8l / vp8 /
  *     anim), dimensions (codec header or VP8X canvas), alpha +
  *     animation flags. Pure byte parsing, works on every variant.
  *   - [[decodeVp8l]]: full VP8L lossless pixel decode — canonical
  *     prefix (Huffman) codes incl. the code-length-code and simple
  *     forms, meta prefix groups (entropy image), color cache, LZ77
  *     backward references with the 2D distance mapping, and all four
  *     transforms (predictor ×14 modes, color, subtract-green,
  *     color-indexing with sub-byte pixel bundling). Deterministic →
  *     oracle-checkable bit-for-bit like the PNG lane.
  *   - Lossy VP8 pixel decode is OUT OF SCOPE (a DCT codec, not
  *     oracle-checkable exactly): such files triage with real
  *     dimensions but land in the decode ledger's quarantine lane
  *     observably, the same discipline as arithmetic-coded JPEG.
  *   - [[Vp8lEncoder]]: fixture-side from-scratch encoder (real
  *     canonical Huffman over actual symbol histograms, LZ77 runs,
  *     color cache, predictor / subtract-green / palette transforms) so
  *     specs cross-check decode against an INDEPENDENTLY-written
  *     bitstream producer — there is no JDK WebP codec to pin against.
  *
  * Reference parity anchor: the reference engine has no media layer at
  * all; this extends the repo's multimodal tier (SURVEY §2 extension).
  */
object WebpCodec {

  /** Triage row: codec variant + dims + flags (the WebP sibling of
    * [[MultimodalOps.VideoMeta]]). `extended` = VP8X container present;
    * width/height are the VP8X canvas when extended, else the codec
    * header's. */
  final case class WebpMeta(
      doc_id: Long, variant: String, width: Int, height: Int,
      has_alpha: Boolean, has_anim: Boolean, extended: Boolean)

  /** Decoded-pixel statistics (the ARGB sibling of
    * [[MultimodalOps.TgaPixels]] with an alpha channel). */
  final case class WebpPixels(
      doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, sum_a: Long,
      first_r: Int, first_g: Int, first_b: Int, first_a: Int)

  private def u8(b: Array[Byte], i: Int) = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
  private def cc(b: Array[Byte], i: Int) = new String(b, i, 4, "US-ASCII")

  def isWebp(b: Array[Byte]): Boolean =
    b.length >= 12 && cc(b, 0) == "RIFF" && cc(b, 8) == "WEBP"

  /** All top-level chunks as (fourcc, payloadStart, payloadLen); stops
    * cleanly at truncation (partial trailing chunk dropped). */
  private def chunks(b: Array[Byte]): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var i = 12
    while (i + 8 <= b.length) {
      val len = le32(b, i + 4)
      if (len < 0 || len > Int.MaxValue - 16 || i + 8 + len > b.length)
        return out.result()
      out += ((cc(b, i), i + 8, len.toInt))
      i += 8 + len.toInt + (len.toInt & 1) // odd sizes padded
    }
    out.result()
  }

  /** VP8L header: signature byte 0x2F, then LSB-first 14-bit (w-1),
    * 14-bit (h-1), 1-bit alpha hint, 3-bit version (must be 0). */
  private def vp8lDims(b: Array[Byte], at: Int, len: Int)
      : Option[(Int, Int, Boolean)] = {
    if (len < 5 || u8(b, at) != 0x2f) return None
    val bits = le32(b, at + 1)
    val w = (bits & 0x3fff).toInt + 1
    val h = ((bits >> 14) & 0x3fff).toInt + 1
    val alpha = ((bits >> 28) & 1) == 1
    val version = ((bits >> 29) & 7).toInt
    if (version != 0) None else Some((w, h, alpha))
  }

  /** VP8 (lossy) keyframe header per RFC 6386: 3-byte frame tag, start
    * code 9D 01 2A, then 14-bit LE dims (upper 2 bits are scale). */
  private def vp8Dims(b: Array[Byte], at: Int, len: Int): Option[(Int, Int)] = {
    if (len < 10) return None
    if (u8(b, at + 3) != 0x9d || u8(b, at + 4) != 0x01 ||
      u8(b, at + 5) != 0x2a) return None
    val w = (u8(b, at + 6) | (u8(b, at + 7) << 8)) & 0x3fff
    val h = (u8(b, at + 8) | (u8(b, at + 9) << 8)) & 0x3fff
    if (w == 0 || h == 0) None else Some((w, h))
  }

  /** RIFF/WEBP triage: variant + dims + alpha/animation flags. */
  def triage(b: Array[Byte]): Option[WebpMeta] = {
    if (!isWebp(b)) return None
    val cs = chunks(b)
    val vp8x = cs.find(_._1 == "VP8X")
    val ext = vp8x.map { case (_, at, len) =>
      if (len < 10) return None
      val flags = u8(b, at)
      val cw = le24(b, at + 4) + 1
      val ch = le24(b, at + 7) + 1
      (flags, cw, ch)
    }
    val anim = ext.exists(e => (e._1 & 0x02) != 0)
    val alphaFlag = ext.exists(e => (e._1 & 0x10) != 0)
    val lossless = cs.find(_._1 == "VP8L")
    val lossy = cs.find(_._1 == "VP8 ")
    if (anim) {
      // animation frames live inside ANMF sub-chunks — canvas-level triage
      val (_, cw, chh) = ext.get
      Some(WebpMeta(-1L, "anim", cw, chh, alphaFlag, has_anim = true,
        extended = true))
    } else (lossless, lossy) match {
      case (Some((_, at, len)), _) =>
        vp8lDims(b, at, len).map { case (w, h, a) =>
          val (ww, hh) = ext.map(e => (e._2, e._3)).getOrElse((w, h))
          WebpMeta(-1L, "vp8l", ww, hh, a || alphaFlag, has_anim = false,
            extended = ext.isDefined)
        }
      case (None, Some((_, at, len))) =>
        vp8Dims(b, at, len).map { case (w, h) =>
          val (ww, hh) = ext.map(e => (e._2, e._3)).getOrElse((w, h))
          WebpMeta(-1L, "vp8", ww, hh, alphaFlag, has_anim = false,
            extended = ext.isDefined)
        }
      case _ => None
    }
  }

  /** Full pixel decode of a (non-animated) lossless WebP; lossy VP8 and
    * animations return None → the quarantine lane. */
  def pixels(b: Array[Byte]): Option[WebpPixels] = {
    if (!isWebp(b)) return None
    chunks(b).find(_._1 == "VP8L").flatMap { case (_, at, len) =>
      decodeVp8l(b, at, len).map { case (w, h, px) =>
        var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sa += (p >>> 24); sr += (p >>> 16) & 0xff
          sg += (p >>> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        val f = px(0)
        WebpPixels(-1L, w, h, sr, sg, sb, sa,
          (f >>> 16) & 0xff, (f >>> 8) & 0xff, f & 0xff, f >>> 24)
      }
    }
  }

  // ---------------------------------------------------------------- VP8L

  /** Decode-failure control signal (truncated stream, invalid prefix
    * code, bad transform data) — caught at the [[decodeVp8l]] boundary
    * and surfaced as None, never a task failure. */
  private object Bail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** LSB-first bit reader over one VP8L chunk payload (RFC 9649 §3). */
  private final class Br(b: Array[Byte], var pos: Int, end: Int) {
    private var bit = 0
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= end) throw Bail
        v |= (((b(pos) >> bit) & 1) << i)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  /** Canonical prefix code (DEFLATE-style: per-length first codes +
    * symbols in canonical order; stream bits are the code MSB-first).
    * `single` >= 0 marks a one-symbol zero-bit code. */
  private final class Huff(
      val counts: Array[Int], val firstCodes: Array[Int],
      val offsets: Array[Int], val symbols: Array[Int], val single: Int) {
    def read(r: Br): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < 15) {
        code = (code << 1) | r.bits(1)
        len += 1
        val c = counts(len)
        if (c > 0 && code - firstCodes(len) < c)
          return symbols(offsets(len) + code - firstCodes(len))
      }
      throw Bail
    }
  }

  /** Build a canonical code from per-symbol lengths; rejects incomplete
    * or oversubscribed codes (corrupt streams must quarantine, not
    * mis-decode). A single used symbol yields a zero-bit code. */
  private def buildHuff(lengths: Array[Int]): Huff = {
    var used = 0
    var lastSym = -1
    var maxLen = 0
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l < 0 || l > 15) throw Bail
      if (l > 0) { used += 1; lastSym = i; if (l > maxLen) maxLen = l }
      i += 1
    }
    if (used == 0) throw Bail
    if (used == 1) return new Huff(null, null, null, null, lastSym)
    val counts = new Array[Int](16)
    i = 0
    while (i < lengths.length) { if (lengths(i) > 0) counts(lengths(i)) += 1; i += 1 }
    // Kraft completeness: exactly fills the code space
    var space = 1L << maxLen
    var l = 1
    while (l <= maxLen) { space -= counts(l).toLong << (maxLen - l); l += 1 }
    if (space != 0) throw Bail
    // canonical next_code per DEFLATE: first code of each length
    val firstCodes = new Array[Int](16)
    val offsets = new Array[Int](16)
    val next = new Array[Int](16)
    var code = 0
    var off = 0
    l = 1
    while (l <= 15) {
      code = (code + counts(l - 1)) << 1
      next(l) = code
      firstCodes(l) = code
      offsets(l) = off
      off += counts(l)
      l += 1
    }
    val symbols = new Array[Int](used)
    i = 0
    while (i < lengths.length) {
      val li = lengths(i)
      if (li > 0) {
        symbols(offsets(li) + (next(li) - firstCodes(li))) = i
        next(li) += 1
      }
      i += 1
    }
    new Huff(counts, firstCodes, offsets, symbols, -1)
  }

  /** Order in which code-length-code lengths are transmitted (RFC 9649). */
  private[ops] val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or normal form) for `alphabetSize`. */
  private def readHuffCode(r: Br, alphabetSize: Int): Huff = {
    if (r.bits(1) == 1) { // simple
      val numSymbols = r.bits(1) + 1
      val is8 = r.bits(1)
      val s0 = r.bits(if (is8 == 1) 8 else 1)
      if (s0 >= alphabetSize) throw Bail
      if (numSymbols == 1) new Huff(null, null, null, null, s0)
      else {
        val s1 = r.bits(8)
        if (s1 >= alphabetSize || s1 == s0) throw Bail
        val lengths = new Array[Int](alphabetSize)
        lengths(s0) = 1; lengths(s1) = 1
        buildHuff(lengths)
      }
    } else { // normal: code-length-code, then symbol lengths
      val numCodes = r.bits(4) + 4
      if (numCodes > 19) throw Bail
      val clcl = new Array[Int](19)
      var i = 0
      while (i < numCodes) { clcl(ClOrder(i)) = r.bits(3); i += 1 }
      val clTree = buildHuff(clcl)
      val lengths = new Array[Int](alphabetSize)
      var maxSymbol =
        if (r.bits(1) == 1) {
          val lenNBits = 2 + 2 * r.bits(3)
          val ms = 2 + r.bits(lenNBits)
          if (ms > alphabetSize) throw Bail
          ms
        } else alphabetSize
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clTree.read(r)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeat, fill) = cl match {
            case 16 => (3 + r.bits(2), prevLen)
            case 17 => (3 + r.bits(3), 0)
            case 18 => (11 + r.bits(7), 0)
            case _ => throw Bail
          }
          if (symbol + repeat > alphabetSize) throw Bail
          var k = 0
          while (k < repeat) { lengths(symbol) = fill; symbol += 1; k += 1 }
        }
      }
      buildHuff(lengths)
    }
  }

  /** One prefix-code group: green(+length+cache) / red / blue / alpha /
    * distance. */
  private final class Group(
      val green: Huff, val red: Huff, val blue: Huff, val alpha: Huff,
      val dist: Huff)

  private def readGroup(r: Br, cacheSize: Int): Group = new Group(
    readHuffCode(r, 256 + 24 + cacheSize),
    readHuffCode(r, 256), readHuffCode(r, 256), readHuffCode(r, 256),
    readHuffCode(r, 40))

  /** LZ77 prefix decode: code < 4 → code+1, else extra-bit form. */
  private def prefixValue(r: Br, code: Int): Int = {
    if (code < 0 || code >= 24) throw Bail
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + r.bits(extra) + 1
    }
  }

  /** 2D distance mapping for codes 1..120 (RFC 9649 §4.2.2): (dx, dy)
    * neighborhood offsets; code > 120 → literal distance - 120. */
  private val DistMap: Array[Int] = {
    val pairs = Array(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
      (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
      (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
      (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
      (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
      (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
      (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
      (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
      (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
      (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
      (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
      (-6, 7), (8, 5), (7, 6), (-7, 6), (8, 6), (7, 7), (-7, 7), (8, 7))
    pairs.flatMap { case (dx, dy) => Array(dx, dy) }
  }

  private[graft] def mapDistance(code: Int, xsize: Int): Int =
    if (code > 120) code - 120
    else {
      val dx = DistMap((code - 1) * 2)
      val dy = DistMap((code - 1) * 2 + 1)
      math.max(1, dy * xsize + dx)
    }

  /** Reverse lookup for the fixture encoder: distance → distance code
    * (neighborhood form when one exists, else dist + 120). */
  private[graft] def distToCode(dist: Int, xsize: Int): Int = {
    var i = 0
    while (i < 120) {
      val dx = DistMap(i * 2); val dy = DistMap(i * 2 + 1)
      if (math.max(1, dy * xsize + dx) == dist) return i + 1
      i += 1
    }
    dist + 120
  }

  private def divRoundUp(a: Int, b: Int) = (a + b - 1) / b

  /** Color-cache hash (spec constant). */
  private def cacheKey(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  /** Entropy-coded ARGB image (spec `decode_image_stream` without the
    * level-0 transform list): color cache, optional meta prefix groups
    * (level0 only), pixel/backref/cache loop. */
  private def decodeEntropyImage(
      r: Br, w: Int, h: Int, level0: Boolean): Array[Int] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) throw Bail
    val cacheBits = if (r.bits(1) == 1) r.bits(4) else 0
    if (cacheBits > 11) throw Bail
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    // meta prefix groups (spatially-coded main image only)
    var metaBits = 0
    var metaImg: Array[Int] = null
    var metaW = 0
    if (level0 && r.bits(1) == 1) {
      metaBits = r.bits(3) + 2
      metaW = divRoundUp(w, 1 << metaBits)
      metaImg = decodeImageStream(
        r, metaW, divRoundUp(h, 1 << metaBits), level0 = false)
    }
    val numGroups =
      if (metaImg == null) 1
      else {
        var mx = 0
        var i = 0
        while (i < metaImg.length) {
          val m = (metaImg(i) >>> 8) & 0xffff
          if (m > mx) mx = m
          i += 1
        }
        if (mx > 1000) throw Bail // sanity: corrupt entropy image
        mx + 1
      }
    val groups = Array.fill(numGroups)(readGroup(r, cacheSize))
    val n = w * h
    val px = new Array[Int](n)
    var pos = 0
    def insert(argb: Int): Unit =
      if (cache != null) cache(cacheKey(argb, cacheBits)) = argb
    while (pos < n) {
      val g =
        if (metaImg == null) groups(0)
        else {
          val x = pos % w; val y = pos / w
          val meta = metaImg((y >> metaBits) * metaW + (x >> metaBits))
          groups((meta >>> 8) & 0xffff)
        }
      val s = g.green.read(r)
      if (s < 256) {
        val red = g.red.read(r)
        val blue = g.blue.read(r)
        val alpha = g.alpha.read(r)
        val argb = (alpha << 24) | (red << 16) | (s << 8) | blue
        px(pos) = argb
        insert(argb)
        pos += 1
      } else if (s < 256 + 24) {
        val len = prefixValue(r, s - 256)
        val dcode = prefixValue(r, g.dist.read(r))
        val dist = mapDistance(dcode, w)
        if (dist <= 0 || dist > pos || pos + len > n) throw Bail
        var k = 0
        while (k < len) {
          val v = px(pos - dist)
          px(pos) = v
          insert(v)
          pos += 1
          k += 1
        }
      } else {
        if (cache == null) throw Bail
        val idx = s - 256 - 24
        if (idx >= cacheSize) throw Bail
        px(pos) = cache(idx)
        pos += 1
      }
    }
    px
  }

  /** One recorded transform: type, the xsize it was read at, and its
    * data (sub-image or palette). */
  private final case class Xform(
      tpe: Int, wAtRead: Int, sizeBits: Int, data: Array[Int])

  /** `decode_image_stream`: transforms (level 0 only) then the entropy-
    * coded image; inverse transforms applied in reverse read order. */
  private def decodeImageStream(
      r: Br, w0: Int, h: Int, level0: Boolean): Array[Int] = {
    var w = w0
    val xforms = Seq.newBuilder[Xform]
    var seen = 0
    if (level0) {
      while (r.bits(1) == 1) {
        val tpe = r.bits(2)
        if ((seen & (1 << tpe)) != 0) throw Bail // each type at most once
        seen |= 1 << tpe
        tpe match {
          case 0 | 1 => // predictor / color transform: mode sub-image
            val sizeBits = r.bits(3) + 2
            val sub = decodeImageStream(
              r, divRoundUp(w, 1 << sizeBits),
              divRoundUp(h, 1 << sizeBits), level0 = false)
            xforms += Xform(tpe, w, sizeBits, sub)
          case 2 => // subtract green
            xforms += Xform(2, w, 0, null)
          case 3 => // color indexing
            val nColors = r.bits(8) + 1
            val deltas = decodeImageStream(r, nColors, 1, level0 = false)
            // palette entries are component-wise delta-coded
            val pal = new Array[Int](nColors)
            var acc = 0
            var i = 0
            while (i < nColors) {
              acc = addPixels(acc, deltas(i))
              pal(i) = acc
              i += 1
            }
            val xbits =
              if (nColors <= 2) 3 else if (nColors <= 4) 2
              else if (nColors <= 16) 1 else 0
            xforms += Xform(3, w, xbits, pal)
            w = divRoundUp(w, 1 << xbits)
          case _ => throw Bail
        }
      }
    }
    var px = decodeEntropyImage(r, w, h, level0)
    var curW = w
    // inverse transforms, reverse order
    val list = xforms.result()
    var i = list.length - 1
    while (i >= 0) {
      val x = list(i)
      x.tpe match {
        case 0 => px = inversePredictor(px, x.wAtRead, h, x.sizeBits, x.data)
        case 1 => px = inverseColorTransform(px, x.wAtRead, h, x.sizeBits, x.data)
        case 2 =>
          var j = 0
          while (j < px.length) {
            val p = px(j)
            val g = (p >>> 8) & 0xff
            val rr = (((p >>> 16) & 0xff) + g) & 0xff
            val bb = ((p & 0xff) + g) & 0xff
            px(j) = (p & 0xff00ff00) | (rr << 16) | bb
            j += 1
          }
        case 3 =>
          px = inverseColorIndex(px, curW, x.wAtRead, h, x.sizeBits, x.data)
      }
      curW = x.wAtRead
      i -= 1
    }
    px
  }

  /** Per-channel modular pixel addition (palette delta decode,
    * predictor residual application). */
  private def addPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) & 0xff) << 24
    val rr = ((((a >>> 16) & 0xff) + ((b >>> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >>> 8) & 0xff) + ((b >>> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) + (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  private def avg2(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) >> 1) << 24
    val rr = ((((a >>> 16) & 0xff) + ((b >>> 16) & 0xff)) >> 1) << 16
    val gg = ((((a >>> 8) & 0xff) + ((b >>> 8) & 0xff)) >> 1) << 8
    val bb = (((a & 0xff) + (b & 0xff)) >> 1)
    aa | rr | gg | bb
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    def ch(sa: Int, sb: Int, sc: Int) = clamp255(sa + sb - sc)
    (ch(a >>> 24, b >>> 24, c >>> 24) << 24) |
      (ch((a >>> 16) & 0xff, (b >>> 16) & 0xff, (c >>> 16) & 0xff) << 16) |
      (ch((a >>> 8) & 0xff, (b >>> 8) & 0xff, (c >>> 8) & 0xff) << 8) |
      ch(a & 0xff, b & 0xff, c & 0xff)
  }

  private def clampAddSubtractHalf(ab: Int, c: Int): Int = {
    def ch(sa: Int, sc: Int) = clamp255(sa + (sa - sc) / 2)
    (ch(ab >>> 24, c >>> 24) << 24) |
      (ch((ab >>> 16) & 0xff, (c >>> 16) & 0xff) << 16) |
      (ch((ab >>> 8) & 0xff, (c >>> 8) & 0xff) << 8) |
      ch(ab & 0xff, c & 0xff)
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = math.abs(p - s)
    val pa = (l >>> 24) + (t >>> 24) - (tl >>> 24)
    val pr = ((l >>> 16) & 0xff) + ((t >>> 16) & 0xff) - ((tl >>> 16) & 0xff)
    val pg = ((l >>> 8) & 0xff) + ((t >>> 8) & 0xff) - ((tl >>> 8) & 0xff)
    val pb = (l & 0xff) + (t & 0xff) - (tl & 0xff)
    val pL = ch(pa, l >>> 24) + ch(pr, (l >>> 16) & 0xff) +
      ch(pg, (l >>> 8) & 0xff) + ch(pb, l & 0xff)
    val pT = ch(pa, t >>> 24) + ch(pr, (t >>> 16) & 0xff) +
      ch(pg, (t >>> 8) & 0xff) + ch(pb, t & 0xff)
    if (pL < pT) l else t
  }

  /** Prediction of pixel (x,y) under `mode`, given the RECONSTRUCTED
    * image so far. Shared verbatim by the fixture encoder so both sides
    * derive from one formula implementation of the public spec. */
  private[ops] def predict(
      px: Array[Int], w: Int, x: Int, y: Int, mode: Int): Int = {
    // border rules override the block mode
    if (x == 0 && y == 0) return 0xff000000
    if (y == 0) return px(y * w + x - 1) // top row: left
    if (x == 0) return px((y - 1) * w) // left column: top
    val i = y * w + x
    val l = px(i - 1)
    val t = px(i - w)
    val tl = px(i - w - 1)
    val tr = if (x + 1 < w) px(i - w + 1) else px((y - 1) * w) // wraps per spec
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(l, t, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(avg2(l, t), tl)
      case _ => throw Bail
    }
  }

  private def inversePredictor(
      res: Array[Int], w: Int, h: Int, sizeBits: Int,
      modes: Array[Int]): Array[Int] = {
    val bw = divRoundUp(w, 1 << sizeBits)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val mode =
          (modes((y >> sizeBits) * bw + (x >> sizeBits)) >>> 8) & 0xff
        if (mode > 13) throw Bail
        val pred = predict(out, w, x, y, mode)
        out(y * w + x) = addPixels(res(y * w + x), pred)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Signed 3.5 fixed-point color-transform delta (spec): both operands
    * as signed 8-bit. */
  private[ops] def ctDelta(t: Int, c: Int): Int =
    (t.toByte * c.toByte) >> 5

  private def inverseColorTransform(
      px: Array[Int], w: Int, h: Int, sizeBits: Int,
      elems: Array[Int]): Array[Int] = {
    val bw = divRoundUp(w, 1 << sizeBits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // element pixel packs 0xff000000 | r2b<<16 | g2b<<8 | g2r
        val e = elems((y >> sizeBits) * bw + (x >> sizeBits))
        val r2b = (e >>> 16) & 0xff
        val g2b = (e >>> 8) & 0xff
        val g2r = e & 0xff
        val i = y * w + x
        val p = px(i)
        val g = (p >>> 8) & 0xff
        val rr = (((p >>> 16) & 0xff) + ctDelta(g2r, g)) & 0xff
        val bb = ((p & 0xff) + ctDelta(g2b, g) + ctDelta(r2b, rr)) & 0xff
        px(i) = (p & 0xff00ff00) | (rr << 16) | bb
        x += 1
      }
      y += 1
    }
    px
  }

  private def inverseColorIndex(
      packed: Array[Int], packedW: Int, w: Int, h: Int, xbits: Int,
      pal: Array[Int]): Array[Int] = {
    if (xbits == 0) {
      // no bundling: each green byte is a palette index
      val out = new Array[Int](w * h)
      var i = 0
      while (i < out.length) {
        val idx = (packed(i) >>> 8) & 0xff
        if (idx >= pal.length) throw Bail
        out(i) = pal(idx)
        i += 1
      }
      out
    } else {
      val bpp = 8 >> xbits
      val mask = (1 << bpp) - 1
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val green =
            (packed(y * packedW + (x >> xbits)) >>> 8) & 0xff
          val idx = (green >> ((x & ((1 << xbits) - 1)) * bpp)) & mask
          if (idx >= pal.length) throw Bail
          out(y * w + x) = pal(idx)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Composited animation statistics: frame count, canvas dims, total
    * duration, and the FINAL canvas's channel sums — the state after
    * every frame rendered with its blend/dispose semantics. */
  final case class WebpAnim(
      doc_id: Long, n_frames: Int, width: Int, height: Int,
      duration_ms: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, sum_a: Long,
      first_r: Int, first_g: Int, first_b: Int, first_a: Int)

  /** FULL animated-WebP decode (lossless animations): walk the ANMF
    * frame chunks, decode each frame's VP8L payload, and composite onto
    * the canvas per RFC 9649 — frame offsets (stored /2), alpha-blend
    * vs overwrite (B bit), dispose-to-background (D bit), canvas starts
    * transparent black. Animations with any lossy (VP8) frame
    * quarantine — same scope rule as the still path. */
  def animPixels(b: Array[Byte]): Option[WebpAnim] = {
    if (!isWebp(b)) return None
    val cs = chunks(b)
    val vp8x = cs.find(_._1 == "VP8X").getOrElse(return None)
    if (vp8x._3 < 10 || (u8(b, vp8x._2) & 0x02) == 0) return None
    val cw = le24(b, vp8x._2 + 4) + 1
    val ch = le24(b, vp8x._2 + 7) + 1
    if (cw.toLong * ch > (1L << 24)) return None
    val frames = cs.filter(_._1 == "ANMF")
    if (frames.isEmpty) return None
    val canvas = new Array[Int](cw * ch) // transparent black
    var totalMs = 0L
    var prevDisposeRect: Option[(Int, Int, Int, Int)] = None
    for ((_, at, len) <- frames) {
      if (len < 16 + 8) return None
      val fx = le24(b, at) * 2
      val fy = le24(b, at + 3) * 2
      val fw = le24(b, at + 6) + 1
      val fh = le24(b, at + 9) + 1
      val dur = le24(b, at + 12)
      val flags = u8(b, at + 15)
      val blendOverwrite = (flags & 0x02) != 0 // B: 1 = do not blend
      val dispose = (flags & 0x01) != 0 // D: 1 = dispose to background
      if (fx + fw > cw || fy + fh > ch) return None
      // frame payload: sub-chunks after the 16-byte ANMF header
      var j = at + 16
      var vp8l: Option[(Int, Int)] = None
      while (j + 8 <= at + len && vp8l.isEmpty) {
        val clen = le32(b, j + 4)
        if (clen < 0 || j + 8 + clen > at + len) return None
        cc(b, j) match {
          case "VP8L" => vp8l = Some((j + 8, clen.toInt))
          case "VP8 " => return None // lossy frame: out of scope
          case _ => () // ALPH et al — skip
        }
        j += 8 + clen.toInt + (clen.toInt & 1)
      }
      val (pAt, pLen) = vp8l.getOrElse(return None)
      val (dw, dh, px) = decodeVp8l(b, pAt, pLen).getOrElse(return None)
      if (dw != fw || dh != fh) return None
      // dispose of the PREVIOUS frame happens when advancing to this one
      prevDisposeRect.foreach { case (dx, dy, dwid, dhei) =>
        var y = 0
        while (y < dhei) {
          java.util.Arrays.fill(canvas, (dy + y) * cw + dx,
            (dy + y) * cw + dx + dwid, 0)
          y += 1
        }
      }
      var y = 0
      while (y < fh) {
        var x = 0
        while (x < fw) {
          val s = px(y * fw + x)
          val i = (fy + y) * cw + (fx + x)
          canvas(i) =
            if (blendOverwrite) s
            else { // src-over alpha blend (spec fractional arithmetic)
              val as = s >>> 24
              if (as == 255) s
              else if (as == 0) canvas(i)
              else {
                val d = canvas(i)
                val ad = d >>> 24
                val blendA = as + ad * (255 - as) / 255
                if (blendA == 0) 0
                else {
                  def chn(sc: Int, dc: Int): Int =
                    (sc * as + dc * ad * (255 - as) / 255) / blendA
                  (blendA << 24) |
                    (chn((s >>> 16) & 0xff, (d >>> 16) & 0xff) << 16) |
                    (chn((s >>> 8) & 0xff, (d >>> 8) & 0xff) << 8) |
                    chn(s & 0xff, d & 0xff)
                }
              }
            }
          x += 1
        }
        y += 1
      }
      prevDisposeRect = if (dispose) Some((fx, fy, fw, fh)) else None
      totalMs += dur
    }
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    canvas.foreach { p =>
      sa += p >>> 24; sr += (p >>> 16) & 0xff
      sg += (p >>> 8) & 0xff; sb += p & 0xff
    }
    val f = canvas(0)
    Some(WebpAnim(-1L, frames.length, cw, ch, totalMs, sr, sg, sb, sa,
      (f >>> 16) & 0xff, (f >>> 8) & 0xff, f & 0xff, f >>> 24))
  }

  /** Decode one VP8L chunk payload → (width, height, ARGB pixels). */
  def decodeVp8l(b: Array[Byte], at: Int, len: Int)
      : Option[(Int, Int, Array[Int])] =
    try {
      vp8lDims(b, at, len).flatMap { case (w, h, _) =>
        if (w.toLong * h > (1L << 24)) None // dimension bomb guard
        else {
          val r = new Br(b, at + 1, at + len)
          r.bits(32) // skip the dims/version header bits
          val px = decodeImageStream(r, w, h, level0 = true)
          if (px.length != w * h) None else Some((w, h, px))
        }
      }
    } catch { case Bail => None }
}

/** Fixture-side FROM-SCRATCH VP8L encoder — the independent cross-check
  * for [[WebpCodec.decodeVp8l]] (no JDK WebP codec exists to pin
  * against, so the encoder is written separately from the decoder
  * against the same public spec, like the repo's progressive-JPEG
  * fixture encoder). Emits REAL canonical prefix codes built from
  * actual symbol histograms via the code-length-code, LZ77 backward
  * references (horizontal and vertical runs), a color cache, optional
  * meta prefix groups, and the four transforms. */
object Vp8lEncoder {
  import WebpCodec.{predict, ctDelta, distToCode}

  final case class Opts(
      subtractGreen: Boolean = false,
      predictor: Option[(Int, Int)] = None, // (mode 0-13, sizeBits 2-9)
      colorXform: Option[(Int, Int, Int, Int)] = None, // g2r,g2b,r2b,sizeBits
      palette: Option[Array[Int]] = None, // every pixel must be a member
      cacheBits: Int = 0,
      lz77: Boolean = false,
      metaBits: Option[Int] = None, // 2-group split of the main image
      alphaHint: Boolean = false)

  /** LSB-first bit writer (the dual of the decoder's reader). */
  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def bits(v: Int, w: Int): Unit = {
      var i = 0
      while (i < w) {
        acc |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i += 1
      }
    }
    /** Canonical prefix code: MSB of the code first in the stream. */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bits((c >> i) & 1, 1); i -= 1 }
    }
    def byte(v: Int): Unit = bits(v, 8)
    def toBytes: Array[Byte] = {
      if (n > 0) { out.write(acc); acc = 0; n = 0 }
      out.toByteArray
    }
  }

  /** Real Huffman code lengths from frequencies (two-queue algorithm);
    * fixture alphabets are small enough that depth never nears the
    * 15-bit cap (asserted). */
  private def huffLengths(freq: Array[Long]): Array[Int] = {
    final case class Node(f: Long, sym: Int, l: Node, r: Node)
    val leaves = freq.zipWithIndex.collect {
      case (f, i) if f > 0 => Node(f, i, null, null)
    }.sortBy(n => (n.f, n.sym)).toList
    val lengths = new Array[Int](freq.length)
    if (leaves.isEmpty) return lengths
    if (leaves.size == 1) { lengths(leaves.head.sym) = 1; return lengths }
    var q1 = leaves
    var q2 = List.empty[Node]
    def pop(): Node = (q1, q2) match {
      case (a :: ta, b :: _) if a.f <= b.f => q1 = ta; a
      case (a :: ta, Nil) => q1 = ta; a
      case (_, b :: tb) => q2 = tb; b
      case _ => sys.error("vp8l encoder: empty huffman queues")
    }
    var remaining = leaves.size
    while (remaining > 1) {
      val a = pop(); val b = pop()
      q2 = q2 :+ Node(a.f + b.f, -1, a, b)
      remaining -= 1
    }
    def walk(n: Node, d: Int): Unit =
      if (n.sym >= 0) {
        require(d <= 15, "vp8l encoder: huffman depth > 15")
        lengths(n.sym) = math.max(d, 1)
      } else { walk(n.l, d + 1); walk(n.r, d + 1) }
    walk(pop(), 0)
    lengths
  }

  /** Canonical codes from lengths (same next_code as the decoder). */
  private def canonical(lengths: Array[Int]): Array[Int] = {
    val counts = new Array[Int](16)
    lengths.foreach(l => if (l > 0) counts(l) += 1)
    val next = new Array[Int](16)
    var code = 0
    var l = 1
    while (l <= 15) {
      code = (code + counts(l - 1)) << 1
      next(l) = code
      l += 1
    }
    lengths.map { li =>
      if (li == 0) 0 else { val c = next(li); next(li) += 1; c }
    }
  }

  /** Complete ("balanced") code lengths over exactly the used symbols —
    * for the code-length-code, where real Huffman could exceed the
    * 7-bit field. k symbols → x = 2k - 2^ceil(log2 k) codes of length L,
    * the rest L-1 (Kraft-exact). */
  private def balancedLengths(size: Int, used: Seq[Int]): Array[Int] = {
    val lengths = new Array[Int](size)
    val k = used.size
    if (k == 1) { lengths(used.head) = 1; return lengths }
    var lbits = 1
    while ((1 << lbits) < k) lbits += 1
    val x = 2 * k - (1 << lbits)
    used.zipWithIndex.foreach { case (s, i) =>
      lengths(s) = if (i < x) lbits else lbits - 1
    }
    lengths
  }

  /** Write one prefix code (simple form when ≤2 used symbols all <256,
    * else normal form via the code-length-code). Returns the canonical
    * codes for the symbol emission pass. */
  private def writeHuffCode(bw: Bw, lengths: Array[Int]): Array[Int] = {
    val used = lengths.zipWithIndex.collect { case (l, i) if l > 0 => i }
    require(used.nonEmpty, "vp8l encoder: empty alphabet")
    if (used.length <= 2 && used.forall(_ < 256)) {
      bw.bits(1, 1) // simple
      bw.bits(used.length - 1, 1)
      if (used.length == 1) {
        val s = used(0)
        if (s < 2) { bw.bits(0, 1); bw.bits(s, 1) }
        else { bw.bits(1, 1); bw.byte(s) }
        // single symbol → zero-bit code
        val codes = new Array[Int](lengths.length)
        lengths(used(0)) = 0 // read side consumes no bits
        codes
      } else {
        bw.bits(1, 1) // 8-bit first symbol
        bw.byte(used(0))
        bw.byte(used(1))
        lengths(used(0)) = 1; lengths(used(1)) = 1
        val codes = new Array[Int](lengths.length)
        codes(used(0)) = 0; codes(used(1)) = 1
        codes
      }
    } else {
      bw.bits(0, 1) // normal
      // code-length-code over the distinct length values (no repeats)
      val clUsed = lengths.distinct.sorted
      val clcl = balancedLengths(19, clUsed)
      val clCodes = canonical(clcl)
      bw.bits(19 - 4, 4) // num_code_lengths = 19 (covers order positions)
      WebpCodec.ClOrder.foreach(s => bw.bits(clcl(s), 3))
      bw.bits(0, 1) // no explicit max_symbol
      // a single-symbol cl code is ZERO-bit on the read side (the
      // transmitted 3-bit length 1 only identifies the symbol)
      val clEmit = if (clUsed.size == 1) new Array[Int](19) else clcl
      lengths.foreach(l => bw.code(clCodes(l), clEmit(l)))
      val codes = canonical(lengths)
      // same rule for the code itself: one used symbol → zero-bit reads
      if (used.length == 1) lengths(used(0)) = 0
      codes
    }
  }

  /** prefixEncode: value ≥ 1 → (code, extraBits, extraVal) — the exact
    * inverse of the decoder's prefixValue. */
  private def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) (v - 1, 0, 0)
    else {
      val x = v - 1
      val hb = 31 - Integer.numberOfLeadingZeros(x)
      val eb = hb - 1
      val p = (x >> eb) & 1
      val code = 2 + 2 * eb + p
      (code, eb, x - ((2 + p) << eb))
    }
  }

  private sealed trait Tok
  private final case class Lit(argb: Int) extends Tok
  private final case class Copy(len: Int, dist: Int) extends Tok
  private final case class Hit(idx: Int) extends Tok

  /** Tokenize a pixel stream: greedy horizontal/vertical runs (when
    * lz77), then cache hits, then literals — maintaining the cache
    * exactly as the decoder will. */
  private def tokenize(
      px: Array[Int], w: Int, cacheBits: Int, lz77: Boolean): Seq[Tok] = {
    val out = Seq.newBuilder[Tok]
    val cache =
      if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val seen =
      if (cacheBits > 0) new Array[Boolean](1 << cacheBits) else null
    def insert(argb: Int): Unit = if (cache != null) {
      val k = (0x1e35a7bd * argb) >>> (32 - cacheBits)
      cache(k) = argb; seen(k) = true
    }
    var i = 0
    while (i < px.length) {
      var emitted = false
      if (lz77 && i > 0) {
        // horizontal run (dist 1), else vertical (dist w)
        var dist = 0
        if (px(i) == px(i - 1)) dist = 1
        else if (i >= w && px(i) == px(i - w)) dist = w
        if (dist > 0) {
          var len = 0
          while (i + len < px.length && px(i + len) == px(i + len - dist))
            len += 1
          if (len >= 3) {
            out += Copy(len, dist)
            var k = 0
            while (k < len) { insert(px(i + k)); k += 1 }
            i += len
            emitted = true
          }
        }
      }
      if (!emitted) {
        val p = px(i)
        val k =
          if (cache != null) (0x1e35a7bd * p) >>> (32 - cacheBits) else 0
        if (cache != null && seen(k) && cache(k) == p) out += Hit(k)
        else out += Lit(p)
        insert(p)
        i += 1
      }
    }
    out.result()
  }

  /** Histograms + emission for one prefix-code group over `toks`. */
  private def writeGroupAndTokens(
      bw: Bw, tokGroups: Seq[Seq[Tok]], interleaved: Seq[(Int, Tok)],
      cacheBits: Int, w: Int): Unit = {
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    final case class Codes(
        gL: Array[Int], gC: Array[Int], rL: Array[Int], rC: Array[Int],
        bL: Array[Int], bC: Array[Int], aL: Array[Int], aC: Array[Int],
        dL: Array[Int], dC: Array[Int])
    val groupCodes = tokGroups.map { toks =>
      val gf = new Array[Long](256 + 24 + cacheSize)
      val rf = new Array[Long](256)
      val bf = new Array[Long](256)
      val af = new Array[Long](256)
      val df = new Array[Long](40)
      toks.foreach {
        case Lit(p) =>
          gf((p >>> 8) & 0xff) += 1; rf((p >>> 16) & 0xff) += 1
          bf(p & 0xff) += 1; af(p >>> 24) += 1
        case Copy(len, dist) =>
          gf(256 + prefixEncode(len)._1) += 1
          df(prefixEncode(distToCode(dist, w))._1) += 1
        case Hit(idx) => gf(256 + 24 + idx) += 1
      }
      // channels a group never reads still need a (trivial) valid code
      if (rf.forall(_ == 0)) rf(0) = 1
      if (bf.forall(_ == 0)) bf(0) = 1
      if (af.forall(_ == 0)) af(0) = 1
      if (df.forall(_ == 0)) df(0) = 1
      if (gf.forall(_ == 0)) gf(0) = 1
      val (gl, rl, bl, al, dl) = (huffLengths(gf), huffLengths(rf),
        huffLengths(bf), huffLengths(af), huffLengths(df))
      val gc = writeHuffCode(bw, gl)
      val rc = writeHuffCode(bw, rl)
      val bc = writeHuffCode(bw, bl)
      val ac = writeHuffCode(bw, al)
      val dc = writeHuffCode(bw, dl)
      Codes(gl, gc, rl, rc, bl, bc, al, ac, dl, dc)
    }
    interleaved.foreach { case (gi, tok) =>
      val c = groupCodes(gi)
      tok match {
        case Lit(p) =>
          val g = (p >>> 8) & 0xff
          bw.code(c.gC(g), c.gL(g))
          val r = (p >>> 16) & 0xff
          bw.code(c.rC(r), c.rL(r))
          val b = p & 0xff
          bw.code(c.bC(b), c.bL(b))
          val a = p >>> 24
          bw.code(c.aC(a), c.aL(a))
        case Copy(len, dist) =>
          val (lc, leb, lev) = prefixEncode(len)
          bw.code(c.gC(256 + lc), c.gL(256 + lc))
          if (leb > 0) bw.bits(lev, leb)
          val (dcd, deb, dev) = prefixEncode(distToCode(dist, w))
          bw.code(c.dC(dcd), c.dL(dcd))
          if (deb > 0) bw.bits(dev, deb)
        case Hit(idx) =>
          bw.code(c.gC(256 + 24 + idx), c.gL(256 + 24 + idx))
      }
    }
  }

  /** Entropy-coded sub-image (palette deltas, predictor modes, color
    * elements, entropy image): no cache, literals only, one group. */
  private def writeSubImage(bw: Bw, px: Array[Int], w: Int): Unit = {
    bw.bits(0, 1) // no color cache
    val toks = px.map(Lit(_): Tok).toSeq
    writeGroupAndTokens(bw, Seq(toks), toks.map((0, _)), 0, w)
  }

  private def divRoundUp(a: Int, b: Int) = (a + b - 1) / b
  private def subPx(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) - (b >>> 24)) & 0xff) << 24
    val rr = ((((a >>> 16) & 0xff) - ((b >>> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >>> 8) & 0xff) - ((b >>> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) - (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  /** Encode ARGB pixels → a complete VP8L chunk payload. */
  def encode(argb0: Array[Int], w0: Int, h: Int, opts: Opts): Array[Byte] = {
    var px = argb0.clone()
    var w = w0
    val bw = new Bw()
    bw.byte(0x2f)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(if (opts.alphaHint) 1 else 0, 1)
    bw.bits(0, 3) // version
    // transforms in read order: predictor, color, subtract-green, palette
    opts.predictor.foreach { case (mode, sizeBits) =>
      bw.bits(1, 1); bw.bits(0, 2) // PREDICTOR
      bw.bits(sizeBits - 2, 3)
      val bwid = divRoundUp(w, 1 << sizeBits)
      val bhei = divRoundUp(h, 1 << sizeBits)
      writeSubImage(bw,
        Array.fill(bwid * bhei)(0xff000000 | (mode << 8)), bwid)
      val cur = px
      val res = new Array[Int](cur.length)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          res(y * w + x) = subPx(cur(y * w + x), predict(cur, w, x, y, mode))
          x += 1
        }
        y += 1
      }
      px = res
    }
    opts.colorXform.foreach { case (g2r, g2b, r2b, sizeBits) =>
      bw.bits(1, 1); bw.bits(1, 2) // COLOR TRANSFORM
      bw.bits(sizeBits - 2, 3)
      val bwid = divRoundUp(w, 1 << sizeBits)
      val bhei = divRoundUp(h, 1 << sizeBits)
      val elem = 0xff000000 | ((r2b & 0xff) << 16) | ((g2b & 0xff) << 8) |
        (g2r & 0xff)
      writeSubImage(bw, Array.fill(bwid * bhei)(elem), bwid)
      px = px.map { p =>
        val g = (p >>> 8) & 0xff
        val r = ((p >>> 16) & 0xff)
        val rr = (r - ctDelta(g2r, g)) & 0xff
        // the decoder recovers ORIGINAL red before the red→blue delta,
        // so the forward pass must subtract the delta of the original
        val bb = ((p & 0xff) - ctDelta(g2b, g) - ctDelta(r2b, r)) & 0xff
        (p & 0xff00ff00) | (rr << 16) | bb
      }
    }
    if (opts.subtractGreen) {
      bw.bits(1, 1); bw.bits(2, 2) // SUBTRACT GREEN
      px = px.map { p =>
        val g = (p >>> 8) & 0xff
        val rr = (((p >>> 16) & 0xff) - g) & 0xff
        val bb = ((p & 0xff) - g) & 0xff
        (p & 0xff00ff00) | (rr << 16) | bb
      }
    }
    opts.palette.foreach { pal =>
      bw.bits(1, 1); bw.bits(3, 2) // COLOR INDEXING
      bw.bits(pal.length - 1, 8)
      val deltas = pal.zipWithIndex.map { case (c, i) =>
        if (i == 0) c else subPx(c, pal(i - 1))
      }
      writeSubImage(bw, deltas, pal.length)
      val xbits =
        if (pal.length <= 2) 3 else if (pal.length <= 4) 2
        else if (pal.length <= 16) 1 else 0
      val idx = px.map { p =>
        val i = pal.indexOf(p)
        require(i >= 0, "vp8l encoder: pixel not in palette")
        i
      }
      if (xbits == 0) px = idx.map(i => 0xff000000 | (i << 8))
      else {
        val ppb = 1 << xbits
        val bpp = 8 >> xbits
        val pw = divRoundUp(w, ppb)
        val packed = new Array[Int](pw * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val at = y * pw + (x >> xbits)
            val shift = (x & (ppb - 1)) * bpp
            packed(at) |= idx(y * w + x) << shift
            x += 1
          }
          y += 1
        }
        px = packed.map(g => 0xff000000 | ((g & 0xff) << 8))
        w = pw
      }
    }
    bw.bits(0, 1) // transform list terminator
    // main image: cache bit, meta bit, group(s), tokens
    if (opts.cacheBits > 0) { bw.bits(1, 1); bw.bits(opts.cacheBits, 4) }
    else bw.bits(0, 1)
    opts.metaBits match {
      case None =>
        bw.bits(0, 1) // no meta prefix
        val toks = tokenize(px, w, opts.cacheBits, opts.lz77)
        writeGroupAndTokens(bw, Seq(toks), toks.map((0, _)),
          opts.cacheBits, w)
      case Some(mb) =>
        // 2-group split by meta-block x parity — exercises the decoder's
        // entropy-image path (cache/lz77 off: group-switching only)
        require(opts.cacheBits == 0 && !opts.lz77,
          "meta fixture lane keeps cache/lz77 off")
        bw.bits(1, 1)
        bw.bits(mb - 2, 3)
        val mw = divRoundUp(w, 1 << mb)
        val mh = divRoundUp(h, 1 << mb)
        val metaPx = Array.tabulate(mw * mh) { i =>
          0xff000000 | (((i % mw) % 2) << 8) // group idx in green
        }
        writeSubImage(bw, metaPx, mw)
        val nGroups = metaPx.map(p => (p >>> 8) & 0xffff).max + 1
        val interleaved = px.zipWithIndex.map { case (p, i) =>
          val x = i % w; val gi = ((x >> mb) % 2) % nGroups
          (gi, Lit(p): Tok)
        }.toSeq
        val perGroup = (0 until nGroups).map(g =>
          interleaved.collect { case (`g`, t) => t })
        writeGroupAndTokens(bw, perGroup, interleaved, 0, w)
    }
    bw.toBytes
  }

  // ------------------------------------------------------- RIFF wrapping

  private def le32b(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le24b(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte)

  private def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc.getBytes("US-ASCII") ++ le32b(payload.length) ++ payload ++ pad
  }

  /** Wrap chunks into a RIFF/WEBP file. */
  def riff(chunksBytes: Array[Byte]*): Array[Byte] = {
    val body = "WEBP".getBytes("US-ASCII") ++ chunksBytes.flatten
    "RIFF".getBytes("US-ASCII") ++ le32b(body.length) ++ body
  }

  /** Bare lossless file: RIFF + VP8L. */
  def losslessFile(px: Array[Int], w: Int, h: Int, opts: Opts): Array[Byte] =
    riff(chunk("VP8L", encode(px, w, h, opts)))

  /** Extended file: VP8X (flags + canvas) then VP8L. */
  def extendedFile(
      px: Array[Int], w: Int, h: Int, opts: Opts, alphaFlag: Boolean)
      : Array[Byte] = {
    val flags = if (alphaFlag) 0x10 else 0x00
    val vp8x = Array(flags.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      le24b(w - 1) ++ le24b(h - 1)
    riff(chunk("VP8X", vp8x), chunk("VP8L", encode(px, w, h, opts)))
  }

  /** Minimal lossy VP8 keyframe HEADER (triage fixture: real frame tag +
    * start code + dims; no coefficient data — pixel decode of lossy is
    * out of scope and must quarantine). */
  def lossyStubFile(w: Int, h: Int): Array[Byte] = {
    val hdr = Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte) ++
      Array.fill[Byte](20)(0)
    riff(chunk("VP8 ", hdr))
  }

  /** Animated container (triage fixture): VP8X with the animation flag,
    * an ANIM chunk, one ANMF-wrapped lossless frame. */
  def animFile(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val vp8x = Array[Byte](0x02, 0, 0, 0) ++ le24b(w - 1) ++ le24b(h - 1)
    val anim = le32b(0xffffffff.toInt) ++ Array[Byte](0, 0) // bg + loops
    val frame = chunk("VP8L", encode(px, w, h, Opts()))
    val anmf = le24b(0) ++ le24b(0) ++ le24b(w - 1) ++ le24b(h - 1) ++
      le24b(40) ++ Array[Byte](0) ++ frame
    riff(chunk("VP8X", vp8x), chunk("ANIM", anim), chunk("ANMF", anmf))
  }

  /** One animation frame for [[animMultiFile]]: pixels, canvas offset
    * (must be even — the format stores offsets halved), duration in ms,
    * blend-overwrite (B bit) and dispose-to-background (D bit). */
  final case class AnimFrame(
      px: Array[Int], w: Int, h: Int, x: Int, y: Int, durMs: Int,
      overwrite: Boolean, dispose: Boolean)

  /** Multi-frame lossless animation: VP8X(anim) + ANIM + one ANMF per
    * frame, each carrying a genuine VP8L payload. */
  def animMultiFile(cw: Int, ch: Int, frames: Seq[AnimFrame]): Array[Byte] = {
    val vp8x = Array[Byte](0x02, 0, 0, 0) ++ le24b(cw - 1) ++ le24b(ch - 1)
    val anim = le32b(0) ++ Array[Byte](0, 0)
    val anmfs = frames.map { f =>
      require(f.x % 2 == 0 && f.y % 2 == 0, "frame offsets store halved")
      val flags = (if (f.overwrite) 0x02 else 0) | (if (f.dispose) 1 else 0)
      val payload = chunk("VP8L", encode(f.px, f.w, f.h, Opts()))
      chunk("ANMF", le24b(f.x / 2) ++ le24b(f.y / 2) ++ le24b(f.w - 1) ++
        le24b(f.h - 1) ++ le24b(f.durMs) ++ Array(flags.toByte) ++ payload)
    }
    riff((chunk("VP8X", vp8x) +: chunk("ANIM", anim) +: anmfs): _*)
  }

}

/** Spark-side WebP plumbing: fixture adapters + partition-parallel
  * decode/triage (zero shuffle — per-partition byte work only). */
object WebpOps {
  import WebpCodec.{WebpMeta, WebpPixels}
  import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
  import org.apache.spark.sql.functions.col

  /** Shared fixture pixel formulas (the repo's standard image ladder) —
    * the ORACLE recomputes these in SQL without any codec. Lane by
    * doc_id % 5: 0 plain literals, 1 subtract-green + LZ77 in a VP8X
    * wrapper with a varying alpha channel, 2 color cache + LZ77,
    * 3 predictor transform (mode id%14), 4 color-indexing palette of 4
    * bundled 2-bit pixels. */
  private def lanePixels(id: Long, w: Int, h: Int): Array[Int] = {
    val lane = (id % 5).toInt
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (lane == 4) {
        val k = ((x + 2 * y + id) % 4).toInt
        val r = ((id + 31 * k) % 256).toInt
        val g = ((id * 3 + 17 * k) % 256).toInt
        val b = ((id * 5 + 11 * k) % 256).toInt
        0xff000000 | (r << 16) | (g << 8) | b
      } else {
        val r = ((id + 7 * x + 13 * y) % 256).toInt
        val g = ((id * 3 + 5 * x + 11 * y) % 256).toInt
        val b = ((id * 5 + 3 * x + 17 * y) % 256).toInt
        val a =
          if (lane == 1) ((id * 7 + 9 * x + 2 * y) % 256).toInt else 255
        (a << 24) | (r << 16) | (g << 8) | b
      }
    }
  }

  /** Pixel-lane fixture: genuine VP8L files across the five feature
    * lanes, standard size ladder. */
  def asWebpPixelPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    df.select(col(id).cast("long").as("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val px = lanePixels(docId, w, h)
          val bytes = (docId % 5).toInt match {
            case 0 => Vp8lEncoder.losslessFile(px, w, h, Vp8lEncoder.Opts())
            case 1 => Vp8lEncoder.extendedFile(px, w, h,
              Vp8lEncoder.Opts(subtractGreen = true, lz77 = true,
                alphaHint = true), alphaFlag = true)
            case 2 => Vp8lEncoder.losslessFile(px, w, h,
              Vp8lEncoder.Opts(cacheBits = 4, lz77 = true))
            case 3 => Vp8lEncoder.losslessFile(px, w, h,
              Vp8lEncoder.Opts(predictor = Some(((docId % 14).toInt, 4))))
            case _ =>
              val pal = Array.tabulate(4) { k =>
                0xff000000 | (((docId + 31 * k) % 256).toInt << 16) |
                  (((docId * 3 + 17 * k) % 256).toInt << 8) |
                  ((docId * 5 + 11 * k) % 256).toInt
              }
              Vp8lEncoder.losslessFile(px, w, h,
                Vp8lEncoder.Opts(palette = Some(pal)))
          }
          (docId, bytes)
        }
      }.toDF("doc_id", "payload")
  }

  /** Triage fixture: container-variant ladder by doc_id % 4 — bare
    * VP8L / VP8X+alpha VP8L / lossy VP8 header / animation. */
  def asWebpTriagePayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    df.select(col(id).cast("long").as("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val px = lanePixels(docId, w, h)
          val bytes = (docId % 4).toInt match {
            case 0 => Vp8lEncoder.losslessFile(px, w, h, Vp8lEncoder.Opts())
            case 1 => Vp8lEncoder.extendedFile(px, w, h,
              Vp8lEncoder.Opts(alphaHint = true), alphaFlag = true)
            case 2 =>
              // round 12: a REAL decodable key frame (same dims formula
              // the oracle pins), not the header-only stub — the triage
              // corpus carries no fake files anymore
              val lw = 100 + (docId % 50).toInt
              val lh = 80 + (docId % 30).toInt
              val nMb = ((lw + 15) / 16) * ((lh + 15) / 16)
              Vp8Encoder.webpFile(lw, lh, qi = (docId % 97).toInt,
                (0 until nMb).map(k =>
                  Vp8Encoder.MbSpec(((docId + k) % 4).toInt,
                    ((docId + k * 3) % 5).toInt - 2)))
            case _ => Vp8lEncoder.animFile(px, w, h)
          }
          (docId, bytes)
        }
      }.toDF("doc_id", "payload")
  }

  /** Partition-parallel decode/triage (the [[MultimodalOps]] shape:
    * per-partition byte work, zero shuffle). */
  def extractPixels(
      spark: SparkSession, media: DataFrame): Dataset[WebpPixels] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        WebpCodec.pixels(bytes).map(_.copy(doc_id = id))
      })
  }

  def extractTriage(
      spark: SparkSession, media: DataFrame): Dataset[WebpMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        WebpCodec.triage(bytes).map(_.copy(doc_id = id))
      })
  }

  def extractAnim(
      spark: SparkSession, media: DataFrame): Dataset[WebpCodec.WebpAnim] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        WebpCodec.animPixels(bytes).map(_.copy(doc_id = id))
      })
  }

  /** Animation fixture: 2-4 full-canvas lossless frames in overwrite
    * (no-blend) mode — the final canvas equals the LAST frame's
    * formula, so the whole multi-frame walk + composition is oracle-
    * checkable; partial-frame offsets, alpha blending, and disposal
    * are pinned by WebpSpec against hand-computed canvases. */
  def asWebpAnimPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    df.select(col(id).cast("long").as("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val n = 2 + (docId % 3).toInt
          val frames = (0 until n).map { k =>
            val px = Array.tabulate(w * h) { i =>
              val x = i % w; val y = i / w
              val r = ((docId + 7 * x + 13 * y + 29 * k) % 256).toInt
              val g = ((docId * 3 + 5 * x + 11 * y + 31 * k) % 256).toInt
              val b = ((docId * 5 + 3 * x + 17 * y + 37 * k) % 256).toInt
              0xff000000 | (r << 16) | (g << 8) | b
            }
            Vp8lEncoder.AnimFrame(px, w, h, 0, 0,
              40 + 10 * ((docId + k) % 4).toInt,
              overwrite = true, dispose = false)
          }
          (docId, Vp8lEncoder.animMultiFile(w, h, frames))
        }
      }.toDF("doc_id", "payload")
  }
}
