package graft.ops

/** FLAC frame decode — the audio sibling of the lossless-image work:
  * rice-coded residuals + fixed/LPC predictors are pure integer
  * arithmetic, so per-document sample statistics are oracle-checkable
  * EXACTLY like the PCM WAV lane. Implemented from the public spec
  * (RFC 9639 / the xiph format document) only:
  *
  *   - [[decode]]: full sample decode — frame sync walk, UTF-8-style
  *     coded numbers, all block-size/sample-rate header forms, subframe
  *     types CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (any order),
  *     wasted bits, rice residuals (both 4- and 5-bit parameter methods,
  *     multi-partition, escape-to-raw), and all four channel
  *     assignments (independent, left/side, right/side, mid/side).
  *     CRC-8 (header) and CRC-16 (frame) are VERIFIED — a corrupt frame
  *     quarantines, never mis-decodes.
  *   - [[FlacEncoder]]: independently-written fixture encoder (the
  *     cross-check — javax.sound has no FLAC codec): real rice coding
  *     with per-frame parameter fit, fixed predictors, mid/side and
  *     left/side stereo, multiple frames per stream.
  *
  * The STREAMINFO-only triage lives in [[MultimodalOps.flacMeta]]; this
  * module turns the formerly triage-only class into a decoded one. */
object FlacCodec {

  /** Decoded stream statistics — integer-exact, oracle-recomputable. */
  final case class FlacSamples(
      doc_id: Long, channels: Int, sample_rate: Int, bits: Int,
      n_samples: Long, peak: Int, sum_abs: Long,
      first_s0: Int, last_s0: Int)

  private object Bail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** MSB-first bit reader (FLAC is big-endian bit-packed). */
  private[graft] final class Br(b: Array[Byte], var bytePos: Int, val end: Int) {
    var bitPos = 0
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (bytePos >= end) throw Bail
        v = (v << 1) | ((b(bytePos) >> (7 - bitPos)) & 1)
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }
    def bitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        if (bytePos >= end) throw Bail
        v = (v << 1) | ((b(bytePos) >> (7 - bitPos)) & 1)
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }
    def signed(n: Int): Int = {
      val v = bits(n)
      if (n == 0) 0
      // n == 32: the 32-bit read already IS the two's-complement value
      // (1 << 32 == 1 in Int arithmetic would mis-decode it)
      else if (n == 32) v
      else if ((v & (1 << (n - 1))) != 0) v - (1 << n)
      else v
    }
    def unary(): Int = {
      var q = 0
      while (bits(1) == 0) {
        q += 1
        if (q > (1 << 24)) throw Bail // runaway guard
      }
      q
    }
    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  // CRC-8 (poly 0x07) over header bytes, CRC-16 (poly 0x8005) over frame
  private val Crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; k += 1 }
    c & 0xff
  }
  private val Crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    var k = 0
    while (k < 8) {
      c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1
      k += 1
    }
    c & 0xffff
  }
  private[ops] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table(c ^ (b(i) & 0xff)); i += 1 }
    c
  }
  private[ops] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c = ((c << 8) & 0xffff) ^ Crc16Table(((c >> 8) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    c
  }

  /** Fixed-predictor reconstruction (orders 0-4, spec coefficients). */
  private def fixedRestore(order: Int, warm: Array[Int], res: Array[Int])
      : Array[Int] = {
    val n = warm.length + res.length
    val out = new Array[Int](n)
    System.arraycopy(warm, 0, out, 0, warm.length)
    var i = warm.length
    while (i < n) {
      val r = res(i - warm.length)
      out(i) = order match {
        case 0 => r
        case 1 => r + out(i - 1)
        case 2 => r + 2 * out(i - 1) - out(i - 2)
        case 3 => r + 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
        case 4 => r + 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) -
          out(i - 4)
        case _ => throw Bail
      }
      i += 1
    }
    out
  }

  /** Rice-coded residual: method 0 → 4-bit params, 1 → 5-bit; partition
    * order splits the block; escape parameter → raw n-bit samples. */
  private def readResidual(
      r: Br, blockSize: Int, predOrder: Int): Array[Int] = {
    val method = r.bits(2)
    if (method > 1) throw Bail
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = r.bits(4)
    val nParts = 1 << partOrder
    if (blockSize % nParts != 0) throw Bail
    val out = new Array[Int](blockSize - predOrder)
    var o = 0
    var p = 0
    while (p < nParts) {
      val count =
        if (p == 0) (blockSize >> partOrder) - predOrder
        else blockSize >> partOrder
      if (count < 0) throw Bail
      val param = r.bits(pBits)
      if (param == escape) {
        val raw = r.bits(5)
        var i = 0
        while (i < count) { out(o) = r.signed(raw); o += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val rem = r.bits(param)
          val u = (q << param) | rem
          out(o) = (u >>> 1) ^ -(u & 1) // zigzag
          o += 1
          i += 1
        }
      }
      p += 1
    }
    out
  }

  /** One subframe → blockSize samples at `bps` bits. */
  private def readSubframe(r: Br, blockSize: Int, bps: Int): Array[Int] = {
    if (r.bits(1) != 0) throw Bail // padding bit
    val tpe = r.bits(6)
    var wasted = 0
    if (r.bits(1) == 1) wasted = 1 + r.unary()
    val eff = bps - wasted
    if (eff <= 0 || eff > 32) throw Bail
    val out: Array[Int] =
      if (tpe == 0) { // CONSTANT
        val v = r.signed(eff)
        Array.fill(blockSize)(v)
      } else if (tpe == 1) { // VERBATIM
        Array.fill(blockSize)(r.signed(eff))
      } else if (tpe >= 8 && tpe <= 12) { // FIXED, order 0-4
        val order = tpe - 8
        if (order > blockSize) throw Bail
        val warm = Array.fill(order)(r.signed(eff))
        fixedRestore(order, warm, readResidual(r, blockSize, order))
      } else if (tpe >= 32) { // LPC, order 1-32
        val order = tpe - 31
        if (order > blockSize) throw Bail
        val warm = Array.fill(order)(r.signed(eff))
        val precision = r.bits(4) + 1
        if (precision == 16) throw Bail // 0b1111 is invalid per spec
        val shift = r.signed(5)
        if (shift < 0) throw Bail
        val coefs = Array.fill(order)(r.signed(precision))
        val res = readResidual(r, blockSize, order)
        val n = blockSize
        val smp = new Array[Int](n)
        System.arraycopy(warm, 0, smp, 0, order)
        var i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * smp(i - 1 - j); j += 1 }
          smp(i) = res(i - order) + (acc >> shift).toInt
          i += 1
        }
        smp
      } else throw Bail
    if (wasted > 0) {
      var i = 0
      while (i < out.length) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** UTF-8-style coded frame/sample number (up to 36 bits). */
  private def codedNumber(r: Br): Long = {
    val b0 = r.bits(8)
    if ((b0 & 0x80) == 0) return b0
    var cont = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { cont += 1; mask >>= 1 }
    if (cont < 1 || cont > 6) throw Bail
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < cont) {
      val bx = r.bits(8)
      if ((bx & 0xc0) != 0x80) throw Bail
      v = (v << 6) | (bx & 0x3f)
      i += 1
    }
    v
  }

  private val BlockSizes = Array(
    -1, 192, 576, 1152, 2304, 4608, -8, -16, 256, 512, 1024, 2048, 4096,
    8192, 16384, 32768) // -8/-16: get from end of header
  private val SampleRates = Array(
    -1, 88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000, 44100,
    48000, 96000, -8, -16, -160, -2) // -8/-16/-160: coded; -2: invalid

  /** Full stream decode: STREAMINFO + every frame; returns interleaved-
    * free per-channel samples concatenated frame by frame. */
  def decode(b: Array[Byte]): Option[(Int, Int, Int, Array[Array[Int]])] =
    try {
      if (b.length < 42 || !(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
        b(3) == 'C')) return None
      // metadata walk
      var i = 4
      var last = false
      var sRate = -1
      var nCh = -1
      var bps = -1
      var total = -1L
      var seenInfo = false
      while (!last) {
        if (i + 4 > b.length) return None
        val hdr = b(i) & 0xff
        last = (hdr & 0x80) != 0
        val tpe = hdr & 0x7f
        val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) |
          (b(i + 3) & 0xff)
        if (i + 4 + len > b.length) return None
        if (tpe == 0) { // STREAMINFO
          if (len < 34) return None
          val r = new Br(b, i + 4, i + 4 + len)
          r.bits(16); r.bits(16) // min/max block size
          r.bits(24); r.bits(24) // min/max frame size
          sRate = r.bits(20)
          nCh = r.bits(3) + 1
          bps = r.bits(5) + 1
          total = r.bitsLong(36)
          // STREAMINFO total-samples == 0 means UNKNOWN (RFC 9639), not
          // an exact zero-frame count: decode until EOF like the
          // unknown (-1) lane instead of "succeeding" with 0 samples
          if (total == 0) total = -1L
          seenInfo = true
        }
        i += 4 + len
      }
      if (!seenInfo || sRate <= 0 || nCh <= 0) return None
      val channels = Array.fill(nCh)(Array.newBuilder[Int])
      var decoded = 0L
      while (i < b.length && (total < 0 || decoded < total)) {
        val frameStart = i
        val r = new Br(b, i, b.length)
        // frame header
        if (r.bits(14) != 0x3ffe) return None // sync
        if (r.bits(1) != 0) return None // reserved
        r.bits(1) // blocking strategy
        val bsCode = r.bits(4)
        val srCode = r.bits(4)
        val chAsgn = r.bits(4)
        val ssCode = r.bits(3)
        if (r.bits(1) != 0) return None // reserved
        codedNumber(r)
        val blockSize = BlockSizes(bsCode) match {
          case -1 => return None
          case -8 => r.bits(8) + 1
          case -16 => r.bits(16) + 1
          case v => v
        }
        SampleRates(srCode) match {
          case -8 => r.bits(8)
          case -16 => r.bits(16)
          case -160 => r.bits(16)
          case -2 => return None
          case _ => ()
        }
        val frameBps = ssCode match {
          case 0 => bps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case 7 => 32
          case _ => return None
        }
        // CRC-8 covers the header bytes up to (not incl.) the CRC byte
        r.alignByte()
        val crcAt = r.bytePos
        if (crc8(b, frameStart, crcAt) != r.bits(8)) return None
        // subframes
        val nFrameCh = if (chAsgn < 8) chAsgn + 1 else 2
        if (chAsgn < 8 && nFrameCh != nCh) return None
        if (chAsgn >= 8 && nCh != 2) return None
        if (chAsgn > 10) return None
        val subs = Array.tabulate(nFrameCh) { c =>
          val extra = chAsgn match {
            case 8 => if (c == 1) 1 else 0 // left/side
            case 9 => if (c == 0) 1 else 0 // right/side
            case 10 => if (c == 1) 1 else 0 // mid/side
            case _ => 0
          }
          readSubframe(r, blockSize, frameBps + extra)
        }
        r.alignByte()
        val crc16At = r.bytePos
        if (crc16(b, frameStart, crc16At) !=
          ((b(crc16At) & 0xff) << 8 | (b(crc16At + 1) & 0xff))) return None
        i = crc16At + 2
        // stereo decorrelation
        val chans: Array[Array[Int]] = chAsgn match {
          case 8 => // left/side: right = left - side
            val l = subs(0); val s = subs(1)
            Array(l, Array.tabulate(blockSize)(k => l(k) - s(k)))
          case 9 => // right/side: left = right + side
            val s = subs(0); val rr = subs(1)
            Array(Array.tabulate(blockSize)(k => rr(k) + s(k)), rr)
          case 10 => // mid/side
            val m = subs(0); val s = subs(1)
            val l = new Array[Int](blockSize)
            val rr2 = new Array[Int](blockSize)
            var k = 0
            while (k < blockSize) {
              val mid2 = (m(k) << 1) | (s(k) & 1)
              l(k) = (mid2 + s(k)) >> 1
              rr2(k) = (mid2 - s(k)) >> 1
              k += 1
            }
            Array(l, rr2)
          case _ => subs
        }
        var c = 0
        while (c < nCh) { channels(c) ++= chans(c); c += 1 }
        decoded += blockSize
      }
      if (total >= 0 && decoded != total) None
      else Some((nCh, sRate, bps, channels.map(_.result())))
    } catch { case Bail | _: ArrayIndexOutOfBoundsException => None }

  /** Stats wrapper for the registry lane. */
  def samples(b: Array[Byte]): Option[FlacSamples] =
    decode(b).map { case (nCh, rate, bps, chans) =>
      var peak = 0
      var sumAbs = 0L
      chans.foreach(_.foreach { s =>
        val a = math.abs(s)
        if (a > peak) peak = a
        sumAbs += a
      })
      val s0 = chans(0)
      FlacSamples(-1L, nCh, rate, bps,
        if (s0.isEmpty) 0L else s0.length.toLong, peak, sumAbs,
        if (s0.isEmpty) 0 else s0(0), if (s0.isEmpty) 0 else s0.last)
    }

  import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
  import org.apache.spark.sql.functions.col

  /** Partition-parallel decode (zero shuffle, the MultimodalOps shape). */
  def extractSamples(
      spark: SparkSession, media: DataFrame): Dataset[FlacSamples] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        samples(bytes).map(_.copy(doc_id = id))
      })
  }

  /** Fixture: REAL FLAC streams whose samples derive from the row id —
    * sample[c][i] = ((id*7919 + c*104729 + i*31) mod 65536) - 32768,
    * n = 96 + id%64 per channel, mono/stereo by id%2, frame split +
    * subframe strategy + stereo mode cycling by id (constant and
    * verbatim lanes included via id%7). The oracle recomputes the
    * statistics from the formula; the encoder is independent of the
    * decoder (separate rice/predictor implementations). */
  def asFlacPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions(_.map { docId =>
        val nCh = 1 + (docId % 2).toInt
        val n = 96 + (docId % 64).toInt
        val chans = Array.tabulate(nCh) { c =>
          Array.tabulate(n) { i =>
            (((docId * 7919 + c * 104729L + i * 31L) % 65536) - 32768).toInt
          }
        }
        val rate = 8000 + (docId % 4).toInt * 4000
        val stereoMode = (docId % 3).toInt // 0 indep, 1 left/side, 2 mid/side
        val strategy = (docId % 7).toInt
        (docId, FlacEncoder.encode(chans, rate, 16, stereoMode, strategy))
      }).toDF("doc_id", "payload")
  }
}

/** Fixture-side FLAC encoder, written independently of the decoder:
  * STREAMINFO + frames with fixed predictors (order by strategy),
  * CONSTANT/VERBATIM lanes, rice residuals with a fitted parameter,
  * left/side + mid/side stereo, multi-frame splitting. */
object FlacEncoder {

  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def bits(v: Long, w: Int): Unit = {
      var i = w - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1L).toInt
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (n > 0) bits(0, 8 - n)
    def toBytes: Array[Byte] = { align(); out.toByteArray }
  }

  private def zigzag(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL

  private def writeRice(bw: Bw, res: Array[Int]): Unit = {
    // fit: smallest param whose max quotient stays small; escalate to
    // the 5-bit-parameter method when high-order residuals exceed the
    // 4-bit range (order-4 on full-scale 16-bit samples reaches 2^20)
    var param = 0
    val maxU = res.foldLeft(0L)((m, r) => math.max(m, zigzag(r)))
    while (param < 30 && (maxU >> param) > 24) param += 1
    require(param < 31, "flac fixture: residual too wide")
    if (param < 15) {
      bw.bits(0, 2) // method 0: 4-bit params
      bw.bits(0, 4) // partition order 0
      bw.bits(param, 4)
    } else {
      bw.bits(1, 2) // method 1: 5-bit params
      bw.bits(0, 4)
      bw.bits(param, 5)
    }
    res.foreach { r =>
      val u = zigzag(r)
      val q = (u >> param).toInt
      var k = 0
      while (k < q) { bw.bits(0, 1); k += 1 }
      bw.bits(1, 1)
      bw.bits(u & ((1L << param) - 1), param)
    }
  }

  private def fixedResidual(order: Int, s: Array[Int]): Array[Int] =
    Array.tabulate(s.length - order) { k =>
      val i = k + order
      order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case _ => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) +
          s(i - 4)
      }
    }

  private def writeSubframe(
      bw: Bw, s: Array[Int], bps: Int, strategy: Int): Unit = {
    bw.bits(0, 1) // padding
    val constant = s.nonEmpty && s.forall(_ == s(0))
    if (constant) {
      bw.bits(0, 6)
      bw.bits(0, 1) // no wasted bits
      bw.bits(s(0).toLong & ((1L << bps) - 1), bps)
    } else if (strategy == 6) { // verbatim lane
      bw.bits(1, 6)
      bw.bits(0, 1)
      s.foreach(v => bw.bits(v.toLong & ((1L << bps) - 1), bps))
    } else if (strategy == 5 && s.length > 2) {
      // LPC lane: order 2, coefs (64, -32) at shift 5 — predicts
      // 2·s[i-1] − s[i-2] EXACTLY (the multiple-of-32 accumulator makes
      // the arithmetic shift lossless), so the residual is the fixed-
      // order-2 one but decodes through the LPC path
      bw.bits(32 + 1, 6) // LPC, order 2
      bw.bits(0, 1)
      bw.bits(s(0).toLong & ((1L << bps) - 1), bps)
      bw.bits(s(1).toLong & ((1L << bps) - 1), bps)
      bw.bits(7, 4) // precision 8
      bw.bits(5, 5) // shift 5
      bw.bits(64L & 0xff, 8)
      bw.bits((-32L) & 0xff, 8)
      writeRice(bw, fixedResidual(2, s))
    } else {
      val order = math.min(strategy % 5, s.length)
      bw.bits(8 + order, 6) // FIXED
      bw.bits(0, 1)
      var i = 0
      while (i < order) {
        bw.bits(s(i).toLong & ((1L << bps) - 1), bps)
        i += 1
      }
      writeRice(bw, fixedResidual(order, s))
    }
  }

  /** stereoMode: 0 independent, 1 left/side, 2 mid/side (mono forces 0). */
  def encode(
      chans: Array[Array[Int]], sampleRate: Int, bps: Int,
      stereoMode0: Int, strategy: Int): Array[Byte] = {
    val nCh = chans.length
    val total = chans(0).length.toLong
    val stereoMode = if (nCh == 2) stereoMode0 else 0
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block)
    val si = new Bw
    si.bits(192, 16); si.bits(32768, 16) // min/max block size
    si.bits(0, 24); si.bits(0, 24) // frame sizes unknown
    si.bits(sampleRate, 20)
    si.bits(nCh - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(total, 36)
    (0 until 16).foreach(_ => si.bits(0, 8)) // md5 unset
    val siB = si.toBytes
    out.write(0x80) // last-block flag + type 0
    out.write(0); out.write((siB.length >> 8) & 0xff)
    out.write(siB.length & 0xff)
    out.write(siB, 0, siB.length)
    // frames: split roughly in half to force the multi-frame walk
    val cut = (chans(0).length / 2).max(1)
    val spans =
      if (chans(0).length <= 1) Seq((0, chans(0).length))
      else Seq((0, cut), (cut, chans(0).length))
    var frameIdx = 0L
    spans.filter(sp => sp._2 > sp._1).foreach { case (from, until) =>
      val bs = until - from
      val fb = new Bw
      fb.bits(0x3ffe, 14)
      fb.bits(0, 1); fb.bits(0, 1) // reserved + fixed-blocksize strategy
      fb.bits(7, 4) // block size: 16-bit at end of header
      fb.bits(0, 4) // sample rate: from STREAMINFO
      val chAsgn = if (nCh == 1) 0 else stereoMode match {
        case 1 => 8
        case 2 => 10
        case _ => 1
      }
      fb.bits(chAsgn, 4)
      fb.bits(4, 3) // sample size: 16-bit
      fb.bits(0, 1)
      // coded number < 0x80: single byte
      require(frameIdx < 0x80)
      fb.bits(frameIdx, 8)
      fb.bits(bs - 1, 16)
      val hdrB = fb.toBytes
      val withCrc = hdrB :+ FlacCodec.crc8(hdrB, 0, hdrB.length).toByte
      // subframes
      val sb = new Bw
      val slices = chans.map(_.slice(from, until))
      val subChans: Array[(Array[Int], Int)] = chAsgn match {
        case 8 =>
          val side = Array.tabulate(bs)(k => slices(0)(k) - slices(1)(k))
          Array((slices(0), bps), (side, bps + 1))
        case 10 =>
          val mid = Array.tabulate(bs)(k => (slices(0)(k) + slices(1)(k)) >> 1)
          val side = Array.tabulate(bs)(k => slices(0)(k) - slices(1)(k))
          Array((mid, bps), (side, bps + 1))
        case _ => slices.map(s => (s, bps))
      }
      subChans.foreach { case (s, b2) => writeSubframe(sb, s, b2, strategy) }
      val subB = sb.toBytes
      val frame = withCrc ++ subB
      val c16 = FlacCodec.crc16(frame, 0, frame.length)
      out.write(frame, 0, frame.length)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      frameIdx += 1
    }
    out.toByteArray
  }
}
