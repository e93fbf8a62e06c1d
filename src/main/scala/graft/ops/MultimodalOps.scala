package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed batch-wise per partition.
  *
  * Two layers:
  *   - REAL container-header parsing (`imageDims`): PNG / GIF / BMP / JPEG
  *     dimensions read directly from the byte layout — pure byte decoding,
  *     no codec library needed, so it runs anywhere Spark runs.
  *   - STUBBED pixel decode (`decodeStub`): the container has no
  *     image/audio codecs, so payloads that are not a recognized image
  *     container get deterministic fake dimensions/features derived from
  *     the bytes. Swapping in a real pixel decoder (JNI/FFI or a vectorized
  *     Python worker via `mapInPandas` on PySpark) changes only that
  *     function body — the plumbing, batch shape, and schema stay as
  *     tested here.
  */
object MultimodalOps {

  /** Typed media row: payload + extracted metadata. `format` is the
    * detected container ("png"/"gif"/"bmp"/"jpeg") or "raw" (stub path). */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      checksum: String,
      format: String,
      width: Int,
      height: Int,
      feat_mean: Double)

  /** Image dimensions from container headers — real byte-level parsing:
    * PNG IHDR (big-endian at offset 16/20), GIF logical screen descriptor
    * (little-endian at 6/8), BMP BITMAPINFOHEADER (little-endian at 18/22,
    * height may be negative for top-down rows), JPEG SOFn marker scan.
    * Returns None for anything that is not a recognized image container. */
  def imageDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (b.length >= 24 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a)
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(("bmp", le32(18), math.abs(le32(22))))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8)
      jpegDims(b)
    else if (b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && u8(2) == 42 && u8(3) == 0) ||
         (b(0) == 'M' && b(1) == 'M' && u8(2) == 0 && u8(3) == 42)))
      tiffDims(b)
    else if (WebpCodec.isWebp(b))
      WebpCodec.triage(b).map(m => ("webp", m.width, m.height))
    else None
  }

  /** TIFF: walk the first IFD (either byte order) to ImageWidth(256) /
    * ImageLength(257). */
  private def tiffDims(b: Array[Byte]): Option[(String, Int, Int)] =
    tiffIfd(b).flatMap { case (entries, _) =>
      for {
        w <- entries.get(256).flatMap(_.headOption)
        h <- entries.get(257).flatMap(_.headOption)
      } yield ("tiff", w.toInt, h.toInt)
    }

  /** First-IFD tag map (tag → numeric values, SHORT/LONG types only) +
    * the endian reader — the shared walk of [[tiffDims]] and
    * [[tiffDecodeRgb]]. Inline vs out-of-line value placement follows
    * the spec: values fitting 4 bytes live in the entry's value field,
    * LEFT-justified in file byte order. */
  private def tiffIfd(b: Array[Byte])
      : Option[(Map[Int, Seq[Long]], Boolean)] = {
    if (b.length < 8) return None
    val le = b(0) == 'I'
    def u8(i: Int) = b(i) & 0xff
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | ((u8(i + 1) << 16) | (u8(i + 2) << 8) |
        u8(i + 3)).toLong
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd.toInt)
    if (ifd + 2 + 12L * n + 4 > b.length) return None
    val entries = (0 until n).flatMap { k =>
      val e = ifd.toInt + 2 + 12 * k
      val tag = u16(e)
      val tpe = u16(e + 2)
      val cnt = u32(e + 4)
      // only SHORT(3)/LONG(4) entries matter here; other types
      // (RATIONAL resolutions, ASCII software tags…) skip harmlessly
      if (tpe != 3 && tpe != 4) None
      else {
        val width = if (tpe == 3) 2 else 4
        val total = width * cnt
        val base: Long = if (total <= 4) e + 8L else u32(e + 8)
        if (base < 0 || base + total > b.length || cnt > 65536) None
        else Some(tag -> (0L until cnt).map { j =>
          val at = (base + j * width).toInt
          if (tpe == 3) u16(at).toLong else u32(at)
        })
      }
    }.toMap
    Some((entries, le))
  }

  /** JPEG: walk the marker segments to the first SOFn (0xC0-0xCF excluding
    * DHT/JPG/DAC) and read height/width from its fixed offsets. */
  private def jpegDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    var i = 2
    while (i + 9 < b.length) {
      if (u8(i) != 0xff) return None
      // JPEG permits any number of 0xFF fill bytes before a marker —
      // skip them instead of misreading the fill byte as a marker whose
      // "length" field lands the scan mid-stream
      if (u8(i + 1) == 0xff) i += 1
      else {
        val marker = u8(i + 1)
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
        else if (marker >= 0xc0 && marker <= 0xcf &&
                 marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return Some(("jpeg", be16(i + 7), be16(i + 5)))
        else i += 2 + be16(i + 2)
      }
    }
    None
  }

  /** Wrap a text table as a binary media table (fixture adapter: the driver
    * data has no real media; payload = UTF-8 bytes). */
  def asBinaryPayload(df: DataFrame, id: String, payloadSrc: String): DataFrame =
    Partitioning.spread(df.select(
      col(id).cast("long").as("doc_id"),
      encode(col(payloadSrc), "UTF-8").as("payload")))

  /** Deterministic fallback for payloads NO recognized container claims
    * (format "raw"): synthesizes stable dimensions from a content hash so
    * downstream schemas stay total. Every recognized format now has a
    * real decoder beside it ([[bmpPixels]], [[pngPixels]], [[gifPixels]],
    * [[jpegDecode]]); this fallback survives only as the quarantine-lane
    * feature for truly opaque bytes. */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val h = graft.functions.SimHash64.fnv1a64(payload)
    val width = 64 + (math.abs(h) % 1024).toInt
    val height = 64 + (math.abs(h >> 32) % 1024).toInt
    (width, height)
  }

  /** Partition-parallel batch decode: one task per partition, rows streamed
    * through the decoder — the Scala analogue of `mapInPandas` batches.
    * Recognized image containers get REAL header-parsed dimensions; other
    * payloads fall back to the deterministic stub (format "raw"). */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          md.reset()
          val sum = md.digest(bytes).map("%02x".format(_)).mkString
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
          imageDims(bytes) match {
            case Some((fmt, w, h)) =>
              MediaMeta(id, bytes.length.toLong, sum, fmt, w, h, mean)
            case None =>
              val (w, h) = decodeStub(bytes)
              MediaMeta(id, bytes.length.toLong, sum, "raw", w, h, mean)
          }
        }
      }
  }

  /** One row of the decode/quarantine LEDGER: the detected container
    * format (magic bytes; "raw" = no recognized container) and whether
    * the REAL decoder produced pixels for it. At corpus scale the
    * aggregated (format, decoded) counts are a first-class data-quality
    * metric — every decoder documents a scope (e.g. JPEG decodes
    * baseline AND progressive at 1-2x sampling, but not lossless/
    * arithmetic), and users must SEE the quarantine rate, not discover
    * missing rows downstream. */
  final case class DecodeStatus(doc_id: Long, format: String, decoded: Boolean)

  /** Partition-parallel classify-and-attempt over a mixed media corpus:
    * magic-byte format detection, then the format's real decoder; any
    * failure (truncation, malformed stream, out-of-scope variant) lands
    * as `decoded = false` — the quarantine lane — never a task failure.
    * Zero shuffle; the caller aggregates the per-format counters. */
  /** One payload's (detected format, decoded?) — the per-row core shared
    * by the batch report and the streaming gate's codegen-adjacent UDF.
    * Never throws. */
  def decodeStatusOf(bytes: Array[Byte]): (String, Boolean) = {
    def ok(attempt: => Option[_]): Boolean =
      scala.util.Try(attempt).toOption.flatten.isDefined
    def cc(i: Int, s: String): Boolean =
      bytes.length >= i + 4 && (0 until 4).forall(j => bytes(i + j) == s(j))
    imageDims(bytes) match {
      case Some(("bmp", _, _)) => ("bmp", ok(bmpPixels(bytes)))
      case Some(("png", _, _)) => ("png", ok(pngPixels(bytes)))
      case Some(("gif", _, _)) => ("gif", ok(gifPixels(bytes)))
      case Some(("jpeg", _, _)) => ("jpeg", ok(jpegDecode(bytes)))
      case Some(("tiff", _, _)) => ("tiff", ok(tiffPixels(bytes)))
      // lossless stills, lossless animations, AND (round 12) lossy VP8
      // key-frame luma decode for real; lossy variants outside the
      // documented scope (interframes, B_PRED, loop-filtered, foreign
      // probability tables) still quarantine observably
      case Some(("webp", _, _)) =>
        ("webp", ok(WebpCodec.pixels(bytes)) ||
          ok(WebpCodec.animPixels(bytes)) ||
          ok(Vp8Codec.lumaFromWebp(bytes)))
      case Some((other, _, _)) => (other, false)
      case None =>
        // audio/video containers: classify by magic, attempt the real
        // parser/decoder (a recognized-but-out-of-scope variant — e.g. a
        // non-16-bit WAV — lands as a format-tagged quarantine)
        if (cc(0, "RIFF") && cc(8, "WAVE")) ("wav", ok(wavPcm(bytes)))
        // ISO-BMFF image brands (AVIF/HEIC — the #4/#5 web formats)
        // dispatch BEFORE the video arm: they carry ftyp too, and
        // mis-tagging them "mp4" hides the class from the ledger. Their
        // dimensions triage (ispe); AV1/HEVC payload decode is out of
        // scope and quarantines observably.
        else if (cc(4, "ftyp") && avifHeicBrand(bytes).isDefined)
          (avifHeicBrand(bytes).get, false)
        else if (cc(4, "ftyp")) ("mp4", ok(mp4Meta(bytes)))
        // decoded = FULL frame decode (CRC-verified); a STREAMINFO that
        // triages but whose frames don't decode is a quarantine now
        else if (cc(0, "fLaC")) ("flac", ok(FlacCodec.samples(bytes)))
        else if (bytes.length >= 3 && bytes(0) == 'I' && bytes(1) == 'D' &&
          bytes(2) == '3') ("mp3", ok(mp3Meta(bytes)))
        else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xe0) == 0xe0) ("mp3", ok(mp3Meta(bytes)))
        else if (bytes.length >= 3 && bytes(0) == 'P' &&
          (bytes(1) == '5' || bytes(1) == '6'))
          ("pnm", ok(pnmPixels(bytes)))
        else if (bytes.length >= 6 && bytes(0) == 0 && bytes(1) == 0 &&
          bytes(2) == 1 && bytes(3) == 0)
          ("ico", ok(icoPixels(bytes)))
        else ("raw", false) // opaque bytes
    }
  }

  def decodeReport(spark: SparkSession, media: DataFrame): Dataset[DecodeStatus] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (fmt, decoded) = decodeStatusOf(bytes)
          DecodeStatus(id, fmt, decoded)
        }
      }
  }

  /** Typed audio row: parsed container metadata. */
  final case class AudioMeta(
      doc_id: Long,
      format: String,
      channels: Int,
      sample_rate: Int,
      bits: Int,
      data_bytes: Long,
      duration_ms: Double)

  /** WAV (RIFF) header parsing — real byte-level decoding like
    * [[imageDims]]: verify the RIFF/WAVE magic, then walk the chunk list
    * (4CC + LE32 size, odd sizes padded) collecting the `fmt ` fields
    * (PCM format tag, channels, sample rate, bits/sample) and the `data`
    * chunk size. Works on any chunk order / extra chunks (LIST, cue …),
    * not just the canonical 44-byte layout. Returns None unless both
    * chunks are present and sane. */
  def wavMeta(b: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || cc(0) != "RIFF" || cc(8) != "WAVE") return None
    // walk offsets in Long: a malformed declared size near Int.MaxValue
    // must fail the bounds check, not wrap `i` negative and crash cc()
    var i = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // tag, channels, rate, bits
    var dataLen = -1L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val id = cc(at)
      val size = le32(at + 4)
      // a chunk whose declared body overruns the payload is malformed
      if (size < 0 || i + 8 + size > b.length) return None
      if (id == "fmt " && size >= 16) {
        // WAVE_FORMAT_EXTENSIBLE (0xFFFE) wraps the REAL codec in the
        // SubFormat GUID's first two bytes (the >2-channel / >16-bit
        // container every DAW emits) — unwrap before the scope check
        val rawTag = le16(at + 8)
        val tag =
          if (rawTag != 0xFFFE) rawTag
          else if (size >= 40) le16(at + 32)
          else return None
        // codec scope: 1 = integer PCM (8/16/24/32-bit), 3 = IEEE float
        // (32-bit), 6/7 = G.711 A-law/µ-law (8-bit, the telephony
        // corpora), 0x11 = IMA ADPCM (4-bit). Anything else quarantines.
        val bitsOk = tag match {
          case 1 => Seq(8, 16, 24, 32).contains(le16(at + 22))
          case 3 => le16(at + 22) == 32
          case 6 | 7 => le16(at + 22) == 8
          case 0x11 => le16(at + 22) == 4
          case _ => false
        }
        if (!bitsOk) return None
        fmt = Some((tag, le16(at + 10), le32(at + 12), le16(at + 22)))
      } else if (id == "data") {
        dataLen = size.toLong
      }
      i += 8L + size + (size & 1) // chunks are 2-byte aligned
    }
    fmt match {
      case Some((tag, ch, rate, bits))
          if dataLen >= 0 && ch > 0 && rate > 0 && bits > 0 =>
        // ADPCM duration derives from its nibble payload (2 samples per
        // byte past the per-block channel headers) — approximate with
        // the nibble rate like players do; byte-exact fields stay exact
        val bytesPerSec =
          if (tag == 0x11) rate.toDouble * ch / 2.0
          else rate.toDouble * ch * (bits / 8)
        Some(AudioMeta(-1L, "wav", ch, rate, bits, dataLen,
          dataLen / bytesPerSec * 1000.0))
      case _ => None
    }
  }

  /** FLAC container triage — real byte-level parsing of the public FLAC
    * format: verify the `fLaC` magic, walk the metadata-block chain
    * (1-byte last-flag+type header, 24-bit BE length), and unpack the
    * mandatory STREAMINFO block's packed fields (20-bit sample rate,
    * 3-bit channels−1, 5-bit bits-per-sample−1, 36-bit total samples).
    * `data_bytes` counts the audio frames after the last metadata block;
    * duration derives from total samples / rate. Frame decode stays out
    * of scope (triage routes; transcoding happens after). */
  def flacMeta(b: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int) = b(i) & 0xff
    if (b.length < 8 + 34 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
      b(3) != 'C') return None
    // first block must be STREAMINFO (type 0, length 34)
    if ((u8(4) & 0x7f) != 0) return None
    if (((u8(5) << 16) | (u8(6) << 8) | u8(7)) != 34) return None
    val p = 8
    val rate = (u8(p + 10) << 12) | (u8(p + 11) << 4) | (u8(p + 12) >> 4)
    val ch = ((u8(p + 12) >> 1) & 7) + 1
    val bps = (((u8(p + 12) & 1) << 4) | (u8(p + 13) >> 4)) + 1
    val total = ((u8(p + 13) & 0xf).toLong << 32) |
      (u8(p + 14).toLong << 24) | (u8(p + 15) << 16) |
      (u8(p + 16) << 8) | u8(p + 17)
    if (rate <= 0) return None
    // walk remaining metadata blocks to the audio start
    var i = 4L
    var last = false
    while (!last) {
      if (i + 4 > b.length) return None
      val hdr = u8(i.toInt)
      last = (hdr & 0x80) != 0
      val len = (u8(i.toInt + 1) << 16) | (u8(i.toInt + 2) << 8) | u8(i.toInt + 3)
      i += 4L + len
      if (i > b.length) return None
    }
    Some(AudioMeta(-1L, "flac", ch, rate, bps, b.length - i,
      total.toDouble / rate * 1000.0))
  }

  /** MP3 triage — skip any ID3v2 tag (syncsafe 28-bit size), then parse
    * the first MPEG audio frame header: version (1/2/2.5), layer
    * (I/II/III), the per-(version,layer) bitrate table, sample rate,
    * and channel mode. Duration prefers the VBR headers real encoders
    * write — Xing/Info at the (version, mode)-dependent offset inside
    * the first frame, or Fraunhofer VBRI at frame+36 — computing
    * frames × samples-per-frame / rate; without one it falls back to
    * the CBR stream estimate (audio bytes · 8 / bitrate), which a VBR
    * stream can mis-state by 2× and players do not trust. Free-format
    * and reserved headers quarantine. `bits` is 0 (not PCM). */
  def mp3Meta(b: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int) = b(i) & 0xff
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((u8(6) & 0x7f) << 21) | ((u8(7) & 0x7f) << 14) |
        ((u8(8) & 0x7f) << 7) | (u8(9) & 0x7f)
      i = 10 + size
    }
    if (i + 4 > b.length) return None
    if (u8(i) != 0xff || (u8(i + 1) & 0xe0) != 0xe0) return None
    val versionBits = (u8(i + 1) >> 3) & 3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    val layerBits = (u8(i + 1) >> 1) & 3 // 3=I, 2=II, 1=III
    if (versionBits == 1 || layerBits == 0) return None
    val bitrateIdx = (u8(i + 2) >> 4) & 15
    if (bitrateIdx == 0 || bitrateIdx == 15) return None // free/bad
    val rateIdx = (u8(i + 2) >> 2) & 3
    if (rateIdx == 3) return None
    val mpeg1 = versionBits == 3
    val kbps = (mpeg1, layerBits) match {
      case (true, 3) => Seq(0, 32, 64, 96, 128, 160, 192, 224, 256, 288,
        320, 352, 384, 416, 448)(bitrateIdx)
      case (true, 2) => Seq(0, 32, 48, 56, 64, 80, 96, 112, 128, 160,
        192, 224, 256, 320, 384)(bitrateIdx)
      case (true, 1) => Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        160, 192, 224, 256, 320)(bitrateIdx)
      case (false, 3) => Seq(0, 32, 48, 56, 64, 80, 96, 112, 128, 144,
        160, 176, 192, 224, 256)(bitrateIdx)
      case _ => Seq(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        144, 160)(bitrateIdx)
    }
    val rate = (versionBits match {
      case 3 => Seq(44100, 48000, 32000)
      case 2 => Seq(22050, 24000, 16000)
      case _ => Seq(11025, 12000, 8000)
    })(rateIdx)
    val channels = if (((u8(i + 3) >> 6) & 3) == 3) 1 else 2
    val audioBytes = (b.length - i).toLong
    // VBR frame count: Xing/Info sits after the side info (MPEG1:
    // 17 mono / 32 stereo bytes; MPEG2/2.5: 9 / 17), VBRI always at
    // frame start + 36; both carry a BE32 total-frames field
    def be32u(j: Int): Long =
      ((u8(j) << 24) | (u8(j + 1) << 16) | (u8(j + 2) << 8) | u8(j + 3)).toLong &
        0xffffffffL
    def tag4(j: Int, t: String): Boolean =
      j + 4 <= b.length && (0 until 4).forall(k => u8(j + k) == t(k))
    val spf = layerBits match {
      case 3 => 384 // Layer I
      case 2 => 1152 // Layer II
      case _ => if (mpeg1) 1152 else 576 // Layer III
    }
    val sideInfo =
      if (mpeg1) { if (channels == 1) 17 else 32 }
      else { if (channels == 1) 9 else 17 }
    val xingAt = i + 4 + sideInfo
    val vbrFrames: Option[Long] =
      if ((tag4(xingAt, "Xing") || tag4(xingAt, "Info")) &&
        xingAt + 12 <= b.length) {
        val flags = be32u(xingAt + 4)
        if ((flags & 1) != 0) Some(be32u(xingAt + 8)) else None
      } else if (tag4(i + 36, "VBRI") && i + 36 + 18 <= b.length)
        Some(be32u(i + 36 + 14))
      else None
    val durationMs = vbrFrames match {
      case Some(f) => f * spf.toDouble / rate * 1000.0
      case None => audioBytes * 8.0 / (kbps * 1000.0) * 1000.0
    }
    Some(AudioMeta(-1L, "mp3", channels, rate, 0, audioBytes, durationMs))
  }

  /** The `fmt ` chunk's (formatTag, channels, blockAlign) — the decode
    * dispatch key [[wavPcm]] needs beyond [[wavMeta]]'s display fields. */
  private def wavFmtTag(b: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || cc(0) != "RIFF" || cc(8) != "WAVE") return None
    var i = 12L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val size = le32(at + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (cc(at) == "fmt " && size >= 16) {
        val rawTag = le16(at + 8)
        val tag = // unwrap WAVE_FORMAT_EXTENSIBLE like wavMeta does
          if (rawTag != 0xFFFE) rawTag
          else if (size >= 40) le16(at + 32)
          else return None
        return Some((tag, le16(at + 10), le16(at + 20)))
      }
      i += 8L + size + (size & 1)
    }
    None
  }

  /** Fixture adapter (the audio sibling of [[asBinaryPayload]]): wrap a
    * text table as REAL single-chunk PCM WAV containers — the header
    * fields derive from the row id (rate 8/12/16/20 kHz, 1-2 channels,
    * 16-bit) and the "samples" are the UTF-8 payload bytes, so an oracle
    * can recompute every parsed field from the row without parsing bytes
    * itself. The parse side ([[wavMeta]]) never sees the formula — it
    * reads only the byte layout. */
  def asWavPayload(spark: SparkSession, df: DataFrame, id: String,
      payloadSrc: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id"),
        encode(col(payloadSrc), "UTF-8").as("data")))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, data) =>
          val channels = 1 + (docId % 2).toInt
          val rate = 8000 + (docId % 4).toInt * 4000
          val bits = 16
          val blockAlign = channels * (bits / 8)
          val pad = data.length & 1
          val buf = java.nio.ByteBuffer
            .allocate(44 + data.length + pad)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII"))
          buf.putInt(36 + data.length + pad)
          buf.put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII"))
          buf.putInt(16)
          buf.putShort(1) // PCM
          buf.putShort(channels.toShort)
          buf.putInt(rate)
          buf.putInt(rate * blockAlign)
          buf.putShort(blockAlign.toShort)
          buf.putShort(bits.toShort)
          buf.put("data".getBytes("US-ASCII"))
          buf.putInt(data.length)
          buf.put(data)
          if (pad == 1) buf.put(0.toByte)
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter for FLAC containers: a real fLaC metadata chain —
    * STREAMINFO with id-derived packed fields (rate/channels/bits/total
    * samples across their bit boundaries), a VORBIS_COMMENT block as the
    * LAST block so the chain walk is exercised, then id-sized fake audio
    * frames. The oracle recomputes every field from the formulas. */
  def asFlacPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val rate = Seq(8000, 16000, 22050, 44100, 48000, 96000)((docId % 6).toInt)
          val ch = 1 + (docId % 2).toInt
          val bps = Seq(16, 24)((docId / 2 % 2).toInt)
          val total = 1000L + docId % 9000
          val nAudio = 10 + (docId % 50).toInt
          val nComment = 12
          val buf = java.nio.ByteBuffer.allocate(4 + 4 + 34 + 4 + nComment + nAudio)
          buf.put("fLaC".getBytes("US-ASCII"))
          buf.put(0.toByte) // STREAMINFO, not last
          buf.put(0.toByte); buf.put(0.toByte); buf.put(34.toByte)
          buf.putShort(4096); buf.putShort(4096) // min/max blocksize
          buf.put(new Array[Byte](6)) // min/max framesize unknown
          buf.put((rate >> 12).toByte)
          buf.put(((rate >> 4) & 0xff).toByte)
          buf.put((((rate & 0xf) << 4) | ((ch - 1) << 1) |
            ((bps - 1) >> 4)).toByte)
          buf.put(((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf).toInt).toByte)
          buf.putInt((total & 0xffffffffL).toInt)
          buf.put(new Array[Byte](16)) // md5
          buf.put(0x84.toByte) // VORBIS_COMMENT, LAST
          buf.put(0.toByte); buf.put(0.toByte); buf.put(nComment.toByte)
          buf.put(new Array[Byte](nComment))
          (0 until nAudio).foreach(j => buf.put(((docId + j) % 256).toByte))
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter for MP3 streams: even ids carry an ID3v2 tag
    * (syncsafe size) before the first frame, odd ids hit the raw
    * frame-sync classify branch; the header cycles the MPEG1 Layer III
    * bitrate/samplerate indexes and the mono/stereo mode. Ids with
    * doc_id % 4 == 3 additionally carry a REAL Xing VBR header (17-byte
    * MPEG1-mono side info, then "Xing" + frames), so the VBR duration
    * path sits under the oracle beside the CBR estimate. */
  def asMp3Payload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val id3 = docId % 2 == 0
          val tag = (docId % 100).toInt
          val bi = 1 + (docId % 14).toInt
          val ri = (docId % 3).toInt
          val mono = docId % 2 == 1
          val m = 96 + (docId % 200).toInt
          val buf = java.nio.ByteBuffer.allocate(
            (if (id3) 10 + tag else 0) + 4 + m)
          if (id3) {
            buf.put("ID3".getBytes("US-ASCII"))
            buf.put(3.toByte); buf.put(0.toByte); buf.put(0.toByte)
            buf.put(((tag >> 21) & 0x7f).toByte)
            buf.put(((tag >> 14) & 0x7f).toByte)
            buf.put(((tag >> 7) & 0x7f).toByte)
            buf.put((tag & 0x7f).toByte)
            buf.put(new Array[Byte](tag))
          }
          buf.put(0xff.toByte)
          buf.put(0xfb.toByte) // MPEG1, Layer III, no CRC
          buf.put(((bi << 4) | (ri << 2)).toByte)
          buf.put((if (mono) 0xc0 else 0x00).toByte)
          val xing = docId % 4 == 3 // odd → mono → 17-byte side info
          var filled = 0
          if (xing) {
            buf.put(new Array[Byte](17))
            buf.put("Xing".getBytes("US-ASCII"))
            buf.putInt(1) // flags: frames present
            buf.putInt((100 + docId % 900).toInt)
            filled = 17 + 12
          }
          (filled until m).foreach(j => buf.put(((docId * 3 + j) % 256).toByte))
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Partition-parallel audio-container triage across WAV, FLAC, and
    * MP3 (magic-dispatched); unrecognized containers drop. */
  def extractAudioContainers(
      spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          wavMeta(bytes).orElse(flacMeta(bytes)).orElse(mp3Meta(bytes))
            .map(_.copy(doc_id = id))
        }
      }
  }

  /** Partition-parallel audio metadata extraction ([[extractMeta]] shape):
    * real WAV header parse per payload; unrecognized containers are
    * dropped (a production pipeline would route them to a quarantine
    * sink). */
  def extractAudioMeta(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          wavMeta(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  /** Typed video row: parsed ISO BMFF (MP4) container metadata. */
  final case class VideoMeta(
      doc_id: Long,
      brand: String,
      timescale: Int,
      duration_ms: Double,
      width: Int,
      height: Int,
      mdat_bytes: Long)

  /** MP4 / ISO BMFF box walk — the video sibling of [[wavMeta]], real
    * byte-level parsing of the public ISO/IEC 14496-12 layout: boxes are
    * (BE32 size incl. header, 4CC type); `ftyp` carries the major brand,
    * `moov` is a pure container whose children include `mvhd` (v0:
    * timescale at body offset 12, duration at 16) and `trak`/`tkhd` (v0:
    * width/height as 16.16 fixed point at body offsets 76/80); `mdat`
    * holds the sample data. Frame/pixel decode stays behind the documented
    * stub — this parses only container structure, which is what corpus
    * triage at 100 TB actually scans (codec work happens after routing).
    * Returns None for anything not a sane MP4 (bad magic, overrunning or
    * undersized boxes, missing mvhd/tkhd/mdat). */
  def mp4Meta(b: Array[Byte]): Option[VideoMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    if (b.length < 16 || cc(4) != "ftyp") return None
    var brand: Option[String] = None
    var timescale = -1
    var duration = -1L
    var width = -1
    var height = -1
    var mdatLen = -1L
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    // walk a box list in [from, until); moov and trak recurse one level.
    // size==1 carries a 64-bit largesize (common for mdat in large real
    // files: header is 16 bytes); size==0 means "extends to end of the
    // enclosing list" and is only legal for the last box.
    def walk(from: Long, until: Long, depth: Int): Boolean = {
      var i = from
      while (i + 8 <= until) {
        val at = i.toInt
        val raw = be32(at)
        val id = cc(at + 4)
        val hdr = if (raw == 1) 16L else 8L
        val size =
          if (raw == 1) { if (i + 16 > until) return false; be64(at + 8) }
          else if (raw == 0) until - i
          else raw
        if (size < hdr || i + size > until) return false
        id match {
          case "ftyp" if hdr == 8 && size >= 12 => brand = Some(cc(at + 8))
          case "moov" | "trak" if depth < 2 =>
            if (!walk(i + hdr, i + size, depth + 1)) return false
          case "mvhd" if hdr == 8 && size >= 8 + 20 =>
            timescale = be32(at + 8 + 12).toInt
            duration = be32(at + 8 + 16)
          case "tkhd" if hdr == 8 && size >= 8 + 84 =>
            // 16.16 fixed point; integral part only
            width = be32(at + 8 + 76).toInt >>> 16
            height = be32(at + 8 + 80).toInt >>> 16
          case "mdat" => mdatLen = size - hdr
          case _ => () // free, udta, skip… — opaque, step over
        }
        i += size
      }
      true
    }
    if (!walk(0L, b.length.toLong, 0)) return None
    (brand, timescale, duration, width, height, mdatLen) match {
      case (Some(br), ts, d, w, h, m) if ts > 0 && d >= 0 && w > 0 && h > 0 && m >= 0 =>
        Some(VideoMeta(-1L, br, ts, d.toDouble / ts * 1000.0, w, h, m))
      case _ => None
    }
  }

  /** ISO-BMFF still-image brand of an ftyp file: "avif" or "heic"
    * (None → not an image brand; the mp4 arm proceeds). Compatible
    * brands are checked too — a `mif1`-major file with avif in its
    * compatible list is an AVIF in the wild. */
  def avifHeicBrand(b: Array[Byte]): Option[String] = {
    def u8(i: Int) = b(i) & 0xff
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    if (b.length < 16 || cc(4) != "ftyp") return None
    val size = ((u8(0) << 24) | (u8(1) << 16) | (u8(2) << 8) | u8(3))
    if (size < 16 || size > b.length) return None
    def kind(brand: String): Option[String] = brand match {
      case "avif" | "avis" => Some("avif")
      case "heic" | "heix" | "hevc" | "heim" | "heis" => Some("heic")
      case _ => None
    }
    kind(cc(8)).orElse {
      // compatible brand list: 4CCs from offset 16 to the box end
      (16 until (size - 3) by 4).iterator.flatMap(i => kind(cc(i)))
        .nextOption()
    }
  }

  /** Typed AVIF/HEIC triage row: brand + ispe dimensions. */
  final case class BmffImageMeta(
      doc_id: Long, format: String, width: Int, height: Int)

  /** AVIF/HEIC dimension triage: walk `meta` (a FullBox — 4 bytes of
    * version/flags after the header) → `iprp` → `ipco` → first `ispe`
    * (image spatial extents: BE32 width, height after its own FullBox
    * bytes). Handles 64-bit largesize boxes like the MP4 walkers. */
  def avifHeicMeta(b: Array[Byte]): Option[BmffImageMeta] = {
    val fmt = avifHeicBrand(b).getOrElse(return None)
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    var res: Option[(Int, Int)] = None
    // fullBoxSkip: meta is a FullBox; plain containers (iprp/ipco) not
    def walk(from: Long, until: Long, depth: Int): Boolean = {
      var i = from
      while (i + 8 <= until && res.isEmpty) {
        val at = i.toInt
        val raw = be32(at)
        val id = cc(at + 4)
        val hdr = if (raw == 1) 16L else 8L
        val size =
          if (raw == 1) { if (i + 16 > until) return false; be64(at + 8) }
          else if (raw == 0) until - i
          else raw
        if (size < hdr || i + size > until) return false
        id match {
          case "meta" if depth == 0 && size >= hdr + 4 =>
            if (!walk(i + hdr + 4, i + size, 1)) return false
          case "iprp" | "ipco" if depth >= 1 && depth < 4 =>
            if (!walk(i + hdr, i + size, depth + 1)) return false
          case "ispe" if size >= hdr + 12 =>
            val w = be32((i + hdr + 4).toInt).toInt
            val h = be32((i + hdr + 8).toInt).toInt
            if (w > 0 && h > 0) res = Some((w, h))
          case _ => ()
        }
        i += size
      }
      true
    }
    if (!walk(0L, b.length.toLong, 0)) return None
    res.map { case (w, h) => BmffImageMeta(-1L, fmt, w, h) }
  }

  /** Partition-parallel AVIF/HEIC triage. */
  def extractBmffImages(
      spark: SparkSession, media: DataFrame): Dataset[BmffImageMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        avifHeicMeta(bytes).map(_.copy(doc_id = id))
      })
  }

  /** Fixture: minimal REAL AVIF/HEIC shells — ftyp(brand) + meta(hdlr
    * 'pict' + iprp(ipco(ispe))) + a stub mdat; dims from the row id.
    * Even ids AVIF, odd HEIC; every third file hides the image brand in
    * the COMPATIBLE list behind a mif1 major (the wild layout). */
  def asAvifHeicPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions(_.map { docId =>
        def box(tp: String, body: Array[Byte]): Array[Byte] = {
          val buf = java.nio.ByteBuffer.allocate(8 + body.length)
          buf.putInt(8 + body.length)
          buf.put(tp.getBytes("US-ASCII"))
          buf.put(body)
          buf.array()
        }
        val brand = if (docId % 2 == 0) "avif" else "heic"
        val viaCompat = docId % 3 == 0
        val ftyp =
          if (viaCompat)
            box("ftyp", "mif1".getBytes ++ Array[Byte](0, 0, 0, 0) ++
              "mif1".getBytes ++ brand.getBytes)
          else box("ftyp", brand.getBytes ++ Array[Byte](0, 0, 0, 0) ++
            "mif1".getBytes)
        val w = 64 + (docId % 1000).toInt
        val h = 48 + (docId % 800).toInt
        val ispe = {
          val buf = java.nio.ByteBuffer.allocate(12)
          buf.putInt(0) // FullBox version/flags
          buf.putInt(w); buf.putInt(h)
          box("ispe", buf.array())
        }
        val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++
          "pict".getBytes ++ new Array[Byte](12))
        val meta = box("meta", Array[Byte](0, 0, 0, 0) ++ hdlr ++
          box("iprp", box("ipco", ispe)))
        (docId, ftyp ++ meta ++ box("mdat", s"x$docId".getBytes))
      }).toDF("doc_id", "payload")
  }

  /** Fixture adapter (the video sibling of [[asWavPayload]]): wrap a text
    * table as REAL minimal MP4 containers — ftyp('isom') + moov(mvhd +
    * trak(tkhd)) + mdat(payload bytes). Header fields derive from the row
    * id (320×240…800×600 ladder, duration 1–30 s at timescale 600), so an
    * oracle recomputes every parsed field from the row WITHOUT parsing;
    * [[mp4Meta]] never sees the formula — it reads only the byte layout. */
  def asMp4Payload(spark: SparkSession, df: DataFrame, id: String,
      payloadSrc: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id"),
        encode(col(payloadSrc), "UTF-8").as("data")))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, data) =>
          val step = (docId % 4).toInt
          val w = 320 + step * 160
          val h = 240 + step * 120
          val timescale = 600
          val duration = timescale * (1 + (docId % 30).toInt)
          def box(tp: String, body: Array[Byte]): Array[Byte] = {
            val buf = java.nio.ByteBuffer.allocate(8 + body.length)
              .order(java.nio.ByteOrder.BIG_ENDIAN)
            buf.putInt(8 + body.length)
            buf.put(tp.getBytes("US-ASCII"))
            buf.put(body)
            buf.array()
          }
          val ftypBody = java.nio.ByteBuffer.allocate(8)
            .put("isom".getBytes("US-ASCII")).putInt(512).array()
          val mvhd = {
            val buf = java.nio.ByteBuffer.allocate(100) // v0 mvhd body
            buf.putInt(0) // version/flags
            buf.putInt(0).putInt(0) // creation/modification
            buf.putInt(timescale)
            buf.putInt(duration)
            buf.array()
          }
          val tkhd = {
            val buf = java.nio.ByteBuffer.allocate(84) // v0 tkhd body
            buf.putInt(0)
            buf.putInt(0).putInt(0)
            buf.putInt(1) // track id
            buf.position(76)
            buf.putInt(w << 16) // 16.16 fixed
            buf.putInt(h << 16)
            buf.array()
          }
          val moov = box("moov",
            box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
          val payload = box("ftyp", ftypBody) ++ moov ++ box("mdat", data)
          (docId, payload)
        }
      }.toDF("doc_id", "payload")
  }

  /** Partition-parallel MP4 metadata extraction; unrecognized containers
    * are dropped (quarantine-sink route in production). */
  def extractVideoMeta(spark: SparkSession, media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          mp4Meta(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  /** Decoded pixel statistics of one binary netpbm image (P5 grayscale /
    * P6 RGB — the research-corpus interchange format): channel sums +
    * the top-left pixel, the PNG/BMP/TIFF row shape. */
  final case class PnmPixels(
      doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      first_r: Int, first_g: Int, first_b: Int)

  /** REAL binary netpbm decode: the whitespace/comment-tolerant header
    * grammar (`P5`/`P6`, `#` comments legal between tokens, ONE
    * whitespace byte after maxval), then raw big-endian samples — 8-bit
    * at maxval 255, 16-bit at maxval 65535 (high-byte downscale, the
    * png16 convention). Other maxvals and the ASCII formats (P2/P3)
    * quarantine. */
  def pnmPixels(b: Array[Byte]): Option[PnmPixels] = {
    if (b.length < 4 || b(0) != 'P' || (b(1) != '5' && b(1) != '6'))
      return None
    val rgb = b(1) == '6'
    var i = 2
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def token(): Option[Int] = {
      // skip whitespace and # comments (to end of line)
      var going = true
      while (going) {
        while (i < b.length && isWs(b(i))) i += 1
        if (i < b.length && b(i) == '#') {
          while (i < b.length && b(i) != '\n') i += 1
        } else going = false
      }
      if (i >= b.length || b(i) < '0' || b(i) > '9') return None
      var v = 0L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0')
        if (v > Int.MaxValue) return None
        i += 1
      }
      Some(v.toInt)
    }
    val w = token().getOrElse(return None)
    val h = token().getOrElse(return None)
    val maxval = token().getOrElse(return None)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
    if (maxval != 255 && maxval != 65535) return None
    if (i >= b.length || !isWs(b(i))) return None
    i += 1 // exactly one whitespace byte before the raster
    val bps = if (maxval == 255) 1 else 2
    val spp = if (rgb) 3 else 1
    if (i.toLong + w.toLong * h * spp * bps > b.length) return None
    def sample(k: Int): Int =
      if (bps == 1) b(i + k) & 0xff
      else b(i + 2 * k) & 0xff // big-endian pair: high byte
    var sr = 0L; var sg = 0L; var sb = 0L
    var fr = 0; var fg = 0; var fb = 0
    var j = 0
    val n = w * h
    while (j < n) {
      val r = sample(j * spp)
      val g = if (rgb) sample(j * spp + 1) else r
      val bb = if (rgb) sample(j * spp + 2) else r
      if (j == 0) { fr = r; fg = g; fb = bb }
      sr += r; sg += g; sb += bb
      j += 1
    }
    Some(PnmPixels(-1L, w, h, sr, sg, sb, fr, fg, fb))
  }

  /** Partition-parallel PNM decode ([[extractBmpPixels]] shape). */
  def extractPnmPixels(spark: SparkSession, media: DataFrame): Dataset[PnmPixels] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          pnmPixels(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  /** Fixture adapter for binary netpbm: P5/P6 alternating with the
    * shared pixel formulas, every other doc 16-bit (high byte = formula,
    * low byte independent), headers salted with comments and mixed
    * whitespace so the grammar is exercised, not just the golden path. */
  def asPnmPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val gray = docId % 3 == 0
          val deep = docId % 2 == 1
          val header = (if (gray) "P5" else "P6") +
            (if (docId % 4 == 0) s"\n# doc $docId fixture\n" else "\n") +
            s"$w ${if (docId % 5 == 0) "\n# interleaved\n" else " "}$h\n" +
            (if (deep) "65535" else "255") + "\n"
          val spp = if (gray) 1 else 3
          val bps = if (deep) 2 else 1
          val data = new Array[Byte](w * h * spp * bps)
          var k = 0
          for (y <- 0 until h; x <- 0 until w; c <- 0 until spp) {
            val hi = (c match {
              case 0 => (docId + 7L * x + 13L * y) % 256
              case 1 => (docId * 3 + 5L * x + 11L * y) % 256
              case _ => (docId * 5 + 3L * x + 17L * y) % 256
            }).toInt
            if (deep) {
              data(k) = hi.toByte
              data(k + 1) = ((docId + 3L * (x + 7L * y + 11L * c)) % 256).toByte
              k += 2
            } else { data(k) = hi.toByte; k += 1 }
          }
          (docId, header.getBytes("US-ASCII") ++ data)
        }
      }.toDF("doc_id", "payload")
  }

  /** Decoded pixel statistics of one TGA (Truevision — the game/graphics
    * corpus format): channel sums + top-left pixel. */
  final case class TgaPixels(
      doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      first_r: Int, first_g: Int, first_b: Int)

  /** REAL TGA decode: the 18-byte header (image id skipped), truecolor
    * (type 2: 24-bit BGR / 32-bit BGRA) and grayscale (type 3: 8-bit),
    * plus their RLE forms (types 10/11 — high-bit run packets and raw
    * packets, pixels allowed to wrap row boundaries per spec), bottom-up
    * or top-down per descriptor bit 5 and left-to-right or right-to-left
    * per descriptor bit 4 (both legal per the Truevision spec). Palette
    * types and odd depths quarantine. */
  def tgaPixels(b: Array[Byte]): Option[TgaPixels] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (b.length < 18) return None
    val idLen = u8(0)
    if (u8(1) != 0) return None // color-mapped: out of scope
    val itype = u8(2)
    val rle = itype == 10 || itype == 11
    val gray = itype == 3 || itype == 11
    if (itype != 2 && itype != 3 && itype != 10 && itype != 11) return None
    val w = le16(12)
    val h = le16(14)
    val bpp = u8(16)
    val topDown = (u8(17) & 0x20) != 0
    val rightToLeft = (u8(17) & 0x10) != 0
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
    val bytesPerPx =
      if (gray) { if (bpp != 8) return None; 1 }
      else bpp match { case 24 => 3; case 32 => 4; case _ => return None }
    var pos = 18 + idLen
    val n = w * h
    // decode into stored order (row 0 first as stored)
    val px = new Array[Byte](n * bytesPerPx)
    if (!rle) {
      if (pos.toLong + n.toLong * bytesPerPx > b.length) return None
      System.arraycopy(b, pos, px, 0, n * bytesPerPx)
    } else {
      var o = 0
      while (o < n * bytesPerPx) {
        if (pos >= b.length) return None
        val hdr = u8(pos); pos += 1
        val cnt = (hdr & 0x7f) + 1
        if (o + cnt * bytesPerPx > n * bytesPerPx) return None
        if ((hdr & 0x80) != 0) { // run packet: one pixel repeated
          if (pos + bytesPerPx > b.length) return None
          var k = 0
          while (k < cnt) {
            System.arraycopy(b, pos, px, o, bytesPerPx)
            o += bytesPerPx; k += 1
          }
          pos += bytesPerPx
        } else { // raw packet
          if (pos + cnt * bytesPerPx > b.length) return None
          System.arraycopy(b, pos, px, o, cnt * bytesPerPx)
          o += cnt * bytesPerPx
          pos += cnt * bytesPerPx
        }
      }
    }
    var sr = 0L; var sg = 0L; var sb = 0L
    var fr = 0; var fg = 0; var fb = 0
    var y = 0
    while (y < h) { // image rows, top-based
      val stored = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val storedX = if (rightToLeft) w - 1 - x else x
        val i = (stored * w + storedX) * bytesPerPx
        val (r, g, bb) =
          if (gray) { val v = px(i) & 0xff; (v, v, v) }
          else (px(i + 2) & 0xff, px(i + 1) & 0xff, px(i) & 0xff) // BGR(A)
        if (x == 0 && y == 0) { fr = r; fg = g; fb = bb }
        sr += r; sg += g; sb += bb
        x += 1
      }
      y += 1
    }
    Some(TgaPixels(-1L, w, h, sr, sg, sb, fr, fg, fb))
  }

  /** Partition-parallel TGA decode ([[extractBmpPixels]] shape). */
  def extractTgaPixels(spark: SparkSession, media: DataFrame): Dataset[TgaPixels] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          tgaPixels(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  /** Fixture adapter for TGA over the shared pixel formulas: lanes cycle
    * truecolor-24 / gray-8 / RLE-truecolor / RLE-gray (the RLE encoder
    * emits genuine run + raw packets, wrapping rows as the format
    * allows), origin alternates bottom-up/top-down, and an image-id
    * blob salts the header offset. */
  def asTgaPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val lane = (docId % 4).toInt
          val gray = lane == 1 || lane == 3
          val rle = lane >= 2
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val topDown = docId % 2 == 1
          val idLen = (docId % 7).toInt
          val bytesPerPx = if (gray) 1 else 3
          def px(x: Int, y: Int, c: Int): Int = (c match {
            case 0 => (docId + 7L * x + 13L * y) % 256
            case 1 => (docId * 3 + 5L * x + 11L * y) % 256
            case _ => (docId * 5 + 3L * x + 17L * y) % 256
          }).toInt
          // stored-order pixel stream (bottom-up unless topDown)
          val stream = new Array[Byte](w * h * bytesPerPx)
          for (sy <- 0 until h; x <- 0 until w) {
            val y = if (topDown) sy else h - 1 - sy
            val o = (sy * w + x) * bytesPerPx
            if (gray) stream(o) = px(x, y, 0).toByte
            else {
              stream(o) = px(x, y, 2).toByte // B
              stream(o + 1) = px(x, y, 1).toByte
              stream(o + 2) = px(x, y, 0).toByte // R
            }
          }
          val body: Array[Byte] =
            if (!rle) stream
            else {
              // real RLE: runs of identical PIXELS (may cross rows),
              // raw packets otherwise, both capped at 128
              val out = new java.io.ByteArrayOutputStream()
              val n = w * h
              def same(a: Int, b2: Int): Boolean =
                (0 until bytesPerPx).forall(k =>
                  stream(a * bytesPerPx + k) == stream(b2 * bytesPerPx + k))
              var i = 0
              while (i < n) {
                var j = i
                while (j + 1 < n && same(j + 1, i) && j - i < 127) j += 1
                val run = j - i + 1
                if (run >= 2) {
                  out.write(0x80 | (run - 1))
                  out.write(stream, i * bytesPerPx, bytesPerPx)
                  i = j + 1
                } else {
                  var k = i
                  while (k < n && k - i < 127 &&
                    !(k + 1 < n && same(k + 1, k))) k += 1
                  val cnt = k - i
                  out.write(cnt - 1)
                  out.write(stream, i * bytesPerPx, cnt * bytesPerPx)
                  i = k
                }
              }
              out.toByteArray
            }
          val buf = java.nio.ByteBuffer.allocate(18 + idLen + body.length)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put(idLen.toByte)
          buf.put(0.toByte) // no color map
          buf.put((if (gray) { if (rle) 11 else 3 }
                   else { if (rle) 10 else 2 }).toByte)
          buf.put(new Array[Byte](5)) // color-map spec
          buf.putShort(0); buf.putShort(0) // origin
          buf.putShort(w.toShort); buf.putShort(h.toShort)
          buf.put((if (gray) 8 else 24).toByte)
          buf.put((if (topDown) 0x20 else 0x00).toByte)
          (0 until idLen).foreach(k => buf.put(((docId + k) % 256).toByte))
          buf.put(body)
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** One ICO container's triage + decoded stats of its LARGEST member —
    * the favicon class of web-crawl corpora. Members are PNG (delegated
    * to the PNG decoder) or headerless DIBs (delegated to the BMP
    * decoder after synthesizing the file header and halving the doubled
    * XOR+AND-mask height). */
  final case class IcoPixels(
      doc_id: Long, n_members: Int, member_format: String,
      width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      first_r: Int, first_g: Int, first_b: Int)

  def icoPixels(b: Array[Byte]): Option[IcoPixels] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length < 6 || le16(0) != 0 || le16(2) != 1) return None // icons only
    val n = le16(4)
    if (n < 1 || n > 64 || 6 + 16 * n > b.length) return None
    // pick the largest member by directory dims (0 encodes 256)
    val entries = (0 until n).map { k =>
      val e = 6 + 16 * k
      val w = if (u8(e) == 0) 256 else u8(e)
      val h = if (u8(e + 1) == 0) 256 else u8(e + 1)
      (w * h, le32(e + 8), le32(e + 12)) // area, size, offset
    }
    val (_, size, off) = entries.maxBy(_._1)
    if (off < 6 || size < 16 || off.toLong + size > b.length) return None
    val isPng = size >= 8 && u8(off) == 0x89 && b(off + 1) == 'P' &&
      b(off + 2) == 'N' && b(off + 3) == 'G'
    if (isPng) {
      val member = java.util.Arrays.copyOfRange(b, off, off + size)
      pngPixels(member).map(p => IcoPixels(-1L, n, "png",
        p.width, p.height, p.sum_r, p.sum_g, p.sum_b,
        p.first_r, p.first_g, p.first_b))
    } else {
      // headerless DIB: BITMAPINFOHEADER whose biHeight DOUBLES the
      // pixel height (XOR image + AND mask); the XOR rows come first,
      // so re-wrapping with a synthesized BM header and the TRUE height
      // reads exactly the XOR image through the shared BMP decoder
      if (size < 40 || le32(off) != 40) return None
      val dblH = le32(off + 8)
      if (dblH <= 0 || dblH % 2 != 0) return None
      val fixed = new Array[Byte](14 + size)
      fixed(0) = 'B'; fixed(1) = 'M'
      System.arraycopy(b, off, fixed, 14, size)
      val bits = le16(off + 14)
      val clrUsed = le32(off + 32)
      val palN =
        if (bits > 8) 0 else if (clrUsed > 0) clrUsed else 1 << bits
      val dataOff = 14 + 40 + 4 * palN
      val bb = java.nio.ByteBuffer.wrap(fixed)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(2, fixed.length) // file size
      bb.putInt(10, dataOff)
      bb.putInt(14 + 8, dblH / 2) // true height
      bmpPixels(fixed).map(p => IcoPixels(-1L, n, "dib",
        p.width, p.height, p.sum_r, p.sum_g, p.sum_b,
        p.first_r, p.first_g, p.first_b))
    }
  }

  /** Partition-parallel ICO decode ([[extractBmpPixels]] shape). */
  def extractIcoPixels(spark: SparkSession, media: DataFrame): Dataset[IcoPixels] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          icoPixels(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  /** Fixture adapter for ICO favicons: 1–3 DIB members per doc (24-bit
    * and 8-bit-palette lanes, AND mask present, bottom-up), the LARGEST
    * carrying the shared pixel formulas — so the oracle recomputes the
    * winner's statistics and a member-selection, offset, or doubled-
    * height bug breaks the hash. */
  def asIcoPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val nMembers = 1 + (docId % 3).toInt
          val pal8 = docId % 2 == 1
          // member k dims: the LAST member is the largest (selection
          // must use the directory, not order)
          def dims(k: Int) = (4 + k * 4 + (docId % 5).toInt,
            3 + k * 4 + (docId % 4).toInt)
          def dib(k: Int): Array[Byte] = {
            val (w, h) = dims(k)
            val big = k == nMembers - 1
            def px(x: Int, y: Int, c: Int): Int =
              if (!big) (x + y + c) % 256 // filler member
              else (c match {
                case 0 => (docId + 7L * x + 13L * y) % 256
                case 1 => (docId * 3 + 5L * x + 11L * y) % 256
                case _ => (docId * 5 + 3L * x + 17L * y) % 256
              }).toInt
            val palN = if (pal8) 256 else 0
            val stride =
              if (pal8) (w + 3) / 4 * 4 else (w * 3 + 3) / 4 * 4
            val maskStride = (w + 31) / 32 * 4
            val size = 40 + 4 * palN + stride * h + maskStride * h
            val buf = java.nio.ByteBuffer.allocate(size)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            buf.putInt(40); buf.putInt(w); buf.putInt(2 * h) // doubled
            buf.putShort(1); buf.putShort(if (pal8) 8 else 24)
            buf.putInt(0); buf.putInt(0)
            buf.putInt(0); buf.putInt(0); buf.putInt(palN); buf.putInt(0)
            if (pal8) (0 until 256).foreach { i =>
              buf.put(((11 * i + 13) % 256).toByte)
              buf.put(((3 * i + 7) % 256).toByte)
              buf.put(((5 * i + 1) % 256).toByte)
              buf.put(0.toByte)
            }
            for (sy <- 0 until h) {
              val y = h - 1 - sy // bottom-up
              var written = 0
              for (x <- 0 until w) {
                if (pal8) {
                  buf.put(((docId + 7L * x + 13L * y) % 256).toByte)
                  written += 1
                } else {
                  buf.put(px(x, y, 2).toByte) // B
                  buf.put(px(x, y, 1).toByte) // G
                  buf.put(px(x, y, 0).toByte) // R
                  written += 3
                }
              }
              while (written % 4 != 0) { buf.put(0.toByte); written += 1 }
            }
            buf.put(new Array[Byte](maskStride * h)) // AND mask: opaque
            buf.array()
          }
          val members = (0 until nMembers).map(dib)
          val dirSize = 6 + 16 * nMembers
          val offsets = members.map(_.length)
            .scanLeft(dirSize)(_ + _).init
          val buf = java.nio.ByteBuffer
            .allocate(dirSize + members.map(_.length).sum)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.putShort(0); buf.putShort(1)
          buf.putShort(nMembers.toShort)
          for (k <- 0 until nMembers) {
            val (w, h) = dims(k)
            buf.put((w & 0xff).toByte).put((h & 0xff).toByte)
            buf.put(0.toByte).put(0.toByte)
            buf.putShort(1)
            buf.putShort(if (pal8) 8 else 24)
            buf.putInt(members(k).length)
            buf.putInt(offsets(k))
          }
          members.foreach(buf.put)
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** One MP4 track's CODEC identity + stream parameters — what 100 TB
    * video triage actually scans (routing and dedup key on codec/profile/
    * true coded dims BEFORE any frame decode): the stsd sample entry's
    * FourCC, and for `avc1` the AVCDecoderConfigurationRecord's profile/
    * level plus the TRUE coded dimensions parsed from the SPS itself
    * (macroblock grid minus frame cropping — tkhd's 16.16 display size
    * can disagree with the stream); for `mp4a` the sample entry's
    * channel count and sample rate. Non-avc1 video codecs (hvc1, vp09,
    * av01…) report their FourCC with -1 parameters — identified, not
    * mis-parsed. */
  final case class Mp4Codec(
      doc_id: Long,
      codec: String,
      profile: Int,
      level: Int,
      coded_width: Int,
      coded_height: Int,
      audio_channels: Int,
      audio_rate: Int)

  /** MSB-first Exp-Golomb bit reader over an RBSP (emulation-prevention
    * bytes already stripped). Throws [[JpegBitReader.Bail]] on overrun —
    * reused as the shared stackless quarantine signal. */
  private final class SpsBitReader(b: Array[Byte]) {
    private var pos = 0
    def bit(): Int = {
      if ((pos >> 3) >= b.length) throw JpegBitReader.Bail
      val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** ue(v): count leading zeros, read that many more bits. */
    def ue(): Int = {
      var zeros = 0
      while (bit() == 0) {
        zeros += 1
        if (zeros > 31) throw JpegBitReader.Bail
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else bits(zeros))
    }
    /** se(v): signed mapping of ue(v). */
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** Strip H.264 emulation-prevention bytes (00 00 03 → 00 00). */
  private def stripEmulation(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(until - from)
    var i = from
    var zeros = 0
    while (i < until) {
      val v = b(i) & 0xff
      if (zeros >= 2 && v == 3) zeros = 0 // skip the escape byte
      else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** Parse an H.264 SEQUENCE PARAMETER SET (ITU-T H.264 §7.3.2.1.1) to
    * (profile_idc, level_idc, coded width, coded height). Scope: frame
    * coding (mbs-only or MBAFF), chroma 4:2:0/4:0:0/4:2:2/4:4:4 crop
    * units, no seq_scaling_matrix (quarantines — the fixture space and
    * the overwhelming majority of real streams omit it). */
  private[graft] def parseSps(nal: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (nal.length < 4 || (nal(0) & 0x1f) != 7) return None
    val r = new SpsBitReader(stripEmulation(nal, 1, nal.length))
    try {
      val profile = r.bits(8)
      r.bits(8) // constraint flags + reserved
      val level = r.bits(8)
      r.ue() // seq_parameter_set_id
      var chromaIdc = 1
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
          .contains(profile)) {
        chromaIdc = r.ue()
        if (chromaIdc == 3) r.bit() // separate_colour_plane_flag
        r.ue(); r.ue() // bit depths
        r.bit() // qpprime_y_zero_transform_bypass
        if (r.bit() == 1) return None // scaling matrix: out of scope
      }
      r.ue() // log2_max_frame_num_minus4
      r.ue() match { // pic_order_cnt_type
        case 0 => r.ue()
        case 1 =>
          r.bit(); r.se(); r.se()
          val n = r.ue()
          if (n > 255) return None
          (0 until n).foreach(_ => r.se())
        case _ => ()
      }
      r.ue() // max_num_ref_frames
      r.bit() // gaps_in_frame_num_value_allowed
      val widthMbs = r.ue() + 1
      val heightUnits = r.ue() + 1
      val frameMbsOnly = r.bit()
      if (frameMbsOnly == 0) r.bit() // mb_adaptive_frame_field
      r.bit() // direct_8x8_inference
      var w = widthMbs * 16
      var h = heightUnits * 16 * (2 - frameMbsOnly)
      if (r.bit() == 1) { // frame_cropping
        val (cx, cy) = chromaIdc match {
          case 0 => (1, 2 - frameMbsOnly)
          case 1 => (2, 2 * (2 - frameMbsOnly))
          case 2 => (2, 2 - frameMbsOnly)
          case _ => (1, 2 - frameMbsOnly)
        }
        val l = r.ue(); val rr = r.ue(); val t = r.ue(); val bb = r.ue()
        w -= (l + rr) * cx
        h -= (t + bb) * cy
      }
      if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) None
      else Some((profile, level, w, h))
    } catch { case JpegBitReader.Bail => None }
  }

  /** Walk moov/trak/mdia/minf/stbl to the FIRST stsd sample entry and
    * report its codec identity ([[Mp4Codec]]). `avc1` entries parse the
    * avcC record's first SPS; `mp4a` entries read the audio sample-entry
    * fields; other FourCCs are identified with -1 parameters. */
  def mp4CodecInfo(b: Array[Byte]): Option[Mp4Codec] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    if (b.length < 16 || cc(4) != "ftyp") return None
    var found: Option[Mp4Codec] = None
    /** Walk the sample entry's children to `esds`, parse the MPEG-4
      * descriptor chain (ES → DecoderConfig → DecoderSpecificInfo) to
      * the AudioSpecificConfig: (audioObjectType, rate, channels).
      * Descriptor lengths are the 7-bit-continuation varint form. */
    def esdsAudioConfig(from: Int, until: Int)
        : Option[(Int, Option[Int], Option[Int])] = {
      val AscRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
        24000, 22050, 16000, 12000, 11025, 8000, 7350)
      var j = from
      while (j + 8 <= until) {
        val bs = be32(j)
        if (bs < 8 || j + bs > until) return None
        if (cc(j + 4) == "esds" && bs >= 8 + 4 + 5) {
          var p = j + 8 + 4 // skip FullBox version/flags
          def varlen(): Int = {
            var v = 0
            var k = 0
            while (k < 4 && p < until && (u8(p) & 0x80) != 0) {
              v = (v << 7) | (u8(p) & 0x7f); p += 1; k += 1
            }
            if (p >= until) return -1
            v = (v << 7) | (u8(p) & 0x7f); p += 1
            v
          }
          if (p >= until || u8(p) != 0x03) return None // ES_Descriptor
          p += 1
          if (varlen() < 0 || p + 3 > until) return None
          p += 2 // ES_ID
          val esFlags = u8(p); p += 1
          if ((esFlags & 0x80) != 0) p += 2 // streamDependsOn
          if ((esFlags & 0x40) != 0) { // URL string
            if (p >= until) return None
            p += 1 + u8(p)
          }
          if ((esFlags & 0x20) != 0) p += 2 // OCR ES id
          if (p >= until || u8(p) != 0x04) return None // DecoderConfig
          p += 1
          if (varlen() < 0 || p + 13 > until) return None
          p += 13 // objectTypeIndication(1) stream(1) buffer(3) rates(8)
          if (p >= until || u8(p) != 0x05) return None // DecoderSpecificInfo
          p += 1
          val dsiLen = varlen()
          if (dsiLen < 2 || p + 2 > until) return None
          val aot = (u8(p) >> 3) & 0x1f
          val freqIdx = ((u8(p) & 7) << 1) | (u8(p + 1) >> 7)
          val chanCfg = (u8(p + 1) >> 3) & 0xf
          val rate =
            if (freqIdx < AscRates.length) Some(AscRates(freqIdx)) else None
          val chans = if (chanCfg > 0) Some(chanCfg) else None
          return Some((aot, rate, chans))
        }
        j += bs.toInt
      }
      None
    }
    def sampleEntry(at: Int, size: Long): Unit = {
      val fourcc = cc(at + 4)
      fourcc match {
        case "avc1" | "avc3" =>
          // VisualSampleEntry: 8 box header + 6 reserved + 2 dri + 70
          // fixed bytes, then child boxes (avcC among them)
          var j = at + 8 + 78
          var info: Option[Mp4Codec] = None
          while (info.isEmpty && j + 8 <= at + size) {
            val bs = be32(j)
            if (bs < 8 || j + bs > at + size) return
            if (cc(j + 4) == "avcC" && bs >= 8 + 7) {
              val p = j + 8
              if (u8(p) != 1) return // configurationVersion
              val nSps = u8(p + 5) & 0x1f
              if (nSps >= 1 && p + 8 <= b.length) {
                val spsLen = be16(p + 6)
                if (p + 8 + spsLen <= j + bs) {
                  val sps = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + spsLen)
                  info = parseSps(sps).map { case (pr, lv, w, h) =>
                    Mp4Codec(-1L, fourcc, pr, lv, w, h, -1, -1) }
                }
              }
            }
            j += bs.toInt
          }
          found = found.orElse(info)
        case "mp4a" =>
          // AudioSampleEntry: 8 header + 6 reserved + 2 dri + 8 reserved,
          // then channelcount(16) samplesize(16) predefined(16)
          // reserved(16) samplerate(16.16); child boxes follow (esds).
          if (size >= 8 + 28) {
            val base = at + 8 + 8
            val chans = be16(base + 8)
            val rate = be32(base + 16).toInt >>> 16
            // esds → AudioSpecificConfig: the sample entry's 16.16 rate
            // field is 16-bit and LIES above 65535 Hz (and some muxers
            // write 0) — the ASC's frequency index is authoritative, and
            // its audioObjectType identifies the AAC profile
            val asc = esdsAudioConfig(at + 8 + 28, (at + size).toInt)
            val effRate = asc.flatMap(_._2).getOrElse(rate)
            val effChans = asc.flatMap(_._3).getOrElse(chans)
            val aot = asc.map(_._1).getOrElse(-1)
            if (effChans > 0 && effRate > 0)
              found = found.orElse(Some(
                Mp4Codec(-1L, fourcc, aot, -1, -1, -1, effChans, effRate)))
          }
        case fc if fc.forall(c => c >= ' ' && c <= '~') =>
          // identified, parameters out of scope (hvc1, vp09, av01, …)
          found = found.orElse(Some(Mp4Codec(-1L, fc, -1, -1, -1, -1, -1, -1)))
        case _ => ()
      }
    }
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    // size==1 → 64-bit largesize (16-byte header; real-world mdat); such
    // boxes are stepped over so triage still reaches moov/stsd. size==0 →
    // box extends to the end of the enclosing list.
    def walk(from: Long, until: Long, depth: Int): Boolean = {
      var i = from
      while (i + 8 <= until) {
        val at = i.toInt
        val raw = be32(at)
        val id = cc(at + 4)
        val hdr = if (raw == 1) 16L else 8L
        val size =
          if (raw == 1) { if (i + 16 > until) return false; be64(at + 8) }
          else if (raw == 0) until - i
          else raw
        if (size < hdr || i + size > until) return false
        id match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" if depth < 6 =>
            if (!walk(i + hdr, i + size, depth + 1)) return false
          case "stsd" if hdr == 8 && size >= 16 =>
            // FullBox: version/flags + entry_count, then sample entries
            val n = be32(at + 12)
            if (n >= 1 && size >= 24) {
              val eAt = at + 16
              val eSize = be32(eAt)
              if (eSize >= 8 && eAt + eSize <= i + size)
                sampleEntry(eAt, eSize)
            }
          case _ => ()
        }
        i += size
      }
      true
    }
    if (!walk(0L, b.length.toLong, 0)) return None
    found
  }

  /** MSB-first bit writer with Exp-Golomb, the dual of [[SpsBitReader]]
    * (fixture side). */
  private final class SpsBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def bit(v: Int): Unit = {
      acc = (acc << 1) | (v & 1)
      n += 1
      if (n == 8) { out.write(acc); acc = 0; n = 0 }
    }
    def bits(v: Int, w: Int): Unit =
      (w - 1 to 0 by -1).foreach(i => bit((v >> i) & 1))
    def ue(v: Int): Unit = {
      val k = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(k)
      bits(0, len - 1)
      bits(k, len)
    }
    /** rbsp_stop_one_bit + byte alignment. */
    def stop(): Array[Byte] = {
      bit(1)
      while (n != 0) bit(0)
      out.toByteArray
    }
  }

  /** Insert H.264 emulation-prevention bytes (00 00 {0..3} → 00 00 03 x). */
  private def insertEmulation(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 4)
    var zeros = 0
    rbsp.foreach { byt =>
      val v = byt & 0xff
      if (zeros >= 2 && v <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** Fixture adapter for the MP4 CODEC-TRIAGE matrix: every third doc is
    * an `mp4a` audio track (channel/rate ladder in the sample entry),
    * every seventh video doc an `hvc1` (identified, parameters out of
    * scope), the rest `avc1` whose avcC carries a REAL synthesized SPS —
    * profile 66/77/100 (the high-profile chroma block included), level
    * ladder, macroblock grid + frame cropping so the TRUE coded
    * dimensions differ from round numbers, written with proper
    * emulation-prevention. The oracle recomputes every field from the id
    * formulas; `parseSps` never sees them — it reads only the bits. */
  def asCodecMp4Payload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          def box(tp: String, body: Array[Byte]): Array[Byte] = {
            val buf = java.nio.ByteBuffer.allocate(8 + body.length)
              .order(java.nio.ByteOrder.BIG_ENDIAN)
            buf.putInt(8 + body.length)
            buf.put(tp.getBytes("US-ASCII"))
            buf.put(body)
            buf.array()
          }
          val audio = docId % 3 == 0
          val entry: Array[Byte] =
            if (audio) {
              val chans = 1 + (docId % 2).toInt
              val rate = Seq(8000, 16000, 22050, 44100, 48000)((docId / 3 % 5).toInt)
              val body = java.nio.ByteBuffer.allocate(28)
                .order(java.nio.ByteOrder.BIG_ENDIAN)
              body.put(new Array[Byte](6)) // reserved
              body.putShort(1) // data_reference_index
              body.put(new Array[Byte](8)) // reserved
              body.putShort(chans.toShort)
              body.putShort(16) // samplesize
              body.putShort(0); body.putShort(0)
              body.putInt(rate << 16) // 16.16
              // esds child: ES → DecoderConfig(oti 0x40 = MPEG-4 audio)
              // → DecoderSpecificInfo carrying the AudioSpecificConfig
              // (AAC LC aot=2, the authoritative rate + channel config)
              val freqIdx = rate match {
                case 48000 => 3; case 44100 => 4; case 22050 => 7
                case 16000 => 8; case _ => 11 // 8000
              }
              val esds = java.nio.ByteBuffer.allocate(28)
                .order(java.nio.ByteOrder.BIG_ENDIAN)
              esds.putInt(0) // FullBox version/flags
              esds.put(0x03.toByte).put(22.toByte) // ES_Descriptor
              esds.putShort(0).put(0.toByte) // ES_ID + flags
              esds.put(0x04.toByte).put(17.toByte) // DecoderConfig
              esds.put(0x40.toByte).put(0x15.toByte)
              esds.put(new Array[Byte](3)) // bufferSizeDB
              esds.putInt(0).putInt(0) // max/avg bitrate
              esds.put(0x05.toByte).put(2.toByte) // DecoderSpecificInfo
              esds.put(((2 << 3) | (freqIdx >> 1)).toByte)
              esds.put((((freqIdx & 1) << 7) | (chans << 3)).toByte)
              box("mp4a", body.array() ++ box("esds", esds.array()))
            } else if (docId % 7 == 0) {
              // identified-only codec: a minimal hvc1 visual entry
              val body = java.nio.ByteBuffer.allocate(78)
                .order(java.nio.ByteOrder.BIG_ENDIAN)
              body.put(new Array[Byte](6)); body.putShort(1)
              body.put(new Array[Byte](70))
              box("hvc1", body.array())
            } else {
              val profile = Seq(66, 77, 100)((docId / 4 % 3).toInt)
              val level = Seq(30, 31, 40, 41)((docId % 4).toInt)
              val wMbs = 20 + (docId % 3).toInt
              val hMbs = 15 + (docId % 2).toInt
              val cropR = (docId % 3).toInt - 1
              val cropB = (docId % 2).toInt
              val w = new SpsBitWriter
              w.bits(profile, 8)
              w.bits(0, 8) // constraint flags
              w.bits(level, 8)
              w.ue(0) // seq_parameter_set_id
              if (profile == 100) {
                w.ue(1) // chroma_format_idc 4:2:0
                w.ue(0); w.ue(0) // bit depths
                w.bit(0) // transform bypass
                w.bit(0) // no scaling matrix
              }
              w.ue(0) // log2_max_frame_num_minus4
              w.ue(0) // pic_order_cnt_type
              w.ue(0) // log2_max_pic_order_cnt_lsb_minus4
              w.ue(1) // max_num_ref_frames
              w.bit(0) // gaps
              w.ue(wMbs - 1)
              w.ue(hMbs - 1)
              w.bit(1) // frame_mbs_only
              w.bit(1) // direct_8x8_inference
              if (cropR > 0 || cropB > 0) {
                w.bit(1)
                w.ue(0); w.ue(cropR); w.ue(0); w.ue(cropB)
              } else w.bit(0)
              w.bit(0) // vui_parameters_present
              val sps = Array(0x67.toByte) ++ insertEmulation(w.stop())
              val pps = Array(0x68, 0xce, 0x38, 0x80).map(_.toByte)
              val avcc = java.nio.ByteBuffer
                .allocate(6 + 2 + sps.length + 1 + 2 + pps.length)
                .order(java.nio.ByteOrder.BIG_ENDIAN)
              avcc.put(1.toByte).put(profile.toByte).put(0.toByte)
                .put(level.toByte)
                .put(0xff.toByte) // lengthSizeMinusOne + reserved
                .put(0xe1.toByte) // numSPS = 1 + reserved
              avcc.putShort(sps.length.toShort).put(sps)
              avcc.put(1.toByte).putShort(pps.length.toShort).put(pps)
              val body = java.nio.ByteBuffer
                .allocate(78).order(java.nio.ByteOrder.BIG_ENDIAN)
              body.put(new Array[Byte](6)); body.putShort(1)
              body.put(new Array[Byte](70))
              box("avc1", body.array() ++ box("avcC", avcc.array()))
            }
          val stsd = {
            val head = java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.BIG_ENDIAN)
            head.putInt(0) // version/flags
            head.putInt(1) // entry_count
            box("stsd", head.array() ++ entry)
          }
          val moov = box("moov", box("trak", box("mdia",
            box("minf", box("stbl", stsd)))))
          val ftypBody = java.nio.ByteBuffer.allocate(8)
            .put("isom".getBytes("US-ASCII")).putInt(512).array()
          (docId, box("ftyp", ftypBody) ++ moov ++
            box("mdat", s"d$docId".getBytes("US-ASCII")))
        }
      }.toDF("doc_id", "payload")
  }

  /** Partition-parallel codec triage ([[extractVideoMeta]] shape). */
  def extractMp4Codec(spark: SparkSession, media: DataFrame): Dataset[Mp4Codec] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          mp4CodecInfo(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  /** Decoded pixel statistics of one uncompressed 24-bit BMP: channel sums
    * plus the TOP-LEFT pixel (the flip-sensitive probe — in a bottom-up
    * BMP it is the first pixel of the LAST stored row, so a row-order or
    * stride bug shows up here even when the order-invariant sums match). */
  final case class BmpPixels(
      doc_id: Long,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      first_r: Int,
      first_g: Int,
      first_b: Int)

  /** REAL pixel decode of an uncompressed 24-bit BMP — pure byte
    * arithmetic, no codec: BITMAPFILEHEADER pixel-array offset (LE32 at
    * 10), BITMAPINFOHEADER width/height (LE32 at 18/22; negative height =
    * top-down row order), 24 bpp, BI_RGB only; rows are BGR triplets
    * padded to a 4-byte stride, stored bottom-up unless top-down. This is
    * the honest notch past header-only parsing; with [[pngPixels]],
    * [[gifPixels]] and [[jpegDecode]] beside it, every container format
    * this layer recognizes is decoded for real. */
  def bmpPixels(b: Array[Byte]): Option[BmpPixels] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bits = le16(28)
    val comp = le32(30)
    if (w <= 0 || h == 0 || le16(26) != 1) return None
    // scope: 24-bit and 32-bit BGR(X) uncompressed, 8-bit paletted
    // uncompressed, and 8-bit RLE8 (bottom-up only, per the format) —
    // the archival BMP variants; anything else quarantines
    val ok = (bits == 24 && comp == 0) || (bits == 32 && comp == 0) ||
      (bits == 8 && comp == 0) || (bits == 8 && comp == 1 && !topDown)
    if (!ok) return None
    // stride math in Long: adversarial widths near 2^31/3 overflow Int,
    // producing a negative stride that defeats the bound check below and
    // crashes the task instead of quarantining the payload; the total-
    // pixel cap also bounds the RLE8 output buffer (a 40-byte header
    // must not command a multi-GiB allocation)
    if (w > (1 << 20) || h > (1 << 20) || w.toLong * h > (1L << 24))
      return None
    if (off < 54 || off > b.length) return None
    // palette (8-bit lanes): 4-byte BGRX entries after the info header
    // (offset math in Long — a near-MaxInt biSize must fail the bound
    // check, not wrap negative past it)
    val palAtL = 14L + le32(14)
    val palN =
      if (bits != 8) 0
      else { val cu = le32(46); if (cu > 0) cu else 256 }
    if (bits == 8 && (palN > 256 || palAtL < 54 ||
      palAtL + 4L * palN > b.length)) return None
    val palAt = palAtL.toInt
    // the pixel INDEX grid (8-bit) or direct rows; stored bottom-up
    // unless topDown
    val idx: Array[Byte] =
      if (bits == 8 && comp == 1) {
        // RLE8: (n,v) runs, 0,0=EOL 0,1=EOB 0,2=delta dx,dy
        // 0,n>=3 = n absolute indexes (padded to even); skipped pixels 0
        val out = new Array[Byte](w * h) // stored-order rows, bottom-up
        var pos = off
        var x = 0
        var y = 0
        var done = false
        while (!done) {
          if (pos + 2 > b.length) return None
          val n = u8(pos); val v = u8(pos + 1); pos += 2
          if (n > 0) {
            // runs must not cross rows; pixels only while rows remain
            // (EOL after the LAST row legitimately leaves y == h with
            // only the EOB escape outstanding)
            if (y >= h || x + n > w) return None
            java.util.Arrays.fill(out, y * w + x, y * w + x + n, v.toByte)
            x += n
          } else v match {
            case 0 => x = 0; y += 1 // EOL
            case 1 => done = true // EOB
            case 2 =>
              if (pos + 2 > b.length) return None
              x += u8(pos); y += u8(pos + 1); pos += 2
              if (x > w || y > h) return None
            case cnt =>
              if (y >= h || x + cnt > w || pos + cnt > b.length) return None
              System.arraycopy(b, pos, out, y * w + x, cnt)
              x += cnt
              pos += cnt + (cnt & 1) // absolute runs pad to even
          }
        }
        out
      } else null
    val bpp = bits / 8
    val strideL = (w.toLong * bpp + 3) / 4 * 4
    if (comp == 0 && off.toLong + strideL * h > b.length) return None
    val stride = strideL.toInt
    var sr = 0L; var sg = 0L; var sb = 0L
    var fr = 0; var fg = 0; var fb = 0
    var y = 0
    while (y < h) { // y = image row, top-based
      val stored = if (topDown) y else h - 1 - y
      val base = off + stored * stride
      var x = 0
      while (x < w) {
        var r = 0; var g = 0; var bb = 0
        if (bits == 8) {
          val p =
            if (comp == 1) idx(stored * w + x) & 0xff
            else u8(base + x)
          if (p >= palN) return None
          bb = u8(palAt + 4 * p); g = u8(palAt + 4 * p + 1)
          r = u8(palAt + 4 * p + 2)
        } else {
          val i = base + x * bpp
          bb = u8(i); g = u8(i + 1); r = u8(i + 2) // BGR(X) on disk
        }
        if (x == 0 && y == 0) { fr = r; fg = g; fb = bb }
        sr += r; sg += g; sb += bb
        x += 1
      }
      y += 1
    }
    Some(BmpPixels(-1L, w, h, sr, sg, sb, fr, fg, fb))
  }

  /** Fixture adapter for the BMP VARIANT matrix beyond the 24-bit lane:
    * 8-bit PALETTED (the GIF-affine-ramp palette, stored as BGRX
    * entries), 8-bit RLE8 (real run/absolute/EOL/EOB encoding), and
    * 32-bit BGRX — the archival classes. The stored pixel is the INDEX
    * (8-bit lanes) or the channel formulas (32-bit), so one oracle
    * covers the palette lookup, the RLE state machine, and the 4-byte
    * stride; OpsSpec pins the lanes against ImageIO's BMP plugin in
    * both directions (including its own BI_RLE8 writer). */
  def asBmpVariantPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val lane = (docId % 3).toInt // 0=pal8, 1=RLE8, 2=BGRX32
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val topDown = lane == 2 && docId % 2 == 0
          def idxAt(x: Int, y: Int): Int =
            ((docId + 7L * x + 13L * y) % 256).toInt
          val palN = 256
          val palBytes =
            if (lane == 2) Array.emptyByteArray
            else (0 until palN).flatMap(i => Seq[Byte](
              ((11 * i + 13) % 256).toByte, // B
              ((3 * i + 7) % 256).toByte, // G
              ((5 * i + 1) % 256).toByte, // R
              0.toByte)).toArray
          val pixelData: Array[Byte] = lane match {
            case 0 => // paletted, bottom-up, 4-byte stride
              val stride = (w + 3) / 4 * 4
              val out = new Array[Byte](stride * h)
              for (sy <- 0 until h; x <- 0 until w)
                out(sy * stride + x) = idxAt(x, h - 1 - sy).toByte
              out
            case 1 => // RLE8 over bottom-up rows: runs + absolute packets
              val out = new java.io.ByteArrayOutputStream()
              for (sy <- 0 until h) {
                val row = Array.tabulate(w)(x => idxAt(x, h - 1 - sy).toByte)
                var x = 0
                while (x < w) {
                  var j = x
                  while (j + 1 < w && row(j + 1) == row(x) && j - x < 254) j += 1
                  val run = j - x + 1
                  if (run >= 2 || w - x == 1) {
                    out.write(run); out.write(row(x))
                    x = j + 1
                  } else {
                    // literal stretch until the next run of ≥3 begins
                    var k = x
                    while (k < w && k - x < 254 &&
                      !(k + 2 < w && row(k) == row(k + 1) &&
                        row(k + 1) == row(k + 2))) k += 1
                    val cnt = k - x
                    if (cnt >= 3) { // absolute packet (RLE8 minimum 3)
                      out.write(0); out.write(cnt)
                      (0 until cnt).foreach(i => out.write(row(x + i)))
                      if ((cnt & 1) == 1) out.write(0) // pad to even
                    } else // 1-2 literals: single-pixel runs are legal
                      (0 until cnt).foreach(i => {
                        out.write(1); out.write(row(x + i))
                      })
                    x = k
                  }
                }
                out.write(0); out.write(0) // EOL
              }
              out.write(0); out.write(1) // EOB
              out.toByteArray
            case _ => // 32-bit BGRX
              val out = new Array[Byte](w * 4 * h)
              for (sy <- 0 until h; x <- 0 until w) {
                val y = if (topDown) sy else h - 1 - sy
                val base = (sy * w + x) * 4
                out(base) = ((docId * 5 + 3L * x + 17L * y) % 256).toByte
                out(base + 1) = ((docId * 3 + 5L * x + 11L * y) % 256).toByte
                out(base + 2) = ((docId + 7L * x + 13L * y) % 256).toByte
                out(base + 3) = 0xff.toByte
              }
              out
          }
          val off = 54 + palBytes.length
          val buf = java.nio.ByteBuffer.allocate(off + pixelData.length)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put('B'.toByte).put('M'.toByte)
          buf.putInt(off + pixelData.length)
          buf.putInt(0)
          buf.putInt(off)
          buf.putInt(40) // BITMAPINFOHEADER
          buf.putInt(w)
          buf.putInt(if (topDown) -h else h)
          buf.putShort(1)
          buf.putShort(if (lane == 2) 32 else 8)
          buf.putInt(if (lane == 1) 1 else 0) // compression
          buf.putInt(pixelData.length)
          buf.putInt(2835); buf.putInt(2835)
          buf.putInt(if (lane == 2) 0 else palN)
          buf.putInt(0)
          buf.put(palBytes)
          buf.put(pixelData)
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter (the image-pixel sibling of [[asWavPayload]]): emit
    * REAL uncompressed 24-bit BMPs whose every pixel derives from the row
    * id — R=(id+7x+13y)%256, G=(3id+5x+11y)%256, B=(5id+3x+17y)%256 over a
    * 4–8 × 3–6 ladder — so an oracle recomputes channel statistics from
    * the formula WITHOUT parsing bytes. Every third row is stored TOP-DOWN
    * (negative height) and widths 4–8 exercise all four stride paddings,
    * so the decoder's flip and stride handling are both under the hash.
    * [[bmpPixels]] never sees the formula — it reads only the byte layout. */
  def asBmpPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val topDown = docId % 3 == 0
          val stride = (w * 3 + 3) / 4 * 4
          val buf = java.nio.ByteBuffer.allocate(54 + stride * h)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put('B'.toByte).put('M'.toByte)
          buf.putInt(54 + stride * h)
          buf.putShort(0).putShort(0)
          buf.putInt(54) // pixel-array offset
          buf.putInt(40) // BITMAPINFOHEADER
          buf.putInt(w)
          buf.putInt(if (topDown) -h else h)
          buf.putShort(1) // planes
          buf.putShort(24) // bpp
          buf.putInt(0) // BI_RGB
          buf.putInt(stride * h)
          buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
          val rows = if (topDown) 0 until h else (h - 1) to 0 by -1
          for (y <- rows; x <- 0 until w) {
            buf.put((((docId * 5 + 3L * x + 17L * y) % 256).toInt).toByte) // B
            buf.put((((docId * 3 + 5L * x + 11L * y) % 256).toInt).toByte) // G
            buf.put((((docId + 7L * x + 13L * y) % 256).toInt).toByte) // R
            if (x == w - 1) (w * 3 until stride).foreach(_ => buf.put(0.toByte))
          }
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Partition-parallel BMP pixel decode ([[extractMeta]] shape):
    * unrecognized/compressed containers are dropped (quarantine route). */
  def extractBmpPixels(spark: SparkSession, media: DataFrame): Dataset[BmpPixels] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          bmpPixels(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  /** Decoded pixel statistics of one non-interlaced 8-bit truecolor PNG —
    * the PNG sibling of [[BmpPixels]]. `first_*` probes the TOP-LEFT pixel:
    * row 0's filter reconstruction feeds it directly, so a filter-reversal
    * bug shows up even when order-invariant sums happen to match. */
  final case class PngPixels(
      doc_id: Long,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      first_r: Int,
      first_g: Int,
      first_b: Int)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL pixel decode of a non-interlaced 8-bit truecolor (color type 2)
    * PNG: chunk walk → IHDR validation → zlib-inflate the concatenated
    * IDAT stream (`java.util.zip.Inflater` — the JDK ships the codec) →
    * reverse the per-row filter (None/Sub/Up/Average/Paeth, bpp=3). This
    * closes the PNG notch of the former decode stub; [[gifPixels]]
    * (from-scratch LZW) and [[jpegDecode]] (from-scratch Huffman+IDCT)
    * close the other two.
    * Unrecognized/odd containers are dropped (quarantine route), never
    * thrown. */
  def pngPixels(b: Array[Byte]): Option[PngPixels] =
    pngDecodeRgb(b).map { case (w, h, rgb) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < rgb.length) {
        sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
        i += 3
      }
      PngPixels(-1L, w, h, sr, sg, sb,
        rgb(0) & 0xff, rgb(1) & 0xff, rgb(2) & 0xff)
    }

  /** Full PNG pixel decode to an interleaved RGB buffer. Scope: the
    * REAL-corpus matrix — color types 0 (grayscale), 2 (truecolor),
    * 3 (palette), 4 (gray+alpha) and 6 (RGBA, alpha dropped); bit depth
    * 8 everywhere plus 1/2/4 for grayscale and palette (sub-byte
    * bit-packed rows — what small-palette web images actually use) plus
    * 16 for types 0/2/4/6 (big-endian sample pairs, downscaled to the
    * high byte — scientific/scanner corpora); BOTH progressive layouts:
    * non-interlaced and Adam7 (each of the seven passes unfilters
    * against its OWN previous scanline, then scatters to the pass
    * lattice). Anything malformed quarantines to None. Total pixels are
    * capped so a hostile header cannot balloon the buffer. */
  private[graft] def pngDecodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val sig = Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)
    if (b.length < 8 + 25 || !sig.indices.forall(i => b(i) == sig(i))) return None
    def be32(i: Int) =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    var off = 8
    var w = -1; var h = -1
    var depth = 0; var colorType = -1; var interlace = 0
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= b.length) {
      val len = be32(off)
      if (len < 0 || off.toLong + 12 + len > b.length) return None
      val tpe = new String(b, off + 4, 4, "US-ASCII")
      tpe match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(off + 8); h = be32(off + 12)
          depth = b(off + 16) & 0xff
          colorType = b(off + 17) & 0xff
          val compression = b(off + 18) & 0xff
          val filterMethod = b(off + 19) & 0xff
          interlace = b(off + 20) & 0xff
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24) ||
            compression != 0 || filterMethod != 0 || interlace > 1) return None
          val depthOk = colorType match {
            case 0 => Seq(1, 2, 4, 8, 16).contains(depth)
            case 3 => Seq(1, 2, 4, 8).contains(depth) // no 16-bit palette
            case 2 | 4 | 6 => depth == 8 || depth == 16
            case _ => false
          }
          if (!depthOk) return None
        case "PLTE" =>
          if (len % 3 != 0 || len > 768) return None
          palette = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len)
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks (tRNS alpha included) skipped
      }
      off += 12 + len // len + type + data + crc
    }
    if (w <= 0 || idat.size() == 0) return None
    if (colorType == 3 && palette == null) return None
    val channels = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
    }
    def rowBytesOf(pw: Int): Int = (pw * channels * depth + 7) / 8
    // Adam7 pass lattice (x0, y0, dx, dy); one full pass if non-interlaced
    val passes: Seq[(Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (math.max(0, (w - x0 + dx - 1) / dx), math.max(0, (h - y0 + dy - 1) / dy))
    }
    val expect = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0L else ph.toLong * (1 + rowBytesOf(pw))
    }.sum
    if (expect <= 0 || expect > Int.MaxValue) return None
    val raw = new Array[Byte](expect.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var total = 0
      while (total < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, total, raw.length - total)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        total += n
      }
      if (total != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    val out = new Array[Byte](w * h * 3)
    val grayScaleUp = if (depth < 8) 255 / ((1 << depth) - 1) else 1
    val bpp = math.max(1, channels * depth / 8)
    var base = 0
    passes.foreach { case pass @ (x0, y0, dx, dy) =>
      val (pw, ph) = passDims(pass)
      if (pw > 0 && ph > 0) {
        val rowBytes = rowBytesOf(pw)
        var prev = new Array[Int](rowBytes)
        var cur = new Array[Int](rowBytes)
        var j = 0
        while (j < ph) {
          val filter = raw(base) & 0xff
          if (filter > 4) return None
          var i = 0
          while (i < rowBytes) {
            val x = raw(base + 1 + i) & 0xff
            val left = if (i >= bpp) cur(i - bpp) else 0
            val up = prev(i)
            val upLeft = if (i >= bpp) prev(i - bpp) else 0
            cur(i) = filter match {
              case 0 => x
              case 1 => (x + left) & 0xff
              case 2 => (x + up) & 0xff
              case 3 => (x + ((left + up) >> 1)) & 0xff
              case 4 => (x + paeth(left, up, upLeft)) & 0xff
            }
            i += 1
          }
          // scatter the reconstructed scanline to the pass lattice
          val py = y0 + j * dy
          var k = 0
          while (k < pw) {
            val px = x0 + k * dx
            val o = (py * w + px) * 3
            // 16-bit samples are big-endian pairs; 8-bit output takes the
            // HIGH byte (the standard 16→8 downscale, what ImageIO's
            // (v >> 8) agrees with — Png16Spec cross-checks)
            def samp(ci: Int): Int = if (depth == 16) cur(ci << 1) else cur(ci)
            colorType match {
              case 2 => // truecolor
                out(o) = samp(k * 3).toByte
                out(o + 1) = samp(k * 3 + 1).toByte
                out(o + 2) = samp(k * 3 + 2).toByte
              case 6 => // RGBA: alpha dropped
                out(o) = samp(k * 4).toByte
                out(o + 1) = samp(k * 4 + 1).toByte
                out(o + 2) = samp(k * 4 + 2).toByte
              case 4 => // gray+alpha
                val g = samp(k * 2).toByte
                out(o) = g; out(o + 1) = g; out(o + 2) = g
              case 0 => // grayscale, possibly bit-packed or 16-bit
                val v =
                  if (depth >= 8) samp(k)
                  else {
                    val bitPos = k * depth
                    ((cur(bitPos >> 3) >> (8 - depth - (bitPos & 7))) &
                      ((1 << depth) - 1)) * grayScaleUp
                  }
                out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
              case 3 => // palette index, possibly bit-packed
                val idx =
                  if (depth == 8) cur(k)
                  else {
                    val bitPos = k * depth
                    (cur(bitPos >> 3) >> (8 - depth - (bitPos & 7))) &
                      ((1 << depth) - 1)
                  }
                if (idx * 3 + 2 >= palette.length) return None
                out(o) = palette(idx * 3)
                out(o + 1) = palette(idx * 3 + 1)
                out(o + 2) = palette(idx * 3 + 2)
            }
            k += 1
          }
          val t = prev; prev = cur; cur = t
          base += 1 + rowBytes
          j += 1
        }
      }
    }
    Some((w, h, out))
  }

  /** Fixture adapter (the PNG sibling of [[asBmpPayload]]): emit REAL
    * zlib-compressed truecolor PNGs whose every pixel derives from the row
    * id — same R/G/B formulas as the BMP fixture over the same 4–8 × 3–6
    * ladder — with the row filter CYCLING through all five types
    * (`(docId + y) % 5`), so None/Sub/Up/Average/Paeth reconstruction are
    * all under the oracle hash. [[pngPixels]] never sees the formula — it
    * reads only bytes. */
  def asPngPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val rowBytes = w * 3
          // raw scanlines from the pixel formula (RGB order, top-down)
          val rows = Array.tabulate(h, rowBytes) { (y, i) =>
            val x = i / 3
            (i % 3 match {
              case 0 => (docId + 7L * x + 13L * y) % 256
              case 1 => (docId * 3 + 5L * x + 11L * y) % 256
              case 2 => (docId * 5 + 3L * x + 17L * y) % 256
            }).toInt
          }
          // apply the cycling filter per row
          val filtered = new Array[Byte](h * (1 + rowBytes))
          for (y <- 0 until h) {
            val f = ((docId + y) % 5).toInt
            val base = y * (1 + rowBytes)
            filtered(base) = f.toByte
            for (i <- 0 until rowBytes) {
              val rawV = rows(y)(i)
              val left = if (i >= 3) rows(y)(i - 3) else 0
              val up = if (y > 0) rows(y - 1)(i) else 0
              val upLeft = if (y > 0 && i >= 3) rows(y - 1)(i - 3) else 0
              val pred = f match {
                case 0 => 0
                case 1 => left
                case 2 => up
                case 3 => (left + up) >> 1
                case 4 => paeth(left, up, upLeft)
              }
              filtered(base + 1 + i) = ((rawV - pred) & 0xff).toByte
            }
          }
          val deflater = new java.util.zip.Deflater()
          deflater.setInput(filtered)
          deflater.finish()
          val zip = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          while (!deflater.finished())
            zip.write(buf, 0, deflater.deflate(buf))
          deflater.end()
          def chunk(tpe: String, body: Array[Byte]): Array[Byte] = {
            val out = java.nio.ByteBuffer.allocate(12 + body.length)
              .order(java.nio.ByteOrder.BIG_ENDIAN)
            out.putInt(body.length)
            out.put(tpe.getBytes("US-ASCII"))
            out.put(body)
            val crc = new java.util.zip.CRC32()
            crc.update(tpe.getBytes("US-ASCII"))
            crc.update(body)
            out.putInt(crc.getValue.toInt)
            out.array()
          }
          val ihdr = java.nio.ByteBuffer.allocate(13)
            .order(java.nio.ByteOrder.BIG_ENDIAN)
            .putInt(w).putInt(h)
            .put(8.toByte) // bit depth
            .put(2.toByte) // truecolor
            .put(0.toByte).put(0.toByte).put(0.toByte)
            .array()
          val payload =
            Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte) ++
              chunk("IHDR", ihdr) ++ chunk("IDAT", zip.toByteArray) ++
              chunk("IEND", Array.empty[Byte])
          (docId, payload)
        }
      }.toDF("doc_id", "payload")
  }

  /** Decoded pixel statistics of one uncompressed TIFF (same shape as
    * the PNG/BMP rows — channel sums + the top-left pixel probe). */
  final case class TiffPixels(
      doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      first_r: Int, first_g: Int, first_b: Int)

  /** REAL TIFF pixel decode (scanner/archival corpora): IFD walk in
    * EITHER byte order, 8-BIT or 16-BIT samples (16-bit keeps the
    * high-order byte, the png16 convention), grayscale (Photometric=1,
    * 1 sample) or RGB (Photometric=2, 3 samples), CHUNKY or SEPARATE
    * (PlanarConfiguration=2) sample layout, STRIP- or TILE-organized
    * data (RowsPerStrip/StripOffsets/StripByteCounts or
    * TileWidth/TileLength/TileOffsets/TileByteCounts, SHORT or LONG
    * typed, inline or out-of-line; edge tiles padded per spec).
    * Compression per segment: NONE (1), LZW (5 — the scanner-pipeline
    * default), Deflate (8 / legacy 32946), PackBits (32773), each
    * optionally under the horizontal-differencing predictor (tag
    * 317 = 2, 8- and 16-bit variants). Anything off-scope — palettes,
    * other depths, other codecs — quarantines to None; total pixels
    * capped. */
  private[graft] def tiffDecodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val (entries, le) = tiffIfd(b).getOrElse(return None)
    def one(tag: Int): Option[Long] = entries.get(tag).flatMap(_.headOption)
    val w = one(256).getOrElse(return None).toInt
    val h = one(257).getOrElse(return None).toInt
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
    val compression = one(259).getOrElse(1L)
    if (compression != 1L && compression != 5L && compression != 8L &&
      compression != 32773L && compression != 32946L) return None
    val predictor = one(317).getOrElse(1L)
    if (predictor != 1L && predictor != 2L) return None
    val photometric = one(262).getOrElse(return None)
    val spp = one(277).getOrElse(1L).toInt
    val ok = photometric match {
      case 0L | 1L => spp == 1 // WhiteIsZero / BlackIsZero grayscale
      case 2L => spp == 3 // RGB
      case 3L => spp == 1 && entries.contains(320) // palette-color
      case _ => false
    }
    if (!ok) return None
    val bitsSeq = entries.getOrElse(258, Seq(8L))
    val bps =
      if (bitsSeq.forall(_ == 8L)) 1
      else if (bitsSeq.forall(_ == 16L) && photometric != 3L) 2
      else return None
    // palette: 3×256 16-bit entries, red block then green then blue;
    // display downscale follows libtiff's CVT: (v·255)/65535
    val colorMap: IndexedSeq[Long] =
      if (photometric != 3L) IndexedSeq.empty
      else entries(320) match {
        case cm if cm.length == 768 => cm.toIndexedSeq
        case _ => return None
      }
    val planar = one(284).getOrElse(1L).toInt
    if (planar != 1 && planar != 2) return None
    val nPlanes = if (planar == 2) spp else 1
    val sppSeg = if (planar == 2) 1 else spp
    val out = new Array[Byte](w * h * 3)

    def decompressSeg(off: Long, cnt: Long, expect: Int): Option[Array[Byte]] = {
      if (off < 0 || cnt < 0 || off + cnt > b.length) return None
      compression match {
        case 1L =>
          if (cnt != expect) None
          else Some(java.util.Arrays.copyOfRange(
            b, off.toInt, (off + cnt).toInt))
        case 5L => tiffLzwDecode(b, off.toInt, cnt.toInt, expect)
        case 32773L => packBitsDecode(b, off.toInt, cnt.toInt, expect)
        case _ => inflateExact(b, off.toInt, cnt.toInt, expect)
      }
    }

    /** Integrate the horizontal predictor in place over `rows` rows of
      * `rowSamples` samples each (sample stride = samples per pixel in
      * THIS segment; 16-bit arithmetic runs on the full sample in file
      * byte order). */
    def predictorFix(seg: Array[Byte], rows: Int, rowSamples: Int): Unit =
      if (predictor == 2L) {
        var r = 0
        while (r < rows) {
          if (bps == 1) {
            val base = r * rowSamples
            var i = sppSeg
            while (i < rowSamples) {
              seg(base + i) =
                ((seg(base + i) + seg(base + i - sppSeg)) & 0xff).toByte
              i += 1
            }
          } else {
            val base = r * rowSamples * 2
            var i = sppSeg
            while (i < rowSamples) {
              val o = base + i * 2
              val po = base + (i - sppSeg) * 2
              val (lo, hi) = (if (le) (o, o + 1) else (o + 1, o))
              val (plo, phi) = (if (le) (po, po + 1) else (po + 1, po))
              val v = (((seg(hi) & 0xff) << 8 | (seg(lo) & 0xff)) +
                ((seg(phi) & 0xff) << 8 | (seg(plo) & 0xff))) & 0xffff
              seg(hi) = (v >> 8).toByte
              seg(lo) = (v & 0xff).toByte
              i += 1
            }
          }
          r += 1
        }
      }

    /** 8-bit value of sample `idx` in a segment (16-bit keeps the
      * high-order byte, read per the file byte order). */
    def sampleAt(seg: Array[Byte], idx: Int): Byte =
      if (bps == 1) seg(idx)
      else if (le) seg(idx * 2 + 1)
      else seg(idx * 2)

    def store(x: Int, y: Int, channel: Int, v: Byte): Unit = {
      val o = (y * w + x) * 3
      photometric match {
        case 0L => // WhiteIsZero: invert (exact on the high-byte scale)
          val g = (255 - (v & 0xff)).toByte
          out(o) = g; out(o + 1) = g; out(o + 2) = g
        case 1L =>
          out(o) = v; out(o + 1) = v; out(o + 2) = v
        case 3L =>
          val idx = v & 0xff
          out(o) = (colorMap(idx) * 255L / 65535L).toByte
          out(o + 1) = (colorMap(256 + idx) * 255L / 65535L).toByte
          out(o + 2) = (colorMap(512 + idx) * 255L / 65535L).toByte
        case _ =>
          out(o + channel) = v
      }
    }

    if (!entries.contains(322)) {
      // STRIP layout; PlanarConfiguration=2 orders all of plane 0's
      // strips first, then plane 1's, … (TIFF 6.0 §14)
      val rps = one(278).getOrElse(h.toLong)
      if (rps <= 0) return None
      val stripsPerPlane = ((h + rps - 1) / rps).toInt
      val offsets = entries.getOrElse(273, return None)
      val counts = entries.getOrElse(279, return None)
      if (offsets.length != stripsPerPlane * nPlanes ||
        counts.length != offsets.length) return None
      var p = 0
      while (p < nPlanes) {
        var s = 0
        while (s < stripsPerPlane) {
          val seg0 = p * stripsPerPlane + s
          val r0 = (s * rps).toInt
          val r1 = math.min(h.toLong, (s + 1) * rps).toInt
          val rowSamples = w * sppSeg
          val expect = (r1 - r0).toLong * rowSamples * bps
          if (expect > Int.MaxValue / 2) return None
          val seg = decompressSeg(offsets(seg0), counts(seg0), expect.toInt)
            .getOrElse(return None)
          predictorFix(seg, r1 - r0, rowSamples)
          var r = r0
          while (r < r1) {
            val rowBase = (r - r0) * rowSamples
            var x = 0
            while (x < w) {
              var c = 0
              while (c < sppSeg) {
                store(x, r, if (planar == 2) p else c,
                  sampleAt(seg, rowBase + x * sppSeg + c))
                c += 1
              }
              x += 1
            }
            r += 1
          }
          s += 1
        }
        p += 1
      }
    } else {
      // TILE layout: row-major tiles, full-size (padded) at the right
      // and bottom edges; planes ordered as with strips
      val tw = one(322).getOrElse(return None).toInt
      val th = one(323).getOrElse(return None).toInt
      if (tw <= 0 || th <= 0 || tw.toLong * th > (1L << 24)) return None
      val across = (w + tw - 1) / tw
      val down = (h + th - 1) / th
      val perPlane = across * down
      val offsets = entries.getOrElse(324, return None)
      val counts = entries.getOrElse(325, return None)
      if (offsets.length != perPlane * nPlanes ||
        counts.length != offsets.length) return None
      val rowSamples = tw * sppSeg
      val expectL = th.toLong * rowSamples * bps
      if (expectL > Int.MaxValue / 2) return None
      val expect = expectL.toInt
      var p = 0
      while (p < nPlanes) {
        var t = 0
        while (t < perPlane) {
          val seg = decompressSeg(
            offsets(p * perPlane + t), counts(p * perPlane + t), expect)
            .getOrElse(return None)
          predictorFix(seg, th, rowSamples)
          val y0 = (t / across) * th
          val x0 = (t % across) * tw
          var r = 0
          while (r < th && y0 + r < h) {
            val rowBase = r * rowSamples
            var x = 0
            while (x < tw && x0 + x < w) {
              var c = 0
              while (c < sppSeg) {
                store(x0 + x, y0 + r, if (planar == 2) p else c,
                  sampleAt(seg, rowBase + x * sppSeg + c))
                c += 1
              }
              x += 1
            }
            r += 1
          }
          t += 1
        }
        p += 1
      }
    }
    Some((w, h, out))
  }

  /** TIFF-variant LZW decode (Compression=5): MSB-first variable-width
    * codes over a FIXED 8-bit alphabet — 256=CLEAR, 257=EOI, first
    * dictionary entry 258 — with the spec's EARLY code-size change: the
    * decoder widens when its next free entry reaches 2^width − 1 (one
    * entry sooner than the GIF-variant rule, because the encoder's table
    * runs one entry ahead). Returns exactly `expected` bytes or None —
    * never throws (quarantine contract). Sibling of the GIF [[lzwDecode]]
    * (LSB-first, variable alphabet, late change). */
  private[graft] def tiffLzwDecode(
      b: Array[Byte], off: Int, len: Int, expected: Int): Option[Array[Byte]] = {
    val Clear = 256
    val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    val stack = new Array[Byte](4097)
    var outN = 0
    var next = 258
    var width = 9
    var prev = -1
    var acc = 0L
    var accBits = 0
    var pos = off
    val end = off + len
    def firstByteOf(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      c.toByte
    }
    while (outN < expected) {
      while (accBits < width) {
        if (pos >= end) return None // truncated stream
        acc = (acc << 8) | (b(pos) & 0xffL)
        accBits += 8
        pos += 1
      }
      val code = ((acc >>> (accBits - width)) & ((1 << width) - 1)).toInt
      accBits -= width
      if (code == Clear) {
        next = 258
        width = 9
        prev = -1
      } else if (code == Eoi) {
        return if (outN == expected) Some(out) else None
      } else if (prev == -1) {
        if (code >= 256) return None // first code must be a literal
        out(outN) = code.toByte; outN += 1
        prev = code
      } else {
        if (code > next || (code == next && next >= 4096)) return None
        var sp = 0
        var c = code
        if (code == next) { stack(sp) = firstByteOf(prev); sp += 1; c = prev }
        while (c >= 258) {
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
        }
        stack(sp) = c.toByte; sp += 1
        if (outN + sp > expected) return None // overlong stream
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = firstByteOf(code)
          next += 1
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  /** TIFF-variant LZW encode (the fixture side of [[tiffLzwDecode]]):
    * MSB-first emission, CLEAR up front and again before the table
    * fills. The encoder widens when its next free entry reaches
    * 2^width — one entry AFTER the decoder's bump point, because the
    * decoder's table lags the encoder's by exactly one entry at read
    * time (the same one-apart pairing as the GIF encoder/decoder, both
    * shifted one entry earlier = the TIFF early change). */
  private[graft] def tiffLzwEncode(data: Array[Byte]): Array[Byte] = {
    val bytes = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    var width = 9
    def emit(code: Int): Unit = {
      acc = (acc << width) | code
      accBits += width
      while (accBits >= 8) {
        bytes.write(((acc >>> (accBits - 8)) & 0xff).toInt)
        accBits -= 8
      }
    }
    var dict = scala.collection.mutable.LongMap.empty[Int]
    var next = 258
    emit(256) // CLEAR opens the stream (TIFF 6.0 §13)
    var prev = -1
    var i = 0
    while (i < data.length) {
      val k = data(i) & 0xff
      if (prev == -1) prev = k
      else {
        val key = (prev.toLong << 8) | k
        dict.get(key) match {
          case Some(c) => prev = c
          case None =>
            emit(prev)
            dict(key) = next
            next += 1
            if (next == (1 << width) && width < 12) width += 1
            if (next >= 4093) { // CLEAR before the table can overflow
              emit(256)
              dict = scala.collection.mutable.LongMap.empty[Int]
              next = 258
              width = 9
            }
            prev = k
        }
      }
      i += 1
    }
    if (prev != -1) emit(prev)
    emit(257) // EOI
    if (accBits > 0) bytes.write(((acc << (8 - accBits)) & 0xff).toInt)
    bytes.toByteArray
  }

  /** PackBits decode (Compression=32773, the Macintosh RLE): n in
    * [0,127] copies n+1 literals, n in [-127,-1] repeats the next byte
    * 1−n times, −128 is a no-op. Returns exactly `expected` bytes or
    * None. */
  private[graft] def packBitsDecode(
      b: Array[Byte], off: Int, len: Int, expected: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expected)
    var pos = off
    val end = off + len
    var o = 0
    while (o < expected) {
      if (pos >= end) return None
      val n = b(pos); pos += 1
      if (n >= 0) {
        val cnt = n + 1
        if (pos + cnt > end || o + cnt > expected) return None
        System.arraycopy(b, pos, out, o, cnt)
        pos += cnt; o += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        if (pos >= end || o + cnt > expected) return None
        java.util.Arrays.fill(out, o, o + cnt, b(pos))
        pos += 1; o += cnt
      }
    }
    Some(out)
  }

  /** PackBits encode of ONE row (TIFF packs rows separately): runs of
    * ≥2 become repeat packets, everything else literal packets of up to
    * 128 bytes broken before any run of ≥3. */
  private[graft] def packBitsEncode(row: Array[Byte], from: Int, until: Int)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = from
    while (i < until) {
      var j = i
      while (j + 1 < until && row(j + 1) == row(i) && j - i < 127) j += 1
      val runLen = j - i + 1
      if (runLen >= 2) {
        out.write(1 - runLen)
        out.write(row(i))
        i = j + 1
      } else {
        val start = i
        var k = i
        while (k < until && k - start < 128 &&
          !(k + 2 < until && row(k) == row(k + 1) && row(k + 1) == row(k + 2)))
          k += 1
        out.write(k - start - 1)
        out.write(row, start, k - start)
        i = k
      }
    }
    out.toByteArray
  }

  /** Zlib inflate to exactly `expected` bytes (TIFF Compression=8 /
    * legacy 32946), or None on malformed/short/overlong streams. */
  private def inflateExact(
      b: Array[Byte], off: Int, len: Int, expected: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, off, len)
      val out = new Array[Byte](expected)
      var o = 0
      while (o < expected && !inf.finished()) {
        val n = inf.inflate(out, o, expected - o)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        o += n
      }
      if (o == expected) Some(out) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  def tiffPixels(b: Array[Byte]): Option[TiffPixels] =
    tiffDecodeRgb(b).map { case (w, h, rgb) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < rgb.length) {
        sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
        i += 3
      }
      TiffPixels(-1L, w, h, sr, sg, sb,
        rgb(0) & 0xff, rgb(1) & 0xff, rgb(2) & 0xff)
    }

  /** Partition-parallel TIFF decode ([[extractBmpPixels]] shape). */
  def extractTiffPixels(spark: SparkSession, media: DataFrame): Dataset[TiffPixels] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          tiffPixels(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  /** Shared IFD entry writers for the TIFF fixture adapters (endianness
    * comes from the caller's ByteBuffer); one definition for the four
    * adapters, so an IFD-layout fix can never skew a single lane. */
  private final class TiffIfdWriter(buf: java.nio.ByteBuffer) {
    def entryShort1(tag: Int, v: Int): Unit = {
      buf.putShort(tag.toShort); buf.putShort(3); buf.putInt(1)
      buf.putShort(v.toShort); buf.putShort(0)
    }
    def entryLong1(tag: Int, v: Int): Unit = {
      buf.putShort(tag.toShort); buf.putShort(4); buf.putInt(1)
      buf.putInt(v)
    }
    def entryArr(tag: Int, tpe: Int, n: Int, off: Int): Unit = {
      buf.putShort(tag.toShort); buf.putShort(tpe.toShort)
      buf.putInt(n); buf.putInt(off)
    }
  }

  /** One zlib-deflated TIFF segment (the Compression=8 fixture side). */
  private def deflateSegment(seg: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(seg); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) bos.write(tmp, 0, d.deflate(tmp))
    d.end()
    bos.toByteArray
  }

  /** Fixture adapter emitting REAL uncompressed TIFFs over the shared
    * pixel-formula ladder: byte order alternates by row id (II/MM),
    * every third doc is grayscale (Photometric=1; the gray value is the
    * R-channel formula), the rest RGB, and RowsPerStrip=2 forces
    * multi-strip layouts with out-of-line offset/count arrays — so the
    * decoder's endian handling, strip walk, and inline-vs-offset value
    * placement all sit under the oracle hash. */
  def asTiffPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val le = docId % 2 == 0
          val gray = docId % 3 == 0
          val spp = if (gray) 1 else 3
          val rps = 2
          val nStrips = (h + rps - 1) / rps
          val ifdOff = 8
          val ifdSize = 2 + 9 * 12 + 4
          var ext = ifdOff + ifdSize
          val bitsOff = ext
          if (!gray) ext += 6 // 3 SHORTs out of line
          val soOff = ext
          if (nStrips > 1) ext += 4 * nStrips
          val scOff = ext
          if (nStrips > 1) ext += 4 * nStrips
          val dataOff = ext
          val stripRows = (0 until nStrips).map(s =>
            math.min(h, (s + 1) * rps) - s * rps)
          val stripBytes = stripRows.map(_ * w * spp)
          val stripOffs = stripBytes.scanLeft(dataOff)(_ + _).init
          val buf = java.nio.ByteBuffer.allocate(dataOff + stripBytes.sum)
            .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN
                   else java.nio.ByteOrder.BIG_ENDIAN)
          buf.put((if (le) "II" else "MM").getBytes("US-ASCII"))
          buf.putShort(42)
          buf.putInt(ifdOff)
          buf.putShort(9) // entry count
          val ifdw = new TiffIfdWriter(buf)
          import ifdw._
          entryShort1(256, w)
          entryShort1(257, h)
          if (gray) entryShort1(258, 8) else entryArr(258, 3, 3, bitsOff)
          entryShort1(259, 1)
          entryShort1(262, if (gray) 1 else 2)
          if (nStrips > 1) entryArr(273, 4, nStrips, soOff)
          else entryLong1(273, stripOffs.head)
          entryShort1(277, spp)
          entryShort1(278, rps)
          if (nStrips > 1) entryArr(279, 4, nStrips, scOff)
          else entryLong1(279, stripBytes.head)
          buf.putInt(0) // no next IFD
          if (!gray) { buf.putShort(8); buf.putShort(8); buf.putShort(8) }
          if (nStrips > 1) {
            stripOffs.foreach(buf.putInt)
            stripBytes.foreach(buf.putInt)
          }
          for (y <- 0 until h; x <- 0 until w) {
            val r = ((docId + 7L * x + 13L * y) % 256).toInt
            if (gray) buf.put(r.toByte)
            else {
              buf.put(r.toByte)
              buf.put(((docId * 3 + 5L * x + 11L * y) % 256).toByte)
              buf.put(((docId * 5 + 3L * x + 17L * y) % 256).toByte)
            }
          }
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter emitting COMPRESSED TIFFs over the shared pixel
    * formulas — the codec matrix real scanner corpora ship (LZW is the
    * Compression=5 default of scanner pipelines; PackBits and Deflate
    * follow): docId % 7 cycles LZW / PackBits / Deflate / uncompressed,
    * and LZW/Deflate rows with even docId additionally difference under
    * the horizontal predictor (tag 317 = 2). Byte order still alternates
    * II/MM, every third doc is grayscale, and RowsPerStrip=2 forces
    * multi-strip layouts, so endianness × codec × predictor × strip walk
    * all sit under one oracle hash. */
  def asTiffCompressedPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val le = docId % 2 == 0
          val gray = docId % 3 == 0
          val spp = if (gray) 1 else 3
          val rps = 2
          val nStrips = (h + rps - 1) / rps
          val comp = (docId % 7).toInt match {
            case 0 | 1 => 5
            case 2 | 3 => 32773
            case 4 | 5 => 8
            case _ => 1
          }
          val predictor =
            if ((comp == 5 || comp == 8) && docId % 2 == 0) 2 else 1
          val rowBytes = w * spp
          def rawRow(y: Int): Array[Byte] = Array.tabulate(rowBytes) { i =>
            val x = i / spp
            (if (gray) (docId + 7L * x + 13L * y) % 256
             else i % 3 match {
               case 0 => (docId + 7L * x + 13L * y) % 256
               case 1 => (docId * 3 + 5L * x + 11L * y) % 256
               case 2 => (docId * 5 + 3L * x + 17L * y) % 256
             }).toByte
          }
          val stripData: IndexedSeq[Array[Byte]] = (0 until nStrips).map { s =>
            val r0 = s * rps
            val r1 = math.min(h, (s + 1) * rps)
            val rows = (r0 until r1).map { y =>
              val row = rawRow(y)
              if (predictor == 2) {
                // difference right-to-left: sample − previous pixel's
                // same channel (the decoder integrates it back)
                var i = rowBytes - 1
                while (i >= spp) {
                  row(i) = ((row(i) - row(i - spp)) & 0xff).toByte
                  i -= 1
                }
              }
              row
            }
            comp match {
              case 5 => tiffLzwEncode(rows.reduce(_ ++ _))
              case 32773 =>
                rows.map(r => packBitsEncode(r, 0, r.length)).reduce(_ ++ _)
              case 8 => deflateSegment(rows.reduce(_ ++ _))
              case _ => rows.reduce(_ ++ _)
            }
          }
          val nEntries = if (predictor == 2) 10 else 9
          val ifdOff = 8
          val ifdSize = 2 + nEntries * 12 + 4
          var ext = ifdOff + ifdSize
          val bitsOff = ext
          if (!gray) ext += 6 // 3 SHORTs out of line
          val soOff = ext
          if (nStrips > 1) ext += 4 * nStrips
          val scOff = ext
          if (nStrips > 1) ext += 4 * nStrips
          val dataOff = ext
          val stripBytes = stripData.map(_.length)
          val stripOffs = stripBytes.scanLeft(dataOff)(_ + _).init
          val buf = java.nio.ByteBuffer.allocate(dataOff + stripBytes.sum)
            .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN
                   else java.nio.ByteOrder.BIG_ENDIAN)
          buf.put((if (le) "II" else "MM").getBytes("US-ASCII"))
          buf.putShort(42)
          buf.putInt(ifdOff)
          buf.putShort(nEntries.toShort)
          val ifdw = new TiffIfdWriter(buf)
          import ifdw._
          entryShort1(256, w)
          entryShort1(257, h)
          if (gray) entryShort1(258, 8) else entryArr(258, 3, 3, bitsOff)
          entryShort1(259, comp)
          entryShort1(262, if (gray) 1 else 2)
          if (nStrips > 1) entryArr(273, 4, nStrips, soOff)
          else entryLong1(273, stripOffs.head)
          entryShort1(277, spp)
          entryShort1(278, rps)
          if (nStrips > 1) entryArr(279, 4, nStrips, scOff)
          else entryLong1(279, stripBytes.head)
          if (predictor == 2) entryShort1(317, 2)
          buf.putInt(0) // no next IFD
          if (!gray) { buf.putShort(8); buf.putShort(8); buf.putShort(8) }
          if (nStrips > 1) {
            stripOffs.foreach(buf.putInt)
            stripBytes.foreach(buf.putInt)
          }
          stripData.foreach(buf.put)
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter for PALETTE-COLOR (Photometric=3 + ColorMap, the
    * GIF-era archival class) and WHITE-IS-ZERO (Photometric=0, the
    * fax/scan convention) TIFFs, alternating by row id and cycling the
    * codec like [[asTiffCompressedPayload]]. The palette is the same
    * affine ramp the GIF fixtures use (`(5i+1, 3i+7, 11i+13) mod 256`,
    * scaled ×257 into TIFF's 16-bit map entries — the exact 8→16-bit
    * expansion) and the stored pixel is
    * the INDEX; the WhiteIsZero lane stores the INVERTED formula value
    * so both lanes decode to the shared pixel formulas and one oracle
    * covers the map lookup, the inversion, and the codecs. */
  def asTiffPalettePayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val palette = docId % 2 == 0
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val le = (docId / 8) % 2 == 0
          val comp = ((docId / 2) % 4).toInt match {
            case 1 => 5
            case 2 => 32773
            case 3 => 8
            case _ => 1
          }
          val rps = 2
          val nStrips = (h + rps - 1) / rps
          def pix(x: Int, y: Int): Int = {
            val f = ((docId + 7L * x + 13L * y) % 256).toInt
            if (palette) f else 255 - f // index, or inverted gray
          }
          def compress(rows: Seq[Array[Byte]]): Array[Byte] = comp match {
            case 5 => tiffLzwEncode(rows.reduce(_ ++ _))
            case 32773 =>
              rows.map(r => packBitsEncode(r, 0, r.length)).reduce(_ ++ _)
            case 8 => deflateSegment(rows.reduce(_ ++ _))
            case _ => rows.reduce(_ ++ _)
          }
          val segments = (0 until nStrips).map { st =>
            compress((st * rps until math.min(h, (st + 1) * rps))
              .map(y => Array.tabulate(w)(x => pix(x, y).toByte)))
          }
          val nSegs = segments.length
          val nEntries = if (palette) 10 else 9
          val ifdOff = 8
          val ifdSize = 2 + nEntries * 12 + 4
          var ext = ifdOff + ifdSize
          val soOff = ext
          if (nSegs > 1) ext += 4 * nSegs
          val scOff = ext
          if (nSegs > 1) ext += 4 * nSegs
          val cmOff = ext
          if (palette) ext += 768 * 2
          val dataOff = ext
          val segBytes = segments.map(_.length)
          val segOffs = segBytes.scanLeft(dataOff)(_ + _).init
          val buf = java.nio.ByteBuffer.allocate(dataOff + segBytes.sum)
            .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN
                   else java.nio.ByteOrder.BIG_ENDIAN)
          buf.put((if (le) "II" else "MM").getBytes("US-ASCII"))
          buf.putShort(42)
          buf.putInt(ifdOff)
          buf.putShort(nEntries.toShort)
          val ifdw = new TiffIfdWriter(buf)
          import ifdw._
          entryShort1(256, w)
          entryShort1(257, h)
          entryShort1(258, 8)
          entryShort1(259, comp)
          entryShort1(262, if (palette) 3 else 0)
          if (nSegs > 1) entryArr(273, 4, nSegs, soOff)
          else entryLong1(273, segOffs.head)
          entryShort1(277, 1)
          entryShort1(278, rps)
          if (nSegs > 1) entryArr(279, 4, nSegs, scOff)
          else entryLong1(279, segBytes.head)
          if (palette) entryArr(320, 3, 768, cmOff)
          buf.putInt(0) // no next IFD
          if (nSegs > 1) {
            segOffs.foreach(buf.putInt)
            segBytes.foreach(buf.putInt)
          }
          if (palette) {
            // 16-bit map entries: the GIF affine ramp × 257 (the exact
            // 8→16-bit expansion, so the libtiff CVT downscale — and any
            // reasonable rounding — recovers the ramp value exactly)
            (0 until 256).foreach(i =>
              buf.putShort((((5 * i + 1) % 256) * 257).toShort))
            (0 until 256).foreach(i =>
              buf.putShort((((3 * i + 7) % 256) * 257).toShort))
            (0 until 256).foreach(i =>
              buf.putShort((((11 * i + 13) % 256) * 257).toShort))
          }
          segments.foreach(buf.put)
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter for the DEEP TIFF matrix — the remaining scanner
    * classes beyond [[asTiffCompressedPayload]]: 16-BIT samples (high
    * byte = the shared pixel formula, low byte an independent
    * deterministic function so a wrong-byte read breaks the hash, the
    * png16 convention), TILED layouts (16×16 tiles with padded edges on
    * a larger canvas so multi-tile stitching is exercised), and
    * PlanarConfiguration=2 (separate planes, plane-major segments).
    * docId % 4 picks the layout lane (striped-16bit / tiled-8bit /
    * planar-8bit / tiled-16bit-planar), (docId/4) % 4 the codec (none /
    * LZW / PackBits / Deflate), (docId/2) % 2 the byte order, and LZW or
    * Deflate rows with (docId/8) % 2 == 0 add the predictor — so depth ×
    * tiling × planarity × codec × endianness × predictor all sit under
    * one oracle hash. */
  def asTiffDeepPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val lane = (docId % 4).toInt
          val tiled = lane == 1 || lane == 3
          val bps = if (lane == 0 || lane == 3) 2 else 1
          val planar = if (lane == 2 || lane == 3) 2 else 1
          val w = (if (tiled) 20 else 4) + (docId % 5).toInt
          val h = (if (tiled) 17 else 3) + (docId % 3).toInt
          val le = (docId / 2) % 2 == 0
          val gray = docId % 3 == 0
          val spp = if (gray) 1 else 3
          val comp = ((docId / 4) % 4).toInt match {
            case 1 => 5
            case 2 => 32773
            case 3 => 8
            case _ => 1
          }
          val predictor =
            if ((comp == 5 || comp == 8) && (docId / 8) % 2 == 0) 2 else 1
          val nPlanes = if (planar == 2) spp else 1
          val sppSeg = if (planar == 2) 1 else spp
          def hi(x: Int, y: Int, c: Int): Int = (c match {
            case 0 => (docId + 7L * x + 13L * y) % 256
            case 1 => (docId * 3 + 5L * x + 11L * y) % 256
            case _ => (docId * 5 + 3L * x + 17L * y) % 256
          }).toInt
          def lo(x: Int, y: Int, c: Int): Int =
            ((docId + 3L * (x + 7L * y + 11L * c)) % 256).toInt
          // raw samples of one segment row: plane p (chunky: all
          // channels), image row y, columns x0 until x1 (tile pads past
          // w replicate the edge pixel; pad rows below h reuse row h-1 —
          // any deterministic fill works, the decoder discards pads)
          def rowBytes(p: Int, y0: Int, x0: Int, cols: Int): Array[Byte] = {
            val outB = new Array[Byte](cols * sppSeg * bps)
            val y = math.min(y0, h - 1)
            var i = 0
            var xi = 0
            while (xi < cols) {
              val x = math.min(x0 + xi, w - 1)
              var c = 0
              while (c < sppSeg) {
                val ch = if (planar == 2) p else c
                val hv = hi(x, y, ch)
                if (bps == 1) { outB(i) = hv.toByte; i += 1 }
                else {
                  val lv = lo(x, y, ch)
                  if (le) { outB(i) = lv.toByte; outB(i + 1) = hv.toByte }
                  else { outB(i) = hv.toByte; outB(i + 1) = lv.toByte }
                  i += 2
                }
                c += 1
              }
              xi += 1
            }
            outB
          }
          def diffRow(row: Array[Byte]): Array[Byte] = {
            if (predictor != 2) return row
            val samples = row.length / bps
            if (bps == 1) {
              var i = samples - 1
              while (i >= sppSeg) {
                row(i) = ((row(i) - row(i - sppSeg)) & 0xff).toByte
                i -= 1
              }
            } else {
              var i = samples - 1
              while (i >= sppSeg) {
                val o = i * 2; val po = (i - sppSeg) * 2
                val (loI, hiI) = if (le) (o, o + 1) else (o + 1, o)
                val (ploI, phiI) = if (le) (po, po + 1) else (po + 1, po)
                val v = ((((row(hiI) & 0xff) << 8) | (row(loI) & 0xff)) -
                  (((row(phiI) & 0xff) << 8) | (row(ploI) & 0xff))) & 0xffff
                row(hiI) = (v >> 8).toByte
                row(loI) = (v & 0xff).toByte
                i -= 1
              }
            }
            row
          }
          def compress(rows: Seq[Array[Byte]]): Array[Byte] = comp match {
            case 5 => tiffLzwEncode(rows.reduce(_ ++ _))
            case 32773 =>
              rows.map(r => packBitsEncode(r, 0, r.length)).reduce(_ ++ _)
            case 8 => deflateSegment(rows.reduce(_ ++ _))
            case _ => rows.reduce(_ ++ _)
          }
          val rps = 2
          val (tw, th) = (16, 16)
          val segments: IndexedSeq[Array[Byte]] =
            if (!tiled) {
              val stripsPerPlane = (h + rps - 1) / rps
              for {
                p <- 0 until nPlanes
                s <- 0 until stripsPerPlane
              } yield compress((s * rps until math.min(h, (s + 1) * rps))
                .map(y => diffRow(rowBytes(p, y, 0, w))))
            } else {
              val across = (w + tw - 1) / tw
              val down = (h + th - 1) / th
              for {
                p <- 0 until nPlanes
                t <- 0 until across * down
              } yield {
                val y0 = (t / across) * th
                val x0 = (t % across) * tw
                compress((0 until th)
                  .map(r => diffRow(rowBytes(p, y0 + r, x0, tw))))
              }
            }
          val nSegs = segments.length
          // ascending tag order: 256,257,258,259,262,[273],277,[278],
          // [279],[284],[317],[322..325]
          val nEntries = 6 + (if (tiled) 4 else 3) +
            (if (planar == 2) 1 else 0) + (if (predictor == 2) 1 else 0)
          val ifdOff = 8
          val ifdSize = 2 + nEntries * 12 + 4
          var ext = ifdOff + ifdSize
          val bitsOff = ext
          if (!gray) ext += 6 // 3 SHORTs out of line
          val soOff = ext
          if (nSegs > 1) ext += 4 * nSegs
          val scOff = ext
          if (nSegs > 1) ext += 4 * nSegs
          val dataOff = ext
          val segBytes = segments.map(_.length)
          val segOffs = segBytes.scanLeft(dataOff)(_ + _).init
          val buf = java.nio.ByteBuffer.allocate(dataOff + segBytes.sum)
            .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN
                   else java.nio.ByteOrder.BIG_ENDIAN)
          buf.put((if (le) "II" else "MM").getBytes("US-ASCII"))
          buf.putShort(42)
          buf.putInt(ifdOff)
          buf.putShort(nEntries.toShort)
          val ifdw = new TiffIfdWriter(buf)
          import ifdw._
          entryShort1(256, w)
          entryShort1(257, h)
          if (gray) entryShort1(258, 8 * bps)
          else entryArr(258, 3, 3, bitsOff)
          entryShort1(259, comp)
          entryShort1(262, if (gray) 1 else 2)
          if (!tiled) {
            if (nSegs > 1) entryArr(273, 4, nSegs, soOff)
            else entryLong1(273, segOffs.head)
          }
          entryShort1(277, spp)
          if (!tiled) {
            entryShort1(278, rps)
            if (nSegs > 1) entryArr(279, 4, nSegs, scOff)
            else entryLong1(279, segBytes.head)
          }
          if (planar == 2) entryShort1(284, 2)
          if (predictor == 2) entryShort1(317, 2)
          if (tiled) {
            entryShort1(322, tw)
            entryShort1(323, th)
            if (nSegs > 1) entryArr(324, 4, nSegs, soOff)
            else entryLong1(324, segOffs.head)
            if (nSegs > 1) entryArr(325, 4, nSegs, scOff)
            else entryLong1(325, segBytes.head)
          }
          buf.putInt(0) // no next IFD
          if (!gray) {
            val v = (8 * bps).toShort
            buf.putShort(v); buf.putShort(v); buf.putShort(v)
          }
          if (nSegs > 1) {
            segOffs.foreach(buf.putInt)
            segBytes.foreach(buf.putInt)
          }
          segments.foreach(buf.put)
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter for 16-BIT truecolor PNGs (the deep-sample sibling
    * of [[asPngPayload]] — scientific/scanner corpora): every sample is
    * a big-endian pair whose HIGH byte follows the 8-bit fixture's pixel
    * formula and whose LOW byte is a DIFFERENT deterministic function
    * (`(docId + 3·si) % 256`), so a decoder that reads the wrong byte of
    * the pair (endianness, stride) breaks the oracle hash instead of
    * passing by luck. The row filter cycles through all five types over
    * the 6-byte pixel stride. */
  def asPng16Payload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val rowBytes = w * 6 // 3 channels × 2 bytes
          val rows = Array.tabulate(h, rowBytes) { (y, i) =>
            val si = i >> 1 // sample index within the row
            val x = si / 3
            val hi = (si % 3 match {
              case 0 => (docId + 7L * x + 13L * y) % 256
              case 1 => (docId * 3 + 5L * x + 11L * y) % 256
              case 2 => (docId * 5 + 3L * x + 17L * y) % 256
            }).toInt
            if ((i & 1) == 0) hi else ((docId + 3L * si) % 256).toInt
          }
          val bpp = 6
          val filtered = new Array[Byte](h * (1 + rowBytes))
          for (y <- 0 until h) {
            val f = ((docId + y) % 5).toInt
            val base = y * (1 + rowBytes)
            filtered(base) = f.toByte
            for (i <- 0 until rowBytes) {
              val rawV = rows(y)(i)
              val left = if (i >= bpp) rows(y)(i - bpp) else 0
              val up = if (y > 0) rows(y - 1)(i) else 0
              val upLeft = if (y > 0 && i >= bpp) rows(y - 1)(i - bpp) else 0
              val pred = f match {
                case 0 => 0
                case 1 => left
                case 2 => up
                case 3 => (left + up) >> 1
                case 4 => paeth(left, up, upLeft)
              }
              filtered(base + 1 + i) = ((rawV - pred) & 0xff).toByte
            }
          }
          val deflater = new java.util.zip.Deflater()
          deflater.setInput(filtered)
          deflater.finish()
          val zip = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          while (!deflater.finished())
            zip.write(buf, 0, deflater.deflate(buf))
          deflater.end()
          def chunk(tpe: String, body: Array[Byte]): Array[Byte] = {
            val out = java.nio.ByteBuffer.allocate(12 + body.length)
              .order(java.nio.ByteOrder.BIG_ENDIAN)
            out.putInt(body.length)
            out.put(tpe.getBytes("US-ASCII"))
            out.put(body)
            val crc = new java.util.zip.CRC32()
            crc.update(tpe.getBytes("US-ASCII"))
            crc.update(body)
            out.putInt(crc.getValue.toInt)
            out.array()
          }
          val ihdr = java.nio.ByteBuffer.allocate(13)
            .order(java.nio.ByteOrder.BIG_ENDIAN)
            .putInt(w).putInt(h)
            .put(16.toByte) // bit depth
            .put(2.toByte) // truecolor
            .put(0.toByte).put(0.toByte).put(0.toByte)
            .array()
          val payload =
            Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte) ++
              chunk("IHDR", ihdr) ++ chunk("IDAT", zip.toByteArray) ++
              chunk("IEND", Array.empty[Byte])
          (docId, payload)
        }
      }.toDF("doc_id", "payload")
  }

  /** Partition-parallel PNG pixel decode ([[extractBmpPixels]] shape). */
  def extractPngPixels(spark: SparkSession, media: DataFrame): Dataset[PngPixels] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          pngPixels(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  /** Video frame sampling plumbing: each payload expands to `n` evenly-
    * spaced frame rows (frame index, presentation timestamp at `fps`, and a
    * per-frame fingerprint). The row expansion is a codegen'd posexplode —
    * no shuffle, scales linearly with payload count × n. The per-frame
    * fingerprint md5(payload ∥ ':' ∥ idx) STANDS IN for the decoded frame
    * (no video codec in this container): a real decoder replaces that one
    * expression with a mapPartitions batch decode, exactly like
    * [[decodeStub]] — schema, partitioning, and expansion shape stay. */
  def sampleFrames(media: DataFrame, n: Int, fps: Double = 1.0): DataFrame =
    media.select(col("doc_id"), col("payload"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("pos", "frame_idx")))
      .select(
        col("doc_id"),
        col("frame_idx"),
        round(col("frame_idx") / fps, 3).as("frame_ts"),
        md5(concat(col("payload"),
          encode(concat(lit(":"), col("frame_idx").cast("string")), "UTF-8")))
          .as("frame_sig"))

  // ------------------------------------------------------------------ GIF

  /** Decoded pixel statistics of one non-interlaced palettized GIF — the
    * GIF sibling of [[BmpPixels]]/[[PngPixels]]. LZW is the codec, and it
    * ships nowhere: this is a from-scratch decoder. */
  final case class GifPixels(
      doc_id: Long,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      first_r: Int,
      first_g: Int,
      first_b: Int)

  /** GIF-variant LZW decode: LSB-first variable-width codes (starting at
    * `minCodeSize`+1, growing to 12 as the dictionary fills), CLEAR resets
    * the dictionary, END terminates; the KwKwK case (`code == next`) is
    * the classic self-referential entry. Returns exactly `expected`
    * indices or None — never throws (quarantine contract). */
  private[graft] def lzwDecode(
      minCodeSize: Int, data: Array[Byte], expected: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    val stack = new Array[Byte](4097)
    var outN = 0
    var next = end + 1
    var width = minCodeSize + 1
    var prev = -1
    var acc = 0L
    var accBits = 0
    var pos = 0
    def firstByteOf(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    while (outN < expected) {
      while (accBits < width) {
        if (pos >= data.length) return None // truncated stream
        acc |= (data(pos) & 0xffL) << accBits
        accBits += 8
        pos += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width
      accBits -= width
      if (code == clear) {
        next = end + 1
        width = minCodeSize + 1
        prev = -1
      } else if (code == end) {
        return if (outN == expected) Some(out) else None
      } else if (prev == -1) {
        if (code >= clear) return None // first code must be a literal
        out(outN) = code.toByte; outN += 1
        prev = code
      } else {
        if (code > next || (code == next && next >= 4096)) return None
        // expand `code` (or, for KwKwK, prev + firstChar(prev)) via stack
        var sp = 0
        var c = code
        if (code == next) { stack(sp) = firstByteOf(prev); sp += 1; c = prev }
        while (c >= clear) {
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
        }
        stack(sp) = c.toByte; sp += 1
        if (outN + sp > expected) return None // overlong stream
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = firstByteOf(code)
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  /** GIF-variant LZW encode (the fixture side): real dictionary build
    * (prefix, byte) → code, CLEAR emitted up front and whenever the
    * dictionary fills. Width bumps one dictionary-add AFTER the decoder's
    * bump point (`next == (1<<width) + 1`): the decoder's table lags the
    * encoder's by exactly one entry at read time. */
  private[graft] def lzwEncode(minCodeSize: Int, indices: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val bytes = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    var width = minCodeSize + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += width
      while (accBits >= 8) {
        bytes.write((acc & 0xff).toInt)
        acc >>>= 8
        accBits -= 8
      }
    }
    var dict = scala.collection.mutable.LongMap.empty[Int]
    var next = end + 1
    emit(clear)
    if (indices.nonEmpty) {
      var prefix: Int = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xff
        val key = (prefix.toLong << 8) | k
        dict.get(key) match {
          case Some(code) => prefix = code
          case None =>
            emit(prefix)
            if (next < 4096) {
              dict(key) = next
              next += 1
              if (next == (1 << width) + 1 && width < 12) width += 1
            } else { // table full: reset (decoder mirrors on CLEAR)
              emit(clear)
              dict = scala.collection.mutable.LongMap.empty[Int]
              next = end + 1
              width = minCodeSize + 1
            }
            prefix = k
        }
        i += 1
      }
      emit(prefix)
    }
    emit(end)
    if (accBits > 0) bytes.write((acc & 0xff).toInt)
    bytes.toByteArray
  }

  /** REAL pixel decode of a non-interlaced GIF87a/89a with a global color
    * table: logical-screen walk, extension skip, image descriptor, LZW
    * decompression of the palette indices, palette lookup. Closes the GIF
    * notch of the decode stub ([[jpegDecode]] closes the last one).
    * Unrecognized/odd containers are dropped. */
  def gifPixels(b: Array[Byte]): Option[GifPixels] = {
    if (b.length < 14) return None
    val hdr = new String(b, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    val packed = b(10) & 0xff
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    var off = 13
    if (off + 3 * gctSize > b.length) return None
    val gct = off
    off += 3 * gctSize
    // walk blocks to the first image descriptor
    while (off < b.length && (b(off) & 0xff) == 0x21) { // extension
      off += 2 // introducer + label
      while (off < b.length && (b(off) & 0xff) != 0) off += 1 + (b(off) & 0xff)
      off += 1 // block terminator
    }
    if (off >= b.length || (b(off) & 0xff) != 0x2c) return None
    if (off + 10 > b.length) return None
    val w = le16(off + 5)
    val h = le16(off + 7)
    val ipacked = b(off + 9) & 0xff
    // interlace (bit 0x40, ImageIO's default) only permutes ROW order in
    // the LZW stream: channel sums are order-invariant and pass 1 starts
    // at row 0, so the first decoded pixel is the top-left either way —
    // every statistic this decoder reports is interlace-exact. A local
    // color table, if present, takes precedence over the global one.
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    off += 10
    val (pal, palSize) =
      if ((ipacked & 0x80) != 0) {
        val n = 2 << (ipacked & 7)
        val p = off
        off += 3 * n
        if (off > b.length) return None
        (p, n)
      } else if (gctSize > 0) (gct, gctSize)
      else return None // no palette anywhere
    if (off >= b.length) return None
    val minCodeSize = b(off) & 0xff
    off += 1
    // concatenate the LZW sub-blocks
    val lzw = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (off >= b.length) return None
      val len = b(off) & 0xff
      off += 1
      if (len == 0) done = true
      else {
        if (off + len > b.length) return None
        lzw.write(b, off, len)
        off += len
      }
    }
    val idx = lzwDecode(minCodeSize, lzw.toByteArray, w * h).getOrElse(return None)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < idx.length) {
      val p = idx(i) & 0xff
      if (p >= palSize) return None
      val base = pal + 3 * p
      sr += b(base) & 0xff
      sg += b(base + 1) & 0xff
      sb += b(base + 2) & 0xff
      i += 1
    }
    val f = pal + 3 * (idx(0) & 0xff)
    Some(GifPixels(-1L, w, h, sr, sg, sb,
      b(f) & 0xff, b(f + 1) & 0xff, b(f + 2) & 0xff))
  }

  /** Fixture adapter (the GIF sibling of [[asPngPayload]]): emit REAL
    * LZW-compressed GIF89a images. The 256-entry global palette is a
    * fixed affine ramp (r=5i+1, g=3i+7, b=11i+13 mod 256) and the pixel
    * INDEX derives from the row id ((docId + 7x + 13y) % 256), so an
    * oracle recomputes channel statistics from the two formulas without
    * parsing. Dimensions (16–32 × 12–24) force the decoder through
    * dictionary growth and a code-width bump. [[gifPixels]] never sees
    * the formulas — it reads only bytes. */
  def asGifPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 16 + (docId % 17).toInt
          val h = 12 + (docId % 13).toInt
          val indices = Array.tabulate(w * h) { i =>
            val x = i % w; val y = i / w
            ((docId + 7L * x + 13L * y) % 256).toByte
          }
          val out = new java.io.ByteArrayOutputStream()
          out.write("GIF89a".getBytes("US-ASCII"))
          def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
          le16(w); le16(h)
          out.write(0xf7) // GCT present, 256 entries
          out.write(0); out.write(0)
          for (i <- 0 until 256) {
            out.write((5 * i + 1) % 256)
            out.write((3 * i + 7) % 256)
            out.write((11 * i + 13) % 256)
          }
          out.write(0x2c) // image descriptor
          le16(0); le16(0); le16(w); le16(h)
          out.write(0) // no LCT, no interlace
          out.write(8) // LZW minimum code size
          val lzw = lzwEncode(8, indices)
          var p = 0
          while (p < lzw.length) {
            val n = math.min(255, lzw.length - p)
            out.write(n)
            out.write(lzw, p, n)
            p += n
          }
          out.write(0) // sub-block terminator
          out.write(0x3b) // trailer
          (docId, out.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** Partition-parallel GIF pixel decode ([[extractPngPixels]] shape). */
  def extractGifPixels(spark: SparkSession, media: DataFrame): Dataset[GifPixels] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          gifPixels(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  // --------------------------------------------------------------------
  // JPEG — from-scratch baseline sequential decoder (the last notch of
  // the former decode stub: Huffman entropy decode + dequantization +
  // IDCT, no external codec).
  // --------------------------------------------------------------------

  /** JPEG zig-zag scan order: `zigzag(k)` = natural (row-major) position
    * of the k-th coefficient in the entropy stream. */
  private val jpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) table for the separable IDCT (and its FDCT dual
    * in the fixture encoder — which the fixture never actually needs:
    * constant blocks have a closed-form DC-only transform). */
  private val jpegCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val jpegCu: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Decoded JPEG: per-component planes in the coded color space (Y or
    * Y/Cb/Cr — color conversion is the caller's choice), row-major,
    * values 0–255. */
  final case class JpegImage(
      width: Int,
      height: Int,
      comps: Int,
      planes: Array[Array[Int]])

  /** Canonical Huffman table in the JPEG decode form: per code length
    * 1–16 the smallest/largest code and the huffval offset. */
  private final class JpegHuff(counts: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len)) & 0xff
  }

  /** Separable IDCT of one DEQUANTIZED 8x8 block (natural order) +
    * level shift, written into a component plane at block origin
    * (bx0, by0) and clipped to the component dims — the shared tail of
    * the baseline and progressive decoders. `tmp` is caller-provided
    * scratch (64 doubles) so the per-block loop allocates nothing. */
  private def jpegIdctInto(
      dq: Array[Int], tmp: Array[Double], plane: Array[Int],
      compW: Int, compH: Int, bx0: Int, by0: Int): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          acc += jpegCu(u) * dq(v * 8 + u) * jpegCos(u)(x)
          u += 1
        }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      val py = by0 + y
      if (py < compH) {
        var x = 0
        while (x < 8) {
          val px = bx0 + x
          if (px < compW) {
            var acc = 0.0
            var vv = 0
            while (vv < 8) {
              acc += jpegCu(vv) * tmp(vv * 8 + x) * jpegCos(vv)(y)
              vv += 1
            }
            val s = Math.round(acc / 4.0 + 128.0).toInt
            plane(py * compW + px) =
              if (s < 0) 0 else if (s > 255) 255 else s
          }
          x += 1
        }
      }
      y += 1
    }
  }

  /** Component-resolution planes box-replicated to full image
    * resolution (4:4:4 components pass through; T.81 leaves the
    * upsampling filter to the decoder) — shared by both decoders. */
  private def jpegUpsample(
      ncomp: Int, width: Int, height: Int, hmax: Int, vmax: Int,
      compHs: Array[Int], compVs: Array[Int],
      cw: Array[Int], ch: Array[Int],
      cplanes: Array[Array[Int]]): Array[Array[Int]] =
    Array.tabulate(ncomp) { c =>
      if (cw(c) == width && ch(c) == height) cplanes(c)
      else {
        val p = new Array[Int](width * height)
        val src = cplanes(c)
        var y = 0
        while (y < height) {
          val sy = y * compVs(c) / vmax
          var x = 0
          while (x < width) {
            p(y * width + x) = src(sy * cw(c) + x * compHs(c) / hmax)
            x += 1
          }
          y += 1
        }
        p
      }
    }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * byte-unstuffing and RSTn resynchronization. Throws
    * [[JpegBitReader.Bail]] (caught by [[jpegDecode]]) on truncation —
    * the quarantine route, not a task failure. */
  private final class JpegBitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var bits = 0
    def nextBit(): Int = {
      if (bits == 0) {
        if (pos >= b.length) throw JpegBitReader.Bail
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) throw JpegBitReader.Bail
          val m = b(pos) & 0xff
          if (m == 0) pos += 1 // stuffed data byte
          else throw JpegBitReader.Bail // marker inside entropy data
        }
        acc = v; bits = 8
      }
      bits -= 1
      (acc >> bits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** DIFF/AC magnitude extension (JPEG F.2.2.1 EXTEND). */
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      val v = receive(s)
      if (v < (1 << (s - 1))) v + ((-1 << s) + 1) else v
    }
    def decodeHuff(t: JpegHuff): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) return t.value(l, code)
        code = (code << 1) | nextBit()
        l += 1
      }
      throw JpegBitReader.Bail
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restartSync(): Unit = {
      bits = 0
      if (pos + 1 >= b.length) throw JpegBitReader.Bail
      if ((b(pos) & 0xff) != 0xff) throw JpegBitReader.Bail
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) throw JpegBitReader.Bail
      pos += 2
    }
  }
  private object JpegBitReader {
    /** Control-flow bail for malformed streams; stackless. */
    object Bail extends RuntimeException with scala.util.control.NoStackTrace
  }

  /** REAL pixel decode of a baseline sequential JPEG (SOF0/SOF1), built
    * from scratch on the JPEG standard (ITU T.81): marker walk (DQT in
    * 8/16-bit precision, DHT canonical Huffman, DRI restart intervals),
    * MCU entropy decode (DC prediction + EXTEND, AC run/size with ZRL
    * and EOB), dequantization, double-precision separable IDCT, level
    * shift. Scope (documented; everything else quarantines to None):
    * 8-bit precision, 1, 3, or 4 components (4 = Adobe CMYK at APP14
    * transform 0; YCCK quarantines), sampling factors 1–2 per axis —
    * 4:4:4 AND the chroma-subsampled layouts real encoders emit by
    * default (4:2:0, 4:2:2, 4:4:0), decoded as interleaved MCUs at
    * component resolution and box-replicated up to full resolution
    * (T.81 leaves the upsampling filter to the decoder). Progressive
    * (SOF2) files route to [[jpegDecodeProgressive]], lossless (SOF3)
    * to [[jpegDecodeLossless]]; differential / arithmetic files are
    * dropped, never mis-decoded.
    * Returns planes in the CODED color space (Y or Y/Cb/Cr): the lossy
    * YCbCr→RGB rounding choice is left to callers, so per-component
    * statistics stay bit-exact against an oracle. */
  def jpegDecode(b: Array[Byte]): Option[JpegImage] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[JpegHuff](4)
    val acTabs = new Array[JpegHuff](4)
    var width = 0; var height = 0; var ncomp = 0
    var restartInterval = 0
    // per component: quant-table id, sampling factors, then (at SOS)
    // DC/AC table ids
    val compQ = new Array[Int](4)
    val compId = new Array[Int](4)
    val compDc = new Array[Int](4)
    val compAc = new Array[Int](4)
    val compHs = new Array[Int](4)
    val compVs = new Array[Int](4)
    // Adobe APP14 color-transform byte: 4-component files are plain CMYK
    // (0, decodable) or YCCK (2, quarantined — never mis-decoded)
    var adobeTransform = 0
    var i = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 1 >= b.length) return None
      if (u8(i) != 0xff) return None
      var m = u8(i + 1)
      i += 2
      while (m == 0xff) { if (i >= b.length) return None; m = u8(i); i += 1 }
      m match {
        case 0xd8 => // stray SOI: ignore
        case 0xd9 => return None // EOI before SOS
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (i + len > b.length || len < 8) return None
          if (u8(i + 2) != 8) return None // bit precision
          height = be16(i + 3); width = be16(i + 5)
          ncomp = u8(i + 7)
          if ((ncomp != 1 && ncomp != 3 && ncomp != 4) ||
            len < 8 + 3 * ncomp) return None
          if (width <= 0 || height <= 0 ||
            width > (1 << 14) || height > (1 << 14)) return None
          var c = 0
          while (c < ncomp) {
            compId(c) = u8(i + 8 + 3 * c)
            val hv = u8(i + 9 + 3 * c)
            compHs(c) = hv >> 4; compVs(c) = hv & 15
            // 1–2 per axis covers 4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 — what
            // real encoders emit; exotic factors quarantine
            if (compHs(c) < 1 || compHs(c) > 2 ||
              compVs(c) < 1 || compVs(c) > 2) return None
            compQ(c) = u8(i + 10 + 3 * c)
            if (compQ(c) > 3) return None
            c += 1
          }
          i += len
        case 0xc2 => // progressive DCT: its own multi-scan decoder
          return jpegDecodeProgressive(b)
        case 0xc3 => // lossless sequential: its own predictive decoder
          return jpegDecodeLossless(b)
        case 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return None // differential/arithmetic: out of scope
        case 0xc4 => // DHT (possibly several tables in one segment)
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (i + len > b.length) return None
          var p = i + 2
          val end = i + len
          while (p < end) {
            val tcth = u8(p)
            val tc = tcth >> 4; val th = tcth & 15
            if (tc > 1 || th > 3 || p + 17 > end) return None
            val counts = Array.tabulate(16)(j => u8(p + 1 + j))
            val n = counts.sum
            if (p + 17 + n > end || n > 256) return None
            val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
            val t = new JpegHuff(counts, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + n
          }
          i += len
        case 0xdb => // DQT (possibly several tables in one segment)
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (i + len > b.length) return None
          var p = i + 2
          val end = i + len
          while (p < end) {
            val pqtq = u8(p)
            val pq = pqtq >> 4; val tq = pqtq & 15
            if (pq > 1 || tq > 3) return None
            val sz = if (pq == 0) 64 else 128
            if (p + 1 + sz > end) return None
            val q = new Array[Int](64)
            var k = 0
            while (k < 64) {
              q(jpegZigzag(k)) =
                if (pq == 0) u8(p + 1 + k) else be16(p + 1 + 2 * k)
              k += 1
            }
            qtabs(tq) = q
            p += 1 + sz
          }
          i += len
        case 0xdd => // DRI
          if (i + 4 > b.length || be16(i) != 4) return None
          restartInterval = be16(i + 2)
          i += 4
        case 0xda => // SOS
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (i + len > b.length) return None
          val ns = u8(i + 2)
          if (ns != ncomp || len != 6 + 2 * ns) return None
          var c = 0
          while (c < ns) {
            val cid = u8(i + 3 + 2 * c)
            val j = compId.indexOf(cid)
            if (j < 0 || j >= ncomp) return None
            val tt = u8(i + 4 + 2 * c)
            compDc(j) = tt >> 4; compAc(j) = tt & 15
            c += 1
          }
          sosAt = i + len
          i += len
        case mm if mm >= 0xd0 && mm <= 0xd7 => // stray RST: ignore
        case 0x01 => // TEM, parameterless
        case 0xee => // APP14: Adobe transform (last byte of the segment)
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (len < 2 || i + len > b.length) return None
          if (len >= 14 && new String(b, i + 2, 5, "US-ASCII") == "Adobe")
            adobeTransform = u8(i + 13)
          i += len
        case _ => // APPn / COM / anything else with a length
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (len < 2 || i + len > b.length) return None
          i += len
      }
    }
    if (width == 0 || ncomp == 0) return None
    if (ncomp == 4 && adobeTransform != 0) return None // YCCK: out of scope
    var c = 0
    while (c < ncomp) {
      if (qtabs(compQ(c)) == null || dcTabs(compDc(c)) == null ||
        acTabs(compAc(c)) == null) return None
      c += 1
    }
    // a single-component scan is NON-interleaved (T.81 A.2.2): the MCU is
    // one data unit and the declared sampling factors do not shape the scan
    if (ncomp == 1) { compHs(0) = 1; compVs(0) = 1 }
    var hmax = 1; var vmax = 1
    c = 0
    while (c < ncomp) {
      if (compHs(c) > hmax) hmax = compHs(c)
      if (compVs(c) > vmax) vmax = compVs(c)
      c += 1
    }
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per-component planes at COMPONENT resolution; box-replicated to the
    // full image after the scan (exact for 4:4:4, where they coincide)
    val cw = Array.tabulate(ncomp)(c => (width * compHs(c) + hmax - 1) / hmax)
    val ch = Array.tabulate(ncomp)(c => (height * compVs(c) + vmax - 1) / vmax)
    val cplanes = Array.tabulate(ncomp)(c => new Array[Int](cw(c) * ch(c)))
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val preds = new Array[Int](4)
    val reader = new JpegBitReader(b, sosAt)
    try {
      var mcu = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            reader.restartSync()
            java.util.Arrays.fill(preds, 0)
          }
          var c = 0
          while (c < ncomp) {
            val q = qtabs(compQ(c))
            val compW = cw(c); val compH = ch(c)
            val plane = cplanes(c)
            var vb = 0
            while (vb < compVs(c)) {
              var hb = 0
              while (hb < compHs(c)) {
                java.util.Arrays.fill(coef, 0)
                // DC
                val t = reader.decodeHuff(dcTabs(compDc(c)))
                if (t > 11) throw JpegBitReader.Bail
                preds(c) += reader.receiveExtend(t)
                coef(0) = preds(c) * q(0)
                // AC
                var k = 1
                var eob = false
                while (k < 64 && !eob) {
                  val rs = reader.decodeHuff(acTabs(compAc(c)))
                  val r = rs >> 4; val s = rs & 15
                  if (s == 0) {
                    if (r == 15) k += 16 else eob = true // ZRL vs EOB
                  } else {
                    k += r
                    if (k > 63) throw JpegBitReader.Bail
                    val nat = jpegZigzag(k)
                    coef(nat) = reader.receiveExtend(s) * q(nat)
                    k += 1
                  }
                }
                jpegIdctInto(coef, tmp, plane, compW, compH,
                  (mx * compHs(c) + hb) * 8, (my * compVs(c) + vb) * 8)
                hb += 1
              }
              vb += 1
            }
            c += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } catch {
      case JpegBitReader.Bail => return None
      case _: ArrayIndexOutOfBoundsException => return None
    }
    Some(JpegImage(width, height, ncomp,
      jpegUpsample(ncomp, width, height, hmax, vmax, compHs, compVs,
        cw, ch, cplanes)))
  }

  /** LOSSLESS sequential (SOF3) JPEG decoder — T.81 Annex H predictive
    * coding, the DNG/medical/archival class: no DCT, no quantization;
    * each sample's Huffman-coded category + EXTEND bits give a
    * difference against one of the seven spatial predictors (Ra/Rb/Rc
    * combinations, selected by the scan's Ss field), accumulated modulo
    * 2^16. Scope (documented; everything else quarantines): precision
    * 2–16 (outputs the 8-bit downscale, high byte for P>8), 1 or 3
    * components at 1×1 sampling, point transform Al, no restart
    * intervals (rare in lossless; DRI>0 quarantines rather than risking
    * a divergent resync convention). Category 16 means diff=32768 with
    * no extension bits (Annex H.2). No JVM or local library implements
    * this process, so the pin is the fixture round-trip + formula oracle
    * rather than a second decoder. */
  private[graft] def jpegDecodeLossless(b: Array[Byte]): Option[JpegImage] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    val dcTabs = new Array[JpegHuff](4)
    var width = 0; var height = 0; var ncomp = 0; var prec = 0
    val compDc = new Array[Int](3)
    var predictor = 0; var pt = 0
    var i = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 1 >= b.length) return None
      if (u8(i) != 0xff) return None
      var m = u8(i + 1)
      i += 2
      while (m == 0xff) { if (i >= b.length) return None; m = u8(i); i += 1 }
      m match {
        case 0xd8 => // stray SOI: ignore
        case 0xd9 => return None // EOI before SOS
        case 0xc3 => // SOF3
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (i + len > b.length || len < 8) return None
          prec = u8(i + 2)
          if (prec < 2 || prec > 16) return None
          height = be16(i + 3); width = be16(i + 5)
          ncomp = u8(i + 7)
          if ((ncomp != 1 && ncomp != 3) || len < 8 + 3 * ncomp) return None
          if (width <= 0 || height <= 0 ||
            width > (1 << 14) || height > (1 << 14)) return None
          var c = 0
          while (c < ncomp) {
            if (u8(i + 9 + 3 * c) != 0x11) return None // 1x1 sampling only
            c += 1
          }
          i += len
        case 0xc4 => // DHT (DC-class tables only matter in lossless)
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (i + len > b.length) return None
          var p = i + 2
          val end = i + len
          while (p < end) {
            val tcth = u8(p)
            val tc = tcth >> 4; val th = tcth & 15
            if (tc > 1 || th > 3 || p + 17 > end) return None
            val counts = Array.tabulate(16)(j => u8(p + 1 + j))
            val n = counts.sum
            if (p + 17 + n > end || n > 256) return None
            val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
            if (tc == 0) dcTabs(th) = new JpegHuff(counts, vals)
            p += 17 + n
          }
          i += len
        case 0xdd => // DRI: out of scope for the lossless process
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (i + len > b.length || len < 4) return None
          if (be16(i + 2) != 0) return None
          i += len
        case 0xda => // SOS
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (i + len > b.length) return None
          val ns = u8(i + 2)
          if (ns != ncomp || len < 6 + 2 * ns) return None
          var c = 0
          while (c < ns) {
            compDc(c) = u8(i + 4 + 2 * c) >> 4
            if (compDc(c) > 3 || dcTabs(compDc(c)) == null) return None
            c += 1
          }
          predictor = u8(i + 3 + 2 * ns) // Ss
          if (predictor < 1 || predictor > 7) return None
          if (u8(i + 4 + 2 * ns) != 0) return None // Se must be 0
          pt = u8(i + 5 + 2 * ns) & 15 // Al = point transform
          if (pt >= prec) return None
          sosAt = i + len
        case 0xdb => i += { // DQT: legal but unused in lossless; skip
            if (i + 2 > b.length) return None
            val len = be16(i); if (i + len > b.length) return None; len
          }
        case mm if mm >= 0xe0 && mm <= 0xfe => // APPn / COM
          if (i + 2 > b.length) return None
          val len = be16(i)
          if (i + len > b.length) return None
          i += len
        case _ => return None
      }
    }
    if (width == 0 || ncomp == 0) return None
    val planes = Array.fill(ncomp)(new Array[Int](width * height))
    val r = new JpegBitReader(b, sosAt)
    val defaultPred = 1 << (prec - pt - 1)
    try {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          var c = 0
          while (c < ncomp) {
            val cat = r.decodeHuff(dcTabs(compDc(c)))
            if (cat > 16) throw JpegBitReader.Bail
            val diff = if (cat == 16) 32768 else r.receiveExtend(cat)
            val plane = planes(c)
            val pred =
              if (x == 0 && y == 0) defaultPred
              else if (y == 0) plane(x - 1) // first line: Ra
              else if (x == 0) plane((y - 1) * width) // first column: Rb
              else {
                val ra = plane(y * width + x - 1)
                val rb = plane((y - 1) * width + x)
                val rc = plane((y - 1) * width + x - 1)
                predictor match {
                  case 1 => ra
                  case 2 => rb
                  case 3 => rc
                  case 4 => ra + rb - rc
                  case 5 => ra + ((rb - rc) >> 1)
                  case 6 => rb + ((ra - rc) >> 1)
                  case _ => (ra + rb) >> 1
                }
              }
            plane(y * width + x) = (pred + diff) & 0xffff
            c += 1
          }
          x += 1
        }
        y += 1
      }
    } catch { case JpegBitReader.Bail => return None }
    // 8-bit display downscale: undo the point transform, then take the
    // top 8 of the P significant bits
    val shift = math.max(0, prec - 8) - pt
    val out = planes.map { p =>
      val q = new Array[Int](p.length)
      var j = 0
      while (j < p.length) {
        val v = if (shift >= 0) p(j) >> shift else p(j) << -shift
        q(j) = if (v < 0) 0 else if (v > 255) 255 else v
        j += 1
      }
      q
    }
    Some(JpegImage(width, height, ncomp, out))
  }

  /** LOSSLESS (SOF3) fixture ENCODER — the Annex-H dual of
    * [[jpegDecodeLossless]]: one DC-class Huffman table holding all 17
    * categories as canonical 5-bit codes, the scan's Ss selecting the
    * predictor, diffs coded modulo 2^16 (category 16 = 32768, no
    * extension bits). `planes` carry full-precision samples
    * (0 until 2^precision). */
  private[graft] def jpegEncodeLossless(
      w: Int, h: Int, planes: Array[Array[Int]],
      precision: Int, predictor: Int): Array[Byte] = {
    require(predictor >= 1 && predictor <= 7)
    val ncomp = planes.length
    val out = new java.io.ByteArrayOutputStream()
    def be16v(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xc3); be16v(8 + 3 * ncomp) // SOF3
    out.write(precision); be16v(h); be16v(w); out.write(ncomp)
    for (c <- 1 to ncomp) { out.write(c); out.write(0x11); out.write(0) }
    // DC table 0: categories 0..16, all canonical 5-bit codes
    marker(0xc4); be16v(2 + 17 + 17)
    out.write(0x00)
    for (l <- 1 to 16) out.write(if (l == 5) 17 else 0)
    for (s <- 0 to 16) out.write(s)
    marker(0xda); be16v(6 + 2 * ncomp) // SOS
    out.write(ncomp)
    for (c <- 1 to ncomp) { out.write(c); out.write(0x00) }
    out.write(predictor) // Ss
    out.write(0) // Se
    out.write(0) // AhAl: point transform 0
    val bits = new JpegBitWriter(out)
    val defaultPred = 1 << (precision - 1)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ncomp) {
          val plane = planes(c)
          val pred =
            if (x == 0 && y == 0) defaultPred
            else if (y == 0) plane(x - 1)
            else if (x == 0) plane((y - 1) * w)
            else {
              val ra = plane(y * w + x - 1)
              val rb = plane((y - 1) * w + x)
              val rc = plane((y - 1) * w + x - 1)
              predictor match {
                case 1 => ra
                case 2 => rb
                case 3 => rc
                case 4 => ra + rb - rc
                case 5 => ra + ((rb - rc) >> 1)
                case 6 => rb + ((ra - rc) >> 1)
                case _ => (ra + rb) >> 1
              }
            }
          val dm = (plane(y * w + x) - pred) & 0xffff
          if (dm == 32768) bits.put(16, 5) // category 16: no extend bits
          else {
            val signed = if (dm > 32768) dm - 65536 else dm
            val cat = jpegCategory(signed)
            bits.put(cat, 5)
            if (cat > 0)
              bits.put(if (signed < 0) signed - 1 else signed, cat)
          }
          c += 1
        }
        x += 1
      }
      y += 1
    }
    bits.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Fixture adapter for LOSSLESS JPEGs over the shared pixel formulas:
    * the predictor cycles 1–7 by row id, precision alternates 8/16-bit
    * (16-bit high byte = the formula, low byte an independent function —
    * the png16 convention), and every third doc is single-component.
    * Lossless JPEG applies NO color transform, so the coded components
    * ARE the formula channels and the oracle recomputes the statistics
    * with no codec. */
  def asLosslessJpegPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val w = 4 + (docId % 5).toInt
          val h = 3 + (docId % 4).toInt
          val gray = docId % 3 == 0
          val ncomp = if (gray) 1 else 3
          val prec = if ((docId / 2) % 2 == 0) 8 else 16
          val predictor = 1 + (docId % 7).toInt
          def hi(x: Int, y: Int, c: Int): Int = (c match {
            case 0 => (docId + 7L * x + 13L * y) % 256
            case 1 => (docId * 3 + 5L * x + 11L * y) % 256
            case _ => (docId * 5 + 3L * x + 17L * y) % 256
          }).toInt
          val planes = Array.tabulate(ncomp) { c =>
            Array.tabulate(w * h) { j =>
              val x = j % w; val y = j / w
              if (prec == 8) hi(x, y, c)
              else (hi(x, y, c) << 8) |
                ((docId + 3L * (x + 7L * y + 11L * c)) % 256).toInt
            }
          }
          (docId, jpegEncodeLossless(w, h, planes, prec, predictor))
        }
      }.toDF("doc_id", "payload")
  }

  /** PROGRESSIVE (SOF2) JPEG decoder — the multi-scan sibling of
    * [[jpegDecode]], built from the T.81 progressive-DCT procedures
    * (G.1.2): coefficients for every block accumulate across scans —
    * interleaved DC-first scans with successive-approximation point
    * transform, one-bit-per-block DC refinement, per-component AC
    * spectral-selection bands with EOB run lengths, and the AC
    * successive-approximation refinement pass (correction bits on
    * already-nonzero coefficients, ±2^Al placements on new ones) —
    * then one dequantize + IDCT per block at the end. DHT/DQT/DRI
    * segments BETWEEN scans update the live tables, restart markers
    * reset DC predictors and EOB runs per interval, and any malformed
    * structure quarantines to None (never a task failure). Sampling
    * scope matches the baseline decoder (1–2 per axis); total
    * coefficient storage is capped so a hostile header cannot balloon
    * memory. Cross-checked against the JDK's independent ImageIO
    * progressive encoder+decoder in JpegSpec. */
  private def jpegDecodeProgressive(b: Array[Byte]): Option[JpegImage] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[JpegHuff](4)
    val acTabs = new Array[JpegHuff](4)
    var width = 0; var height = 0; var ncomp = 0
    var restartInterval = 0
    val compQ = new Array[Int](3)
    val compId = new Array[Int](3)
    val compHs = new Array[Int](3)
    val compVs = new Array[Int](3)
    var hmax = 1; var vmax = 1
    var mcusX = 0; var mcusY = 0
    // per component: MCU-padded block-grid stride/height (interleaved
    // addressing) and the ACTUAL block dims (non-interleaved scans and
    // the final IDCT cover only real blocks)
    var bwPad: Array[Int] = null; var bhPad: Array[Int] = null
    var bwAct: Array[Int] = null; var bhAct: Array[Int] = null
    var coefs: Array[Array[Int]] = null // comp -> blockIdx*64 + natural idx
    val preds = new Array[Int](3)

    /** First entropy position of the next marker segment at or after
      * `from` (skips stuffed FF00 bytes, fill FFs, and RSTn). */
    def nextMarkerPos(from: Int): Int = {
      var p = from
      while (p + 1 < b.length) {
        if (u8(p) != 0xff) p += 1
        else {
          val m = u8(p + 1)
          if (m == 0x00) p += 2 // stuffed data byte
          else if (m == 0xff) p += 1 // fill byte
          else if (m >= 0xd0 && m <= 0xd7) p += 2 // restart marker
          else return p
        }
      }
      -1
    }

    def setupAfterSof(): Boolean = {
      hmax = 1; vmax = 1
      var c = 0
      while (c < ncomp) {
        if (compHs(c) > hmax) hmax = compHs(c)
        if (compVs(c) > vmax) vmax = compVs(c)
        c += 1
      }
      mcusX = (width + 8 * hmax - 1) / (8 * hmax)
      mcusY = (height + 8 * vmax - 1) / (8 * vmax)
      bwPad = Array.tabulate(ncomp)(c => mcusX * compHs(c))
      bhPad = Array.tabulate(ncomp)(c => mcusY * compVs(c))
      bwAct = Array.tabulate(ncomp) { c =>
        ((width * compHs(c) + hmax - 1) / hmax + 7) / 8
      }
      bhAct = Array.tabulate(ncomp) { c =>
        ((height * compVs(c) + vmax - 1) / vmax + 7) / 8
      }
      // memory bound: a hostile header must not allocate unbounded
      // coefficient storage (2^19 blocks ≈ 134 MB of ints — covers a
      // 4096x4096 three-component 4:2:0 image)
      val totalBlocks = (0 until ncomp).map(c => bwPad(c).toLong * bhPad(c)).sum
      if (totalBlocks > (1L << 19)) return false
      coefs = Array.tabulate(ncomp)(c => new Array[Int](bwPad(c) * bhPad(c) * 64))
      true
    }

    var i = 2
    var sawEoi = false
    try {
      while (!sawEoi) {
        if (i < 0 || i + 1 >= b.length) return None
        if (u8(i) != 0xff) return None
        var m = u8(i + 1)
        i += 2
        while (m == 0xff) { if (i >= b.length) return None; m = u8(i); i += 1 }
        m match {
          case 0xd8 => // stray SOI: ignore
          case 0xd9 => sawEoi = true
          case 0xc2 => // SOF2
            if (coefs != null) return None // double SOF: malformed
            if (i + 2 > b.length) return None
            val len = be16(i)
            if (i + len > b.length || len < 8) return None
            if (u8(i + 2) != 8) return None
            height = be16(i + 3); width = be16(i + 5)
            ncomp = u8(i + 7)
            if ((ncomp != 1 && ncomp != 3) || len < 8 + 3 * ncomp) return None
            if (width <= 0 || height <= 0 ||
              width > (1 << 14) || height > (1 << 14)) return None
            var c = 0
            while (c < ncomp) {
              compId(c) = u8(i + 8 + 3 * c)
              val hv = u8(i + 9 + 3 * c)
              compHs(c) = hv >> 4; compVs(c) = hv & 15
              if (compHs(c) < 1 || compHs(c) > 2 ||
                compVs(c) < 1 || compVs(c) > 2) return None
              compQ(c) = u8(i + 10 + 3 * c)
              if (compQ(c) > 3) return None
              c += 1
            }
            if (ncomp == 1) { compHs(0) = 1; compVs(0) = 1 }
            if (!setupAfterSof()) return None
            i += len
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
              0xcb | 0xcd | 0xce | 0xcf =>
            return None // a second/different SOF: malformed
          case 0xc4 => // DHT (tables may arrive BETWEEN scans)
            if (i + 2 > b.length) return None
            val len = be16(i)
            if (i + len > b.length) return None
            var p = i + 2
            val end = i + len
            while (p < end) {
              val tcth = u8(p)
              val tc = tcth >> 4; val th = tcth & 15
              if (tc > 1 || th > 3 || p + 17 > end) return None
              val counts = Array.tabulate(16)(j => u8(p + 1 + j))
              val n = counts.sum
              if (p + 17 + n > end || n > 256) return None
              val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
              val t = new JpegHuff(counts, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + n
            }
            i += len
          case 0xdb => // DQT
            if (i + 2 > b.length) return None
            val len = be16(i)
            if (i + len > b.length) return None
            var p = i + 2
            val end = i + len
            while (p < end) {
              val pqtq = u8(p)
              val pq = pqtq >> 4; val tq = pqtq & 15
              if (pq > 1 || tq > 3) return None
              val sz = if (pq == 0) 64 else 128
              if (p + 1 + sz > end) return None
              val q = new Array[Int](64)
              var k = 0
              while (k < 64) {
                q(jpegZigzag(k)) =
                  if (pq == 0) u8(p + 1 + k) else be16(p + 1 + 2 * k)
                k += 1
              }
              qtabs(tq) = q
              p += 1 + sz
            }
            i += len
          case 0xdd => // DRI
            if (i + 4 > b.length || be16(i) != 4) return None
            restartInterval = be16(i + 2)
            i += 4
          case 0xda => // SOS: one progressive scan
            if (coefs == null) return None // scan before SOF
            if (i + 2 > b.length) return None
            val len = be16(i)
            if (i + len > b.length) return None
            val ns = u8(i + 2)
            if (ns < 1 || ns > ncomp || len != 6 + 2 * ns) return None
            val scanComp = new Array[Int](ns)
            val scanDc = new Array[Int](ns)
            val scanAc = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cid = u8(i + 3 + 2 * c)
              val j = compId.indexOf(cid)
              if (j < 0 || j >= ncomp) return None
              scanComp(c) = j
              val tt = u8(i + 4 + 2 * c)
              scanDc(c) = tt >> 4; scanAc(c) = tt & 15
              c += 1
            }
            val ss = u8(i + 3 + 2 * ns)
            val se = u8(i + 4 + 2 * ns)
            val ahal = u8(i + 5 + 2 * ns)
            val ah = ahal >> 4; val al = ahal & 15
            if (ss > 63 || se > 63 || se < ss || al > 13 || ah > 14) return None
            if (ss == 0 && se != 0) return None // DC scans are 0..0 here
            if (ss > 0 && ns != 1) return None // AC scans: one component
            if (ah != 0 && ah != al + 1) return None // refinement steps by 1
            val reader = new JpegBitReader(b, i + len)
            java.util.Arrays.fill(preds, 0)
            var eobrun = 0

            def decodeDcFirst(comp: Int, base: Int, dcTab: JpegHuff): Unit = {
              val t = reader.decodeHuff(dcTab)
              if (t > 11) throw JpegBitReader.Bail
              preds(comp) += reader.receiveExtend(t)
              coefs(comp)(base) = preds(comp) << al
            }
            def decodeDcRefine(comp: Int, base: Int): Unit =
              if (reader.nextBit() == 1) coefs(comp)(base) |= (1 << al)
            def decodeAcFirst(comp: Int, base: Int, acTab: JpegHuff): Unit = {
              if (eobrun > 0) { eobrun -= 1; return }
              var k = ss
              while (k <= se) {
                val rs = reader.decodeHuff(acTab)
                val r = rs >> 4; val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else {
                    eobrun = (1 << r) - 1 +
                      (if (r > 0) reader.receive(r) else 0)
                    k = 64 // end of band for this block
                  }
                } else {
                  k += r
                  if (k > se) throw JpegBitReader.Bail
                  coefs(comp)(base + jpegZigzag(k)) =
                    reader.receiveExtend(s) << al
                  k += 1
                }
              }
            }
            def decodeAcRefine(comp: Int, base: Int, acTab: JpegHuff): Unit = {
              val bit = 1 << al
              val cf = coefs(comp)
              def refine(z: Int): Unit =
                if (reader.nextBit() == 1 && (cf(z) & bit) == 0)
                  cf(z) += (if (cf(z) >= 0) bit else -bit)
              if (eobrun > 0) {
                var k = ss
                while (k <= se) {
                  val z = base + jpegZigzag(k)
                  if (cf(z) != 0) refine(z)
                  k += 1
                }
                eobrun -= 1
                return
              }
              var k = ss
              while (k <= se) {
                val rs = reader.decodeHuff(acTab)
                var r = rs >> 4; val s = rs & 15
                var newVal = 0
                if (s == 0) {
                  if (r < 15) {
                    // EOB run: correction bits on the REST of this block's
                    // band, then (eobrun-1) more whole blocks skip
                    eobrun = (1 << r) - 1 +
                      (if (r > 0) reader.receive(r) else 0)
                    while (k <= se) {
                      val z = base + jpegZigzag(k)
                      if (cf(z) != 0) refine(z)
                      k += 1
                    }
                    return
                  }
                  // r == 15: skip 16 zero-history positions
                } else {
                  if (s != 1) throw JpegBitReader.Bail
                  newVal = if (reader.nextBit() == 1) bit else -bit
                }
                // advance: corrections on nonzero-history coefficients,
                // count r zero-history slots, place the new value
                var placed = false
                while (k <= se && !placed) {
                  val z = base + jpegZigzag(k)
                  if (cf(z) != 0) refine(z)
                  else {
                    if (r == 0) {
                      if (newVal != 0) cf(z) = newVal
                      placed = true
                    } else r -= 1
                  }
                  k += 1
                }
                if (!placed && newVal != 0) throw JpegBitReader.Bail
              }
            }

            def decodeBlock(sc: Int, base: Int): Unit = {
              val comp = scanComp(sc)
              if (ss == 0) {
                if (ah == 0) {
                  val t = dcTabs(scanDc(sc))
                  if (t == null) throw JpegBitReader.Bail
                  decodeDcFirst(comp, base, t)
                } else decodeDcRefine(comp, base)
              } else {
                val t = acTabs(scanAc(sc))
                if (t == null) throw JpegBitReader.Bail
                if (ah == 0) decodeAcFirst(comp, base, t)
                else decodeAcRefine(comp, base, t)
              }
            }
            def restartIfDue(mcu: Int): Unit =
              if (restartInterval > 0 && mcu > 0 &&
                mcu % restartInterval == 0) {
                reader.restartSync()
                java.util.Arrays.fill(preds, 0)
                eobrun = 0
              }

            if (ns == 1) {
              // non-interleaved (T.81 A.2.2 — any single-component scan,
              // DC or AC): the component's OWN block raster
              val comp = scanComp(0)
              var mcu = 0
              var by = 0
              while (by < bhAct(comp)) {
                var bx = 0
                while (bx < bwAct(comp)) {
                  restartIfDue(mcu)
                  decodeBlock(0, (by * bwPad(comp) + bx) * 64)
                  mcu += 1
                  bx += 1
                }
                by += 1
              }
            } else {
              // interleaved DC scan over the MCU grid
              var mcu = 0
              var my = 0
              while (my < mcusY) {
                var mx = 0
                while (mx < mcusX) {
                  restartIfDue(mcu)
                  var sc = 0
                  while (sc < ns) {
                    val comp = scanComp(sc)
                    var vb = 0
                    while (vb < compVs(comp)) {
                      var hb = 0
                      while (hb < compHs(comp)) {
                        val blk = (my * compVs(comp) + vb) * bwPad(comp) +
                          (mx * compHs(comp) + hb)
                        decodeBlock(sc, blk * 64)
                        hb += 1
                      }
                      vb += 1
                    }
                    sc += 1
                  }
                  mcu += 1
                  mx += 1
                }
                my += 1
              }
            }
            i = nextMarkerPos(reader.pos)
          case mm if mm >= 0xd0 && mm <= 0xd7 => // stray RST: ignore
          case 0x01 => // TEM
          case _ => // APPn / COM / anything else with a length
            if (i + 2 > b.length) return None
            val len = be16(i)
            if (len < 2 || i + len > b.length) return None
            i += len
        }
      }
    } catch {
      case JpegBitReader.Bail => return None
      case _: ArrayIndexOutOfBoundsException => return None
    }
    if (coefs == null || width == 0) return None
    // ---- dequantize + IDCT every ACTUAL block, then upsample ----
    var c0 = 0
    while (c0 < ncomp) { if (qtabs(compQ(c0)) == null) return None; c0 += 1 }
    val cw = Array.tabulate(ncomp)(c => (width * compHs(c) + hmax - 1) / hmax)
    val ch = Array.tabulate(ncomp)(c => (height * compVs(c) + vmax - 1) / vmax)
    val cplanes = Array.tabulate(ncomp)(c => new Array[Int](cw(c) * ch(c)))
    val dq = new Array[Int](64)
    val tmp = new Array[Double](64)
    var c = 0
    while (c < ncomp) {
      val q = qtabs(compQ(c))
      val cf = coefs(c)
      val plane = cplanes(c)
      val compW = cw(c); val compH = ch(c)
      var by = 0
      while (by < bhAct(c)) {
        var bx = 0
        while (bx < bwAct(c)) {
          val base = (by * bwPad(c) + bx) * 64
          var j = 0
          while (j < 64) { dq(j) = cf(base + j) * q(j); j += 1 }
          jpegIdctInto(dq, tmp, plane, compW, compH, bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    Some(JpegImage(width, height, ncomp,
      jpegUpsample(ncomp, width, height, hmax, vmax, compHs, compVs,
        cw, ch, cplanes)))
  }

  /** Decoded pixel statistics of one baseline JPEG, reported in the
    * CODED color space (Y/Cb/Cr — or Y with Cb=Cr=128 for grayscale):
    * per-component sums are bit-exact under the fixture contract, where
    * an RGB report would fold in a rounding-mode choice the oracle
    * can't replay. `first_*` probes the top-left pixel — DC-prediction
    * bugs land there even when order-invariant sums survive. */
  final case class JpegPixels(
      doc_id: Long,
      width: Int,
      height: Int,
      sum_y: Long,
      sum_cb: Long,
      sum_cr: Long,
      first_y: Int,
      first_cb: Int,
      first_cr: Int)

  def jpegPixels(b: Array[Byte]): Option[JpegPixels] =
    jpegDecode(b).filter(_.comps != 4).map { img =>
      val n = img.width * img.height
      def sum(p: Array[Int]): Long = {
        var s = 0L; var i = 0
        while (i < p.length) { s += p(i); i += 1 }
        s
      }
      if (img.comps == 3)
        JpegPixels(-1L, img.width, img.height,
          sum(img.planes(0)), sum(img.planes(1)), sum(img.planes(2)),
          img.planes(0)(0), img.planes(1)(0), img.planes(2)(0))
      else
        JpegPixels(-1L, img.width, img.height,
          sum(img.planes(0)), 128L * n, 128L * n,
          img.planes(0)(0), 128, 128)
    }

  /** Decoded statistics of one 4-component (CMYK) baseline JPEG —
    * coded-space channel sums + the top-left pixel, the 4-band sibling
    * of [[JpegPixels]]. */
  final case class JpegCmykPixels(
      doc_id: Long, width: Int, height: Int,
      sum_c: Long, sum_m: Long, sum_y: Long, sum_k: Long,
      first_c: Int, first_m: Int, first_y: Int, first_k: Int)

  def cmykJpegPixels(b: Array[Byte]): Option[JpegCmykPixels] =
    jpegDecode(b).filter(_.comps == 4).map { img =>
      def sum(p: Array[Int]): Long = {
        var s = 0L; var i = 0
        while (i < p.length) { s += p(i); i += 1 }
        s
      }
      JpegCmykPixels(-1L, img.width, img.height,
        sum(img.planes(0)), sum(img.planes(1)),
        sum(img.planes(2)), sum(img.planes(3)),
        img.planes(0)(0), img.planes(1)(0), img.planes(2)(0), img.planes(3)(0))
    }

  /** Partition-parallel CMYK decode ([[extractJpegPixels]] shape). */
  def extractCmykJpegPixels(
      spark: SparkSession, media: DataFrame): Dataset[JpegCmykPixels] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          cmykJpegPixels(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  /** MSB-first bit writer with JPEG 0xFF00 byte stuffing. */
  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var bits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        bits += 1
        if (bits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0)
          acc = 0; bits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (bits > 0) {
      put(0xff, 8 - bits)
    }
  }

  /** Bit category of a DC difference (T.81 table F.1): 0 for 0, else
    * position of the highest set bit of |v|. */
  private def jpegCategory(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** From-scratch minimal baseline JPEG ENCODER for the fixture path:
    * all-ones quantization table + 8×8-CONSTANT blocks make the lossy
    * format exact here (a constant block's DCT is DC-only — DC = 8·(v−128)
    * survives quant=1 unchanged, and any correct IDCT reproduces v
    * bit-for-bit), so a DuckDB oracle can recompute the decoded statistics
    * from the block formula without a codec. Emits SOI, JFIF APP0, DQT,
    * SOF0 (1×1 sampling), compact custom DHTs (12 DC categories at 4
    * bits; a lone 2-bit EOB in the AC table), optional DRI with RSTn
    * resync, and the DC-predicted entropy stream. Standards-valid: the
    * JDK's ImageIO decodes these fixtures (cross-checked in JpegSpec). */
  private[graft] def jpegEncodeConstantBlocks(
      bw: Int, bh: Int, yb: Array[Int], cb: Array[Int], cr: Array[Int],
      restartInterval: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xe0); be16(16) // JFIF APP0
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); be16(1); be16(1)
    out.write(0); out.write(0)
    marker(0xdb); be16(2 + 1 + 64) // DQT: 8-bit table 0, all ones
    out.write(0)
    for (_ <- 0 until 64) out.write(1)
    val w = bw * 8; val h = bh * 8
    marker(0xc0); be16(8 + 3 * 3) // SOF0, 3 components, 1x1 sampling
    out.write(8); be16(h); be16(w); out.write(3)
    for (c <- 1 to 3) { out.write(c); out.write(0x11); out.write(0) }
    // DC table 0: categories 0..11, all 4-bit codes (canonical 0000..1011)
    marker(0xc4); be16(2 + 17 + 12)
    out.write(0x00)
    for (l <- 1 to 16) out.write(if (l == 4) 12 else 0)
    for (s <- 0 to 11) out.write(s)
    // AC table 0: just EOB (run/size 0x00) as the 2-bit code 00
    marker(0xc4); be16(2 + 17 + 1)
    out.write(0x10)
    for (l <- 1 to 16) out.write(if (l == 2) 1 else 0)
    out.write(0x00)
    if (restartInterval > 0) { marker(0xdd); be16(4); be16(restartInterval) }
    marker(0xda); be16(6 + 2 * 3) // SOS
    out.write(3)
    for (c <- 1 to 3) { out.write(c); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    val bits = new JpegBitWriter(out)
    val preds = new Array[Int](3)
    var mcu = 0
    var rst = 0
    val planes = Array(yb, cb, cr)
    while (mcu < bw * bh) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bits.flush()
        marker(0xd0 + rst); rst = (rst + 1) % 8
        java.util.Arrays.fill(preds, 0)
      }
      var c = 0
      while (c < 3) {
        val dc = 8 * (planes(c)(mcu) - 128)
        val diff = dc - preds(c)
        preds(c) = dc
        val t = jpegCategory(diff)
        bits.put(t, 4) // DC category: canonical 4-bit code == value
        if (t > 0) bits.put(if (diff < 0) diff - 1 else diff, t)
        bits.put(0, 2) // EOB
        c += 1
      }
      mcu += 1
    }
    bits.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** 4-COMPONENT (CMYK) baseline fixture encoder — the Adobe print/
    * scanner class: [[jpegEncodeConstantBlocks]] with four 1×1-sampled
    * components and an Adobe APP14 marker (transform 0 = plain CMYK; a
    * transform-2 YCCK header is the decoder's quarantine case). Same
    * exactness contract: all-ones quant + constant blocks decode
    * bit-for-bit. */
  private[graft] def jpegEncodeCmykConstantBlocks(
      bw: Int, bh: Int, planes: Array[Array[Int]],
      restartInterval: Int, transform: Int = 0): Array[Byte] = {
    require(planes.length == 4)
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xee); be16(14) // Adobe APP14
    out.write("Adobe".getBytes("US-ASCII"))
    be16(100); be16(0); be16(0) // version, flags0, flags1
    out.write(transform)
    marker(0xdb); be16(2 + 1 + 64) // DQT: 8-bit table 0, all ones
    out.write(0)
    for (_ <- 0 until 64) out.write(1)
    val w = bw * 8; val h = bh * 8
    marker(0xc0); be16(8 + 3 * 4) // SOF0, 4 components, 1x1 sampling
    out.write(8); be16(h); be16(w); out.write(4)
    for (c <- 1 to 4) { out.write(c); out.write(0x11); out.write(0) }
    marker(0xc4); be16(2 + 17 + 12) // DC table 0 (see the 3-comp encoder)
    out.write(0x00)
    for (l <- 1 to 16) out.write(if (l == 4) 12 else 0)
    for (t <- 0 to 11) out.write(t)
    marker(0xc4); be16(2 + 17 + 1) // AC table 0: lone EOB
    out.write(0x10)
    for (l <- 1 to 16) out.write(if (l == 2) 1 else 0)
    out.write(0x00)
    if (restartInterval > 0) { marker(0xdd); be16(4); be16(restartInterval) }
    marker(0xda); be16(6 + 2 * 4) // SOS
    out.write(4)
    for (c <- 1 to 4) { out.write(c); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    val bits = new JpegBitWriter(out)
    val preds = new Array[Int](4)
    var mcu = 0
    var rst = 0
    while (mcu < bw * bh) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bits.flush()
        marker(0xd0 + rst); rst = (rst + 1) % 8
        java.util.Arrays.fill(preds, 0)
      }
      var c = 0
      while (c < 4) {
        val dc = 8 * (planes(c)(mcu) - 128)
        val diff = dc - preds(c)
        preds(c) = dc
        val t = jpegCategory(diff)
        bits.put(t, 4)
        if (t > 0) bits.put(if (diff < 0) diff - 1 else diff, t)
        bits.put(0, 2) // EOB
        c += 1
      }
      mcu += 1
    }
    bits.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Fixture adapter for CMYK JPEGs over a four-channel block formula
    * (the C/M/Y ladders reuse the shared pixel formulas; K gets its
    * own), with DRI/RSTn on every fourth doc. */
  def asCmykJpegPayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val bw = 1 + (docId % 3).toInt
          val bh = 1 + (docId % 2).toInt
          def plane(a: Long, bb: Long, cc: Long): Array[Int] =
            Array.tabulate(bw * bh) { i =>
              val bx = i % bw; val by = i / bw
              ((a * docId + bb * bx + cc * by) % 256).toInt
            }
          val planes = Array(
            plane(7, 11, 17), plane(3, 5, 7), plane(5, 13, 3), plane(11, 7, 19))
          (docId, jpegEncodeCmykConstantBlocks(
            bw, bh, planes, if (docId % 4 == 0) bw else 0))
        }
      }.toDF("doc_id", "payload")
  }

  /** Minimal baseline 4:2:0 JPEG ENCODER for the subsampled fixture
    * path: luma sampling 2×2 against 1×1 chroma — the layout real
    * encoders emit by default. Same exactness contract as
    * [[jpegEncodeConstantBlocks]] (all-ones quant + constant blocks →
    * DC-only, bit-exact decode); the entropy stream interleaves each
    * MCU's four Y blocks (raster order) then one Cb and one Cr block.
    * Chroma is constant per IMAGE, so ANY spec-legal upsampling filter
    * reproduces it exactly — the oracle needs no filter model and an
    * independent decoder (ImageIO, JpegSpec) agrees bit-for-bit.
    * `yBlocks` indexes the (2·mcusX)×(2·mcusY) luma block grid. */
  private[graft] def jpegEncodeSubsampled420(
      mcusX: Int, mcusY: Int, yBlocks: Array[Int], cbConst: Int,
      crConst: Int, restartInterval: Int): Array[Byte] =
    jpegEncodeSubsampled(mcusX, mcusY, 2, 2, yBlocks, cbConst, crConst,
      restartInterval)

  /** Generalized subsampled fixture encoder: luma sampling `hY`×`vY`
    * (1–2 each; (2,2)=4:2:0, (2,1)=4:2:2, (1,2)=4:4:0) against 1×1
    * chroma. `yBlocks` indexes the (hY·mcusX)×(vY·mcusY) luma grid. */
  private[graft] def jpegEncodeSubsampled(
      mcusX: Int, mcusY: Int, hY: Int, vY: Int, yBlocks: Array[Int],
      cbConst: Int, crConst: Int, restartInterval: Int): Array[Byte] = {
    require(hY >= 1 && hY <= 2 && vY >= 1 && vY <= 2 && hY * vY > 1)
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xe0); be16(16) // JFIF APP0
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); be16(1); be16(1)
    out.write(0); out.write(0)
    marker(0xdb); be16(2 + 1 + 64) // DQT: 8-bit table 0, all ones
    out.write(0)
    for (_ <- 0 until 64) out.write(1)
    val w = mcusX * 8 * hY; val h = mcusY * 8 * vY
    marker(0xc0); be16(8 + 3 * 3) // SOF0: Y hYxvY, Cb/Cr 1x1
    out.write(8); be16(h); be16(w); out.write(3)
    out.write(1); out.write((hY << 4) | vY); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    marker(0xc4); be16(2 + 17 + 12) // DC table 0 (see 4:4:4 encoder)
    out.write(0x00)
    for (l <- 1 to 16) out.write(if (l == 4) 12 else 0)
    for (s <- 0 to 11) out.write(s)
    marker(0xc4); be16(2 + 17 + 1) // AC table 0: lone EOB
    out.write(0x10)
    for (l <- 1 to 16) out.write(if (l == 2) 1 else 0)
    out.write(0x00)
    if (restartInterval > 0) { marker(0xdd); be16(4); be16(restartInterval) }
    marker(0xda); be16(6 + 2 * 3) // SOS
    out.write(3)
    for (c <- 1 to 3) { out.write(c); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    val bits = new JpegBitWriter(out)
    val preds = new Array[Int](3)
    def putDc(c: Int, value: Int): Unit = {
      val dc = 8 * (value - 128)
      val diff = dc - preds(c)
      preds(c) = dc
      val t = jpegCategory(diff)
      bits.put(t, 4)
      if (t > 0) bits.put(if (diff < 0) diff - 1 else diff, t)
      bits.put(0, 2) // EOB
    }
    val ybw = hY * mcusX
    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bits.flush()
          marker(0xd0 + rst); rst = (rst + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        var vb = 0
        while (vb < vY) {
          var hb = 0
          while (hb < hY) {
            putDc(0, yBlocks((vY * my + vb) * ybw + (hY * mx + hb)))
            hb += 1
          }
          vb += 1
        }
        putDc(1, cbConst)
        putDc(2, crConst)
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bits.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Minimal PROGRESSIVE (SOF2) 4:2:0 fixture encoder: the same
    * exactness contract as the baseline fixtures (all-ones quant +
    * constant blocks → DC-only, bit-exact decode) laid out as a REAL
    * multi-scan progressive file — an interleaved DC-first scan with
    * successive-approximation point transform Al=4, a DC refinement
    * scan supplying bit 3 (nonzero for odd sample values, so real
    * correction bits sit under the oracle hash; DC is a multiple of 8,
    * so the remaining bits are provably zero and the approximation is
    * EXACT at Al=3), and one all-EOB AC band scan per component.
    * Optional DRI lattice exercises the progressive restart path. */
  private[graft] def jpegEncodeProgressive420(
      mcusX: Int, mcusY: Int, yBlocks: Array[Int], cbConst: Int,
      crConst: Int, restartInterval: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xe0); be16(16) // JFIF APP0
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); be16(1); be16(1)
    out.write(0); out.write(0)
    marker(0xdb); be16(2 + 1 + 64) // DQT: 8-bit table 0, all ones
    out.write(0)
    for (_ <- 0 until 64) out.write(1)
    val w = mcusX * 16; val h = mcusY * 16
    marker(0xc2); be16(8 + 3 * 3) // SOF2: Y 2x2, Cb/Cr 1x1 (4:2:0)
    out.write(8); be16(h); be16(w); out.write(3)
    out.write(1); out.write(0x22); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    marker(0xc4); be16(2 + 17 + 12) // DC table 0 (4-bit categories)
    out.write(0x00)
    for (l <- 1 to 16) out.write(if (l == 4) 12 else 0)
    for (s <- 0 to 11) out.write(s)
    marker(0xc4); be16(2 + 17 + 1) // AC table 0: lone EOB
    out.write(0x10)
    for (l <- 1 to 16) out.write(if (l == 2) 1 else 0)
    out.write(0x00)
    if (restartInterval > 0) { marker(0xdd); be16(4); be16(restartInterval) }
    val ybw = 2 * mcusX
    def dcOf(v: Int) = 8 * (v - 128)
    // scan 1: interleaved DC first, Ah=0 Al=4 — encodes diffs of dc>>4
    locally {
      marker(0xda); be16(6 + 2 * 3)
      out.write(3)
      for (c <- 1 to 3) { out.write(c); out.write(0x00) }
      out.write(0); out.write(0); out.write(0x04) // Ss=0 Se=0 Ah=0 Al=4
      val bits = new JpegBitWriter(out)
      val preds = new Array[Int](3)
      var mcu = 0; var rst = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            bits.flush()
            marker(0xd0 + rst); rst = (rst + 1) % 8
            java.util.Arrays.fill(preds, 0)
          }
          def putDcApprox(c: Int, value: Int): Unit = {
            val approx = dcOf(value) >> 4
            val diff = approx - preds(c)
            preds(c) = approx
            val t = jpegCategory(diff)
            bits.put(t, 4)
            if (t > 0) bits.put(if (diff < 0) diff - 1 else diff, t)
          }
          for (vb <- 0 until 2; hb <- 0 until 2)
            putDcApprox(0, yBlocks((2 * my + vb) * ybw + (2 * mx + hb)))
          putDcApprox(1, cbConst)
          putDcApprox(2, crConst)
          mcu += 1
          mx += 1
        }
        my += 1
      }
      bits.flush()
    }
    // scan 2: interleaved DC refinement, Ah=4 Al=3 — one raw bit (bit 3)
    locally {
      marker(0xda); be16(6 + 2 * 3)
      out.write(3)
      for (c <- 1 to 3) { out.write(c); out.write(0x00) }
      out.write(0); out.write(0); out.write(0x43) // Ah=4 Al=3
      val bits = new JpegBitWriter(out)
      var mcu = 0; var rst = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            bits.flush()
            marker(0xd0 + rst); rst = (rst + 1) % 8
          }
          def putBit(value: Int): Unit =
            bits.put((dcOf(value) >> 3) & 1, 1)
          for (vb <- 0 until 2; hb <- 0 until 2)
            putBit(yBlocks((2 * my + vb) * ybw + (2 * mx + hb)))
          putBit(cbConst)
          putBit(crConst)
          mcu += 1
          mx += 1
        }
        my += 1
      }
      bits.flush()
    }
    // scans 3-5: per-component AC band 1..63, all blocks EOB (AC is zero)
    for (c <- 1 to 3) {
      marker(0xda); be16(6 + 2)
      out.write(1); out.write(c); out.write(0x00)
      out.write(1); out.write(63); out.write(0x00) // Ss=1 Se=63 Ah=0 Al=0
      val nBlocks =
        if (c == 1) (2 * mcusX) * (2 * mcusY) else mcusX * mcusY
      val bits = new JpegBitWriter(out)
      var blk = 0; var rst = 0
      while (blk < nBlocks) {
        if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
          bits.flush()
          marker(0xd0 + rst); rst = (rst + 1) % 8
        }
        bits.put(0, 2) // EOB
        blk += 1
      }
      bits.flush()
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Fixture adapter for the PROGRESSIVE 4:2:0 path (same formulas as
    * [[asJpeg420Payload]], so the same oracle shape replays it). */
  def asJpegProgressivePayload(
      spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val mcusX = 1 + (docId % 2).toInt
          val mcusY = 1 + (docId % 3).toInt
          val ybw = 2 * mcusX
          val yb = Array.tabulate(ybw * 2 * mcusY) { i =>
            val bx = i % ybw; val by = i / ybw
            ((7 * docId + 11 * bx + 17 * by) % 256).toInt
          }
          val dri = if (docId % 4 == 0) 1 else 0
          (docId, jpegEncodeProgressive420(mcusX, mcusY, yb,
            ((3 * docId) % 256).toInt, ((5 * docId) % 256).toInt, dri))
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter for the 4:2:0 path: REAL chroma-subsampled baseline
    * JPEGs whose luma blocks derive from the row id
    * (Y=(7·id+11·bx+17·by)%256 over a (2–4)×(2–6) luma block grid) and
    * whose chroma planes are per-image constants (Cb=3·id%256,
    * Cr=5·id%256 — exact under any upsampling filter). Every fourth doc
    * adds a restart lattice. The oracle recomputes the decoded
    * statistics from the formulas without a codec. */
  def asJpeg420Payload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val mcusX = 1 + (docId % 2).toInt
          val mcusY = 1 + (docId % 3).toInt
          val ybw = 2 * mcusX
          val yb = Array.tabulate(ybw * 2 * mcusY) { i =>
            val bx = i % ybw; val by = i / ybw
            ((7 * docId + 11 * bx + 17 * by) % 256).toInt
          }
          val dri = if (docId % 4 == 0) 1 else 0
          (docId, jpegEncodeSubsampled420(mcusX, mcusY, yb,
            ((3 * docId) % 256).toInt, ((5 * docId) % 256).toInt, dri))
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter (the JPEG sibling of [[asGifPayload]]): emit REAL
    * baseline JPEGs of 8×8-constant blocks whose Y/Cb/Cr values derive
    * from the row id — Y=(7·id+11·bx+17·by)%256, Cb=(3·id+5·bx+7·by)%256,
    * Cr=(5·id+13·bx+3·by)%256 over a (1–3)×(1–2) block grid — so an
    * oracle recomputes the decoded statistics from the formula WITHOUT
    * parsing. The block walk exercises DC prediction across every
    * category boundary; every fourth row adds a DRI/RSTn restart lattice.
    * [[jpegDecode]] never sees the formula — it reads only bytes. */
  def asJpegPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val bw = 1 + (docId % 3).toInt
          val bh = 1 + (docId % 2).toInt
          def plane(a: Long, b: Long, c: Long): Array[Int] =
            Array.tabulate(bw * bh) { i =>
              val bx = i % bw; val by = i / bw
              ((a * docId + b * bx + c * by) % 256).toInt
            }
          val dri = if (docId % 4 == 0) bw else 0
          (docId, jpegEncodeConstantBlocks(
            bw, bh, plane(7, 11, 17), plane(3, 5, 7), plane(5, 13, 3), dri))
        }
      }.toDF("doc_id", "payload")
  }

  /** Partition-parallel JPEG pixel decode ([[extractGifPixels]] shape):
    * unrecognized/lossless/arithmetic payloads are dropped
    * (chroma-subsampled baselines AND progressive files decode since
    * round 8). */
  def extractJpegPixels(spark: SparkSession, media: DataFrame): Dataset[JpegPixels] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          jpegPixels(bytes).map(_.copy(doc_id = id))
        }
      }
  }

  // --------------------------------------------------------------------
  // PCM sample decode + audio quality statistics (the audio sibling of
  // the pixel decoders: [[wavMeta]] reads only the container header —
  // this layer decodes the actual 16-bit samples and computes the
  // quality measures an audio-corpus filter runs at 100 TB: loudness
  // energy, peak, clipping, silence, DC offset, zero-crossing rate).
  // All statistics are INTEGER-exact so the DuckDB oracle hash-matches
  // without any floating-point strategy.
  // --------------------------------------------------------------------

  /** Decoded PCM quality statistics of one 16-bit WAV payload. All
    * counts/sums are exact integers over the interleaved sample stream:
    *  - `peak` = max |s|; `sum_sq`/`dc_sum` = Σ s², Σ s (energy + offset),
    *  - `clip_count` = #{|s| ≥ 32700} (hard-limited samples),
    *  - `silence_count` = #{|s| < 64} (≈ −54 dBFS floor),
    *  - `zero_crossings` = #{i>0 : sign(sᵢ) ≠ sign(sᵢ₋₁)} with
    *    sign(s) = [s ≥ 0] — the exact-integer pitch/activity proxy. */
  final case class AudioPcm(
      doc_id: Long,
      channels: Int,
      n_samples: Int,
      peak: Int,
      sum_sq: Long,
      dc_sum: Long,
      clip_count: Int,
      silence_count: Int,
      zero_crossings: Int)

  /** Offset and length of the `data` chunk's body (Long-safe walk). */
  private def wavDataChunk(b: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    var i = 12L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val size = le32(at + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (cc(at) == "data") return Some((at + 8, size))
      i += 8L + size + (size & 1)
    }
    None
  }

  /** IMA ADPCM step/index tables (IMA recommended practice / RFC 3551
    * appendix — the public fixed tables every implementation shares). */
  private val AdpcmStep = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val AdpcmIndex = Array(-1, -1, -1, -1, 2, 4, 6, 8,
    -1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode one IMA ADPCM nibble against (predictor, stepIndex) state;
    * returns the new state. The exact-integer reference recurrence:
    * diff = (step>>3) + bit-gated step/2, step/4, step, sign from bit 3. */
  private[graft] def adpcmStep(pred: Int, idx: Int, nibble: Int): (Int, Int) = {
    val step = AdpcmStep(idx)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + AdpcmIndex(nibble)))
    (p, i)
  }

  /** Decode an IMA ADPCM `data` body to interleaved 16-bit samples.
    * Block layout (IMA WAV mapping): per channel a 4-byte header
    * (predictor int16 LE — itself the first output sample — then step
    * index, then a reserved byte), followed by 4-byte words of 8 nibbles
    * ROTATING across channels; nibbles decode low-then-high. A trailing
    * partial block decodes as far as its full 4-byte channel words
    * reach. */
  private def adpcmDecode(
      b: Array[Byte], off: Int, len: Int, channels: Int, blockAlign: Int)
      : Option[Array[Short]] = {
    if (channels < 1 || channels > 2) return None
    if (blockAlign < channels * 8 || blockAlign % (4 * channels) != 0)
      return None
    def u8(i: Int) = b(i) & 0xff
    val out = scala.collection.mutable.ArrayBuffer.empty[Short]
    var blk = off
    while (blk + channels * 4 <= off + len) {
      val blockEnd = math.min(blk + blockAlign, off + len)
      val pred = new Array[Int](channels)
      val idx = new Array[Int](channels)
      var c = 0
      while (c < channels) {
        val h = blk + c * 4
        pred(c) = ((u8(h) | (b(h + 1) << 8)).toShort).toInt
        idx(c) = u8(h + 2)
        if (idx(c) > 88) return None
        out += pred(c).toShort // the header predictor IS sample 0
        c += 1
      }
      // interleave buffer: per 4-byte channel word = 8 samples/channel
      var p = blk + channels * 4
      while (p + channels * 4 <= blockEnd) {
        // decode this word group: 8 samples per channel, then interleave
        val group = Array.ofDim[Short](channels, 8)
        c = 0
        while (c < channels) {
          var k = 0
          while (k < 4) {
            val byte = u8(p + c * 4 + k)
            val (p1, i1) = adpcmStep(pred(c), idx(c), byte & 0xf)
            pred(c) = p1; idx(c) = i1
            group(c)(k * 2) = p1.toShort
            val (p2, i2) = adpcmStep(pred(c), idx(c), byte >> 4)
            pred(c) = p2; idx(c) = i2
            group(c)(k * 2 + 1) = p2.toShort
            k += 1
          }
          c += 1
        }
        var s = 0
        while (s < 8) {
          c = 0
          while (c < channels) { out += group(c)(s); c += 1 }
          s += 1
        }
        p += channels * 4
      }
      blk += blockAlign
    }
    if (out.isEmpty) None else Some(out.toArray)
  }

  /** Decode a WAV payload's samples to interleaved 16-bit, dispatching
    * on the `fmt ` tag: integer PCM (16-bit LE), IEEE FLOAT (32-bit LE,
    * mapped by round(f·32768) clamped — the standard float↔int scale),
    * or IMA ADPCM (4-bit, block-predictive). Returns (channels,
    * samples); anything else — including out-of-scope widths — is None,
    * the quarantine lane. */
  def wavPcm(b: Array[Byte]): Option[(Int, Array[Short])] = {
    wavMeta(b).flatMap { m =>
      for {
        (tag, ch, blockAlign) <- wavFmtTag(b)
        (off, len) <- wavDataChunk(b)
        samples <- tag match {
          // integer PCM: every width normalizes to the 16-bit lattice the
          // quality battery runs on — 8-bit unsigned shifts up ((u−128)·256),
          // 24/32-bit take their high 16 bits (the standard downscale)
          case 1 if m.bits == 8 =>
            val s = new Array[Short](len)
            var j = 0
            while (j < len) {
              s(j) = (((b(off + j) & 0xff) - 128) << 8).toShort
              j += 1
            }
            Some(s)
          case 1 if m.bits == 16 && len % 2 == 0 =>
            val n = len / 2
            val s = new Array[Short](n)
            var j = 0
            while (j < n) {
              s(j) = ((b(off + 2 * j) & 0xff) | (b(off + 2 * j + 1) << 8)).toShort
              j += 1
            }
            Some(s)
          case 1 if m.bits == 24 && len % 3 == 0 =>
            val n = len / 3
            val s = new Array[Short](n)
            var j = 0
            while (j < n) {
              val v = (b(off + 3 * j) & 0xff) |
                ((b(off + 3 * j + 1) & 0xff) << 8) |
                (b(off + 3 * j + 2) << 16) // sign-extends
              s(j) = (v >> 8).toShort
              j += 1
            }
            Some(s)
          case 1 if m.bits == 32 && len % 4 == 0 =>
            val n = len / 4
            val s = new Array[Short](n)
            var j = 0
            while (j < n) {
              val v = (b(off + 4 * j) & 0xff) |
                ((b(off + 4 * j + 1) & 0xff) << 8) |
                ((b(off + 4 * j + 2) & 0xff) << 16) |
                (b(off + 4 * j + 3) << 24)
              s(j) = (v >> 16).toShort
              j += 1
            }
            Some(s)
          case 3 if len % 4 == 0 =>
            val n = len / 4
            val s = new Array[Short](n)
            var j = 0
            while (j < n) {
              val bits = (b(off + 4 * j) & 0xff) |
                ((b(off + 4 * j + 1) & 0xff) << 8) |
                ((b(off + 4 * j + 2) & 0xff) << 16) |
                (b(off + 4 * j + 3) << 24)
              val f = java.lang.Float.intBitsToFloat(bits)
              if (f.isNaN) return None // malformed stream, not clippable
              val v = math.round(f * 32768f)
              s(j) = math.max(-32768, math.min(32767, v)).toShort
              j += 1
            }
            Some(s)
          // G.711 µ-law (tag 7): CCITT expansion — complement, then
          // magnitude ((mant<<3)+BIAS)<<seg with BIAS=0x84, already on
          // the 16-bit lattice (max ±32124)
          case 7 =>
            val s = new Array[Short](len)
            var j = 0
            while (j < len) {
              val u = (~b(off + j)) & 0xff
              val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
              s(j) = (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
              j += 1
            }
            Some(s)
          // G.711 A-law (tag 6): XOR 0x55, segment expansion; the sign
          // bit SET means positive (max ±32256)
          case 6 =>
            val s = new Array[Short](len)
            var j = 0
            while (j < len) {
              val a = (b(off + j) ^ 0x55) & 0xff
              val seg = (a >> 4) & 7
              var t = (a & 0x0f) << 4
              if (seg == 0) t += 8
              else if (seg == 1) t += 0x108
              else t = (t + 0x108) << (seg - 1)
              s(j) = (if ((a & 0x80) != 0) t else -t).toShort
              j += 1
            }
            Some(s)
          case 0x11 => adpcmDecode(b, off, len, ch, blockAlign)
          case _ => None
        }
      } yield (m.channels, samples)
    }
  }

  /** One-pass integer quality statistics over a decoded sample stream. */
  def pcmStats(docId: Long, channels: Int, s: Array[Short]): AudioPcm = {
    var peak = 0; var sumSq = 0L; var dc = 0L
    var clip = 0; var silent = 0; var zc = 0
    var i = 0
    while (i < s.length) {
      val v = s(i).toInt
      val a = math.abs(v)
      if (a > peak) peak = a
      sumSq += v.toLong * v
      dc += v
      if (a >= 32700) clip += 1
      if (a < 64) silent += 1
      if (i > 0 && (v >= 0) != (s(i - 1) >= 0)) zc += 1
      i += 1
    }
    AudioPcm(docId, channels, s.length, peak, sumSq, dc, clip, silent, zc)
  }

  /** Fixture adapter (the audio sibling of [[asBmpPayload]]): REAL 16-bit
    * PCM WAV containers whose SAMPLES derive from the row id —
    * n = 128 + (id%8)·32 interleaved samples over 1 + id%2 channels, and
    *   s(i) = (id·7919 + i·2641) mod D − D/2,  D = 65536 / 16^(id mod 4)
    * (full-scale, −24 dBFS, −48 dBFS, −72 dBFS amplitude tiers — so the
    * corpus genuinely mixes loud/clipping docs with silent ones and a
    * quality gate has real work to do). Every operation is non-negative
    * integer arithmetic, so DuckDB recomputes any statistic exactly
    * WITHOUT parsing bytes; the decode side ([[wavPcm]]) never sees the
    * formula — a byte-layout bug (endianness, chunk offset, interleave)
    * breaks the hash. */
  def asPcmWavPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val channels = 1 + (docId % 2).toInt
          val n = 128 + (docId % 8).toInt * 32
          val div = 65536 >> (4 * (docId % 4).toInt)
          val rate = 16000
          val blockAlign = channels * 2
          val buf = java.nio.ByteBuffer.allocate(44 + 2 * n)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII"))
          buf.putInt(36 + 2 * n)
          buf.put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII"))
          buf.putInt(16)
          buf.putShort(1)
          buf.putShort(channels.toShort)
          buf.putInt(rate)
          buf.putInt(rate * blockAlign)
          buf.putShort(blockAlign.toShort)
          buf.putShort(16)
          buf.put("data".getBytes("US-ASCII"))
          buf.putInt(2 * n)
          var i = 0
          while (i < n) {
            buf.putShort((((docId * 7919 + i.toLong * 2641) % div) - div / 2).toShort)
            i += 1
          }
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter for IEEE-FLOAT WAVs (format tag 3, 32-bit): the
    * samples are `k/32768f` with the SAME integer ladder the PCM fixture
    * uses — every such float is exactly representable and the decoder's
    * `round(f·32768)` maps it back to exactly `k`, so the float leg
    * shares the PCM oracle formula while exercising the tag-3 parse,
    * 4-byte stride, and IEEE-754 bit decode. */
  def asFloatWavPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val channels = 1 + (docId % 2).toInt
          val n = 128 + (docId % 8).toInt * 32
          val div = 65536 >> (4 * (docId % 4).toInt)
          val rate = 16000
          val blockAlign = channels * 4
          val buf = java.nio.ByteBuffer.allocate(44 + 4 * n)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII"))
          buf.putInt(36 + 4 * n)
          buf.put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII"))
          buf.putInt(16)
          buf.putShort(3) // IEEE float
          buf.putShort(channels.toShort)
          buf.putInt(rate)
          buf.putInt(rate * blockAlign)
          buf.putShort(blockAlign.toShort)
          buf.putShort(32)
          buf.put("data".getBytes("US-ASCII"))
          buf.putInt(4 * n)
          var i = 0
          while (i < n) {
            val k = ((docId * 7919 + i.toLong * 2641) % div) - div / 2
            buf.putFloat(k / 32768f)
            i += 1
          }
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter for IMA ADPCM WAVs (format tag 0x11, 4-bit): each
    * block's per-channel header predictor derives from the row id
    * (`((id·7919 + c·997) % 65536) − 32768`) and every nibble is 0 — at
    * step index 0 a zero nibble has diff = step>>3 = 0, so the decoded
    * stream is EXACTLY the channel predictors repeated, which DuckDB
    * recomputes without a codec. The layout still exercises the whole
    * container path: block walk, per-channel 4-byte headers, 4-byte
    * word channel rotation, nibble unpack, table clamp at index 0.
    * (Step ADAPTATION under non-zero nibbles is pinned by
    * MultimodalSpec's independent-reference cross-check.) */
  /** Fixture adapter for G.711 WAVs (format tags 7 = µ-law, 6 = A-law,
    * alternating by row id — the telephony/call-center corpora): the
    * 8-bit codewords derive from the row id (`(id·31 + i·7) mod 256`),
    * so DuckDB recomputes the decoded 16-bit samples with the CCITT
    * expansion ARITHMETIC (complement/XOR, segment shift, bias — pure
    * integer CASE math, no codec) and the one oracle covers both
    * companding laws, the codeword→linear tables, and the container
    * walk. AudioPcmSpec pins the expansion against javax.sound's own
    * ULAW/ALAW converters. */
  def asG711WavPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val mulaw = docId % 2 == 0
          val channels = 1 + ((docId / 2) % 2).toInt
          val n = 128 + (docId % 8).toInt * 32
          val rate = 8000
          val blockAlign = channels
          val buf = java.nio.ByteBuffer.allocate(44 + n)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII"))
          buf.putInt(36 + n)
          buf.put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII"))
          buf.putInt(16)
          buf.putShort(if (mulaw) 7 else 6)
          buf.putShort(channels.toShort)
          buf.putInt(rate)
          buf.putInt(rate * blockAlign)
          buf.putShort(blockAlign.toShort)
          buf.putShort(8)
          buf.put("data".getBytes("US-ASCII"))
          buf.putInt(n)
          var i = 0
          while (i < n) {
            buf.put(((docId * 31 + i.toLong * 7) % 256).toByte)
            i += 1
          }
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  def asAdpcmWavPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val channels = 1 + (docId % 2).toInt
          val nBlocks = 1 + (docId % 3).toInt
          val blockAlign = 12 * channels // 4-byte header + 8 data bytes/ch
          val rate = 8000
          val dataLen = nBlocks * blockAlign
          val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII"))
          buf.putInt(36 + dataLen)
          buf.put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII"))
          buf.putInt(16)
          buf.putShort(0x11) // IMA ADPCM
          buf.putShort(channels.toShort)
          buf.putInt(rate)
          buf.putInt(rate * blockAlign / 2)
          buf.putShort(blockAlign.toShort)
          buf.putShort(4)
          buf.put("data".getBytes("US-ASCII"))
          buf.putInt(dataLen)
          for (_ <- 0 until nBlocks) {
            for (c <- 0 until channels) {
              val p = (((docId * 7919 + c * 997) % 65536) - 32768).toShort
              buf.putShort(p) // predictor = first output sample
              buf.put(0.toByte) // step index 0
              buf.put(0.toByte) // reserved
            }
            for (_ <- 0 until 8 * channels) buf.put(0.toByte) // zero nibbles
          }
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Fixture adapter for the INTEGER-PCM WIDTH MATRIX (8/24/32-bit plus
    * a WAVE_FORMAT_EXTENSIBLE-wrapped 24-bit lane, rotating by row id):
    * samples are stored so the decoder's width normalization recovers an
    * exact 16-bit formula value — 8-bit stores the raw formula byte `u`
    * (decodes to `(u−128)·256`), 24-bit stores `k·256` (high-16 = `k`),
    * 32-bit stores `k·65536`, and the extensible lane wraps the 24-bit
    * layout in a tag-0xFFFE header whose SubFormat GUID carries PCM — so
    * DuckDB replays every statistic from the formula while the bytes
    * exercise each width's stride, sign extension, and the GUID unwrap. */
  def asWidthWavPayload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val lane = (docId % 4).toInt // 0=8-bit 1=24-bit 2=32-bit 3=ext24
          val channels = 1 + (docId % 2).toInt
          val n = 96 + (docId % 8).toInt * 16
          val rate = 16000
          val bits = lane match {
            case 0 => 8
            case 2 => 32
            case _ => 24
          }
          val bytesPer = bits / 8
          val blockAlign = channels * bytesPer
          val ext = lane == 3
          val fmtSize = if (ext) 40 else 16
          val buf = java.nio.ByteBuffer
            .allocate(20 + fmtSize + 8 + bytesPer * n)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII"))
          buf.putInt(12 + fmtSize + 8 + bytesPer * n)
          buf.put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII"))
          buf.putInt(fmtSize)
          buf.putShort(if (ext) 0xFFFE.toShort else 1)
          buf.putShort(channels.toShort)
          buf.putInt(rate)
          buf.putInt(rate * blockAlign)
          buf.putShort(blockAlign.toShort)
          buf.putShort(bits.toShort)
          if (ext) {
            buf.putShort(22) // cbSize
            buf.putShort(24) // valid bits
            buf.putInt(0) // channel mask
            // KSDATAFORMAT_SUBTYPE_PCM: 00000001-0000-0010-8000-00aa00389b71
            buf.putShort(1) // the wrapped codec tag
            buf.put(Array[Byte](0, 0, 0, 0, 0x10, 0,
              0x80.toByte, 0, 0, 0xAA.toByte, 0, 0x38, 0x9B.toByte, 0x71))
          }
          buf.put("data".getBytes("US-ASCII"))
          buf.putInt(bytesPer * n)
          var i = 0
          while (i < n) {
            lane match {
              case 0 => // stored unsigned byte u → decodes to (u−128)·256
                buf.put(((docId * 7919 + i.toLong * 2641) % 256).toByte)
              case 2 =>
                val k = ((docId * 7919 + i.toLong * 2641) % 65536 - 32768).toInt
                buf.putInt(k << 16)
              case _ => // 24-bit LE of k·256
                val k = ((docId * 7919 + i.toLong * 2641) % 65536 - 32768).toInt
                val v = k * 256
                buf.put((v & 0xff).toByte)
                buf.put(((v >> 8) & 0xff).toByte)
                buf.put(((v >> 16) & 0xff).toByte)
            }
            i += 1
          }
          (docId, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Partition-parallel PCM decode + quality stats ([[extractBmpPixels]]
    * shape): per-payload byte work, zero shuffle; integer-PCM (8/16/24/
    * 32-bit, extensible-wrapped included), IEEE-float, and IMA-ADPCM
    * containers all decode ([[wavPcm]]'s dispatch); out-of-scope widths
    * or malformed containers drop (quarantine lane). */
  def extractAudioPcm(spark: SparkSession, media: DataFrame): Dataset[AudioPcm] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          wavPcm(bytes).map { case (ch, s) => pcmStats(id, ch, s) }
        }
      }
  }

  // --------------------------------------------------------------------
  // REAL video frame extraction: MP4 sample tables (ISO/IEC 14496-12
  // stsd/stsz/stsc/stco) locate each frame's byte range, and the
  // from-scratch T.81 codec decodes MJPEG frames — the video leg joins
  // BMP/PNG/GIF/JPEG/WAV as fully decoded, not just container-parsed.
  // --------------------------------------------------------------------

  /** One decoded MJPEG frame's pixel statistics (the video sibling of
    * [[JpegPixels]]; coded-color-space stats for the same oracle
    * reason). */
  final case class VideoFrame(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      sum_y: Long,
      sum_cb: Long,
      sum_cr: Long,
      first_y: Int,
      first_cb: Int,
      first_cr: Int)

  /** Slice an MP4's samples via its REAL sample tables: walk
    * moov/trak/mdia/minf/stbl, require a 'jpeg' sample description
    * (non-MJPEG codecs quarantine — routing happens before decode),
    * read sizes from stsz, chunk offsets from stco (one sample per
    * chunk, confirmed against stsc), and return each frame's bytes.
    * Long-safe bounds throughout; any malformation → None. */
  def mp4JpegFrames(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    // first direct child box `tp` of [from, until); size==1 largesize
    // boxes (16-byte header) are stepped over, size==0 runs to `until`
    def child(from: Long, until: Long, tp: String): Option[(Long, Long)] = {
      var i = from
      while (i + 8 <= until) {
        val raw = be32(i.toInt)
        val hdr = if (raw == 1) 16L else 8L
        val size =
          if (raw == 1) { if (i + 16 > until) return None; be64(i.toInt + 8) }
          else if (raw == 0) until - i
          else raw
        if (size < hdr || i + size > until) return None
        if (cc(i.toInt + 4) == tp) return Some((i + hdr, i + size))
        i += size
      }
      None
    }
    if (b.length < 12 || cc(4) != "ftyp") return None
    for {
      (moovB, moovE) <- child(0, b.length, "moov")
      (trakB, trakE) <- child(moovB, moovE, "trak")
      (mdiaB, mdiaE) <- child(trakB, trakE, "mdia")
      (minfB, minfE) <- child(mdiaB, mdiaE, "minf")
      (stblB, stblE) <- child(minfB, minfE, "stbl")
      (stsdB, stsdE) <- child(stblB, stblE, "stsd")
      // stsd: ver/flags, entry_count, then the first sample entry box —
      // its fourcc is the codec; only 'jpeg' proceeds to decode
      if stsdB + 16 <= stsdE && cc(stsdB.toInt + 12) == "jpeg"
      (stszB, stszE) <- child(stblB, stblE, "stsz")
      (stscB, stscE) <- child(stblB, stblE, "stsc")
      (stcoB, stcoE) <- child(stblB, stblE, "stco")
      frames <- {
        val fixed = be32(stszB.toInt + 4)
        val n = be32(stszB.toInt + 8)
        val stscN = be32(stscB.toInt + 4)
        val stcoN = be32(stcoB.toInt + 4)
        val ok = n > 0 && n <= 100000 && stcoN == n &&
          stszB + 12 + (if (fixed == 0) 4 * n else 0) <= stszE &&
          stcoB + 8 + 4 * n <= stcoE &&
          // every stsc run must map one sample per chunk
          stscB + 8 + 12 * stscN <= stscE &&
          (0L until stscN).forall(e => be32(stscB.toInt + 12 + 12 * e.toInt) == 1L)
        if (!ok) None
        else {
          val out = Vector.newBuilder[Array[Byte]]
          var i = 0
          var good = true
          while (good && i < n) {
            val size =
              if (fixed != 0) fixed else be32(stszB.toInt + 12 + 4 * i)
            val off = be32(stcoB.toInt + 8 + 4 * i)
            if (size <= 0 || off < 0 || off + size > b.length) good = false
            else out += java.util.Arrays.copyOfRange(
              b, off.toInt, (off + size).toInt)
            i += 1
          }
          if (good) Some(out.result()) else None
        }
      }
    } yield frames
  }

  /** Fixture adapter: REAL MJPEG-in-MP4 containers — ftyp, a moov whose
    * stbl carries genuine stsd('jpeg')/stsz/stsc/stco tables, and an mdat
    * of concatenated [[jpegEncodeConstantBlocks]] frames whose planes
    * derive from (row id, frame idx):
    *   y = (7·id + 11·bx + 17·by + 23·f) mod 256  (cb/cr analogous),
    * n = 2 + id%3 frames of (1+id%3)×(1+id%2) blocks. The oracle
    * recomputes every frame statistic from the formula without a codec;
    * the decoder sees only bytes — a sample-table or entropy bug breaks
    * the hash. */
  def asMjpegMp4Payload(spark: SparkSession, df: DataFrame, id: String): DataFrame = {
    import spark.implicits._
    Partitioning.spread(df.select(col(id).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { docId =>
          val bw = 1 + (docId % 3).toInt
          val bh = 1 + (docId % 2).toInt
          val n = 2 + (docId % 3).toInt
          def plane(a: Long, bq: Long, c: Long, f: Int): Array[Int] =
            Array.tabulate(bw * bh) { i =>
              val bx = i % bw; val by = i / bw
              ((a * docId + bq * bx + c * by + 23L * f) % 256).toInt
            }
          val frames = (0 until n).map { f =>
            jpegEncodeConstantBlocks(bw, bh,
              plane(7, 11, 17, f),
              Array.tabulate(bw * bh) { i =>
                val bx = i % bw; val by = i / bw
                ((3 * docId + 5 * bx + 7 * by + 29L * f) % 256).toInt
              },
              Array.tabulate(bw * bh) { i =>
                val bx = i % bw; val by = i / bw
                ((5 * docId + 13 * bx + 3 * by + 31L * f) % 256).toInt
              }, 0)
          }
          def box(tp: String, body: Array[Byte]): Array[Byte] = {
            val buf = java.nio.ByteBuffer.allocate(8 + body.length)
              .order(java.nio.ByteOrder.BIG_ENDIAN)
            buf.putInt(8 + body.length)
            buf.put(tp.getBytes("US-ASCII"))
            buf.put(body)
            buf.array()
          }
          def be(vs: Seq[Int]): Array[Byte] = {
            val buf = java.nio.ByteBuffer.allocate(4 * vs.length)
            vs.foreach(buf.putInt)
            buf.array()
          }
          val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(8)
            .put("isom".getBytes("US-ASCII")).putInt(512).array())
          val timescale = 600
          val mvhd = {
            val buf = java.nio.ByteBuffer.allocate(100)
            buf.putInt(0).putInt(0).putInt(0)
            buf.putInt(timescale).putInt(timescale * n / 3)
            buf.array()
          }
          val tkhd = {
            val buf = java.nio.ByteBuffer.allocate(84)
            buf.putInt(0).putInt(0).putInt(0).putInt(1)
            buf.position(76)
            buf.putInt((bw * 8) << 16).putInt((bh * 8) << 16)
            buf.array()
          }
          val stsd = box("stsd",
            be(Seq(0, 1)) ++ box("jpeg", new Array[Byte](78)))
          val stsz = box("stsz",
            be(Seq(0, 0, n) ++ frames.map(_.length)))
          val stsc = box("stsc", be(Seq(0, 1, 1, 1, 1)))
          def stcoWith(offs: Seq[Int]) = box("stco", be(Seq(0, n) ++ offs))
          def moovWith(offs: Seq[Int]) = box("moov",
            box("mvhd", mvhd) ++ box("trak",
              box("tkhd", tkhd) ++ box("mdia", box("minf",
                box("stbl", stsd ++ stsz ++ stsc ++ stcoWith(offs))))))
          // stco holds ABSOLUTE offsets: measure with zeros, then rebuild
          val moovLen = moovWith(Seq.fill(n)(0)).length
          val mdatBodyAt = ftyp.length + moovLen + 8
          val offs = frames.scanLeft(mdatBodyAt)(_ + _.length).init
          val mdat = box("mdat", frames.toArray.flatten)
          (docId, ftyp ++ moovWith(offs) ++ mdat)
        }
      }.toDF("doc_id", "payload")
  }

  /** Partition-parallel frame decode: sample-table walk + per-frame T.81
    * decode; any malformed table or undecodable frame quarantines the
    * whole payload. Zero shuffle. */
  def extractVideoFrames(spark: SparkSession, media: DataFrame): Dataset[VideoFrame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          mp4JpegFrames(bytes).toSeq.flatMap { frames =>
            val decoded = frames.map(jpegPixels)
            if (decoded.exists(_.isEmpty)) Nil
            else decoded.flatten.zipWithIndex.map { case (p, f) =>
              VideoFrame(id, f, p.width, p.height,
                p.sum_y, p.sum_cb, p.sum_cr,
                p.first_y, p.first_cb, p.first_cr)
            }
          }
        }
      }
  }
}
