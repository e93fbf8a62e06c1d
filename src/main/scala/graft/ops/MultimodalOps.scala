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
    else None
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
    df.select(
      col(id).cast("long").as("doc_id"),
      encode(col(payloadSrc), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake of an image decode (dimensions
    * only; the caller computes the byte-mean "feature" in the same pass as
    * its checksum). Replace the body with a real codec to productionize;
    * signature and batch shape stay. */
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
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var dataLen = -1L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val id = cc(at)
      val size = le32(at + 4)
      // a chunk whose declared body overruns the payload is malformed
      if (size < 0 || i + 8 + size > b.length) return None
      if (id == "fmt " && size >= 16) {
        val tag = le16(at + 8)
        if (tag != 1) return None // PCM only
        fmt = Some((le16(at + 10), le32(at + 12), le16(at + 22)))
      } else if (id == "data") {
        dataLen = size.toLong
      }
      i += 8L + size + (size & 1) // chunks are 2-byte aligned
    }
    fmt match {
      case Some((ch, rate, bits)) if dataLen >= 0 && ch > 0 && rate > 0 && bits > 0 =>
        val bytesPerSec = rate.toDouble * ch * (bits / 8)
        Some(AudioMeta(-1L, "wav", ch, rate, bits, dataLen,
          dataLen / bytesPerSec * 1000.0))
      case _ => None
    }
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
    df.select(col(id).cast("long").as("doc_id"),
        encode(col(payloadSrc), "UTF-8").as("data"))
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
    // walk a box list in [from, until); moov and trak recurse one level
    def walk(from: Long, until: Long, depth: Int): Boolean = {
      var i = from
      while (i + 8 <= until) {
        val at = i.toInt
        val size = be32(at)
        val id = cc(at + 4)
        if (size < 8 || i + size > until) return false
        id match {
          case "ftyp" if size >= 12 => brand = Some(cc(at + 8))
          case "moov" | "trak" if depth < 2 =>
            if (!walk(i + 8, i + size, depth + 1)) return false
          case "mvhd" if size >= 8 + 20 =>
            timescale = be32(at + 8 + 12).toInt
            duration = be32(at + 8 + 16)
          case "tkhd" if size >= 8 + 84 =>
            // 16.16 fixed point; integral part only
            width = be32(at + 8 + 76).toInt >>> 16
            height = be32(at + 8 + 80).toInt >>> 16
          case "mdat" => mdatLen = size - 8
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

  /** Fixture adapter (the video sibling of [[asWavPayload]]): wrap a text
    * table as REAL minimal MP4 containers — ftyp('isom') + moov(mvhd +
    * trak(tkhd)) + mdat(payload bytes). Header fields derive from the row
    * id (320×240…800×600 ladder, duration 1–30 s at timescale 600), so an
    * oracle recomputes every parsed field from the row WITHOUT parsing;
    * [[mp4Meta]] never sees the formula — it reads only the byte layout. */
  def asMp4Payload(spark: SparkSession, df: DataFrame, id: String,
      payloadSrc: String): DataFrame = {
    import spark.implicits._
    df.select(col(id).cast("long").as("doc_id"),
        encode(col(payloadSrc), "UTF-8").as("data"))
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
    * the honest notch past header-only parsing; with [[pngPixels]] and
    * [[gifPixels]] beside it, only JPEG (DCT) stays behind the stub. */
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
    if (w <= 0 || h == 0 || le16(26) != 1 || le16(28) != 24 || le32(30) != 0)
      return None
    // stride math in Long: adversarial widths near 2^31/3 overflow Int,
    // producing a negative stride that defeats the bound check below and
    // crashes the task instead of quarantining the payload
    if (w > (1 << 20) || h > (1 << 20)) return None
    val strideL = (w.toLong * 3 + 3) / 4 * 4
    if (off < 54 || off.toLong + strideL * h > b.length) return None
    val stride = strideL.toInt
    var sr = 0L; var sg = 0L; var sb = 0L
    var fr = 0; var fg = 0; var fb = 0
    var y = 0
    while (y < h) { // y = image row, top-based
      val stored = if (topDown) y else h - 1 - y
      val base = off + stored * stride
      var x = 0
      while (x < w) {
        val i = base + x * 3
        val bb = u8(i); val g = u8(i + 1); val r = u8(i + 2) // BGR on disk
        if (x == 0 && y == 0) { fr = r; fg = g; fb = bb }
        sr += r; sg += g; sb += bb
        x += 1
      }
      y += 1
    }
    Some(BmpPixels(-1L, w, h, sr, sg, sb, fr, fg, fb))
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
    df.select(col(id).cast("long").as("doc_id")).as[Long]
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
    * closes the PNG notch of the former decode stub; with [[gifPixels]]
    * (from-scratch LZW), only JPEG (DCT) still needs an external codec.
    * Unrecognized/odd containers are dropped (quarantine route), never
    * thrown. */
  def pngPixels(b: Array[Byte]): Option[PngPixels] = {
    val sig = Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)
    if (b.length < 8 + 25 || !sig.indices.forall(i => b(i) == sig(i))) return None
    def be32(i: Int) =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    var off = 8
    var w = -1; var h = -1
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
          val bitDepth = b(off + 16) & 0xff
          val colorType = b(off + 17) & 0xff
          val compression = b(off + 18) & 0xff
          val filterMethod = b(off + 19) & 0xff
          val interlace = b(off + 20) & 0xff
          if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
            bitDepth != 8 || colorType != 2 || compression != 0 ||
            filterMethod != 0 || interlace != 0) return None
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len // len + type + data + crc
    }
    if (w <= 0 || idat.size() == 0) return None
    val rowBytes = w * 3
    val expect = h.toLong * (1 + rowBytes)
    if (expect > Int.MaxValue) return None
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
    // reverse per-row filters into `cur`/`prev` reconstructed scanlines
    var sr = 0L; var sg = 0L; var sb = 0L
    var fr = 0; var fg = 0; var fb = 0
    var prev = new Array[Int](rowBytes)
    var cur = new Array[Int](rowBytes)
    var y = 0
    while (y < h) {
      val base = y * (1 + rowBytes)
      val filter = raw(base) & 0xff
      if (filter > 4) return None
      var i = 0
      while (i < rowBytes) {
        val x = raw(base + 1 + i) & 0xff
        val left = if (i >= 3) cur(i - 3) else 0
        val up = prev(i)
        val upLeft = if (i >= 3) prev(i - 3) else 0
        cur(i) = filter match {
          case 0 => x
          case 1 => (x + left) & 0xff
          case 2 => (x + up) & 0xff
          case 3 => (x + ((left + up) >> 1)) & 0xff
          case 4 => (x + paeth(left, up, upLeft)) & 0xff
        }
        i += 1
      }
      if (y == 0) { fr = cur(0); fg = cur(1); fb = cur(2) }
      var px = 0
      while (px < rowBytes) {
        sr += cur(px); sg += cur(px + 1); sb += cur(px + 2)
        px += 3
      }
      val t = prev; prev = cur; cur = t
      y += 1
    }
    Some(PngPixels(-1L, w, h, sr, sg, sb, fr, fg, fb))
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
    df.select(col(id).cast("long").as("doc_id")).as[Long]
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
    * notch of the decode stub — only JPEG (DCT) still needs a codec the
    * JVM doesn't ship. Unrecognized/odd containers are dropped. */
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
    df.select(col(id).cast("long").as("doc_id")).as[Long]
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
}
