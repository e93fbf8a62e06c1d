package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

/** The from-scratch baseline JPEG codec pair.
  *
  * Three independent anchors pin the decoder:
  *   1. the exact fixture contract (constant blocks + quant=1 decode
  *      bit-for-bit to the generation formula — the DuckDB oracle's leg);
  *   2. the JDK's own ImageIO decoder agrees with ours on our fixtures
  *      (so the fixture bytes are standards-valid JPEG, not a private
  *      dialect our decoder happens to round-trip);
  *   3. ours agrees with ImageIO on IMAGEIO-ENCODED random grayscale at
  *      several qualities — arbitrary quant tables, optimized-by-default
  *      Huffman tables, full AC spectrum, non-multiple-of-8 crops —
  *      within the T.81 IDCT accuracy allowance (±2 per sample).
  */
class JpegSpec extends AnyFunSuite {

  private def fixtureFormula(docId: Long): (Int, Int, Array[Int], Array[Int], Array[Int]) = {
    val bw = 1 + (docId % 3).toInt
    val bh = 1 + (docId % 2).toInt
    def plane(a: Long, b: Long, c: Long): Array[Int] =
      Array.tabulate(bw * bh) { i =>
        val bx = i % bw; val by = i / bw
        ((a * docId + b * bx + c * by) % 256).toInt
      }
    (bw, bh, plane(7, 11, 17), plane(3, 5, 7), plane(5, 13, 3))
  }

  private def encodeFixture(docId: Long): Array[Byte] = {
    val (bw, bh, y, cb, cr) = fixtureFormula(docId)
    MultimodalOps.jpegEncodeConstantBlocks(
      bw, bh, y, cb, cr, if (docId % 4 == 0) bw else 0)
  }

  test("fixture decodes bit-for-bat to the generation formula (incl. DRI/RSTn docs)") {
    // ids cover every (bw, bh) shape, DC categories in both directions,
    // and the restart-marker lattice (multiples of 4)
    for (docId <- 0L to 40L) {
      val bytes = encodeFixture(docId)
      val (bw, bh, y, cb, cr) = fixtureFormula(docId)
      val img = MultimodalOps.jpegDecode(bytes)
        .getOrElse(fail(s"doc $docId failed to decode"))
      assert(img.width == bw * 8 && img.height == bh * 8 && img.comps == 3)
      for (by <- 0 until bh * 8; bx <- 0 until bw * 8) {
        val blk = (by / 8) * bw + bx / 8
        val p = by * img.width + bx
        assert(img.planes(0)(p) == y(blk), s"Y mismatch doc=$docId ($bx,$by)")
        assert(img.planes(1)(p) == cb(blk), s"Cb mismatch doc=$docId ($bx,$by)")
        assert(img.planes(2)(p) == cr(blk), s"Cr mismatch doc=$docId ($bx,$by)")
      }
      val px = MultimodalOps.jpegPixels(bytes).get
      assert(px.first_y == y(0) && px.first_cb == cb(0) && px.first_cr == cr(0))
      assert(px.sum_y == 64L * y.map(_.toLong).sum)
    }
  }

  test("the JDK's ImageIO decoder agrees with ours on the fixture bytes") {
    for (docId <- Seq(0L, 1L, 5L, 11L, 12L, 23L)) {
      val bytes = encodeFixture(docId)
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(bi != null, s"ImageIO rejected fixture $docId — not standards-valid")
      val img = MultimodalOps.jpegDecode(bytes).get
      assert(bi.getWidth == img.width && bi.getHeight == img.height)
      // ImageIO hands back RGB; convert our YCbCr planes with the JFIF
      // float matrix and allow ±2 for its integer-approximation rounding.
      var maxDiff = 0
      for (yy <- 0 until img.height; xx <- 0 until img.width) {
        val p = yy * img.width + xx
        val y = img.planes(0)(p).toDouble
        val cb = img.planes(1)(p) - 128.0
        val cr = img.planes(2)(p) - 128.0
        def clamp(v: Double) = math.min(255, math.max(0, Math.round(v).toInt))
        val r = clamp(y + 1.402 * cr)
        val g = clamp(y - 0.344136 * cb - 0.714136 * cr)
        val b = clamp(y + 1.772 * cb)
        val rgb = bi.getRGB(xx, yy)
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - r))
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - g))
        maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - b))
      }
      assert(maxDiff <= 2, s"doc $docId: ImageIO RGB diverges by $maxDiff")
    }
  }

  test("decodes ImageIO-encoded random grayscale within the T.81 IDCT allowance") {
    val rnd = new scala.util.Random(42)
    // non-multiple-of-8 sizes exercise the partial-MCU crop
    for (((w, h), q) <- Seq((21, 13), (64, 48), (37, 40)).zip(Seq(0.5f, 0.75f, 1.0f))) {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (yy <- 0 until h; xx <- 0 until w)
        bi.getRaster.setSample(xx, yy, 0, rnd.nextInt(256))
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(q)
      val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(mos)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      mos.flush(); writer.dispose()
      val bytes = bos.toByteArray
      val img = MultimodalOps.jpegDecode(bytes)
        .getOrElse(fail(s"failed to decode ImageIO output ($w x $h, q=$q)"))
      assert(img.width == w && img.height == h && img.comps == 1)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (yy <- 0 until h; xx <- 0 until w) {
        val mine = img.planes(0)(yy * w + xx)
        val theirs = ref.getRaster.getSample(xx, yy, 0)
        maxDiff = math.max(maxDiff, math.abs(mine - theirs))
      }
      assert(maxDiff <= 2, s"($w x $h, q=$q): max per-sample diff $maxDiff")
    }
  }

  test("4:2:0 fixture decodes bit-for-bit: interleaved MCUs, restart lattice, constant-chroma upsample") {
    for (docId <- 0L to 40L) {
      val mcusX = 1 + (docId % 2).toInt
      val mcusY = 1 + (docId % 3).toInt
      val ybw = 2 * mcusX
      val yb = Array.tabulate(ybw * 2 * mcusY) { i =>
        val bx = i % ybw; val by = i / ybw
        ((7 * docId + 11 * bx + 17 * by) % 256).toInt
      }
      val cb = ((3 * docId) % 256).toInt
      val cr = ((5 * docId) % 256).toInt
      val bytes = MultimodalOps.jpegEncodeSubsampled420(
        mcusX, mcusY, yb, cb, cr, if (docId % 4 == 0) 1 else 0)
      val img = MultimodalOps.jpegDecode(bytes)
        .getOrElse(fail(s"doc $docId (4:2:0) failed to decode"))
      assert(img.width == 16 * mcusX && img.height == 16 * mcusY &&
        img.comps == 3)
      for (py <- 0 until img.height; px <- 0 until img.width) {
        val blk = (py / 8) * ybw + px / 8
        val p = py * img.width + px
        assert(img.planes(0)(p) == yb(blk), s"Y mismatch doc=$docId ($px,$py)")
        assert(img.planes(1)(p) == cb, s"Cb mismatch doc=$docId ($px,$py)")
        assert(img.planes(2)(p) == cr, s"Cr mismatch doc=$docId ($px,$py)")
      }
      val stats = MultimodalOps.jpegPixels(bytes).get
      assert(stats.sum_y == 64L * yb.map(_.toLong).sum)
      assert(stats.first_cb == cb && stats.first_cr == cr)
    }
  }

  test("the JDK's ImageIO decoder agrees with ours on 4:2:0 fixture bytes") {
    for (docId <- Seq(0L, 3L, 4L, 7L, 17L)) {
      val mcusX = 1 + (docId % 2).toInt
      val mcusY = 1 + (docId % 3).toInt
      val ybw = 2 * mcusX
      val yb = Array.tabulate(ybw * 2 * mcusY) { i =>
        val bx = i % ybw; val by = i / ybw
        ((7 * docId + 11 * bx + 17 * by) % 256).toInt
      }
      val cbv = ((3 * docId) % 256).toInt
      val crv = ((5 * docId) % 256).toInt
      val bytes = MultimodalOps.jpegEncodeSubsampled420(
        mcusX, mcusY, yb, cbv, crv, if (docId % 4 == 0) 1 else 0)
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(bi != null, s"ImageIO rejected 4:2:0 fixture $docId")
      val img = MultimodalOps.jpegDecode(bytes).get
      assert(bi.getWidth == img.width && bi.getHeight == img.height)
      // constant chroma: ImageIO's fancy upsampling and our box
      // replication agree exactly, so RGB must match within its integer
      // rounding like the 4:4:4 cross-check
      var maxDiff = 0
      for (yy <- 0 until img.height; xx <- 0 until img.width) {
        val p = yy * img.width + xx
        val y = img.planes(0)(p).toDouble
        val cb = img.planes(1)(p) - 128.0
        val cr = img.planes(2)(p) - 128.0
        def clamp(v: Double) = math.min(255, math.max(0, Math.round(v).toInt))
        val r = clamp(y + 1.402 * cr)
        val g = clamp(y - 0.344136 * cb - 0.714136 * cr)
        val b = clamp(y + 1.772 * cb)
        val rgb = bi.getRGB(xx, yy)
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - r))
        maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - g))
        maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - b))
      }
      assert(maxDiff <= 2, s"doc $docId: ImageIO RGB diverges by $maxDiff")
    }
  }

  test("4:2:2 and 4:4:0 layouts decode bit-for-bit too (one-axis subsampling)") {
    for ((hY, vY) <- Seq((2, 1), (1, 2)); docId <- Seq(0L, 5L, 9L, 14L)) {
      val mcusX = 1 + (docId % 2).toInt
      val mcusY = 1 + (docId % 3).toInt
      val ybw = hY * mcusX
      val yb = Array.tabulate(ybw * vY * mcusY) { i =>
        val bx = i % ybw; val by = i / ybw
        ((7 * docId + 11 * bx + 17 * by) % 256).toInt
      }
      val cb = ((3 * docId) % 256).toInt
      val cr = ((5 * docId) % 256).toInt
      val bytes = MultimodalOps.jpegEncodeSubsampled(
        mcusX, mcusY, hY, vY, yb, cb, cr, if (docId % 4 == 0) 1 else 0)
      val img = MultimodalOps.jpegDecode(bytes)
        .getOrElse(fail(s"doc $docId (${hY}x$vY) failed to decode"))
      assert(img.width == 8 * hY * mcusX && img.height == 8 * vY * mcusY)
      for (py <- 0 until img.height; px <- 0 until img.width) {
        val blk = (py / 8) * ybw + px / 8
        val p = py * img.width + px
        assert(img.planes(0)(p) == yb(blk),
          s"Y mismatch ${hY}x$vY doc=$docId ($px,$py)")
        assert(img.planes(1)(p) == cb && img.planes(2)(p) == cr,
          s"chroma mismatch ${hY}x$vY doc=$docId ($px,$py)")
      }
      // the JDK's independent decoder accepts the layout too
      assert(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) != null,
        s"ImageIO rejected the ${hY}x$vY fixture")
    }
  }

  test("decodes an ImageIO-encoded color JPEG (its default chroma layout) within tolerance") {
    // constant color → constant planes: box vs fancy upsampling agree
    // exactly, so this cross-checks whatever sampling the JDK's writer
    // actually emits (4:2:0 at default settings) against our decoder
    val w = 40; val h = 24
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = bi.createGraphics()
    g2.setColor(new java.awt.Color(180, 90, 40)); g2.fillRect(0, 0, w, h)
    g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(mos)
    writer.write(bi)
    mos.flush(); writer.dispose()
    val bytes = bos.toByteArray
    // report what the writer emitted (sampling byte of component 1)
    val sof = bytes.indices.find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0).get
    val sampling = bytes(sof + 11) & 0xff
    info(f"ImageIO emitted component-1 sampling 0x$sampling%02x")
    val img = MultimodalOps.jpegDecode(bytes)
      .getOrElse(fail(s"failed to decode ImageIO color output (sampling 0x$sampling%02x)"))
    assert(img.width == w && img.height == h && img.comps == 3)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (yy <- 0 until h; xx <- 0 until w) {
      val p = yy * w + xx
      val y = img.planes(0)(p).toDouble
      val cb = img.planes(1)(p) - 128.0
      val cr = img.planes(2)(p) - 128.0
      def clamp(v: Double) = math.min(255, math.max(0, Math.round(v).toInt))
      val rgbMine = Seq(
        clamp(y + 1.402 * cr),
        clamp(y - 0.344136 * cb - 0.714136 * cr),
        clamp(y + 1.772 * cb))
      val rgb = ref.getRGB(xx, yy)
      val rgbRef = Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      maxDiff = math.max(maxDiff,
        rgbMine.zip(rgbRef).map { case (a, b) => math.abs(a - b) }.max)
    }
    assert(maxDiff <= 2, s"color cross-check diverges by $maxDiff")
  }

  test("progressive 4:2:0 fixture decodes bit-for-bit (DC refinement + EOB bands + restarts)") {
    for (docId <- 0L to 40L) {
      val mcusX = 1 + (docId % 2).toInt
      val mcusY = 1 + (docId % 3).toInt
      val ybw = 2 * mcusX
      val yb = Array.tabulate(ybw * 2 * mcusY) { i =>
        val bx = i % ybw; val by = i / ybw
        ((7 * docId + 11 * bx + 17 * by) % 256).toInt
      }
      val cb = ((3 * docId) % 256).toInt
      val cr = ((5 * docId) % 256).toInt
      val bytes = MultimodalOps.jpegEncodeProgressive420(
        mcusX, mcusY, yb, cb, cr, if (docId % 4 == 0) 1 else 0)
      val img = MultimodalOps.jpegDecode(bytes)
        .getOrElse(fail(s"doc $docId (progressive) failed to decode"))
      assert(img.width == 16 * mcusX && img.height == 16 * mcusY &&
        img.comps == 3)
      for (py <- 0 until img.height; px <- 0 until img.width) {
        val blk = (py / 8) * ybw + px / 8
        val p = py * img.width + px
        assert(img.planes(0)(p) == yb(blk),
          s"Y mismatch progressive doc=$docId ($px,$py)")
        assert(img.planes(1)(p) == cb && img.planes(2)(p) == cr,
          s"chroma mismatch progressive doc=$docId ($px,$py)")
      }
      // the JDK's independent decoder accepts the multi-scan layout too
      if (docId <= 8)
        assert(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes)) != null,
          s"ImageIO rejected the progressive fixture $docId")
    }
  }

  test("decodes ImageIO-encoded PROGRESSIVE grayscale within the T.81 allowance") {
    // ImageIO's progressive mode emits the multi-scan libjpeg script
    // (DC first + refinements, AC spectral-selection bands + successive
    // approximation) — a REAL independent encoder driving every
    // progressive code path; non-multiple-of-8 sizes cover partial blocks
    val rnd = new scala.util.Random(7)
    for (((w, h), q) <- Seq((21, 13), (64, 48), (37, 40)).zip(Seq(0.5f, 0.75f, 0.9f))) {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (yy <- 0 until h; xx <- 0 until w)
        bi.getRaster.setSample(xx, yy, 0, rnd.nextInt(256))
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(q)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(mos)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      mos.flush(); writer.dispose()
      val bytes = bos.toByteArray
      // confirm the writer really emitted SOF2
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
        "ImageIO did not emit a progressive stream")
      val img = MultimodalOps.jpegDecode(bytes)
        .getOrElse(fail(s"failed to decode progressive ($w x $h, q=$q)"))
      assert(img.width == w && img.height == h && img.comps == 1)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (yy <- 0 until h; xx <- 0 until w) {
        val mine = img.planes(0)(yy * w + xx)
        val theirs = ref.getRaster.getSample(xx, yy, 0)
        maxDiff = math.max(maxDiff, math.abs(mine - theirs))
      }
      assert(maxDiff <= 2, s"progressive ($w x $h, q=$q): max diff $maxDiff")
    }
  }

  test("decodes ImageIO-encoded PROGRESSIVE color (subsampled) within tolerance") {
    // constant color → constant planes, so box vs fancy chroma upsampling
    // agree exactly and only the progressive coefficient machinery is
    // under test (including the interleaved DC scans across 3 components)
    val w = 40; val h = 24
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = bi.createGraphics()
    g2.setColor(new java.awt.Color(60, 130, 200)); g2.fillRect(0, 0, w, h)
    g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(mos)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    mos.flush(); writer.dispose()
    val bytes = bos.toByteArray
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    val img = MultimodalOps.jpegDecode(bytes)
      .getOrElse(fail("failed to decode progressive color"))
    assert(img.width == w && img.height == h && img.comps == 3)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (yy <- 0 until h; xx <- 0 until w) {
      val p = yy * w + xx
      val y = img.planes(0)(p).toDouble
      val cb = img.planes(1)(p) - 128.0
      val cr = img.planes(2)(p) - 128.0
      def clamp(v: Double) = math.min(255, math.max(0, Math.round(v).toInt))
      val rgbMine = Seq(
        clamp(y + 1.402 * cr),
        clamp(y - 0.344136 * cb - 0.714136 * cr),
        clamp(y + 1.772 * cb))
      val rgb = ref.getRGB(xx, yy)
      val rgbRef = Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      maxDiff = math.max(maxDiff,
        rgbMine.zip(rgbRef).map { case (a, b) => math.abs(a - b) }.max)
    }
    assert(maxDiff <= 2, s"progressive color diverges by $maxDiff")
  }

  test("lossless (SOF3) fixtures decode bit-for-bit: all 7 predictors, 8/16-bit, gray+RGB") {
    // no JVM/local library implements the T.81 lossless process, so the
    // pin is the exact fixture contract (every predictor × precision ×
    // component lane against the generation formula) plus structural
    // negatives below — the same posture as the TIFF-LZW lane before
    // its ImageIO cross-check existed
    val spark = TestSpark.spark
    import spark.implicits._
    val media = MultimodalOps.asLosslessJpegPayload(
      spark, (0L until 56L).toDF("doc_id"), "doc_id")
    media.collect().foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val w = 4 + (id % 5).toInt
      val h = 3 + (id % 4).toInt
      val gray = id % 3 == 0
      val img = MultimodalOps.jpegDecodeLossless(bytes)
        .getOrElse(fail(s"doc $id (predictor ${1 + id % 7}) quarantined"))
      assert((img.width, img.height) == (w, h), s"doc $id dims")
      assert(img.comps == (if (gray) 1 else 3))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until img.comps) {
        val e = (c match {
          case 0 => (id + 7L * x + 13L * y) % 256
          case 1 => (id * 3 + 5L * x + 11L * y) % 256
          case _ => (id * 5 + 3L * x + 17L * y) % 256
        }).toInt
        assert(img.planes(c)(y * w + x) == e,
          s"doc $id pred=${1 + id % 7} prec=${if ((id / 2) % 2 == 0) 8 else 16} c$c($x,$y)")
      }
      // the shared front door routes SOF3 through the lossless path
      assert(MultimodalOps.jpegDecode(bytes).isDefined, s"doc $id front door")
    }
    // wide-diff torture: a checkerboard of 0/65535 at 16-bit forces
    // category 16 (diff=32768, no extend bits) and its modulo wrap
    val plane = Array.tabulate(6 * 4)(j => if ((j % 6 + j / 6) % 2 == 0) 0 else 65535)
    for (pred <- 1 to 7) {
      val bytes = MultimodalOps.jpegEncodeLossless(
        6, 4, Array(plane), 16, pred)
      val img = MultimodalOps.jpegDecodeLossless(bytes)
        .getOrElse(fail(s"checkerboard pred=$pred quarantined"))
      for (j <- 0 until 24)
        assert(img.planes(0)(j) == (if ((j % 6 + j / 6) % 2 == 0) 0 else 255),
          s"checkerboard pred=$pred sample $j")
    }
    // negatives: header truncation quarantines; so does an entropy
    // stream cut mid-sample (drop everything after SOS + 2 bytes)
    val ok = MultimodalOps.jpegEncodeLossless(6, 4, Array(plane), 16, 1)
    assert(MultimodalOps.jpegDecodeLossless(ok.take(24)).isEmpty)
    val sosEnd = {
      // find SOS, keep its header + 2 entropy bytes only
      var i = 2
      while (!((ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xda)) i += 1
      i + 2 + (((ok(i + 2) & 0xff) << 8) | (ok(i + 3) & 0xff)) + 2
    }
    assert(MultimodalOps.jpegDecodeLossless(ok.take(sosEnd)).isEmpty,
      "mid-entropy truncation must quarantine")
  }

  test("CMYK (4-component) baseline decodes; ImageIO's raw raster agrees; YCCK quarantines") {
    val spark = TestSpark.spark
    import spark.implicits._
    val media = MultimodalOps.asCmykJpegPayload(
      spark, (0L until 24L).toDF("doc_id"), "doc_id")
    var rasterChecked = 0
    media.collect().foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val bw = 1 + (id % 3).toInt
      val bh = 1 + (id % 2).toInt
      val img = MultimodalOps.jpegDecode(bytes)
        .getOrElse(fail(s"cmyk doc $id quarantined"))
      assert(img.comps == 4 && img.width == bw * 8 && img.height == bh * 8)
      val coeffs = Seq((7L, 11L, 17L), (3L, 5L, 7L), (5L, 13L, 3L), (11L, 7L, 19L))
      for (c <- 0 until 4; by <- 0 until bh; bx <- 0 until bw) {
        val (a, bb, cc) = coeffs(c)
        val e = ((a * id + bb * bx + cc * by) % 256).toInt
        assert(img.planes(c)((by * 8) * img.width + bx * 8) == e,
          s"doc $id comp $c block ($bx,$by)")
      }
      // the JDK reader's RAW RASTER (no color conversion) is an
      // independent decode of the same entropy stream — 4 bands,
      // sample-exact
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val rd = readers.next()
        rd.setInput(iis)
        val raster = try rd.readRaster(0, null) catch { case _: Exception => null }
        if (raster != null && raster.getNumBands == 4) {
          rasterChecked += 1
          for (y <- 0 until img.height; x <- 0 until img.width; c <- 0 until 4)
            assert(raster.getSample(x, y, c) == img.planes(c)(y * img.width + x),
              s"doc $id ImageIO raster band $c ($x,$y)")
        }
        rd.dispose()
      }
    }
    assert(rasterChecked > 0, "ImageIO raster-verified none of the CMYK fixtures")
    // YCCK (Adobe transform 2) quarantines — identified, never mis-decoded
    val ycck = MultimodalOps.jpegEncodeCmykConstantBlocks(
      1, 1, Array.fill(4)(Array(100)), 0, transform = 2)
    assert(MultimodalOps.jpegDecode(ycck).isEmpty)
    // and the classifier reports the 4-comp file as decoded jpeg
    val ok4 = media.limit(1).collect().head.getAs[Array[Byte]](1)
    assert(MultimodalOps.decodeStatusOf(ok4) == ("jpeg", true))
  }

  test("quarantine: garbage, malformed-progressive, and truncated payloads drop to None") {
    assert(MultimodalOps.jpegDecode(Array[Byte](1, 2, 3)).isEmpty)
    assert(MultimodalOps.jpegDecode(Array.fill[Byte](64)(0x55)).isEmpty)
    val good = encodeFixture(7L)
    // flip SOF0 (FFC0) to SOF2: a BASELINE scan header (interleaved,
    // Ss=0..Se=63) is illegal in a progressive stream — the progressive
    // decoder must reject the mislabel, not mis-decode it
    val prog = good.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(MultimodalOps.jpegDecode(prog).isEmpty)
    // truncate inside the entropy stream — must drop, not throw
    assert(MultimodalOps.jpegDecode(good.take(good.length - 3)).isEmpty)
  }

  test("extractJpegPixels is partition-parallel and drops undecodable rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.range(0, 24).toDF("doc_id")
    val media = MultimodalOps.asJpegPayload(spark, docs, "doc_id")
    val decoded = MultimodalOps.extractJpegPixels(spark, media).collect()
    assert(decoded.length == 24)
    // splice in an undecodable row: it must be quarantined, not fail the job
    val withJunk = media.union(
      Seq((999L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload"))
    assert(MultimodalOps.extractJpegPixels(spark, withJunk).count() == 24)
  }

  test("MJPEG-in-MP4: sample tables slice frames that decode to the formula") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.range(0, 12).toDF("doc_id")
    val media = MultimodalOps.asMjpegMp4Payload(spark, docs, "doc_id")
    val rows = MultimodalOps.extractVideoFrames(spark, media).collect()
    // every doc yields exactly 2 + id%3 frames
    assert(rows.length == (0 until 12).map(d => 2 + d % 3).sum)
    // spot frame values against the generation formula (first = block 0,0)
    rows.foreach { r =>
      assert(r.first_y == ((7 * r.doc_id + 23 * r.frame_idx) % 256).toInt, r)
      assert(r.first_cb == ((3 * r.doc_id + 29 * r.frame_idx) % 256).toInt, r)
      assert(r.width == 8 * (1 + r.doc_id % 3).toInt)
    }
    val bytes = media.filter($"doc_id" === 5L)
      .head().getAs[Array[Byte]]("payload") // bounded: 1 fixture row
    assert(MultimodalOps.mp4JpegFrames(bytes).nonEmpty)
    // corrupting the stco entry count quarantines the payload (tables
    // that disagree are never trusted to slice frames)
    val badCount = bytes.clone()
    val stcoAt = badCount.indices.find(i => i + 4 <= badCount.length &&
      new String(badCount, i, 4, "US-ASCII") == "stco").get
    badCount(stcoAt + 4 + 7) = (badCount(stcoAt + 4 + 7) + 1).toByte
    assert(MultimodalOps.mp4JpegFrames(badCount).isEmpty)
    // a non-jpeg codec fourcc routes to quarantine before any decode
    val nonJpeg = bytes.clone()
    val stsdAt = nonJpeg.indices.find(i => i + 4 <= nonJpeg.length &&
      new String(nonJpeg, i, 4, "US-ASCII") == "stsd").get
    // the sample-entry fourcc sits 12 bytes into the stsd body
    System.arraycopy("avc1".getBytes("US-ASCII"), 0, nonJpeg, stsdAt + 16, 4)
    assert(MultimodalOps.mp4JpegFrames(nonJpeg).isEmpty)
    // truncated container → None, not a crash
    assert(MultimodalOps.mp4JpegFrames(bytes.take(60)).isEmpty)
  }
}
