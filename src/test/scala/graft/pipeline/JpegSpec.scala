package graft.pipeline

import graft.SparkSpec

/** The lossy-codec path: `jpegEncodeGray`/`jpegEncodeRgb` must produce
  * files any baseline JPEG reader accepts, and `jpegDecode` must parse
  * arbitrary baseline JPEGs — the JDK's ImageIO JPEG codec referees
  * both directions. Unlike the lossless codecs, cross-decoder pixel
  * EQUALITY is the wrong oracle (IDCT rounding is implementation-
  * defined), so the referee bounds the per-pixel divergence instead;
  * exactness is asserted only where the math guarantees it
  * (block-constant plants, where every AC coefficient is zero).
  */
class JpegSpec extends SparkSpec {

  private def imageIO(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected the encoded JPEG")
    img
  }

  test("block-constant plants roundtrip bit-exactly (the gate's anchor)") {
    for (id <- Seq(0L, 7L, 123L, 4567L)) {
      val (p, w, h) = Jpeg.plant(id)
      val img = Jpeg.jpegDecode(id, Jpeg.jpegEncodeGray(p, w, h))
      assert(img.width == w && img.height == h && img.nComp == 1)
      assert(img.planes(0).sameElements(p),
        s"DC-only roundtrip must be exact for doc $id")
    }
  }

  test("constant image with non-multiple-of-8 dims roundtrips exactly " +
       "(edge-replicated padding + decoder crop)") {
    val (w, h) = (21, 13)
    val p = Array.fill(w * h)(77)
    val img = Jpeg.jpegDecode(9L, Jpeg.jpegEncodeGray(p, w, h))
    assert(img.width == w && img.height == h)
    assert(img.planes(0).sameElements(p))
  }

  test("marker walk skips 0xFF fill bytes (T.81 B.1.1.2) and a " +
       "single-component SOF with sampling >1x1 decodes non-interleaved") {
    val (p, w, h) = Jpeg.plant(7L)
    val enc = Jpeg.jpegEncodeGray(p, w, h)
    val ref = Jpeg.jpegDecode(7L, enc)
    // plant two fill bytes between SOI and the first marker: the
    // stream reads FFD8 FF FF FFxx... - legal padding per the spec
    val padded = enc.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++
      enc.drop(2)
    val viaPad = Jpeg.jpegDecode(7L, padded)
    assert(viaPad.planes(0).sameElements(ref.planes(0)),
      "fill bytes before a marker must be transparent")
    // patch the SOF0 sampling byte of the single component from 0x11
    // to 0x22: per T.81 A.2.2 a one-component scan is non-interleaved
    // (MCU = one data unit), so the decode must be unchanged
    val sofAt = {
      var i = 2
      while (!((enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc0))
        i += 1
      i
    }
    val sampAt = sofAt + 4 + 5 + 2 // marker(2) + len(2) + prec,h,w,nc + id
    assert((enc(sampAt) & 0xff) == 0x11, "sampling byte not where expected")
    val patched = enc.clone()
    patched(sampAt) = 0x22.toByte
    val viaPatch = Jpeg.jpegDecode(7L, patched)
    assert(viaPatch.planes(0).sameElements(ref.planes(0)),
      "declared sampling factors must not change one-component geometry")
  }

  test("jpegEncodeGray output is a valid JPEG per ImageIO, within ±1 " +
       "of our own decode on a full-AC gradient image") {
    for (id <- Seq(3L, 42L, 1001L)) {
      val w = 24 + (id % 9).toInt
      val h = 16 + (id % 7).toInt
      // rich-AC content: diagonal gradient + a checker ripple
      val p = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        ((3 * x + 5 * y + (if (((x ^ y) & 1) == 1) 40 else 0)
          + id) % 256).toInt
      }
      val bytes = Jpeg.jpegEncodeGray(p, w, h)
      val ref = imageIO(bytes)
      assert(ref.getWidth == w && ref.getHeight == h)
      val mine = Jpeg.jpegDecode(id, bytes).planes(0)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(ref.getRaster.getSample(x, y, 0) - mine(y * w + x))
        maxDiff = math.max(maxDiff, d)
      }
      assert(maxDiff <= 1,
        s"gray decode diverges from ImageIO by $maxDiff for doc $id")
    }
  }

  test("jpegDecode parses ImageIO-WRITTEN grayscale JPEGs (foreign " +
       "quant + Huffman tables) within ±1 of ImageIO's own decode") {
    for (id <- Seq(5L, 77L)) {
      val w = 40 + (id % 9).toInt
      val h = 24 + (id % 5).toInt
      val src = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        src.getRaster.setSample(x, y, 0, ((x * 7 + y * 11 + id) % 256).toInt)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(src, "jpg", baos))
      val bytes = baos.toByteArray
      val ref = imageIO(bytes) // ImageIO re-decodes its own file
      val mine = Jpeg.jpegDecode(id, bytes)
      assert(mine.width == w && mine.height == h && mine.nComp == 1)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(ref.getRaster.getSample(x, y, 0) -
          mine.planes(0)(y * w + x))
        maxDiff = math.max(maxDiff, d)
      }
      assert(maxDiff <= 1,
        s"foreign-file decode diverges from ImageIO by $maxDiff ($id)")
    }
  }

  test("4:4:4 color roundtrip stays within ±3 of ImageIO per channel " +
       "(IDCT + two YCbCr roundings stack)") {
    val (w, h) = (32, 24)
    val rgb = Array.tabulate(w * h * 3) { i =>
      val px = i / 3; val x = px % w; val y = px / w
      (i % 3) match {
        case 0 => (x * 8) % 256
        case 1 => (y * 10) % 256
        case _ => (x * 3 + y * 5) % 256
      }
    }
    val bytes = Jpeg.jpegEncodeRgb(rgb, w, h)
    val ref = imageIO(bytes)
    val mine = Jpeg.jpegDecode(1L, bytes)
    assert(mine.nComp == 3)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val p = ref.getRGB(x, y)
      val i = y * w + x
      maxDiff = math.max(maxDiff, math.abs(((p >> 16) & 0xff) -
        mine.planes(0)(i)))
      maxDiff = math.max(maxDiff, math.abs(((p >> 8) & 0xff) -
        mine.planes(1)(i)))
      maxDiff = math.max(maxDiff, math.abs((p & 0xff) - mine.planes(2)(i)))
    }
    assert(maxDiff <= 3,
      s"color decode diverges from ImageIO by $maxDiff")
  }

  test("jpegDecode rejects non-JPEG and non-baseline payloads") {
    intercept[IllegalArgumentException] {
      Jpeg.jpegDecode(1L, Array.fill[Byte](64)(0x42))
    }
    // flip SOF0 to SOF2 (progressive) in a valid file
    val (p, w, h) = Jpeg.plant(1L)
    val bytes = Jpeg.jpegEncodeGray(p, w, h)
    val sof = bytes.indices.find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0).get
    bytes(sof + 1) = 0xc2.toByte
    intercept[IllegalArgumentException] { Jpeg.jpegDecode(1L, bytes) }
  }

  test("mm_jpeg_decode matches its closed-form oracle at fixture scale") {
    val got = Jpeg.jpegDecodeE2e(spark, sfDir).collect()
    assert(got.length > 0)
    got.take(50).foreach { r =>
      val id = r.getLong(0)
      val bw = 2 + (id % 3); val bh = 1 + (id % 4)
      assert(r.getLong(1) == 8 * bw && r.getLong(2) == 8 * bh)
      val expSum = 64L * (for (y <- 0L until bh; x <- 0L until bw)
        yield (id + 7 * x + 13 * y) % 200).sum
      assert(r.getLong(4) == expSum, s"sum_gray mismatch for doc $id")
      assert(r.getLong(5) == id % 200)
      assert(r.getLong(6) == (id + 7 * (bw - 1) + 13 * (bh - 1)) % 200)
    }
  }
}
