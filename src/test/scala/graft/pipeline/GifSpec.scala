package graft.pipeline

import graft.SparkSpec

/** GIF codec semantics: the LZW layer round-trips through all code
  * widths and the table reset, the container is readable by a foreign
  * decoder (ImageIO), foreign-WRITTEN files decode correctly, and
  * corruption fails loudly.
  */
class GifSpec extends SparkSpec {

  test("lzw: a pseudo-random 20k stream round-trips exactly, driving " +
       "widths 9..12 and the 4096 reset; pathological repeats hit the " +
       "KwKwK case") {
    // deterministic LCG over the full byte range: ~20k distinct-ish
    // bytes force >3838 dictionary adds -> widths 9,10,11,12 and at
    // least one CLEAR/reset cycle
    var st = 123456789L
    val noisy = Array.fill(20000) {
      st = (st * 6364136223846793005L + 1442695040888963407L)
      ((st >>> 33) & 0xff).toByte
    }
    assert(Gif.lzwDecode(Gif.lzwEncode(noisy), noisy.length).toSeq ==
      noisy.toSeq, "noisy stream must survive width bumps and reset")
    // aaaa... is the canonical KwKwK generator (every new code is
    // immediately reused before the decoder has its string)
    val runs = Array.fill(5000)(7.toByte)
    assert(Gif.lzwDecode(Gif.lzwEncode(runs), runs.length).toSeq ==
      runs.toSeq, "constant run must exercise code==next")
    val mixed = (0 until 8000).map(i => ((i / 3) % 5).toByte).toArray
    assert(Gif.lzwDecode(Gif.lzwEncode(mixed), mixed.length).toSeq ==
      mixed.toSeq)
  }

  test("gifEncode output is a valid GIF per the JDK's ImageIO reader, " +
       "pixel-identical under the palette") {
    for (id <- Seq(0L, 5L, 42L, 4567L)) {
      val w = 16 + (id % 17).toInt
      val h = 8 + (id % 11).toInt
      val idx = Gif.sceneIndices(id, w, h)
      val bytes = Gif.gifEncode(w, h, idx)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"doc $id: ImageIO cannot read our GIF")
      for (y <- 0 until h; x <- 0 until w) {
        val i = idx(y * w + x) & 0xff
        val expected = (i << 16) | (((2 * i) % 256) << 8) | (255 - i)
        assert((img.getRGB(x, y) & 0xffffff) == expected,
          s"doc $id pixel ($x,$y)")
      }
    }
  }

  test("gifDecode reads ImageIO-WRITTEN GIFs (foreign palette, foreign " +
       "LZW stream, 89a extensions)") {
    for (seed <- Seq(1, 9)) {
      val w = 21 + seed; val h = 13 + seed
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 37 + y * 91 + seed * 13) % 200) * 0x010101)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", bos))
      val bytes = bos.toByteArray
      // ImageIO's writer interlaces by default, so this also certifies
      // the four-pass row de-permutation — which is why the referee is
      // PER-PIXEL (sums are row-permutation-invariant and would pass
      // even with the passes scrambled)
      val (gw, gh, idx, pal) = Gif.gifDecodeRaster(7L, bytes)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert((gw, gh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w)
        assert((pal(idx(y * w + x) & 0xff) & 0xffffff) ==
          (ref.getRGB(x, y) & 0xffffff),
          s"seed $seed pixel ($x,$y): foreign-written GIF decodes " +
            "differently")
    }
  }

  test("animated: ImageIO counts the same frames and reads each one " +
       "pixel-identical; frame content genuinely changes") {
    for (id <- Seq(2L, 41L)) {
      val w = 16 + (id % 17).toInt
      val h = 8 + (id % 11).toInt
      val nf = (2 + id % 3).toInt
      val frames = (0 until nf).map(f => Gif.sceneIndices(id + f, w, h))
      val bytes = Gif.gifEncodeAnim(w, h, frames)
      val got = Gif.gifDecodeFrames(id, bytes)
      assert(got.length == nf)
      assert(got.map(_._3.toSeq).distinct.length == nf,
        "frames must differ - a demux re-reading frame 0 must fail")
      val rdr = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      assert(rdr.getNumImages(true) == nf,
        s"doc $id: ImageIO sees a different frame count")
      for (f <- 0 until nf) {
        val img = rdr.read(f)
        val (gw, gh, idx, pal) = got(f)
        assert((img.getWidth, img.getHeight) == ((gw, gh)))
        for (y <- 0 until gh; x <- 0 until gw)
          assert((pal(idx(y * gw + x) & 0xff) & 0xffffff) ==
            (img.getRGB(x, y) & 0xffffff), s"doc $id frame $f ($x,$y)")
      }
    }
  }

  test("gifDecode rejects corrupt payloads loudly") {
    val good = Gif.gifEncode(16, 8, Gif.sceneIndices(1L, 16, 8))
    intercept[IllegalArgumentException] {
      Gif.gifDecode(1L, "NOTAGIF".getBytes ++ good.drop(7))
    }
    intercept[Exception] { Gif.gifDecode(1L, good.take(40)) }
    // truncated mid-sub-block
    intercept[Exception] { Gif.gifDecode(1L, good.take(good.length - 10)) }
  }

  test("gif end-to-end raster is bit-exact against the scene formula") {
    val rows = Gif.gifE2e(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val w = 16 + (id % 17).toInt
      val h = 8 + (id % 11).toInt
      val s = (id % Multimodal.ahashScenes).toInt
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val p = ((x + y) + 17 * ((2 * x + 3 * y + s) % 6)) % 200
        sr += p; sg += (2 * p) % 256; sb += 255 - p
      }
      assert(r.toSeq == Seq(id, w.toLong, h.toLong, sr, sg, sb,
        ((17 * (s % 6)) % 200).toLong), s"doc $id")
    }
  }
}
