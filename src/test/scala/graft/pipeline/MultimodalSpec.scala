package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The real-codec path: `bmpEncode` must produce files any BMP reader
  * accepts, and `bmpDecode` must parse arbitrary 24-bit BMPs - the JDK's
  * own ImageIO BMP reader referees both directions, independently of
  * the closed-form oracle the gate checks.
  */
class MultimodalSpec extends SparkSpec {

  test("bmpEncode output is a valid BMP per the JDK's ImageIO reader") {
    for (id <- Seq(0L, 7L, 123L, 4567L)) {
      val w = 16 + (id % 17).toInt
      val h = 8 + (id % 11).toInt
      val bytes = Multimodal.bmpEncode(id, w, h)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected the encoded BMP for doc $id")
      assert(img.getWidth == w && img.getHeight == h)
      // top-left gradient origin; bottom-right gradient max - pins the
      // bottom-up row order through an independent decoder
      val tl = img.getRGB(0, 0)
      val br = img.getRGB(w - 1, h - 1)
      assert((tl & 0xff) == 0, "top-left blue must be 0")
      assert((br & 0xff) == w - 1 + h - 1, "bottom-right blue must be max")
      assert(((tl >> 16) & 0xff) == (id % 200).toInt, "red plane constant")
    }
  }

  test("bmpResizeNearest agrees with a driver resample over ImageIO's " +
       "independently decoded raster") {
    for (id <- Seq(0L, 5L, 42L, 999L, 4567L)) {
      val w = 16 + (id % 17).toInt
      val h = 8 + (id % 11).toInt
      val bytes = Multimodal.bmpEncode(id, w, h)
      val got = Multimodal.bmpResizeNearest(id, bytes,
        Multimodal.resizeTw, Multimodal.resizeTh)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (oy <- 0 until Multimodal.resizeTh;
           ox <- 0 until Multimodal.resizeTw) {
        val rgb = img.getRGB(ox * w / Multimodal.resizeTw,
          oy * h / Multimodal.resizeTh)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      }
      val brRgb = img.getRGB(
        (Multimodal.resizeTw - 1) * w / Multimodal.resizeTw,
        (Multimodal.resizeTh - 1) * h / Multimodal.resizeTh)
      assert((got.sum_red, got.sum_green, got.sum_blue, got.br_blue) ==
        ((sr, sg, sb, (brRgb & 0xff).toLong)),
        s"doc $id resample disagrees with the ImageIO referee")
    }
  }

  test("phash: DC-dropped DCT is brightness-shift invariant; the " +
       "hash matches an independent BigInt replay of the basis fold") {
    val a = 0L
    val w0 = 16; val h0 = 8
    val bytes = Multimodal.bmpEncodeScene(a, w0, h0)
    // uniform +7 on the blue plane moves ONLY the (dropped) DC term
    val shifted = bytes.clone()
    val rowBytes = (w0 * 3 + 3) / 4 * 4
    for (y <- 0 until h0; x <- 0 until w0) {
      val off = 54 + y * rowBytes + x * 3
      shifted(off) = (shifted(off) + 7).toByte
    }
    assert(Multimodal.bmpPhash(a, shifted) ==
      Multimodal.bmpPhash(a, bytes),
      "a uniform brightness shift must not change any AC bit")
    // independent replay: same cells, BigInt basis fold, lower median
    val cells = Multimodal.bmpCells48(a, bytes)
    val coeffs = Multimodal.phashKeep.map { case (u, v) =>
      (for (y <- 0 until 6; x <- 0 until 8) yield
        BigInt(cells(y * 8 + x)) * Multimodal.phashCosW(u)(x) *
          Multimodal.phashCosH(v)(y)).sum
    }
    val med = coeffs.sorted.apply((coeffs.length + 1) / 2 - 1)
    var exp = 0L
    coeffs.indices.foreach(i => if (coeffs(i) > med) exp |= 1L << i)
    assert(Multimodal.bmpPhash(a, bytes) == exp,
      "engine hash must equal the BigInt replay")
    // exactly floor(11/2) = 5 bits set (11 distinct-or-tied coeffs,
    // strict > lower median): popcount is bounded by construction
    val n = java.lang.Long.bitCount(Multimodal.bmpPhash(a, bytes))
    assert(n <= 5, s"at most 5 of 11 bits can clear a lower median: $n")
  }

  test("ahash: same scene at different brightness hashes identically; " +
       "different scenes separate; the scene BMP is ImageIO-valid") {
    // docs 0 and 97*187 share scene (mod 97) AND dims (mod 17/11)
    val a = 0L
    val b = Multimodal.ahashScenes * 187L
    def enc(id: Long): Array[Byte] = {
      val w = 16 + (id % 17).toInt; val h = 8 + (id % 11).toInt
      Multimodal.bmpEncodeScene(id, w, h)
    }
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(enc(a))) != null)
    assert(Multimodal.bmpAhash48(a, enc(a)) ==
      Multimodal.bmpAhash48(b, enc(b)),
      "same scene + dims must hash identically")
    // brightness invariance: shift every blue byte by +10 (values stay
    // < 256) - the mean shifts equally, so no bit can flip
    val bytes = enc(a)
    val shifted = bytes.clone()
    val w0 = 16; val h0 = 8
    val rowBytes = (w0 * 3 + 3) / 4 * 4
    for (y <- 0 until h0; x <- 0 until w0) {
      val off = 54 + y * rowBytes + x * 3
      shifted(off) = (shifted(off) + 10).toByte
    }
    assert(Multimodal.bmpAhash48(a, shifted) ==
      Multimodal.bmpAhash48(a, bytes),
      "a uniform brightness shift must not change the hash")
    // scenes discriminate: across the first 97 scene ids at fixed
    // dims, most pairs must sit OUTSIDE the pairing threshold
    val dims = (0 until 40).map(i => a + i * 187L) // same dims, scene varies
    val hashes = dims.map(id => Multimodal.bmpAhash48(id, enc(id)))
    val far = (for {
      i <- hashes.indices; j <- hashes.indices if i < j
    } yield java.lang.Long.bitCount(hashes(i) ^ hashes(j)))
      .count(_ > graft.pipeline.Dedup.hammingThreshold)
    assert(far * 10 > hashes.length * (hashes.length - 1) / 2 * 7,
      s"at least 70% of cross-scene pairs must separate, got $far")
  }

  test("sobel: the plain gradient's response is EXACTLY 16 at every " +
       "interior pixel; the scene texture agrees with an ImageIO " +
       "referee convolution; degenerate dims yield zero energy") {
    // linear ramp p = x + y -> gx = gy = 8 everywhere, so the energy
    // is the constant 16*(w-2)*(h-2) with max 16: pins the kernel,
    // the interior bounds, and the bottom-up row addressing at once
    for (id <- Seq(0L, 7L, 123L)) {
      val w = 16 + (id % 17).toInt
      val h = 8 + (id % 11).toInt
      val got = Multimodal.bmpSobelEnergy(id, Multimodal.bmpEncode(id, w, h))
      assert((got.edge_sum, got.edge_max) ==
        ((16L * (w - 2) * (h - 2), 16L)), s"doc $id gradient energy")
    }
    // scene texture vs an independent ImageIO decode + driver convolve
    for (id <- Seq(3L, 42L, 4567L)) {
      val w = 16 + (id % 17).toInt
      val h = 8 + (id % 11).toInt
      val bytes = Multimodal.bmpEncodeScene(id, w, h)
      val got = Multimodal.bmpSobelEnergy(id, bytes)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      def b(x: Int, y: Int): Int = img.getRGB(x, y) & 0xff
      var (sum, mx) = (0L, 0L)
      for (y <- 1 until h - 1; x <- 1 until w - 1) {
        val gx = (b(x + 1, y - 1) + 2 * b(x + 1, y) + b(x + 1, y + 1)) -
          (b(x - 1, y - 1) + 2 * b(x - 1, y) + b(x - 1, y + 1))
        val gy = (b(x - 1, y + 1) + 2 * b(x, y + 1) + b(x + 1, y + 1)) -
          (b(x - 1, y - 1) + 2 * b(x, y - 1) + b(x + 1, y - 1))
        val e = math.abs(gx).toLong + math.abs(gy).toLong
        sum += e; if (e > mx) mx = e
      }
      assert((got.edge_sum, got.edge_max) == ((sum, mx)),
        s"doc $id scene energy disagrees with the ImageIO referee")
    }
    val tiny = Multimodal.bmpSobelEnergy(1L, Multimodal.bmpEncode(1L, 2, 5))
    assert((tiny.edge_sum, tiny.edge_max) == ((0L, 0L)))
  }

  test("histeq: hand-computed 4x2 gradient remap; constant image maps " +
       "to zero; scene corpus agrees with a replay over ImageIO's " +
       "independently decoded raster") {
    // gradient 4x2: v = x+y -> hist {0:1,1:2,2:2,3:2,4:1}, cdf_min 1,
    // eq(v) = (cdf-1)*255 DIV 7 = [0,72,145,218,255]
    val small = Multimodal.bmpHisteq(9L, Multimodal.bmpEncode(9L, 4, 2))
    assert((small.eq_sum, small.eq_max, small.eq_tl) == ((1125L, 255L, 0L)))
    // single pixel: npix == cdf_min -> the documented zero map
    val one = Multimodal.bmpHisteq(3L, Multimodal.bmpEncode(3L, 1, 1))
    assert((one.eq_sum, one.eq_max, one.eq_tl) == ((0L, 0L, 0L)))
    for (id <- Seq(3L, 42L, 4567L)) {
      val w = 16 + (id % 17).toInt
      val h = 8 + (id % 11).toInt
      val bytes = Multimodal.bmpEncodeScene(id, w, h)
      val got = Multimodal.bmpHisteq(id, bytes)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val hist = new Array[Long](256)
      for (y <- 0 until h; x <- 0 until w)
        hist(img.getRGB(x, y) & 0xff) += 1
      val npix = w.toLong * h
      val cdfMin = hist(hist.indexWhere(_ > 0))
      var cdf = 0L; var sum = 0L; var mx = 0L; var tlEq = -1L
      val tlV = img.getRGB(0, 0) & 0xff
      for (v <- 0 until 256) {
        cdf += hist(v)
        val eq = (cdf - cdfMin) * 255L / (npix - cdfMin)
        if (hist(v) > 0) { sum += hist(v) * eq; mx = math.max(mx, eq) }
        if (v == tlV) tlEq = eq
      }
      assert((got.eq_sum, got.eq_max, got.eq_tl) == ((sum, mx, tlEq)),
        s"doc $id histeq disagrees with the ImageIO-raster replay")
    }
  }

  test("vad: doc 0's 2-of-3 burst pattern merges into the two " +
       "hand-computed segments; javax.sound referee replay agrees on " +
       "sampled docs") {
    // id 0: n=500 (5 full frames), base 0, phase 0 -> frames {0,1}
    // and {3,4} active; full-frame ramp sum = 50 * 4950 = 247500
    val bytes0 = Multimodal.wavEncodeBursty(0L)
    val frames0 = Multimodal.audioFrames(0L, bytes0)
    assert(frames0.map(f => f.energy > 0).toSeq ==
      Seq(true, true, false, true, true))
    assert(frames0.filter(_.energy > 0).map(_.sum_samples).distinct ==
      Seq(247500L))
    // referee: decode with javax.sound and replay threshold+merge
    for (id <- Seq(1L, 77L, 4567L)) {
      val bytes = Multimodal.wavEncodeBursty(id)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val raw = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(raw)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = raw.length / 2
      val act = (0 until (n + 99) / 100).map { j =>
        val hi = math.min((j + 1) * 100, n)
        (j * 100 until hi).exists(i => bb.getShort(2 * i) != 0)
      }
      val got = Multimodal.audioFrames(id, bytes).map(_.energy > 0)
      assert(got == act, s"doc $id activity disagrees with javax.sound")
    }
  }

  test("bmpDecode agrees with ImageIO on every field it extracts") {
    for (id <- Seq(3L, 42L, 1001L)) {
      val w = 16 + (id % 17).toInt
      val h = 8 + (id % 11).toInt
      val bytes = Multimodal.bmpEncode(id, w, h)
      val got = Multimodal.bmpDecode(id, bytes)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      assert(got.width == w && got.height == h && got.bpp == 24)
      assert((got.sum_red, got.sum_green, got.sum_blue) == ((sr, sg, sb)),
        s"pixel sums diverge from ImageIO for doc $id")
      assert(got.tl_blue == (img.getRGB(0, 0) & 0xff))
    }
  }

  test("bmpDecode rejects non-BMP and non-24-bit payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.bmpDecode(1L, Array.fill[Byte](100)(0x42))
    }
    // flip the bpp field of a valid file to 8
    val bytes = Multimodal.bmpEncode(1L, 17, 9)
    bytes(28) = 8
    intercept[IllegalArgumentException] { Multimodal.bmpDecode(1L, bytes) }
  }

  test("wavEncode output opens in the JDK's own audio reader") {
    for (id <- Seq(0L, 13L, 777L)) {
      val bytes = Multimodal.wavEncode(id)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate.toInt == 8000 + (id % 4).toInt * 4000)
      assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
      assert(in.getFrameLength == 500 + id % 300)
    }
  }

  test("wavDecode agrees with javax.sound on rate, length and samples") {
    for (id <- Seq(5L, 299L, 4242L)) {
      val bytes = Multimodal.wavEncode(id)
      val got = Multimodal.wavDecode(id, bytes)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pcm = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(pcm)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var (sum, peak) = (0L, Long.MinValue)
      for (i <- 0 until pcm.length / 2) {
        val s = bb.getShort(2 * i).toLong
        sum += s; peak = math.max(peak, s)
      }
      assert(got.sample_rate == in.getFormat.getSampleRate.toLong)
      assert(got.n_samples == pcm.length / 2)
      assert((got.sum_samples, got.peak) == ((sum, peak)))
    }
  }

  test("wavDecode walks non-canonical chunk layouts and rejects non-PCM") {
    // splice an unknown chunk between fmt and data - a parser that
    // assumes the canonical 44-byte layout reads garbage samples
    val canon = Multimodal.wavEncode(9L)
    val extra = java.nio.ByteBuffer.allocate(canon.length + 14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(canon, 0, 36)                       // RIFF..fmt chunk
    extra.put("LIST".getBytes).putInt(5)
      .put("junk!".getBytes).put(0.toByte)        // odd size + pad byte
    extra.put(canon, 36, canon.length - 36)       // data chunk
    val spliced = extra.array()
    // fix the RIFF size field for the inserted bytes
    java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4, spliced.length - 8)
    assert(Multimodal.wavDecode(9L, spliced) == Multimodal.wavDecode(9L, canon))
    intercept[IllegalArgumentException] {
      Multimodal.wavDecode(1L, Array.fill[Byte](100)(0x33))
    }
  }

  test("pngEncode output is a valid PNG per the JDK's ImageIO reader") {
    for (id <- Seq(0L, 7L, 123L, 4567L)) {
      val w = 12 + (id % 21).toInt
      val h = 9 + (id % 13).toInt
      val bytes = Multimodal.pngEncode(id, w, h)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected the encoded PNG for doc $id")
      assert(img.getWidth == w && img.getHeight == h)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      val sx = w.toLong * (w - 1) / 2
      val sy = h.toLong * (h - 1) / 2
      // ImageIO independently reverses all five per-row filters; the
      // sums only match if OUR filter pass encoded them correctly
      assert(sr == w.toLong * h * (id % 200))
      assert(sg == 2 * h * sx + w * sy && sb == h * sx + 2 * w * sy)
      assert((img.getRGB(0, 0) & 0xff) == 0, "top-left blue must be 0")
      assert((img.getRGB(0, h - 1) & 0xff) == 2 * (h - 1),
        "bottom-left blue pins top-down row order")
    }
  }

  test("pngDecode reads ImageIO-WRITTEN PNGs (foreign filter choices)") {
    for (id <- Seq(3L, 42L, 1001L)) {
      val w = 12 + (id % 21).toInt
      val h = 9 + (id % 13).toInt
      // build the same gradient through the JDK's own PNG ENCODER -
      // its filter selection differs from ours, so this exercises the
      // parser against scanlines we didn't produce
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((id % 200).toInt << 16) |
          ((2 * x + y) << 8) | (x + 2 * y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val got = Multimodal.pngDecode(id, bos.toByteArray)
      val viaOurs = Multimodal.pngDecode(id, Multimodal.pngEncode(id, w, h))
      assert(got == viaOurs,
        s"parsing the JDK-written PNG diverges for doc $id")
    }
  }

  test("pngDecode verifies CRCs and rejects corrupt/truncated payloads") {
    val bytes = Multimodal.pngEncode(5L, 17, 10)
    intercept[IllegalArgumentException] {
      Multimodal.pngDecode(5L, Array.fill[Byte](100)(0x11))
    }
    // flip one IDAT byte: the chunk CRC must catch it
    val corrupt = bytes.clone()
    corrupt(8 + 25 + 8 + 3) = (corrupt(8 + 25 + 8 + 3) ^ 0x7f).toByte
    intercept[IllegalArgumentException] { Multimodal.pngDecode(5L, corrupt) }
    // truncate mid-IDAT
    intercept[IllegalArgumentException] {
      Multimodal.pngDecode(5L, java.util.Arrays.copyOf(bytes, 60))
    }
  }

  test("audioFrames agrees with a javax.sound-decoded per-sample " +
       "recompute, including the partial tail frame") {
    for (id <- Seq(5L, 299L, 4242L)) {
      val bytes = Multimodal.wavEncode(id)
      val frames = Multimodal.audioFrames(id, bytes)
      // independent referee: decode via the JDK, slice, recompute
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pcm = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(pcm)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = pcm.length / 2
      val f = Multimodal.audioFrameLen
      val expect = (0 until (n + f - 1) / f).map { j =>
        val samples = (j * f until math.min(j * f + f, n))
          .map(i => bb.getShort(2 * i).toLong)
        (j.toLong, samples.length.toLong, samples.sum,
          samples.map(s => s * s).sum, samples.max)
      }
      assert(frames.map(r => (r.frame, r.n_samples, r.sum_samples,
        r.energy, r.peak)) == expect, s"doc $id frame features diverge")
      // the generator guarantees a partial tail for n % 100 != 0 docs
      if (n % f != 0) assert(frames.last.n_samples == n % f)
    }
  }

  test("pitchDetect recovers each doc's planted period with an exact " +
       "zero AMDF, resolving the octave by the smallest lag") {
    for (id <- 0L until 20L) {
      val p = (50 + id % 70).toInt
      val got = Multimodal.pitchDetect(id, Multimodal.wavEncode(id, p))
      // the sawtooth repeats exactly at p, so D(p) == 0; for p <= 59
      // the doubled lag 2p also zeroes and the tie-break must pick p
      assert(got.period == p && got.d_min == 0L,
        s"doc $id: expected period $p at D=0, got $got")
      val rate = 8000 + (id % 4) * 4000
      assert(got.pitch_mhz == 1000L * rate / p)
    }
    // independent referee on one doc: full AMDF recompute from a
    // javax.sound decode, over every candidate lag
    val id = 7L
    val p = (50 + id % 70).toInt
    val bytes = Multimodal.wavEncode(id, p)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val pcm = in.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(pcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = pcm.length / 2
    val best = (Multimodal.pitchTauMin until Multimodal.pitchTauMax)
      .map { tau =>
        ((0 until n - tau).map(i => math.abs(
          bb.getShort(2 * i).toLong -
            bb.getShort(2 * (i + tau)).toLong)).sum, tau.toLong)
      }.min
    val got = Multimodal.pitchDetect(id, bytes)
    assert((got.d_min, got.period) == best)
  }

  test("pitchDetect on the feature corpus (period 100) reports 100") {
    for (id <- Seq(5L, 299L, 4242L)) {
      val got = Multimodal.pitchDetect(id, Multimodal.wavEncode(id))
      assert(got.period == 100L && got.d_min == 0L)
    }
  }

  test("melDft/audioMel: independent double-precision DFT referee, " +
       "exact javax.sound parse referee, harmonic structure, and full " +
       "(rate, band) weight coverage") {
    // every (rate index, band) pair must carry weight - a rate whose
    // bin grid missed a band would silently zero that band's energy
    assert(Multimodal.melWeights.map(w => (w._1, w._2)).distinct.size
      == 4 * Multimodal.melFilters)

    // exact referee of the byte-parse path: javax.sound decodes the
    // same WAV; the quantized-DFT coefficients recomputed from its
    // PCM must match melDft's integers EXACTLY
    val id = 7L
    val bytes = Multimodal.wavEncode(id, (50 + id % 70).toInt)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val pcm = in.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(pcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val tc = Multimodal.melTrig.map(_._2).toArray
    val ts = Multimodal.melTrig.map(_._3).toArray
    val refCoef = (1 to Multimodal.melBins).map { k =>
      var a = 0L; var b = 0L
      for (i <- 0 until Multimodal.melFrameLen) {
        val s = bb.getShort(2 * i).toLong
        a += s * tc((k * i) & 63); b += s * ts((k * i) & 63)
      }
      (id, (id % 4).toInt, k, a, b)
    }
    assert(Multimodal.melDft(id, bytes) == refCoef)

    // independent double-precision referee of the WHOLE feature: raw
    // math.cos/sin DFT + freshly-derived double triangular weights
    // (no quantized table reuse); the engine's exact integer energy
    // is scaled by 1e6 (trig)^2 x 1e6 (weight) = 1e18
    def mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    def invMel(m: Double) = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
    for (docId <- 0L until 8L) {
      val p = (50 + docId % 70).toInt
      val base = (docId % 100).toInt
      val rate = (8000 + (docId % 4) * 4000).toInt
      val s = Array.tabulate(Multimodal.melFrameLen)(i =>
        (50.0 * (base + i % p)))
      val mMax = mel(rate / 2.0)
      val ctr = (0 to Multimodal.melFilters + 1)
        .map(j => invMel(j * mMax / (Multimodal.melFilters + 1)))
      val refE = (1 to Multimodal.melFilters).map { m =>
        (1 to Multimodal.melBins).map { k =>
          var a = 0.0; var b = 0.0
          for (i <- 0 until Multimodal.melFrameLen) {
            val th = 2.0 * math.Pi * ((k * i) % 64) / 64.0
            a += s(i) * math.cos(th); b += s(i) * math.sin(th)
          }
          val fk = k * rate / 64.0
          val w =
            if (fk <= ctr(m - 1) || fk >= ctr(m + 1)) 0.0
            else if (fk <= ctr(m)) (fk - ctr(m - 1)) / (ctr(m) - ctr(m - 1))
            else (ctr(m + 1) - fk) / (ctr(m + 1) - ctr(m))
          (a * a + b * b) * w
        }.sum
      }
      val coef = Multimodal.melDft(docId,
        Multimodal.wavEncode(docId, p))
      val wt = Multimodal.melWeights
        .filter(_._1 == (docId % 4).toInt)
      val gotE = (1 to Multimodal.melFilters).map { m =>
        wt.filter(_._2 == m).map { case (_, _, k, w) =>
          val c = coef(k - 1)
          (BigInt(c._4) * c._4 + BigInt(c._5) * c._5) * w
        }.sum
      }
      for (m <- 0 until Multimodal.melFilters) {
        val refScaled = refE(m) * 1e18
        val got = gotE(m).toDouble
        assert(math.abs(got - refScaled) <=
          math.max(1e-3 * math.abs(refScaled), 1e12),
          s"doc $docId band ${m + 1}: $got vs referee $refScaled")
      }
    }

    // harmonic structure: a period-8 sawtooth's 64-sample frame is
    // exactly periodic, so all non-DC energy sits at bins 8/16/24/32;
    // off-harmonic coefficients are quantization dust only
    val h = Multimodal.melDft(3L, Multimodal.wavEncode(3L, 8))
    val (harm, rest) = h.partition(_._3 % 8 == 0)
    assert(harm.map(c => BigInt(c._4) * c._4 + BigInt(c._5) * c._5)
      .forall(_ > BigInt("1000000000000000")))
    assert(rest.forall(c =>
      math.abs(c._4) < 10000000L && math.abs(c._5) < 10000000L))
  }

  test("audioMfcc: independent double-precision log-mel DCT referee " +
       "and c0 = plain log-energy sum") {
    // the frozen DCT table covers every (coef, band) pair, and the
    // q = 0 row is exactly the unit basis (cos 0 quantizes to 1e6)
    assert(Multimodal.mfccDct.size ==
      Multimodal.mfccCoefs * Multimodal.melFilters)
    assert(Multimodal.mfccDct.filter(_._1 == 0).forall(_._3 == 1000000L))

    // independent referee: double-precision band energies (fresh
    // cos/sin + fresh triangular weights, the audioMel referee's
    // derivation), then ln(1 + e·1e18) and a raw math.cos DCT-II —
    // no quantized table reuse anywhere
    def mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    def invMel(m: Double) = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
    val rows = Multimodal.audioMfcc(spark, sfDir)
      .filter(col("doc_id") < 8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.size == 8 * Multimodal.mfccCoefs)
    for (docId <- 0L until 8L) {
      val p = (50 + docId % 70).toInt
      val base = (docId % 100).toInt
      val rate = (8000 + (docId % 4) * 4000).toInt
      val s = Array.tabulate(Multimodal.melFrameLen)(i =>
        (50.0 * (base + i % p)))
      val mMax = mel(rate / 2.0)
      val ctr = (0 to Multimodal.melFilters + 1)
        .map(j => invMel(j * mMax / (Multimodal.melFilters + 1)))
      val lnE = (1 to Multimodal.melFilters).map { m =>
        val e = (1 to Multimodal.melBins).map { k =>
          var a = 0.0; var b = 0.0
          for (i <- 0 until Multimodal.melFrameLen) {
            val th = 2.0 * math.Pi * ((k * i) % 64) / 64.0
            a += s(i) * math.cos(th); b += s(i) * math.sin(th)
          }
          val fk = k * rate / 64.0
          val w =
            if (fk <= ctr(m - 1) || fk >= ctr(m + 1)) 0.0
            else if (fk <= ctr(m)) (fk - ctr(m - 1)) / (ctr(m) - ctr(m - 1))
            else (ctr(m + 1) - fk) / (ctr(m + 1) - ctr(m))
          (a * a + b * b) * w
        }.sum
        math.log(1.0 + e * 1e18)
      }
      for (q <- 0 until Multimodal.mfccCoefs) {
        val ref = (1 to Multimodal.melFilters).map(m =>
          lnE(m - 1) * math.cos(
            math.Pi * q * (2 * m - 1) / (2.0 * Multimodal.melFilters))).sum
        val got = rows((docId, q.toLong))
        assert(math.abs(got - ref) <= 0.02,
          s"doc $docId coef $q: $got vs referee $ref")
      }
      // c0 is the plain log-energy sum
      assert(math.abs(rows((docId, 0L)) - lnE.sum) <= 0.02)
    }
  }

  test("bmp end-to-end matches the closed-form derivation") {
    val got = Multimodal.bmpDecodeE2e(spark, sfDir)
      .filter(col("doc_id") < 20)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      val w = 16 + id % 17
      val h = 8 + id % 11
      val sumBlue = h * (w * (w - 1) / 2) + w * (h * (h - 1) / 2)
      assert(r.getLong(1) == w && r.getLong(2) == h && r.getLong(3) == 24L)
      assert(r.getLong(4) == w * h * (id % 200))
      assert(r.getLong(5) == 2 * sumBlue && r.getLong(6) == sumBlue)
      assert(r.getLong(7) == 0L)
    }
  }
}
