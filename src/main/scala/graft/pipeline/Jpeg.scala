package graft.pipeline

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Baseline JPEG (ITU T.81 sequential DCT) — the codec family's LOSSY
  * member, completing raw raster (BMP), raw samples (WAV) and
  * lossless-compressed (PNG): pure-JVM encoder + independent decoder,
  * no library on either side.
  *
  * Encoder: level shift → 8×8 FDCT → quantization → zigzag →
  * run-length + canonical Huffman (the public Annex K luminance
  * tables), DC differentially coded across blocks, 0xFF byte
  * stuffing; grayscale or 4:4:4 YCbCr color, edge-replicated padding
  * for non-multiple-of-8 dimensions. Decoder: full marker walk
  * (APPn/COM skipped by length, DQT/DHT possibly several tables per
  * marker, DRI + RSTn restart handling), spec-procedure Huffman
  * decode (mincode/maxcode/valptr), dequant, double-precision IDCT,
  * nearest-neighbor chroma upsampling for arbitrary sampling factors
  * ≤ 4, YCbCr→RGB — it reads any baseline JPEG (ImageIO-written
  * grayscale files referee the AC/Huffman path in spec), not just its
  * own encoder's output.
  *
  * The GATE stays bit-exact despite lossiness: planted images are
  * 8×8-BLOCK-CONSTANT, so every AC coefficient quantizes to zero and
  * the DC path is exact integer end to end (DC = 8·(v−128) under the
  * flat quant table's DC step of 8 — quantize, dequantize and IDCT
  * all reproduce v exactly, to well under half a code unit of float
  * error). The lossy AC path is refereed against ImageIO in spec with
  * a ±1 tolerance (decoder IDCT rounding is implementation-defined,
  * so cross-decoder equality is the wrong oracle there).
  *
  * Reference scope: streamsum has no media path at all
  * (`/root/reference/src-clj/streamsum/protocols.clj` is events-only);
  * this extends the multimodal family commissioned next to it.
  */
object Jpeg {

  // ---- shared tables (public, ITU T.81) ------------------------------

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K luminance Huffman tables (counts per code length 1..16 +
  // symbol values); the encoder uses them for every component, which
  // is legal — table ids are per-component references
  private val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val acVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Flat encoder quant table: DC step 8 (the exactness anchor for
    * block-constant plants), AC step 16.
    */
  private[pipeline] val encQuant: Array[Int] =
    Array.tabulate(64)(i => if (i == 0) 8 else 16)

  private val cosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val cScale: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  // ---- encoder -------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      acc = (acc << len) | (bits & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        val b = ((acc >> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) put(0x7f, 8 - n) // pad with 1s
  }

  /** symbol → (code, length), canonical assignment from (BITS, VALS). */
  private def canonical(bits: Array[Int],
                        vals: Array[Int]): Array[Array[Int]] = {
    val m = Array.ofDim[Int](256, 2)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        m(vals(k)) = Array(code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    m
  }
  private val dcEnc = canonical(dcBits, dcVals)
  private val acEnc = canonical(acBits, acVals)

  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += block(y * 8 + x) * cosT(x)(u) * cosT(y)(v)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = 0.25 * cScale(u) * cScale(v) * s
        u += 1
      }
      v += 1
    }
    out
  }

  private def bitLen(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  /** Encode one quantized block (natural order); returns new DC pred. */
  private def encodeBlock(bw: BitWriter, q: Array[Int],
                          dcPred: Int): Int = {
    val dc = q(0)
    val diff = dc - dcPred
    val s = if (diff == 0) 0 else bitLen(math.abs(diff))
    bw.put(dcEnc(s)(0), dcEnc(s)(1))
    if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = q(zigzag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) {
          bw.put(acEnc(0xf0)(0), acEnc(0xf0)(1)) // ZRL
          run -= 16
        }
        val sz = bitLen(math.abs(v))
        val sym = (run << 4) | sz
        bw.put(acEnc(sym)(0), acEnc(sym)(1))
        bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(acEnc(0x00)(0), acEnc(0x00)(1)) // EOB
    dc
  }

  /** One component plane (w×h samples 0..255) → quantized blocks in
    * row-major block order, edge-replicating partial blocks.
    */
  private def planeBlocks(p: Array[Int], w: Int, h: Int)
      : Iterator[Array[Int]] = {
    val bx = (w + 7) / 8
    val by = (h + 7) / 8
    Iterator.tabulate(by * bx) { bi =>
      val b0x = (bi % bx) * 8
      val b0y = (bi / bx) * 8
      val blk = new Array[Double](64)
      var y = 0
      while (y < 8) {
        val sy = math.min(b0y + y, h - 1)
        var x = 0
        while (x < 8) {
          val sx = math.min(b0x + x, w - 1)
          blk(y * 8 + x) = p(sy * w + sx) - 128.0
          x += 1
        }
        y += 1
      }
      val d = fdct(blk)
      Array.tabulate(64)(i => math.round(d(i) / encQuant(i)).toInt)
    }
  }

  private def writeHeaders(out: java.io.ByteArrayOutputStream,
                           w: Int, h: Int, nComp: Int): Unit = {
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array(0x4a, 0x46, 0x49, 0x46, 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0 +: zigzag.map(encQuant)) // DQT id 0, zigzag order
    // SOF0: 8-bit, all components 1x1 sampling, quant table 0
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nComp) ++
      (1 to nComp).flatMap(c => Seq(c, 0x11, 0)))
    seg(0xc4, ((0x00 +: dcBits.toSeq) ++ dcVals.toSeq).toArray) // DHT DC 0
    seg(0xc4, ((0x10 +: acBits.toSeq) ++ acVals.toSeq).toArray) // DHT AC 0
    seg(0xda, Array(nComp) ++
      (1 to nComp).flatMap(c => Seq(c, 0x00)) ++ Array(0, 63, 0))
  }

  /** Grayscale baseline JPEG from a w×h sample plane. */
  private[pipeline] def jpegEncodeGray(p: Array[Int], w: Int,
                                       h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, 1)
    val bw = new BitWriter(out)
    var pred = 0
    planeBlocks(p, w, h).foreach { q => pred = encodeBlock(bw, q, pred) }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** 4:4:4 color baseline JPEG from interleaved RGB (3 ints/pixel).
    * MCU = one block per component (all 1×1 sampling), so the scan
    * interleaves Y/Cb/Cr blocks per 8×8 tile in block-row-major order.
    */
  private[pipeline] def jpegEncodeRgb(rgb: Array[Int], w: Int,
                                      h: Int): Array[Byte] = {
    val n = w * h
    val yP = new Array[Int](n)
    val cbP = new Array[Int](n)
    val crP = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i); val g = rgb(3 * i + 1); val b = rgb(3 * i + 2)
      yP(i) = clamp255(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
      cbP(i) = clamp255(math.round(
        128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b).toInt)
      crP(i) = clamp255(math.round(
        128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b).toInt)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, 3)
    val bw = new BitWriter(out)
    val planes = Array(yP, cbP, crP)
    val its = planes.map(p => planeBlocks(p, w, h))
    val preds = new Array[Int](3)
    val nBlocks = ((w + 7) / 8) * ((h + 7) / 8)
    var bi = 0
    while (bi < nBlocks) {
      var c = 0
      while (c < 3) {
        preds(c) = encodeBlock(bw, its(c).next(), preds(c))
        c += 1
      }
      bi += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  // ---- decoder -------------------------------------------------------

  /** Spec-procedure Huffman decode tables (T.81 F.2.2.3). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var l = 1
      var code = br.nextBit()
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.nextBit()
        l += 1
      }
      require(l <= 16, "corrupt Huffman stream")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val m = bytes(pos) & 0xff
          require(m == 0x00, f"marker 0xff$m%02x inside entropy data")
          pos += 1
        }
        acc = b
        cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      cnt = 0
      require((bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == (0xd0 + n),
        s"expected RST$n at $pos")
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            s += cScale(u) * cScale(v) * coef(v * 8 + u) *
              cosT(x)(u) * cosT(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = clamp255(math.round(0.25 * s + 128.0).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  final case class JpegImage(width: Int, height: Int, nComp: Int,
                             planes: Array[Array[Int]])

  /** Decode any baseline (SOF0) JPEG: grayscale → one plane; color →
    * R, G, B planes (after upsampling + YCbCr→RGB), each width×height
    * row-major.
    */
  private[pipeline] def jpegDecode(docId: Long,
                                   bytes: Array[Byte]): JpegImage = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, s"doc $docId: not a JPEG payload")
    val quant = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = -1; var h = -1
    var compIds: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compTq: Array[Int] = null
    var dri = 0
    var pos = 2
    var sosAt = -1
    var compTd: Array[Int] = null
    var compTa: Array[Int] = null
    while (sosAt < 0) {
      require((bytes(pos) & 0xff) == 0xff, s"doc $docId: bad marker sync")
      // T.81 B.1.1.2: any number of 0xFF fill bytes may pad the space
      // before a marker code - skip them or the default length-skip
      // branch below would read a bogus segment length
      while ((bytes(pos + 1) & 0xff) == 0xff) pos += 1
      val m = bytes(pos + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else {
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        val body = pos + 4
        m match {
          case 0xdb => // DQT: one or more tables
            var o = body
            while (o < pos + 2 + len) {
              val pq = (bytes(o) & 0xff) >> 4
              val tq = bytes(o) & 0x0f
              require(pq == 0, s"doc $docId: 16-bit quant unsupported")
              var k = 0
              while (k < 64) { quant(tq)(k) = bytes(o + 1 + k) & 0xff; k += 1 }
              o += 65
            }
          case 0xc4 => // DHT: one or more tables
            var o = body
            while (o < pos + 2 + len) {
              val tc = (bytes(o) & 0xff) >> 4
              val th = bytes(o) & 0x0f
              val bits = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
              val nv = bits.sum
              val vals = Array.tabulate(nv)(i => bytes(o + 17 + i) & 0xff)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              o += 17 + nv
            }
          case 0xc0 => // SOF0 baseline
            require((bytes(body) & 0xff) == 8,
              s"doc $docId: only 8-bit precision supported")
            h = ((bytes(body + 1) & 0xff) << 8) | (bytes(body + 2) & 0xff)
            w = ((bytes(body + 3) & 0xff) << 8) | (bytes(body + 4) & 0xff)
            val nc = bytes(body + 5) & 0xff
            require(nc == 1 || nc == 3,
              s"doc $docId: $nc components unsupported")
            compIds = new Array[Int](nc)
            compH = new Array[Int](nc)
            compV = new Array[Int](nc)
            compTq = new Array[Int](nc)
            var c = 0
            while (c < nc) {
              compIds(c) = bytes(body + 6 + 3 * c) & 0xff
              val s = bytes(body + 7 + 3 * c) & 0xff
              compH(c) = s >> 4
              compV(c) = s & 0x0f
              compTq(c) = bytes(body + 8 + 3 * c) & 0xff
              c += 1
            }
            // single-component scans are NON-interleaved: the MCU is
            // one data unit and the plane tiles ceil(w/8) x ceil(h/8)
            // regardless of declared sampling factors (T.81 A.2.2) -
            // normalizing to 1x1 reproduces exactly that geometry,
            // where the interleaved-MCU path would mis-tile the plane
            if (nc == 1) { compH(0) = 1; compV(0) = 1 }
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
               0xcb | 0xcd | 0xce | 0xcf =>
            throw new IllegalArgumentException(
              s"doc $docId: non-baseline SOF ${m.toHexString}")
          case 0xdd => // DRI
            dri = ((bytes(body) & 0xff) << 8) | (bytes(body + 1) & 0xff)
          case 0xda => // SOS
            val ns = bytes(body) & 0xff
            require(compIds != null && ns == compIds.length,
              s"doc $docId: partial scans unsupported")
            compTd = new Array[Int](ns)
            compTa = new Array[Int](ns)
            var s = 0
            while (s < ns) {
              val cid = bytes(body + 1 + 2 * s) & 0xff
              val c = compIds.indexOf(cid)
              require(c >= 0, s"doc $docId: unknown component $cid in SOS")
              compTd(c) = (bytes(body + 2 + 2 * s) & 0xff) >> 4
              compTa(c) = bytes(body + 2 + 2 * s) & 0x0f
              s += 1
            }
            sosAt = pos + 2 + len
          case _ => // APPn / COM / others: skip by declared length
        }
        if (sosAt < 0) pos += 2 + len
      }
    }
    val nc = compIds.length
    val hMax = compH.max
    val vMax = compV.max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeW = Array.tabulate(nc)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nc)(c => mcusY * compV(c) * 8)
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * planeH(c)))
    val br = new BitReader(bytes, sosAt)
    val preds = new Array[Int](nc)
    var rstCount = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && rstCount == dri) {
          br.restart(rstN)
          rstN = (rstN + 1) % 8
          rstCount = 0
          java.util.Arrays.fill(preds, 0)
        }
        var c = 0
        while (c < nc) {
          val q = quant(compTq(c))
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              // decode one block
              val coef = new Array[Int](64)
              val t = dcTabs(compTd(c)).decode(br)
              preds(c) += extend(br.receive(t), t)
              coef(0) = preds(c) * q(0)
              var k = 1
              while (k < 64) {
                val rs = acTabs(compTa(c)).decode(br)
                val r = rs >> 4
                val sz = rs & 0x0f
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += r
                  require(k < 64, s"doc $docId: AC index overflow")
                  coef(zigzag(k)) = extend(br.receive(sz), sz) * q(k)
                  k += 1
                }
              }
              val px = idct(coef)
              val ox = (mx * compH(c) + bx) * 8
              val oy = (my * compV(c) + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(c)((oy + yy) * planeW(c) + ox + xx) = px(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        rstCount += 1
        mx += 1
      }
      my += 1
    }
    if (nc == 1) {
      // crop the padded plane to w×h
      val g = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * planeW(0), g, y * w, w)
        y += 1
      }
      JpegImage(w, h, 1, Array(g))
    } else {
      val r = new Array[Int](w * h)
      val g = new Array[Int](w * h)
      val b = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def sample(c: Int): Int =
            planes(c)((y * compV(c) / vMax) * planeW(c) + x * compH(c) / hMax)
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          val i = y * w + x
          r(i) = clamp255(math.round(yy + 1.402 * cr).toInt)
          g(i) = clamp255(math.round(
            yy - 0.344136286 * cb - 0.714136286 * cr).toInt)
          b(i) = clamp255(math.round(yy + 1.772 * cb).toInt)
          x += 1
        }
        y += 1
      }
      JpegImage(w, h, 3, Array(r, g, b))
    }
  }

  // ---- mm_jpeg_decode gate -------------------------------------------

  final case class JpegDecoded(doc_id: Long, width: Long, height: Long,
                               n_components: Long, sum_gray: Long,
                               tl_gray: Long, br_gray: Long)

  /** Planted grayscale image for `doc_id`: bw×bh blocks of 8×8, block
    * (x, y) filled with the constant (doc_id + 7x + 13y) % 200 — every
    * closed form below needs only doc_id.
    */
  private[pipeline] def plant(id: Long): (Array[Int], Int, Int) = {
    val bw = 2 + (id % 3).toInt
    val bh = 1 + (id % 4).toInt
    val w = bw * 8
    val h = bh * 8
    val p = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        p(y * w + x) = ((id + 7 * (x / 8) + 13 * (y / 8)) % 200).toInt
        x += 1
      }
      y += 1
    }
    (p, w, h)
  }

  /** End-to-end lossy-codec path, same mapPartitions batch shape as
    * the BMP/WAV/PNG gates: genuine baseline-JPEG bytes (FDCT +
    * quantization + Huffman) in, independent marker-walking /
    * Huffman-decoding / IDCT parse out. Block-constant plants make the
    * roundtrip bit-exact (see the object Scaladoc), so the DuckDB
    * oracle recomputes header fields, the exact gray sum and two
    * corner pixels (top-left vs bottom-right pins row order AND the
    * per-block gradient) from doc_id alone.
    */
  def jpegDecodeE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val s2 = Graft.ensureConf(spark)
    import s2.implicits._
    Graft.tableParallel(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (p, w, h) = plant(id)
          val img = jpegDecode(id, jpegEncodeGray(p, w, h))
          val g = img.planes(0)
          JpegDecoded(id, img.width.toLong, img.height.toLong,
            img.nComp.toLong, g.map(_.toLong).sum,
            g(0).toLong, g(w * h - 1).toLong)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Closed forms: per block v = (doc_id + 7x + 13y) % 200, 64 pixels
    * per block; corners are blocks (0,0) and (bw−1, bh−1).
    */
  val jpegDecodeE2eSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         2 + doc_id % 3 AS bw,
      |         1 + doc_id % 4 AS bh
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, bw, bh,
      |         unnest(range(0, bw * bh)) AS i
      |  FROM t
      |), v AS (
      |  SELECT doc_id, bw, bh,
      |         (doc_id + 7 * (i % bw) + 13 * (i // bw)) % 200 AS v
      |  FROM b
      |)
      |SELECT doc_id,
      |  CAST(8 * bw AS BIGINT) AS width,
      |  CAST(8 * bh AS BIGINT) AS height,
      |  CAST(1 AS BIGINT) AS n_components,
      |  CAST(64 * sum(v) AS BIGINT) AS sum_gray,
      |  CAST(doc_id % 200 AS BIGINT) AS tl_gray,
      |  CAST((doc_id + 7 * (bw - 1) + 13 * (bh - 1)) % 200 AS BIGINT)
      |    AS br_gray
      |FROM v GROUP BY doc_id, bw, bh ORDER BY doc_id""".stripMargin
}
