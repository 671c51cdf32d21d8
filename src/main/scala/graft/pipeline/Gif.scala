package graft.pipeline

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GIF87a (CompuServe 1987 spec) — the codec family's PALETTE member,
  * completing raw raster (BMP), raw samples (WAV), lossless-filtered
  * (PNG), lossy (JPEG) and containers (AVI): pure-JVM encoder +
  * independent decoder, no library on either side. The interesting
  * machinery is variable-width LZW (9→12-bit codes, LSB-first bit
  * packing, CLEAR/EOI control codes, table reset at 4096) — the one
  * classic dictionary compressor the family didn't have (PNG's
  * DEFLATE is LZ77+Huffman; this is LZ78-style).
  *
  * Encoder: logical screen descriptor + 256-entry global color table
  * (entry i = (i, 2i mod 256, 255−i) — invertible, so the oracle's
  * channel sums are closed forms of the index raster), image
  * descriptor, LZW-compressed top-down row-major indices in ≤255-byte
  * sub-blocks. Decoder: signature (87a/89a), LSD + GCT, extension
  * blocks skipped by sub-block walk, local color table honored when
  * present, full variable-width LZW with the code==next
  * (KwKwK) case, deferred-clear tolerance (a full table simply stops
  * growing), and the four-pass interlace row permutation undone
  * (ImageIO WRITES interlaced by default — real GIFs in the wild
  * are). The decoder reads
  * ImageIO-WRITTEN GIFs in spec (foreign palette, foreign clear
  * strategy), not just its own encoder's output — and ImageIO reads
  * ours.
  *
  * GATE exactness: GIF is lossless over an indexed raster, so unlike
  * JPEG no block-constant trick is needed — the scene texture rides
  * through encode→decode bit-exactly and the oracle evaluates the
  * closed-form pixel formula directly.
  *
  * Reference scope: streamsum has no media path at all
  * (`/root/reference/src-clj/streamsum/protocols.clj` is events-only);
  * this extends the multimodal family commissioned next to it.
  */
object Gif {

  // ---- LZW, GIF variant ----------------------------------------------

  private val minCodeSize = 8
  private val clearCode = 1 << minCodeSize // 256
  private val eoiCode = clearCode + 1      // 257

  /** Variable-width LZW compression of an index stream (root size 8).
    * Width bumps when the encoder's next free slot passes the current
    * code range (the convention every GIF decoder expects — the
    * decoder's table runs one entry behind, so its bump lands on the
    * same code boundary); at slot 4096 a CLEAR is emitted and the
    * table resets.
    */
  private[pipeline] def lzwEncode(idx: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    var dict = new scala.collection.mutable.HashMap[Long, Int]()
    var next = eoiCode + 1
    emit(clearCode)
    var w = -1
    var i = 0
    while (i < idx.length) {
      val k = idx(i) & 0xff
      if (w < 0) w = k
      else {
        val key = (w.toLong << 8) | k
        dict.get(key) match {
          case Some(c) => w = c
          case None =>
            emit(w)
            if (next < 4096) {
              dict(key) = next
              next += 1
              // encoder's slot counter runs one ahead of the
              // decoder's, hence the +1 boundary
              if (next > (1 << width) && width < 12) width += 1
            } else {
              emit(clearCode)
              dict = new scala.collection.mutable.HashMap[Long, Int]()
              next = eoiCode + 1
              width = minCodeSize + 1
            }
            w = k
        }
      }
      i += 1
    }
    if (w >= 0) emit(w)
    emit(eoiCode)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** Variable-width LZW decompression. Handles the KwKwK case
    * (code == next free slot), CLEAR resets, and deferred clear (a
    * full 4096-entry table stops growing until the stream clears or
    * ends).
    */
  private[pipeline] def lzwDecode(data: Array[Byte],
                                  expected: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(expected)
    // table as (prefix code, appended byte); roots are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = eoiCode + 1
    var width = minCodeSize + 1
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var prev = -1
    val scratch = new Array[Byte](4096)
    def expand(code0: Int, extra: Int): Int = {
      // writes the string for code0 (+ optional extra byte) into
      // scratch back-to-front, returns its start offset
      var n = scratch.length
      if (extra >= 0) { n -= 1; scratch(n) = extra.toByte }
      var c = code0
      while (c >= clearCode + 2) {
        n -= 1; scratch(n) = append(c); c = prefix(c)
      }
      n -= 1; scratch(n) = c.toByte
      n
    }
    var done = false
    while (!done) {
      while (bitCnt < width && pos < data.length) {
        bitBuf |= (data(pos) & 0xffL) << bitCnt; bitCnt += 8; pos += 1
      }
      if (bitCnt < width) {
        require(prev == -1 || pos >= data.length,
          "truncated LZW stream")
        done = true
      } else {
        val code = (bitBuf & ((1L << width) - 1)).toInt
        bitBuf >>>= width; bitCnt -= width
        if (code == clearCode) {
          next = eoiCode + 1; width = minCodeSize + 1; prev = -1
        } else if (code == eoiCode) {
          done = true
        } else if (prev < 0) {
          require(code < clearCode, s"first code $code is not a root")
          out.write(code)
          prev = code
        } else {
          require(code <= next && code != eoiCode && code != clearCode,
            s"LZW code $code beyond table ($next)")
          val start =
            if (code < next) expand(code, -1)
            else { // KwKwK: prev's string + its own first byte
              val s = expand(prev, -1)
              val e = expand(prev, scratch(s) & 0xff)
              e
            }
          out.write(scratch, start, scratch.length - start)
          if (next < 4096) {
            prefix(next) = prev
            append(next) = scratch(start)
            next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
    }
    out.toByteArray
  }

  // ---- GIF container ---------------------------------------------------

  /** Palette entry i = (i, 2i mod 256, 255−i): invertible in the red
    * channel, so the oracle's three channel sums are closed forms of
    * the index raster.
    */
  private def paletteR(i: Int): Int = i
  private def paletteG(i: Int): Int = (2 * i) % 256
  private def paletteB(i: Int): Int = 255 - i

  /** Encode a top-down row-major index raster as a real GIF87a file
    * with the canonical 256-entry palette.
    */
  private[pipeline] def gifEncode(w: Int, h: Int,
                                  idx: Array[Byte]): Array[Byte] =
    gifEncodeAnim(w, h, Seq(idx))

  /** Multi-image (ANIMATED) encode: one GIF whose image blocks are
    * the frame sequence — the container form that makes GIF the
    * sixth codec a VIDEO member too (87a multi-image: each frame is
    * its own image descriptor + LZW stream under the shared GCT).
    */
  private[pipeline] def gifEncodeAnim(w: Int, h: Int,
                                      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == w * h),
      "raster size mismatch")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(w); u16(h)
    out.write(0xf7) // GCT present, color res 8, GCT size 256
    out.write(0)    // background index
    out.write(0)    // aspect ratio
    var i = 0
    while (i < 256) {
      out.write(paletteR(i)); out.write(paletteG(i)); out.write(paletteB(i))
      i += 1
    }
    frames.foreach { idx =>
      out.write(0x2c) // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      out.write(0) // no LCT, not interlaced
      out.write(minCodeSize)
      val lzw = lzwEncode(idx)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n)
        out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  final case class GifDecoded(doc_id: Long, width: Long, height: Long,
                              sum_red: Long, sum_green: Long,
                              sum_blue: Long, tl_idx: Long)

  /** Independent GIF parser: signature, LSD + GCT, extensions skipped
    * by sub-block walk, local color table honored, full LZW decode,
    * interlace de-permuted, per-pixel palette lookup. Returns the
    * full index raster + palette (the spec's per-pixel referee needs
    * it — channel SUMS are row-permutation-invariant, so they alone
    * could never certify the interlace path).
    */
  private[pipeline] def gifDecodeRaster(
      docId: Long,
      bytes: Array[Byte]): (Int, Int, Array[Byte], Array[Int]) =
    gifDecodeFrames(docId, bytes).head

  /** All image blocks (animation frames) until the trailer. */
  private[pipeline] def gifDecodeFrames(
      docId: Long,
      bytes: Array[Byte]): Seq[(Int, Int, Array[Byte], Array[Int])] = {
    var pos = 0
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8); pos += 2; v }
    require(bytes.length >= 13, s"doc $docId: truncated GIF")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a",
      s"doc $docId: bad GIF signature '$sig'")
    pos = 6
    u16(); u16() // logical screen dims (the frame carries its own)
    val packed = u8()
    u8(); u8()   // background, aspect
    var palette: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      palette = Array.tabulate(n)(_ => { val r = u8(); val g = u8(); val b = u8(); (r << 16) | (g << 8) | b })
    }
    def skipSubBlocks(): Unit = {
      var n = u8()
      while (n != 0) { pos += n; n = u8() }
    }
    val frames = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Array[Byte], Array[Int])]
    var done = false
    while (!done) {
      require(pos < bytes.length, s"doc $docId: no trailer before EOF")
      u8() match {
        case 0x21 => u8(); skipSubBlocks() // extension: label + blocks
        case 0x2c =>
          u16(); u16()
          val w = u16(); val h = u16()
          val ip = u8()
          val interlaced = (ip & 0x40) != 0
          var pal = palette
          if ((ip & 0x80) != 0) {
            val n = 1 << ((ip & 7) + 1)
            pal = Array.tabulate(n)(_ => { val r = u8(); val g = u8(); val b = u8(); (r << 16) | (g << 8) | b })
          }
          require(pal != null, s"doc $docId: no color table")
          val mcs = u8()
          require(mcs == minCodeSize || (mcs >= 2 && mcs <= 8),
            s"doc $docId: bad LZW root size $mcs")
          require(mcs == minCodeSize,
            s"doc $docId: only 8-bit LZW roots supported (got $mcs)")
          val lzw = new java.io.ByteArrayOutputStream()
          var n = u8()
          while (n != 0) {
            require(pos + n <= bytes.length, s"doc $docId: truncated sub-block")
            lzw.write(bytes, pos, n); pos += n; n = u8()
          }
          val idx0 = lzwDecode(lzw.toByteArray, w * h)
          require(idx0.length >= w * h,
            s"doc $docId: LZW stream yields ${idx0.length} < ${w * h} pixels")
          // interlaced rasters store rows in the spec's four passes
          // (8k, 8k+4, 4k+2, 2k+1) — undo the permutation
          val idx = if (!interlaced) idx0 else {
            val out = new Array[Byte](w * h)
            var src = 0
            for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                 y <- start until h by step) {
              System.arraycopy(idx0, src * w, out, y * w, w)
              src += 1
            }
            out
          }
          frames += ((w, h, idx, pal))
        case 0x3b =>
          require(frames.nonEmpty, s"doc $docId: trailer before image")
          done = true
        case b =>
          throw new IllegalArgumentException(
            s"doc $docId: unknown GIF block 0x${b.toHexString}")
      }
    }
    frames.toSeq
  }

  private[pipeline] def gifDecode(docId: Long,
                                  bytes: Array[Byte]): GifDecoded = {
    val (w, h, idx, pal) = gifDecodeRaster(docId, bytes)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < w * h) {
      val rgb = pal(idx(i) & 0xff)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      i += 1
    }
    GifDecoded(docId, w.toLong, h.toLong, sr, sg, sb,
      (idx(0) & 0xff).toLong)
  }

  /** The scene raster (the ahash/sobel texture) as top-down row-major
    * palette indices — p ∈ [0, 199] < 256 by construction.
    */
  private[pipeline] def sceneIndices(docId: Long, w: Int,
                                     h: Int): Array[Byte] = {
    val s = (docId % Multimodal.ahashScenes).toInt
    val a = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        a(y * w + x) =
          (((x + y) + 17 * ((2 * x + 3 * y + s) % 6)) % 200).toByte
        x += 1
      }
      y += 1
    }
    a
  }

  /** End-to-end: render the scene raster, mux it as a real GIF, decode
    * with the independent parser. Same mapPartitions shape as the
    * codec family — narrow, no shuffle, per-row cost constant in the
    * corpus.
    */
  def gifE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val s2 = Graft.ensureConf(spark)
    import s2.implicits._
    Graft.tableParallel(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 17).toInt
          val h = 8 + (id % 11).toInt
          gifDecode(id, gifEncode(w, h, sceneIndices(id, w, h)))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  final case class GifAnim(doc_id: Long, n_frames: Long, width: Long,
                           height: Long, sum_red: Long, sum_green: Long,
                           sum_blue: Long, last_tl: Long)

  /** ANIMATED end-to-end — the container face that makes GIF the
    * codec family's second VIDEO member next to AVI: 2 + doc mod 3
    * frames, frame f carrying scene (s + f) mod 97 (content genuinely
    * changes per frame, so a demux that re-reads frame 0 fails the
    * sums), muxed as one multi-image GIF and demuxed by the
    * independent parser walking image blocks to the trailer. Channel
    * sums fold across frames; `last_tl` probes the LAST frame's (0,0)
    * index — frame-count-sensitive where the sums alone would forgive
    * a dropped trailing frame of the right total.
    */
  def gifAnimE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val s2 = Graft.ensureConf(spark)
    import s2.implicits._
    Graft.tableParallel(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 17).toInt
          val h = 8 + (id % 11).toInt
          val nf = (2 + id % 3).toInt
          // frame f's scene is (s + f) mod 97: sceneIndices derives the
          // scene from docId mod 97, so shifting the id by f shifts the
          // scene by f (dims are pinned explicitly above)
          val frames = (0 until nf).map(f => sceneIndices(id + f, w, h))
          val decoded = gifDecodeFrames(id,
            gifEncodeAnim(w, h, frames))
          require(decoded.length == nf,
            s"doc $id: expected $nf frames, got ${decoded.length}")
          var (sr, sg, sb) = (0L, 0L, 0L)
          decoded.foreach { case (fw, fh, idx, pal) =>
            var i = 0
            while (i < fw * fh) {
              val rgb = pal(idx(i) & 0xff)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              i += 1
            }
          }
          GifAnim(id, nf.toLong, w.toLong, h.toLong, sr, sg, sb,
            (decoded.last._3(0) & 0xff).toLong)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Closed forms: per-frame scene (s + f) mod 97 summed over the
    * frame series × pixel series.
    */
  val gifAnimE2eSql: String = {
    val p = "(((x + y) + 17 * ((2 * x + 3 * y + sf) % 6)) % 200)"
    s"""WITH t AS (
       |  SELECT doc_id,
       |         16 + doc_id % 17 AS w,
       |         8 + doc_id % 11 AS h,
       |         doc_id % ${Multimodal.ahashScenes} AS s,
       |         2 + doc_id % 3 AS nf
       |  FROM documents
       |), fr AS (
       |  SELECT doc_id, w, h, nf,
       |    (s + f.f) % ${Multimodal.ahashScenes} AS sf, f.f
       |  FROM t, unnest(generate_series(0, 4)) f(f)
       |  WHERE f.f < nf
       |), sx AS (SELECT unnest(generate_series(0, 32)) AS x),
       |sy AS (SELECT unnest(generate_series(0, 18)) AS y),
       |e AS (
       |  SELECT doc_id, sum($p) AS sr, sum((2 * $p) % 256) AS sg,
       |         sum(255 - $p) AS sb
       |  FROM fr CROSS JOIN sx CROSS JOIN sy
       |  WHERE x < w AND y < h GROUP BY 1
       |), lt AS (
       |  SELECT doc_id,
       |    (17 * (((s + nf - 1) % ${Multimodal.ahashScenes}) % 6)) % 200
       |      AS last_tl
       |  FROM t
       |)
       |SELECT t.doc_id, CAST(t.nf AS BIGINT) AS n_frames,
       |  CAST(t.w AS BIGINT) AS width, CAST(t.h AS BIGINT) AS height,
       |  CAST(e.sr AS BIGINT) AS sum_red,
       |  CAST(e.sg AS BIGINT) AS sum_green,
       |  CAST(e.sb AS BIGINT) AS sum_blue,
       |  CAST(lt.last_tl AS BIGINT) AS last_tl
       |FROM t JOIN e USING (doc_id) JOIN lt ON lt.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  /** Closed forms: GIF is lossless over the indexed raster, so the
    * channel sums are the palette maps evaluated at the scene formula
    * over bounded series (the sobel oracle's scheme); tl_idx is the
    * formula at (0,0).
    */
  val gifE2eSql: String = {
    val p = "(((x + y) + 17 * ((2 * x + 3 * y + s) % 6)) % 200)"
    s"""WITH t AS (
       |  SELECT doc_id,
       |         16 + doc_id % 17 AS w,
       |         8 + doc_id % 11 AS h,
       |         doc_id % ${Multimodal.ahashScenes} AS s
       |  FROM documents
       |), sx AS (SELECT unnest(generate_series(0, 32)) AS x),
       |sy AS (SELECT unnest(generate_series(0, 18)) AS y),
       |e AS (
       |  SELECT doc_id, sum($p) AS sr, sum((2 * $p) % 256) AS sg,
       |         sum(255 - $p) AS sb
       |  FROM t CROSS JOIN sx CROSS JOIN sy
       |  WHERE x < w AND y < h GROUP BY 1
       |)
       |SELECT t.doc_id, CAST(t.w AS BIGINT) AS width,
       |  CAST(t.h AS BIGINT) AS height,
       |  CAST(e.sr AS BIGINT) AS sum_red,
       |  CAST(e.sg AS BIGINT) AS sum_green,
       |  CAST(e.sb AS BIGINT) AS sum_blue,
       |  CAST((17 * (t.s % 6)) % 200 AS BIGINT) AS tl_idx
       |FROM t JOIN e USING (doc_id) ORDER BY t.doc_id""".stripMargin
  }
}
