package graft.pipeline

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AVI (RIFF) video container with MJPEG frames — the VIDEO member of
  * the multimodal codec family: a real container mux + independent
  * demux (Microsoft's public "AVI RIFF File Reference" layout), each
  * frame a genuine baseline JPEG through the `Jpeg` codec. With this,
  * frame sampling over video is real end to end — container walk →
  * per-frame codec — where `mm_frame_sample` demonstrates only the
  * digest-stub plumbing the brief prescribes for absent libraries.
  *
  * Muxer: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
  * LIST('movi' 00dc…) idx1), little-endian sizes, odd chunks padded.
  * Demuxer: validates the RIFF/'AVI ' form, walks top-level chunks
  * (unknown chunks skipped BY LENGTH, the resilience rule every
  * chunked-container parser here follows), reads width/height/frame
  * count from avih, collects '00dc' frame payloads from the movi
  * list, and cross-checks the idx1 entry count — then hands each
  * payload to `Jpeg.jpegDecode`. Negative/truncated lengths fail
  * loudly with the doc id (same contract as the WAV/PNG walks).
  *
  * The GATE (`mm_avi_frames`) stays bit-exact despite the lossy
  * per-frame codec for the same reason `mm_jpeg_decode` does: planted
  * frames are 8×8-block-constant, so the DC-only integer chain is
  * exact and the DuckDB oracle recomputes every frame's pixel sums
  * from doc_id alone — certifying container geometry AND codec
  * output, not a summary digest.
  *
  * Reference scope: streamsum has no media path
  * (`/root/reference/src-clj/streamsum/protocols.clj` is
  * events-only); this extends the commissioned multimodal family.
  *
  * 100 TB shape: one narrow mapPartitions pass, no shuffle — videos
  * are row-local work, and the explode to frames happens inside the
  * row (bounded by the planted frame count; a real corpus bounds it
  * by sampling stride). At scale the payload arrives as the binary
  * column this plant stands in for.
  */
object Avi {

  private def u32(b: java.nio.ByteBuffer, v: Long): Unit =
    b.putInt((v & 0xffffffffL).toInt)

  private def fourcc(b: java.nio.ByteBuffer, s: String): Unit =
    b.put(s.getBytes("US-ASCII"))

  /** Frames-per-second the muxer declares (dwRate/dwScale). */
  val aviFps = 10

  /** Mux MJPEG frame payloads into a canonical AVI: one 'vids' stream,
    * handler 'MJPG', every frame a keyframe in idx1.
    */
  private[pipeline] def aviMuxMjpeg(frames: Seq[Array[Byte]], w: Int,
                                    h: Int): Array[Byte] =
    aviMux(frames, w, h, Nil, 0)

  /** Mux an A/V pair: the MJPEG 'vids' stream plus (when `audioChunks`
    * is non-empty) a 'auds' 16-bit PCM mono stream at `rate` Hz,
    * chunks interleaved one '01wb' after each '00dc' (the
    * chunk-granular interleaving AVI exists for — a player reads both
    * streams in one forward pass). Every chunk of both streams is a
    * keyframe entry in idx1.
    */
  private[pipeline] def aviMux(frames: Seq[Array[Byte]], w: Int, h: Int,
                               audioChunks: Seq[Array[Byte]],
                               rate: Int): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val hasAudio = audioChunks.nonEmpty
    // interleave: 00dc f0, 01wb a0, 00dc f1, 01wb a1, ... (a missing
    // tail audio chunk just ends the interleave early)
    val chunks: Seq[(String, Array[Byte])] =
      frames.zipWithIndex.flatMap { case (f, i) =>
        ("00dc" -> f) +: audioChunks.lift(i).map("01wb" -> _).toSeq
      }
    val moviSize = 4 + chunks.map { case (_, c) =>
      8 + c.length + (c.length & 1)
    }.sum
    val strlVSize = 4 + (8 + 56) + (8 + 40)
    val strlASize = 4 + (8 + 56) + (8 + 16)
    val hdrlSize = 4 + (8 + 56) + (8 + strlVSize) +
      (if (hasAudio) 8 + strlASize else 0)
    val idx1Size = 16 * chunks.length
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fourcc(buf, "RIFF"); u32(buf, riffSize); fourcc(buf, "AVI ")
    // ---- LIST hdrl ----
    fourcc(buf, "LIST"); u32(buf, hdrlSize); fourcc(buf, "hdrl")
    fourcc(buf, "avih"); u32(buf, 56)
    u32(buf, 1000000L / aviFps) // dwMicroSecPerFrame
    u32(buf, 0); u32(buf, 0) // dwMaxBytesPerSec, dwPaddingGranularity
    u32(buf, 0x10) // dwFlags: AVIF_HASINDEX
    u32(buf, frames.length.toLong) // dwTotalFrames
    u32(buf, 0); u32(buf, if (hasAudio) 2 else 1) // dwInitialFrames, dwStreams
    u32(buf, 0) // dwSuggestedBufferSize
    u32(buf, w.toLong); u32(buf, h.toLong)
    (1 to 4).foreach(_ => u32(buf, 0)) // dwReserved
    fourcc(buf, "LIST"); u32(buf, strlVSize)
    fourcc(buf, "strl")
    fourcc(buf, "strh"); u32(buf, 56)
    fourcc(buf, "vids"); fourcc(buf, "MJPG")
    u32(buf, 0) // dwFlags
    u32(buf, 0) // wPriority + wLanguage
    u32(buf, 0) // dwInitialFrames
    u32(buf, 1); u32(buf, aviFps.toLong) // dwScale, dwRate
    u32(buf, 0); u32(buf, frames.length.toLong) // dwStart, dwLength
    u32(buf, 0) // dwSuggestedBufferSize
    u32(buf, 0xffffffffL) // dwQuality: default
    u32(buf, 0) // dwSampleSize
    buf.putShort(0); buf.putShort(0) // rcFrame left, top
    buf.putShort(w.toShort); buf.putShort(h.toShort)
    fourcc(buf, "strf"); u32(buf, 40) // BITMAPINFOHEADER
    u32(buf, 40); u32(buf, w.toLong); u32(buf, h.toLong)
    buf.putShort(1); buf.putShort(24) // biPlanes, biBitCount
    fourcc(buf, "MJPG") // biCompression
    u32(buf, (w.toLong * h * 3)) // biSizeImage
    u32(buf, 0); u32(buf, 0); u32(buf, 0); u32(buf, 0)
    if (hasAudio) {
      val nSamples = audioChunks.map(_.length / 2).sum
      fourcc(buf, "LIST"); u32(buf, strlASize)
      fourcc(buf, "strl")
      fourcc(buf, "strh"); u32(buf, 56)
      fourcc(buf, "auds"); u32(buf, 0) // fccHandler: none for PCM
      u32(buf, 0) // dwFlags
      u32(buf, 0) // wPriority + wLanguage
      u32(buf, 0) // dwInitialFrames
      u32(buf, 1); u32(buf, rate.toLong) // dwScale, dwRate (samples/s)
      u32(buf, 0); u32(buf, nSamples.toLong) // dwStart, dwLength
      u32(buf, 0) // dwSuggestedBufferSize
      u32(buf, 0xffffffffL) // dwQuality
      u32(buf, 2) // dwSampleSize = block align (16-bit mono)
      u32(buf, 0); u32(buf, 0) // rcFrame unused for audio
      fourcc(buf, "strf"); u32(buf, 16) // WAVEFORMATEX (no cbSize)
      buf.putShort(1); buf.putShort(1) // wFormatTag PCM, nChannels
      u32(buf, rate.toLong); u32(buf, rate.toLong * 2)
      buf.putShort(2); buf.putShort(16) // nBlockAlign, wBitsPerSample
    }
    // ---- LIST movi ----
    fourcc(buf, "LIST"); u32(buf, moviSize); fourcc(buf, "movi")
    // idx1 offsets are relative to the 'movi' fourcc position; the
    // first chunk header starts 4 bytes past it
    val offsets = new Array[Long](chunks.length)
    var off = 4L
    chunks.zipWithIndex.foreach { case ((id, c), i) =>
      offsets(i) = off
      fourcc(buf, id); u32(buf, c.length.toLong); buf.put(c)
      if ((c.length & 1) == 1) buf.put(0.toByte)
      off += 8 + c.length + (c.length & 1)
    }
    // ---- idx1 ----
    fourcc(buf, "idx1"); u32(buf, idx1Size)
    chunks.zipWithIndex.foreach { case ((id, c), i) =>
      fourcc(buf, id)
      u32(buf, 0x10) // AVIIF_KEYFRAME
      u32(buf, offsets(i)); u32(buf, c.length.toLong)
    }
    buf.array()
  }

  final case class AviVideo(width: Int, height: Int,
                            frames: Seq[Array[Byte]],
                            audioChunks: Seq[Array[Byte]] = Nil,
                            audioRate: Int = -1)

  /** Demux an AVI: container validation + frame payload extraction
    * (no pixel decode — callers feed frames to the codec they match).
    */
  private[pipeline] def aviDemux(docId: Long,
                                 bytes: Array[Byte]): AviVideo = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    def len(): Long = buf.getInt() & 0xffffffffL
    require(bytes.length >= 12 && tag() == "RIFF",
      s"doc $docId: not a RIFF payload")
    val riffLen = len()
    require(riffLen + 8 <= bytes.length,
      s"doc $docId: RIFF length $riffLen overruns the payload")
    require(tag() == "AVI ", s"doc $docId: RIFF form is not 'AVI '")
    var w = -1; var h = -1; var declaredFrames = -1L
    var frames = Vector.empty[Array[Byte]]
    var audio = Vector.empty[Array[Byte]]
    var audioRate = -1
    var lastStreamType = "" // strh fccType, pending for its strf
    var idxEntries = -1L
    def walk(end: Int): Unit = {
      while (buf.position() + 8 <= end) {
        val id = tag(); val sz = len()
        require(sz <= end - buf.position(),
          s"doc $docId: chunk '$id' length $sz overruns its parent")
        val next = buf.position() + sz.toInt + (sz.toInt & 1)
        id match {
          case "LIST" =>
            val listEnd = buf.position() + sz.toInt
            tag() match {
              case "hdrl" | "strl" => walk(listEnd)
              case "movi" =>
                while (buf.position() + 8 <= listEnd) {
                  val cid = tag(); val csz = len()
                  require(csz <= listEnd - buf.position(),
                    s"doc $docId: movi chunk '$cid' overruns the list")
                  if (cid == "00dc" || cid == "01wb") {
                    val c = new Array[Byte](csz.toInt); buf.get(c)
                    if (cid == "00dc") frames :+= c else audio :+= c
                  } else buf.position(buf.position() + csz.toInt)
                  if ((csz & 1) == 1) buf.position(buf.position() + 1)
                }
              case _ => // unknown list: skip by length
            }
          case "avih" =>
            require(sz >= 56, s"doc $docId: avih chunk too short ($sz)")
            val base = buf.position()
            declaredFrames = buf.getInt(base + 16) & 0xffffffffL
            w = buf.getInt(base + 32); h = buf.getInt(base + 36)
          case "strh" =>
            require(sz >= 4, s"doc $docId: strh chunk too short ($sz)")
            lastStreamType = {
              val b = new Array[Byte](4)
              buf.get(b); buf.position(buf.position() - 4)
              new String(b, "US-ASCII")
            }
          case "strf" if lastStreamType == "auds" =>
            // WAVEFORMATEX: wFormatTag u16, nChannels u16, rate u32
            require(sz >= 16, s"doc $docId: auds strf too short ($sz)")
            val base = buf.position()
            require(buf.getShort(base) == 1,
              s"doc $docId: only PCM audio supported")
            audioRate = buf.getInt(base + 4)
          case "idx1" => idxEntries = sz / 16
          case _ => // unknown chunk: skip by length
        }
        buf.position(next)
      }
    }
    walk(8 + riffLen.toInt)
    require(w > 0 && h > 0, s"doc $docId: missing or invalid avih")
    require(frames.nonEmpty, s"doc $docId: no '00dc' frames in movi")
    require(declaredFrames == frames.length,
      s"doc $docId: avih declares $declaredFrames frames, movi has " +
        s"${frames.length}")
    require(audio.isEmpty || audioRate > 0,
      s"doc $docId: '01wb' audio chunks but no parseable auds strf")
    require(idxEntries == -1L ||
      idxEntries == frames.length + audio.length,
      s"doc $docId: idx1 has $idxEntries entries for " +
        s"${frames.length}+${audio.length} chunks")
    AviVideo(w, h, frames, audio, audioRate)
  }

  // ---- mm_avi_frames gate --------------------------------------------

  final case class AviFrame(doc_id: Long, frame_idx: Long, width: Long,
                            height: Long, n_frames: Long, sum_gray: Long,
                            tl_gray: Long, br_gray: Long)

  /** Planted frame `f` of the video for `doc_id`: the 8×8
    * block-constant plant with a per-frame term, so each frame is
    * exact under the DC-only chain and every field below has a closed
    * form in (doc_id, f).
    */
  private[pipeline] def plantFrame(id: Long, f: Int,
                                   bw: Int, bh: Int): Array[Int] = {
    val w = bw * 8; val h = bh * 8
    val p = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        p(y * w + x) =
          ((id + 17 * f + 7 * (x / 8) + 13 * (y / 8)) % 200).toInt
        x += 1
      }
      y += 1
    }
    p
  }

  private[pipeline] def plantGeom(id: Long): (Int, Int, Int) =
    (2 + (id % 2).toInt, 1 + (id % 3).toInt, 2 + (id % 3).toInt)

  /** End-to-end video path: mux planted MJPEG frames into a real AVI,
    * demux it independently, decode every frame with the real JPEG
    * decoder, emit per-frame geometry + exact pixel aggregates.
    */
  def aviFramesE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val s2 = Graft.ensureConf(spark)
    import s2.implicits._
    Graft.tableParallel(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val (bw, bh, nf) = plantGeom(id)
          val w = bw * 8; val h = bh * 8
          val jpegs = (0 until nf).map(f =>
            Jpeg.jpegEncodeGray(plantFrame(id, f, bw, bh), w, h))
          val video = aviDemux(id, aviMuxMjpeg(jpegs, w, h))
          require(video.width == w && video.height == h)
          video.frames.zipWithIndex.map { case (bytes, f) =>
            val img = Jpeg.jpegDecode(id, bytes)
            val g = img.planes(0)
            AviFrame(id, f.toLong, img.width.toLong, img.height.toLong,
              video.frames.length.toLong, g.map(_.toLong).sum,
              g(0).toLong, g(w * h - 1).toLong)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // ---- mm_avi_av gate ------------------------------------------------

  final case class AviAv(doc_id: Long, n_frames: Long, video_sum: Long,
                         sample_rate: Long, n_chunks: Long,
                         n_samples: Long, sum_samples: Long, peak: Long)

  /** End-to-end INTERLEAVED A/V path — the multi-stream case the AVI
    * container exists for: the planted MJPEG frames plus the WAV
    * plant's 16-bit PCM waveform (sample i = 50·(base + i%100),
    * n = 500 + id%300, rate = 8000 + (id%4)·4000 — `Multimodal
    * .wavEncode`'s closed forms, so the audio aggregates share its
    * oracle algebra) muxed as chunk-interleaved '00dc'/'01wb' streams,
    * demuxed independently (strh/strf walk recovers the PCM format),
    * every frame decoded by the real JPEG codec and the audio
    * reassembled by chunk concatenation — exact under ANY chunking,
    * which is the claim: interleaving is a transport layout, never a
    * semantic boundary. One summary row per doc keeps both streams'
    * exact integer aggregates under one hash.
    */
  def aviAvE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val s2 = Graft.ensureConf(spark)
    import s2.implicits._
    Graft.tableParallel(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (bw, bh, nf) = plantGeom(id)
          val w = bw * 8; val h = bh * 8
          val jpegs = (0 until nf).map(f =>
            Jpeg.jpegEncodeGray(plantFrame(id, f, bw, bh), w, h))
          // the WAV plant's waveform, split into nf interleave chunks
          val n = (500 + id % 300).toInt
          val rate = (8000 + (id % 4) * 4000).toInt
          val base = (id % 100).toInt
          val pcm = java.nio.ByteBuffer.allocate(2 * n)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          (0 until n).foreach(i => pcm.putShort((50 * (base + i % 100)).toShort))
          val bytes = pcm.array()
          val chunks = (0 until nf).map { f =>
            java.util.Arrays.copyOfRange(bytes,
              2 * (f * n / nf), 2 * ((f + 1) * n / nf))
          }
          val v = aviDemux(id, aviMux(jpegs, w, h, chunks, rate))
          require(v.width == w && v.height == h)
          val videoSum = v.frames.map { fb =>
            Jpeg.jpegDecode(id, fb).planes(0).map(_.toLong).sum
          }.sum
          val samples = v.audioChunks.flatMap { c =>
            val b = java.nio.ByteBuffer.wrap(c)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            (0 until c.length / 2).map(i => b.getShort(2 * i).toLong)
          }
          AviAv(id, v.frames.length.toLong, videoSum,
            v.audioRate.toLong, v.audioChunks.length.toLong,
            samples.length.toLong, samples.sum, samples.max)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Closed forms: video as in `aviFramesE2eSql` summed over frames;
    * audio exactly `Multimodal.wavDecodeE2eSql`'s algebra (n ≥ 500
    * covers a full 100-sample cycle, so peak = 50·(base + 99); sum =
    * 50·(n·base + q·4950 + r(r−1)/2) with n = 100q + r); chunk count
    * = frame count by the interleave construction.
    */
  val aviAvE2eSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         2 + doc_id % 2 AS bw,
      |         1 + doc_id % 3 AS bh,
      |         2 + doc_id % 3 AS nf,
      |         500 + doc_id % 300 AS n,
      |         doc_id % 100 AS base,
      |         8000 + (doc_id % 4) * 4000 AS rate
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, bw, bh, nf,
      |         unnest(range(0, nf)) AS f
      |  FROM t
      |), bv AS (
      |  SELECT doc_id, bw, bh, nf, f, unnest(range(0, bw * bh)) AS i
      |  FROM b
      |), vs AS (
      |  SELECT doc_id,
      |    CAST(64 * sum((doc_id + 17 * f + 7 * (i % bw)
      |                   + 13 * (i // bw)) % 200) AS BIGINT) AS video_sum
      |  FROM bv GROUP BY doc_id
      |)
      |SELECT t.doc_id,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  vs.video_sum,
      |  CAST(rate AS BIGINT) AS sample_rate,
      |  CAST(nf AS BIGINT) AS n_chunks,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(50 * (n * base + (n // 100) * 4950
      |       + (n % 100) * ((n % 100) - 1) // 2) AS BIGINT) AS sum_samples,
      |  CAST(50 * (base + 99) AS BIGINT) AS peak
      |FROM t JOIN vs ON vs.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ---- mm_scene_cut gate ---------------------------------------------

  /** Cut threshold: boundary f→f+1 is a scene cut iff the per-pixel
    * mean absolute difference exceeds this (SAD > thr·w·h, exact
    * integers).
    */
  val sceneCutThr = 40L

  final case class AviScene(doc_id: Long, seg_idx: Long, f_start: Long,
                            f_end: Long, n_frames_seg: Long,
                            seg_sum_gray: Long)

  /** SCENE-CUT temporal segmentation over the real video path — the
    * clip-extraction step a multimodal training pipeline runs after
    * decode (shot boundaries → per-shot sampling/captioning): mux,
    * demux, decode every frame with the real JPEG codec, compute the
    * per-boundary SAD (sum of absolute per-pixel differences between
    * consecutive decoded frames), cut where the per-pixel mean exceeds
    * `sceneCutThr`, and emit one row per resulting segment with its
    * exact gray mass. The plants make this non-degenerate: consecutive
    * frames differ by +17 per pixel mod 200, so a block's difference
    * is 17 except at the wrap (|17−200| = 183) — boundaries cut
    * exactly when enough blocks wrap, which varies with (doc_id, f)
    * and has a closed form the oracle replays.
    *
    * 100 TB shape: identical to the other codec gates — one narrow
    * mapPartitions pass, a doc's whole container handled in-row (SAD,
    * cut flags and segment grouping never leave the task), zero
    * shuffle before the presentation sort.
    */
  def aviSceneCut(spark: SparkSession, sfDir: String): DataFrame = {
    val s2 = Graft.ensureConf(spark)
    import s2.implicits._
    Graft.tableParallel(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val (bw, bh, nf) = plantGeom(id)
          val w = bw * 8; val h = bh * 8
          val jpegs = (0 until nf).map(f =>
            Jpeg.jpegEncodeGray(plantFrame(id, f, bw, bh), w, h))
          val video = aviDemux(id, aviMuxMjpeg(jpegs, w, h))
          require(video.width == w && video.height == h)
          val planes = video.frames.map(b => Jpeg.jpegDecode(id, b).planes(0))
          val sums = planes.map(_.map(_.toLong).sum)
          // cut flags per boundary f (between frames f and f+1)
          val cuts = (0 until nf - 1).map { f =>
            var sad = 0L
            var i = 0
            val a = planes(f); val b = planes(f + 1)
            while (i < a.length) {
              sad += math.abs(a(i).toLong - b(i).toLong); i += 1
            }
            sad > sceneCutThr * w * h
          }
          // segment index per frame = cuts crossed before it
          val seg = Array.ofDim[Int](nf)
          (1 until nf).foreach(f =>
            seg(f) = seg(f - 1) + (if (cuts(f - 1)) 1 else 0))
          (0 until nf).groupBy(seg).toSeq.map { case (s, fs) =>
            AviScene(id, s.toLong, fs.min.toLong, fs.max.toLong,
              fs.length.toLong, fs.map(sums(_)).sum)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("seg_idx"))
  }

  /** Closed forms: block constant c_f = (id + 17f + 7x + 13y) % 200;
    * the boundary SAD is 64·Σ_blocks (17 + 166·[c_f ≥ 183]) — the +17
    * step wraps to |17−200| = 183 exactly when c_f ≥ 183; segment
    * index = cuts crossed; segment mass = Σ 64·Σ_blocks c_f.
    */
  val aviSceneCutSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         2 + doc_id % 2 AS bw,
       |         1 + doc_id % 3 AS bh,
       |         2 + doc_id % 3 AS nf
       |  FROM documents
       |), fr AS (
       |  SELECT doc_id, bw, bh, nf, unnest(range(0, nf)) AS f
       |  FROM t
       |), blk AS (
       |  SELECT doc_id, bw, bh, nf, f,
       |         (doc_id + 17 * f + 7 * (i % bw) + 13 * (i // bw)) % 200
       |           AS c
       |  FROM (SELECT doc_id, bw, bh, nf, f,
       |          unnest(range(0, bw * bh)) AS i FROM fr)
       |), fsum AS (
       |  SELECT doc_id, bw, bh, nf, f,
       |         CAST(64 * sum(c) AS BIGINT) AS sum_gray,
       |         CAST(64 * sum(17 + 166 * CAST(c >= 183 AS INT))
       |           AS BIGINT) AS sad_next
       |  FROM blk GROUP BY doc_id, bw, bh, nf, f
       |), cuts AS (
       |  SELECT doc_id, f,
       |         CAST(sad_next > $sceneCutThr * 64 * bw * bh AS INT)
       |           AS cut
       |  FROM fsum WHERE f < nf - 1
       |), segf AS (
       |  SELECT s.doc_id, s.f, s.sum_gray,
       |         coalesce((SELECT sum(c.cut) FROM cuts c
       |                   WHERE c.doc_id = s.doc_id AND c.f < s.f), 0)
       |           AS seg_idx
       |  FROM fsum s
       |)
       |SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
       |  CAST(min(f) AS BIGINT) AS f_start,
       |  CAST(max(f) AS BIGINT) AS f_end,
       |  CAST(count(*) AS BIGINT) AS n_frames_seg,
       |  CAST(sum(sum_gray) AS BIGINT) AS seg_sum_gray
       |FROM segf GROUP BY doc_id, seg_idx
       |ORDER BY doc_id, seg_idx""".stripMargin

  /** Closed forms: geometry from doc_id (bw = 2 + id%2, bh = 1 + id%3,
    * nf = 2 + id%3); per block (x, y) of frame f the constant is
    * (id + 17f + 7x + 13y) % 200, 64 pixels per block.
    */
  val aviFramesE2eSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         2 + doc_id % 2 AS bw,
      |         1 + doc_id % 3 AS bh,
      |         2 + doc_id % 3 AS nf
      |  FROM documents
      |), fr AS (
      |  SELECT doc_id, bw, bh, nf, unnest(range(0, nf)) AS f
      |  FROM t
      |), b AS (
      |  SELECT doc_id, bw, bh, nf, f, unnest(range(0, bw * bh)) AS i
      |  FROM fr
      |), v AS (
      |  SELECT doc_id, bw, bh, nf, f,
      |         (doc_id + 17 * f + 7 * (i % bw) + 13 * (i // bw)) % 200
      |           AS v
      |  FROM b
      |)
      |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
      |  CAST(8 * bw AS BIGINT) AS width,
      |  CAST(8 * bh AS BIGINT) AS height,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(64 * sum(v) AS BIGINT) AS sum_gray,
      |  CAST((doc_id + 17 * f) % 200 AS BIGINT) AS tl_gray,
      |  CAST((doc_id + 17 * f + 7 * (bw - 1) + 13 * (bh - 1)) % 200
      |    AS BIGINT) AS br_gray
      |FROM v GROUP BY doc_id, bw, bh, nf, f
      |ORDER BY doc_id, frame_idx""".stripMargin
}
