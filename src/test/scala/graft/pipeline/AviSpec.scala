package graft.pipeline

import graft.SparkSpec

/** Container-level checks for the AVI mux/demux pair, independent of
  * the gate's closed-form oracle: byte-exact frame roundtrip, header
  * geometry, and loud failure on the corruption classes a container
  * walk must catch.
  */
class AviSpec extends SparkSpec {

  private def frames(id: Long): (Seq[Array[Byte]], Int, Int) = {
    val (bw, bh, nf) = Avi.plantGeom(id)
    val w = bw * 8; val h = bh * 8
    ((0 until nf).map(f =>
      Jpeg.jpegEncodeGray(Avi.plantFrame(id, f, bw, bh), w, h)), w, h)
  }

  test("mux → demux roundtrips every frame byte-exactly") {
    for (id <- 0L to 6L) {
      val (fs, w, h) = frames(id)
      val v = Avi.aviDemux(id, Avi.aviMuxMjpeg(fs, w, h))
      assert(v.width == w && v.height == h)
      assert(v.frames.length == fs.length)
      v.frames.zip(fs).foreach { case (got, want) =>
        assert(java.util.Arrays.equals(got, want),
          s"doc $id: demuxed frame differs from the muxed payload")
      }
    }
  }

  test("odd-length frame payloads are padded per RIFF and recovered " +
       "unpadded") {
    // a hand-built odd-length 'frame' (not a JPEG - the container
    // layer must not care) exercises the pad byte on mux AND demux
    val odd = Array.tabulate(33)(i => (i * 7).toByte)
    val even = Array.tabulate(40)(i => (i * 3).toByte)
    val v = Avi.aviDemux(9L, Avi.aviMuxMjpeg(Seq(odd, even, odd), 16, 8))
    assert(v.frames.map(_.length) == Seq(33, 40, 33))
    assert(java.util.Arrays.equals(v.frames(0), odd))
    assert(java.util.Arrays.equals(v.frames(1), even))
  }

  test("corrupted containers fail loudly with the doc id") {
    val (fs, w, h) = frames(3L)
    val good = Avi.aviMuxMjpeg(fs, w, h)
    // not RIFF
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    val e1 = intercept[IllegalArgumentException] {
      Avi.aviDemux(3L, notRiff)
    }
    assert(e1.getMessage.contains("doc 3"))
    // RIFF but not the AVI form
    val notAvi = good.clone()
    notAvi(8) = 'W'.toByte; notAvi(9) = 'A'.toByte
    notAvi(10) = 'V'.toByte; notAvi(11) = 'E'.toByte
    intercept[IllegalArgumentException] { Avi.aviDemux(3L, notAvi) }
    // truncated payload: RIFF length overruns
    intercept[IllegalArgumentException] {
      Avi.aviDemux(3L, good.take(good.length / 2))
    }
    // frame-count lie: avih dwTotalFrames (offset 8+4+12+8+16) += 1
    val lied = good.clone()
    val avihData = 12 + 8 + 4 + 8 // RIFF hdr + LIST hdr + 'hdrl' + avih hdr
    lied(avihData + 16) = (lied(avihData + 16) + 1).toByte
    val e2 = intercept[IllegalArgumentException] { Avi.aviDemux(3L, lied) }
    assert(e2.getMessage.contains("declares"))
  }

  test("interleaved A/V: both streams roundtrip byte-exactly, the " +
       "audio format is recovered from the strl walk, and chunking " +
       "is transport-only") {
    val (fs, w, h) = frames(5L)
    val pcm = Array.tabulate(101)(i => (i * 13 - 7).toByte) // odd length
    val chunks = Seq(pcm.take(40), pcm.slice(40, 41), pcm.drop(41))
    val v = Avi.aviDemux(5L, Avi.aviMux(fs, w, h, chunks, 12000))
    assert(v.frames.length == fs.length &&
      v.frames.zip(fs).forall { case (a, b) =>
        java.util.Arrays.equals(a, b)
      })
    assert(v.audioRate == 12000)
    assert(v.audioChunks.length == chunks.length)
    // reassembly by concatenation == the planted stream, regardless
    // of how the muxer chunked it (incl. the odd-length middle chunk)
    assert(java.util.Arrays.equals(v.audioChunks.flatten.toArray, pcm))
    // video-only containers still demux with no audio state
    val vOnly = Avi.aviDemux(5L, Avi.aviMuxMjpeg(fs, w, h))
    assert(vOnly.audioChunks.isEmpty && vOnly.audioRate == -1)
  }

  test("scene cut: segments partition each video, conserve gray mass, " +
       "and cut exactly where the wrap-block SAD crosses the bar") {
    val frames = Avi.aviFramesE2e(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    val segs = Avi.aviSceneCut(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    assert(segs.keySet == frames.keySet)
    segs.foreach { case (id, ss) =>
      val nf = frames(id).head.getLong(4)
      // contiguous partition of [0, nf): seg i ends where i+1 starts
      val ordered = ss.sortBy(_.getLong(1))
      assert(ordered.head.getLong(2) == 0L &&
        ordered.last.getLong(3) == nf - 1)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(2) == a.getLong(3) + 1)
        case _ =>
      }
      assert(ordered.map(_.getLong(4)).sum == nf)
      // mass conservation vs the per-frame gate
      assert(ordered.map(_.getLong(5)).sum ==
        frames(id).map(_.getLong(5)).sum, s"doc $id gray mass")
      // independent cut recomputation from the plant closed form
      val (bw, bh, nfi) = Avi.plantGeom(id)
      val cuts = (0 until nfi - 1).map { f =>
        val sad = 64L * (0 until bw * bh).map(i =>
          17L + 166L * (if ((id + 17 * f + 7 * (i % bw) + 13 * (i / bw))
            % 200 >= 183) 1 else 0)).sum
        sad > Avi.sceneCutThr * 64 * bw * bh
      }
      assert(ordered.length == 1 + cuts.count(identity),
        s"doc $id segment count vs closed-form cuts")
    }
    // non-degenerate on the fixture: both single- and multi-segment
    // videos must occur
    assert(segs.values.exists(_.length == 1) &&
      segs.values.exists(_.length > 1))
  }

  test("the gate relation matches its closed forms on a slice") {
    val rows = Avi.aviFramesE2e(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.take(200).foreach { r =>
      val id = r.getLong(0); val f = r.getLong(1)
      val (bw, bh, nf) = Avi.plantGeom(id)
      assert(r.getLong(2) == 8L * bw && r.getLong(3) == 8L * bh)
      assert(r.getLong(4) == nf.toLong && f < nf)
      val blockSum = (0 until bw * bh).map(i =>
        (id + 17 * f + 7 * (i % bw) + 13 * (i / bw)) % 200).sum
      assert(r.getLong(5) == 64L * blockSum, s"doc $id frame $f sum")
      assert(r.getLong(6) == (id + 17 * f) % 200)
      assert(r.getLong(7) == (id + 17 * f + 7 * (bw - 1) + 13 * (bh - 1)) % 200)
    }
  }
}
