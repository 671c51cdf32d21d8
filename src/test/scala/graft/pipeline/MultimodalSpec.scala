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
