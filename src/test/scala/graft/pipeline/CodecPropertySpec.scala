package graft.pipeline

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests of the pure codec kernels (no Spark session): the
  * round-trip identities the gate relies on, over ARBITRARY inputs —
  * the planted corpora exercise one texture family; these exercise
  * the input space.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("gif lzw: any byte stream round-trips exactly") {
    val bytesGen = Gen.chooseNum(0, 3000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte)))
    check("lzw-roundtrip", Prop.forAll(bytesGen) { bs =>
      val a = bs.toArray
      Gif.lzwDecode(Gif.lzwEncode(a), a.length).toSeq == a.toSeq
    })
  }

  test("gif lzw: low-entropy streams (tiny alphabets, long runs) " +
       "round-trip - the dictionary-pressure shapes") {
    val gen = for {
      alpha <- Gen.chooseNum(1, 4)
      n <- Gen.chooseNum(0, 5000)
      bs <- Gen.listOfN(n, Gen.chooseNum(0, alpha - 1).map(_.toByte))
    } yield bs
    check("lzw-lowentropy", Prop.forAll(gen) { bs =>
      val a = bs.toArray
      Gif.lzwDecode(Gif.lzwEncode(a), a.length).toSeq == a.toSeq
    })
  }

  test("gif container: any raster round-trips through encode+decode " +
       "with the canonical palette") {
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 25)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255).map(_.toByte))
    } yield (w, h, px.toArray)
    check("gif-roundtrip", Prop.forAll(gen) { case (w, h, px) =>
      val (gw, gh, idx, pal) =
        Gif.gifDecodeRaster(1L, Gif.gifEncode(w, h, px))
      gw == w && gh == h && idx.toSeq == px.toSeq &&
        (0 until 256).forall { i =>
          pal(i) == ((i << 16) | (((2 * i) % 256) << 8) | (255 - i))
        }
    })
  }

  test("histeq invariants on arbitrary scene images: remapped values " +
       "stay in [0,255], the max present value maps to 255, and the " +
       "sum is consistent with the per-value remap") {
    val gen = for {
      id <- Gen.chooseNum(0L, 100000L)
      w <- Gen.chooseNum(2, 33)
      h <- Gen.chooseNum(2, 19)
    } yield (id, w, h)
    check("histeq-bounds", Prop.forAll(gen) { case (id, w, h) =>
      val r = Multimodal.bmpHisteq(id, Multimodal.bmpEncodeScene(id, w, h))
      r.eq_max <= 255L && r.eq_tl >= 0L && r.eq_tl <= 255L &&
        r.eq_sum <= 255L * w * h &&
        // the top of the CDF always remaps to exactly 255 on any
        // non-constant image (cdf(vmax) = npix)
        (r.eq_max == 255L || r.eq_sum == 0L)
    })
  }
}
