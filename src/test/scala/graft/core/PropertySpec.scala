package graft.core

import graft.functions.Md5Util
import graft.pipeline.HashParity
import graft.streaming.StreamSum
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests of the pure kernels (no Spark session needed):
  * the algebraic identities the distributed formulations rely on.
  * Uses scalacheck directly (fixed seed-independent 200-case runs).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("clamped-walk identity: total - min(0, min prefix) == sequential walk") {
    check("clamped-walk", Prop.forAll(Gen.listOf(Gen.oneOf(1, -1))) {
      deltas =>
        // sequential reference walk (inc always; dec only while positive)
        val walk = deltas.foldLeft(0L) { (c, d) =>
          if (d == 1) c + 1 else if (c > 0) c - 1 else c
        }
        val prefixes = deltas.scanLeft(0L)(_ + _)
        prefixes.last - math.min(0L, prefixes.min) == walk
    })
  }

  test("ringPut: buffer == N most recent of all inserts, any order") {
    // seq (2nd field) is globally unique in real data - the total order
    // the engine relies on; generate it as the element index
    val rowGen = for {
      t <- Gen.choose(0L, 50L)
      v <- Gen.choose(0L, 10L)
    } yield (t, v)
    check("ringPut", Prop.forAll(Gen.listOf(rowGen), Gen.choose(1, 10)) {
      (tv, n) =>
        val rows = tv.zipWithIndex.map { case ((t, v), i) => (t, i.toLong, v) }
        val buf = rows.foldLeft(Seq.empty[(Long, Long, Long)])(
          (b, r) => StreamSum.ringPut(b, r, n))
        buf == rows.sortBy(r => (-r._1, -r._2)).take(n)
    })
  }

  test("hash48 == Horner over the md5 hex prefix") {
    check("hash48", Prop.forAll { (s: String) =>
      Md5Util.hash48(UTF8String.fromString(s)) ==
        java.lang.Long.parseLong(HashParity.md5Hex(s).substring(0, 12), 16)
    })
  }

  test("minhash permutation stays in [0, P) for any 48-bit hash") {
    import HashParity._
    check("perm-range",
      Prop.forAll(Gen.choose(0L, (1L << 48) - 1), Gen.choose(0, 31)) {
        (h, i) =>
          val v = (permA(i) * h + permB(i)) % P
          v >= 0 && v < P
      })
  }

  // ---- fused n-gram / minhash kernels vs straightforward Scala ------

  private def arr(toks: Seq[String]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      toks.map(UTF8String.fromString).toArray[Any])

  private def longs(a: org.apache.spark.sql.catalyst.util.ArrayData) =
    a.toLongArray().toSeq

  private val toksGen =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("a", "b", "ab", "", "é", "日本", "a b")))

  test("gramHashes == distinct space-joined n-grams, first-occurrence order") {
    import graft.functions.NGramUtil
    check("gramHashes", Prop.forAll(toksGen, Gen.choose(1, 5)) { (toks, n) =>
      val grams = toks.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq
      val want = grams.distinct.map(g =>
        Md5Util.hash48(UTF8String.fromString(g)))
      longs(NGramUtil.gramHashes(arr(toks), n)) == want
    })
  }

  test("dupNgrams == occurrences minus distinct n-grams") {
    import graft.functions.NGramUtil
    check("dupNgrams", Prop.forAll(toksGen, Gen.choose(1, 5)) { (toks, n) =>
      val grams = toks.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq
      NGramUtil.dupNgrams(arr(toks), n) ==
        (grams.size - grams.distinct.size).toLong
    })
  }

  test("tokenHashes == per-token hash48, non-distinct") {
    import graft.functions.NGramUtil
    check("tokenHashes", Prop.forAll(toksGen) { toks =>
      longs(NGramUtil.tokenHashes(arr(toks))) ==
        toks.map(t => Md5Util.hash48(UTF8String.fromString(t)))
    })
  }

  test("MinKAgg: any reduce/merge tree == k smallest distinct") {
    import graft.functions.MinKAgg
    val agg = MinKAgg(8)
    val gen = for {
      xs <- Gen.listOf(Gen.choose(0L, 30L)) // collisions likely
      cut <- Gen.choose(0, 10)
    } yield (xs, cut)
    check("minK", Prop.forAll(gen) { case (xs, cut) =>
      val want = xs.distinct.sorted.take(8)
      // straight fold
      val folded = xs.foldLeft(agg.zero)(agg.reduce)
      // arbitrary split: fold halves independently, then merge
      val (l, r) = xs.splitAt(math.min(cut, xs.length))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      agg.finish(folded) == want && agg.finish(merged) == want
    })
  }

  test("TopKSampleAgg: any reduce/merge tree == top-k by (skey, id)") {
    import graft.functions.TopKSampleAgg
    val agg = TopKSampleAgg(5)
    val rowGen = for {
      id <- Gen.choose(0L, 100L)
      s <- Gen.choose(-10, 0)
    } yield (id, 1L, s.toDouble)
    val gen = for {
      xs <- Gen.listOf(rowGen)
      cut <- Gen.choose(0, 10)
    } yield (xs.distinctBy(_._1), cut) // unique ids, as in real data
    check("topKSample", Prop.forAll(gen) { case (xs, cut) =>
      val want = xs.sortBy(r => (-r._3, r._1)).take(5)
      val folded = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val (l, r) = xs.splitAt(math.min(cut, xs.length))
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)))
      folded == want && merged == want
    })
  }

  test("MinHashUtil.sigs == per-permutation minimum; null on empty") {
    import graft.functions.MinHashUtil
    import HashParity._
    val hsGen = Gen.listOf(Gen.choose(0L, (1L << 48) - 1))
    val a = (0 until 8).map(permA).toArray
    val b = (0 until 8).map(permB).toArray
    check("minhashSigs", Prop.forAll(hsGen) { hs =>
      val got = MinHashUtil.sigs(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          hs.toArray), a, b, P)
      if (hs.isEmpty) got == null
      else longs(got) == (0 until 8).map(j =>
        hs.map(h => (a(j) * h + b(j)) % P).min)
    })
  }
}
