package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{SpaceSavingSketch, TextOps, VectorOps}

/** Property tests over the pure (no-Spark) kernels backing the native
  * expressions — bounds and algebraic laws that must hold for ANY
  * input, not just the driver tables.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  /** deterministic sampling bridge (no scalatestplus in the cache):
    * draws `n` seeded samples from the generator and checks each. */
  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 100).foreach { i =>
      for {
        a <- g1.apply(Gen.Parameters.default, Seed(42L + i))
        b <- g2.apply(Gen.Parameters.default, Seed(4242L + i))
      } f(a, b)
    }

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0f, 10.0f)).map(_.toArray))

  private def ad(v: Array[Float]): ArrayData =
    ArrayData.toArrayData(v)

  test("cosine is bounded, symmetric, and 1.0 on self") {
    forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      val c = VectorOps.cosineF(ad(a.take(n)), ad(b.take(n)))
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(c == VectorOps.cosineF(ad(b.take(n)), ad(a.take(n))))
    }
    forAll(vecGen) { a =>
      assert(math.abs(VectorOps.cosineF(ad(a), ad(a)) - 1.0) < 1e-9)
    }
  }

  test("cosine is scale-invariant for positive scaling") {
    forAll(vecGen, Gen.choose(0.1f, 5.0f)) { (a, s) =>
      val scaled = a.map(_ * s)
      val c1 = VectorOps.cosineF(ad(a), ad(a.reverse))
      val c2 = VectorOps.cosineF(ad(scaled), ad(a.reverse))
      assert(math.abs(c1 - c2) < 1e-5)
    }
  }

  test("mix64 is deterministic and spreads single-bit changes") {
    forAll(Gen.long) { z =>
      assert(VectorOps.mix64(z) == VectorOps.mix64(z))
      assert(java.lang.Long.bitCount(
        VectorOps.mix64(z) ^ VectorOps.mix64(z ^ 1L)) > 8)
    }
  }

  test("hyperplane signature is deterministic and seed-sensitive") {
    forAll(vecGen) { a =>
      val s1 = VectorOps.hyperplaneSig(ad(a), 16, 1000L)
      assert(s1 == VectorOps.hyperplaneSig(ad(a), 16, 1000L))
      assert((s1 & ~0xffffL) == 0L) // only nBits bits used
    }
  }

  test("simhash: identical token arrays give identical signatures; hamming ≤ 64") {
    val tokensGen = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))))
    forAll(tokensGen) { ts =>
      def arr = ArrayData.toArrayData(ts.map(UTF8String.fromString).toArray)
      val h1 = TextOps.simhash64(arr)
      assert(h1 == TextOps.simhash64(arr))
      assert(TextOps.hamming64(h1, h1) == 0)
      assert(TextOps.hamming64(h1, ~h1) == 64)
    }
  }

  test("md5Bits64 equals the top-16-hex-chars of md5 (the DuckDB oracle definition)") {
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 16)
      val expected = java.lang.Long.parseUnsignedLong(hex, 16)
      assert(TextOps.md5Bits64(UTF8String.fromString(s)) == expected)
    }
  }

  test("simhash64Md5: deterministic; order-insensitive (vote scheme is a multiset sum)") {
    val tokensGen = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))))
    forAll(tokensGen) { ts =>
      def arr(l: List[String]) =
        ArrayData.toArrayData(l.map(UTF8String.fromString).toArray)
      val h1 = TextOps.simhash64Md5(arr(ts))
      assert(h1 == TextOps.simhash64Md5(arr(ts)))
      assert(h1 == TextOps.simhash64Md5(arr(ts.reverse)))
    }
  }

  test("space-saving: est ≥ true ≥ est − err for every tracked item, any stream") {
    val streamGen = Gen.choose(10, 300).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf((1 to 20).map("item" + _))))
    forAll(streamGen) { stream =>
      val sk = new SpaceSavingSketch(8)
      stream.foreach(sk.add(_))
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      sk.topK(8).foreach { case (item, est, err) =>
        val truth = exact.getOrElse(item, 0L)
        assert(est >= truth, s"$item est $est < true $truth")
        assert(est - err <= truth, s"$item lower bound ${est - err} > true $truth")
      }
    }
  }

  test("space-saving merge preserves the over-estimate bound") {
    val streamGen = Gen.listOfN(120, Gen.oneOf((1 to 15).map("t" + _)))
    forAll(streamGen, streamGen) { (s1, s2) =>
      val a = new SpaceSavingSketch(8); s1.foreach(a.add(_))
      val b = new SpaceSavingSketch(8); s2.foreach(b.add(_))
      a.merge(b)
      val exact = (s1 ++ s2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      a.topK(8).foreach { case (item, est, _) =>
        assert(est >= exact.getOrElse(item, 0L))
      }
    }
  }

  test("fnv1a64 matches the published test vector") {
    // FNV-1a 64-bit of empty input is the offset basis
    assert(TextOps.fnv1a64(UTF8String.fromString("")) == 0xcbf29ce484222325L)
    // and of "a" (public reference value)
    assert(TextOps.fnv1a64(UTF8String.fromString("a")) == 0xaf63dc4c8601ec8cL)
  }

  test("Aho-Corasick counts == brute-force substring counts on random text") {
    import graft.functions.AcAutomaton
    // every term borderless ("window" would NOT be — border 'w');
    // "ab"⊂"abcd", "win"⊂"wind" exercise nested outputs;
    // "cab"/"ab"/"bc" overlap across positions
    val terms = Seq("ab", "abcd", "bc", "cab", "d", "win", "wind")
    val ac = new AcAutomaton(terms)
    def brute(text: String, t: String): Long =
      (0 to text.length - t.length).count(i => text.startsWith(t, i)).toLong
    val gen = Gen.listOfN(40, Gen.oneOf('a', 'b', 'c', 'd', 'w', 'i', 'n'))
      .map(_.mkString)
    forAll(gen, 200) { text =>
      val counts = new Array[Long](terms.length)
      val firsts = Array.fill(terms.length)(-1)
      val bytes = text.getBytes("UTF-8")
      val total = ac.scanInto(bytes, bytes.length, counts, firsts)
      assert(total == counts.sum)
      terms.zipWithIndex.foreach { case (t, ti) =>
        assert(counts(ti) == brute(text, t),
          s"term '$t' on '$text': ac ${counts(ti)} vs brute ${brute(text, t)}")
        val expFirst = text.indexOf(t)
        assert(firsts(ti) == expFirst,
          s"term '$t' on '$text': first ${firsts(ti)} vs ${expFirst}")
      }
    }
  }

  test("AcAutomaton rejects bordered and non-ASCII terms") {
    import graft.functions.AcAutomaton
    intercept[IllegalArgumentException](new AcAutomaton(Seq("aa"))) // border "a"
    intercept[IllegalArgumentException](new AcAutomaton(Seq("abab"))) // border "ab"
    intercept[IllegalArgumentException](new AcAutomaton(Seq("Café")))
    intercept[IllegalArgumentException](new AcAutomaton(Seq("")))
    intercept[IllegalArgumentException](new AcAutomaton(Seq("ok", "ok")))
  }
}
