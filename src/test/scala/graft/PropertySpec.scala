package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashExpressions, PorterStemmer, TextFns}

/** Property-based checks (ScalaCheck) for the pure-JVM cores the
  * native expressions call — the algebraic laws the 100 TB designs
  * lean on, tested over random inputs rather than fixtures:
  *
  *  - the MinHash monoid law `sig(A ∪ B) = min(sig A, sig B)` that
  *    makes [[graft.functions.AggExpressions.MinhashMergeAgg]] (and
  *    every shard-merge of signatures) correct;
  *  - hash range/determinism contracts;
  *  - the cents quantization round-trip that every money column
  *    relies on for oracle hash-equality;
  *  - stemmer output-shape safety over arbitrary lowercase words.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def sig(xs: Seq[Long], n: Int): Seq[Long] =
    HashExpressions.minhashSignature(new GenericArrayData(xs.toArray), n)
      .toLongArray().toSeq

  private val hashes: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, TextFns.P - 1))

  test("minhash monoid: sig(A ∪ B) == elementwise min(sig A, sig B)") {
    check("monoid")(Prop.forAll(hashes, hashes) { (a, b) =>
      val union = sig(a ++ b, 12)
      val merged = sig(a, 12).zip(sig(b, 12)).map { case (x, y) => x min y }
      union == merged
    })
  }

  test("minhash is permutation- and duplication-invariant (a SET function)") {
    check("set-invariance")(Prop.forAll(hashes) { a =>
      sig(a, 12) == sig(a.reverse, 12) && sig(a, 12) == sig(a ++ a, 12)
    })
  }

  test("polyHash lands in [0, P) and is deterministic") {
    check("polyhash")(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = HashExpressions.polyHash(UTF8String.fromString(s))
      h >= 0L && h < TextFns.P &&
        h == HashExpressions.polyHash(UTF8String.fromString(s))
    })
  }

  test("cents quantization round-trips every integer cent amount") {
    check("cents")(
      Prop.forAll(Gen.chooseNum(-1000000000000L, 1000000000000L)) { n =>
        Math.round(n / 100.0 * 100) == n
      })
  }

  test("repStats invariants: counts bounded by input size") {
    val toks = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "ab", "xy"))
    check("repstats")(Prop.forAll(toks) { ts =>
      val arr = new GenericArrayData(
        ts.map(UTF8String.fromString).toArray[Any])
      val r = HashExpressions.repStats(arr).toLongArray()
      val Array(n, nd, bi, tri) = r
      n == ts.length && nd >= 1 && nd <= n &&
        bi >= 0 && bi <= math.max(n - 1, 0) &&
        tri >= 0 && tri <= math.max(n - 2, 0)
    })
  }

  test("simhash32 lands in [0, 2^32) and is deterministic") {
    val hs = Gen.nonEmptyListOf(Gen.chooseNum(0L, TextFns.P - 1))
    check("simhash")(Prop.forAll(hs) { xs =>
      val arr = new GenericArrayData(xs.toArray)
      val h = HashExpressions.simhash32(arr).asInstanceOf[Long]
      h >= 0L && h < (1L << 32) &&
        h == HashExpressions.simhash32(new GenericArrayData(xs.toArray))
          .asInstanceOf[Long]
    })
  }

  test("stemmer output is lowercase-alpha, never longer, deterministic") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    check("stemmer")(Prop.forAll(word) { w =>
      val s = PorterStemmer.stem(w)
      s.nonEmpty && s.length <= w.length &&
        s.forall(c => c >= 'a' && c <= 'z') && s == PorterStemmer.stem(w)
    })
  }

  test("derived index parameters: monotone in n, resolution bounds hold") {
    // the laws the round-9 scale fixes lean on, over random corpus
    // sizes: both derivations are monotone non-decreasing (a bigger
    // corpus never gets a coarser index), and inside the linear
    // regime the implied bucket/cell expectation stays pinned
    val n = Gen.chooseNum(1L, 100000000000L)
    check("monotone")(Prop.forAll(n, n) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      queries.VectorQueries.lshBits(lo) <= queries.VectorQueries.lshBits(hi) &&
      queries.VectorQueries.semDedupK(lo) <= queries.VectorQueries.semDedupK(hi)
    })
    check("bounds")(Prop.forAll(n) { v =>
      val bits = queries.VectorQueries.lshBits(v)
      val k = queries.VectorQueries.semDedupK(v)
      bits >= 4 && bits <= 16 && k >= 8 && k <= 65536 &&
        // pinned expectations inside the linear regimes
        (v > (16L << 16) || v.toDouble / (1L << bits) <= 16.0) &&
        (v > 64L * 65536 || k >= (v + 63) / 64 || k == 8)
    })
  }
}
