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
    val n = Gen.chooseNum(0L, 100000000000L)
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

  test("derived index parameters at degenerate n: 0, 1, below one bucket/cell") {
    // the boundary rows the random generator may never hit exactly: an
    // EMPTY or near-empty corpus must derive the floor resolution, not
    // divide by zero, underflow, or fall off the threshold ladder
    for (v <- Seq(0L, 1L, 2L, 15L, 16L, 17L, 63L, 64L, 255L, 256L)) {
      assert(queries.VectorQueries.lshBits(v) == 4,
        s"n=$v sits inside the first bucket regime")
      assert(queries.VectorQueries.semDedupK(v) == 8,
        s"n=$v must pin the K floor")
    }
    // first step past each floor
    assert(queries.VectorQueries.lshBits(257L) == 5)
    assert(queries.VectorQueries.semDedupK(513L) == 9)
  }

  test("fsSubBlocks: monotone in n, power of two, block size stays bounded") {
    val n = Gen.chooseNum(0L, 100000000000L)
    check("monotone-pow2")(Prop.forAll(n, n) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val (slo, shi) = (queries.MatchingQueries.fsSubBlocks(lo),
        queries.MatchingQueries.fsSubBlocks(hi))
      slo <= shi && (slo & (slo - 1)) == 0 && slo >= 1 && shi <= 4096
    })
    check("bounded-block")(Prop.forAll(n) { v =>
      val s = queries.MatchingQueries.fsSubBlocks(v)
      // inside the ladder (n <= 1600·4096) the implied per-nation
      // block expectation stays <= 64 customers
      v > 1600L * 4096 || v.toDouble / s <= 1600.0
    })
    // degenerate and boundary corpora
    assert(queries.MatchingQueries.fsSubBlocks(0L) == 1)
    assert(queries.MatchingQueries.fsSubBlocks(1600L) == 1)
    assert(queries.MatchingQueries.fsSubBlocks(1601L) == 2)
  }

  test("empty-text cores are total: shingle/minhash/simhash at n = 0, 1, < k") {
    val empty = new GenericArrayData(Array.empty[Any])
    val one = new GenericArrayData(Array[Any](UTF8String.fromString("a")))
    // no shingles exist below k tokens — empty arrays, never a throw
    assert(HashExpressions.shingles(empty, 5).numElements() == 0)
    assert(HashExpressions.shingles(one, 5).numElements() == 0)
    assert(HashExpressions.shingleHashes(empty, 5).numElements() == 0)
    assert(HashExpressions.shingleHashes(one, 5).numElements() == 0)
    assert(HashExpressions.shingles(one, 1).numElements() == 1)
    // the empty shingle SET signs as all-null — the identity
    // MinhashMergeAgg skips (HashSpec pins the aggregate side)
    val esig = HashExpressions.minhashSignature(empty, 12)
    assert(esig.numElements() == 12 &&
      (0 until 12).forall(i => esig.isNullAt(i)))
    // single-element set: every permutation mins over one value —
    // defined, deterministic, in range
    val osig = HashExpressions
      .minhashSignature(new GenericArrayData(Array[Any](42L)), 12)
    assert((0 until 12).forall(i =>
      !osig.isNullAt(i) && osig.getLong(i) >= 0 && osig.getLong(i) < TextFns.P))
    // simhash of nothing: all 32 tie-break-to-1 bits — a constant,
    // not a crash (callers bucket it away via the degenerate-key caps)
    assert(HashExpressions.simhash32(
      new GenericArrayData(Array.empty[Long])) == (1L << 32) - 1)
    // repStats of the empty document: all-zero counters
    assert(HashExpressions.repStats(empty).toLongArray().toSeq ==
      Seq(0L, 0L, 0L, 0L))
  }

  test("q167 hashed weight formula: bounded in [-1000, 1000], deterministic, non-degenerate") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // evaluate the PRODUCTION SQL string (not a re-spelling) over a
    // token sample: every weight must land in the advertised milli
    // range, identical tokens must hash identically, and the table
    // must not be constant (a broken digit extraction would collapse
    // every bucket to one weight)
    val toks = (('a' to 'z').map(_.toString) ++
      Seq("", "hello", "hello", "Σ", "0", "the quick brown fox"))
      .toDF("t")
    val w = toks.select(col("t"),
      expr(queries.PipelineQueries.linWeightSql("t")).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(w.forall { case (_, v) => v >= -1000 && v <= 1000 },
      s"weights out of milli range: ${w.filter(p => p._2 < -1000 || p._2 > 1000).mkString(",")}")
    val hello = w.filter(_._1 == "hello").map(_._2).distinct
    assert(hello.length == 1, "identical tokens must weigh identically")
    assert(w.map(_._2).distinct.length > 5, "weight table must spread")
  }

  test("zero-norm guard predicate: dot(v,v) == 0 iff v is all zeros") {
    // the exact predicate VectorSearch.cosine guards on (and the
    // oracle can replay with the same fold): self-dot is a sum of
    // squares, so it is 0 exactly on the zero vector and positive
    // otherwise — making "NULL cosine" a well-defined class
    val vec: Gen[List[Double]] =
      Gen.listOfN(8, Gen.oneOf(Gen.const(0.0), Gen.chooseNum(-10.0, 10.0)))
    check("zero-norm")(Prop.forAll(vec) { v =>
      val d = graft.functions.VectorExpressions.dot(
        new GenericArrayData(v.toArray), true,
        new GenericArrayData(v.toArray), true)
      (d == 0.0) == v.forall(_ == 0.0) && d >= 0.0
    })
  }
}
