package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns

/** The native hash expressions must be bit-for-bit equal to the
  * interpreted HOF spellings (which in turn mirror the DuckDB oracle
  * SQL) on the real testdata corpus. */
class HashSpec extends AnyFunSuite {
  import TestSpark._

  private def toks = Tables.documents(spark, sf)
    .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    .filter(size(col("toks")) > 0)

  test("polyHash/tokenHashes native == HOF over the corpus vocabulary") {
    val diff = toks
      .select(explode(col("toks")).as("t")).distinct()
      .select(col("t"),
        TextFns.polyHash(col("t")).as("native"),
        TextFns.polyHashHof(col("t")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("shingleHashes native == HOF for k in {2,3,5}") {
    Seq(2, 3, 5).foreach { k =>
      val diff = toks.select(
          TextFns.shingleHashes(col("toks"), k).as("native"),
          TextFns.shingleHashesHof(col("toks"), k).as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(diff.count() == 0, s"k=$k")
    }
  }

  test("shingle strings native == HOF for k in {2,3,5}") {
    Seq(2, 3, 5).foreach { k =>
      val diff = toks.select(
          TextFns.shingles(col("toks"), k).as("native"),
          TextFns.shinglesHof(col("toks"), k).as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(diff.count() == 0, s"k=$k")
    }
  }

  test("minhash signature native == HOF (n=12)") {
    val sets = toks.select(array_sort(array_distinct(
      TextFns.shingleHashes(col("toks"), 5))).as("hashes"))
      .filter(size(col("hashes")) > 0)
    val diff = sets.select(
        TextFns.minhashSignature(col("hashes"), 12).as("native"),
        TextFns.minhashSignatureHof(col("hashes"), 12).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("simhash32 native == HOF") {
    val diff = toks.select(TextFns.tokenHashes(col("toks")).as("hs"))
      .select(
        TextFns.simhash32(col("hs")).as("native"),
        TextFns.simhash32Hof(col("hs")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("graft_dot native == HOF bit-for-bit over the embeddings") {
    import graft.operators.VectorSearch
    val emb = Tables.embeddings(spark, sf)
    // self pairs + shifted pairs; exact equality required (same fold
    // order), not approximate
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .join(emb.select((col("vec_id") + 1).as("vec_id"),
        col("embedding").as("b")), Seq("vec_id"))
    val diff = pairs.select(
        VectorSearch.dotD(col("a"), col("b")).as("native"),
        VectorSearch.dotHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
    // float × double (hyperplane) inputs resolve too
    val plane = array((0 until 64).map(i => lit((i % 7 - 3) / 3.0)): _*)
    val d = emb.select(VectorSearch.dotD(col("embedding"), plane).as("n"),
        VectorSearch.dotHof(col("embedding"), plane).as("h"))
      .filter(col("n") =!= col("h"))
    assert(d.count() == 0)
  }

  test("empty-array edge cases match") {
    val empty = spark.range(1)
      .select(array().cast("array<string>").as("toks"),
        array().cast("array<long>").as("hs"))
    val r = empty.select(
      TextFns.shingleHashes(col("toks"), 3).as("sh"),
      TextFns.simhash32(col("hs")).as("simhash"),
      TextFns.minhashSignature(col("hs"), 3).as("sig"),
      TextFns.simhash32Hof(col("hs")).as("simhash_hof"),
      TextFns.minhashSignatureHof(col("hs"), 3).as("sig_hof")).collect()(0)
    assert(r.getAs[collection.Seq[Long]]("sh").isEmpty)
    assert(r.getAs[Long]("simhash") == r.getAs[Long]("simhash_hof"))
    assert(r.getAs[collection.Seq[Any]]("sig").toSeq ==
      r.getAs[collection.Seq[Any]]("sig_hof").toSeq)
  }
}
