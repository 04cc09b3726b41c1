package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextDedup, VectorSearch}

/** Degenerate-corpus totality (round-9 VERDICT item 6 generalized):
  * the derived-parameter formulas have boundary laws in PropertySpec;
  * this suite drives the OPERATORS those formulas feed with the
  * corpora the formulas promise to handle — empty, single-row,
  * empty-text, zero-norm — and asserts defined results, not crashes.
  * Every case here is impossible in the driver fixtures, which is
  * exactly why it needs a spec: the first real pipeline with a
  * stray all-zero embedding or an empty document must degrade, not
  * die (the ANSI-mode NaN→BIGINT cast is an exception, not a NULL).
  */
class BoundarySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val dim = 4

  test("cosineTopK: zero-norm corpus vectors and zero-norm queries are un-rankable, not a crash") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // zero-norm: no direction
      (4L, Seq(0.5f, 0.5f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq(
      (10L, Seq(1.0f, 1.0f, 0.0f, 0.0f)),
      (11L, Seq(0.0f, 0.0f, 0.0f, 0.0f)) // zero-norm query
    ).toDF("qid", "qemb")
    val out = VectorSearch.cosineTopK(corpus, queries, k = 3).collect()
    // the zero-norm corpus vector never appears; the zero-norm query
    // matches nothing (every cosine involving it is NULL)
    assert(out.forall(_.getLong(1) != 3L), "zero-norm vector must not rank")
    assert(!out.exists(_.getLong(0) == 11L), "zero-norm query has no results")
    assert(out.count(_.getLong(0) == 10L) == 3, "real query keeps full top-k")
    assert(out.forall(!_.isNullAt(2)), "no NULL cosine may survive")
  }

  test("cosine is NULL exactly on zero-norm input and unchanged elsewhere") {
    val pairs = Seq(
      (Seq(1.0f, 2.0f, 0.0f, 0.0f), Seq(2.0f, 1.0f, 0.0f, 0.0f)),
      (Seq(0.0f, 0.0f, 0.0f, 0.0f), Seq(2.0f, 1.0f, 0.0f, 0.0f)),
      (Seq(1.0f, 2.0f, 0.0f, 0.0f), Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (Seq(), Seq(2.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("a", "b")
    val got = pairs.select(VectorSearch.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).isDefined && math.abs(got(0).get - 0.8) < 1e-12)
    assert(got(1).isEmpty && got(2).isEmpty && got(3).isEmpty)
    // the guarded branch preserves the exact unguarded arithmetic
    val unguarded = pairs.limit(1).select(
      (VectorSearch.dotD(col("a"), col("b")) /
        (sqrt(VectorSearch.dotD(col("a"), col("a"))) *
          sqrt(VectorSearch.dotD(col("b"), col("b"))))).as("c"))
      .head.getDouble(0)
    assert(got(0).get == unguarded, "guard must not perturb real cosines")
  }

  test("LSH bucketing of an empty and a single-vector corpus") {
    val planes = VectorSearch.planesDF(spark,
      VectorSearch.hyperplanes(8, dim, seed = 42L))
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(VectorSearch.lshBuckets(empty, "vec_id", "embedding", planes, 4)
      .count() == 0)
    val one = Seq((7L, Seq(1.0f, -1.0f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val buckets = VectorSearch
      .lshBuckets(one, "vec_id", "embedding", planes, 4).collect()
    assert(buckets.length == 2, "8 planes / 4 bits = 2 bands")
    assert(buckets.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 16))
  }

  test("PQ training on a corpus smaller than the codebook is total") {
    import queries.VectorQueries
    // 3 vectors (< PqKs = 16 seeds), 64 dims — the codebook simply
    // ends up smaller, encoding stays total, codes stay in range
    val emb = (0L to 2L).map { v =>
      (v, Seq.tabulate(64)(i => ((v + 1) * (i + 1) % 7).toFloat / 7f))
    }.toDF("vec_id", "embedding")
    val q = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long") + 1000000L).as("qe"))
    val subs = VectorQueries.pqSubs(q)
    assert(subs.count() == 12, "3 vectors x 4 subspaces")
    assert(subs.select(max(size(col("sub")))).head.getInt(0) == 16)
    val c0 = subs.filter(col("vec_id") < 16)
      .select(col("m"), col("vec_id").as("cl"), col("sub").as("c"))
    val book = VectorQueries.pqRecompute(VectorQueries.pqAssign(subs,
      VectorQueries.pqRecompute(VectorQueries.pqAssign(subs, c0))))
    assert(book.groupBy("m").count().collect()
      .forall(_.getLong(1) <= 3), "codebook never larger than the corpus")
    val codes = VectorQueries.pqAssign(subs, book).select("vec_id", "m", "cl")
    assert(codes.count() == 12, "every (vector, subspace) gets a code")
    val bookKeys = book.select("m", "cl").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(codes.collect().forall(r =>
      bookKeys((r.getInt(1), r.getLong(2)))), "codes index the book")
  }

  test("q176/q180/q185 on a single-row corpus: guarded zeros, not divide-by-zero") {
    // one customer (zero candidate pairs) and one all-zero embedding
    // (a zero covariance matrix): the degenerate corpus every guard in
    // the EM / PCA / log-weight paths exists for. DuckDB THROWS on
    // integer division by zero while Spark nulls — the guards keep the
    // two engines on the same (defined) answer.
    val dir = java.nio.file.Files.createTempDirectory("graft-bnd").toString
    Seq((0L, "Customer#0", 1, 100.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((0L, Seq.fill(64)(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val fs = queries.MatchingQueries.q176FellegiSunter(spark, dir).collect()
    assert(fs.length == 4, "EM trajectory stays 4 rows on a pairless corpus")
    assert(fs.filter(_.getLong(0) > 0).forall(r =>
      (1 to 7).forall(i => r.getLong(i) == 0L)),
      "every post-init update is the guarded all-zero row")
    val wts = queries.MatchingQueries.q185FsMatchWeights(spark, dir).collect()
    assert(wts.isEmpty, "no pairs -> an empty (defined) weight histogram")
    val pca = queries.VectorQueries.q180PcaPower(spark, dir).collect()
    assert(pca.length == 64, "PCA stays total on a zero covariance matrix")
    assert(pca.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L),
      "zero matrix -> guarded zero vector and zero explained variance")
  }

  test("shingleSets: empty corpus, single doc, empty-text doc") {
    val docs = Seq((1L, ""), (2L, "one"), (3L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val sets = TextDedup.shingleSets(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // below k tokens there are no shingles — empty set, present row
    assert(sets(1L).isEmpty && sets(2L).isEmpty)
    assert(sets(3L).size == 3, "7 tokens, k=5 -> 3 shingles")
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.shingleSets(none, "doc_id", "text", 5).count() == 0)
  }
}
