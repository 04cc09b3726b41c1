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

  test("graft_minhash_agg == relational explode/min; monoid laws; map-side combine") {
    val sigs = toks
      .select(col("doc_id"), array_sort(array_distinct(
        TextFns.shingleHashes(col("toks"), 5))).as("hashes"))
      .filter(size(col("hashes")) > 0)
      .select(col("doc_id"),
        (col("doc_id") % 7).as("g"),
        TextFns.minhashSignature(col("hashes"), 12).as("sig"))
    // native aggregate vs the relational spelling (explode components,
    // groupBy, min) — must agree on every group
    val native = sigs.groupBy("g")
      .agg(expr("graft_minhash_agg(sig, 12)").as("msig"))
    val relational = sigs
      .select(col("g"), posexplode(col("sig")).as(Seq("i", "v")))
      .groupBy("g", "i").agg(min("v").as("m"))
      .groupBy("g").agg(expr(
        "transform(array_sort(collect_list(struct(i, m))), s -> s.m)")
        .as("msig"))
    val joined = native.join(relational.withColumnRenamed("msig", "rsig"), "g")
    assert(joined.filter(col("msig") =!= col("rsig")).count() === 0)
    // monoid: aggregating the per-group signatures again must equal
    // aggregating all documents directly (associativity of the merge)
    val direct = sigs.agg(expr("graft_minhash_agg(sig, 12)").as("msig"))
      .head.getSeq[Long](0)
    val merged = native.agg(expr("graft_minhash_agg(msig, 12)").as("msig"))
      .head.getSeq[Long](0)
    assert(direct === merged)
    // plan: partial aggregation before the exchange (the whole point)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_minhash_agg"),
      s"graft_minhash_agg must combine map-side (partial mode):\n$plan")
  }

  test("graft_minhash_agg identity-only groups are NULL (null / empty / all-null inputs)") {
    // the r9 advice edge: a non-null EMPTY array (or all-null
    // components) must NOT flip the seen flag — such a group carries
    // zero signature components, exactly like an all-NULL group, and
    // the relational explode/min spelling yields nothing for it
    val df = spark.sql(
      """SELECT g, graft_minhash_agg(sig, 3) AS msig FROM VALUES
           (0, CAST(NULL AS ARRAY<BIGINT>)),
           (1, CAST(array() AS ARRAY<BIGINT>)),
           (2, array(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))),
           (3, array(5L, NULL, 7L)),
           (3, CAST(NULL AS ARRAY<BIGINT>)),
           (3, array(2L, 9L, NULL))
         AS t(g, sig) GROUP BY g""")
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(df(0).isEmpty, "all-NULL group must be NULL")
    assert(df(1).isEmpty, "empty-array group must be NULL")
    assert(df(2).isEmpty, "all-null-component group must be NULL")
    // null components act as identity; the real components min normally
    assert(df(3).map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq)
      .contains(Seq(2L, 9L, 7L)))
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

  test("repStats hand cases") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),   // "a a"×3 bigrams, "a a a"×2 trigrams
      (2L, "a b a b a"), // bigrams "a b"/"b a" ×2 each, trigram "a b a"×2
      (3L, "x"),         // no bigrams or trigrams
      (4L, "x y"),       // one bigram, no trigram
      (5L, "")).toDF("id", "t") // split("", " ") -> [""], one empty token
    val r = df.select(col("id"), TextFns.repStats(split(col("t"), " ")).as("r"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1).toSeq).toMap
    assert(r(1L) == Seq(4L, 1L, 3L, 2L))
    assert(r(2L) == Seq(5L, 2L, 2L, 2L))
    assert(r(3L) == Seq(1L, 1L, 0L, 0L))
    assert(r(4L) == Seq(2L, 2L, 1L, 0L))
    assert(r(5L) == Seq(1L, 1L, 0L, 0L))
  }

  test("repStats native == relational spelling over the corpus") {
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val t = base.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val wc = t.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"),
      countDistinct("tok").as("n_distinct"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val b = t.withColumn("nxt", lead("tok", 1).over(w))
      .withColumn("nx2", lead("tok", 2).over(w))
    val bg = b.filter(col("nxt").isNotNull)
      .groupBy("doc_id", "tok", "nxt").count()
      .groupBy("doc_id").agg(max("count").as("top_bi"))
    val tg = b.filter(col("nx2").isNotNull)
      .groupBy("doc_id", "tok", "nxt", "nx2").count()
      .groupBy("doc_id").agg(max("count").as("top_tri"))
    val rel = wc.join(bg, Seq("doc_id"), "left")
      .join(tg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("top_bi", "top_tri"))
    val diff = base
      .select(col("doc_id"), TextFns.repStats(col("toks")).as("r"))
      .join(rel, Seq("doc_id"))
      .filter(element_at(col("r"), 1) =!= col("n_tokens") ||
        element_at(col("r"), 2) =!= col("n_distinct") ||
        element_at(col("r"), 3) =!= col("top_bi") ||
        element_at(col("r"), 4) =!= col("top_tri"))
    assert(diff.count() == 0)
  }

  test("pii redaction leaves no residual matches") {
    import graft.queries.PipelineQueries
    val red = PipelineQueries.q102PiiRedaction(spark, sf)
    val residual = red.filter(
      size(regexp_extract_all(col("redacted"),
        lit(PipelineQueries.emailRe), lit(0))) > 0 ||
      size(regexp_extract_all(col("redacted"),
        lit(PipelineQueries.phoneRe), lit(0))) > 0 ||
      size(regexp_extract_all(col("redacted"),
        lit(PipelineQueries.ipRe), lit(0))) > 0)
    assert(residual.count() == 0)
    // every PII class occurs somewhere, and some docs carry none
    val agg = red.agg(sum("n_emails"), sum("n_phones"), sum("n_ips"),
      sum(when(col("n_pii") === 0, 1L).otherwise(0L))).collect()(0)
    assert((0 to 3).forall(i => agg.getLong(i) > 0))
  }

  test("dup spans hand cases: overlap-merge, gap-split, zero-dup") {
    import spark.implicits._
    import graft.queries.PipelineQueries
    val sh = (1 to 10).map("s" + _).mkString(" ")   // 10-token shared run
    val run = (1 to 8).map("r" + _).mkString(" ")   // 8-token repeated run
    val docs = Seq(
      (1L, sh + " u1 u2 u3 u4"),                    // run at pos 0..9
      (2L, "v1 v2 v3 v4 v5 " + sh),                 // same run at pos 5..14
      (3L, (1 to 9).map("w" + _).mkString(" ")),    // nothing duplicated
      (4L, run + " z1 z2 " + run))                  // doc-internal repeat
      .toDF("doc_id", "text")
    val r = PipelineQueries.dupSpansOf(docs).collect()
      .map(x => x.getLong(0) -> x.toSeq.drop(1)).toMap
    // doc 1/2: three overlapping k=8 occurrences merge to ONE 10-token
    // span covering exactly the shared run
    assert(r(1L) == Seq(14L, 1L, 10L, 10L, 714L))
    assert(r(2L) == Seq(15L, 1L, 10L, 10L, 666L))
    assert(r(3L) == Seq(9L, 0L, 0L, 0L, 0L))
    // doc 4: the two copies are separated by a gap -> two 8-token spans
    assert(r(4L) == Seq(18L, 2L, 16L, 8L, 888L))
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
