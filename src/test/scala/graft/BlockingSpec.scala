package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Blocking

/** Within-block occurrence guard for blocked dedup self-joins — the
  * skew armor q88 wears (reference analogue: the per-entity occurrence
  * caps of `matching/EntitiesMatcherV2.scala:46-50` applied to
  * `deduplication/PersonDeduplicationStage.scala`'s surname blocks). */
class BlockingSpec extends AnyFunSuite {

  test("capBlocks drops every row of an over-cap block, keeps the rest") {
    val spark = TestSpark.spark
    // block "hot" has 50 members, "warm" 10, "cold" 1
    val df = spark.range(0, 61).select(
      when(col("id") < 50, "hot")
        .when(col("id") < 60, "warm")
        .otherwise("cold").as("block"),
      col("id"))
    val capped = Blocking.capBlocks(df, Seq("block"), cap = 10L)
    val kept = capped.groupBy("block").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("warm" -> 10L, "cold" -> 1L))
  }

  test("a hot block contributes zero pairs to the q88-shaped self-join") {
    val spark = TestSpark.spark
    val df = spark.range(0, 300).select(
      when(col("id") < 250, "smith").otherwise(concat(lit("b"),
        (col("id") % 25))).as("block"),
      col("id"))
    val capped = Blocking.capBlocks(df, Seq("block"), cap = 100L)
    val pairs = capped.select(col("block"), col("id").as("id1"))
      .join(capped.select(col("block"), col("id").as("id2")), Seq("block"))
      .filter(col("id1") < col("id2"))
    assert(pairs.filter(col("block") === "smith").count() === 0L)
    assert(pairs.count() > 0L)
  }

  test("q88 emits pairs and no block exceeds the cap's pair budget") {
    val spark = TestSpark.spark
    val dir = TestSpark.sf
    val cap = graft.queries.PipelineQueries.personBlockCap
    val q = graft.queries.PipelineQueries.q88PersonDedup(spark, dir)
    val counts = q.groupBy("first_lastname").count()
    assert(counts.count() > 0L)
    // a block of <= cap members can contribute at most C(cap, 2) pairs
    val maxPairs = counts.agg(max("count")).head().getLong(0)
    assert(maxPairs <= cap * (cap - 1) / 2)
  }
}
