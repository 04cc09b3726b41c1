package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-shape contracts for the round-7 queries — the scaladoc'd
  * 100 TB claims asserted against the actual plans, in the
  * CompositePlanSpec tradition: a broadcast flipping to a shuffle or
  * an accidental cartesian fails here instead of at scale.
  */
class NewQueryPlanSpec extends AnyFunSuite {
  import TestSpark._

  test("q106: centroid table broadcasts; no unbounded cartesian") {
    val df = queries.VectorQueries.q106SemDedup(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the K-row centroid table may cross-join via broadcast NLJ; a
    // non-broadcast cartesian of corpus-sized sides must never appear
    assert(!plan.contains("CartesianProduct"),
      s"q106 must not plan a non-broadcast cartesian:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"q106's centroid assignment must broadcast:\n$plan")
  }

  test("q107: query terms and df broadcast; postings stay partitioned") {
    val df = queries.TextQueries.q107Bm25(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"q107 must not plan a non-broadcast cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"q107's query-term and df sides must broadcast:\n$plan")
    // the corpus-side postings aggregation must keep partial (map-side)
    // aggregation — two HashAggregates around its exchange
    assert(plan.contains("HashAggregate"),
      s"q107's tf/df must be hash aggregates:\n$plan")
  }

  test("q110: cross-side bucket join is an equi join, verify side keyed") {
    val df = queries.DedupQueries.q110IncrementalDedup(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q110's bucket join must be an equi join on (band, key):\n$plan")
  }

  test("q108: the streaming verdict plan has no shuffle at all") {
    // batch-side check of the same verdict expression tree the stream
    // runs: stateless map-side columns only — any exchange before the
    // output sort means the stream would need state
    val df = graft.streaming.CurationStream
      .verdict(Tables.documents(spark, sf).select("doc_id", "text"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"q108's verdict must be exchange-free (stateless stream):\n$plan")
  }
}
