package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-shape contracts for the round-4/5 pipeline composites —
  * the scaladoc'd 100 TB claims of PipelineQueries, asserted against
  * the actual plans so a regression (a broadcast flipping to a
  * shuffle join, a window sliding onto the whole corpus) fails a test
  * instead of an at-scale run. */
class CompositePlanSpec extends AnyFunSuite {
  import TestSpark._

  test("q91: the benchmark shingle set joins as a BROADCAST semi join") {
    val df = queries.PipelineQueries.q91Decontamination(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftsemi"),
      s"benchmark side must broadcast into a semi join:\n$plan")
  }

  test("q92: the only global sort runs over bucket rows, not the corpus") {
    val df = queries.PipelineQueries.q92TokenShards(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the bucket-offset window is the one single-partition window; the
    // per-document window must stay partitioned by bucket (and the
    // bucket offsets must come back via broadcast, not shuffle)
    val globalWindows = plan.linesIterator
      .filter(_.contains("Window"))
      .count(l => !l.contains("bucket#") && l.contains("windowspecdefinition"))
    assert(globalWindows <= 1,
      s"more than one non-bucket-partitioned window (global sort leak):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast back, not shuffle:\n$plan")
  }

  test("q102/q103: the scrub and repetition scans stay map-side") {
    // both are per-document operators: the only exchange allowed in
    // either plan is the output sort's range partitioning — any
    // hash-partition exchange means per-token state leaked off the map
    // side (the exact shuffle graft_rep_stats exists to avoid)
    Seq(
      "q102" -> queries.PipelineQueries.q102PiiRedaction(spark, sf),
      "q103" -> queries.PipelineQueries.q103Repetition(spark, sf)
    ).foreach { case (name, df) =>
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val hashExchanges = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning"))
      assert(hashExchanges == 0,
        s"$name must not shuffle (map-side scan + sort only):\n$plan")
    }
  }

  test("q93: the composite reuses the shared frames (cached, not recomputed)") {
    // dupPairs is the memoized LSH frame every consumer shares; after
    // q93 runs, its plan must contain cache hits (InMemoryTableScan)
    // rather than a re-derivation of the shingle pipeline per stage
    queries.Shared.clear()
    val df = queries.PipelineQueries.q93CurationPipeline(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"q93 must consume the memoized frames via the cache:\n$plan")
  }
}
