package graft

import org.scalatest.funsuite.AnyFunSuite

/** The family-clustered sweep order + scheduler-informed release plan
  * (round 15): the round-14 sf10 run priced what happens without them
  * — 101 evictions, 2.54× like-for-like — because the alphabetical
  * order scattered each memo family's consumers and the byte budget
  * had no knowledge of which families were already dead. */
class SweepOrderSpec extends AnyFunSuite {

  test("match-family consumers are contiguous in the clustered order") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val ordered = SweepOrder.sort(names.map(_ -> ())).map(_._1)
    val matchQs = SweepOrder.memoConsumers("partScores") ++
      SweepOrder.memoConsumers("pivotedScores") ++
      SweepOrder.memoConsumers("pairScores2") ++
      SweepOrder.memoConsumers("pairScores3") ++
      SweepOrder.memoConsumers("pairScores6") ++
      SweepOrder.memoConsumers("k6walk") ++
      SweepOrder.memoConsumers("partCands")
    val idxs = ordered.zipWithIndex.collect {
      case (n, i) if matchQs(n) => i
    }
    assert(idxs.nonEmpty)
    assert(idxs.max - idxs.min === idxs.size - 1,
      s"match-family consumers not contiguous: $idxs")
  }

  test("every declared memo consumer is a real query name") {
    val known = SparkEntry.queries.keySet
    val ghosts = SweepOrder.memoConsumers.values.flatten.toSet -- known
    assert(ghosts.isEmpty, s"consumer map names unknown queries: $ghosts")
  }

  test("releaseSchedule puts each family at its LAST consumer's index") {
    val order = Seq("q13_entity_candidates", "q14_entity_scores",
      "q94_matcher_pipeline", "q29_cosine_shingles")
    val sched = SweepOrder.releaseSchedule(order)
    assert(sched(0).contains("partCands"))       // only consumer: q13
    assert(sched(2).contains("partScores"))      // last of q14/q94
    assert(sched(2).contains("partSuppScores"))  // last: q94
    assert(sched(3) === Seq("cosineWeights"))
    // families with no consumer in the order are never scheduled
    assert(!sched.values.flatten.toSeq.contains("dupPairs"))
  }

  test("key is total: names not shaped q<digits> sort into the tail group") {
    // a harness sorting a mixed name list (e.g. cache_build alongside
    // queries) must not crash on "".toInt (ADVICE r15)
    assert(SweepOrder.key("cache_build") === ((4, 1, Int.MaxValue)))
    assert(SweepOrder.key("") === ((4, 1, Int.MaxValue)))
    assert(SweepOrder.key("q") === ((4, 1, Int.MaxValue)))
    assert(SweepOrder.key("q13_entity_candidates") === ((0, 1, 13)))
  }

  test("q19 opens the match cluster so the pivot frame releases first") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val ordered = SweepOrder.sort(names.map(_ -> ())).map(_._1)
    assert(ordered.head === "q19_score_pivot")
    // and the release schedule drops pivotedScores right there
    val sched = SweepOrder.releaseSchedule(ordered)
    assert(sched(0) === Seq("pivotedScores"))
  }

  test("clustered order covers exactly the input and reverse respects it") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val ordered = SweepOrder.sort(names.map(_ -> ())).map(_._1)
    assert(ordered.sorted === names)
  }
}
