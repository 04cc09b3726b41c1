package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.MatchingQueries

/** Semantic assertions for the Walker-style weight refinement (q72 is
  * rows-only: the data-dependent driver loop has no SQL spelling). */
class WeightSpec extends AnyFunSuite {
  import TestSpark._

  test("q72 refinement error is non-increasing and deterministic") {
    val a = MatchingQueries.q72WeightRefine(spark, sf).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Double]("w1"),
        r.getAs[Long]("error"))).toSeq.sortBy(_._1)
    assert(a.nonEmpty)
    // round 0 is the coarse-grid incumbent; each halving round may only
    // keep or improve the error
    a.sliding(2).foreach { case Seq((_, _, e0), (_, _, e1)) =>
      assert(e1 <= e0, s"error must not increase: $a")
    case _ => ()
    }
    a.foreach { case (_, w1, _) => assert(w1 >= 0.0 && w1 <= 1.0) }
    val b = MatchingQueries.q72WeightRefine(spark, sf).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Double]("w1"),
        r.getAs[Long]("error"))).toSeq.sortBy(_._1)
    assert(a == b, "refinement must be deterministic")
  }
}
