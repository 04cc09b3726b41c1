package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.VectorQueries

/** The hierarchical (coarse→fine) Lloyd assignment that engages above
  * [[graft.queries.VectorQueries.HierAssignK]] centroids — the one
  * main-code path no oracle scale reaches (every verified scale derives
  * K ≤ 3125). Pins (a) the dispatch boundary itself (K = 4096 exact
  * brute, K = 4097 hierarchical), (b) end-to-end determinism across
  * repartitionings of both the corpus and the centroid table, and
  * (c) the measured brute-vs-hier agreement rate on a deterministic
  * uniform-hash fixture — the scaladoc's "vectors near coarse
  * boundaries may land in a neighbouring cell" with a number attached,
  * plus the one-sided law that makes the approximation safe: the hier
  * choice is never BETTER than the brute argmin (brute is optimal), so
  * any disagreement is a bounded suboptimality, never an inconsistency.
  *
  * The fixture is adversarial for the coarse router (uniform hash
  * vectors have no cluster structure, so coarse cells are geometrically
  * arbitrary); real embedding corpora route better — the drill-scale
  * agreement measured on the 4.5M-vector KMax fixture is recorded in
  * BASELINE.md alongside the crossover table. */
class HierAssignSpec extends AnyFunSuite {
  import TestSpark._

  private val dim = 4
  private def vecs(n: Long): DataFrame =
    spark.range(0, n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "j -> (id * 2654435761 + j * 40503) % 4099)").as("qe"))
  private def cents(k: Long): DataFrame =
    spark.range(0, k).select(col("id").as("cl"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "j -> (id * 1103515245 + j * 12345) % 4099)").as("c"))

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.select("vec_id", "cl").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val q = vecs(2000)
  private lazy val c4097 = cents(4097)
  private lazy val brute = asMap(VectorQueries.lloydAssign(q, c4097))
  private lazy val hier = asMap(VectorQueries.lloydAssignHier(q, c4097, 4097))

  test("dispatch boundary: K = 4096 routes brute, K = 4097 routes hier") {
    val c4096 = c4097.filter(col("cl") < 4096)
    assert(asMap(VectorQueries.assignK(q, c4096, 4096)) ===
      asMap(VectorQueries.lloydAssign(q, c4096)))
    assert(asMap(VectorQueries.assignK(q, c4097, 4097)) === hier)
    // the boundary test is not vacuous: on this fixture the two paths
    // genuinely differ, so equality above identifies WHICH path ran
    assert(brute !== hier)
  }

  test("hier assignment is deterministic across repartitionings") {
    val a = asMap(VectorQueries.lloydAssignHier(
      q.repartition(7), c4097.repartition(5), 4097))
    val b = asMap(VectorQueries.lloydAssignHier(
      q.repartition(13), c4097.repartition(3), 4097))
    assert(a === b)
    assert(a === hier)
  }

  test("measured agreement rate, and hier is never better than brute") {
    assert(brute.keySet === hier.keySet)
    val agree = brute.count { case (v, cl) => hier(v) == cl }
    // measured on this fixture (uniform hash vectors, K=4097, coarse
    // stride 16 → 257 coarse cells): 1928/2000 = 96.4% agreement even
    // with no cluster structure; deterministic, so pinned exactly.
    assert(agree === 1928, s"agreement changed: $agree/2000")
    // one-sided law: brute's distance is the true argmin, so for every
    // vector d(brute) <= d(hier); a violation would mean the hier path
    // is not merely approximate but inconsistent with the metric
    val l2 = graft.functions.VectorExpressions.l2q(col("qe"), col("c"))
    def dists(asg: DataFrame) = asg.join(c4097, Seq("cl"))
      .select(col("vec_id"), l2.as("d"))
    val viol = dists(VectorQueries.lloydAssign(q, c4097))
      .withColumnRenamed("d", "db")
      .join(dists(VectorQueries.lloydAssignHier(q, c4097, 4097))
        .withColumnRenamed("d", "dh"), Seq("vec_id"))
      .filter(col("db") > col("dh")).count()
    assert(viol === 0L)
  }
}
