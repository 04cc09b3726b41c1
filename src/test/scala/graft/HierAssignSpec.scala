package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.VectorQueries

/** The hierarchical (coarse→fine) Lloyd assignment that engages above
  * [[graft.queries.VectorQueries.HierAssignK]] centroids — the one
  * main-code path no oracle scale reaches (every verified scale derives
  * K ≤ 3125). Pins (a) the dispatch boundary itself (K = 4096 exact
  * brute, K = 4097 hierarchical at the production nprobe), (b)
  * end-to-end determinism across repartitionings of both the corpus
  * and the centroid table, and (c) the measured brute-vs-hier
  * agreement of BOTH probe arms — nprobe = 1 (single coarse cell) and
  * the production nprobe = 2 ([[VectorQueries.HierNProbe]], the
  * round-13 verdict's IVF runner-up probe) — plus the one-sided law
  * that makes the approximation safe: the hier choice is never BETTER
  * than the brute argmin (brute is optimal), so any disagreement is a
  * bounded suboptimality, never an inconsistency.
  *
  * The fixture is adversarial for the coarse router: uniform hash
  * vectors at dim 64 (the engine's embedding width) have no cluster
  * structure, so coarse cells are geometrically arbitrary and
  * boundary mass is maximal. On it the runner-up probe removes 2/3 of
  * the misses (1849 → 1949 of 2000); real embedding corpora route
  * better — the drill-scale numbers on the 4.5M-vector KMax fixture
  * are in BASELINE.md alongside the crossover table. */
class HierAssignSpec extends AnyFunSuite {
  import TestSpark._

  private val dim = 64
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
  private lazy val hier1 =
    asMap(VectorQueries.lloydAssignHier(q, c4097, 4097, nprobe = 1))
  private lazy val hier2 =
    asMap(VectorQueries.lloydAssignHier(q, c4097, 4097, nprobe = 2))

  test("dispatch boundary: K = 4096 routes brute, K = 4097 routes hier") {
    assert(VectorQueries.HierNProbe === 2) // production arm under test
    val c4096 = c4097.filter(col("cl") < 4096)
    assert(asMap(VectorQueries.assignK(q, c4096, 4096)) ===
      asMap(VectorQueries.lloydAssign(q, c4096)))
    assert(asMap(VectorQueries.assignK(q, c4097, 4097)) === hier2)
    // the boundary test is not vacuous: on this fixture every pair of
    // paths genuinely differs, so equality above identifies WHICH path
    // (and which probe arm) ran
    assert(brute !== hier2)
    assert(hier1 !== hier2)
  }

  test("hier assignment is deterministic across repartitionings") {
    val a = asMap(VectorQueries.lloydAssignHier(
      q.repartition(7), c4097.repartition(5), 4097))
    val b = asMap(VectorQueries.lloydAssignHier(
      q.repartition(13), c4097.repartition(3), 4097))
    assert(a === b)
    assert(a === hier2)
  }

  test("measured agreement rates, and hier is never better than brute") {
    assert(brute.keySet === hier1.keySet)
    assert(brute.keySet === hier2.keySet)
    // measured on this fixture (uniform hash vectors, dim 64, K=4097,
    // coarse stride 16 → 257 coarse cells), deterministic so pinned
    // exactly: single-cell probe 1849/2000; the runner-up probe
    // recovers 100 of the 151 misses (the boundary-mass argument —
    // most misses sit between exactly two coarse cells)
    val agree1 = brute.count { case (v, cl) => hier1(v) == cl }
    val agree2 = brute.count { case (v, cl) => hier2(v) == cl }
    assert(agree1 === 1849, s"nprobe=1 agreement changed: $agree1/2000")
    assert(agree2 === 1949, s"nprobe=2 agreement changed: $agree2/2000")
    // one-sided law, BOTH arms: brute's distance is the true argmin,
    // so for every vector d(brute) <= d(hier); a violation would mean
    // the hier path is not merely approximate but inconsistent with
    // the metric
    val l2 = graft.functions.VectorExpressions.l2q(col("qe"), col("c"))
    def dists(asg: DataFrame) = asg.join(c4097, Seq("cl"))
      .select(col("vec_id"), l2.as("d"))
    val db = dists(VectorQueries.lloydAssign(q, c4097))
      .withColumnRenamed("d", "db")
    for (np <- Seq(1, 2)) {
      val viol = db
        .join(dists(VectorQueries.lloydAssignHier(q, c4097, 4097, np))
          .withColumnRenamed("d", "dh"), Seq("vec_id"))
        .filter(col("db") > col("dh")).count()
      assert(viol === 0L, s"one-sided law violated at nprobe=$np")
    }
    // and the arms are ordered: the runner-up probe can only improve
    // the assigned distance (it argmins over a superset of candidates)
    val viol21 = dists(VectorQueries.lloydAssignHier(q, c4097, 4097, 1))
      .withColumnRenamed("d", "d1")
      .join(dists(VectorQueries.lloydAssignHier(q, c4097, 4097, 2))
        .withColumnRenamed("d", "d2"), Seq("vec_id"))
      .filter(col("d2") > col("d1")).count()
    assert(viol21 === 0L, "nprobe=2 must never be worse than nprobe=1")
  }
}
