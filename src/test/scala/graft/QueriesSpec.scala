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

  test("every declared query runs and (unless allowlisted) returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      if (allowedEmpty(name)) assert(n >= 0, s"$name failed to execute")
      else assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
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
