package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsofJoin, Sampling}

/** Edge semantics of the as-of join (strictly-prior, per-key, null on
  * no-match) on a hand-built fixture, and the determinism / subset /
  * stratification properties of hash-bucket sampling. The qNN oracle
  * checks cover the bulk semantics; these pin the corner cases a bulk
  * diff can miss (equal-timestamp exclusion, key isolation).
  */
class AsofSamplingSpec extends AnyFunSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofPrior picks the latest strictly-prior right row per key") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // views at 9:00, 9:30 → 9:30
      (1L, ts("2024-01-01 09:30:00"), 101L), // view AT 9:30 → strict → 9:00
      (2L, ts("2024-01-01 08:00:00"), 102L), // no prior view → null
      (3L, ts("2024-01-01 12:00:00"), 103L)  // other key's views invisible
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 900L),
      (1L, ts("2024-01-01 09:30:00"), 930L),
      (1L, ts("2024-01-01 11:00:00"), 1100L), // after every left row
      (2L, ts("2024-01-01 08:30:00"), 830L)
    ).toDF("k", "t", "rid")
    val got = AsofJoin.asofPrior(left, right, "k", "t", Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      100L -> Some(930L), 101L -> Some(900L), 102L -> None, 103L -> None))
  }

  test("asofPrior keeps null payload fields from the matched row intact") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    // latest prior right row has a legitimately-null `a`; per-column
    // filling would stitch a=5 from the older row onto b=7
    val right = Seq((1L, 1L, Some(5L), 9L), (1L, 2L, None, 7L))
      .toDF("k", "t", "a", "b")
    val got = AsofJoin.asofPrior(left, right, "k", "t", Seq("a", "b"))
      .select("a", "b").as[(Option[Long], Option[Long])].collect().head
    assert(got === (None, Some(7L)),
      "payload must come from ONE right row, not be stitched per-column")
  }

  test("asofPrior plans a single shuffle + window (no pair blow-up)") {
    val spark = TestSpark.spark
    val left = spark.range(100).select(col("id").as("k"),
      (col("id") * 10).as("t"), col("id").as("lid"))
    val right = spark.range(100).select(col("id").as("k"),
      (col("id") * 7).as("t"), col("id").as("rid"))
    val plan = AsofJoin.asofPrior(left, right, "k", "t", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan a join")
    assert(plan.split("Window").length == 2, "exactly one Window exec")
  }

  test("asofPrior matches a brute-force reference on random data") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val left = Seq.tabulate(200)(i =>
        (rnd.nextInt(10).toLong, rnd.nextInt(50).toLong, i.toLong))
      // right unique per (k, ts) — the operator's documented contract
      val right = Seq.fill(300)(
        (rnd.nextInt(10).toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
        .groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
      val expected = left.map { case (k, t, lid) =>
        val prior = right.filter(r => r._1 == k && r._2 < t)
        lid -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2)._3))
      }.toMap
      val got = AsofJoin.asofPrior(
          left.toDF("k", "t", "lid"), right.toDF("k", "t", "rid"),
          "k", "t", Seq("rid"))
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      assert(got === expected)
    }
  }

  test("hash sampling is deterministic, monotone, and stratified") {
    val spark = TestSpark.spark
    val df = spark.range(0, 10000).select(col("id"),
      when(col("id") % 3 === 0, "en").otherwise("fr").as("lang"))
    val s25 = Sampling.deterministicSample(df, col("id"), "40", "t:")
    val s50 = Sampling.deterministicSample(df, col("id"), "80", "t:")
    val a = s25.select("id").as[Long](spark.implicits.newLongEncoder).collect().toSet
    val b = s50.select("id").as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(a == Sampling.deterministicSample(df, col("id"), "40", "t:")
      .select("id").as[Long](spark.implicits.newLongEncoder).collect().toSet,
      "re-run must select identical rows")
    assert(a.subsetOf(b), "25% sample must be a subset of the 50% sample")
    assert(math.abs(a.size / 10000.0 - 0.25) < 0.03 &&
      math.abs(b.size / 10000.0 - 0.50) < 0.03, "fractions near nominal")
    // stratified: per-stratum thresholds hold per-stratum fractions
    val strat = Sampling.stratifiedSample(df, col("id"),
      when(col("lang") === "en", "80").otherwise("20"), "t:")
    val en = strat.filter(col("lang") === "en").count() /
      df.filter(col("lang") === "en").count().toDouble
    val fr = strat.filter(col("lang") === "fr").count() /
      df.filter(col("lang") === "fr").count().toDouble
    assert(math.abs(en - 0.5) < 0.04 && math.abs(fr - 0.125) < 0.04)
  }
}
