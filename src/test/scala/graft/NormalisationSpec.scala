package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Normalisation

/** The percentile-normalisation threshold must be computed without any
  * driver-side structure whose size grows with the table: no global
  * sort, no TakeOrdered with k proportional to n (the round-3 weak
  * spot — at 100× scale `limit(ceil(0.01·n))` merges ~900k rows ×
  * partitions on the driver). */
class NormalisationSpec extends AnyFunSuite {
  import TestSpark._

  test("kthLargest equals the sort-based answer across k") {
    val df = Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100).cast("long").as("s"))
      .persist()
    val n = df.count()
    val sorted = df.orderBy(col("s").desc).collect().map(_.getLong(0))
    for (k <- Seq(1L, 2L, 7L, n / 2, n - 1, n)) {
      assert(Normalisation.kthLargest(df, "s", k) === sorted((k - 1).toInt),
        s"k=$k")
    }
    // tiny bucket count forces multiple refinement rounds over the
    // same data — exercises the recursion, not just one histogram
    assert(Normalisation.kthLargest(df, "s", 7L, buckets = 2) === sorted(6))
    df.unpersist()
  }

  test("kthLargest survives a range wider than Long (overflow bisect)") {
    // Long.MinValue..Long.MaxValue makes hi-lo overflow, driving the
    // rangeOverflows bisect loop before the histogram path takes over
    import spark.implicits._
    val vals = Seq(Long.MinValue, Long.MinValue + 1, -7L, 0L, 3L,
      Long.MaxValue - 1, Long.MaxValue)
    val df = vals.toDF("s").persist()
    val sorted = vals.sorted.reverse
    for (k <- 1 to vals.size) {
      assert(Normalisation.kthLargest(df, "s", k.toLong) === sorted(k - 1),
        s"k=$k")
    }
    // tiny buckets force repeated refinement after the bisect as well
    assert(Normalisation.kthLargest(df, "s", 2L, buckets = 2) === sorted(1))
    df.unpersist()
  }

  test("normalised plan contains no n-proportional limit and no global sort") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("s"))
    val out = Normalisation.percentileNormalise(o, "s")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrdered"), s"TakeOrdered in plan:\n$plan")
    assert(!plan.contains("GlobalLimit"), s"GlobalLimit in plan:\n$plan")
    assert(!plan.contains("Sort [s"), s"global sort in plan:\n$plan")
    // and the threshold itself is right: ceil(1%·n)-th largest → 100.0
    val n = o.count()
    val k = math.max(1L, math.ceil(n * 0.01).toLong)
    val kth = o.orderBy(col("s").desc).limit(k.toInt)
      .agg(min("s")).head().getLong(0)
    val atRef = out.filter(col("s") === kth).select("norm_score").head().getDouble(0)
    assert(atRef === 100.0)
    graft.queries.Shared.clear()
  }
}
