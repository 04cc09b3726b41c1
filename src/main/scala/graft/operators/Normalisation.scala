package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Percentile score normalisation (reference W1:
  * `matching/stage/NormalisationStage.scala:54-58`): the score at the
  * ceil(topFraction·n)-th rank from the top maps to `cap`; everything
  * above is capped.
  *
  * The reference ranks the whole table with a global
  * `row_number().over(Window.orderBy(desc))` — a single-partition sort
  * that cannot scale. Earlier rounds here used
  * `orderBy(desc).limit(k).agg(min)` (TakeOrdered), which distributes
  * the sort but still ships `numPartitions × k` rows to the driver
  * with k proportional to the table size — a driver OOM at 100×.
  *
  * This version computes the k-th largest score fully distributively:
  * scores are exact integers (the engine micro-quantizes every score
  * column by design), so a histogram over ≤`buckets` value ranges is
  * one map-side-combined hash aggregate whose result (≤4096 longs)
  * always fits on the driver. The bucket containing rank k is then
  * refined recursively; the range shrinks by ~4096× per round, so even
  * a 2^62 value range converges in ≤6 rounds (ranges wider than Long
  * are first halved by an overflow-safe midpoint count). Driver
  * traffic is O(buckets · rounds) — independent of n.
  */
object Normalisation {

  /** True iff hi - lo would overflow Long (only possible when lo < 0
    * and hi > 0, i.e. the range spans more than 2^63 values). */
  private def rangeOverflows(lo: Long, hi: Long): Boolean =
    try { Math.subtractExact(hi, lo); false }
    catch { case _: ArithmeticException => true }

  /** Exact k-th largest value of an integral column, computed with
    * bounded driver traffic. `df` should be persisted by the caller
    * (multiple passes). Returns the value v such that exactly ≥ k rows
    * have value ≥ v and the k-th largest equals v (row_number-over-
    * desc semantics: identical to `orderBy(desc).limit(k).agg(min)`). */
  def kthLargest(df: DataFrame, valueCol: String, k: Long,
                 buckets: Int = 4096): Long = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"kthLargest needs an integral column, got ${df.schema(valueCol)}")
    // widen ints to longs up front: Row.getLong does not unbox Integer
    val v = col(valueCol).cast("long")
    val bounds = df
      .agg(min(v).as("lo"), max(v).as("hi"), count(v).as("n")).head()
    require(!bounds.isNullAt(0), "kthLargest over an empty relation")
    require(k <= bounds.getLong(2),
      s"k=$k exceeds the ${bounds.getLong(2)} non-null rows")
    var lo = bounds.getLong(0)
    var hi = bounds.getLong(1)
    var kk = k
    while (hi > lo && rangeOverflows(lo, hi)) {
      // hi-lo exceeds Long range (lo << 0 <= hi): bisect at an
      // overflow-safe midpoint with a single count pass; one split
      // brings the range under 2^62 and the histogram path takes over
      val mid = (lo >> 1) + (hi >> 1)
      val c = df.filter(v > mid).count()
      if (kk <= c) lo = mid + 1 else { kk -= c; hi = mid }
    }
    while (hi > lo) {
      // ceil so bucket ids stay < buckets even for huge ranges;
      // unsigned-safe because lo <= hi
      val width = math.max(1L, (hi - lo) / buckets + 1)
      // `div`, not `/`: Column./ is double division, which loses
      // exactness beyond 2^53
      val hist = df
        .filter(v.between(lo, hi))
        .select((v - lo).as("__d"))
        .groupBy(expr(s"__d div ${width}L").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(-_._1)
      // walk buckets from the top of the range down to the one
      // containing the kk-th largest
      var i = 0
      var remaining = kk
      while (remaining > hist(i)._2) { remaining -= hist(i)._2; i += 1 }
      val b = hist(i)._1
      kk = remaining
      lo = lo + b * width
      hi = math.min(hi, lo + width - 1)
    }
    lo
  }

  /** Normalise `scoreCol` so the ceil(topFraction·n)-th largest score
    * maps to `cap` (scores above are capped). `scoreCol` must be
    * micro-grid exact: either an integral column or a double of the
    * form m/1e6 with integral m (true of every score this engine
    * emits — Exact.r6 / *_micro columns). */
  def percentileNormalise(df: DataFrame, scoreCol: String,
                          topFraction: Double = 0.01,
                          cap: Double = 100.0): DataFrame = {
    // several actions (count + histogram rounds + the final output),
    // so an unpersisted input pipeline would be recomputed per pass
    val in =
      if (df.storageLevel == StorageLevel.NONE) {
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        graft.queries.Shared.track(p)
        p
      } else df
    val isIntegral = df.schema(scoreCol).dataType match {
      case _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val quant: Column => Column =
      if (isIntegral) identity else c => round(c * 1e6).cast("long")
    val n = in.count()
    val k = math.max(1L, math.ceil(n * topFraction).toLong)
    val kth = kthLargest(
      in.select(quant(col(scoreCol)).as("s")), "s", k)
    // reconstruct the reference score on the original scale; m/1e6 is
    // the exact double division the oracle's min(score) also produced
    val refScore = if (isIntegral) lit(kth) else lit(kth / 1e6)
    in.withColumn("norm_score",
      graft.functions.Exact.r6(least(lit(cap), lit(cap) * col(scoreCol) / refScore)))
  }
}
