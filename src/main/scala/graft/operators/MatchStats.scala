package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-document match statistics (reference A7:
  * `matching/stage/StatisticStage.scala:67-176`).
  *
  * The reference collected every match of a document into a driver-side
  * array and ran commons-math `DescriptiveStatistics` in a row lambda —
  * a single hot document blows the row buffer, and nothing is
  * codegen'd. Here the same statistics are pure hash aggregates +
  * one analytic window:
  *  - moments from exact integer sums (milli-quantized scores), so the
  *    output is partitioning-independent and oracle-comparable;
  *  - median via exact `percentile` (interpolated, exact on ints);
  *  - "band" counts (matches within 80% of the doc's best score)
  *    via an integer-exact predicate `5*score >= 4*max`.
  *
  * Input: matches (doc1, doc2, score); both orientations are unioned so
  * every document sees all its matches, as in the reference's two-sided
  * union (`StatisticStage.scala:75`).
  */
object MatchStats {

  def perDocumentStats(matches: DataFrame): DataFrame = {
    val milli = round(col("score") * 1000).cast("long")
    val oneSide = matches.select(col("doc1").as("doc_id"), milli.as("score_milli"))
    val otherSide = matches.select(col("doc2").as("doc_id"), milli.as("score_milli"))
    val sides = oneSide.unionByName(otherSide)

    // ONE shuffle + ONE sort: ranking each match within its document by
    // score yields, from the same sorted pass, the per-doc count and max
    // (band predicate) and the two middle ranks (interpolated median) —
    // so the final aggregation is a plain codegen HashAggregate. The
    // naive alternative (window max + `percentile` agg) pays a second
    // full sort: `percentile` is a TypedImperativeAggregate that falls
    // back to sort-based aggregation over nearly-unique groups.
    val wSorted = Window.partitionBy("doc_id").orderBy("score_milli")
    val wAll = Window.partitionBy("doc_id")
    // Column `/` is double division — floor() for the integer ranks
    val isMid = col("rn") === floor((col("n") + 1L) / 2L) ||
      col("rn") === floor(col("n") / 2L) + 1L
    sides
      .withColumn("rn", row_number().over(wSorted))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("max_milli", max(col("score_milli")).over(wAll))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_matches"),
        min("score_milli").as("min_milli"),
        max("score_milli").as("max_milli2"),
        sum("score_milli").as("sum_milli"),
        sum(col("score_milli") * col("score_milli")).as("sxx"),
        sum(when(isMid, col("score_milli"))).as("mid_sum"),
        sum(when(isMid, 1L).otherwise(0L)).as("mid_cnt"),
        sum(when(col("score_milli") * 5 >= col("max_milli") * 4, 1L).otherwise(0L))
          .as("n_band_top"))
      // same interpolation as `percentile(score, 0.5)`: mean of the two
      // middle values (they coincide for odd n)
      .withColumn("median_milli", col("mid_sum") / col("mid_cnt"))
      .withColumn("mean_score",
        graft.functions.Exact.r6((col("sum_milli") / 1000.0) / col("n_matches")))
      .withColumn("median_score", graft.functions.Exact.r6(col("median_milli") / 1000.0))
      .withColumn("std_score",
        when(col("n_matches") > 1,
          graft.functions.Exact.r6(
            sqrt((col("n_matches") * col("sxx") - col("sum_milli") * col("sum_milli"))
              / (col("n_matches") * (col("n_matches") - lit(1.0)))) / 1000.0))
          .otherwise(lit(0.0)))
      .select(
        col("doc_id"), col("n_matches"), col("min_milli"),
        col("max_milli2").as("max_milli"), col("sum_milli"),
        col("mean_score"), col("median_score"), col("std_score"),
        col("n_band_top"))
  }
}
