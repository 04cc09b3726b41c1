package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Score-type weight grid evaluation (reference A9/W3/J7:
  * `matching/stage/WeightTrainerStage.scala:218-256,321-408`).
  *
  * The reference generates the weight simplex through iterated
  * constrained cross joins and walks it with driver threads; the grid
  * itself is tiny (hundreds of rows), so we generate it declaratively
  * with `spark.range` and evaluate all weight points in ONE pass:
  * broadcast(grid) × matches → per-(weight, proposal) rank window →
  * conditional-aggregate error. That is a single shuffle of the match
  * table regardless of grid size — the shape that survives 100 TB.
  *
  * Totals are micro-quantized before ranking so that rank order (and
  * therefore the error metric) is bit-stable across engines.
  */
object WeightTraining {

  /** 1-D simplex grid over two score types: weight_id i in [0, steps],
    * w1 = i/steps, w2 = 1 - i/steps. */
  def twoTypeGrid(spark: SparkSession, steps: Int): DataFrame =
    spark.range(0, steps + 1L)
      .select(
        col("id").as("weight_id"),
        (col("id") / steps.toDouble).as("w1"),
        (lit(1.0) - col("id") / steps.toDouble).as("w2"))

  /** Evaluate every weight point.
    *
    * `pairScores`: (doc1, doc2, s1, s2) — one row per pair with the
    * per-type scores (0 when the type didn't match).
    * `labels`: (doc1, doc2, accepted: boolean).
    *
    * Output per weight_id: error = sum(rank-1 over accepted pairs),
    * n_top1/n_top3 = accepted pairs ranked first / in top 3 of their
    * doc1, n_accepted.
    */
  def evaluateGrid(pairScores: DataFrame, labels: DataFrame,
                   grid: DataFrame): DataFrame = {
    val scored = pairScores
      .join(labels, Seq("doc1", "doc2"), "left")
      .na.fill(false, Seq("accepted"))
      .crossJoin(broadcast(grid))
      .withColumn("total_micro",
        round((col("w1") * col("s1") + col("w2") * col("s2")) * 1e6).cast("long"))
    val w = Window.partitionBy("weight_id", "doc1")
      .orderBy(col("total_micro").desc, col("doc2"))
    scored
      .withColumn("rnk", row_number().over(w))
      .groupBy("weight_id")
      .agg(
        sum(when(col("accepted"), col("rnk") - 1L).otherwise(0L)).as("error"),
        sum(when(col("accepted") && col("rnk") === 1, 1L).otherwise(0L)).as("n_top1"),
        sum(when(col("accepted") && col("rnk") <= 3, 1L).otherwise(0L)).as("n_top3"),
        sum(when(col("accepted"), 1L).otherwise(0L)).as("n_accepted"))
  }
}
