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
  /** Walker-style iterative refinement (reference
    * `WeightTrainerStage.scala:93-147`: coarse Cartographer grid →
    * per-area Walker halving the step until the error stops
    * improving). The 2-type simplex is 1-D, so the walk probes
    * `w1 ± step` around the incumbent, halving `step` each round.
    * The loop is driver-side (data-dependent control flow, SURVEY
    * §7.4-6) but each evaluation is ONE distributed pass over the
    * cached match table via [[evaluateGrid]]; the probed weight set
    * per round is a 3-row broadcast frame.
    *
    * Weights live on the exact integer lattice num/denom with
    * denom = coarseSteps·2^rounds, so every probed weight is a single
    * double division — the same value any other engine computes —
    * instead of an accumulated FP sum (0.2 + 0.1 ≠ 0.3 in doubles).
    * That makes the whole walk unrollable in the DuckDB oracle: the
    * reachable set is the 81-point lattice, and the argmin chain is
    * plain SQL (q72's oracle evaluates all lattice points, then walks).
    *
    * Returns one row per evaluation round: (round, w1, error) of the
    * incumbent after that round — deterministic given deterministic
    * inputs. */
  def refineWeights(spark: SparkSession, pairScores: DataFrame,
                    labels: DataFrame, coarseSteps: Int = 5,
                    rounds: Int = 4): DataFrame = {
    import spark.implicits._
    val denom = coarseSteps << rounds
    def errOf(nums: Seq[Int]): Seq[(Int, Long)] = {
      val grid = nums.zipWithIndex
        .map { case (n, i) =>
          (i.toLong, n.toDouble / denom, 1.0 - n.toDouble / denom) }
        .toDF("weight_id", "w1", "w2")
      evaluateGrid(pairScores, labels, grid)
        .select("weight_id", "error").collect()
        .map(r => (nums(r.getLong(0).toInt), r.getLong(1))).toSeq
    }
    val coarse = errOf((0 to coarseSteps).map(_ * (denom / coarseSteps)))
    var (bestN, bestErr) = coarse.minBy { case (n, e) => (e, n) }
    val history = Seq.newBuilder[(Int, Double, Long)]
    history += ((0, bestN.toDouble / denom, bestErr))
    var step = denom / coarseSteps / 2
    var round = 1
    while (round <= rounds) {
      val probes = Seq(bestN - step, bestN, bestN + step)
        .filter(n => n >= 0 && n <= denom).distinct
      val (n, e) = errOf(probes).minBy { case (n, e) => (e, n) }
      bestN = n; bestErr = e
      history += ((round, bestN.toDouble / denom, bestErr))
      step /= 2
      round += 1
    }
    history.result().toDF("round", "w1", "error")
  }

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
