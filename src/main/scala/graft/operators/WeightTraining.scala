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
                    rounds: Int = 4): DataFrame =
    refineWeightsLabeled(spark, joinLabels(pairScores, labels),
      coarseSteps, rounds)

  /** [[refineWeights]] over an already-labelled pair table (doc1, doc2,
    * s1, s2, accepted) — the entry for callers whose labels are an
    * expression over the pair table itself (round 17, guide §2.3): a
    * column projection instead of a per-evaluation join, so every
    * probe batch is exactly scan → broadcast-cross → window →
    * aggregate, with no join or label broadcast in the loop. */
  def refineWeightsLabeled(spark: SparkSession, labeled: DataFrame,
                           coarseSteps: Int = 5,
                           rounds: Int = 4): DataFrame = {
    import spark.implicits._
    val denom = coarseSteps << rounds
    def errOf(nums: Seq[Int]): Seq[(Int, Long)] = {
      val grid = nums.zipWithIndex
        .map { case (n, i) =>
          (i.toLong, n.toDouble / denom, 1.0 - n.toDouble / denom) }
        .toDF("weight_id", "w1", "w2")
      evaluateGridLabeled(labeled, grid)
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

  /** Constrained k-type simplex lattice (J7 generalized to the
    * reference's real arity — `WeightTrainerStage.scala:321-456`
    * walks ~9 active score types the same way): every integer point
    * (n_1..n_k) with n_i ≥ 0 and Σ n_i = steps, built exactly as the
    * reference's `generateWeight` builds it — iterated cross joins of
    * the per-axis range under the running-sum ≤ steps constraint,
    * last axis pinned to the remainder (so Σ = steps holds by
    * construction, no final filter pass) — plus w_i = n_i/steps as a
    * single exact division per axis. C(steps+k−1, k−1) rows:
    * dimension-sized at any corpus scale, broadcast by consumers. */
  def simplexGrid(spark: SparkSession, k: Int, steps: Int): DataFrame = {
    require(k >= 2, s"simplex needs >= 2 score types, got $k")
    var df = spark.range(0, steps + 1L).select(col("id").as("n1"))
    for (i <- 2 until k) {
      val axis = spark.range(0, steps + 1L).select(col("id").as(s"n$i"))
      val sumSoFar = (1 until i).map(j => col(s"n$j")).reduce(_ + _)
      df = df.join(broadcast(axis), sumSoFar + col(s"n$i") <= steps)
    }
    val sumAll = (1 until k).map(j => col(s"n$j")).reduce(_ + _)
    df = df.withColumn(s"n$k", lit(steps.toLong) - sumAll)
    (1 to k).foldLeft(df)((d, i) =>
      d.withColumn(s"w$i", col(s"n$i") / steps.toDouble))
  }

  /** Evaluate every simplex point in ONE distributed pass over the
    * match table (the [[evaluateGrid]] metric generalized to k score
    * columns): `pairScores` (doc1, doc2, s1..sk) × broadcast grid
    * (n1..nk, w1..wk) → per-(point, doc1) rank window → conditional
    * aggregates. The lattice coordinates n1..nk key the output (no
    * minted id — they ARE the deterministic identity of a weight
    * point), and totals are micro-quantized before ranking so the
    * argmin is bit-stable across engines.
    *
    * Memory bound (round 12): a lattice larger than `chunkPoints` is
    * evaluated in fixed-size chunks — per-point aggregates are
    * independent across points, so chunking is EXACT (same rows, same
    * hashes) while the rank-window frame peaks at |pairs|×chunkPoints
    * instead of |pairs|×|grid|. At sf10 the one-pass k=6 frame
    * (|pairs|×126) exceeded the heap at the window sort and spilled
    * (611.7 s); 4 chunked passes of ≤32 points stay in memory at any
    * scale for a bounded number of extra scans of the (cached) pair
    * table. Chunks are cut on the lexicographically-sorted lattice so
    * the decomposition is deterministic. */
  def evaluateSimplex(pairScores: DataFrame, labels: DataFrame,
                      grid: DataFrame, k: Int,
                      chunkPoints: Int = 32): DataFrame =
    evaluateSimplexLabeled(joinLabels(pairScores, labels), grid, k,
      chunkPoints)

  /** [[evaluateSimplex]] over an already-labelled pair table (doc1,
    * doc2, s1..sk, accepted) — for callers whose labels are an
    * expression over the pair table itself (round 17, guide §2.3): a
    * column projection instead of a per-chunk join, so every chunk is
    * exactly scan → broadcast-cross → window → aggregate. */
  def evaluateSimplexLabeled(labeled: DataFrame, grid: DataFrame,
                             k: Int,
                             chunkPoints: Int = 32): DataFrame = {
    val pts = grid.collect() // dimension-sized by contract (≤ C(s+k−1, k−1))
    if (pts.length <= chunkPoints)
      evaluateSimplexPass(labeled, grid, k)
    else {
      val spark = grid.sparkSession
      import scala.math.Ordering.Implicits._
      val nIdx = (1 to k).map(i => grid.schema.fieldIndex(s"n$i"))
      val sorted = pts.sortBy(r => nIdx.map(r.getLong).toList)
      sorted.grouped(chunkPoints).map { chunk =>
        val g = spark.createDataFrame(
          java.util.Arrays.asList(chunk: _*), grid.schema)
        evaluateSimplexPass(labeled, g, k)
      }.reduce(_ unionByName _)
    }
  }

  /** The shared label attach: left join + absent-label ⇒ not accepted. */
  private def joinLabels(pairScores: DataFrame, labels: DataFrame): DataFrame =
    pairScores
      .join(labels, Seq("doc1", "doc2"), "left")
      .na.fill(false, Seq("accepted"))

  private def evaluateSimplexPass(labeled: DataFrame,
                                  grid: DataFrame, k: Int): DataFrame = {
    val nCols = (1 to k).map(i => col(s"n$i"))
    val wCols = (1 to k).map(i => col(s"w$i"))
    val total = (1 to k).map(i => col(s"w$i") * col(s"s$i")).reduce(_ + _)
    val scored = labeled
      .crossJoin(broadcast(grid))
      .withColumn("total_micro", round(total * 1e6).cast("long"))
    val w = Window.partitionBy(nCols :+ col("doc1"): _*)
      .orderBy(col("total_micro").desc, col("doc2"))
    scored
      .withColumn("rnk", row_number().over(w))
      .groupBy(nCols ++ wCols: _*)
      .agg(
        sum(when(col("accepted"), col("rnk") - 1L).otherwise(0L)).as("error"),
        sum(when(col("accepted") && col("rnk") === 1, 1L).otherwise(0L)).as("n_top1"),
        sum(when(col("accepted") && col("rnk") <= 3, 1L).otherwise(0L)).as("n_top3"),
        sum(when(col("accepted"), 1L).otherwise(0L)).as("n_accepted"))
  }

  /** All integer k-tuples with Σ = sum (driver-side; the probe/coarse
    * sets are dimension-sized — tens of points — while every
    * EVALUATION stays one distributed pass). */
  private def lattice(k: Int, sum: Int): Seq[Seq[Int]] =
    if (k == 1) Seq(Seq(sum))
    else (0 to sum).flatMap(n => lattice(k - 1, sum - n).map(n +: _))

  /** Walker refinement on the k-type simplex (the [[refineWeights]]
    * driver loop generalized past k=2; reference Cartographer+Walker
    * `WeightTrainerStage.scala:93-147,321-456`). Weights live on the
    * exact integer lattice n/denom with denom = coarseSteps·2^rounds:
    * the coarse pass evaluates the steps=coarseSteps sub-simplex
    * (multiples of 2^rounds), then each round probes the incumbent's
    * ±step moves along every ORDERED axis pair (n + step·(e_i − e_j),
    * the unit moves that preserve Σ n = denom — k(k−1) probes, each a
    * valid simplex point by construction) and halves the step. Argmin
    * ties break by (error, lexicographic n) so the walk is
    * deterministic and the DuckDB oracle can unroll it from a
    * full-lattice error table. One distributed pass per round; the
    * probe grid is a ≤ k(k−1)+1 row broadcast.
    *
    * Returns one row per round: (round, n1..nk, w1..wk, error) of the
    * incumbent after that round. */
  def refineWeightsSimplex(spark: SparkSession, pairScores: DataFrame,
                           labels: DataFrame, k: Int,
                           coarseSteps: Int = 4, rounds: Int = 3): DataFrame =
    refineWeightsSimplexLabeled(spark, joinLabels(pairScores, labels), k,
      coarseSteps, rounds)

  /** [[refineWeightsSimplex]] over an already-labelled pair table —
    * same rationale as [[refineWeightsLabeled]]: no join or label
    * broadcast inside the walk's probe evaluations (round 17). */
  def refineWeightsSimplexLabeled(spark: SparkSession, labeled: DataFrame,
                                  k: Int, coarseSteps: Int = 4,
                                  rounds: Int = 3): DataFrame = {
    import spark.implicits._
    import scala.math.Ordering.Implicits._
    val denom = coarseSteps << rounds
    def errOf(points: Seq[Seq[Int]]): Seq[(List[Int], Long)] = {
      val grid = points.map(ns => Tuple1(ns.map(_.toLong))).toDF("nums")
        .select((1 to k).map(i => col("nums")(i - 1).as(s"n$i")) ++
          (1 to k).map(i => (col("nums")(i - 1) / denom.toDouble).as(s"w$i")): _*)
      evaluateSimplexLabeled(labeled, grid, k)
        .select((1 to k).map(i => col(s"n$i")) :+ col("error"): _*)
        .collect()
        .map(r => ((0 until k).map(i => r.getLong(i).toInt).toList,
          r.getLong(k))).toSeq
    }
    val f = denom / coarseSteps // = 2^rounds
    val coarse = errOf(lattice(k, coarseSteps).map(_.map(_ * f)))
    var (bestNs, bestErr) = coarse.minBy { case (ns, e) => (e, ns) }
    val history = Seq.newBuilder[(Int, List[Int], Long)]
    history += ((0, bestNs, bestErr))
    var step = f / 2
    for (round <- 1 to rounds) {
      val probes = (for {
        i <- 0 until k; j <- 0 until k if i != j
        cand = bestNs.updated(i, bestNs(i) + step)
          .updated(j, bestNs(j) - step)
        if cand.forall(n => n >= 0 && n <= denom)
      } yield cand).distinct :+ bestNs
      val (ns, e) = errOf(probes).minBy { case (ns, e) => (e, ns) }
      bestNs = ns; bestErr = e
      history += ((round, bestNs, bestErr))
      step /= 2
    }
    history.result()
      .map { case (r, ns, e) => (r, ns.map(_.toLong), e) }
      .toDF("round", "nums", "error")
      .select(col("round") +:
        ((1 to k).map(i => col("nums")(i - 1).as(s"n$i")) ++
          (1 to k).map(i => (col("nums")(i - 1) / denom.toDouble).as(s"w$i"))) :+
        col("error"): _*)
  }

  def evaluateGrid(pairScores: DataFrame, labels: DataFrame,
                   grid: DataFrame): DataFrame =
    evaluateGridLabeled(joinLabels(pairScores, labels), grid)

  /** [[evaluateGrid]] over an already-labelled pair table — same
    * no-join-in-the-loop rationale as [[refineWeightsLabeled]]. */
  def evaluateGridLabeled(labeled: DataFrame,
                          grid: DataFrame): DataFrame = {
    val scored = labeled
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
