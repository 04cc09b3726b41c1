package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percentile score normalisation (reference W1:
  * `matching/stage/NormalisationStage.scala:54-58`): the score at the
  * ceil(topFraction·n)-th rank from the top maps to `cap`; everything
  * above is capped.
  *
  * The reference ranks the whole table with a global
  * `row_number().over(Window.orderBy(desc))` — a single-partition sort
  * that cannot scale. The reference value is instead obtained with
  * `orderBy(desc).limit(k).agg(min)`, which Spark plans as a
  * distributed TakeOrdered (per-partition top-k + driver merge of k
  * rows), then broadcast back as a 1-row frame.
  */
object Normalisation {

  def percentileNormalise(df: DataFrame, scoreCol: String,
                          topFraction: Double = 0.01,
                          cap: Double = 100.0): DataFrame = {
    val n = df.count()
    val k = math.max(1L, math.ceil(n * topFraction).toLong).toInt
    val ref = df.select(col(scoreCol).as("s"))
      .orderBy(col("s").desc).limit(k)
      .agg(min("s").as("ref_score"))
    df.crossJoin(broadcast(ref))
      .withColumn("norm_score",
        graft.functions.Exact.r6(least(lit(cap), lit(cap) * col(scoreCol) / col("ref_score"))))
      .drop("ref_score")
  }
}
