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
    // count() is a separate action, so an unpersisted input pipeline
    // would be computed twice (once for n, once for the output).
    val in =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      else df
    val n = in.count()
    val k = math.max(1L, math.ceil(n * topFraction).toLong).toInt
    val ref = in.select(col(scoreCol).as("s"))
      .orderBy(col("s").desc).limit(k)
      .agg(min("s").as("ref_score"))
    in.crossJoin(broadcast(ref))
      .withColumn("norm_score",
        graft.functions.Exact.r6(least(lit(cap), lit(cap) * col(scoreCol) / col("ref_score"))))
      .drop("ref_score")
  }
}
