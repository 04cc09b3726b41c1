package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A14: the reference counts cleaned rows with LongAccumulators
  * (`deduplication/PersonCleanerStage.scala:31-33`); the idiomatic
  * Spark 3+/4 replacement is `df.observe` — metrics ride the action
  * instead of a side-channel accumulator, and they are exact (no
  * task-retry double counting). */
class ObserveSpec extends AnyFunSuite {
  import TestSpark._

  test("observe metrics count cleaned rows exactly (accumulator shape)") {
    val obs = Observation("clean_metrics")
    val docs = Tables.documents(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        max(length(col("text"))).as("max_len"))
    val total = docs.count()
    val m = obs.get
    assert(m("n_rows") == total)
    val nEn = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(m("n_en") == nEn)
    assert(m("max_len").asInstanceOf[Int] > 0 ||
      m("max_len").asInstanceOf[Number].longValue() > 0)
  }
}
