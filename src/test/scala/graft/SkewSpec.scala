package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Hot-key handling: salted-join correctness, and evidence that AQE's
  * skew-join optimization fires on a skewed sort-merge join (the
  * mechanism the engine relies on at the 100 TB scale where one key
  * can hold a disproportionate share of a shuffle partition). */
class SkewSpec extends AnyFunSuite {

  test("saltedJoin equals the plain join on skewed data") {
    val spark = TestSpark.spark
    // one hot key (0) carrying 90% of the rows
    val big = spark.range(0, 10000)
      .select(when(col("id") % 10 =!= 0, col("id") % 97).otherwise(0L).as("k"),
        col("id").as("v"))
    val small = spark.range(0, 97).select(col("id").as("k"),
      (col("id") * 2).as("w"))
    val plain = big.join(small, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), sum("w").as("sw"))
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), sum("w").as("sw"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    // isolated SESSION on the shared context (stopping a private
    // SparkSession would stop the JVM-wide SparkContext under every
    // other suite); thresholds tuned down so a local-scale skew is
    // visible to AQE (defaults only trigger at 256 MB partitions)
    val spark = TestSpark.spark.newSession()
    Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB"
    ).foreach { case (k, v) => spark.conf.set(k, v) }

    // key 0 is hot on the left; right is uniform
    val left = spark.range(0, 200000)
      .select(when(col("id") % 4 =!= 0, col("id") % 1000).otherwise(0L).as("k"),
        col("id").as("v"))
    val right = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") + 1).as("w"))
    val joined = left.join(right, Seq("k"))
    // collect() runs THIS dataframe's own QueryExecution (count()
    // and write() plan separate queries), finalizing the AQE plan
    assert(joined.collect().length == 200000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected AQE skew-join marker in the final plan:\n$finalPlan")
  }
}
