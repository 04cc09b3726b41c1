package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located join: pre-shuffling both sides into the
  * same bucket layout at write time means every later equi-join on the
  * bucket key plans WITHOUT a shuffle — the amortize-one-shuffle-
  * across-many-joins shape that matters most at 100 TB, where the
  * repeated exchange IS the bottleneck. */
class BucketSpec extends AnyFunSuite {
  import TestSpark._

  test("join of two tables bucketed on the key plans without exchanges") {
    // isolated session: broadcast disabled, else the sf0.001 dim is
    // broadcast and the plan demonstrates nothing about bucketing
    val spark = TestSpark.spark.newSession()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    Seq("orders_bkt", "lineitem_bkt").foreach { t =>
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.orders(spark, sf)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bkt")
    Tables.lineitem(spark, sf)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_bkt")

    val joined = spark.table("orders_bkt")
      .join(spark.table("lineitem_bkt"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"), sum(round(col("l_extendedprice") * 100)
        .cast("long")).as("cents"))

    val expected = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"), sum(round(col("l_extendedprice") * 100)
        .cast("long")).as("cents"))
    assert(joined.exceptAll(expected).isEmpty &&
      expected.exceptAll(joined).isEmpty)

    // neither the join nor the aggregation on the bucket key shuffles
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join/agg must not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join operator reading bucketed data:\n$plan")
  }
}
