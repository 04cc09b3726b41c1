package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S1/S2/S7-jdbc (the reference's primary source:
  * `matching/datasource/SqlDataSource.scala:34-58`): JDBC write, plain
  * read, and the partitioned read with driver-side bounds — exercised
  * against the embedded Derby that ships with Spark, so the real JDBC
  * code path runs without an external database. */
class JdbcSpec extends AnyFunSuite {
  import TestSpark._

  private val url = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-derby").resolve("db")
    s"jdbc:derby:$dir;create=true"
  }
  private val props = new java.util.Properties()
  props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  test("jdbc sink + partitioned scan round-trips the orders table") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
    // Derby maps StringType to CLOB by default, which is not comparable
    // (no filter pushdown); declare VARCHAR explicitly
    orders.write.mode("overwrite")
      .option("createTableColumnTypes", "o_orderstatus VARCHAR(4)")
      .jdbc(url, "orders_rt", props)

    // S2: plain read
    val plain = spark.read.jdbc(url, "orders_rt", props)
    assert(plain.count() == orders.count())

    // S1: partitioned read — bounds from a driver-side scalar query,
    // exactly the reference's max()-then-partition pattern
    val maxKey = plain.agg(max("o_orderkey")).collect()(0).getLong(0)
    val part = spark.read
      .option("partitionColumn", "o_orderkey")
      .option("lowerBound", "1")
      .option("upperBound", maxKey.toString)
      .option("numPartitions", "4")
      .jdbc(url, "orders_rt", props)
    assert(part.rdd.getNumPartitions == 4,
      "partitioned JDBC read must produce one partition per stride")

    // same relation through both paths, and predicate pushdown applies
    val a = plain.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("cents"))
      .collect().map(_.toString).sorted.toSeq
    val b = part.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("cents"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)

    val pushed = part.filter(col("o_orderstatus") === "O")
    val scanLine = pushed.queryExecution.executedPlan.toString
    assert(scanLine.contains("PushedFilters") &&
      scanLine.contains("o_orderstatus"),
      s"filter must push to the JDBC source:\n$scanLine")
    assert(pushed.count() ==
      orders.filter(col("o_orderstatus") === "O").count())
  }

  test("q100 bench-scale JDBC path pushes its predicate to the database") {
    val df = queries.SourceQueries.q100JdbcSource(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderstatus"),
      s"status predicate must reach the JDBC scan:\n$plan")
    assert(df.count() > 0)
  }
}
