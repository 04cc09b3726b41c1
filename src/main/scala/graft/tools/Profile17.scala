package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.EntityMatching
object Profile17 {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"$name rows=$n time=${(System.nanoTime()-t0)/1e9}%.1f s")
  }
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("AQE_CACHE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def partEnts = Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("doc_id"), col("l_partkey").as("entity_id"))
    val scores = EntityMatching.scorePairs(
      EntityMatching.candidatePairs(partEnts), "part_overlap").persist()
    t("partScores_build")(scores.count())
    println(scores.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
