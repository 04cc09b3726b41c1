package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.queries.MatchingQueries
object Plans {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_CACHE_PART", "true"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    a.foreach { q =>
      println(s"##### $q")
      val df = if (q == "flagship") MatchingQueries.flagship(spark, dir)
               else SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
