package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
object Profile17 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val qs = if (a.isEmpty) Seq("q21_token_stats", "q49_rare_words",
      "q50_sentence_runs", "q17_multitype_filter") else a.toSeq
    qs.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"$q rows=$n time=${(System.nanoTime()-t0)/1e9}%.1f s")
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"$q warm time=${(System.nanoTime()-t1)/1e9}%.1f s")
    }
    spark.stop()
  }
}
