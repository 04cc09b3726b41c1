package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: stream-stream join cost vs state partition
  * count (temporary; see BASELINE.md q77 notes). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (p <- Seq("32", "32", "8", "4")) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val t0 = System.nanoTime()
      val n = graft.streaming.EventStream.streamStreamJoinOnce(spark, dir).count()
      println(f"partitions=$p rows=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
