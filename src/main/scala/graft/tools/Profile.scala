// Scratch profiler — run with: tools/run.sh graft.tools.Profile <sfDir> <query>
package graft.tools

import org.apache.spark.sql.SparkSession

object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(args(1))
    val df = fn(spark, dir)
    df.explain("formatted")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"run $i: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    }
    spark.stop()
  }
}
