package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println("entry rows=" + df.count() + " cols=" + df.columns.mkString(","))
  }
}
