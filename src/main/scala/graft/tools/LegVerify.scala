package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.GraftExtensions
import graft.queries.VectorQueries

/** Per-leg scale verification of q172's unified retrieval-metrics
  * artifact (round 12, verdict item 4). The full q172 DuckDB replay
  * materializes all ten index chains at once and exceeds this box's
  * temp disk at sf3; this tool dumps the SAME Spark result split per
  * method (`q172_leg_<m>` parquet each) plus a per-leg oracle_sql.json
  * where each leg's SQL carries only the truth chain + that one index
  * chain — so the standard check_oracle.py compare hash-verifies the
  * one unified artifact leg by leg at scales the monolithic replay
  * cannot reach.
  *
  * Usage: tools/run.sh graft.tools.LegVerify <sfDir> <outDir> [method...]
  */
object LegVerify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val methods = VectorQueries.q172Methods
      .filter(m => only.isEmpty || only(m))
    // ONE evaluation of the unified artifact; legs split from it so
    // the verified rows are exactly the rows q172 itself returns
    val full = VectorQueries.q172RetrievalMetrics(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    methods.foreach { m =>
      full.filter(col("method") === m)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/q172_leg_$m")
      System.err.println(s"[legverify] wrote q172_leg_$m")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = methods
      .map(m => s"${q(s"q172_leg_$m")}: ${q(VectorQueries.q172LegOracle(m))}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
