package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given scale
  * factor and prints ONE JSON line. Shuffle hygiene matters more than
  * raw speed for a long multi-query sweep in one JVM: without periodic
  * driver GC, Spark's ContextCleaner (default 30 min) never releases
  * finished shuffle files and a local disk can fill mid-run — that is
  * what killed the round-1 bench.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "45s")
      // this box is disk-bound (run-to-run spread tracks disk
      // throughput, BASELINE.md): zstd halves shuffle bytes vs lz4 for
      // a CPU cost the 32 idle-on-IO cores absorb
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // per-query progress on stderr so a wedged run is diagnosable
      System.err.println(f"[bench] $name rows=$n ${dt}%.1f s")
      name -> dt
    }
    // The harness that records this run keeps only a bounded tail of
    // stdout, so the JSON line must stay short (3-decimal times) and be
    // the LAST stdout line (build.sbt sets showSuccess := false so sbt
    // prints nothing after it).
    // Locale.ROOT: the f-interpolator honours the JVM default locale,
    // and a comma-decimal locale would make the line invalid JSON
    def s3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    spark.stop()
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
