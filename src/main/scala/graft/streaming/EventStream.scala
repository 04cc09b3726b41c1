package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.functions.Exact

/** Structured Streaming surface over the events table. The reference
  * has no streaming (SURVEY.md §2.10); this is the green-field scope:
  * the SAME declarative aggregation as
  * [[graft.operators.EventAnalytics.tumblingCounts]] run as a stream —
  * `readStream` → watermark → windowed agg → sink.
  *
  * [[windowedCountsOnce]] drains the parquet path with
  * `Trigger.AvailableNow` into a memory sink and returns the result as
  * a DataFrame, so the batch DuckDB oracle verifies the streaming
  * path bit-for-bit. Complete output mode is used for the oracle run
  * (every window emitted); append-mode + watermark behaviour — only
  * watermark-expired windows emitted, state dropped — is covered by
  * StreamingSpec.
  */
object EventStream {

  private val runIdx = new AtomicInteger(0)

  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // The testdata tables are single parquet FILES, but the file stream
    // source monitors a DIRECTORY (that is its production shape). Stage
    // a per-sf directory with a hard link (fallback: copy) once.
    val streamDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft-stream",
      Integer.toHexString(dir.hashCode), "events")
    val target = streamDir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(target)) {
      java.nio.file.Files.createDirectories(streamDir)
      try java.nio.file.Files.createLink(target, java.nio.file.Paths.get(path))
      catch { case _: Exception =>
        java.nio.file.Files.copy(java.nio.file.Paths.get(path), target) }
    }
    graft.Tables.normalizeTs(
      s.readStream.schema(s.read.parquet(path).schema)
        .parquet(streamDir.toString))
  }

  def windowedAgg(events: DataFrame, width: String = "1 hour",
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(Exact.cents(col("value"))).as("sum_value_cents"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n_events"), col("sum_value_cents"))

  /** Run the stream to completion over the (finite) input, return the
    * materialized result. */
  def windowedCountsOnce(s: SparkSession, dir: String,
                         outputMode: String = "complete"): DataFrame = {
    val name = s"graft_stream_win_${runIdx.incrementAndGet()}"
    val q = windowedAgg(eventsStream(s, dir))
      .writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }
}
