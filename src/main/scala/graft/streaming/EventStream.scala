package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
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

  // ---- stateful sessionization ------------------------------------

  final case class SessEv(user_id: Long, ts_us: Long, event_id: Long, cents: Long)
  final case class SessRow(user_id: Long, sess_id: Long, start_us: Long,
      end_us: Long, n_events: Long, sum_value_cents: Long)

  /** Per-user sessionizer for flatMapGroupsWithState: splits the
    * user's events (sorted by event time) at gaps > `gapUs` and emits
    * one row per session. State carries the session counter so a
    * multi-batch stream numbers sessions consistently; with
    * Trigger.AvailableNow the whole table arrives in one batch and the
    * result equals the batch window-function sessionization (q34). */
  private def sessionizeGroup(gapUs: Long)(
      user: Long, it: Iterator[SessEv],
      state: GroupState[Long]): Iterator[SessRow] = {
    val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
    if (evs.isEmpty) Iterator.empty
    else {
      var sessId = state.getOption.getOrElse(0L)
      val out = Seq.newBuilder[SessRow]
      var start = 0L; var end = 0L; var n = 0L; var cents = 0L
      evs.foreach { e =>
        if (n == 0L) { sessId += 1; start = e.ts_us }
        else if (e.ts_us - end > gapUs) {
          out += SessRow(user, sessId, start, end, n, cents)
          sessId += 1
          start = e.ts_us; n = 0L; cents = 0L
        }
        end = e.ts_us
        n += 1
        cents += e.cents
      }
      out += SessRow(user, sessId, start, end, n, cents)
      state.update(sessId)
      out.result().iterator
    }
  }

  /** Gap sessionization via the stateful streaming API
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`), drained with
    * AvailableNow into a memory sink. Column-compatible with the batch
    * [[graft.operators.EventAnalytics.sessionize]] / its DuckDB oracle. */
  def statefulSessionsOnce(s: SparkSession, dir: String,
                           gapMinutes: Int = 30): DataFrame = {
    import s.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val ev = eventsStream(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), Exact.cents(col("value")).as("cents"))
      .as[SessEv]
    val name = s"graft_stream_sess_${runIdx.incrementAndGet()}"
    val q = ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionizeGroup(gapUs))
      .toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
      .select(col("user_id"), col("sess_id"),
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"),
        col("n_events"), col("sum_value_cents"))
  }
}
