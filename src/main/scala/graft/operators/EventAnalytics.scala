package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Exact

/** Event-time analytics over the `events` table: tumbling windows and
  * gap-based sessionization. The reference is pure batch (SURVEY.md
  * §2.10), so this is green-field scope; the same aggregations run
  * unchanged under Structured Streaming (see
  * [[graft.streaming.EventStream]]) — that is the point of expressing
  * them with `window()` + declarative aggs instead of custom logic.
  *
  * Money-like doubles are quantized to integer cents before summing
  * (see [[graft.functions.Exact]]).
  */
object EventAnalytics {

  /** Tumbling event-time windows per event type. Epoch-aligned, so the
    * DuckDB oracle spelling is `date_trunc('hour', ts)`. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(Exact.cents(col("value"))).as("sum_value_cents"),
        countDistinct("user_id").as("n_users"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n_events"), col("sum_value_cents"), col("n_users"))

  /** The gap-session ASSIGNMENT stage alone (adds `sess_id` per
    * event): one user-keyed shuffle, lag + running-sum share the
    * partitioning. Shared by [[sessionize]] and the q152 outcome
    * roll-up so the gap rule lives in exactly one place (the q78
    * `session_window` variant deliberately differs — `>=` — and
    * stays separate). */
  def assignSessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Gap-based sessions per user: a new session starts when the gap to
    * the previous event exceeds `gapMinutes`. Classic lag + running-sum
    * windows ([[assignSessions]]); shuffles once on user_id and
    * computes both windows in a single pass (same partitioning).
    * Timestamp arithmetic in exact microseconds (`unix_micros` /
    * DuckDB `epoch_us`). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    assignSessions(events, gapMinutes)
      .groupBy("user_id", "sess_id")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(Exact.cents(col("value"))).as("sum_value_cents"))
  }
}
