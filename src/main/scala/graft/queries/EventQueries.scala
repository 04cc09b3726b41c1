package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsofJoin, EventAnalytics}
import graft.streaming.EventStream

/** Event-time analytics over the `events` table: tumbling windows,
  * gap sessionization, and the same windowed aggregation executed via
  * Structured Streaming (readStream → watermark → windowed agg →
  * memory sink, drained with Trigger.AvailableNow) — all verified
  * against batch DuckDB SQL.
  */
object EventQueries {

  type Q = (SparkSession, String) => DataFrame

  def q33EventWindows(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.tumblingCounts(Tables.events(s, dir))
      .orderBy("wstart", "event_type")

  def q34Sessionize(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.sessionize(Tables.events(s, dir))
      .orderBy("user_id", "sess_id")

  /** Streaming execution of the q33-shaped aggregation; the oracle is
    * plain batch SQL, proving stream/batch parity. */
  def q35StreamWindows(s: SparkSession, dir: String): DataFrame =
    EventStream.windowedCountsOnce(s, dir)
      .orderBy("wstart", "event_type")

  /** Sessionization via the stateful streaming API
    * (flatMapGroupsWithState); the oracle is the same batch SQL as
    * q34, proving stateful-stream/batch parity. */
  def q54StreamSessions(s: SparkSession, dir: String): DataFrame =
    EventStream.statefulSessionsOnce(s, dir)
      .orderBy("user_id", "sess_id")

  /** Streaming exact dedup (dropDuplicates + watermark over a
    * deliberately-doubled stream); oracle = batch per-type counts. */
  def q67StreamDedup(s: SparkSession, dir: String): DataFrame =
    EventStream.dedupedCountsOnce(s, dir)
      .orderBy("event_type")

  /** Stream-static broadcast join (J5 on the streaming path). */
  def q68StreamStaticJoin(s: SparkSession, dir: String): DataFrame =
    EventStream.streamStaticJoinOnce(s, dir)
      .orderBy("user_bucket", "event_type")

  /** Streaming agg → parquet file sink via foreachBatch (S7). */
  def q69StreamParquetSink(s: SparkSession, dir: String): DataFrame =
    EventStream.parquetSinkOnce(s, dir)
      .orderBy("wstart", "event_type")

  /** Stream-stream interval join with watermarks on both sides. */
  def q77StreamStreamJoin(s: SparkSession, dir: String): DataFrame =
    EventStream.streamStreamJoinOnce(s, dir)
      .orderBy("user_id", "view_id", "purchase_id")

  /** Built-in merging session windows (`session_window`) on the
    * streaming path; same relation as the stateful sessionizer minus
    * the session numbering. */
  def q78SessionWindows(s: SparkSession, dir: String): DataFrame =
    EventStream.sessionWindowsOnce(s, dir)
      .orderBy("user_id", "session_start")

  /** As-of join (see [[graft.operators.AsofJoin]]): each purchase
    * attributed to the user's most recent strictly-prior view. The
    * oracle is DuckDB's NATIVE `ASOF LEFT JOIN` — an independent
    * engine's implementation of the same semantics. */
  def q79AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"),
        round(col("value") * 100).cast("long").as("purchase_cents"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
    AsofJoin.asofPrior(purchases, views, "user_id", "ts",
        Seq("view_id", "view_ts"))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("wait_us"),
        col("purchase_cents"))
      .orderBy("user_id", "purchase_id")
  }

  /** The q93 curation pipeline's per-document (map-side) stages run as
    * a streaming ingest — see [[graft.streaming.CurationStream]]. The
    * oracle is the batch spelling of the same stages, so the row is a
    * stream/batch parity check in the driver's own gate. */
  def q108StreamCuration(s: SparkSession, dir: String): DataFrame =
    graft.streaming.CurationStream.curationOnce(s, dir)

  /** q112: per-user event-value outliers — the data-QA pass an event
    * pipeline runs before trusting aggregates. An event is flagged
    * when it sits more than 3σ from its user's mean. The z-test is
    * evaluated in INTEGER arithmetic on cents — |v·n − Σv|² > 9·(n·Σv²
    * − (Σv)²) is the 3σ test with both sides multiplied by n², so
    * there is no float division anywhere and the flag is hash-exact.
    * One map-side-combinable groupBy for the per-user moments (the q18
    * exact-integer-moments pattern), one broadcast-size join back —
    * at 100 TB this is a shuffle of user-cardinality rows, not events.
    * Users need ≥ 2 events to have a defined deviation (singletons are
    * trivially their own mean). */
  def q112EventOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        graft.functions.Exact.cents(col("value")).as("v"))
    val stats = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum(col("v") * col("v")).as("ss"))
      .filter(col("n") >= 2)
    val dev = col("v") * col("n") - col("s")
    val varNum = col("n") * col("ss") - col("s") * col("s")
    ev.join(stats, Seq("user_id"))
      .withColumn("dev_sq", dev * dev)
      .withColumn("thresh", lit(9L) * varNum)
      .filter(col("dev_sq") > col("thresh"))
      .select(col("user_id"), col("event_id"), col("v").as("value_cents"),
        col("n").as("n_user_events"), col("dev_sq"), col("thresh"))
      .orderBy("user_id", "event_id")
  }

  /** q124: ordered conversion funnel (view → click → purchase) — the
    * product-analytics staple: a user reaches step k only via an event
    * STRICTLY AFTER their step-(k-1) arrival time, so out-of-order
    * events (a purchase before any view) never count. Computed as a
    * chain of per-user conditional first-arrival times: min(view ts),
    * then min(click ts > that), then min(purchase ts > that) — each
    * stage one map-side-combinable min-agg plus one user-keyed join,
    * so at 100 TB the shuffles carry user-cardinality rows, never the
    * event log, and no per-user event array is ever materialized (the
    * collect_list spelling would). The closing lag() window runs over
    * exactly 3 rows. */
  def q124Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    def firstAfter(typ: String, prev: DataFrame, prevCol: String) =
      ev.filter(col("event_type") === typ)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevCol))
        .groupBy("user_id").agg(min("ts").as("f" + typ))
    val fv = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("fview"))
    val fc = firstAfter("click", fv, "fview")
    val fp = firstAfter("purchase", fc, "fclick")
    val steps = fv.select(lit(1).as("step"), lit("view").as("step_name"),
        col("user_id"))
      .unionByName(fc.select(lit(2).as("step"), lit("click").as("step_name"),
        col("user_id")))
      .unionByName(fp.select(lit(3).as("step"),
        lit("purchase").as("step_name"), col("user_id")))
    val w = org.apache.spark.sql.expressions.Window.orderBy("step")
    steps.groupBy("step", "step_name").agg(count(lit(1)).as("n_users"))
      .withColumn("prev_users", lag("n_users", 1).over(w))
      .withColumn("conv_milli",
        coalesce(expr("n_users * 1000 div prev_users"), lit(1000L)))
      .drop("prev_users")
      .orderBy("step")
  }

  /** q125: daily retention cohorts — users grouped by first-active day,
    * activity counted per (cohort day, day offset): the curve a growth
    * dashboard reads. The corpus-side work is one map-side-combinable
    * distinct over (user, day) — the event log collapses to
    * user-day granularity BEFORE any join — then the cohort assignment
    * is a user-keyed min-agg + join, and the report groupBy is over
    * cohort×offset cells (bounded by the date range squared), not
    * events. Retention in thousandths keeps the output hash-exact. */
  def q125Retention(s: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohort = active.groupBy("user_id").agg(min("day").as("cohort_day"))
    val cells = active.join(cohort, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .groupBy("cohort_day", "day_offset").agg(count(lit(1)).as("n_active"))
    val sizes = cohort.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(sizes, Seq("cohort_day"))
      .withColumn("retention_milli",
        expr("n_active * 1000 div cohort_size"))
      .select("cohort_day", "day_offset", "n_active", "cohort_size",
        "retention_milli")
      .orderBy("cohort_day", "day_offset")
  }

  /** q130: changelog compaction — the CDC latest-wins merge an ingest
    * store runs to materialize current state from an event log (SCD
    * type 1): per key, the payload of the newest change plus a change
    * count. Computed as ONE map-side-combinable `max(struct(ts,
    * event_id, payload…))` aggregation — the struct compares (ts,
    * event_id) first, a unique total order, so the payload rides
    * along for free. Struct max isn't hash-buffer-able, so Spark
    * plans it as a partial SortAggregate: each map task sorts its
    * own partition once (external, spillable), but the shuffle still
    * carries only per-user partial maxima — at 100 TB that map-side
    * combine is the difference from the window-row_number spelling
    * the oracle uses, which must shuffle every key's full history
    * before sorting it. No window, no join. The aggregation lives in
    * [[graft.streaming.EventStream.compact]], shared VERBATIM with
    * the q143 streaming half so the parity pair can never drift. */
  def q130ChangelogCompact(s: SparkSession, dir: String): DataFrame =
    EventStream.compact(Tables.events(s, dir)).orderBy("user_id")

  /** q133: linear multi-touch attribution — each purchase's value
    * split equally across the user's views in the preceding 30
    * minutes, the marketing-analytics companion to q79's last-touch
    * as-of join. The split is exact integer arithmetic: every view
    * gets `cents div n`, and the remainder goes to the EARLIEST view
    * (deterministic tie), so credits sum back to the purchase exactly
    * — the invariant a revenue report must keep. One user-keyed
    * interval join (the q77 stream-stream shape in batch) + one
    * window over each purchase's touch list (bounded by the 30-minute
    * horizon, not the user's history). */
  def q133Attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // cents >= 0 is the invariant the split formula needs: for a
    // negative value Spark's trunc-div `%` pair and DuckDB's floor-div
    // `//` with trunc-`%` stop agreeing AND the credits stop summing
    // to cents. Refunds are out of attribution scope by definition;
    // the filter states that identically in both engines.
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"),
        col("event_id").as("purchase_id"),
        graft.functions.Exact.cents(col("value")).as("cents"))
      .filter(col("cents") >= 0)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"),
        col("event_id").as("view_id"))
    val pairs = purchases.join(views, Seq("user_id"))
      .filter(col("vts") < col("pts") &&
        col("vts") >= col("pts") - expr("INTERVAL 30 MINUTES"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("purchase_id")
    val wo = w.orderBy(col("vts"), col("view_id"))
    pairs
      .withColumn("n_touches", count(lit(1)).over(w))
      .withColumn("touch_rank", row_number().over(wo))
      .withColumn("credit_cents",
        expr("cents div n_touches") +
          when(col("touch_rank") === 1, expr("cents % n_touches"))
            .otherwise(lit(0L)))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        col("touch_rank"), col("n_touches"), col("credit_cents"))
      .orderBy("user_id", "purchase_id", "touch_rank")
  }

  /** q135: event-type transition matrix — per-user journeys collapsed
    * to (state → next state) bigram counts with transition
    * probabilities in thousandths: the Markov-chain view of user
    * behavior a journey-analytics dashboard reads. One window lead
    * per user (user-keyed shuffle of the log, the same distribution
    * q34's sessionizer uses), then the matrix is a 25-cell groupBy
    * with map-side combine; probabilities are integer milli so the
    * distributed sum hashes exactly. */
  def q135Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val bi = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead("src", 1).over(w))
      .filter(col("dst").isNotNull)
    val cells = bi.groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("src").agg(sum("n").as("n_src"))
    cells.join(totals, Seq("src"))
      .withColumn("prob_milli", expr("n * 1000 div n_src"))
      .select("src", "dst", "n", "n_src", "prob_milli")
      .orderBy("src", "dst")
  }

  /** q139: A/B experiment readout — users hash-assigned to arms (the
    * q80 portable md5 sampler, so assignment is reproducible and
    * consistent across every event a user emits), then per event
    * type: arm sizes, mean values, and the Welch z statistic with a
    * |z| > 1.96 significance flag — the experimentation table a
    * product team reads. All moments (n, Σv, Σv²) are exact integer
    * cents accumulated in ONE combinable groupBy over a single scan
    * (sum-of-CASE per arm, the q136 two-sided histogram shape); the
    * z-score is computed from those exact integers with an identical
    * double formula in both engines and r6-quantized. At 100 TB:
    * one map-side pass, a 5-row shuffle. */
  def q139AbTest(s: SparkSession, dir: String): DataFrame = {
    // variance numerators in DECIMAL(38,0): na·ssa and sa² scale as
    // sf² and pass Long.MaxValue between sf1 and sf10 (the q137
    // guard); the exact integer then collapses to a double once
    // degenerate-arm guards (the q137/q141 NULL discipline, applied
    // proactively): an empty arm makes the mean 0/0, a 1-row arm
    // zeroes the variance denominator, and a zero pooled variance
    // makes z x/0 — each divides differently across engines (Spark
    // non-ANSI → NULL, DuckDB → NaN/±inf, then CAST(round(...))
    // errors). All three collapse to NULL via identical CASE guards.
    val vSql =
      """CASE WHEN na > 1 AND nb > 1 THEN
           CAST(CAST(na AS DECIMAL(38,0)) * ssa
             - CAST(sa AS DECIMAL(38,0)) * sa AS DOUBLE)
             / (na * (na - 1.0)) / na
         + CAST(CAST(nb AS DECIMAL(38,0)) * ssb
             - CAST(sb AS DECIMAL(38,0)) * sb AS DOUBLE)
             / (nb * (nb - 1.0)) / nb
         ELSE NULL END"""
    val zSql =
      s"""CASE WHEN ($vSql) > 0
          THEN (sa / na - sb / nb) / sqrt($vSql) ELSE NULL END"""
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        graft.functions.Exact.cents(col("value")).as("v"),
        when(graft.operators.Sampling.bucket(col("user_id"), "graft-ab:")
          < "80", lit("a")).otherwise(lit("b")).as("arm"))
    ev.groupBy("event_type")
      .agg(
        sum(when(col("arm") === "a", 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === "a", col("v")).otherwise(0L)).as("sa"),
        sum(when(col("arm") === "a", col("v") * col("v")).otherwise(0L))
          .as("ssa"),
        sum(when(col("arm") === "b", 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === "b", col("v")).otherwise(0L)).as("sb"),
        sum(when(col("arm") === "b", col("v") * col("v")).otherwise(0L))
          .as("ssb"))
      .withColumn("mean_a_r6", graft.functions.Exact.r6(
        expr("CASE WHEN na > 0 THEN sa / na ELSE NULL END")))
      .withColumn("mean_b_r6", graft.functions.Exact.r6(
        expr("CASE WHEN nb > 0 THEN sb / nb ELSE NULL END")))
      .withColumn("z_r6", graft.functions.Exact.r6(expr(zSql)))
      .withColumn("significant", expr("abs(z_r6) > 1.96"))
      .select("event_type", "na", "nb", "mean_a_r6", "mean_b_r6",
        "z_r6", "significant")
      .orderBy("event_type")
  }

  /** q143: q130's CDC snapshot maintained by a STREAM — complete-mode
    * streaming `max(struct)` agg, the state store doing the merge each
    * micro-batch (see [[graft.streaming.EventStream.compactOnce]]).
    * The oracle is the batch q130 SQL, so the row is a stream/batch
    * parity check like q35/q54/q108. */
  def q143StreamCompact(s: SparkSession, dir: String): DataFrame =
    EventStream.compactOnce(s, dir).orderBy("user_id")

  /** q155: the UPDATE-mode leg of the CDC parity family — q143's
    * complete-mode snapshot rewrite replaced by changed-keys-only
    * upserts into a keyed changelog store, reconstructed
    * latest-epoch-wins (see
    * [[graft.streaming.EventStream.compactUpdateOnce]]). Verified
    * against the same batch q130 SQL, so all three CDC spellings —
    * batch agg, complete-mode stream, update-mode stream + store —
    * must produce the identical snapshot. */
  def q155CdcUpdate(s: SparkSession, dir: String): DataFrame =
    EventStream.compactUpdateOnce(s, dir).orderBy("user_id")

  /** q148: exponentially time-decayed value per user — the
    * feature-store staple (recent activity counts more: score =
    * Σ v·e^(−λ·age)) with the float-sum hazard removed: the decay
    * factor is micro-quantized PER EVENT (`round(e^(−0.05·age_days)
    * ·1e6)` — exp of identical doubles in both engines, the q120 ln
    * precedent), so the per-user aggregation is an exact integer sum
    * in micro-cents — order-independent, map-side combinable, one
    * groupBy. A raw double Σ v·e^(−λ·age) would hash-diverge under
    * repartitioning; this never can. */
  def q148DecayedValue(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"),
        graft.functions.Exact.cents(col("value")).as("v"),
        datediff(lit("2024-02-01").cast("date"), to_date(col("ts")))
          .cast("long").as("age_days"))
      .withColumn("decay_micro",
        round(exp(col("age_days") * lit(-0.05)) * 1e6).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("v * decay_micro")).as("score_micro_cents"))
      .orderBy("user_id")

  /** q149: RFM segmentation — the classic customer-value grid
    * (Recency / Frequency / Monetary, each scored 1–4 against FIXED
    * thresholds so the segmentation is data-independent and
    * reproducible across batches): one per-user purchase roll-up
    * (map-side-combinable min/count/sum), pure map-side scoring, and
    * a 64-cell segment groupBy. Shuffles carry user-cardinality rows
    * once, then segment cells. */
  def q149RfmSegments(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        graft.functions.Exact.cents(col("value")).as("v"),
        datediff(lit("2024-02-01").cast("date"), to_date(col("ts")))
          .cast("long").as("age_days"))
      .groupBy("user_id")
      .agg(min("age_days").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum("v").as("monetary_cents"))
    per
      .withColumn("r_score", expr(
        "CASE WHEN recency_days <= 3 THEN 4 WHEN recency_days <= 5 THEN 3" +
          " WHEN recency_days <= 10 THEN 2 ELSE 1 END"))
      .withColumn("f_score", expr(
        "CASE WHEN frequency >= 20 THEN 4 WHEN frequency >= 13 THEN 3" +
          " WHEN frequency >= 7 THEN 2 ELSE 1 END"))
      .withColumn("m_score", expr(
        "CASE WHEN monetary_cents >= 30000 THEN 4" +
          " WHEN monetary_cents >= 15000 THEN 3" +
          " WHEN monetary_cents >= 5000 THEN 2 ELSE 1 END"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"),
        sum("monetary_cents").as("sum_monetary_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** q151: inter-purchase gaps and churn risk — per user, the purchase
    * cadence (count, max gap between consecutive purchases, days
    * since the last one) and a fixed-threshold churn flag (quiet
    * > 7 days OR a historical gap > 14). One user-keyed lag window
    * over the PURCHASE subset (the fact table filters first), gaps
    * in exact whole days via integer microsecond division, then a
    * combinable per-user agg. */
  def q151ChurnRisk(s: SparkSession, dir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("gap_days",
        expr("(unix_micros(ts) - prev_us) div 86400000000"))
      .withColumn("age_days",
        datediff(lit("2024-02-01").cast("date"), to_date(col("ts")))
          .cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        max("gap_days").as("max_gap_days"),
        min("age_days").as("last_purchase_age_days"))
      .withColumn("churn_risk", expr(
        "last_purchase_age_days > 7 OR coalesce(max_gap_days, 0) > 14"))
      .orderBy("user_id")
  }

  /** q152: session outcomes — q34's gap sessions classified by funnel
    * result (converted / abandoned_cart / browsed / other), the
    * shopping-funnel health readout: a session that viewed AND
    * clicked but never purchased is an abandoned cart. The same
    * single user-keyed shuffle as the sessionizer (lag + running-sum
    * windows share one partitioning), per-session flags are
    * max(CASE) aggregates, and the outcome roll-up is 4 cells. */
  def q152SessionOutcomes(s: SparkSession, dir: String): DataFrame = {
    EventAnalytics.assignSessions(Tables.events(s, dir))
      .groupBy("user_id", "sess_id")
      .agg(max(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("has_view"),
        max(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("has_click"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("has_purchase"),
        count(lit(1)).as("n_events"))
      .withColumn("outcome", expr(
        """CASE WHEN has_purchase = 1 THEN 'converted'
           WHEN has_view = 1 AND has_click = 1 THEN 'abandoned_cart'
           WHEN has_view = 1 THEN 'browsed'
           ELSE 'other' END"""))
      .groupBy("outcome")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("sum_events"))
      .orderBy("outcome")
  }

  /** q175: SCD TYPE-2 DIMENSION MERGE — the versioned-dimension
    * maintenance every warehouse runs nightly at 100 TB: an existing
    * versioned dimension (history of `signup` profile changes up to a
    * cutoff, each with valid_from / valid_to / version / is_current)
    * absorbs an incoming change batch. The merge is INCREMENTAL by
    * construction: closed versions pass through UNTOUCHED (no shuffle
    * re-keys history — at scale they are not even read back; here the
    * union makes that explicit), only the one open version per
    * batch-affected user is closed (a keyed join against the batch's
    * first change), and the batch itself is versioned with numbering
    * continued from each user's open version. The ORACLE rebuilds the
    * dimension from FULL history in one pass — the SCD2 merge
    * invariant (incremental merge ≡ full rebuild) is exactly what the
    * hash compare proves, the same identity discipline as q140's MV
    * maintenance.
    *
    * Scale shape: two user-keyed window passes (history ≤ cutoff once
    * — in production read from the stored dim, not recomputed — and
    * the batch, which is small by definition), one broadcast-sized
    * keyed join to close open versions. Nothing global; the closed
    * partition of the dimension never moves. */
  def q175Scd2Merge(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-21").cast("timestamp")
    val changes = Tables.events(s, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"),
        graft.functions.Exact.cents(col("value")).as("cents"))
    // ordered versions of a change set; (ts, event_id) is a unique
    // total order so ties cannot flake the hash
    def versioned(ch: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ch.withColumn("valid_from", col("ts"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("version", row_number().over(w))
        .drop("ts")
    }
    val dim = versioned(changes.filter(col("ts") < cutoff))
    val batch = changes.filter(col("ts") >= cutoff)
    val closed = dim.filter(col("valid_to").isNotNull)
    val open = dim.filter(col("valid_to").isNull)
    // first batch change per user closes that user's open version
    val firstBatch = batch.groupBy("user_id")
      .agg(min(struct(col("ts"), col("event_id"))).as("f"))
      .select(col("user_id"), col("f.ts").as("first_ts"))
    val openMerged = open.join(firstBatch, Seq("user_id"), "left")
      .withColumn("valid_to", col("first_ts")).drop("first_ts")
    // batch versions continue each user's numbering (0 for new users)
    val baseVer = open.select(col("user_id"), col("version").as("base_ver"))
    val batchVers = versioned(batch)
      .join(baseVer, Seq("user_id"), "left")
      .withColumn("version",
        col("version") + coalesce(col("base_ver"), lit(0)))
      .drop("base_ver")
    closed.unionByName(openMerged).unionByName(batchVers)
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "version", "event_id", "cents",
        "valid_from", "valid_to", "is_current")
      .orderBy("user_id", "version")
  }

  /** q189: streaming drift monitor — the q136 PSI with the current
    * side maintained by a complete-mode stream; see
    * [[graft.streaming.EventStream.driftOnce]]. The oracle is the
    * batch spelling of both halves, proving stream/batch parity for
    * the monitor. */
  def q189StreamDrift(s: SparkSession, dir: String): DataFrame =
    EventStream.driftOnce(s, dir)

  val queries: Map[String, Q] = Map(
    "q189_stream_drift" -> (q189StreamDrift _),
    "q175_scd2_merge" -> (q175Scd2Merge _),
    "q139_ab_test" -> (q139AbTest _),
    "q143_stream_compact" -> (q143StreamCompact _),
    "q155_cdc_update" -> (q155CdcUpdate _),
    "q148_decayed_value" -> (q148DecayedValue _),
    "q149_rfm_segments" -> (q149RfmSegments _),
    "q151_churn_risk" -> (q151ChurnRisk _),
    "q152_session_outcomes" -> (q152SessionOutcomes _),
    "q133_attribution" -> (q133Attribution _),
    "q135_transitions" -> (q135Transitions _),
    "q108_stream_curation" -> (q108StreamCuration _),
    "q112_event_outliers" -> (q112EventOutliers _),
    "q124_funnel" -> (q124Funnel _),
    "q125_retention" -> (q125Retention _),
    "q130_changelog_compact" -> (q130ChangelogCompact _),
    "q33_event_windows" -> (q33EventWindows _),
    "q34_event_sessions" -> (q34Sessionize _),
    "q35_stream_windows" -> (q35StreamWindows _),
    "q54_stream_sessions" -> (q54StreamSessions _),
    "q67_stream_dedup" -> (q67StreamDedup _),
    "q68_stream_static_join" -> (q68StreamStaticJoin _),
    "q69_stream_parquet_sink" -> (q69StreamParquetSink _),
    "q77_stream_stream_join" -> (q77StreamStreamJoin _),
    "q78_session_windows" -> (q78SessionWindows _),
    "q79_asof_join" -> (q79AsofJoin _))

  private val sumCents =
    "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)"

  /** The parquet stores TIMESTAMP_NS; cast to micros TIMESTAMP exactly
    * like Tables.events does on the Spark side. */
  private val evCte =
    """ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
       event_type, value, props FROM events)"""

  /** DuckDB spelling of [[graft.operators.EventAnalytics.assignSessions]]
    * (the `>`-gap rule) — ends in `g(…, sess_id)`; shared by the q34/
    * q54 session roll-ups and the q152 outcome report so the gap rule
    * has ONE oracle spelling (q78's `>=` session_window variant stays
    * separate, deliberately). */
  private val sessionAssignCtes =
    """e AS (SELECT *, lag(epoch_us(ts)) OVER
         (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM ev),
       f AS (SELECT *, CASE WHEN prev_us IS NULL
           OR epoch_us(ts) - prev_us > 1800000000
         THEN 1 ELSE 0 END AS new_sess FROM e),
       g AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
         ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS sess_id FROM f)"""

  /** Shared by q34 (batch windows) and q54 (stateful streaming). */
  private val sessionsSql =
    s"""WITH $evCte,
         $sessionAssignCtes
         SELECT user_id, sess_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           $sumCents AS sum_value_cents
         FROM g GROUP BY user_id, sess_id ORDER BY user_id, sess_id"""

  /** Shared by q130 (batch) and q143 (streaming) — the parity pair. */
  private val compactSql =
    s"""WITH $evCte,
       r AS (SELECT user_id, ts, event_id, event_type,
           CAST(round(value*100) AS BIGINT) AS v,
           row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn
         FROM ev),
       n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_changes
         FROM ev GROUP BY 1)
       SELECT r.user_id, r.event_id AS last_event_id,
         r.event_type AS last_type, r.v AS last_value_cents,
         r.ts AS last_ts, n.n_changes
       FROM r JOIN n USING (user_id) WHERE rn = 1
       ORDER BY user_id"""

  val oracles: Map[String, String] = Map(
    "q189_stream_drift" ->
      s"""WITH $evCte,
         b AS (SELECT event_type,
             CAST(least(greatest(CAST(round(value*100) AS BIGINT), 0)
               // 500, 24) AS INTEGER) AS bucket,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'ref'
               ELSE 'cur' END AS side
           FROM ev),
         cells AS (SELECT event_type, bucket,
             CAST(sum(CASE side WHEN 'ref' THEN 1 ELSE 0 END) AS BIGINT)
               AS ref_n,
             CAST(sum(CASE side WHEN 'cur' THEN 1 ELSE 0 END) AS BIGINT)
               AS cur_n
           FROM b GROUP BY 1, 2),
         tot AS (SELECT event_type,
             CAST(sum(ref_n) AS BIGINT) AS ref_tot,
             CAST(sum(cur_n) AS BIGINT) AS cur_tot
           FROM cells GROUP BY 1)
         SELECT c.event_type, c.bucket, c.ref_n, c.cur_n,
           CAST(round(
             ((c.cur_n + 1) / (t.cur_tot + 25.0)
               - (c.ref_n + 1) / (t.ref_tot + 25.0))
             * ln(((c.cur_n + 1) / (t.cur_tot + 25.0))
               / ((c.ref_n + 1) / (t.ref_tot + 25.0))) * 1e6) AS BIGINT)
           AS psi_micro
         FROM cells c JOIN tot t USING (event_type)
         ORDER BY c.event_type, c.bucket""",
    // full-history rebuild: one window pass over ALL signup changes —
    // hash-equality against the Spark side's incremental merge IS the
    // SCD2 invariant (merge ≡ rebuild)
    "q175_scd2_merge" ->
      s"""WITH $evCte,
         ch AS (SELECT user_id, ts, event_id,
             CAST(round(value*100) AS BIGINT) AS cents
           FROM ev WHERE event_type = 'signup'),
         v AS (SELECT user_id, event_id, cents, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             CAST(row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS INTEGER) AS version
           FROM ch)
         SELECT user_id, version, event_id, cents, valid_from, valid_to,
           valid_to IS NULL AS is_current
         FROM v ORDER BY user_id, version""",
    "q151_churn_risk" ->
      s"""WITH $evCte,
         p AS (SELECT user_id, ts, event_id,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id)) // 86400000000 AS gap_days,
             CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01')
               AS BIGINT) AS age_days
           FROM ev WHERE event_type = 'purchase'),
         a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(max(gap_days) AS BIGINT) AS max_gap_days,
             CAST(min(age_days) AS BIGINT) AS last_purchase_age_days
           FROM p GROUP BY user_id)
         SELECT user_id, n_purchases, max_gap_days, last_purchase_age_days,
           last_purchase_age_days > 7 OR coalesce(max_gap_days, 0) > 14
             AS churn_risk
         FROM a ORDER BY user_id""",
    "q152_session_outcomes" ->
      s"""WITH $evCte,
         $sessionAssignCtes,
         sflag AS (SELECT user_id, sess_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS has_view,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS has_click,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS has_purchase,
             CAST(count(*) AS BIGINT) AS n_events
           FROM g GROUP BY 1, 2),
         o AS (SELECT CASE WHEN has_purchase = 1 THEN 'converted'
             WHEN has_view = 1 AND has_click = 1 THEN 'abandoned_cart'
             WHEN has_view = 1 THEN 'browsed'
             ELSE 'other' END AS outcome, n_events
           FROM sflag)
         SELECT outcome, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS sum_events
         FROM o GROUP BY outcome ORDER BY outcome""",
    "q149_rfm_segments" ->
      s"""WITH $evCte,
         per AS (SELECT user_id,
             CAST(min(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01'))
               AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
           FROM ev WHERE event_type = 'purchase' GROUP BY user_id),
         sc AS (SELECT *,
             CASE WHEN recency_days <= 3 THEN 4
               WHEN recency_days <= 5 THEN 3
               WHEN recency_days <= 10 THEN 2 ELSE 1 END AS r_score,
             CASE WHEN frequency >= 20 THEN 4 WHEN frequency >= 13 THEN 3
               WHEN frequency >= 7 THEN 2 ELSE 1 END AS f_score,
             CASE WHEN monetary_cents >= 30000 THEN 4
               WHEN monetary_cents >= 15000 THEN 3
               WHEN monetary_cents >= 5000 THEN 2 ELSE 1 END AS m_score
           FROM per)
         SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(monetary_cents) AS BIGINT) AS sum_monetary_cents
         FROM sc GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""",
    "q148_decayed_value" ->
      s"""WITH $evCte,
         e AS (SELECT user_id, CAST(round(value*100) AS BIGINT) AS v,
             CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01')
               AS BIGINT) AS age_days
           FROM ev),
         d AS (SELECT user_id, v,
             CAST(round(exp(age_days * -0.05) * 1e6) AS BIGINT)
               AS decay_micro
           FROM e)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(v * decay_micro) AS BIGINT) AS score_micro_cents
         FROM d GROUP BY user_id ORDER BY user_id""",
    "q143_stream_compact" -> compactSql,
    "q155_cdc_update" -> compactSql,
    "q139_ab_test" ->
      s"""WITH $evCte,
         e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS v,
             CASE WHEN substring(md5('graft-ab:'
                 || CAST(user_id AS VARCHAR)), 1, 2) < '80'
               THEN 'a' ELSE 'b' END AS arm
           FROM ev),
         m AS (SELECT event_type,
             CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(sum(CASE WHEN arm = 'a' THEN v ELSE 0 END) AS BIGINT)
               AS sa,
             CAST(sum(CASE WHEN arm = 'a' THEN v*v ELSE 0 END) AS BIGINT)
               AS ssa,
             CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb,
             CAST(sum(CASE WHEN arm = 'b' THEN v ELSE 0 END) AS BIGINT)
               AS sb,
             CAST(sum(CASE WHEN arm = 'b' THEN v*v ELSE 0 END) AS BIGINT)
               AS ssb
           FROM e GROUP BY 1),
         mv AS (SELECT *,
             CASE WHEN na > 1 AND nb > 1 THEN
               CAST(CAST(na AS HUGEINT) * ssa
                 - CAST(sa AS HUGEINT) * sa AS DOUBLE)
                 / (na * (na - 1.0)) / na
             + CAST(CAST(nb AS HUGEINT) * ssb
                 - CAST(sb AS HUGEINT) * sb AS DOUBLE)
                 / (nb * (nb - 1.0)) / nb
             ELSE NULL END AS vv
           FROM m),
         r AS (SELECT event_type, na, nb,
             CASE WHEN na > 0 THEN
               CAST(round(sa / na * 1e6) AS BIGINT) / 1e6
             ELSE NULL END AS mean_a_r6,
             CASE WHEN nb > 0 THEN
               CAST(round(sb / nb * 1e6) AS BIGINT) / 1e6
             ELSE NULL END AS mean_b_r6,
             CASE WHEN vv > 0 THEN
               CAST(round(((sa / na - sb / nb) / sqrt(vv)) * 1e6)
                 AS BIGINT) / 1e6
             ELSE NULL END AS z_r6
           FROM mv)
         SELECT event_type, na, nb, mean_a_r6, mean_b_r6, z_r6,
           abs(z_r6) > 1.96 AS significant
         FROM r ORDER BY event_type""",
    "q133_attribution" ->
      s"""WITH $evCte,
         p AS (SELECT user_id, ts AS pts, event_id AS purchase_id,
             CAST(round(value*100) AS BIGINT) AS cents
           FROM ev WHERE event_type = 'purchase'
             AND CAST(round(value*100) AS BIGINT) >= 0),
         v AS (SELECT user_id, ts AS vts, event_id AS view_id
           FROM ev WHERE event_type = 'view'),
         pairs AS (SELECT p.user_id, p.purchase_id, p.cents,
             v.view_id, v.vts
           FROM p JOIN v USING (user_id)
           WHERE v.vts < p.pts
             AND v.vts >= p.pts - INTERVAL 30 MINUTE),
         ranked AS (SELECT *,
             CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT)
               AS n_touches,
             CAST(row_number() OVER (PARTITION BY purchase_id
               ORDER BY vts, view_id) AS INTEGER) AS touch_rank
           FROM pairs)
         SELECT user_id, purchase_id, view_id, touch_rank, n_touches,
           cents // n_touches + CASE WHEN touch_rank = 1
             THEN cents % n_touches ELSE 0 END AS credit_cents
         FROM ranked
         ORDER BY user_id, purchase_id, touch_rank""",
    "q135_transitions" ->
      s"""WITH $evCte,
         bi AS (SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS dst
           FROM ev),
         cells AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
           FROM bi WHERE dst IS NOT NULL GROUP BY 1, 2),
         totals AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_src
           FROM cells GROUP BY 1)
         SELECT c.src, c.dst, c.n, t.n_src,
           c.n * 1000 // t.n_src AS prob_milli
         FROM cells c JOIN totals t USING (src)
         ORDER BY src, dst""",
    "q130_changelog_compact" -> compactSql,
    "q124_funnel" ->
      s"""WITH $evCte,
         fv AS (SELECT user_id, min(ts) AS fview FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         fc AS (SELECT e.user_id, min(e.ts) AS fclick FROM ev e
           JOIN fv USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > fv.fview GROUP BY 1),
         fp AS (SELECT e.user_id, min(e.ts) AS fpurchase FROM ev e
           JOIN fc USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > fc.fclick GROUP BY 1),
         steps AS (
           SELECT 1 AS step, 'view' AS step_name, user_id FROM fv
           UNION ALL
           SELECT 2, 'click', user_id FROM fc
           UNION ALL
           SELECT 3, 'purchase', user_id FROM fp),
         agg AS (SELECT step, step_name, CAST(count(*) AS BIGINT) AS n_users
           FROM steps GROUP BY 1, 2)
         SELECT step, step_name, n_users,
           CAST(coalesce(n_users * 1000 // lag(n_users) OVER (ORDER BY step),
             1000) AS BIGINT) AS conv_milli
         FROM agg ORDER BY step""",
    "q125_retention" ->
      s"""WITH $evCte,
         a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ev),
         c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1),
         x AS (SELECT c.cohort_day,
             CAST(date_diff('day', c.cohort_day, a.day) AS INTEGER)
               AS day_offset
           FROM a JOIN c USING (user_id)),
         g AS (SELECT cohort_day, day_offset,
             CAST(count(*) AS BIGINT) AS n_active
           FROM x GROUP BY 1, 2),
         cs AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
           FROM c GROUP BY 1)
         SELECT g.cohort_day, g.day_offset, g.n_active, cs.cohort_size,
           g.n_active * 1000 // cs.cohort_size AS retention_milli
         FROM g JOIN cs USING (cohort_day)
         ORDER BY cohort_day, day_offset""",
    "q112_event_outliers" ->
      s"""WITH $evCte,
         e AS (SELECT event_id, user_id,
           CAST(round(value*100) AS BIGINT) AS v FROM ev),
         st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(v*v) AS BIGINT) AS ss
           FROM e GROUP BY user_id HAVING count(*) >= 2)
         SELECT e.user_id, e.event_id, e.v AS value_cents,
           st.n AS n_user_events,
           (e.v * st.n - st.s) * (e.v * st.n - st.s) AS dev_sq,
           9 * (st.n * st.ss - st.s * st.s) AS thresh
         FROM e JOIN st USING (user_id)
         WHERE (e.v * st.n - st.s) * (e.v * st.n - st.s)
           > 9 * (st.n * st.ss - st.s * st.s)
         ORDER BY e.user_id, e.event_id""",
    "q108_stream_curation" ->
      s"""WITH ${TextQueries.toksCte},
         lscores AS (${TextQueries.langUnion}),
         lranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
           ORDER BY hits DESC, lang) AS rn FROM lscores),
         lang AS (SELECT doc_id,
             CASE WHEN hits = 0 THEN 'und' ELSE lang END AS predicted_lang
           FROM lranked WHERE rn = 1),
         qbase AS (SELECT doc_id, len(toks) AS n_tokens,
             length(text) AS text_len,
             len(list_filter(toks, x ->
               list_contains(['the', 'a', 'is', 'of', 'to'], x))) AS stop_hits,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha_chars
           FROM toks WHERE len(toks) > 0),
         qual AS (SELECT doc_id,
           ${TextQueries.r6Sql(
             "0.3 * least(1.0, n_tokens / 50.0) + 0.4 * (stop_hits / n_tokens)" +
             " + 0.3 * (alpha_chars / text_len)")} AS quality
           FROM qbase),
         rep0 AS (SELECT doc_id,
           unnest(list_transform(string_split(text, ' '),
             (x, i) -> struct_pack(pos := i, tok := x))) AS u
           FROM documents),
         rept AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM rep0),
         repb AS (SELECT doc_id, tok,
           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
           FROM rept),
         repn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
           FROM rept GROUP BY 1),
         repg AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bi FROM
           (SELECT doc_id, tok, nxt, count(*) AS c FROM repb
            WHERE nxt IS NOT NULL GROUP BY 1, 2, 3) GROUP BY 1),
         rep AS (SELECT repn.doc_id,
             (1000 * CAST(COALESCE(top_bi, 0) AS BIGINT))
               // greatest(n_tokens - 1, 1) AS top_bigram_milli
           FROM repn LEFT JOIN repg USING (doc_id)),
         verdict AS (SELECT l.doc_id, l.predicted_lang, q.quality,
             r2.top_bigram_milli,
             concat_ws(',',
               CASE WHEN l.predicted_lang <> 'en' THEN 'lang' END,
               CASE WHEN q.quality < 0.5 THEN 'quality' END,
               CASE WHEN r2.top_bigram_milli > 60 THEN 'repetition' END)
               AS drop_reasons
           FROM lang l
           JOIN qual q ON q.doc_id = l.doc_id
           JOIN rep r2 ON r2.doc_id = l.doc_id)
         SELECT doc_id, predicted_lang, quality, top_bigram_milli,
           drop_reasons, drop_reasons = '' AS keep
         FROM verdict ORDER BY doc_id""",
    "q33_event_windows" ->
      s"""WITH $evCte
         SELECT date_trunc('hour', ts) AS wstart, event_type,
         count(*) AS n_events,
         $sumCents AS sum_value_cents,
         count(DISTINCT user_id) AS n_users
         FROM ev GROUP BY 1, 2 ORDER BY wstart, event_type""",
    "q34_event_sessions" -> sessionsSql,
    "q35_stream_windows" ->
      s"""WITH $evCte
         SELECT date_trunc('hour', ts) AS wstart, event_type,
         count(*) AS n_events,
         $sumCents AS sum_value_cents
         FROM ev GROUP BY 1, 2 ORDER BY wstart, event_type""",
    "q54_stream_sessions" -> sessionsSql,
    "q67_stream_dedup" ->
      s"""WITH $evCte,
         d AS (SELECT DISTINCT ON (event_id) event_id, event_type, value FROM ev)
         SELECT event_type, count(*) AS n_events,
           $sumCents AS sum_value_cents
         FROM d GROUP BY 1 ORDER BY event_type""",
    "q68_stream_static_join" ->
      s"""WITH $evCte
         SELECT user_id % 10 AS user_bucket, event_type,
           count(*) AS n_events,
           $sumCents AS sum_value_cents
         FROM ev GROUP BY 1, 2 ORDER BY user_bucket, event_type""",
    "q69_stream_parquet_sink" ->
      s"""WITH $evCte
         SELECT date_trunc('hour', ts) AS wstart, event_type,
         count(*) AS n_events,
         $sumCents AS sum_value_cents
         FROM ev GROUP BY 1, 2 ORDER BY wstart, event_type""",
    "q77_stream_stream_join" ->
      s"""WITH $evCte
         SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS lag_us,
           CAST(round(p.value*100) AS BIGINT) AS purchase_cents
         FROM ev v JOIN ev p ON v.user_id = p.user_id
           AND v.event_type = 'view' AND p.event_type = 'purchase'
           AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
         ORDER BY v.user_id, view_id, purchase_id""",
    "q79_asof_join" ->
      s"""WITH $evCte,
         p AS (SELECT user_id, ts, event_id AS purchase_id,
             CAST(round(value*100) AS BIGINT) AS purchase_cents
           FROM ev WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts, event_id AS view_id
           FROM ev WHERE event_type = 'view')
         SELECT p.user_id, p.purchase_id, v.view_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS wait_us,
           p.purchase_cents
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND v.ts < p.ts
         ORDER BY p.user_id, purchase_id""",
    // session_window splits at gap >= 30 min (merge requires starting
    // strictly inside the previous window) — hence >= in the oracle,
    // vs > in the lag-based sessionsSql; no event pair in the testdata
    // sits exactly on the boundary, checked per scale factor.
    "q78_session_windows" ->
      s"""WITH $evCte,
         e AS (SELECT *, lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM ev),
         f AS (SELECT *, CASE WHEN prev_us IS NULL
             OR epoch_us(ts) - prev_us >= 1800000000
           THEN 1 ELSE 0 END AS new_sess FROM e),
         g AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
           FROM f)
         SELECT user_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           $sumCents AS sum_value_cents
         FROM g GROUP BY user_id, sess_id ORDER BY user_id, session_start""")
}
