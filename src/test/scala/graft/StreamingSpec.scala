package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Watermark / late-data semantics that the AvailableNow oracle runs
  * cannot show: in append mode only watermark-closed windows emit,
  * state for them is dropped, and data later than the watermark is
  * discarded. Driven with a MemoryStream so batch boundaries are
  * explicit. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("append mode emits only watermark-closed windows and drops late data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = EventStream.windowedAgg(
      in.toDF().toDF("ts", "event_type", "value"),
      width = "10 minutes", watermark = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      // batch 1: two events in the 10:00 window
      in.addData((ts(1), "a", 1.0), (ts(4), "a", 2.0))
      q.processAllAvailable()
      assert(spark.table("wm_test").count() == 0,
        "window 10:00 must not emit while watermark < 10:10")
      // batch 2: event at 10:21 -> watermark advances to 10:16,
      // closing the 10:00 and 10:10 windows
      in.addData((ts(21), "a", 4.0))
      q.processAllAvailable()
      val closed = spark.table("wm_test")
        .select(col("wstart").cast("string"), col("n_events"),
          col("sum_value_cents")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(closed == Set(("2026-01-01 10:00:00", 2L, 300L)),
        s"got $closed")
      // batch 3: late event at 10:02 (before watermark 10:16) is dropped
      in.addData((ts(2), "a", 100.0))
      q.processAllAvailable()
      assert(spark.table("wm_test").count() == 1,
        "late data behind the watermark must be discarded")
    } finally q.stop()
  }

  test("stream-stream interval join matches within the bound across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long, Long)]
    val buys = MemoryStream[(Timestamp, Long, Long)]
    val v = views.toDF().toDF("view_ts", "user_id", "view_id")
      .withWatermark("view_ts", "1 hour")
    val b = buys.toDF().toDF("purchase_ts", "purchase_user", "purchase_id")
      .withWatermark("purchase_ts", "1 hour")
    val q = v.join(b,
        col("user_id") === col("purchase_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"))
      .select("user_id", "view_id", "purchase_id")
      .writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      // view arrives in batch 1; its purchase only in batch 2 — the
      // buffered view state must still join it
      views.addData((ts(1), 7L, 100L))
      q.processAllAvailable()
      buys.addData((ts(5), 7L, 200L))  // +4 min: inside the bound
      buys.addData((ts(31), 7L, 201L)) // +30 min: outside the bound
      buys.addData((ts(5), 8L, 202L))  // other user: no matching view
      q.processAllAvailable()
      val got = spark.table("ssj_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((7L, 100L, 200L)), s"got $got")
    } finally q.stop()
  }

  test("streaming dedup emits each key once across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val q = in.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      in.addData((ts(1), 1L), (ts(2), 1L), (ts(3), 2L))
      q.processAllAvailable()
      in.addData((ts(4), 1L), (ts(5), 3L)) // 1 is a cross-batch dup
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("checkpointed file-sink stream resumes exactly-once across restarts") {
    import spark.implicits._
    // run 1 drains the first file through a checkpointed append sink;
    // a second file arrives; run 2 restarts FROM THE CHECKPOINT and
    // must process only the new file — every row exactly once, the
    // recovery contract a production ingest relies on
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    def writeBatch(ids: Range, tag: String): Unit =
      ids.map(i => (i.toLong, tag)).toDF("id", "tag")
        .coalesce(1).write.mode("append").parquet(srcDir)
    writeBatch(0 until 50, "first")
    val schema = spark.read.parquet(srcDir).schema
    def drainOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainOnce()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst === 50L, s"first drain wrote $afterFirst rows")
    writeBatch(100 until 130, "second")
    drainOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() === 80L,
      "restart must process ONLY the new file (no reprocessing)")
    assert(out.groupBy("id").count().filter(col("count") > 1).count() === 0L,
      "no row may appear twice across the restart")
  }

  test("a directory-shaped events table streams in place, matching batch") {
    // Spark-written tables are DIRECTORIES of part files; the single-file
    // staging path (hard link) must not be taken for them — Files.copy on
    // a directory stages an empty dir and the stream silently reads 0
    // rows (the sf0.3 replica regression).
    val tmp = java.nio.file.Files.createTempDirectory("graft_dir_events")
      .toString
    Tables.events(spark, TestSpark.sf)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val streamed = EventStream.windowedCountsOnce(spark, tmp)
      .select(col("wstart").cast("string"), col("event_type"),
        col("n_events"), col("sum_value_cents"))
      .collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, tmp)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.functions.Exact.cents(col("value")))
          .as("sum_value_cents"))
      .select(col("w.start").cast("string"), col("event_type"),
        col("n_events"), col("sum_value_cents"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty, "directory-shaped stream read 0 rows")
    assert(streamed == batch)
  }

  test("update-mode CDC appends only changed keys; reconstruction matches batch") {
    // the q155 contract the AvailableNow single-batch drain cannot
    // show: with two explicit micro-batches, the second epoch's
    // changelog append holds ONLY the users batch 2 touched, and the
    // latest-epoch-wins reconstruction still equals the batch snapshot
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val out = java.nio.file.Files
      .createTempDirectory("graft_cdc_update").toString + "/log"
    val q = EventStream.compact(
        in.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        batch.withColumn("epoch_id", lit(epoch))
          .write.mode("append").parquet(out)
      }
      .start()
    try {
      // batch 1: users 1, 2, 3
      val b1 = Seq(
        (1L, ts(1), 100L, "view", 1.0), (1L, ts(2), 101L, "click", 2.0),
        (2L, ts(3), 102L, "view", 3.0), (3L, ts(4), 103L, "purchase", 4.0))
      in.addData(b1: _*)
      q.processAllAvailable()
      // batch 2: touches only user 2 (and a new user 9)
      val b2 = Seq(
        (2L, ts(10), 104L, "purchase", 5.0), (9L, ts(11), 105L, "view", 6.0))
      in.addData(b2: _*)
      q.processAllAvailable()
      val log = spark.read.parquet(out)
      val lastEpoch = log.agg(max("epoch_id")).as[Long].head()
      val changed = log.filter(col("epoch_id") === lastEpoch)
        .select("user_id").as[Long].collect().toSet
      assert(changed == Set(2L, 9L),
        s"update mode must emit only the keys batch 2 changed, got $changed")
      val reconstructed = EventStream.snapshotFromLog(log)
        .orderBy("user_id").collect().map(_.toSeq).toList
      val batchSnap = EventStream.compact(
          (b1 ++ b2).toDF("user_id", "ts", "event_id", "event_type", "value"))
        .orderBy("user_id").collect().map(_.toSeq).toList
      assert(reconstructed == batchSnap,
        "latest-epoch-wins reconstruction must equal the batch snapshot")
      // foreachBatch is at-least-once for side-effecting sinks: a
      // crashed-then-retried epoch appends its rows TWICE. The log
      // schema makes that harmless — a replayed epoch's rows are
      // byte-identical (same epoch_id, same aggregate state), and
      // max(struct) reconstruction is idempotent under duplicates
      val replayed = log.unionByName(log.filter(col("epoch_id") === lastEpoch))
      val afterReplay = EventStream.snapshotFromLog(replayed)
        .orderBy("user_id").collect().map(_.toSeq).toList
      assert(afterReplay == batchSnap,
        "an at-least-once epoch replay must not change the reconstruction")
      // log COMPACTION invariance: a maintenance job that rewrites the
      // growing changelog as its own snapshot (stamped with the last
      // epoch) must leave reconstruction unchanged — this is what
      // bounds the log at 100 TB (rewrite O(keys), not O(history))
      val compacted = EventStream.snapshotFromLog(log)
        .withColumn("epoch_id", lit(lastEpoch))
      val afterCompaction = EventStream.snapshotFromLog(compacted)
        .orderBy("user_id").collect().map(_.toSeq).toList
      assert(afterCompaction == batchSnap,
        "log compaction must preserve the reconstructed snapshot")
    } finally q.stop()
  }
}
