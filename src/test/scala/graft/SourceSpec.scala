package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the file-source queries depend on. */
class SourceSpec extends AnyFunSuite {
  import TestSpark._

  test("documents.text is newline- and tab-free (q64/q95 line-format invariant)") {
    // a text file holds LINES: q95's one-file-per-document round-trip
    // (and q64's tab-separated hop) silently fragment any document
    // containing a newline (or tab, for q64). The synthetic corpus is
    // clean; if a future fixture regeneration breaks that, fail HERE
    // with a clear message instead of as an oracle hash mismatch.
    val dirty = Tables.documents(spark, sf)
      .filter(col("text").contains("\n") || col("text").contains("\r") ||
        col("text").contains("\t"))
      .count()
    assert(dirty === 0L,
      s"$dirty documents contain newline/tab — the q64/q95 text-file " +
        "round-trips require single-line, tab-free documents")
  }

  test("q95 emits exactly the even-id half of the corpus, path-joined") {
    val df = queries.SourceQueries.q95PathDrivenSource(spark, sf)
    val got = df.select("doc_id").collect().map(_.getLong(0))
    assert(got.nonEmpty && got.forall(_ % 2 == 0),
      "q95 must emit only path-table-listed (even-id) documents")
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 0).count()
    assert(got.length.toLong === expected)
  }

  test("q99 serves q95's fetch from the compacted store: identical " +
      "rows, a fraction of the files") {
    val viaStore = queries.SourceQueries.q99StoreFetch(spark, sf)
      .collect().map(r => (r.getLong(0), String.valueOf(r.get(1)), r.getString(2)))
    val viaFiles = queries.SourceQueries.q95PathDrivenSource(spark, sf)
      .collect().map(r => (r.getLong(0), String.valueOf(r.get(1)), r.getString(2)))
    assert(viaStore.nonEmpty && viaStore.sameElements(viaFiles),
      "store-served fetch must be byte-identical to the file-served one")
    // the operational point: the store holds the whole corpus in far
    // fewer files than one-per-document
    val (storePath, _) = queries.SourceQueries.compactedStore(spark, sf)
    val nShardFiles = new java.io.File(storePath).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .count(_.getName.endsWith(".parquet"))
    val nDocs = Tables.documents(spark, sf).count()
    assert(nShardFiles > 0 && nShardFiles * 10 <= nDocs,
      s"$nShardFiles shard files for $nDocs docs — compaction missing")
  }

  test("an id-localized store fetch prunes to its shard range") {
    // shards are id-ordered, so a range request resolves (via the
    // manifest) to a contiguous shard set; joining the store on that
    // broadcast list triggers dynamic partition pruning — the scan
    // must not read every shard
    val (storePath, manifestPath) =
      queries.SourceQueries.compactedStore(spark, sf)
    val requests = Tables.documents(spark, sf)
      .filter(col("doc_id") < 100).select("doc_id")
    val wanted = spark.read.parquet(manifestPath)
      .join(requests, Seq("doc_id")).select("shard_id").distinct()
    val fetched = spark.read.parquet(storePath)
      .join(broadcast(wanted), Seq("shard_id"))
      .join(requests, Seq("doc_id"), "left_semi")
    val plan = fetched.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"range fetch must prune shards dynamically; plan:\n$plan")
    assert(fetched.count() === requests.count())
  }

  test("appended shards land strictly after the base store's shards") {
    // q101's append-only contract: a new batch may only CREATE shard
    // partitions past the existing max — never land inside (or renumber)
    // a base shard. If the offset math drifted, batches would interleave.
    val inv = queries.SourceQueries.q101StoreAppend(spark, sf).collect()
    def sid(r: org.apache.spark.sql.Row) =
      r.getAs[Number]("shard_id").longValue()
    val base = inv.filter(_.getAs[Long]("batch") == 0L).map(sid)
    val appended = inv.filter(_.getAs[Long]("batch") == 1L).map(sid)
    assert(base.nonEmpty && appended.nonEmpty)
    assert(appended.min > base.max,
      s"append interleaved with base: base=${base.toSeq}, new=${appended.toSeq}")
    assert(inv.map(sid).distinct.length == inv.length, "duplicate shard ids")
  }
}
