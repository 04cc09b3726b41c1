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
}
