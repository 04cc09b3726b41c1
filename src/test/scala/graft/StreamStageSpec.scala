package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamStage

/** Pins the single-file stream-staging contract (StreamStage):
  * stamp-keyed dirs, per-table isolation, stale-stamp sweeping. A
  * regression here either breaks running streams (sweeping a live
  * table) or silently leaks tmp disk across testdata regenerations
  * (the round-6 ADVICE item).
  */
class StreamStageSpec extends AnyFunSuite {
  import TestSpark._

  private def freshSrcDir(): String = {
    val d = Files.createTempDirectory("graft-stagespec").toString
    spark.range(5).toDF("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/stage-tmp")
    val part = Files.list(Paths.get(s"$d/stage-tmp"))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, Paths.get(s"$d/docs.parquet"))
    Files.walk(Paths.get(s"$d/stage-tmp"))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(Files.deleteIfExists(_))
    d
  }

  test("directory-shaped tables are monitored in place") {
    val d = Files.createTempDirectory("graft-stagespec").toString
    spark.range(3).toDF("x").write.mode("overwrite").parquet(s"$d/t.parquet")
    assert(StreamStage.monitoredPath(d, "t") === s"$d/t.parquet")
  }

  test("single-file tables stage once, re-stage on regeneration, and " +
      "sweep the stale stamp") {
    val d = freshSrcDir()
    val first = StreamStage.monitoredPath(d, "docs")
    assert(Files.exists(Paths.get(first, "docs.parquet")),
      "staged file missing")
    assert(StreamStage.monitoredPath(d, "docs") === first,
      "unchanged source must reuse the staged dir")
    // regenerate: same path, different mtime → new stamp
    Files.setLastModifiedTime(Paths.get(s"$d/docs.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(946684800000L))
    val second = StreamStage.monitoredPath(d, "docs")
    assert(second !== first, "regenerated source must get a new stamp")
    assert(!Files.exists(Paths.get(first)),
      "stale stamp dir must be swept")
    assert(Files.exists(Paths.get(second, "docs.parquet")))
  }

  test("staging one table leaves another table's staging untouched") {
    val d = freshSrcDir()
    Files.copy(Paths.get(s"$d/docs.parquet"), Paths.get(s"$d/other.parquet"))
    val docs = StreamStage.monitoredPath(d, "docs")
    val other = StreamStage.monitoredPath(d, "other")
    assert(Files.exists(Paths.get(docs, "docs.parquet")),
      "docs staging must survive other-table staging")
    assert(Files.exists(Paths.get(other, "other.parquet")))
    // force a docs re-stage; other must still survive
    Files.setLastModifiedTime(Paths.get(s"$d/docs.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(946684800000L))
    StreamStage.monitoredPath(d, "docs")
    assert(Files.exists(Paths.get(other, "other.parquet")),
      "re-staging docs must not sweep the other table")
  }
}
