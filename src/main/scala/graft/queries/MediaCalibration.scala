package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Multibyte calibration probes for the media family (q46/q75/q83/q90
  * image, q109/q206/q207 audio) — the q205 calibrationFamily pattern
  * applied to byte-exactness (round-14 verdict item: the media
  * oracles went byte-granular — hex(encode(text)) byte extraction —
  * but the driver-generated sf0.01 gate corpus is ASCII, so nothing
  * in the STANDING gate would catch a reintroduced char-indexed
  * spelling; only the ScaleUp fixtures would).
  *
  * A fixed literal doc set at negative doc_ids (no corpus or ScaleUp
  * id — all positive — can collide) carrying 2-, 3- and 4-byte UTF-8
  * sequences is unioned into every media query's input, and each
  * oracle embeds the SAME literals as VALUES. Any char-vs-byte
  * indexing divergence now shifts the sf0.01 gate hash itself:
  * multibyte chars make char positions ≠ byte positions, byte counts
  * ≠ char counts, and the long probe doc crosses frame/block
  * boundaries mid-sequence.
  */
object MediaCalibration {

  /** (doc_id, text): 2-byte (é ï è), 3-byte (CJK), 4-byte (emoji,
    * surrogate pairs on the JVM side — a char-indexed spelling is off
    * by TWO positions per emoji), and a ~560-byte mixed run whose
    * multibyte sequences straddle the 32-byte audio frames, 64-byte
    * video stills, and square image tilings. */
  val docs: Seq[(Long, String)] = Seq(
    -201L -> "café naïve élève",
    -202L -> "世界文字 interleaved ascii",
    -203L -> "😀🚀🌍 emoji run",
    -204L -> ("mix é世😀 " * 40).trim)

  private def frame(s: SparkSession): DataFrame = {
    import s.implicits._
    docs.toDF("doc_id", "text")
  }

  /** The media queries' input: the corpus plus the probe family. */
  def withProbes(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select("doc_id", "text")
      .unionByName(frame(s))

  /** DuckDB relation replacing bare `documents` in the media oracles:
    * the same corpus-plus-probes union, probe literals embedded as
    * VALUES. Aliased `documents` at the call sites so the oracle CTE
    * text is otherwise unchanged. */
  val sqlRelation: String = {
    val vals = docs
      .map { case (id, t) => s"($id, '${t.replace("'", "''")}')" }
      .mkString(", ")
    "(SELECT doc_id, text FROM documents " +
      s"UNION ALL SELECT * FROM (VALUES $vals) calib(doc_id, text))"
  }
}
