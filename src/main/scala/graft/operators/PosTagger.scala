package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable part-of-speech tagger — the second half of the SURVEY
  * §7.4-5 CoreNLP replacement (the reference filters word-spec and
  * instrument-model words to an allowed POS set,
  * `DocumentWordSpecAnalyser2.scala:190,218`,
  * `AdvancedInstrumentAnalyser.scala:560-607`). A CoreNLP-backed
  * tagger would drop in behind the same trait on a cluster where the
  * dependency exists; the default is a deterministic suffix heuristic
  * over single lowercase words with identical Spark-column and DuckDB
  * spellings.
  */
trait PosTagger {
  /** Coarse tag (NOUN/VERB/ADJ/ADV/DET) of a lowercase word. */
  def tag(c: Column): Column
  /** The same mapping as a DuckDB SQL expression over `expr`. */
  def sqlTag(expr: String): String
}

/** Context-free suffix heuristic. Deliberately coarse: determiners by
  * list, adverbs by -ly, verbs by verbal suffixes, adjectives by
  * adjectival suffixes, NOUN otherwise — the reference's allowed set
  * (FW, MD, the NN and VB families, RP, PDT, UH) maps to
  * {NOUN, VERB} here. */
object SuffixPosTagger extends PosTagger {

  val allowed: Seq[String] = Seq("NOUN", "VERB")

  def tag(c: Column): Column =
    when(c.isin("the", "a", "an", "this", "that"), "DET")
      .when(c.endsWith("ly"), "ADV")
      .when(c.endsWith("ing") || c.endsWith("ed") || c.endsWith("ize") ||
        c.endsWith("ise") || c.endsWith("ate"), "VERB")
      .when(c.endsWith("ous") || c.endsWith("ful") || c.endsWith("ive") ||
        c.endsWith("less"), "ADJ")
      .otherwise("NOUN")

  def sqlTag(e: String): String =
    s"""CASE
        WHEN $e IN ('the', 'a', 'an', 'this', 'that') THEN 'DET'
        WHEN $e LIKE '%ly' THEN 'ADV'
        WHEN $e LIKE '%ing' OR $e LIKE '%ed' OR $e LIKE '%ize'
          OR $e LIKE '%ise' OR $e LIKE '%ate' THEN 'VERB'
        WHEN $e LIKE '%ous' OR $e LIKE '%ful' OR $e LIKE '%ive'
          OR $e LIKE '%less' THEN 'ADJ'
        ELSE 'NOUN' END"""
}
