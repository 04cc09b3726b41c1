package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable lemmatizer — the SURVEY §7.4-5 answer to the reference's
  * CoreNLP dependency (`DocumentWordSpecAnalyser2.scala:78,95-107`
  * calls Stanford `lemma()`): exact CoreNLP parity is impossible
  * without its models and license, so the tagger is a trait; the
  * default implementation is a deterministic suffix-rule lemmatizer
  * whose rules are expressible identically in Spark columns and in
  * the DuckDB oracle SQL (both spellings live here, adjacent, like
  * TextFns). A CoreNLP-backed implementation would drop in behind the
  * same trait on a cluster where the dependency exists.
  */
trait Lemmatizer {
  /** Lemma of a lowercase word, as a column expression. */
  def lemma(c: Column): Column
  /** The same mapping as a DuckDB SQL expression over `expr`. */
  def sqlLemma(expr: String): String
}

/** English inflection suffix rules (plural stripping): -ies→y,
  * -sses→ss, plain -s (but not -ss / -us). Deliberately minimal —
  * enough to give the word-spec distance operator real lemma groups —
  * and case-free (inputs are the lowercased token stream). */
object SuffixLemmatizer extends Lemmatizer {

  def lemma(c: Column): Column =
    when(c.endsWith("ies") && length(c) > 4,
        concat(c.substr(lit(1), length(c) - 3), lit("y")))
      .when(c.endsWith("sses"),
        c.substr(lit(1), length(c) - 2))
      .when(c.endsWith("s") && !c.endsWith("ss") && !c.endsWith("us") &&
          length(c) > 3,
        c.substr(lit(1), length(c) - 1))
      .otherwise(c)

  def sqlLemma(e: String): String =
    s"""CASE
        WHEN $e LIKE '%ies' AND length($e) > 4
          THEN substr($e, 1, length($e) - 3) || 'y'
        WHEN $e LIKE '%sses' THEN substr($e, 1, length($e) - 2)
        WHEN $e LIKE '%s' AND $e NOT LIKE '%ss' AND $e NOT LIKE '%us'
          AND length($e) > 3 THEN substr($e, 1, length($e) - 1)
        ELSE $e END"""
}
