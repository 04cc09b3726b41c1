package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for
  * suffix stripping", Program 14(3) 1980) — the same published
  * algorithm the reference ships a private copy of
  * (`utils/nlp/PorterStemmer.scala`, used via the `stem` UDF at
  * `matching/analyser/TextEntitiesAnalyser.scala:275-279`). This is an
  * independent implementation from the paper's rule tables.
  *
  * Used as a Scala UDF: stemming is a per-token pure function with
  * data-dependent branching, which neither Spark SQL built-ins nor
  * DuckDB (offline, no fts extension) can express — so stem-bearing
  * queries are covered by golden-case specs rather than SQL oracles.
  */
object PorterStemmer {

  /** True if s(i) is a consonant under Porter's definition: not a/e/i/o/u,
    * and 'y' only when at position 0 or preceded by a vowel. */
  private def isCons(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** m = number of VC sequences in the word (the "measure"). */
  private def measure(s: String): Int = {
    var m = 0
    var i = 0
    val n = s.length
    while (i < n && isCons(s, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(s, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && isCons(s, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(s: String): Boolean =
    (0 until s.length).exists(i => !isCons(s, i))

  /** *d: ends with a double consonant. */
  private def endsDoubleCons(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isCons(s, s.length - 1)

  /** *o: ends cvc where the final c is not w, x or y. */
  private def endsCvc(s: String): Boolean =
    s.length >= 3 && isCons(s, s.length - 3) && !isCons(s, s.length - 2) &&
      isCons(s, s.length - 1) && !"wxy".contains(s.charAt(s.length - 1))

  /** If `s` ends with `suffix` and the stem's measure > `mGt`, replace
    * the suffix; returns None when the suffix doesn't match at all
    * (caller should try the next rule), Some(unchanged) when it matches
    * but the condition fails (rule list is exhausted for this step). */
  private def rule(s: String, suffix: String, repl: String, mGt: Int): Option[String] =
    if (!s.endsWith(suffix)) None
    else {
      val stem = s.substring(0, s.length - suffix.length)
      Some(if (measure(stem) > mGt) stem + repl else s)
    }

  private def firstRule(s: String, rules: Seq[(String, String, Int)]): String =
    rules.iterator.flatMap { case (suf, rep, m) => rule(s, suf, rep, m) }
      .nextOption().getOrElse(s)

  private val step2Rules = Seq(
    ("ational", "ate", 0), ("tional", "tion", 0), ("enci", "ence", 0),
    ("anci", "ance", 0), ("izer", "ize", 0), ("abli", "able", 0),
    ("alli", "al", 0), ("entli", "ent", 0), ("eli", "e", 0),
    ("ousli", "ous", 0), ("ization", "ize", 0), ("ation", "ate", 0),
    ("ator", "ate", 0), ("alism", "al", 0), ("iveness", "ive", 0),
    ("fulness", "ful", 0), ("ousness", "ous", 0), ("aliti", "al", 0),
    ("iviti", "ive", 0), ("biliti", "ble", 0))

  private val step3Rules = Seq(
    ("icate", "ic", 0), ("ative", "", 0), ("alize", "al", 0),
    ("iciti", "ic", 0), ("ical", "ic", 0), ("ful", "", 0), ("ness", "", 0))

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  def stem(word: String): String = {
    if (word == null || word.length < 3) return if (word == null) null else word
    var s = word

    // Step 1a: plurals.
    if (s.endsWith("sses")) s = s.dropRight(2)
    else if (s.endsWith("ies")) s = s.dropRight(2)
    else if (!s.endsWith("ss") && s.endsWith("s")) s = s.dropRight(1)

    // Step 1b: -ed / -ing.
    if (s.endsWith("eed")) {
      if (measure(s.dropRight(3)) > 0) s = s.dropRight(1)
    } else {
      val stripped =
        if (s.endsWith("ed") && hasVowel(s.dropRight(2))) Some(s.dropRight(2))
        else if (s.endsWith("ing") && hasVowel(s.dropRight(3))) Some(s.dropRight(3))
        else None
      stripped.foreach { t =>
        s = if (t.endsWith("at") || t.endsWith("bl") || t.endsWith("iz")) t + "e"
        else if (endsDoubleCons(t) && !"lsz".contains(t.charAt(t.length - 1))) t.dropRight(1)
        else if (measure(t) == 1 && endsCvc(t)) t + "e"
        else t
      }
    }

    // Step 1c: y -> i when the stem has a vowel.
    if (s.endsWith("y") && hasVowel(s.dropRight(1))) s = s.dropRight(1) + "i"

    // Steps 2-3: suffix rewriting for m > 0.
    s = firstRule(s, step2Rules)
    s = firstRule(s, step3Rules)

    // Step 4: drop the suffix for m > 1 ("ion" needs s/t before it).
    // Only the first matching suffix in scan order is attempted.
    step4Suffixes.find(s.endsWith) match {
      case Some(suf) =>
        val t = s.substring(0, s.length - suf.length)
        if (measure(t) > 1) s = t
      case None if s.endsWith("ion") =>
        val t = s.dropRight(3)
        if (t.nonEmpty && "st".contains(t.charAt(t.length - 1)) && measure(t) > 1)
          s = t
      case None =>
    }
    finish(s)
  }

  /** Steps 5a/5b: final -e and double-l cleanup. */
  private def finish(in: String): String = {
    var s = in
    if (s.endsWith("e")) {
      val t = s.dropRight(1)
      val m = measure(t)
      if (m > 1 || (m == 1 && !endsCvc(t))) s = t
    }
    if (endsDoubleCons(s) && s.endsWith("l") && measure(s) > 1) s = s.dropRight(1)
    s
  }

  /** Column form (Scala UDF: per-token branching, not expressible as
    * built-ins; off the hot path — used on distinct vocab, not corpora). */
  val stemUdf: Column => Column = { c =>
    val u = udf((w: String) => stem(w))
    u(c)
  }
}
