package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DoiStitch, WordClassifier}
import graft.queries.NlpQueries

/** Golden cases for the dictionary word/formula classifier and the
  * ILL-DOI stitcher, each derived by hand from the reference battery
  * rules (`WordService.java:34-420`, `CodeAnalyserService.java:55-186`)
  * — the independent check backing q84/q85's oracles. */
class FormulaSpec extends AnyFunSuite {

  private val dicts = NlpQueries.dicts

  private def types(w: String, blackList: String = ""): Seq[String] =
    WordClassifier.classify(w, dicts, blackList)._2

  test("normalize: strip rules, one pass") {
    assert(WordClassifier.normalize("value's") === "value")
    assert(WordClassifier.normalize("\"quoted\"") === "quoted")
    assert(WordClassifier.normalize("(word)") === "word")
    assert(WordClassifier.normalize("[word]") === "word")
    // two paren pairs: count != 1, no unwrap
    assert(WordClassifier.normalize("(a)(b)") === "(a)(b)")
    assert(WordClassifier.normalize("word,") === "word")
    assert(WordClassifier.normalize("-word") === "word")
    // suffix strip requires word strictly longer than the suffix;
    // prefix strip fires on equality (Word.beginBy/endWith asymmetry)
    assert(WordClassifier.normalize("-") === "")
    assert(WordClassifier.normalize("Café") === "Cafe")
  }

  test("dictionary and shape types") {
    assert(types("table") === Seq("englishWord"))
    assert(types("key") === Seq("englishWord", "shortWord"))
    assert(types("smith") === Seq("name"))
    assert(types("grenoble") === Seq("city"))
    assert(types("france") === Seq("country"))
    assert(types("d22") === Seq("instrument_code", "shortWord"))
    assert(types("12345") === Seq("number"))
    assert(types("1234") === Seq("number", "shortWord"))
    assert(types("3.14159") === Seq("number"))
    assert(types("data-value") === Seq("composedWord", "englishWord"))
    assert(types("alice@example.org") === Seq("email"))
    assert(types("https://example.org/x") === Seq("url"))
    assert(types("10.5291/ILL-DATA.8-76-780") === Seq("doi"))
    assert(types("192.168.0.1") === Seq("ip"))
    assert(types("x" * 31).contains("other"))
    assert(types("zzzzzz") === Seq("unknown"))
  }

  test("formula battery: accepted shapes") {
    assert(types("YBa2Cu3O7") === Seq("formula"), "full formula")
    assert(types("H2SO4") === Seq("formula"), "one-char elements")
    assert(types("La0.63Ca0.37MnO3") === Seq("formula"), "special fragments")
    assert(types("647Pb") === Seq("formula"), "isotope")
    assert(types("(TaSe4)2I") === Seq("formula"), "parenthesised")
  }

  test("formula battery: vetoes") {
    // all-uppercase word whose letters are not a one-char element run
    assert(types("BUNSEKI") === Seq("unknown"))
    // digit-heavy skeleton (the postcode rule)
    assert(types("F-76432") === Seq("unknown"))
    // blacklisted skeleton (per-document address string)
    assert(types("CdTe123", blackList = "CdTe123") === Seq("unknown"))
    assert(types("CdTe123") === Seq("formula"), "same word, no blacklist")
    // forbidden substring
    assert(types("NaCl=KBr") === Seq("unknown"))
    // short alphanumeric skeleton
    assert(types("H2O") === Seq("shortWord"))
    // lowercase first letter never a formula
    assert(types("ybacuo1") === Seq("unknown"))
    // english-dictionary words are never formula-tested
    assert(types("table") === Seq("englishWord"))
  }

  test("q84's oracle list equals the classifier's acceptances") {
    val accepted = NlpQueries.inject.map(_._2).filter(w =>
      WordClassifier.classify(w, dicts, NlpQueries.blackList)._2
        .contains("formula")).sorted
    assert(accepted === NlpQueries.expectedFormulas.sorted)
  }

  test("pluggable lemmatizer and POS tagger goldens") {
    import org.apache.spark.sql.functions.col
    import graft.operators.{SuffixLemmatizer, SuffixPosTagger}
    val spark = TestSpark.spark
    import spark.implicits._
    val words = Seq("queries", "tables", "classes", "misses", "bus",
      "quickly", "running", "organize", "famous", "useful", "the",
      "table", "merge")
    val got = words.toDF("w")
      .select(col("w"), SuffixLemmatizer.lemma(col("w")).as("lemma"),
        SuffixPosTagger.tag(col("w")).as("tag"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got("queries") === ("query", "NOUN"))
    assert(got("tables") === ("table", "NOUN"))
    assert(got("misses") === ("miss", "NOUN"))   // -sses keeps -ss
    assert(got("bus") === ("bus", "NOUN"))        // -us not stripped
    assert(got("quickly") === ("quickly", "ADV"))
    assert(got("running") === ("running", "VERB"))
    assert(got("organize") === ("organize", "VERB"))
    assert(got("famous") === ("famous", "ADJ"))
    assert(got("useful") === ("useful", "ADJ"))
    assert(got("the") === ("the", "DET"))
    assert(got("table") === ("table", "NOUN"))
    assert(got("merge") === ("merge", "NOUN"))
    // trait contract: the SQL spellings exist and carry the same rules
    assert(SuffixLemmatizer.sqlLemma("w").contains("'%ies'"))
    assert(SuffixPosTagger.sqlTag("w").contains("'%ly'"))
  }

  test("ILL-DOI stitching") {
    // the reference's own worked example (CodeAnalyserService comment)
    assert(DoiStitch.analyseIllDoi(
      "bla fldsmfl fdshkfks 10.5291/ILL -DATA.8-76-780 gljfdsjgfklj x")
      === Seq("10.5291/ILL-DATA.8-76-780"))
    // dot-split suffix: regex backtracks to ...-DATA, code appended raw
    assert(DoiStitch.analyseIllDoi("ref 10.5291/ILL-DATA. 8-15-3 end")
      === Seq("10.5291/ILL-DATA8-15-3"))
    // non-ILL DOIs pass through unstitched
    assert(DoiStitch.analyseIllDoi("see 10.1234/x55 tail")
      === Seq("10.1234/x55"))
    // invalid code (leading 0) does not stitch
    assert(DoiStitch.analyseIllDoi("ref 10.5291/ILL -DATA.0-15-3 end")
      === Seq("10.5291/ILL"))
    // proposal-code grammar ("1-1-1" is 5 chars — above the > 4 floor)
    assert(DoiStitch.analyseCode("codes 8-20-766 and CRG-2502 and 1-1-1 x")
      === Seq("8-20-766", "CRG-2502", "1-1-1"))
  }
}
