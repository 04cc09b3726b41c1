package graft.operators

import java.util.regex.Pattern

/** Dictionary-driven word classifier — the reference's highest-value
  * entity extractor after exact DOI matching (consumed by its formula
  * pipeline): every whitespace-split word is normalized then classified
  * against broadcast dictionaries (english/names/cities/countries/
  * instrument codes), shape rules (short word, number, email, url, DOI,
  * IP) and, for still-unknown words, a chemical-formula detector built
  * from an element-symbol regex battery with digit/letter-ratio and
  * blacklist vetoes.
  *
  * Semantics re-derived from
  * `utils/nlp/FormulaAnalyser/service/WordService.java:34-420`,
  * `FormulaAnalyserService.java:24-44` and the `Word` entity
  * (normalize = ONE pass of the strip rules, not a fixpoint; a word
  * acquiring any type loses `unknown` and is then never formula-tested;
  * suffix strips require the word to be strictly longer than the
  * suffix while prefix strips allow equality). Quirks are reproduced
  * deliberately — e.g. the element alternation fuses "LuHf" into one
  * token (so neither Lu nor Hf matches alone) and omits the element
  * "Er"-series gaps of the original list; parity matters more than
  * chemistry here.
  *
  * Everything is driver/executor-pure Scala over broadcast-small
  * dictionaries: the intended plan classifies the DISTINCT vocabulary
  * (orders of magnitude smaller than the corpus) and semi-joins the
  * result back to the token stream — see NlpQueries.q84.
  */
object WordClassifier {

  /** Broadcast-small dictionary bundle (the reference loads these from
    * resource files at `FormulaAnalyser/service/DictionaryService.java`). */
  case class Dictionaries(
      english: Set[String],
      names: Set[String] = Set.empty,
      cities: Set[String] = Set.empty,
      countries: Set[String] = Set.empty,
      instrumentCodes: Set[String] = Set.empty)

  // exact element alternation of the reference battery (including its
  // fused "LuHf" token), reused by all five formula regexes
  private val El =
    "Uut|Uup|Uus|Uuo|He|Li|Be|Ne|Na|Mg|Al|Si|Cl|Ar|Ca|Sc|Ti|Cr|Mn|Fe|Co|Ni|" +
    "Cu|Zn|Ga|Ge|As|Se|Br|Kr|Rb|Sr|Zr|Nb|Mo|Tc|Ru|Rh|Pd|Ag|Cd|In|Sn|Sb|Te|" +
    "Xe|Cs|Ba|La|Ce|Pr|Nd|Pm|Sm|Eu|Gd|Tb|Dy|Ho|Er|Tm|Yb|LuHf|Ta|Re|Os|Ir|" +
    "Pt|Au|Hg|Tl|Pb|Bi|Po|At|Rn|Fr|Ra|Ac|Th|Pa|Np|Pu|Am|Cm|Bk|Cf|Es|Fm|Md|" +
    "No|Lr|Rf|Db|Sg|Bh|Hs|Mt|Ds|Rg|Cn|Fl|Lv|H|B|C|N|O|F|P|S|K|V|Y|I|W|U"

  private val emailRe = Pattern.compile(
    "^[A-Z0-9._%+-]+@[A-Z0-9.-]+\\.[A-Z]{2,6}$", Pattern.CASE_INSENSITIVE)
  private val doiRe = Pattern.compile(
    "(10[.][0-9]{4,}(?:[.][0-9]+)*/(?:(?![\"&\\'<>])\\S)+)")
  private val ipRe = Pattern.compile("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b")
  private val elementRe = Pattern.compile(s"((\\d*)(($El|\\(|\\)|\\*|\\[|\\])\\d*)+)")
  private val fragmentRe = Pattern.compile(s"(($El)\\d{0,3})+")
  private val specialFragmentRe = Pattern.compile(s"(($El)\\d{0,4})+")
  private val oneCharRunRe = Pattern.compile("(HBCNOFPSKVYIWU)+")
  private val isotopeLeadRe = Pattern.compile(s"(\\d{0,3}($El))")
  private val isotopeTailRe = Pattern.compile(s"(($El)\\d{0,3})")
  private val alphaNumRe = Pattern.compile("(\\d|[A-Z]|[a-z])+")
  private val upperRe = Pattern.compile("[A-Z]+")
  // commons-lang NumberUtils.isNumber grammar, to the extent words in a
  // text stream can exercise it: decimal/scientific/hex with Java type
  // qualifiers
  private val numberRe = Pattern.compile(
    "-?(0[xX][0-9a-fA-F]+|(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?[dDfFlL]?)")

  private def ascii(s: String): String = Cleaning.asciiFold(s)

  // the reference's explicit control-character set (not all of
  // 0x00-0x1F: it keeps e.g. 0x0B-0x0D and 0x18-0x1C); hoisted —
  // normalize runs once per distinct word
  private val ctl: Set[Int] = (0x00 to 0x07).toSet ++ (0x10 to 0x17) ++
    Set(0x0E, 0x0F, 0x1E, 0x1D, 0x1F, 0x08)

  /** One pass of the reference's strip rules over the ASCII-folded
    * word. Suffix strips fire only when the word is strictly longer
    * than the suffix; prefix strips also fire on exact equality. */
  def normalize(raw: String): String = {
    var w = ascii(raw)
    def dropEnd(suffix: String): Unit =
      if (w.length > suffix.length && w.endsWith(suffix))
        w = w.substring(0, w.length - suffix.length)
    def dropStart(prefix: String): Unit =
      if (w.length >= prefix.length && w.startsWith(prefix))
        w = w.substring(prefix.length)
    Seq("-", "\\", ",", ".", ":", ";", "'s").foreach(dropEnd)
    Seq("'", "\"", "^", "{", "}", "/").foreach(dropStart)
    Seq("-", "\\", ",", ".", ":", ";").foreach(dropStart)
    Seq("'", "\"").foreach(dropEnd)
    w = w.filterNot(c => ctl(c.toInt))
    if (w.startsWith("(") && w.endsWith(")") && w.length > 1 &&
        w.count(_ == '(') == 1 && w.count(_ == ')') == 1)
      w = w.substring(1, w.length - 1)
    if (w.startsWith("[") && w.endsWith("]") && w.length > 1)
      w = w.substring(1, w.length - 1)
    w
  }

  private def findAll(p: Pattern, s: String): Seq[String] = {
    val m = p.matcher(s)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  private def fullyMatches(p: Pattern, s: String): Boolean = p.matcher(s).matches()

  /** Classify a raw word. Returns (cleanWord, distinct sorted types).
    * `blackList` is a plain string checked by CONTAINMENT of the
    * word's alphanumeric skeleton, exactly like the reference (it
    * passes the per-document address string there). */
  def classify(raw: String, dicts: Dictionaries,
               blackList: String = ""): (String, Seq[String]) = {
    val clean = normalize(raw)
    val lower = clean.toLowerCase
    val types = scala.collection.mutable.LinkedHashSet.empty[String]

    if (raw.length > 30) types += "other"
    if (dicts.english.contains(lower)) types += "englishWord"
    if (dicts.names.contains(lower)) types += "name"
    if (dicts.cities.contains(lower)) types += "city"
    if (dicts.countries.contains(lower)) types += "country"
    if (dicts.instrumentCodes.contains(lower)) types += "instrument_code"
    if (clean.length < 5) types += "shortWord"
    val parenStripped = clean.replace("(", "").replace(")", "")
    if (fullyMatches(numberRe, parenStripped) && parenStripped.nonEmpty)
      types += "number"
    // the reference ALSO tries Integer.parseInt, which accepts forms
    // commons-lang isNumber rejects (leading '+', e.g. "+123") — but
    // on the RAW clean word, not the paren-stripped one
    // (WordService.java:182), so "(+5)" is NOT a number there
    else if (clean.nonEmpty &&
        scala.util.Try(Integer.parseInt(clean)).isSuccess)
      types += "number"
    if (clean.exists(c => c == '-' || c == '–' || c == '_')) {
      val parts = clean.split("[-|–|_]")
      if (parts.nonEmpty && parts.forall(p => dicts.english.contains(p.toLowerCase))) {
        types += "composedWord"
        types += "englishWord"
      }
    }
    if (emailRe.matcher(clean).matches()) types += "email"
    if (clean.contains("http://") || clean.contains("https://")) types += "url"
    if (doiRe.matcher(clean).find()) types += "doi"
    if (ipRe.matcher(clean).matches()) types += "ip"

    // formula detection runs only while the word is still untyped
    if (types.isEmpty && isFormula(clean, blackList)) types += "formula"

    (clean, types.toSeq.sorted match {
      case Seq() => Seq("unknown")
      case ts => ts
    })
  }

  /** The element-battery decision: several detectors may mark the word
    * as a potential formula; a veto chain then rejects false positives
    * (all-uppercase non-element words, forbidden characters, short
    * skeletons, unbalanced parens, lowercase lead, blacklisted
    * skeletons, digit-heavy codes like postcodes). */
  private def isFormula(clean: String, blackList: String): Boolean = {
    val alphaNum = findAll(alphaNumRe, clean).mkString
    var potential = false

    // full formula, e.g. YBa2Cu3O6: the whole word is element+count
    // fragments; an all-uppercase word must additionally be a run of
    // the one-letter element string
    if (fullyMatches(fragmentRe, clean)) {
      if (fullyMatches(upperRe, clean)) {
        if (fullyMatches(oneCharRunRe, clean)) potential = true
      } else potential = true
    }

    // composed formula, e.g. (La0.63Ca0.37)MnO3: distinct element
    // fragments must cover > 2/3 of the word
    val fragments = findAll(fragmentRe, clean)
      .filter(f => fullyMatches(elementRe, f)).toSet
    if (fragments.toSeq.map(_.length).sum > clean.length * 2 / 3) potential = true

    // formula with special chars: same over the alphanumeric skeleton
    // with up-to-4-digit counts, covering > 3/4
    val specialFragments = findAll(specialFragmentRe, alphaNum)
      .filter(f => fullyMatches(elementRe, f)).toSet
    if (specialFragments.toSeq.map(_.length).sum > alphaNum.length * 3 / 4)
      potential = true

    // isotopes, e.g. 647Pb / Pb647
    if (fullyMatches(isotopeLeadRe, clean)) potential = true
    if (fullyMatches(isotopeTailRe, clean)) potential = true

    // veto: fully-uppercase words whose letters are not all one-letter
    // element symbols (BUNSEKI), or uppercase words with <= 4 chars
    val upperLen = findAll(upperRe, clean).mkString.length
    if (upperLen == alphaNum.length) {
      val upperFormulaLen = findAll(oneCharRunRe, clean).mkString.length
      if (upperFormulaLen < alphaNum.length) potential = false
      if (alphaNum.length <= 4) potential = false
    }

    // veto: forbidden characters / substrings
    val forbidden = Seq("!", "?", "§", "ù", "%", "£", "à", "@", "ç", "#",
      "€", "é", "=", "&", "III", "II", "000", "$")
    if (forbidden.exists(clean.contains)) potential = false

    // veto: short skeleton, unbalanced parens, lowercase first letter
    if (alphaNum.length < 4) potential = false
    if (clean.count(_ == '(') != clean.count(_ == ')')) potential = false
    if (alphaNum.nonEmpty && alphaNum.charAt(0).isLower) potential = false

    // veto: blacklisted skeleton (e.g. postcodes from the address line)
    if (blackList.contains(alphaNum) && alphaNum.nonEmpty) potential = false

    // veto: more digits than letters (+1 per digit run, keeping Ur235)
    val digits = alphaNum.count(_.isDigit)
    val letters = alphaNum.count(_.isLetter)
    val digitRuns = alphaNum.split("[A-Z]|[a-z]+").count(_.exists(_.isDigit))
    if (digits > letters + digitRuns) potential = false

    potential
  }
}
