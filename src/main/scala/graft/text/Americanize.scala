package graft.text

/** British -> American spelling normalization (reference semantic:
  * /root/reference/src/edu/stanford/nlp/process/Americanize.java:84-120 with
  * the word/timex tables at :146-160 and suffix patterns at :124-137).
  * Applied by the preprocessing `fix` step when `normalizeTerms` is on
  * (ObjectBankWrapper.java:117-128, with capitalizeTimex=false there since
  * timex words were already lowercased by the month/day rule).
  *
  * Precedence, exactly as the reference: timex capitalization map (when
  * enabled) -> exact word map -> first matching suffix/stem pattern (with
  * its exception guard) -> unchanged. Parity is enforced by a differential
  * test driving the compiled reference's own Americanize.main.
  */
object Americanize {

  // word map (converters -> converted, Americanize.java:146-149) — behavioral
  // DATA, not code: shipped as a resource table so the mapping reads as what
  // it is, a spelling dictionary (includes the identity entries — glamour,
  // detour — that deliberately BLOCK the pattern rewrites)
  private val mapping: Map[String, String] = {
    val in = getClass.getResourceAsStream("/americanize.tsv")
    require(in != null, "americanize.tsv resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { l =>
      val t = l.indexOf('\t'); (l.substring(0, t), l.substring(t + 1))
    }.toMap
    finally src.close()
  }

  // month/day capitalization map, applied only when capitalizeTimex
  // (Americanize.java:152-156; "march" and "may" are deliberately absent)
  private val timexMapping: Map[String, String] =
    Seq("january", "february", "april", "june", "july", "august", "september",
      "october", "november", "december", "monday", "tuesday", "wednesday",
      "thursday", "friday", "saturday", "sunday")
      .map(w => w -> (w.head.toUpper +: w.tail)).toMap

  // stem/suffix patterns with per-pattern exception guards (:124-137); first
  // FIND wins and replaces ALL occurrences, like Matcher.find + replaceAll
  private val pats = Array(
    ("haem(at)?o".r, None, "hem$1o"),
    ("aemia$".r, None, "emia"),
    ("([lL]euk)aem".r, None, "$1em"),
    ("programme(s?)$".r, None, "program$1"),
    ("^([a-z]{3,})our(s?)$".r, Some("glamour|de[tv]our".r), "$1or$2"))

  def americanize(str: String, capitalizeTimex: Boolean = true): String = {
    if (capitalizeTimex && timexMapping.contains(str)) return timexMapping(str)
    mapping.get(str) match {
      case Some(m) => m
      case None =>
        for ((pat, except, rep) <- pats) {
          if (!except.exists(_.findFirstIn(str).isDefined) && pat.findFirstIn(str).isDefined)
            return pat.replaceAllIn(str, rep)
        }
        str
    }
  }

  /** The `fix` preprocessing under normalizeTerms (ObjectBankWrapper.java:117-128):
    * month/day words lowercase (any case), then Americanize WITHOUT timex
    * capitalization. Composes with WordShape.fixWord's normalizeTimex rule.
    */
  def fixWordNormalizeTerms(word: String): String =
    americanize(WordShape.fixWord(word), capitalizeTimex = false)
}
