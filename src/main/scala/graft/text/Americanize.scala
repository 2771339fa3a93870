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

  // word map (converters -> converted, Americanize.java:146-149)
  private val mapping: Map[String, String] = Map(
    "anaesthetic" -> "anesthetic", "analogue" -> "analog", "analogues" -> "analogs",
    "analyse" -> "analyze", "analysed" -> "analyzed", "analysing" -> "analyzing",
    "armoured" -> "armored", "cancelled" -> "canceled", "cancelling" -> "canceling",
    "candour" -> "candor", "capitalise" -> "capitalize", "capitalised" -> "capitalized",
    "capitalisation" -> "capitalization", "centre" -> "center", "chimaeric" -> "chimeric",
    "clamour" -> "clamor", "coloured" -> "colored", "colouring" -> "coloring",
    "defence" -> "defense", "detour" -> "detour", "discolour" -> "discolor",
    "discolours" -> "discolors", "discoloured" -> "discolored", "discolouring" -> "discoloring",
    "encyclopaedia" -> "encyclopedia", "endeavour" -> "endeavor", "endeavours" -> "endeavors",
    "endeavoured" -> "endeavored", "endeavouring" -> "endeavoring", "fervour" -> "fervor",
    "favour" -> "favor", "favours" -> "favors", "favoured" -> "favored",
    "favouring" -> "favoring", "favourite" -> "favorite", "favourites" -> "favorites",
    "fibre" -> "fiber", "fibres" -> "fibers", "finalise" -> "finalize",
    "finalised" -> "finalized", "finalising" -> "finalizing", "flavour" -> "flavor",
    "flavours" -> "flavors", "flavoured" -> "flavored", "flavouring" -> "flavoring",
    "glamour" -> "glamour", "grey" -> "gray", "harbour" -> "harbor", "harbours" -> "harbors",
    "homologue" -> "homolog", "homologues" -> "homologs", "honour" -> "honor",
    "honours" -> "honors", "honoured" -> "honored", "honouring" -> "honoring",
    "honourable" -> "honorable", "humour" -> "humor", "humours" -> "humors",
    "humoured" -> "humored", "humouring" -> "humoring", "kerb" -> "curb",
    "labelled" -> "labeled", "labelling" -> "labeling", "labour" -> "labor",
    "labours" -> "labors", "laboured" -> "labored", "labouring" -> "laboring",
    "leant" -> "leaned", "learnt" -> "learned", "localise" -> "localize",
    "localised" -> "localized", "manoeuvre" -> "maneuver", "manoeuvres" -> "maneuvers",
    "maximise" -> "maximize", "maximised" -> "maximized", "maximising" -> "maximizing",
    "meagre" -> "meager", "minimise" -> "minimize", "minimised" -> "minimized",
    "minimising" -> "minimizing", "modernise" -> "modernize", "modernised" -> "modernized",
    "modernising" -> "modernizing", "misdemeanour" -> "misdemeanor",
    "misdemeanours" -> "misdemeanors", "neighbour" -> "neighbor", "neighbours" -> "neighbors",
    "neighbourhood" -> "neighborhood", "neighbourhoods" -> "neighborhoods",
    "oestrogen" -> "estrogen", "oestrogens" -> "estrogens", "organisation" -> "organization",
    "organisations" -> "organizations", "penalise" -> "penalize", "penalised" -> "penalized",
    "popularise" -> "popularize", "popularised" -> "popularized",
    "popularises" -> "popularizes", "popularising" -> "popularizing",
    "practise" -> "practice", "practised" -> "practiced", "pressurise" -> "pressurize",
    "pressurised" -> "pressurized", "pressurises" -> "pressurizes",
    "pressurising" -> "pressurizing", "realise" -> "realize", "realised" -> "realized",
    "realising" -> "realizing", "realises" -> "realizes", "recognise" -> "recognize",
    "recognised" -> "recognized", "recognising" -> "recognizing", "recognises" -> "recognizes",
    "rumoured" -> "rumored", "rumouring" -> "rumoring", "savour" -> "savor",
    "savours" -> "savors", "savoured" -> "savored", "savouring" -> "savoring",
    "splendour" -> "splendor", "splendours" -> "splendors", "theatre" -> "theater",
    "theatres" -> "theaters", "titre" -> "titer", "titres" -> "titers",
    "travelled" -> "traveled", "travelling" -> "traveling")

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
