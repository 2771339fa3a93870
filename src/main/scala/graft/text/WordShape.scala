package graft.text

/** Word-shape functions.
  *
  * `dan2UseLC` reproduces the reference's WORDSHAPEDAN2USELC behavior
  * (/root/reference/src/edu/stanford/nlp/process/WordShapeClassifier.java:232-265):
  * map chars to classes (d = digit, x = lowercase or '_', X = uppercase,
  * everything else itself), collapse runs of the same class char, append
  * ":len" for words of length <= 3, and append "k" when the word is all
  * letters and its lowercase form is a known lower-case corpus word.
  */
object WordShape {

  def dan2(s: String, knownLC: String => Boolean): String = {
    val sb = new java.lang.StringBuilder("WT-")
    var lastM = '~'
    var nonLetters = false
    val len = s.length
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      var m = c
      if (Character.isDigit(c)) m = 'd'
      else if (Character.isLowerCase(c) || c == '_') m = 'x'
      else if (Character.isUpperCase(c)) m = 'X'
      if (m != 'x' && m != 'X') nonLetters = true
      if (m != lastM) sb.append(m)
      lastM = m
      i += 1
    }
    if (len <= 3) sb.append(':').append(len)
    if (knownLC != null && !nonLetters && knownLC(s.toLowerCase)) sb.append('k')
    sb.toString
  }

  /** Static-forwarder-friendly entry point (no function argument) for
    * Catalyst codegen (graft.functions.GraftShape).
    */
  def dan2NoLC(s: String): String = dan2(s, null)

  private val monthDay = java.util.regex.Pattern.compile(
    "Monday|Tuesday|Wednesday|Thursday|Friday|Saturday|Sunday|January|February|March|April|May|June|July|August|September|October|November|December",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  /** Timex normalization: lowercase month/day words (reference semantic:
    * ObjectBankWrapper.fix, /root/reference/src/edu/stanford/nlp/sequences/ObjectBankWrapper.java:115-128,
    * with normalizeTimex on and normalizeTerms off as in the conllNoTags preset).
    * NOTE: shapes are computed on the ORIGINAL word before this fix, matching
    * ObjectBankWrapper.doBasicStuff ordering (:131-155).
    */
  def fixWord(word: String): String =
    if (monthDay.matcher(word).matches()) word.toLowerCase else word
}
