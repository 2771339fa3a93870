package graft.ner

import graft.train.LabeledDoc

/** TrueCasing as a sequence-labeling task over the same CRF engine
  * (reference: TrueCasingDocumentReaderAndWriter.java:24-160): each token is
  * labeled by the case pattern of its ORIGINAL form — LOWER / UPPER /
  * INIT_UPPER / O (mixed) per the reference's three regexes — and the word
  * itself is lowercased for feature extraction. A trained truecaser restores
  * case to caseless text (ASR output, user queries) by tagging and mapping
  * labels back to case transforms.
  */
object TrueCasing {

  // the reference's case-class patterns (full-match semantics)
  private val allLower = java.util.regex.Pattern.compile("[^A-Z]*?[a-z]+[^A-Z]*?")
  private val allUpper = java.util.regex.Pattern.compile("[^a-z]*?[A-Z]+[^a-z]*?")
  private val startUpper = java.util.regex.Pattern.compile("[A-Z].*")

  def caseLabel(word: String): String =
    if (allLower.matcher(word).matches()) "LOWER"
    else if (allUpper.matcher(word).matches()) "UPPER"
    else if (startUpper.matcher(word).matches()) "INIT_UPPER"
    else "O"

  /** Cased training sentence -> (lowercased words, case labels). */
  def toLabeledDoc(words: Seq[String]): LabeledDoc =
    LabeledDoc(words.map(_.toLowerCase), words.map(caseLabel))

  /** Invert a predicted case label on a lowercased word. */
  def restoreCase(lowerWord: String, label: String): String = label match {
    case "UPPER" => lowerWord.toUpperCase
    case "INIT_UPPER" if lowerWord.nonEmpty =>
      lowerWord.charAt(0).toUpper +: lowerWord.substring(1)
    case _ => lowerWord // LOWER and O (mixed-case is unrecoverable from a label)
  }

  /** Truecase a lowercased token sequence with a trained case model. */
  def truecase(model: NerModel, lowerWords: IndexedSeq[String]): IndexedSeq[String] = {
    val labels = model.tag(lowerWords)
    lowerWords.indices.map(i => restoreCase(lowerWords(i), labels(i)))
  }
}
