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

  /** One reader document (one sentence): original cased tokens, the
    * lowercased words the CRF sees, case labels, and the reader's
    * UnknownAnnotation values ("true"/"false").
    */
  final case class TcDoc(orig: Vector[String], lowerWords: Vector[String],
      labels: Vector[String], unknowns: Vector[String])

  /** The reader's full corpus pass (TrueCasingDocumentReaderAndWriter
    * .getIterator, TrueCasingDocumentReaderAndWriter.java:45-171): `<TEXT>`
    * blocks then `<TXT>` blocks, PTB-tokenized; SGML tokens split documents;
    * sentence-split. The seen-once bookkeeping is per BLOCK over each
    * block's DISTINCT lowercased words: a word lands in `wordsSeenOnce` iff
    * it appears in exactly one block (:78-88,114-124); the annotation loop
    * then marks UnknownAnnotation = "true" iff `wordsSeenOnce` holds the
    * word (:159) — so "unknown" means block-count == 1 over THIS file, both
    * at train and at test time (the test read recomputes the sets over the
    * test file).
    */
  def readCorpus(text: String): Vector[TcDoc] = {
    import graft.sources.RecordIterators
    import graft.text.{RawToken, SentenceSplitter, Tokenizer}
    val sgml = java.util.regex.Pattern.compile("<[^>]*>")
    val sentences = Vector.newBuilder[Vector[RawToken]]
    val seenOnce = collection.mutable.HashSet.empty[String]
    val seenMultiple = collection.mutable.HashSet.empty[String]
    def block(content: String): Unit = {
      val toks = Tokenizer.tokenize(content)
      // per-block distinct lowercased words feed the seen-once update;
      // note the reference adds the word BEFORE the SGML check (:61-62), so
      // SGML token text counts toward the sets even though it never reaches
      // a document
      val words = toks.iterator.map(_.word.toLowerCase).toSet
      val doc = Vector.newBuilder[RawToken]
      var any = false
      for (t <- toks) {
        if (sgml.matcher(t.word).matches()) {
          val d = doc.result()
          if (d.nonEmpty) { sentences ++= SentenceSplitter.split(d); }
          // rebuild
          doc.clear(); any = false
        } else { doc += t; any = true }
      }
      val d = doc.result()
      if (d.nonEmpty) sentences ++= SentenceSplitter.split(d)
      for (w <- words) {
        if (seenMultiple.contains(w)) ()
        else if (seenOnce.contains(w)) { seenOnce.remove(w); seenMultiple.add(w) }
        else seenOnce.add(w)
      }
    }
    RecordIterators.xmlRecords(text, "TEXT", keepInternalTags = false,
      keepDelimitingTags = false).foreach(block)
    RecordIterators.xmlRecords(text, "TXT", keepInternalTags = false,
      keepDelimitingTags = false).foreach(block)
    sentences.result().map { sent =>
      val orig = sent.map(_.word)
      TcDoc(orig, orig.map(_.toLowerCase), orig.map(caseLabel),
        orig.map(w => if (seenOnce.contains(w.toLowerCase)) "true" else "false"))
    }
  }

  /** Tag one reader document with a trained `-useUnknown` case model: the
    * CRF sees the lowercased words plus the UnknownAnnotation values.
    */
  def tagDoc(model: NerModel, doc: TcDoc): Array[String] =
    model.tag(doc.lowerWords, IndexedSeq.fill(doc.lowerWords.length)(null: String),
      unknowns = doc.unknowns)
}
