package graft.text

/** A token with invertible character offsets into the source text
  * (reference semantic: invertible PTB tokenization keeping Begin/EndPosition,
  * /root/reference/src/edu/stanford/nlp/process/PTBTokenizer.java:88-90 and
  * ling/CoreAnnotations.java:355-359). `word` may be a normalized form
  * (-LRB-, ``, ...); begin/end always index the original string.
  */
final case class RawToken(word: String, begin: Int, end: Int)

/** Penn-Treebank-subset tokenizer, scanning (not regex) so that character
  * offsets are exact. Covers the token classes that occur in conversation
  * transcripts: words, numbers (with internal . , :), punctuation,
  * contractions (n't, 's, 'll, ...), bracket and quote normalization
  * (reference semantic: PTBLexer normalizations,
  * /root/reference/src/edu/stanford/nlp/process/PTBLexer.java:6650-6669).
  *
  * Abbreviation periods (Mr., Dr., Inc., U.S., ...) stay attached to the word,
  * matching PTB behavior for common titles/corporate suffixes.
  */
object Tokenizer {

  private val abbrevs: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "sen", "rep", "gen", "gov", "sgt", "col",
    "inc", "corp", "co", "ltd", "jr", "sr", "st", "vs", "etc", "dept",
    "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept", "oct", "nov", "dec",
    "u.s", "u.k", "u.n", "a.m", "p.m", "e.g", "i.e")

  /** SGML/XML/HTML tag spans (reference pattern `<[^>]*>`,
    * PlainTextDocumentReaderAndWriter.java:31; StripTagsProcessor semantics).
    */
  private val SgmlTag = java.util.regex.Pattern.compile("<[^>]*>")

  /** Tokenize with SGML tags removed — the plain-text reader path
    * (PlainTextDocumentReaderAndWriter.java:56-70 folds tag tokens into
    * whitespace; StripTagsProcessor.java deletes them). Offsets of surviving
    * tokens still index the ORIGINAL text, so character-offset spans and
    * invertibility are preserved; text inside tags never fuses with text
    * outside (each untagged segment tokenizes independently, as the reference
    * lexer would have produced a tag-token boundary there).
    */
  def tokenizeStripSgml(text: String): Vector[RawToken] = {
    val m = SgmlTag.matcher(text)
    val out = Vector.newBuilder[RawToken]
    var segStart = 0
    def emit(from: Int, until: Int): Unit =
      if (until > from)
        out ++= tokenize(text.substring(from, until))
          .map(t => RawToken(t.word, t.begin + from, t.end + from))
    while (m.find()) {
      emit(segStart, m.start)
      segStart = m.end
    }
    emit(segStart, text.length)
    out.result()
  }

  def tokenize(text: String): Vector[RawToken] = {
    val out = Vector.newBuilder[RawToken]
    val n = text.length
    var i = 0
    var lastNonSpace = ' '
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) { lastNonSpace = ' '; i += 1 }
      else if (c == '(') { out += RawToken("-LRB-", i, i + 1); lastNonSpace = c; i += 1 }
      else if (c == ')') { out += RawToken("-RRB-", i, i + 1); lastNonSpace = c; i += 1 }
      else if (c == '[') { out += RawToken("-LSB-", i, i + 1); lastNonSpace = c; i += 1 }
      else if (c == ']') { out += RawToken("-RSB-", i, i + 1); lastNonSpace = c; i += 1 }
      else if (c == '{') { out += RawToken("-LCB-", i, i + 1); lastNonSpace = c; i += 1 }
      else if (c == '}') { out += RawToken("-RCB-", i, i + 1); lastNonSpace = c; i += 1 }
      else if (c == '"') {
        val open = lastNonSpace == ' ' || lastNonSpace == '(' || lastNonSpace == '['
        out += RawToken(if (open) "``" else "''", i, i + 1)
        lastNonSpace = c; i += 1
      } else if (Character.isLetterOrDigit(c)) {
        val start = i
        // scan a word/number run; keep internal . , : ' - when flanked by alnum
        var j = i + 1
        while (j < n && {
          val cj = text.charAt(j)
          Character.isLetterOrDigit(cj) || cj == '_' || cj == '-' || cj == '\'' ||
          ((cj == '.' || cj == ',' || cj == ':') && j + 1 < n && Character.isLetterOrDigit(text.charAt(j + 1)))
        }) j = j + 1
        // trailing period attached if abbreviation
        var end = j
        if (j < n && text.charAt(j) == '.') {
          val lw = text.substring(start, j).toLowerCase
          if (abbrevs.contains(lw)) end = j + 1
        }
        var word = text.substring(start, end)
        // split trailing contractions: don't -> do + n't ; Alice's -> Alice + 's
        val contraction = splitContraction(word)
        contraction match {
          case Some(cut) =>
            out += RawToken(word.substring(0, cut), start, start + cut)
            out += RawToken(word.substring(cut), start + cut, end)
          case None =>
            out += RawToken(word, start, end)
        }
        lastNonSpace = text.charAt(end - 1)
        i = end
      } else {
        // punctuation: group repeats of . ! ? - ` '
        val start = i
        var j = i + 1
        if (c == '.' || c == '!' || c == '?' || c == '-' || c == '`' || c == '\'') {
          while (j < n && text.charAt(j) == c) j += 1
        }
        var word = text.substring(start, j)
        if (word == "...") word = "..."
        out += RawToken(word, start, j)
        lastNonSpace = c
        i = j
      }
    }
    out.result()
  }

  private val contractionSuffixes = Seq("n't", "'s", "'m", "'d", "'ll", "'re", "'ve")

  /** Returns the split point for a trailing contraction, if any. */
  private def splitContraction(word: String): Option[Int] = {
    val lw = word.toLowerCase
    contractionSuffixes.collectFirst {
      case suf if lw.endsWith(suf) && lw.length > suf.length => word.length - suf.length
    }
  }
}

/** Groups a token stream into sentences. Sentence-final tokens are . ! ? …;
  * boundary followers (closing quotes/brackets) attach to the sentence they
  * follow (reference semantic: WordToSentenceProcessor,
  * /root/reference/src/edu/stanford/nlp/process/WordToSentenceProcessor.java:94-199).
  */
object SentenceSplitter {
  private val sentFinal = Set(".", "!", "?", "...", "?!", "!?")
  private val followers = Set(")", "]", "\"", "'", "''", "-RRB-", "-RSB-", "-RCB-")

  def split(tokens: Vector[RawToken]): Vector[Vector[RawToken]] = {
    val sentences = Vector.newBuilder[Vector[RawToken]]
    var cur = Vector.newBuilder[RawToken]
    var curNonEmpty = false
    var closing = false // saw a sentence-final token; absorbing followers
    for (t <- tokens) {
      if (closing && followers.contains(t.word)) {
        cur += t
      } else {
        if (closing) { sentences += cur.result(); cur = Vector.newBuilder[RawToken]; curNonEmpty = false; closing = false }
        cur += t
        curNonEmpty = true
        if (sentFinal.contains(t.word)) closing = true
      }
    }
    if (curNonEmpty) sentences += cur.result()
    sentences.result()
  }
}
