package graft.ner

import graft.pipeline.TaggedToken

/** The reference's three plain-text sink styles (PlainTextDocumentReaderAndWriter,
  * /root/reference/src/edu/stanford/nlp/sequences/PlainTextDocumentReaderAndWriter.java:
  * slashTags :181-199, standoff XML :202-232, inlineXML :235-325), re-expressed
  * as pure per-turn formatting functions usable as Dataset transforms.
  */
object OutputFormats {

  private val bg = "O"

  /** word/TAG pairs separated by spaces: `Alice/PERSON visited/O ...` */
  def slashTags(tokens: Seq[TaggedToken]): String =
    tokens.map(t => s"${t.word}/${t.answer}").mkString(" ")

  /** One token per line with char offsets: `Alice PERSON 0 5` (standoff). */
  def standoff(tokens: Seq[TaggedToken]): String =
    tokens.map(t => s"${t.word}\t${t.answer}\t${t.begin_char}\t${t.end_char}").mkString("\n")

  /** Inline XML over the ORIGINAL text using char offsets, entity spans
    * collapsed on label change: `<PERSON>Alice Johnson</PERSON> visited ...`
    */
  def inlineXml(text: String, tokens: Seq[TaggedToken]): String = {
    val sb = new StringBuilder
    var cursor = 0
    var i = 0
    val ts = tokens.sortBy(t => (t.sent_idx, t.token_idx))
    while (i < ts.length) {
      val t = ts(i)
      if (t.answer == bg) i += 1
      else {
        var j = i + 1
        while (j < ts.length && ts(j).answer == t.answer && ts(j).sent_idx == t.sent_idx) j += 1
        val begin = t.begin_char
        val end = ts(j - 1).end_char
        sb.append(text.substring(cursor, begin))
        sb.append('<').append(t.answer).append('>')
        sb.append(text.substring(begin, end))
        sb.append("</").append(t.answer).append('>')
        cursor = end
        i = j
      }
    }
    sb.append(text.substring(cursor))
    sb.toString
  }
}
