package graft.ner

/** Entity-label encoding transcodes (reference semantic:
  * CoNLLDocumentReaderAndWriter.entitySubclassify, /root/reference/src/edu/
  * stanford/nlp/sequences/CoNLLDocumentReaderAndWriter.java:100-195, and
  * deEndify :255-283). All pure functions over a label sequence — they run
  * inside the same partition-local closures as tagging.
  *
  * Styles: IO (plain class labels, our training default), IOB1 (B- only when
  * adjacent same-type entities touch), IOB2 (every entity starts with B-),
  * IOE1/IOE2 (E- marks ends, mirror of IOB1/2), SBIEO (S- singleton, B-
  * begin, I- inside, E- end).
  */
object LabelEncodings {

  private val bg = "O"

  private def spans(io: Seq[String]): Seq[(Int, Int, String)] = {
    val out = Vector.newBuilder[(Int, Int, String)]
    var i = 0
    while (i < io.length) {
      if (io(i) != bg) {
        var j = i + 1
        while (j < io.length && io(j) == io(i)) j += 1
        out += ((i, j, io(i)))
        i = j
      } else i += 1
    }
    out.result()
  }

  /** IO -> chosen encoding. `adjacentSameType` spans are what distinguish
    * IOB1/IOE1 from IOB2/IOE2. NOTE: IO input cannot represent two ADJACENT
    * same-type entities (they merge), matching the reference's behavior when
    * reading IO-labeled data.
    */
  def fromIO(io: Seq[String], style: String): Seq[String] = {
    val out = Array.fill(io.length)(bg)
    for ((s, e, t) <- spans(io)) {
      style.toUpperCase match {
        case "IO" =>
          for (i <- s until e) out(i) = t
        case "IOB2" =>
          out(s) = "B-" + t
          for (i <- s + 1 until e) out(i) = "I-" + t
        case "IOB1" => // B- only needed at boundary with preceding same type (never in IO input)
          for (i <- s until e) out(i) = "I-" + t
        case "IOE2" =>
          for (i <- s until e - 1) out(i) = "I-" + t
          out(e - 1) = "E-" + t
        case "IOE1" =>
          for (i <- s until e) out(i) = "I-" + t
        case "SBIEO" =>
          if (e - s == 1) out(s) = "S-" + t
          else {
            out(s) = "B-" + t
            for (i <- s + 1 until e - 1) out(i) = "I-" + t
            out(e - 1) = "E-" + t
          }
        case other => throw new IllegalArgumentException(s"unknown style $other")
      }
    }
    out.toSeq
  }

  /** Any prefixed encoding (IOB1/2, IOE1/2, SBIEO, or bare IO) -> IO class
    * labels (reference semantic: the "back conversion" the reader applies
    * before training; deEndify for IOE).
    */
  def toIO(labels: Seq[String]): Seq[String] =
    labels.map { l =>
      if (l == bg) bg
      else if (l.length > 2 && l.charAt(1) == '-' && "BIES".indexOf(l.charAt(0)) >= 0) l.substring(2)
      else l
    }

  /** Span equality across encodings: decode both to (start,end,type) sets. */
  def spansOf(labels: Seq[String]): Set[(Int, Int, String)] = {
    val io = toIO(labels)
    // boundaries from prefixes when present
    val out = Set.newBuilder[(Int, Int, String)]
    var i = 0
    while (i < labels.length) {
      if (io(i) != bg) {
        val t = io(i)
        var j = i + 1
        def isBoundary(k: Int): Boolean = {
          val l = labels(k)
          (l.startsWith("B-") || l.startsWith("S-")) ||
            (labels(k - 1).startsWith("E-") || labels(k - 1).startsWith("S-"))
        }
        while (j < labels.length && io(j) == t && !isBoundary(j)) j += 1
        out += ((i, j, t))
        i = j
      } else i += 1
    }
    out.result()
  }
}
