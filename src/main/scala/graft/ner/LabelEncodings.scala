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

  /** BYTE-exact port of the reference's per-token transcode
    * (CoNLLDocumentReaderAndWriter.entitySubclassify, :100-195), quirks
    * included — differentialed against the compiled reference over all six
    * styles (`RefLabelEncodingSpec`):
    *   - operates only on PREFIXED labels (`X-...`); bare labels (incl. "O")
    *     pass through unchanged;
    *   - the "io" style KEEPS the I- prefix (I-PER, not PER — `toIO` is the
    *     separate training-time collapse);
    *   - `isEndAdjacentSame`'s last disjunct tests the PREVIOUS token's
    *     prefix for 'S' where the next token's was clearly intended
    *     (:141 `pPrefix == 'S'`) — mirrored verbatim;
    *   - an unknown style falls back to "io" (:116-117).
    */
  def entitySubclassify(labels: Seq[String], style: String): Seq[String] = {
    val how = style.toLowerCase match {
      case "iob1" => 0
      case "iob2" => 1
      case "ioe1" => 2
      case "ioe2" => 3
      case "io" => 4
      case "sbieo" => 5
      case _ => 4
    }
    val k = labels.length
    // PaddedList semantics: out-of-range -> a fresh CoreLabel whose answer
    // reads null -> OTHER
    @inline def at(i: Int): String =
      if (i >= 0 && i < k) labels(i) else null
    val out = new Array[String](k)
    var i = 0
    while (i < k) {
      val cAns = labels(i)
      if (cAns.length > 1 && cAns.charAt(1) == '-') {
        val pAns = { val a = at(i - 1); if (a == null) bg else a }
        val nAns = { val a = at(i + 1); if (a == null) bg else a }
        val base = cAns.substring(2)
        val pBase = if (pAns.length > 2) pAns.substring(2) else pAns
        val nBase = if (nAns.length > 2) nAns.substring(2) else nAns
        val prefix = cAns.charAt(0)
        val pPrefix = if (pAns.nonEmpty) pAns.charAt(0) else ' '
        val nPrefix = if (nAns.nonEmpty) nAns.charAt(0) else ' '
        val isStartAdjacentSame = base == pBase &&
          (prefix == 'B' || prefix == 'S' || pPrefix == 'E' || pPrefix == 'S')
        // reference quirk (:141): pPrefix, not nPrefix, in the last disjunct
        val isEndAdjacentSame = base == nBase &&
          (prefix == 'E' || prefix == 'S' || nPrefix == 'B' || pPrefix == 'S')
        val isFirst = base != pBase || cAns.charAt(0) == 'B'
        val isLast = base != nBase || nAns.charAt(0) == 'B'
        out(i) = how match {
          case 0 => if (isStartAdjacentSame) "B-" + base else "I-" + base
          case 1 => if (isFirst) "B-" + base else "I-" + base
          case 2 => if (isEndAdjacentSame) "E-" + base else "I-" + base
          case 3 => if (isLast) "E-" + base else "I-" + base
          case 4 => "I-" + base
          case 5 =>
            if (isFirst && isLast) "S-" + base
            else if (!isFirst && isLast) "E-" + base
            else if (isFirst && !isLast) "B-" + base
            else "I-" + base
        }
      } else out(i) = cAns
      i += 1
    }
    out.toSeq
  }

  /** BYTE-exact port of the reference's write-side back-conversion to IOB1
    * (CoNLLDocumentReaderAndWriter.deEndify, :255-283; applied by
    * printAnswers unless the style is already iob1 or
    * retainEntitySubclassification is set): a prefixed label becomes B-base
    * iff the previous label shares its base AND the current prefix is B or
    * S; every other prefixed label becomes I-base; bare labels pass through.
    * Domain quirk mirrored as a loud error: a PREFIXED label at position 0
    * NPEs in the reference (the pad's null answer hits .length(), :268) —
    * unreachable in its own pipeline because every CoNLL document starts
    * with the -DOCSTART- boundary token labeled "O".
    */
  def deEndify(labels: Seq[String]): Seq[String] =
    labels.zipWithIndex.map { case (cAns, i) =>
      if (cAns.length > 1 && cAns.charAt(1) == '-') {
        require(i > 0,
          "deEndify: prefixed label at position 0 (the reference NPEs here; CoNLL docs start with the boundary token)")
        val pAns = labels(i - 1)
        val base = cAns.substring(2)
        val pBase = if (pAns.length <= 2) pAns else pAns.substring(2)
        val isSecond = base == pBase
        val isStart = cAns.charAt(0) == 'B' || cAns.charAt(0) == 'S'
        if (isSecond && isStart) "B-" + base else "I-" + base
      } else cAns
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
