package graft.kg

import graft.pipeline.{Mention, Triple}

/** Dependency-light predicate-pattern triple extraction between co-occurring
  * mentions (north rule). The SAME deterministic rule is applied to our tags
  * and to the reference classifier's tags in the differential harness, so the
  * P/R comparison measures tagging parity, not rule drift (FIXTURES.md §4).
  *
  * Rule: within one sentence, take mentions in textual order; for each
  * ADJACENT pair (no mention in between), scan the token words strictly
  * between them left to right; the first word that is a trigger for the
  * (subjType, objType) pair selects the predicate; with no trigger the pair
  * yields CO_OCCURS. Pure per-sentence function — executes inside the tagging
  * partition, shuffle-free.
  */
object TripleRules {

  /** (trigger word, subj type, obj type) -> predicate */
  val triggers: Map[(String, String, String), String] = {
    def m(words: Seq[String], st: String, ot: String, pred: String) =
      words.map(w => (w, st, ot) -> pred)
    (m(Seq("works", "joined", "from", "leads", "leave"), "PERSON", "ORGANIZATION", "WORKS_AT") ++
      m(Seq("visited", "traveled", "in", "at", "spoke"), "PERSON", "LOCATION", "LOCATED_IN") ++
      m(Seq("met", "called"), "PERSON", "PERSON", "MET") ++
      m(Seq("opened", "in", "based"), "ORGANIZATION", "LOCATION", "BASED_IN") ++
      m(Seq("acquired"), "ORGANIZATION", "ORGANIZATION", "ACQUIRED")).toMap
  }

  /** Extract triples from one sentence's mentions + tokens.
    *
    * @param tokens (word, begin_char) for every token of the sentence.
    */
  def fromSentence(mentions: Seq[Mention], tokens: Seq[(String, Int)]): Seq[Triple] = {
    val ms = mentions.sortBy(_.begin_char)
    ms.iterator.zip(ms.iterator.drop(1)).map { case (a, b) =>
      val between = tokens.collect {
        case (w, begin) if begin >= a.end_char && begin < b.begin_char => w.toLowerCase
      }
      val pred = between.iterator
        .flatMap(w => triggers.get((w, a.etype, b.etype)))
        .nextOption()
        .getOrElse("CO_OCCURS")
      Triple(a.conv_id, a.turn_idx, a.surface, a.etype, pred, b.surface, b.etype)
    }.toSeq
  }
}
