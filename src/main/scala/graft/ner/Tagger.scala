package graft.ner

import graft.pipeline.{Mention, TaggedToken, Turn}
import graft.text.{RawToken, SentenceSplitter, Tokenizer}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed NER tagging: the reference's per-document classify loop
  * (CRFClassifier.classifyMaxEnt, /root/reference/src/edu/stanford/nlp/ie/crf/
  * CRFClassifier.java:685-717) re-shaped as a shuffle-free `mapPartitions`
  * over typed `Dataset[Turn]` with the model broadcast once.
  *
  * Scale design: the inference unit is one turn (each sentence decoded
  * independently), so tagging is embarrassingly parallel — NO shuffle, NO
  * groupBy — and scales linearly with input splits. Cross-turn state is not
  * needed by the conllNoTags feature set; per-conversation document assembly
  * (for e.g. occurrence-pattern features) would add exactly one shuffle via
  * `groupByKey(conv_id).flatMapSortedGroups`, documented in SURVEY.md §2.6.
  */
object Tagger {

  /** Tokenize + sentence-split + Viterbi-tag each turn. */
  def tagTurns(turns: Dataset[Turn], model: Broadcast[NerModel]): Dataset[TaggedToken] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions { it =>
      val m = model.value
      it.flatMap { turn =>
        if (turn.text == null || turn.text.isEmpty) Iterator.empty
        else {
          val sentences = SentenceSplitter.split(Tokenizer.tokenize(turn.text))
          sentences.iterator.zipWithIndex.flatMap { case (sent, sentIdx) =>
            val words = sent.map(_.word)
            val answers = m.tag(words)
            sent.iterator.zipWithIndex.map { case (tok, i) =>
              TaggedToken(turn.conv_id, turn.turn_idx, sentIdx, i, tok.word, tok.begin, tok.end, answers(i))
            }
          }
        }
      }
    }
  }

  /** Collapse per-token answers into mention spans with character offsets.
    * Reference semantic (AbstractSequenceClassifier.classifyToCharacterOffsets,
    * :473-516): a span extends while the answer is unchanged; ANY label change
    * — including entity-type to entity-type adjacency — closes the span.
    * Pure per-sentence fold; runs inside the same partition as tagging.
    */
  def spansOfSentence(
      convId: String, turnIdx: Int, sentIdx: Int,
      toks: IndexedSeq[RawToken], answers: IndexedSeq[String],
      text: String, background: String): Vector[Mention] = {
    val out = Vector.newBuilder[Mention]
    var i = 0
    val n = toks.length
    while (i < n) {
      val a = answers(i)
      if (a != background) {
        var j = i + 1
        while (j < n && answers(j) == a) j += 1
        val begin = toks(i).begin
        val end = toks(j - 1).end
        out += Mention(convId, turnIdx, sentIdx, a, begin, end, text.substring(begin, end))
        i = j
      } else i += 1
    }
    out.result()
  }

  /** Conversation-grouped tagging: assemble each conversation's turns in
    * stable (conv_id, turn_idx) order and tag them inside one group closure —
    * the north-star `groupByKey(conv_id).flatMapSortedGroups` shape. The
    * decode unit stays the sentence, so under the conllNoTags feature set the
    * output is IDENTICAL to the shuffle-free `mentions` path (asserted in
    * TaggerGroupingSpec); this path is where conversation-scoped state
    * (occurrence-pattern features, cross-turn consistency priors) plugs in,
    * at the cost of exactly one shuffle.
    */
  def mentionsByConversation(turns: Dataset[Turn], model: Broadcast[NerModel]): Dataset[Mention] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.groupByKey(_.conv_id).flatMapSortedGroups(Seq($"turn_idx".asc): _*) { (_, it) =>
      val m = model.value
      val bg = m.classIndex(m.backgroundIndex)
      it.flatMap { turn =>
        if (turn.text == null || turn.text.isEmpty) Iterator.empty
        else {
          val sentences = SentenceSplitter.split(Tokenizer.tokenize(turn.text))
          sentences.iterator.zipWithIndex.flatMap { case (sent, sentIdx) =>
            val answers = m.tag(sent.map(_.word)).toIndexedSeq
            spansOfSentence(turn.conv_id, turn.turn_idx, sentIdx, sent, answers, turn.text, bg)
          }
        }
      }
    }
  }

  /** Tag turns and emit mentions directly (single pass, still shuffle-free). */
  def mentions(turns: Dataset[Turn], model: Broadcast[NerModel]): Dataset[Mention] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions { it =>
      val m = model.value
      it.flatMap { turn =>
        if (turn.text == null || turn.text.isEmpty) Iterator.empty
        else {
          val sentences = SentenceSplitter.split(Tokenizer.tokenize(turn.text))
          sentences.iterator.zipWithIndex.flatMap { case (sent, sentIdx) =>
            val words = sent.map(_.word)
            val answers = m.tag(words).toIndexedSeq
            spansOfSentence(turn.conv_id, turn.turn_idx, sentIdx, sent, answers, turn.text, m.classIndex(m.backgroundIndex))
          }
        }
      }
    }
  }
}
