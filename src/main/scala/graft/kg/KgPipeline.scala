package graft.kg

import graft.ner.{NerModel, Tagger}
import graft.pipeline.{Mention, Triple, Turn}
import graft.text.{SentenceSplitter, Tokenizer}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** End-to-end KG construction front half: transcripts → tags → mention spans
  * → (subj, pred, obj) triples, in ONE shuffle-free pass over `Dataset[Turn]`
  * (tokenize/tag/span/triple all happen partition-locally with the model
  * broadcast). Downstream linking/canonicalization (EntityLink,
  * ConnectedComponents, GraphMaterializer) add the only shuffles in the DAG.
  */
object KgPipeline {

  def triples(turns: Dataset[Turn], model: Broadcast[NerModel]): Dataset[Triple] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions { it =>
      val m = model.value
      val bg = m.classIndex(m.backgroundIndex)
      it.flatMap { turn =>
        if (turn.text == null || turn.text.isEmpty) Iterator.empty
        else {
          val sentences = SentenceSplitter.split(Tokenizer.tokenize(turn.text))
          sentences.iterator.zipWithIndex.flatMap { case (sent, sentIdx) =>
            val words = sent.map(_.word)
            val answers = m.tag(words).toIndexedSeq
            val mentions = Tagger.spansOfSentence(
              turn.conv_id, turn.turn_idx, sentIdx, sent, answers, turn.text, bg)
            TripleRules.fromSentence(mentions, sent.map(t => (t.word, t.begin)))
          }
        }
      }
    }
  }

  /** Triples AND mention spans from ONE tagging pass (round-2 review finding:
    * q35 tagged the corpus once for triples and again for mentions; tagging
    * dominates the stage, so consumers needing both must share the pass).
    * The per-turn (triples, mentions) rows are pinned via localCheckpoint so
    * the two returned views replay pinned blocks instead of re-tagging —
    * TaggerGroupingSpec asserts exactly one scan of the input.
    */
  def triplesAndMentions(turns: Dataset[Turn], model: Broadcast[NerModel])
      : (Dataset[Triple], Dataset[Mention]) = {
    val spark = turns.sparkSession
    import spark.implicits._
    val both: Dataset[(Seq[Triple], Seq[Mention])] = turns.mapPartitions { it =>
      val m = model.value
      val bg = m.classIndex(m.backgroundIndex)
      it.map { turn =>
        if (turn.text == null || turn.text.isEmpty) (Seq.empty[Triple], Seq.empty[Mention])
        else {
          val sentences = SentenceSplitter.split(Tokenizer.tokenize(turn.text))
          val perSent = sentences.zipWithIndex.map { case (sent, sentIdx) =>
            val words = sent.map(_.word)
            val answers = m.tag(words).toIndexedSeq
            val mentions = Tagger.spansOfSentence(
              turn.conv_id, turn.turn_idx, sentIdx, sent, answers, turn.text, bg)
            (TripleRules.fromSentence(mentions, sent.map(t => (t.word, t.begin))), mentions)
          }
          (perSent.flatMap(_._1), perSent.flatMap(_._2))
        }
      }
    }.localCheckpoint()
    (both.flatMap(_._1), both.flatMap(_._2))
  }

  /** Gold triples from pre-tokenized gold turns (for eval / the differential
    * harness): runs the SAME span fold + rules over gold labels.
    */
  def goldTriples(convId: String, turnIdx: Int, words: IndexedSeq[String], labels: IndexedSeq[String]): Seq[Triple] = {
    // reconstruct offsets from the detokenized text so spans match the tagger's
    val text = graft.pipeline.Transcripts.detokenize(words)
    val toks = Tokenizer.tokenize(text)
    require(toks.length == words.length, s"detokenize round-trip mismatch: $words vs ${toks.map(_.word)}")
    val sentences = SentenceSplitter.split(toks)
    var off = 0
    sentences.zipWithIndex.flatMap { case (sent, sentIdx) =>
      val sentLabels = (off until off + sent.length).map(labels)
      off += sent.length
      val mentions = Tagger.spansOfSentence(convId, turnIdx, sentIdx, sent, sentLabels, text, "O")
      TripleRules.fromSentence(mentions, sent.map(t => (t.word, t.begin)))
    }
  }
}
