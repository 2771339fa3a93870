package graft.pipeline

import graft.TrainedTranscriptsCrf
import graft.ner.Tagger
import graft.text.Tokenizer
import org.scalatest.funsuite.AnyFunSuite

/** Quality + invariant evidence behind the q56-q61 trained-transcripts
  * oracles. The hash gate certifies ENGINE == ORACLE bit-exactly; these
  * tests pin (a) that the trained model is a GOOD tagger (the certificate is
  * about production-shaped inference, not a degenerate fit) and (b) the
  * Scala-side mirror of the q57 oracle's character-offset reconstruction —
  * the detokenize rendering + spacing running sum equals the REAL
  * tokenizer's invertible offsets on every transcript token.
  */
class TrainedTranscriptsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("trained-transcripts model: 4 classes, background O, held-out gold accuracy") {
    import spark.implicits._
    val m = TrainedTranscriptsCrf.model(spark)
    assert(m.classIndex.sorted.toSeq == Seq("LOCATION", "O", "ORGANIZATION", "PERSON"))
    assert(m.classIndex(m.backgroundIndex) == "O")
    // held-out conversations 300-499: never seen in training (corpus = convs 0-299)
    val gold = Transcripts.synthGold(spark, 500L).filter($"conv_id" >= "conv00000300").collect()
    var ok = 0L; var tot = 0L
    val bc = spark.sparkContext.broadcast(m)
    gold.foreach { g =>
      val tags = bc.value.tag(g.words.toIndexedSeq)
      g.labels.indices.foreach { i => tot += 1; if (tags(i) == g.labels(i)) ok += 1 }
    }
    val acc = ok.toDouble / tot
    info(f"held-out token accuracy = $acc%.5f over $tot tokens")
    assert(acc > 0.99, s"trained transcripts model degenerate: $acc")
  }

  test("q57 offset oracle invariant: detokenize rendering+spacing sum == real tokenizer offsets") {
    val noSpaceBefore = Set(".", ",", "?", "!", ";", ":", "''", "-RRB-", "-RSB-", "n't")
    val render = Map("-LRB-" -> "(", "-RRB-" -> ")", "-LSB-" -> "[", "-RSB-" -> "]",
      "``" -> "\"", "''" -> "\"")
    var turnsChecked = 0
    for (cid <- 0L until 300L; tix <- 0 until Transcripts.numTurns(42L, cid)
         if !Transcripts.isToolTurn(42L, cid, tix)) {
      val (words, _) = Transcripts.turnTokens(42L, cid, tix)
      val text = Transcripts.detokenize(words)
      val toks = Tokenizer.tokenize(text)
      assert(toks.map(_.word) == words, s"round-trip drift at conv$cid/$tix")
      var pos = 0
      var prev: String = null
      toks.zip(words).foreach { case (t, w) =>
        val rw = render.getOrElse(w, w)
        val sp = if (prev == null) 0
          else if (noSpaceBefore(w) || w.startsWith("'")) 0
          else if (prev == "``" || prev == "-LRB-" || prev == "-LSB-") 0
          else 1
        pos += sp
        assert(t.begin == pos && t.end == pos + rw.length,
          s"offset drift at conv$cid/$tix '$w': tokenizer [${t.begin},${t.end}) vs sum [$pos,${pos + rw.length})")
        assert(text.substring(t.begin, t.end) == rw)
        pos += rw.length
        prev = w
      }
      turnsChecked += 1
    }
    info(s"offsets exact on $turnsChecked turns")
  }

  test("trained-transcripts spans/triples flow the REAL pipeline shapes") {
    import org.apache.spark.sql.functions.col
    val bc = spark.sparkContext.broadcast(TrainedTranscriptsCrf.model(spark))
    val ments = Tagger.mentions(Transcripts.synth(spark, 60L), bc)
    val trips = graft.kg.KgPipeline.triples(Transcripts.synth(spark, 60L), bc)
    val nM = ments.count(); val nT = trips.count()
    assert(nM > 0 && nT > 0)
    // every mention surface must be cut from the turn text at its offsets
    val bad = ments.toDF().join(
        Transcripts.synth(spark, 60L).toDF(), Seq("conv_id", "turn_idx"))
      .filter(col("surface") =!= org.apache.spark.sql.functions.expr(
        "substring(text, begin_char + 1, end_char - begin_char)"))
      .count()
    assert(bad == 0L, s"$bad mentions whose surface != text.substring(begin,end)")
  }
}
