package graft.ner

import graft.pipeline.{SparkTestSession, TaggedToken, Transcripts}
import org.scalatest.funsuite.AnyFunSuite

class LabelEncodingsSpec extends AnyFunSuite {
  val io = Seq("O", "PERSON", "PERSON", "O", "ORGANIZATION", "O", "LOCATION")

  test("IO -> IOB2/IOE2/SBIEO and back") {
    assert(LabelEncodings.fromIO(io, "IOB2") ==
      Seq("O", "B-PERSON", "I-PERSON", "O", "B-ORGANIZATION", "O", "B-LOCATION"))
    assert(LabelEncodings.fromIO(io, "IOE2") ==
      Seq("O", "I-PERSON", "E-PERSON", "O", "E-ORGANIZATION", "O", "E-LOCATION"))
    assert(LabelEncodings.fromIO(io, "SBIEO") ==
      Seq("O", "B-PERSON", "E-PERSON", "O", "S-ORGANIZATION", "O", "S-LOCATION"))
    for (style <- Seq("IO", "IOB1", "IOB2", "IOE1", "IOE2", "SBIEO"))
      assert(LabelEncodings.toIO(LabelEncodings.fromIO(io, style)) == io, style)
  }

  test("spansOf is encoding-invariant") {
    val want = LabelEncodings.spansOf(io)
    for (style <- Seq("IOB2", "IOE2", "SBIEO"))
      assert(LabelEncodings.spansOf(LabelEncodings.fromIO(io, style)) == want, style)
    assert(want == Set((1, 3, "PERSON"), (4, 5, "ORGANIZATION"), (6, 7, "LOCATION")))
  }
}

class OutputFormatsSpec extends AnyFunSuite {
  private def toks(text: String, answers: Seq[String]): Seq[TaggedToken] = {
    val raw = graft.text.Tokenizer.tokenize(text)
    raw.zipWithIndex.map { case (t, i) =>
      TaggedToken("c", 0, 0, i, t.word, t.begin, t.end, answers(i))
    }
  }

  test("slashTags / standoff / inlineXML render the reference styles") {
    val text = "Alice Johnson visited Berlin."
    val tt = toks(text, Seq("PERSON", "PERSON", "O", "LOCATION", "O"))
    assert(OutputFormats.slashTags(tt) ==
      "Alice/PERSON Johnson/PERSON visited/O Berlin/LOCATION ./O")
    assert(OutputFormats.standoff(tt).linesIterator.next() == "Alice\tPERSON\t0\t5")
    assert(OutputFormats.inlineXml(text, tt) ==
      "<PERSON>Alice Johnson</PERSON> visited <LOCATION>Berlin</LOCATION>.")
  }
}

class ConfidenceSpec extends AnyFunSuite {
  test("tagWithConfidence: viterbi labels with calibrated marginals") {
    val model = NerModels.default(SparkTestSession.spark).value
    val (words, labels) = Transcripts.turnTokens(5L, 123L, 0)
    val out = model.tagWithConfidence(words)
    assert(out.map(_._1).toSeq == model.tag(words).toSeq)
    assert(out.forall { case (_, p) => p > 0.0 && p <= 1.0 + 1e-9 })
    // a well-trained model on in-distribution data should be confident
    assert(out.count(_._2 > 0.9) >= words.length / 2)
  }
}
