package graft.ner

import graft.pipeline.{SparkTestSession, Transcripts}
import graft.train.Trainer
import org.scalatest.funsuite.AnyFunSuite

class TrueCasingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("case labels mirror the reference's patterns") {
    import TrueCasing.caseLabel
    assert(caseLabel("the") == "LOWER")
    assert(caseLabel("don't") == "LOWER")
    assert(caseLabel("NASA") == "UPPER")
    assert(caseLabel("U.S.") == "UPPER")
    assert(caseLabel("Alice") == "INIT_UPPER")
    // startUpper is greedy in the reference: leading-capital mixed case is
    // INIT_UPPER (truecasing it is lossy — "Mcdonald" — by upstream design)
    assert(caseLabel("McDonald") == "INIT_UPPER")
    assert(caseLabel("iPhone") == "O") // mixed case NOT starting uppercase
    assert(caseLabel("42") == "O")
    assert(caseLabel(".") == "O")
  }

  test("trained truecaser restores case on held-out lowercased turns") {
    import spark.implicits._
    // cased training sentences from the synthetic generator (names, orgs,
    // sentence-initial words) -> (lowercased words, case labels)
    val train = Transcripts.synthGold(spark, 300L, seed = 31L)
      .map(g => TrueCasing.toLabeledDoc(g.words))
    val model = Trainer.train(spark, train, Trainer.Config(maxIterations = 80))
    assert(model.classIndex.toSet == Set("O", "LOWER", "UPPER", "INIT_UPPER"))

    var ok = 0L; var total = 0L
    val misses = Vector.newBuilder[String]
    for (conv <- 9000L until 9150L; t <- 0 until Transcripts.numTurns(31L, conv)
         if !Transcripts.isToolTurn(31L, conv, t)) {
      val (words, _) = Transcripts.turnTokens(31L, conv, t)
      val restored = TrueCasing.truecase(model, words.map(_.toLowerCase))
      for (i <- words.indices) {
        // mixed-case originals are unrecoverable by design; grade the rest
        if (TrueCasing.caseLabel(words(i)) != "O") {
          if (restored(i) == words(i)) ok += 1
          else misses += s"'${words(i)}' -> '${restored(i)}'"
          total += 1
        }
      }
    }
    val acc = ok.toDouble / total
    info(f"truecase restoration accuracy = $acc%.4f over $total recoverable tokens")
    assert(acc >= 0.95, s"acc $acc; sample misses: ${misses.result().take(10).mkString(", ")}")
  }
}
