package graft.ner

import graft.pipeline.{SparkTestSession, Transcripts}
import org.scalatest.funsuite.AnyFunSuite

/** Pins byte-identity between the string feature path (training) and the
  * hashing fast path (inference): same feature ids, same order, same tags.
  */
class FeatureParitySpec extends AnyFunSuite {

  test("fnv streaming hash equals whole-string hash") {
    for (s <- Seq("", "a", "#<Alice>#|C", "WT-Xx-...-PCNTYPE|C", "--PSEQpcDS|CpC"))
      assert(NerFeaturesFast.fnv(s) == graft.ops.Hashing.fnv1a64(s), s)
  }

  test("encodeFast equals encode on 500 generated turns") {
    val model = NerModels.default(SparkTestSession.spark).value
    var positions = 0
    for (conv <- 0L until 120L; t <- 0 until Transcripts.numTurns(7L, conv)) {
      val (words, _) = Transcripts.turnTokens(7L, conv, t)
      val slow = model.encode(model.preprocess(words))
      val fast = model.encodeFast(words)
      assert(slow.length == fast.length)
      for (pos <- slow.indices; g <- 0 until 3) {
        assert(slow(pos)(g).toSeq == fast(pos)(g).toSeq,
          s"conv=$conv t=$t pos=$pos g=$g words=$words\nslow=${slow(pos)(g).toSeq}\nfast=${fast(pos)(g).toSeq}")
        positions += 1
      }
    }
    assert(positions > 1000)
  }

  test("giant tokens (>2048 chars) tag without scratch-buffer overflow and keep parity") {
    // Round-1 review finding: fixed 4096-entry scratch buffers overflowed on
    // tokens >= ~2030 chars (the ngram family emits ~2x token-length hashes;
    // the tokenizer places no bound on alphanumeric run length). The buffers
    // now grow on demand; parity with the string path must hold throughout.
    val model = NerModels.default(SparkTestSession.spark).value
    val giant = "x" * 2500 + "7f" * 10 // 2520-char pseudo-base64 blob
    val words = Vector("Alice", "Johnson", "pasted", giant, "into", "the", "chat", ".")
    val slow = model.encode(model.preprocess(words))
    val fast = model.encodeFast(words)
    for (pos <- slow.indices; g <- 0 until 3)
      assert(slow(pos)(g).toSeq == fast(pos)(g).toSeq, s"pos=$pos g=$g")
    val tags = model.tag(words) // must not throw
    assert(tags.length == words.length)
    assert(tags(0) == "PERSON" && tags(1) == "PERSON")
    // and an even longer one straight through tag()
    assert(model.tag(Vector("see", "a" * 9000, ".")).length == 3)
  }

  test("tagging via fast path matches gold on held-out turns") {
    val model = NerModels.default(SparkTestSession.spark).value
    var correct = 0L; var total = 0L
    for (conv <- 2000L until 2080L; t <- 0 until Transcripts.numTurns(43L, conv)) {
      val (words, labels) = Transcripts.turnTokens(43L, conv, t)
      val got = model.tag(words)
      for (i <- words.indices) { if (got(i) == labels(i)) correct += 1; total += 1 }
    }
    assert(correct.toDouble / total >= 0.97, s"$correct/$total")
  }
}
