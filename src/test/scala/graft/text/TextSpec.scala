package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {

  test("wordShapeDan2 golden pairs (WordShapeClassifier.java:232-265)") {
    val known = Set("cat", "iphone")
    def shape(s: String) = WordShape.dan2(s, known.contains)
    assert(shape("Alice") == "WT-Xx")
    assert(shape("ALICE") == "WT-X")
    assert(shape("the") == "WT-x:3")
    assert(shape("Cat") == "WT-Xx:3k")      // nonLetters=false and "cat" is a known LC word
    assert(shape("cat") == "WT-x:3k")
    assert(shape("dog") == "WT-x:3")
    assert(shape("U.S.") == "WT-X.X.") // len 4 > 3: no :len suffix
    assert(shape("12-34") == "WT-d-d")
    assert(shape("3.5") == "WT-d.d:3")
    assert(shape("iPhone") == "WT-xXxk")
    assert(shape("") == "WT-:0")
    assert(shape("a_b") == "WT-x:3k" || shape("a_b") == "WT-x:3") // '_' maps to x; nonLetters stays false
  }

  test("timex fix lowercases month/day words only (ObjectBankWrapper.java:115-128)") {
    assert(WordShape.fixWord("Monday") == "monday")
    assert(WordShape.fixWord("DECEMBER") == "december")
    assert(WordShape.fixWord("May") == "may")
    assert(WordShape.fixWord("Mayor") == "Mayor")
    assert(WordShape.fixWord("Berlin") == "Berlin")
  }

  test("tokenizer: offsets are exact and invertible") {
    val text = "Alice Johnson (CEO of Acme Corp.) visited Berlin."
    val toks = Tokenizer.tokenize(text)
    for (t <- toks if !Set("-LRB-", "-RRB-", "``", "''").contains(t.word))
      assert(text.substring(t.begin, t.end) == t.word, s"offset mismatch for ${t.word}")
    assert(toks.map(_.word) == Vector("Alice", "Johnson", "-LRB-", "CEO", "of", "Acme", "Corp.",
      "-RRB-", "visited", "Berlin", "."))
  }

  test("tokenizer: contractions, quotes, numbers") {
    assert(Tokenizer.tokenize("don't stop").map(_.word) == Vector("do", "n't", "stop"))
    assert(Tokenizer.tokenize("Alice's dog").map(_.word) == Vector("Alice", "'s", "dog"))
    assert(Tokenizer.tokenize("""He said "hi" twice.""").map(_.word) ==
      Vector("He", "said", "``", "hi", "''", "twice", "."))
    assert(Tokenizer.tokenize("rate is 3.5, up 1,000 since 10:30").map(_.word) ==
      Vector("rate", "is", "3.5", ",", "up", "1,000", "since", "10:30"))
    assert(Tokenizer.tokenize("Dr. Smith met Mr. Jones.").map(_.word) ==
      Vector("Dr.", "Smith", "met", "Mr.", "Jones", "."))
  }

  test("sentence splitter: final punctuation + boundary followers") {
    val toks = Tokenizer.tokenize("""It works. Really? Yes (see docs.) "Done."""")
    val sents = SentenceSplitter.split(toks).map(_.map(_.word))
    assert(sents.length == 4, sents.toString)
    assert(sents(0) == Vector("It", "works", "."))
    assert(sents(1) == Vector("Really", "?"))
    assert(sents(3).last == "''")
  }

  test("ner features: exact template strings at a boundary position") {
    import graft.ner.NerFeatures
    val words = Vector("Alice", "runs")
    val toks = words.map(w => NerFeatures.Tok(w, WordShape.dan2(w, _ => false)))
    val gs = NerFeatures.featuresAt(toks, 0)
    val g0 = gs(0).toSet
    // ngrams of <Alice>, prefix/suffix only, len>=2
    assert(g0.contains("#<A#|C") && g0.contains("#<Alice>#|C") && g0.contains("#e>#|C"))
    assert(!g0.contains("#li#|C")) // mid ngram excluded
    assert(g0.contains("-PW|C"))   // pad word is ""
    assert(g0.contains("runs-NW|C"))
    assert(g0.contains("Alice--W-PW|C") && g0.contains("Alice-runs-W-NW|C"))
    assert(g0.contains("WT-Xx-TYPE|C"))
    assert(g0.contains("null-PTYPE|C")) // reference get() null quirk at pad
    assert(g0.contains("WT-x-NTYPE|C"))
    assert(g0.contains("...WT-Xx-PPW_CTYPE|C")) // pWord "" has length<=3
    assert(g0.contains("-DISJP|C") && g0.contains("runs-DISJN|C"))
    val g1 = gs(1).toSet
    assert(g1.contains("PSEQ|CpC") && g1.contains("Alice-PSEQW|CpC"))
    assert(g1.contains("-PSEQpS|CpC"))           // getString pad quirk: ""
    assert(g1.contains("-WT-Xx-TYPES|CpC"))
    assert(g1.contains("WT-x-TNS1|CpC"))
    val g2 = gs(2).toSet
    assert(g2.contains("PPSEQ|CpCp2C"))
    assert(g2.contains("null-null-WT-Xx-TYPETYPES|CpCp2C"))
  }
}
