package graft.text

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.sys.process._

class AmericanizeSpec extends AnyFunSuite {

  test("word map, timex capitalization, and suffix patterns with exceptions") {
    import Americanize.americanize
    // exact map hits
    assert(americanize("colour") == "color") // via ^([a-z]{3,})our(s?)$ actually — map lacks colour
    assert(americanize("favourite") == "favorite")
    assert(americanize("organisation") == "organization")
    assert(americanize("learnt") == "learned")
    assert(americanize("kerb") == "curb")
    // identity map entries BLOCK the pattern path
    assert(americanize("glamour") == "glamour")
    assert(americanize("detour") == "detour")
    // patterns
    assert(americanize("haemoglobin") == "hemoglobin")
    assert(americanize("haematology") == "hematology")
    assert(americanize("anaemia") == "anemia")
    assert(americanize("leukaemia") == "leukemia")
    assert(americanize("Leukaemia") == "Leukemia")
    assert(americanize("programme") == "program")
    assert(americanize("programmes") == "programs")
    assert(americanize("vapours") == "vapors")
    // pattern exception: devour matches the exception guard
    assert(americanize("devour") == "devour")
    // non-candidates unchanged
    for (w <- Seq("march", "may", "dialogue", "analyses", "our", "tour", "Colour"))
      assert(americanize(w) == w, w) // "our"/"tour" too short for {3,}; capital C fails [a-z]
    // timex capitalization on/off
    assert(americanize("monday") == "Monday")
    assert(americanize("monday", capitalizeTimex = false) == "monday")
    assert(americanize("march") == "march") // deliberately absent from timex map
    // normalizeTerms fix composition: month/day lowercased first, then americanize
    assert(Americanize.fixWordNormalizeTerms("Monday") == "monday")
    assert(Americanize.fixWordNormalizeTerms("COLOUR") == "COLOUR") // case-sensitive, like the reference
    assert(Americanize.fixWordNormalizeTerms("colour") == "color")
  }

  test("DIFFERENTIAL: matches the compiled reference's Americanize on map, pattern and negative cases") {
    val refBuild = "/tmp/refbuild"
    assume(Files.exists(Paths.get(s"$refBuild/classes/edu/stanford/nlp/process/Americanize.class")),
      "compiled reference not present (RefBridgeSpec compiles it)")
    val words = Seq(
      "colour", "colours", "coloured", "favourite", "organisation", "theatre", "learnt",
      "kerb", "grey", "glamour", "detour", "devour", "haemoglobin", "haematoma", "anaemia",
      "leukaemia", "Leukaemia", "programme", "programmes", "vapour", "vapours", "neighbour",
      "honourable", "practise", "practised", "realise", "oestrogen", "manoeuvre",
      "march", "may", "monday", "friday", "january", "dialogue", "analyses", "our", "tour",
      "Colour", "labour", "labours", "behaviour", "saviour", "armour", "rumour", "parlour")
    val out = (Seq("java", "-cp", s"$refBuild/classes",
      "edu.stanford.nlp.process.Americanize") ++ words).!!
    val refMap = out.linesIterator.filter(_.contains(" --> ")).map { l =>
      val Array(a, b) = l.split(" --> ", 2); (a, b)
    }.toMap
    assert(refMap.size == words.size, s"expected ${words.size} outputs, got ${refMap.size}")
    for (w <- words)
      assert(Americanize.americanize(w) == refMap(w),
        s"'$w': ours=${Americanize.americanize(w)} ref=${refMap(w)}")
  }

  test("SGML strip: tags removed, offsets index the original text, no cross-tag fusion") {
    val text = "<doc id=3><p>Alice Johnson<br/>works at <b>Acme</b>Corp.</p> in Berlin.</doc>"
    val toks = Tokenizer.tokenizeStripSgml(text)
    val words = toks.map(_.word)
    assert(!words.exists(_.contains("<")))
    assert(words.startsWith(Vector("Alice", "Johnson", "works", "at", "Acme", "Corp.")))
    // Acme</b>Corp. must NOT fuse into AcmeCorp.
    assert(words.contains("Acme") && words.contains("Corp."))
    // every token's offsets slice the ORIGINAL text to its word
    for (t <- toks if !t.word.startsWith("-")) // skip bracket normalizations if any
      assert(text.substring(t.begin, t.end) == t.word ||
        text.substring(t.begin, t.end).replace("(", "-LRB-").replace(")", "-RRB-") == t.word,
        s"${t.word} at ${t.begin}..${t.end} = '${text.substring(t.begin, t.end)}'")
    // plain text is untouched by the stripper
    val plain = "Alice works at Acme Corp. in Berlin."
    assert(Tokenizer.tokenizeStripSgml(plain) == Tokenizer.tokenize(plain))
  }
}
