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

  test("ngram options: dehyphenate quirks; string path == fast path under every option") {
    import graft.text.WordShape
    // dehyphenate goldens hand-traced through NERFeatureFactory.java:540-555
    // (the leng-2 bound uses the ORIGINAL length; scan resumes at the removal
    // index, so runs of hyphens collapse; the padded trailing hyphen stays)
    assert(NerFeatures.dehyphenate("<a-b>") == "<ab>")
    assert(NerFeatures.dehyphenate("<x-->") == "<x>")
    assert(NerFeatures.dehyphenate("<ab->") == "<ab->") // ending hyphen kept
    assert(NerFeatures.dehyphenate("<-ab>") == "<-ab>") // scan starts at 2
    assert(NerFeatures.dehyphenate("<e-mail-id>") == "<emailid>")

    // greekify goldens (NERFeatureFactory.java:557-566: fixed alternation -> '~')
    assert(NerFeatures.greekify("<alphabet>") == "<~bet>")
    assert(NerFeatures.greekify("<tnf-alpha>") == "<tnf-~>")
    assert(NerFeatures.greekify("<betagamma>") == "<~~>")
    assert(NerFeatures.greekify("<plain>") == "<plain>")

    // ngram emission goldens: maxLen + noMid + lowercase on "<Ab-c>"
    val ng = NerFeatures.NgramOpts(maxLen = 3, noMid = false, lowercase = true, dehyphenate = true)
    val toks = Vector("Ab-c").map(w => NerFeatures.Tok(w, WordShape.dan2(w, Set.empty)))
    val g0 = NerFeatures.featuresAt(toks, 0, Gazette.empty, occPatterns = false,
      useDistSim = false, useTags = false, useTaggySeq = false,
      reverse = false, parenMatching = false, ng)(0)
    val ngrams = g0.filter(f => f.startsWith("#") && f.endsWith("|C")).toSet
    // "<Ab-c>" -> lowercase "<ab-c>" -> dehyphenate "<abc>"; all substrings
    // of length 2..3 (noMid off)
    assert(ngrams == Set("#<a#|C", "#<ab#|C", "#ab#|C", "#abc#|C", "#bc#|C", "#bc>#|C",
      "#c>#|C"), s"got $ngrams")

    // string path == fast path under options, over mixed-case/hyphen words
    val words = Vector("Alice", "e-mail", "ACME-Corp", "x", "a-b-c-d", "tnf-alpha", ".")
    val toks2 = words.map(w => NerFeatures.Tok(WordShape.fixWord(w), WordShape.dan2(w, Set.empty)))
    for (opt <- Seq(
      NerFeatures.NgramOpts(maxLen = 4),
      NerFeatures.NgramOpts(noMid = false),
      NerFeatures.NgramOpts(maxLen = 3, noMid = false, lowercase = true),
      NerFeatures.NgramOpts(maxLen = 5, dehyphenate = true),
      NerFeatures.NgramOpts(maxLen = 4, noMid = false, lowercase = true, dehyphenate = true),
      NerFeatures.NgramOpts(maxLen = 4, greekify = true, conjoinShapes = true),
      NerFeatures.NgramOpts(noMid = false, conjoinShapes = true))) {
      // dictionary from the string path's own output
      val dict = new java.util.HashMap[String, Integer]()
      val allFeats = Vector.newBuilder[String]
      for (pos <- words.indices) {
        val byG = NerFeatures.featuresAt(toks2, pos, Gazette.empty, false, false, false, false, false, false, opt)
        byG.foreach(_.foreach(allFeats += _))
      }
      allFeats.result().distinct.sorted.zipWithIndex.foreach { case (f, i) =>
        dict.put(f, Integer.valueOf(i))
      }
      val hash = new NerFeaturesFast.LongIntHash(dict.size)
      dict.forEach((k, v) => hash.put(NerFeaturesFast.fnv(k), v.intValue))
      val scratch = new NerFeaturesFast.Scratch
      for (pos <- words.indices) {
        val slow = NerFeatures.featuresAt(toks2, pos, Gazette.empty, false, false, false, false, false, false, opt)
          .map(_.map(f => dict.get(f).intValue))
        val fast = NerFeaturesFast.idsAt(toks2, pos, hash, scratch, Gazette.empty,
          occPatterns = false, useDistSim = false, useTags = false, useTaggySeq = false,
          reverse = false, parenMatching = false, ngram = opt)
        for (g <- 0 until 3)
          assert(slow(g).toSeq == fast(g).toSeq, s"opt=$opt pos=$pos g=$g word=${words(pos)}")
      }
    }
  }

  test("misc families: title/ordinal goldens; string path == fast path with all six on") {
    import graft.text.WordShape
    // titlePattern (NERFeatureFactory.java:746): optional trailing period
    assert(NerFeatures.isTitleWord("Dr") && NerFeatures.isTitleWord("Dr."))
    assert(NerFeatures.isTitleWord("Mrs") && !NerFeatures.isTitleWord("dr"))
    assert(!NerFeatures.isTitleWord("Doctor"))
    // isOrdinal (:631-668): spelled ordinals, number+suffix pairs, hyphen join
    def toksOf(ws: String*) = ws.toIndexedSeq.map(w => NerFeatures.Tok(w, WordShape.dan2(w, Set.empty)))
    val t1 = toksOf("the", "3", "rd", "place", "twenty-first", "17th", "-")
    assert(!NerFeatures.isOrdinal(t1, 0))
    assert(NerFeatures.isOrdinal(t1, 1), "number followed by ordinal suffix")
    assert(NerFeatures.isOrdinal(t1, 2), "suffix preceded by number")
    assert(!NerFeatures.isOrdinal(t1, 3))
    assert(NerFeatures.isOrdinal(t1, 4), "hyphen-joined spelled ordinal")
    assert(NerFeatures.isOrdinal(t1, 5), "digits+th")
    val t2 = toksOf("first", "-", "second")
    assert(NerFeatures.isOrdinal(t2, 1), "'-' between two ordinals")

    val words = Vector("Dr", "Smith", "won", "3", "rd", "place", "twenty-first", ".")
    val tags = Vector("NNP", "NNP", "VB", "CD", "NN", "NN", "JJ", ".")
    val toks = toksOf(words: _*).zip(tags).zipWithIndex.map { case ((t, tg), i) =>
      // lemma on alternate tokens only: the getString suppression path
      // (no feature for lemma-less tokens) must agree between the two paths
      t.copy(tag = tg, ds = if (i % 2 == 0) s"C_$i" else null,
        lemma = if (i % 2 == 1) t.word.toLowerCase + "_lm" else null,
        chunk = if (i % 3 != 2) s"CH$i" else null,
        // unknown on a strict subset: raw-get semantics (absent -> "null")
        // must agree between the two paths
        unknown = if (i % 3 == 0) "true" else if (i % 3 == 1) "false" else null,
        // generic: pre-joined "<value>-<key>" on a subset (null = no emission)
        generic = if (i % 2 == 0) s"v$i-mycol" else null) }
    val misc = NerFeatures.MiscOpts(useTitle = true, usePosition = true, useBeginSent = true,
      useSymWordPairs = true, useFirstWord = true, useOrdinal = true,
      useMoreTags = true, useEitherSideWord = true, useWordTag = true,
      useEitherSideDisjunctive = true, useExtraTaggySequences = true,
      useTypeSeqs3 = true, useTaggySequencesShapeInteraction = true,
      useSymTags = true, usePrevVB = true, useNextVB = true, useVB = true,
      useShapeConjunctions = true, useNextSequences = true,
      useWideDisjunctive = true, wideDisjunctionWidth = 2,
      useDisjShape = true, useDisjunctiveShapeInteraction = true,
      useLemmas = true, usePrevNextLemmas = true,
      useChunks = true, useChunkySequences = true, useUnknown = true,
      useAbbr = true, useMinimalAbbr = true, useMoreAbbr = true,
      useABGENE = true, useABSTR = true, useABSTRFreq = true,
      useABSTRFreqDict = true, useGENIA = true, useWEB = true,
      useWEBFreqDict = true, useIsURL = true, useEntityRule = true,
      useEntityTypes = true, useIsDateRange = true, useFREQ = true,
      useEntityTypeSequences = true, useURLSequences = true,
      useMUCFeatures = true, useClassFeature = true, useGenericFeatures = true,
      useNPHead = true, useNPGovernor = true, useHeadGov = true)
    val dict = new java.util.HashMap[String, Integer]()
    for (pos <- words.indices; g <- 0 until 3;
         f <- NerFeatures.featuresAt(toks, pos, Gazette.empty, false, true, true, true,
           false, false, NerFeatures.NgramOpts.default, 4, misc)(g))
      if (!dict.containsKey(f)) dict.put(f, Integer.valueOf(dict.size))
    assert(dict.containsKey("true-UNKNOWN|C") && dict.containsKey("false-NUNKNOWN|C") &&
      dict.containsKey("null-PUNKNOWN|C")) // useUnknown raw-get incl. the pad "null"
    assert(dict.containsKey("v0-mycol|C") && !dict.containsKey("v1-mycol|C"),
      "useGenericFeatures: emit only for generic-bearing tokens")
    // NP-head/governor degenerations: constants + tag/distsim semi-constants
    assert(dict.containsKey("null-HW|C") && dict.containsKey("null-GW|C") &&
      dict.containsKey("null-null-HW_GW|C"))
    assert(dict.containsKey("null-NNP-HW-T|C") && dict.containsKey("null-NNP-GW-T|C"))
    assert(dict.containsKey("null-C_0-HW-DISTSIM|C") && dict.containsKey("null-null-DISTSIM-T1|C"))
    assert(dict.containsKey("IS_TITLE|C") && dict.containsKey("C_ORDINAL|CpC") &&
      dict.containsKey("0-POSITION|C") && dict.containsKey("BEGIN-SENT|C") &&
      dict.containsKey("Dr|C")) // useFirstWord: the raw first word
    assert(dict.containsKey("Smith-NNP-W-T|C") && dict.containsKey("Dr-EW|C") &&
      dict.containsKey("NNP-Smith-PTAG-CWORD|C") && dict.containsKey("Smith-DISJWE|C"))
    // extra taggy (C clique), typeSeqs3 (CpC), taggy-shape interaction +
    // the previously-missing DISTSIM_TTS1 (CpCp2C)
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-TTTS|C")))
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-PCNSHAPES|CpC")))
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-TTS-CS|CpCp2C")))
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-DISTSIM_TTS1|CpCp2C")))
    // symTags, VB scans (nearest VB each side; X at pads), shape conjunctions
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-PCNTAGS|C")))
    assert(dict.containsKey("X-PVB|C") && dict.containsKey("won-PVB|C") &&
      dict.containsKey("won-NVB|C") && dict.containsKey("X-NVB|C"))
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-PNVB|C")))
    assert(dict.containsKey("P_ORDINAL|C"), "P_ORDINAL fires on prev-ordinal alone")
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-POS-SH|C")))
    // useNextSequences: CnC folded into CpC (word at loc-1), CpCnC into CpCp2C
    assert(dict.containsKey("NSEQ|CnC") && dict.containsKey("Dr-NSEQW|CnC") &&
      dict.containsKey("-NSEQW|CnC"), "pad word at loc-1 reads as empty (getString)")
    assert(dict.containsKey("PNSEQ|CpCnC") && dict.containsKey("Smith-PNSEQW|CpCnC"))
    // wide disjunctive (own width), disjunctive shapes (get -> "null" pads),
    // and the disjunctive-shape interaction (cShape getString)
    assert(dict.containsKey("won-DISJWN|C") && dict.containsKey("Dr-DISJWP|C"))
    // lemma families (NERFeatureFactory.java:796-811): emitted only for
    // lemma-BEARING tokens; "smith_lm" sits at index 1 (lemma'd), "Dr" at 0 (not)
    assert(dict.containsKey("smith_lm-LEM|C") && dict.containsKey("smith_lm-PLEM|C") &&
      dict.containsKey("smith_lm-NLEM|C"))
    assert(!dict.keySet.toArray.exists(_.toString == "Dr-LEM|C"),
      "a lemma-less token must emit no LEM feature (getString suppression)")
    // chunk families: `get` semantics — missing chunks read as the literal
    // "null" (token 2 has none; the left pad too)
    assert(dict.containsKey("CH0-CH1-PCCHUNK|C") && dict.containsKey("CH1-null-CNCHUNK|C"))
    assert(dict.containsKey("null-CH0-PCCHUNK|C"), "left pad chunk reads as null")
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-PCNCHUNK|CpC")))
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-2PCHUNKS|CpCp2C")))
    // abbr constants (never-set AbbrAnnotation -> literal "null" strings)
    assert(dict.containsKey("null-ABBR|C") && dict.containsKey("null-null-PCABBR|C") &&
      dict.containsKey("Smith-null-CWABB|C") && dict.containsKey("null-null-PABBRANS|CpC") &&
      dict.containsKey("null-null-null-2PABBRANS|CpCp2C"))
    // the other no-producer constants, incl. the tag- and shape-conjoined
    // variants and the class bias feature
    assert(dict.containsKey("null-GENIA|C") && dict.containsKey("null-ISURL|C") &&
      dict.containsKey("null-null-ETSEQ|CpC") && dict.containsKey("null-null-URLSEQ|CpC") &&
      dict.containsKey("null-null-P2AP2CABB|Cp2C") && dict.containsKey("###|C"))
    assert(dict.containsKey("null-ABSTRACTnull-FREQNNP-TAG|C"),
      "ABSTRFreqDict conjoins the real POS tag")
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-WORD_POSITION_SHAPE|C")),
      "MUC shape conjunction uses the real token shape")
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-NDISJSHAPE|C")))
    assert(dict.keySet.toArray.exists(_.toString.contains("-CNDISJSHAPE|C")))
    assert(dict.containsKey("null-NDISJSHAPE|C"), "pad shape reads as the literal null (get)")
    assert(dict.keySet.toArray.exists(_.toString.endsWith("-DISJN-CS|C")) &&
      dict.keySet.toArray.exists(_.toString.endsWith("-DISJP-CS|C")))
    val hash = new NerFeaturesFast.LongIntHash(dict.size)
    dict.forEach((k, v) => hash.put(NerFeaturesFast.fnv(k), v.intValue))
    val scratch = new NerFeaturesFast.Scratch
    for (pos <- words.indices; g <- 0 until 3) {
      val slow = NerFeatures.featuresAt(toks, pos, Gazette.empty, false, true, true, true,
        false, false, NerFeatures.NgramOpts.default, 4, misc)(g).map(f => dict.get(f).intValue).toSeq
      val fast = NerFeaturesFast.idsAt(toks, pos, hash, scratch, Gazette.empty,
        occPatterns = false, useDistSim = true, useTags = true, useTaggySeq = true,
        reverse = false, parenMatching = false, ngram = NerFeatures.NgramOpts.default,
        disjWidth = 4, misc = misc)(g).toSeq
      assert(slow == fast, s"pos=$pos g=$g word=${words(pos)}")
    }
  }

  test("gazette features: fast path == string path; sloppy vs clean semantics") {
    import graft.text.WordShape
    val lines = Seq("PERSON Alice Johnson", "PERSON Dr. Carla Garcia",
      "ORGANIZATION Acme Corp.", "ORGANIZATION Globex Inc.", "LOCATION Berlin")
    def toksOf(words: Seq[String]) =
      words.toIndexedSeq.map(w => NerFeatures.Tok(WordShape.fixWord(w), WordShape.dan2(w, Set.empty)))

    // emission-order + hash parity between the two paths, with a dictionary
    // built from the string path's own output
    val gaz = Gazette.parse(lines)
    val words = Vector("Dr.", "Carla", "Garcia", "met", "Acme", "Corp.", "in", "Berlin", ".")
    val toks = toksOf(words)
    val dict = new java.util.HashMap[String, Integer]()
    for (pos <- toks.indices; g <- 0 until 3; f <- NerFeatures.featuresAt(toks, pos, gaz)(g))
      if (!dict.containsKey(f)) dict.put(f, Integer.valueOf(dict.size))
    val hash = new NerFeaturesFast.LongIntHash(dict.size)
    dict.forEach((k, v) => hash.put(NerFeaturesFast.fnv(k), v.intValue))
    val scratch = new NerFeaturesFast.Scratch
    for (pos <- toks.indices; g <- 0 until 3) {
      val slow = NerFeatures.featuresAt(toks, pos, gaz)(g).map(f => dict.get(f).intValue).toSeq
      val fast = NerFeaturesFast.idsAt(toks, pos, hash, scratch, gaz)(g).toSeq
      assert(slow == fast, s"pos=$pos g=$g")
    }

    // sloppy: any phrase word fires TYPE-GAZn even without the full phrase
    val sloppyOnly = Gazette.parse(lines, sloppyMode = true, cleanMode = false)
    val partial = toksOf(Vector("Acme", "Holdings", "hired", "Garcia", "."))
    assert(NerFeatures.featuresAt(partial, 0, sloppyOnly)(0).contains("ORGANIZATION-GAZ2|C"))
    assert(NerFeatures.featuresAt(partial, 3, sloppyOnly)(0).contains("PERSON-GAZ3|C"))
    // clean: fires only when the WHOLE phrase matches around the word
    val cleanOnly = Gazette.parse(lines, sloppyMode = false, cleanMode = true)
    assert(!NerFeatures.featuresAt(partial, 0, cleanOnly)(0).exists(_.contains("-GAZ")))
    val full = toksOf(Vector("Dr.", "Carla", "Garcia", "left", "."))
    for (pos <- 0 to 2) // every phrase word fires at its offset
      assert(NerFeatures.featuresAt(full, pos, cleanOnly)(0).contains("PERSON-GAZ3|C"), s"pos=$pos")
    // phrase straddling the document start must NOT match padding
    val tail = toksOf(Vector("Garcia", "left", "."))
    assert(!NerFeatures.featuresAt(tail, 0, cleanOnly)(0).exists(_.contains("PERSON-GAZ3")))

    // model save/load round-trips the gazette trailer (v3)
    val m0 = NerModels.default(SparkTestSession.spark).value
    val withGaz = new NerModel(m0.classIndex, m0.backgroundIndex, m0.featureIndex,
      m0.layout, m0.weights, m0.knownLC, gaz)
    val tmp = java.nio.file.Files.createTempFile("gazmodel", ".gz").toString
    NerModel.save(withGaz, tmp)
    val re = NerModel.load(tmp)
    assert(re.gazette.sloppy.view.mapValues(_.toSeq).toMap ==
      gaz.sloppy.view.mapValues(_.toSeq).toMap)
    assert(re.gazette.clean.view.mapValues(_.toSeq).toMap ==
      gaz.clean.view.mapValues(_.toSeq).toMap)
    java.nio.file.Files.delete(java.nio.file.Paths.get(tmp))
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
