package graft.ner

import graft.core.Crf
import graft.text.{RawToken, WordShape}
import graft.train.WeightLayout
import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.file.{Files, Paths}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import scala.collection.mutable

/** A trained NER model bundle: label dictionary, feature dictionary, clique
  * layout, weights, and corpus-derived known-lowercase words.
  * (Reference bundle contents: CRFClassifier serialization order,
  * /root/reference/src/edu/stanford/nlp/ie/crf/CRFClassifier.java:1548-1560.)
  *
  * Broadcast once per Spark job; all lookups inside partition-local closures.
  */
final class NerModel(
    val classIndex: Array[String], // classIndex(backgroundIndex) = "O"
    val backgroundIndex: Int,
    val featureIndex: java.util.HashMap[String, Integer],
    val layout: WeightLayout,
    val weights: Array[Array[Double]],
    val knownLC: Set[String],
    val gazette: Gazette = Gazette.empty,
    // normalizeTerms (SeqClassifierFlags.java:99): preprocessing also
    // Americanizes each word (ObjectBankWrapper.fix, :117-128); shape stays
    // computed on the ORIGINAL word, like the timex fix
    val normalizeTerms: Boolean = false,
    // useOccurrencePatterns (NERFeatureFactory.java:1953-2018): long-range
    // repeated-word features; the encode input must then be the WHOLE
    // document (the +-150-token window spans it)
    val useOccurrencePatterns: Boolean = false,
    // useReverse (the `macro` preset's distinguishing flag,
    // SeqClassifierFlags.java:617): the reference physically reverses each
    // document before feature extraction and inference and un-reverses the
    // answers (CRFClassifier.makeAnswerArraysAndTagIndex / classify); we do
    // the same at the tag() entry points, and the occurrence-pattern scans
    // flip their reverse(i) indexors accordingly.
    val useReverse: Boolean = false,
    // useDistSim (NERFeatureFactory.java:497-530,763-772,966,982,1553-1555):
    // distributional-similarity cluster features from a lexicon that is part
    // of the model state (the reference serializes it inside the factory)
    val distSim: Option[DistSim] = None,
    // useTags / useTaggySequences (goodCoNLL families): POS-tag templates
    // (t-TAG, pt-PTAG, nt-NTAG; pt-t-TS; p2t-pt-t-TTS). Tags come from the
    // caller's column data (`word=0,tag=1,answer=2`); documents tagged
    // WITHOUT tags degrade to empty-string values exactly like the reference
    // (getString semantics).
    val useTags: Boolean = false,
    val useTaggySequences: Boolean = false,
    // useParenMatching (NERFeatureFactory.java:1591-1605,1669-1683): matched
    // open/close paren features on the CpC and Cp2C cliques
    val useParenMatching: Boolean = false,
    // useNGrams options: maxNGramLeng / noMidNGrams / lowercaseNGrams /
    // dehyphenateNGrams (NERFeatureFactory.java:1173-1197)
    val ngramOpts: NerFeatures.NgramOpts = NerFeatures.NgramOpts.default,
    // useDisjunctive width (flags.disjunctionWidth; NERFeatureFactory.java:1267-1279)
    val disjunctionWidth: Int = 4,
    // small self-contained families: useTitle / usePosition / useBeginSent /
    // useSymWordPairs / useFirstWord / useOrdinal
    val miscOpts: NerFeatures.MiscOpts = NerFeatures.MiscOpts.default,
    // useGenericFeatures: the model's single EFFECTIVE generic column name.
    // The reference's CoreLabel.initFromStrings collapses every generic map
    // key onto one anonymous annotation class (CoreLabel.java:128-136), so a
    // model trained with N generic columns effectively reads only the LAST
    // one — loaders reduce the map accordingly and store that one key here.
    val genericKey: Option[String] = None
) extends Serializable {

  /** The word-`fix` preprocessing step (ObjectBankWrapper.fix): timex
    * lowercasing always (normalizeTimex is on in every 3-class preset),
    * plus Americanize under normalizeTerms.
    */
  @inline private[ner] def fix(w: String): String =
    if (normalizeTerms) graft.text.Americanize.fixWordNormalizeTerms(w)
    else WordShape.fixWord(w)

  @transient lazy val params: Crf.Params =
    new Crf.Params(classIndex.length, layout.windowSize, backgroundIndex, layout.weightCol, weights)

  val classOf: Map[String, Int] = classIndex.zipWithIndex.toMap

  /** FNV-hash → feature-id table for the allocation-free inference path.
    * Built once per executor (lazy transient) from the string dictionary.
    */
  @transient lazy val hashIndex: NerFeaturesFast.LongIntHash = {
    val t = new NerFeaturesFast.LongIntHash(featureIndex.size)
    featureIndex.forEach((k, v) => t.put(NerFeaturesFast.fnv(k), v.intValue))
    // Fail fast on a 64-bit FNV collision between two dictionary strings:
    // a silent overwrite would activate the wrong weight row with no error
    // signal. P(collision) ~ n^2/2^65 (~3e-9 at n=10^6) but grows
    // quadratically with the feature count; detection is free here.
    // (Query-side collisions of UNSEEN features against dictionary entries
    // remain probabilistic at n/2^64 per feature — documented tradeoff of
    // the hashing fast path; the string `encode` path has no such risk.)
    require(t.size == featureIndex.size,
      s"FNV-64 collision among ${featureIndex.size} feature-dictionary keys " +
        s"(got ${t.size} distinct hashes); use the string encode path for this model")
    t
  }

  /** word → preprocessed token memo (shape strings are pure functions of the
    * word under a frozen knownLCWords set, so they are vocabulary-cacheable —
    * the reference memoizes ngrams the same way, NERFeatureFactory.java:1198-1200).
    */
  @transient lazy val tokCache = new java.util.concurrent.ConcurrentHashMap[String, NerFeatures.Tok]()
  @transient private lazy val scratch = new ThreadLocal[NerFeaturesFast.Scratch] {
    override def initialValue(): NerFeaturesFast.Scratch = new NerFeaturesFast.Scratch
  }

  private def tok(w: String): NerFeatures.Tok = {
    var t = tokCache.get(w)
    if (t == null) {
      val fixed = fix(w)
      t = NerFeatures.Tok(fixed, WordShape.dan2(w, knownLC.contains),
        distSim.map(_.clusterOf(fixed)).orNull)
      if (tokCache.size < 2000000) tokCache.put(w, t) // bound executor memory
    }
    t
  }

  /** Fast encode: feature hashing, no string materialization (parity with
    * `encode` pinned by FeatureParitySpec).
    */
  def encodeFast(words: IndexedSeq[String]): Crf.EncodedDoc = {
    val toks = words.map(tok)
    val s = scratch.get()
    val n = toks.length
    val out = new Array[Array[Array[Int]]](n)
    var pos = 0
    while (pos < n) {
      out(pos) = NerFeaturesFast.idsAt(toks, pos, hashIndex, s, gazette, useOccurrencePatterns,
        distSim.isDefined, useTags, useTaggySequences, useReverse, useParenMatching, ngramOpts, disjunctionWidth, miscOpts)
      pos += 1
    }
    out
  }

  /** Preprocess raw token words: shape from the ORIGINAL word (with frozen
    * knownLCWords), then timex word fix — matching ObjectBankWrapper.doBasicStuff
    * ordering (ObjectBankWrapper.java:131-155).
    */
  def preprocess(words: IndexedSeq[String]): IndexedSeq[NerFeatures.Tok] =
    words.map { w =>
      val fixed = fix(w)
      NerFeatures.Tok(fixed, WordShape.dan2(w, knownLC.contains),
        distSim.map(_.clusterOf(fixed)).orNull)
    }

  /** Encode a preprocessed document; features unseen at train time are dropped
    * (reference semantic: CRFClassifier.java:200-207).
    */
  def encode(toks: IndexedSeq[NerFeatures.Tok]): Crf.EncodedDoc = {
    val n = toks.length
    val out = new Array[Array[Array[Int]]](n)
    var pos = 0
    while (pos < n) {
      val byGroup = NerFeatures.featuresAt(toks, pos, gazette, useOccurrencePatterns,
        distSim.isDefined, useTags, useTaggySequences, useReverse, useParenMatching, ngramOpts, disjunctionWidth, miscOpts)
      out(pos) = byGroup.map { feats =>
        val ids = new mutable.ArrayBuilder.ofInt
        var k = 0
        while (k < feats.length) {
          val id = featureIndex.get(feats(k))
          if (id != null) ids += id.intValue
          k += 1
        }
        ids.result()
      }
      pos += 1
    }
    out
  }

  /** Encode with the reference's DATA-ARRAY ordering: getCliqueFeatures
    * collects each clique's features into a `java.util.HashSet<String>`
    * (NERFeatureFactory.java:412), so the id arrays CRFClassifier trains on
    * follow HashSet iteration order and are DEDUPLICATED — emission order is
    * lost. Training objectives sum weights in data order, so a bit-exact
    * objective mirror (FloatObjective / RefFloatObjectiveSpec) needs this
    * exact order; inference is order-insensitive, so `encode`/`encodeFast`
    * keep the cheaper emission order.
    */
  def encodeRefOrder(words: IndexedSeq[String]): Crf.EncodedDoc = {
    val toks = preprocess(words)
    val n = toks.length
    val out = new Array[Array[Array[Int]]](n)
    var pos = 0
    while (pos < n) {
      val byGroup = NerFeatures.featuresAt(toks, pos, gazette, useOccurrencePatterns,
        distSim.isDefined, useTags, useTaggySequences, useReverse, useParenMatching, ngramOpts, disjunctionWidth, miscOpts)
      out(pos) = byGroup.map { feats =>
        val set = new java.util.HashSet[String]()
        var k = 0
        while (k < feats.length) { set.add(feats(k)); k += 1 }
        val ids = new mutable.ArrayBuilder.ofInt
        val it = set.iterator()
        while (it.hasNext) {
          val id = featureIndex.get(it.next())
          if (id != null) ids += id.intValue
        }
        ids.result()
      }
      pos += 1
    }
    out
  }

  /** Viterbi-tag a POS-tagged document (column data `word=0,tag=1,answer=2`,
    * ColumnDocumentReaderAndWriter semantics): tags feed the useTags /
    * useTaggySequences templates.
    */
  def tag(words: IndexedSeq[String], tags: IndexedSeq[String],
      lemmas: IndexedSeq[String] = IndexedSeq.empty,
      chunks: IndexedSeq[String] = IndexedSeq.empty,
      unknowns: IndexedSeq[String] = IndexedSeq.empty,
      generics: IndexedSeq[String] = IndexedSeq.empty): Array[String] = {
    require(words.length == tags.length, s"${words.length} words vs ${tags.length} tags")
    require(lemmas.isEmpty || lemmas.length == words.length,
      s"${words.length} words vs ${lemmas.length} lemmas")
    require(chunks.isEmpty || chunks.length == words.length,
      s"${words.length} words vs ${chunks.length} chunks")
    require(unknowns.isEmpty || unknowns.length == words.length,
      s"${words.length} words vs ${unknowns.length} unknowns")
    require(generics.isEmpty || (generics.length == words.length && genericKey.isDefined),
      s"${words.length} words vs ${generics.length} generics (genericKey=$genericKey)")
    if (words.isEmpty) return Array.empty
    val (inW, inT) = if (useReverse) (words.reverse, tags.reverse) else (words, tags)
    val inL = if (useReverse) lemmas.reverse else lemmas
    val inC = if (useReverse) chunks.reverse else chunks
    val inU = if (useReverse) unknowns.reverse else unknowns
    val inG = if (useReverse) generics.reverse else generics
    val gKey = genericKey.orNull
    val toks = inW.indices.map { i =>
      val w = inW(i)
      val fixed = fix(w)
      NerFeatures.Tok(fixed, WordShape.dan2(w, knownLC.contains),
        distSim.map(_.clusterOf(fixed)).orNull, inT(i),
        if (inL.isEmpty) null else inL(i),
        if (inC.isEmpty) null else inC(i),
        if (inU.isEmpty) null else inU(i),
        if (inG.isEmpty) null else inG(i) + "-" + gKey)
    }
    val s = scratch.get()
    val enc: Crf.EncodedDoc = Array.tabulate(toks.length)(pos =>
      NerFeaturesFast.idsAt(toks, pos, hashIndex, s, gazette, useOccurrencePatterns,
        distSim.isDefined, useTags, useTaggySequences, useReverse, useParenMatching, ngramOpts, disjunctionWidth, miscOpts))
    val out = Crf.viterbi(Crf.logPotentials(enc, params), params).map(classIndex)
    if (useReverse) out.reverse else out
  }

  /** Viterbi-tag one document of raw words; returns a label per token. */
  def tag(words: IndexedSeq[String]): Array[String] = {
    if (words.isEmpty) return Array.empty
    val in = if (useReverse) words.reverse else words
    val enc = encodeFast(in)
    val pots = Crf.logPotentials(enc, params)
    val out = Crf.viterbi(pots, params).map(classIndex)
    if (useReverse) out.reverse else out
  }

  /** Tag an over-long document after the reference's maxDocSize split
    * (default 10000; ObjectBankWrapper.fixDocLengths applies it at test time).
    * Pieces decode independently and their labels concatenate — feature
    * windows reset at the (sentence-boundary-preferring) cut, exactly like
    * the reference's split-into-multiple-documents behavior.
    */
  def tagLongDoc(words: IndexedSeq[String], maxDocSize: Int = 10000): Array[String] = {
    if (maxDocSize <= 0 || words.length <= maxDocSize) return tag(words)
    NerModel.fixDocLengths(words, maxDocSize).iterator.flatMap(tag(_)).toArray
  }

  def numFeatures: Int = featureIndex.size

  /** Calibrated marginal/conditional query surface for one document — the
    * reference's CRFCliqueTree queries (prob / logProb at one or more
    * positions, condLogProbGivenPrevious/Next; CRFCliqueTree.java:185-448).
    * Label indices follow `classIndex`/`classOf`.
    */
  def cliqueTree(words: IndexedSeq[String]): Crf.Marginals = {
    require(!useReverse, "cliqueTree positions are undefined under useReverse")
    new Crf.Marginals(
      Crf.forwardBackward(Crf.logPotentials(encodeFast(words), params), params), params)
  }

  /** Reference-faithful clique tree: reproduces what `-printProbs` /
    * `-printFirstOrderProbs` print, INCLUDING the phantom-pad-mass quirk
    * (global labelIndices give the pad positions finite non-background
    * entries; see Crf.RefCliqueTree). `cliqueTree` is the exact surface —
    * use this one only for parity with the reference's printed marginals.
    */
  def cliqueTreeRef(words: IndexedSeq[String]): Crf.RefCliqueTree.Tables = {
    require(!useReverse, "cliqueTree positions are undefined under useReverse")
    Crf.RefCliqueTree.calibrate(Crf.logPotentials(encodeFast(words), params), params)
  }

  /** Beam-limited decode (BeamBestSequenceFinder surface; reference default
    * beamSize = 30, SeqClassifierFlags.java:141). Faster than exact Viterbi
    * when numStates is large; exact in the beamSize -> inf limit.
    */
  def tagBeam(words: IndexedSeq[String], beamSize: Int = 30): Array[String] = {
    if (words.isEmpty) return Array.empty
    val in = if (useReverse) words.reverse else words
    val pots = Crf.logPotentials(encodeFast(in), params)
    val out = Crf.beamViterbi(pots, params, beamSize).map(classIndex)
    if (useReverse) out.reverse else out
  }

  /** Annealed-Gibbs decode with an optional document-consistency prior (the
    * doGibbs path: Viterbi init, linear cooling from T=1.0 —
    * CRFClassifier.java:720-794; prior = Gibbs.ConsistencyPrior, our analogue
    * of the reference's entity priors). With penalty 0 this anneals the plain
    * CRF and converges to the Viterbi answer; a positive penalty trades
    * per-position likelihood for same-word label consistency across the doc.
    *
    * `referenceConditionals = true` samples from the reference's ACTUAL
    * per-position distribution (Gibbs.RefCliqueScorer — the calibrated
    * marginal composition classifyGibbs uses, which over-weights each label
    * by its own window marginal; see the scorer's doc). The default samples
    * the exact conditional (Gibbs.CrfScorer, enumeration-pinned) — our
    * documented improvement, analogous to the exact k-best finder.
    */
  def tagGibbs(words: IndexedSeq[String], consistencyPenalty: Double = 0.0,
      sweeps: Int = 100, seed: Long = 0x91bb5L, useNerPrior: Boolean = false,
      referenceConditionals: Boolean = false): Array[String] = {
    if (words.isEmpty) return Array.empty
    val in = if (useReverse) words.reverse else words
    val pots = Crf.logPotentials(encodeFast(in), params)
    val crf: graft.core.Gibbs.SequenceScorer =
      if (referenceConditionals) new graft.core.Gibbs.RefCliqueScorer(pots, params)
      else new graft.core.Gibbs.CrfScorer(pots, params)
    // -useNERPrior: the reference's empirical entity-pair penalty matrices
    // (EmpiricalNERPrior.java), factored next to the CRF exactly like the
    // consistency prior
    // priors see the WRAPPER-FIXED words, like the reference's doc at prior
    // time (ObjectBankWrapper runs before the prior is built; under
    // normalizeTerms that includes Americanize — review finding: raw words
    // here made occurrence matching diverge for normalizeTerms models)
    lazy val fixedIn = in.map(fix)
    val priors = Seq.newBuilder[graft.core.Gibbs.SequenceScorer]
    if (consistencyPenalty > 0)
      priors += new graft.core.Gibbs.ConsistencyPrior(
        fixedIn, classIndex.length, consistencyPenalty)
    if (useNerPrior)
      priors += new graft.core.NerPriors.EmpiricalNerPrior(
        fixedIn, classIndex.toIndexedSeq, classIndex(backgroundIndex))
    val ps = priors.result()
    val scorer: graft.core.Gibbs.SequenceScorer =
      if (ps.isEmpty) crf else new graft.core.Gibbs.FactoredScorer(crf +: ps)
    val init = Crf.viterbi(pots, params)
    val out = graft.core.Gibbs.findBestUsingAnnealing(
      scorer, graft.core.Gibbs.linearCooling(1.0, sweeps), init, seed).map(classIndex)
    if (useReverse) out.reverse else out
  }

  /** K-best label sequences with joint scores (KBestSequenceFinder surface). */
  def tagKBest(words: IndexedSeq[String], k: Int): Seq[(Seq[String], Double)] = {
    if (words.isEmpty) return Seq((Seq.empty, 0.0))
    val in = if (useReverse) words.reverse else words
    val pots = Crf.logPotentials(encodeFast(in), params)
    Crf.kBestViterbi(pots, params, k).map { case (ls, sc) =>
      val seq = ls.toSeq.map(classIndex)
      (if (useReverse) seq.reverse else seq, sc)
    }
  }

  /** Viterbi label + posterior marginal P(y_i = label | x) per token
    * (reference semantic: CRFCliqueTree marginal queries, CRFCliqueTree.java:194-259,
    * the printProbs debug surface). Marginal of a label = sum of calibrated
    * full-window posteriors whose newest slot is that label.
    */
  def tagWithConfidence(words0: IndexedSeq[String]): Array[(String, Double)] = {
    if (words0.isEmpty) return Array.empty
    val words = if (useReverse) words0.reverse else words0
    val enc = encodeFast(words)
    val p = params
    val pots = Crf.logPotentials(enc, p)
    val best = Crf.viterbi(pots, p)
    val cal = Crf.forwardBackward(pots, p)
    val C = p.numClasses
    val out = Array.tabulate(words.length) { pos =>
      val lm = cal.logMarginals(pos)
      var prob = 0.0
      var e = best(pos) // windows with newest slot == best(pos): enc % C == label
      while (e < p.fullSize) {
        val v = lm(e)
        if (v != Double.NegativeInfinity) prob += math.exp(v)
        e += C
      }
      (classIndex(best(pos)), prob)
    }
    if (useReverse) out.reverse else out
  }
}

object NerModel {

  /** The reference's maxDocSize split (ObjectBankWrapper.fixDocLengths,
    * /root/reference/src/edu/stanford/nlp/sequences/ObjectBankWrapper.java:
    * 167-202): while the document exceeds `maxSize`, cut BEFORE index
    * `maxSize`, preferring the position just after the latest '.' token found
    * scanning j = maxSize down to maxSize/2 + 1 (the hard-coded
    * English-specific sentence boundary); with no '.' in that window, cut at
    * exactly `maxSize`. The final remainder is kept if non-empty. Piece order
    * is document order (the reference builds them in order and re-inserts
    * reversed-then-unreversed — net identity).
    */
  def fixDocLengths(words: IndexedSeq[String], maxSize: Int): Seq[IndexedSeq[String]] = {
    if (maxSize <= 0) return Seq(words)
    val out = Seq.newBuilder[IndexedSeq[String]]
    var doc = words
    while (doc.length > maxSize) {
      var splitIndex = 0
      var j = maxSize
      while (splitIndex == 0 && j > maxSize / 2) {
        if (doc(j) == ".") splitIndex = j + 1
        j -= 1
      }
      if (splitIndex == 0) splitIndex = maxSize
      out += doc.take(splitIndex)
      doc = doc.drop(splitIndex)
    }
    if (doc.nonEmpty) out += doc
    out.result()
  }

  /** Gzip text serialization (our v1 format; the reference-text-format bridge
    * loader mirrors CRFClassifier.loadTextClassifier and lands in a later
    * milestone). One section per line-group, tab-separated.
    */
  def save(m: NerModel, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(Files.newOutputStream(p)), "UTF-8"))
    try {
      w.write(s"graft-ner-v2\t${m.classIndex.length}\t${m.layout.windowSize}\t${m.backgroundIndex}\n")
      w.write(m.classIndex.mkString("\t")); w.write("\n")
      // label-window indices per clique group (observed-sequences-only support):
      // for each group, the window encodings in column order
      for (g <- 0 until m.layout.windowSize) {
        val cols = m.layout.weightCol(g)
        val encsByCol = cols.zipWithIndex.filter(_._1 >= 0).sortBy(_._1).map(_._2)
        w.write(encsByCol.mkString(" ")); w.write("\n")
      }
      // feature index sorted by id; group + weight row inline
      val inv = new Array[String](m.featureIndex.size)
      m.featureIndex.forEach((k, v) => inv(v.intValue) = k)
      w.write(s"${inv.length}\n")
      var f = 0
      while (f < inv.length) {
        w.write(inv(f)); w.write("\t")
        w.write(m.layout.featGroup(f).toString); w.write("\t")
        w.write(m.weights(f).mkString(" ")); w.write("\n")
        f += 1
      }
      w.write(s"${m.knownLC.size}\n")
      m.knownLC.toSeq.sorted.foreach { s => w.write(s); w.write("\n") }
      // v3 trailers (all optional; absent = defaults — v2 files stay loadable)
      if (m.normalizeTerms) w.write("opt\tnormalizeTerms\ttrue\n")
      if (m.useOccurrencePatterns) w.write("opt\tuseOccurrencePatterns\ttrue\n")
      if (m.useReverse) w.write("opt\tuseReverse\ttrue\n")
      if (m.useTags) w.write("opt\tuseTags\ttrue\n")
      if (m.useParenMatching) w.write("opt\tuseParenMatching\ttrue\n")
      if (m.useTaggySequences) w.write("opt\tuseTaggySequences\ttrue\n")
      if (m.ngramOpts != NerFeatures.NgramOpts.default) {
        val ng = m.ngramOpts
        w.write(s"ngram\t${ng.maxLen}\t${ng.noMid}\t${ng.lowercase}\t${ng.dehyphenate}\t${ng.greekify}\t${ng.conjoinShapes}\n")
      }
      if (m.disjunctionWidth != 4) w.write(s"opt\tdisjunctionWidth\t${m.disjunctionWidth}\n")
      m.genericKey.foreach(k => w.write(s"opt\tgenericKey\t$k\n"))
      if (m.miscOpts != NerFeatures.MiscOpts.default) {
        val mo = m.miscOpts
        w.write(s"misc\t${mo.useTitle}\t${mo.usePosition}\t${mo.useBeginSent}\t${mo.useSymWordPairs}\t${mo.useFirstWord}\t${mo.useOrdinal}\t${mo.useMoreTags}\t${mo.useEitherSideWord}\t${mo.useWordTag}\t${mo.useEitherSideDisjunctive}\t${mo.useExtraTaggySequences}\t${mo.useTypeSeqs3}\t${mo.useTaggySequencesShapeInteraction}\t${mo.useSymTags}\t${mo.usePrevVB}\t${mo.useNextVB}\t${mo.useVB}\t${mo.useShapeConjunctions}\t${mo.useNextSequences}\t${mo.useWideDisjunctive}\t${mo.wideDisjunctionWidth}\t${mo.useDisjShape}\t${mo.useDisjunctiveShapeInteraction}\t${mo.useLemmas}\t${mo.usePrevNextLemmas}\t${mo.useChunks}\t${mo.useChunkySequences}\t${mo.useUnknown}\t${mo.useAbbr}\t${mo.useMinimalAbbr}\t${mo.useABGENE}\t${mo.useABSTR}\t${mo.useABSTRFreq}\t${mo.useABSTRFreqDict}\t${mo.useGENIA}\t${mo.useWEB}\t${mo.useWEBFreqDict}\t${mo.useIsURL}\t${mo.useEntityRule}\t${mo.useEntityTypes}\t${mo.useIsDateRange}\t${mo.useFREQ}\t${mo.useEntityTypeSequences}\t${mo.useURLSequences}\t${mo.useMUCFeatures}\t${mo.useClassFeature}\t${mo.useMoreAbbr}\t${mo.useGenericFeatures}\t${mo.useNPHead}\t${mo.useNPGovernor}\t${mo.useHeadGov}\n")
      }
      m.distSim.foreach { ds =>
        w.write(s"distsim\t${ds.lexicon.size}\n")
        ds.lexicon.toSeq.sorted.foreach { case (k, v) => w.write(s"$k\t$v\n") }
      }
      if (!m.gazette.isEmpty) Gazette.writeTrailer(m.gazette, w)
    } finally w.close()
  }

  def load(path: String): NerModel = {
    val r = new BufferedReader(new InputStreamReader(
      new GZIPInputStream(Files.newInputStream(Paths.get(path))), "UTF-8"))
    try {
      val header = r.readLine().split("\t")
      require(header(0) == "graft-ner-v2", s"bad model header: ${header(0)}")
      val numClasses = header(1).toInt
      val windowSize = header(2).toInt
      val backgroundIndex = header(3).toInt
      val classIndex = r.readLine().split("\t")
      require(classIndex.length == numClasses)
      val weightCol = Array.tabulate(windowSize) { g =>
        val cols = Array.fill(graft.core.Crf.pow(numClasses, g + 1))(-1)
        val line = r.readLine().trim
        if (line.nonEmpty)
          line.split(" ").map(_.toInt).zipWithIndex.foreach { case (enc, k) => cols(enc) = k }
        cols
      }
      val numCols = weightCol.map(_.count(_ >= 0))
      val nFeat = r.readLine().toInt
      val featureIndex = new java.util.HashMap[String, Integer](nFeat * 2)
      val featGroup = new Array[Int](nFeat)
      val weights = new Array[Array[Double]](nFeat)
      var f = 0
      while (f < nFeat) {
        val line = r.readLine()
        val t1 = line.lastIndexOf('\t')
        val t0 = line.lastIndexOf('\t', t1 - 1)
        featureIndex.put(line.substring(0, t0), Integer.valueOf(f))
        featGroup(f) = line.substring(t0 + 1, t1).toInt
        weights(f) = line.substring(t1 + 1).split(" ").map(_.toDouble)
        f += 1
      }
      val nLC = r.readLine().toInt
      val knownLC = (0 until nLC).map(_ => r.readLine()).toSet
      var gazette = Gazette.empty
      var normalizeTerms = false
      var occPatterns = false
      var reverse = false
      var distSim: Option[DistSim] = None
      var tagsFlag = false
      var taggySeq = false
      var paren = false
      var ngram = NerFeatures.NgramOpts.default
      var disjWidth = 4
      var genKey: Option[String] = None
      var misc = NerFeatures.MiscOpts.default
      var line = r.readLine()
      while (line != null) {
        if (line.startsWith("gazette\t")) gazette = Gazette.readTrailer(line, r)
        else if (line == "opt\tnormalizeTerms\ttrue") normalizeTerms = true
        else if (line == "opt\tuseOccurrencePatterns\ttrue") occPatterns = true
        else if (line == "opt\tuseReverse\ttrue") reverse = true
        else if (line == "opt\tuseTags\ttrue") tagsFlag = true
        else if (line == "opt\tuseTaggySequences\ttrue") taggySeq = true
        else if (line == "opt\tuseParenMatching\ttrue") paren = true
        else if (line.startsWith("opt\tdisjunctionWidth\t"))
          disjWidth = line.split("\t")(2).toInt
        else if (line.startsWith("opt\tgenericKey\t"))
          genKey = Some(line.split("\t")(2))
        else if (line.startsWith("misc\t")) {
          val p = line.split("\t")
          def b(i: Int) = p.length > i && p(i).toBoolean
          misc = NerFeatures.MiscOpts(b(1), b(2), b(3), b(4), b(5), b(6), b(7), b(8), b(9), b(10),
            b(11), b(12), b(13), b(14), b(15), b(16), b(17), b(18), b(19),
            b(20), if (p.length > 21) p(21).toInt else 10, b(22), b(23), b(24), b(25), b(26), b(27), b(28), b(29),
            b(30), b(31), b(32), b(33), b(34), b(35), b(36), b(37), b(38), b(39),
            b(40), b(41), b(42), b(43), b(44), b(45), b(46), b(47), b(48),
            b(49), b(50), b(51))
        }
        else if (line.startsWith("ngram\t")) {
          val p = line.split("\t")
          ngram = NerFeatures.NgramOpts(p(1).toInt, p(2).toBoolean, p(3).toBoolean, p(4).toBoolean,
            if (p.length > 5) p(5).toBoolean else false,
            if (p.length > 6) p(6).toBoolean else false)
        }
        else if (line.startsWith("distsim\t")) {
          val n = line.split("\t")(1).toInt
          distSim = Some(new DistSim((0 until n).map { _ =>
            val l = r.readLine(); val t = l.indexOf('\t')
            l.substring(0, t) -> l.substring(t + 1)
          }.toMap))
        }
        else throw new IllegalArgumentException(s"unexpected model trailer: $line")
        line = r.readLine()
      }
      val layout = new WeightLayout(numClasses, windowSize, backgroundIndex, featGroup, weightCol, numCols)
      new NerModel(classIndex, backgroundIndex, featureIndex, layout, weights, knownLC,
        gazette, normalizeTerms, occPatterns, reverse, distSim, tagsFlag, taggySeq, paren, ngram,
        disjWidth, misc, genKey)
    } finally r.close()
  }
}
