package graft.core

import graft.train.WeightLayout
import org.scalatest.funsuite.AnyFunSuite

/** Gibbs/annealing decode + factored priors vs enumeration. */
class GibbsSpec extends AnyFunSuite {

  private def mkRandom(seed: Long, numClasses: Int, windowSize: Int, nFeat: Int, docLen: Int) = {
    val rng = new scala.util.Random(seed)
    val featGroup = Array.tabulate(nFeat)(_ => rng.nextInt(windowSize))
    val layout = WeightLayout.fullProduct(numClasses, windowSize, 0, featGroup)
    val flat = Array.fill(layout.totalSize)(rng.nextGaussian() * 0.7)
    val byGroup = Array.tabulate(windowSize)(g => (0 until nFeat).filter(f => featGroup(f) == g).toArray)
    val doc: Crf.EncodedDoc = Array.tabulate(docLen) { _ =>
      Array.tabulate(windowSize) { g =>
        val pool = byGroup(g)
        if (pool.isEmpty) Array.emptyIntArray
        else Array.fill(1 + rng.nextInt(3))(pool(rng.nextInt(pool.length))).distinct
      }
    }
    (layout.params(flat), doc)
  }

  test("CrfScorer conditionals are exact: softmax(logScoresAt) == P(y_pos | rest)") {
    for (seed <- 1 to 4; c <- Seq(2, 3); w <- Seq(2, 3)) {
      val (p, doc) = mkRandom(seed * 11, c, w, nFeat = 12, docLen = 5)
      val pots = Crf.logPotentials(doc, p)
      val scorer = new Gibbs.CrfScorer(pots, p)
      val rng = new scala.util.Random(seed)
      val seq = Array.fill(doc.length)(rng.nextInt(c))
      for (pos <- doc.indices) {
        val raw = scorer.logScoresAt(seq, pos)
        // enumeration: joint score with each label at pos, rest fixed
        val joint = (0 until c).map { lbl =>
          val s2 = seq.clone(); s2(pos) = lbl
          scorer.scoreOf(s2)
        }
        // both normalize to the same conditional
        def softmax(v: Seq[Double]) = {
          val m = v.max; val e = v.map(x => math.exp(x - m)); val z = e.sum; e.map(_ / z)
        }
        val a = softmax(raw.toSeq); val b = softmax(joint)
        for (lbl <- 0 until c)
          assert(math.abs(a(lbl) - b(lbl)) < 1e-12, s"pos=$pos lbl=$lbl seed=$seed c=$c w=$w")
      }
    }
  }

  test("factored scorer conditionals stay exact with the consistency prior") {
    val (p, doc) = mkRandom(77, 3, 3, nFeat = 12, docLen = 6)
    val pots = Crf.logPotentials(doc, p)
    val words = IndexedSeq("alpha", "beta", "alpha", "gamma", "alpha", "beta")
    val scorer = new Gibbs.FactoredScorer(Seq(
      new Gibbs.CrfScorer(pots, p),
      new Gibbs.ConsistencyPrior(words, 3, penalty = 0.8)))
    val seq = Array(0, 1, 2, 0, 1, 2)
    for (pos <- words.indices) {
      val raw = scorer.logScoresAt(seq, pos)
      val joint = (0 until 3).map { lbl =>
        val s2 = seq.clone(); s2(pos) = lbl; scorer.scoreOf(s2)
      }
      def softmax(v: Seq[Double]) = {
        val m = v.max; val e = v.map(x => math.exp(x - m)); val z = e.sum; e.map(_ / z)
      }
      val a = softmax(raw.toSeq); val b = softmax(joint)
      for (lbl <- 0 until 3)
        assert(math.abs(a(lbl) - b(lbl)) < 1e-12, s"pos=$pos lbl=$lbl")
    }
  }

  test("RefCliqueScorer matches the reference's marginal-composition sampling distribution (vs enumeration)") {
    // The reference's classifyGibbs samples from M_pos(prev++c) * M(c++next)
    // (CRFCliqueTree.scoresOf, with the conditional normalization commented
    // out in FactorTable.unnormalizedConditionalLogProbGivenFirst) — NOT the
    // true conditional: the distribution carries an extra factor of the
    // label's own window marginal. Pin our RefCliqueScorer to the
    // enumeration-computed composition on random CRFs, covering both window
    // sizes, the right-edge sumOutFront reduction, and the last-position
    // constant term.
    for (seed <- 1 to 3; c <- Seq(2, 3); w <- Seq(2, 3)) {
      val n = 5
      val (p, doc) = mkRandom(seed * 17, c, w, nFeat = 12, docLen = n)
      val pots = Crf.logPotentials(doc, p)
      val exact = new Gibbs.CrfScorer(pots, p) // scoreOf = raw joint score
      val ref = new Gibbs.RefCliqueScorer(pots, p)
      val rng = new scala.util.Random(seed)
      val seq = Array.fill(n)(rng.nextInt(c))
      val all = (0 until math.pow(c, n).toInt).map { code =>
        var e = code
        val arr = new Array[Int](n)
        var i = n - 1
        while (i >= 0) { arr(i) = e % c; e /= c; i -= 1 }
        (arr, exact.scoreOf(arr))
      }
      val mx = all.map(_._2).max
      def mass(pred: Array[Int] => Boolean): Double =
        all.collect { case (a, s) if pred(a) => math.exp(s - mx) }.sum
      def softmax(v: Seq[Double]) = {
        val m = v.max; val e = v.map(x => math.exp(x - m)); val z = e.sum; e.map(_ / z)
      }
      for (pos <- 0 until n) {
        val prevIdx = (math.max(0, pos - (w - 1)) until pos).toArray
        val nl = math.min(w - 1, n - 1 - pos)
        val expected = (0 until c).map { lbl =>
          val a = mass(arr => arr(pos) == lbl && prevIdx.forall(q => arr(q) == seq(q)))
          val b =
            if (nl == 0) 1.0
            else mass(arr => arr(pos) == lbl && (1 to nl).forall(k => arr(pos + k) == seq(pos + k)))
          a * b
        }
        val z = expected.sum
        val gs = softmax(ref.logScoresAt(seq, pos).toSeq)
        for (lbl <- 0 until c)
          assert(math.abs(gs(lbl) - expected(lbl) / z) < 1e-10, s"seed=$seed c=$c w=$w pos=$pos lbl=$lbl")
      }
    }
  }

  test("annealing recovers the exact Viterbi optimum on random CRFs") {
    var recovered = 0
    val total = 24
    for (seed <- 1 to total) {
      val (p, doc) = mkRandom(seed * 31, 3, 2, nFeat = 12, docLen = 6)
      val pots = Crf.logPotentials(doc, p)
      val scorer = new Gibbs.CrfScorer(pots, p)
      val exact = scorer.scoreOf(Crf.viterbi(pots, p))
      // random init (NOT viterbi) so annealing itself must do the work
      val rng = new scala.util.Random(seed)
      val init = Array.fill(doc.length)(rng.nextInt(3))
      val got = Gibbs.findBestUsingAnnealing(scorer, Gibbs.linearCooling(1.0, 80), init, seed = seed)
      if (math.abs(scorer.scoreOf(got) - exact) < 1e-9) recovered += 1
    }
    info(s"annealing recovered the exact optimum in $recovered/$total runs")
    assert(recovered >= (total * 0.9).toInt, s"$recovered/$total")
  }

  test("EmpiricalNerPrior reproduces the reference scoreOf on hand-traced sequences") {
    // Golden values hand-traced through EmpiricalNERPrior.java:74-283 +
    // EntityCachingAbstractSequencePrior.java:96-176 (matrices are data, so
    // enumeration parity is achievable even though the sampler RNG isn't).
    val ci = IndexedSeq("O", "LOCATION", "ORGANIZATION", "PERSON", "MISC")
    val O = 0; val L = 1; val G = 2; val P = 3
    def prior(words: String*) = new NerPriors.EmpiricalNerPrior(words.toIndexedSeq, ci, "O")

    // exact repeat, conflicting types: both directions pay the exact matrix
    // (LOC-vs-ORG p3 one way, ORG-vs-LOC p6 the other; lengths equal -> no p1)
    val pr1 = prior("paris", "said", "Paris")
    val exp1 = -(-math.log(188 / 6631.0) / 2.0) - (-math.log(188.0 / 3169.0) / 2.0)
    assert(math.abs(pr1.scoreOf(Array(L, O, G)) - exp1) < 1e-12)
    // same types: diagonal is zero
    assert(pr1.scoreOf(Array(L, O, L)) == 0.0)
    // background everywhere: no entities, no penalty
    assert(pr1.scoreOf(Array(O, O, O)) == 0.0)

    // NON-exact overlap (the longer entity's occurrence hits the shorter one,
    // but not vice versa): LOC-vs-ORG inexact cell is commented out in the
    // reference (p19) -> zero; LOC-vs-PERSON pays p20 per word of the source
    val pr2 = prior("New", "York", "meets", "New", "York", "City")
    assert(pr2.scoreOf(Array(L, L, O, G, G, G)) == 0.0)
    assert(math.abs(pr2.scoreOf(Array(L, L, O, P, P, P)) - (-2.0 * -math.log(5.0 / 724.0))) < 1e-12)

    // exact repeat with length mismatch, same type: |len1-len2| * p1 per
    // direction (p1 = -ln 0.01)
    val pr3 = prior("Acme", "Corp", "said", "Acme", "Corp", "today")
    val exp3 = -2.0 * -math.log(0.01)
    assert(math.abs(pr3.scoreOf(Array(G, G, O, G, O, O)) - exp3) < 1e-12)

    // the reference's duplicated-clause bug (:134-135): ORG-then-LOC is
    // exempt from the (len1+len2)*p1 cross-type mismatch term, LOC-then-ORG
    // is not — the score is asymmetric on purpose
    val pr4 = prior("Delta", "City", "said", "Delta", "City", "x")
    val exp4 = -(2.0 * -math.log(188.0 / 3169.0) / 2.0) - // A: ORG sees LOC, exact matrix p6 * len 2, p1 exempt
      (3.0 * -math.log(0.01)) -                           // B: LOC sees ORG, (2+1)*p1 NOT exempt
      (-math.log(188 / 6631.0) / 2.0)                     // B: exact matrix p3 * len 1
    assert(math.abs(pr4.scoreOf(Array(G, G, O, L, O, O)) - exp4) < 1e-12)

    // logScoresAt is the exact label-restriction of scoreOf (the abstract
    // class's scoresOf contract), so Gibbs conditionals stay exact
    val seq = Array(L, O, G)
    for (pos <- 0 until 3) {
      val raw = pr1.logScoresAt(seq, pos)
      for (lbl <- ci.indices) {
        val s2 = seq.clone(); s2(pos) = lbl
        assert(raw(lbl) == pr1.scoreOf(s2), s"pos=$pos lbl=$lbl")
      }
    }
  }

  test("consistency prior flips inconsistent labels the plain CRF keeps (NerModel.tagGibbs)") {
    // Build a doc where the same surface appears twice; the default model
    // tags both consistently already, so fabricate inconsistency pressure by
    // checking the prior's effect on the factored score rather than tags:
    val (p, doc) = mkRandom(5, 3, 2, nFeat = 10, docLen = 4)
    val pots = Crf.logPotentials(doc, p)
    val words = IndexedSeq("acme", "x", "acme", "y")
    val prior = new Gibbs.ConsistencyPrior(words, 3, penalty = 50.0)
    val scorer = new Gibbs.FactoredScorer(Seq(new Gibbs.CrfScorer(pots, p), prior))
    val got = Gibbs.findBestUsingAnnealing(scorer,
      Gibbs.linearCooling(1.0, 120), Array(0, 1, 2, 1), seed = 7)
    // with an overwhelming prior the same-word positions MUST agree
    assert(got(0) == got(2), s"${got.toSeq}")
    // determinism: same seed, same answer
    val again = Gibbs.findBestUsingAnnealing(scorer,
      Gibbs.linearCooling(1.0, 120), Array(0, 1, 2, 1), seed = 7)
    assert(got.toSeq == again.toSeq)
  }
}
