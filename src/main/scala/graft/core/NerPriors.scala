package graft.core

/** The reference's empirical NER entity-consistency prior, ported as data +
  * scoring rules (reference: ie/EmpiricalNERPrior.java:13-283 over the
  * entity-extraction machinery of ie/EntityCachingAbstractSequencePrior.java:
  * 96-170). Used by Gibbs decoding under `-useNERPrior` next to the CRF via
  * FactoredScorer — a non-Markovian scorer whose window is the whole document.
  *
  * Semantics (scoreOf):
  *  - entities = maximal runs of the same non-background label; each entity
  *    records its `otherOccurrences` = every position (except its own start)
  *    where its word sequence repeats case-insensitively
  *    (EntityCachingAbstractSequencePrior.java:139-176);
  *  - for each entity and each other occurrence, the first entity overlapping
  *    the occurrence window is the comparison target; occurrences with no
  *    overlapping entity contribute nothing (EmpiricalNERPrior.java:92-109);
  *  - a pair is `exact` when the target's own otherOccurrences point back
  *    into this entity's span (:119-127);
  *  - exact pairs with differing lengths pay p1 per extra word when types
  *    agree, and (len1+len2)*p1 when they differ — EXCEPT the ORG-then-LOC
  *    direction, which the reference exempts through a duplicated-clause bug
  *    (both sides of the && at :134-135 test tag1==ORG && tag2==LOC, so
  *    LOC-then-ORG still pays); mirrored verbatim;
  *  - the per-pair type penalty is `length * matrix(tag1, tag2)` with the
  *    empirical CoNLL-count matrices at :26-69, where the same-type cells
  *    (and the commented-out cells) are zero. Types outside
  *    {LOC, ORG, PER, MISC} pay only the length-mismatch term.
  *
  * The reference's incremental entity cache is a pure optimization; this port
  * recomputes entities from the sequence, which is the cache's defining
  * invariant. `logScoresAt` mirrors the abstract class's scoresOf (:84-96):
  * set the label, rescore the whole document.
  */
object NerPriors {

  val ORG = "ORGANIZATION"
  val PER = "PERSON"
  val LOC = "LOCATION"
  val MISC = "MISC"

  // EmpiricalNERPrior.java:24-69 — penalties from empirical CoNLL counts.
  // pN numbering kept for auditability against the reference.
  private val p1 = -math.log(0.01)
  private val dem1 = 6631.0
  private val p3 = -math.log(188 / dem1) / 2.0
  private val p4 = -math.log(4 / dem1) / 2.0
  private val p5 = -math.log(3 / dem1) / 2.0
  private val dem2 = 3169.0
  private val p6 = -math.log(188.0 / dem2) / 2.0
  private val p8 = -math.log(5 / dem2) / 2.0
  private val p9 = -math.log(1 / dem2) / 2.0
  private val dem3 = 3151.0
  private val p10 = -math.log(4.0 / dem3) / 2.0
  private val p11 = -math.log(5 / dem3) / 2.0
  private val p13 = -math.log(1 / dem3) / 2.0
  private val dem4 = 2035.0
  private val p14 = -math.log(3.0 / dem4) / 2.0
  private val p15 = -math.log(1 / dem4) / 2.0
  private val p16 = -math.log(1 / dem4) / 2.0
  private val dem5 = 724.0
  private val p20 = -math.log(5.0 / dem5)
  private val p21 = -math.log(224.0 / dem5)
  private val dem6 = 834.0
  private val p22 = -math.log(6.0 / dem6)
  private val p24 = -math.log(2.0 / dem6)
  private val p25 = -math.log(7.0 / dem6)
  private val dem7 = 1978.0
  private val p26 = -math.log(1.0 / dem7)
  private val p27 = -math.log(22.0 / dem7)
  private val p29 = -math.log(14.0 / dem7)
  private val dem8 = 622.0
  private val p30 = -math.log(63.0 / dem8)
  private val p31 = -math.log(191.0 / dem8)
  private val p32 = -math.log(3.0 / dem8)
  private val p33 = -math.log(365.0 / dem8)

  private val types = Array(LOC, ORG, PER, MISC)
  private def typeIdx(tag: String): Int = types.indexOf(tag) // -1 = other

  // matrix(tag1)(tag2); zeros where the reference commented the term out
  // (same-type cells and LOC-LOC/ORG-ORG/... diagonals)
  private val exactPenalty: Array[Array[Double]] = Array(
    Array(0.0, p3, p4, p5),    // LOC vs (LOC, ORG, PER, MISC)
    Array(p6, 0.0, p8, p9),    // ORG
    Array(p10, p11, 0.0, p13), // PER
    Array(p14, p15, p16, 0.0)) // MISC
  private val inexactPenalty: Array[Array[Double]] = Array(
    Array(0.0, 0.0, p20, p21), // LOC (p18/p19 commented out)
    Array(p22, 0.0, p24, p25), // ORG (p23 commented out)
    Array(p26, p27, 0.0, p29), // PER (p28 commented out)
    Array(p30, p31, p32, p33)) // MISC (all four active)

  /** One extracted entity: label id, start, word span, other occurrences. */
  final case class Entity(tpe: Int, start: Int, words: IndexedSeq[String], other: Array[Int])

  final class EmpiricalNerPrior(words: IndexedSeq[String], classIndex: IndexedSeq[String],
      background: String) extends Gibbs.SequenceScorer {
    require(classIndex.contains(background))
    private val bg = classIndex.indexOf(background)
    def length: Int = words.length
    def numClasses: Int = classIndex.size

    // candidate positions per case-canonical first word: turns each
    // otherOccurrences computation from an O(L) scan into a lookup over the
    // (few) positions sharing the word — the words are FIXED for a given
    // prior instance, so this is built once (review finding: the from-scratch
    // rescan made long-document Gibbs quadratic per extraction). Canonical
    // form per char mirrors equalsIgnoreCase's per-char rule, and matches()
    // still verifies with equalsIgnoreCase itself.
    private def canon(s: String): String = {
      val a = new Array[Char](s.length)
      var i = 0
      while (i < s.length) {
        a(i) = Character.toLowerCase(Character.toUpperCase(s.charAt(i))); i += 1
      }
      new String(a)
    }
    private val positionsByCanon: Map[String, Array[Int]] =
      words.indices.groupBy(i => canon(words(i)))
        .map { case (k, v) => k -> v.toArray }

    /** Case-insensitive word-sequence match at `position`
      * (EntityCachingAbstractSequencePrior.matches, :162-176).
      */
    private def matches(ewords: IndexedSeq[String], position: Int): Boolean = {
      if (!words(position).equalsIgnoreCase(ewords(0))) return false
      var j = 1
      while (j < ewords.length) {
        if (position + j >= words.length) return false
        if (!words(position + j).equalsIgnoreCase(ewords(j))) return false
        j += 1
      }
      true
    }

    /** Position-indexed entity array for `seq` (setInitialSequence /
      * extractEntity / otherOccurrences, :97-160).
      */
    private def extract(seq: Array[Int]): Array[Entity] = {
      val out = new Array[Entity](seq.length)
      var i = 0
      while (i < seq.length) {
        if (seq(i) != bg) {
          var j = i + 1
          while (j < seq.length && seq(j) == seq(i)) j += 1
          val ew = (i until j).map(words)
          val other = positionsByCanon.getOrElse(canon(ew(0)), Array.emptyIntArray)
            .filter(p => p != i && matches(ew, p))
          val e = Entity(seq(i), i, ew, other)
          var k = i
          while (k < j) { out(k) = e; k += 1 }
          i = j
        } else i += 1
      }
      out
    }

    def scoreOf(seq: Array[Int]): Double = {
      val entities = extract(seq)
      var p = 0.0
      var i = 0
      while (i < entities.length) {
        val entity = entities(i)
        if (entity != null && (i == 0 || (entities(i - 1) ne entity))) {
          val len = entity.words.length
          val t1 = typeIdx(classIndex(entity.tpe))
          var oi = 0
          while (oi < entity.other.length) {
            val start = entity.other(oi)
            // first entity overlapping the occurrence window (:93-101)
            var otherEntity: Entity = null
            var k = start
            while (k < start + len && k < entities.length && otherEntity == null) {
              otherEntity = entities(k)
              k += 1
            }
            if (otherEntity != null) {
              val oLen = otherEntity.words.length
              val t2 = typeIdx(classIndex(otherEntity.tpe))
              var exact = false
              val oOther = otherEntity.other
              var m = 0
              while (m < oOther.length && !exact) {
                if (oOther(m) >= i && oOther(m) <= i + len - 1) exact = true
                m += 1
              }
              if (exact) {
                if (len != oLen) {
                  if (entity.tpe == otherEntity.tpe) p -= math.abs(oLen - len) * p1
                  // reference quirk (:134-135): both clauses of the && test
                  // the SAME direction, so only ORG-then-LOC is exempt
                  else if (!(t1 == 1 && t2 == 0)) p -= (oLen + len) * p1
                }
                if (t1 >= 0 && t2 >= 0) p -= len * exactPenalty(t1)(t2)
              } else {
                if (t1 >= 0 && t2 >= 0) p -= len * inexactPenalty(t1)(t2)
              }
            }
            oi += 1
          }
        }
        i += 1
      }
      p
    }

    def logScoresAt(seq: Array[Int], pos: Int): Array[Double] = {
      val out = new Array[Double](numClasses)
      val orig = seq(pos)
      var c = 0
      while (c < numClasses) {
        seq(pos) = c
        out(c) = scoreOf(seq)
        c += 1
      }
      seq(pos) = orig
      out
    }
  }
}
