package graft.train

/** The reference's FLOAT training objective, mirrored op-for-op — the
  * `-useFloat` path (CRFClassifier.java:987-1020):
  * `CRFLogConditionalObjectiveFloatFunction.calculate`
  * (CRFLogConditionalObjectiveFloatFunction.java:232-330) over
  * `FloatFactorTable` arithmetic (FloatFactorTable.java), with
  * `SloppyMath.logAdd(float,float)` / `ArrayMath.logSum(float[])` truncating
  * at LOGTOLERANCE_F = 20 (SloppyMath.java:197,215-233; ArrayMath.java:
  * 895-927) — a different tolerance than the double path's 30, and single
  * precision throughout (the variant exists as the reference's memory lever
  * for large feature spaces).
  *
  * Semantics mirrored exactly, pinned bit-level by RefFloatObjectiveSpec
  * against the compiled reference on fixed weight vectors:
  *   - value = -Σ_docs Σ_i conditionalLogProb(window | previous) over the
  *     CALIBRATED float clique tree (float accumulation in doc order);
  *   - gradient = E - Ehat + w/σ² (QUADRATIC prior; value adds w²/2σ²
  *     through double intermediates exactly like the Java expression);
  *   - E from exp(unnormalizedLogProbEnd - z) per clique labeling, float;
  *   - Ehat = float-incremented empirical counts (exact: integer-valued
  *     floats below 2^24, so accumulation order is immaterial);
  *   - logAdd/logSum keep the reference's op order: double `intermediate`
  *     accumulator, `(float) Math.log(1.0 + …)` cast BEFORE the final add,
  *     first-max index skipping, strict `>` cutoff comparisons.
  *
  * Layout: weights/gradients are flat per `WeightLayout.featOffset`, the
  * same feature-major/column-ascending packing as the reference's
  * domainDimension (to1D/to2D, CRFLogConditionalObjectiveFloatFunction
  * .java:80-99). Column k of group g corresponds to labelIndices[g].get(k);
  * `colWindows` inverts `WeightLayout.weightCol` to recover each column's
  * label window in index order.
  */
object FloatObjective {

  private final val LogToleranceF = 20.0f
  private final val NegInfF = Float.NegativeInfinity

  /** SloppyMath.logAdd(float, float) — SloppyMath.java:215-233. */
  def logAddF(lx: Float, ly: Float): Float = {
    var max = 0.0f; var negDiff = 0.0f
    if (lx > ly) { max = lx; negDiff = ly - lx } else { max = ly; negDiff = lx - ly }
    if (max == Float.NegativeInfinity) max
    else if (negDiff < -LogToleranceF) max
    else max + math.log(1.0 + math.exp(negDiff.toDouble)).toFloat
  }

  /** ArrayMath.logSum(float[]) over a strided view — ArrayMath.java:895-927
    * (double `intermediate`, float cutoff at max-20, first-max skipped).
    */
  private def logSumStridedF(t: Array[Float], start: Int, stride: Int, count: Int): Float = {
    var maxIdx = 0
    var max = t(start)
    var i = 1
    while (i < count) {
      val v = t(start + i * stride)
      if (v > max) { maxIdx = i; max = v }
      i += 1
    }
    var haveTerms = false
    var intermediate = 0.0
    val cutoff = max - LogToleranceF
    i = 0
    while (i < count) {
      val v = t(start + i * stride)
      if (i != maxIdx && v > cutoff) { haveTerms = true; intermediate += math.exp((v - max).toDouble) }
      i += 1
    }
    if (haveTerms) max + math.log(1.0 + intermediate).toFloat else max
  }

  /** labelIndices[g].get(k) for every column: invert `weightCol`. */
  def colWindows(layout: WeightLayout): Array[Array[Array[Int]]] = {
    val C = layout.numClasses
    Array.tabulate(layout.windowSize) { g =>
      val inv = new Array[Array[Int]](layout.numCols(g))
      val wc = layout.weightCol(g)
      var enc = 0
      while (enc < wc.length) {
        val k = wc(enc)
        if (k >= 0) {
          val digits = new Array[Int](g + 1)
          var e = enc; var d = g
          while (d >= 0) { digits(d) = e % C; e /= C; d -= 1 }
          inv(k) = digits
        }
        enc += 1
      }
      inv
    }
  }

  /** Per-document Ehat contribution (empiricalCounts,
    * CRFLogConditionalObjectiveFloatFunction.java:112-137): the gold label
    * window slides from an all-background start; each clique's features
    * increment their gold column.
    */
  def ehatDoc(doc: Array[Array[Array[Int]]], labels: Array[Int],
      layout: WeightLayout, ehat: Array[Float]): Unit = {
    val W = layout.windowSize
    val C = layout.numClasses
    val label = Array.fill(W)(layout.backgroundIndex)
    var i = 0
    while (i < doc.length) {
      System.arraycopy(label, 1, label, 0, W - 1)
      label(W - 1) = labels(i)
      var j = 0
      while (j < doc(i).length) {
        var enc = 0
        var d = W - 1 - j
        while (d < W) { enc = enc * C + label(d); d += 1 }
        val k = layout.weightCol(j)(enc)
        require(k >= 0, s"gold label window $enc unobserved for clique $j")
        val feats = doc(i)(j)
        var m = 0
        while (m < feats.length) { ehat(layout.featOffset(feats(m)) + k) += 1.0f; m += 1 }
        j += 1
      }
      i += 1
    }
  }

  /** One document's objective contribution in float: calibrate the float
    * clique tree, accumulate the conditional-chain log prob (returned) and
    * the model expectations into `e`. Mirrors calculate()'s per-document
    * body (CRFLogConditionalObjectiveFloatFunction.java:243-286).
    */
  /** Mutable float accumulator: `prob` must accumulate in ONE chain across
    * all docs and positions (float addition is non-associative; per-doc
    * subtotals would change the bits vs the reference's single `prob +=`).
    */
  final class FloatAcc { var v: Float = 0.0f }

  def docContrib(doc: Array[Array[Array[Int]]], weightsFlat: Array[Float],
      layout: WeightLayout, cols: Array[Array[Array[Int]]],
      labels: Array[Int], e: Array[Float], acc: FloatAcc): Unit = {
    val W = layout.windowSize
    val C = layout.numClasses
    val full = graft.core.Crf.pow(C, W)
    val n = doc.length
    if (n == 0) return

    // ---- getFloatFactorTable per position (ascending j, multiplyInEnd) ----
    val tables = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      var prev: Array[Float] = null
      var prevSize = 0
      var j = 0
      while (j < W) {
        val size = graft.core.Crf.pow(C, j + 1)
        val ft = Array.fill(size)(NegInfF)
        val kcols = cols(j)
        val feats = doc(i)(j)
        var k = 0
        while (k < kcols.length) {
          val digits = kcols(k)
          var weight = 0.0f
          var m = 0
          while (m < feats.length) { weight += weightsFlat(layout.featOffset(feats(m)) + k); m += 1 }
          var idx = 0
          var d = 0
          while (d < digits.length) { idx = idx * C + digits(d); d += 1 }
          ft(idx) = weight
          k += 1
        }
        if (j > 0) { var x = 0; while (x < size) { ft(x) += prev(x % prevSize); x += 1 } }
        prev = ft; prevSize = size
        j += 1
      }
      tables(i) = prev
      i += 1
    }

    // ---- calibration (getCalibratedCliqueTree, float) ----
    val sep = full / C
    val msgs = new Array[Array[Float]](math.max(0, n - 1))
    def sumOutFront(t: Array[Float]): Array[Float] = {
      val r = Array.fill(sep)(NegInfF)
      var x = 0
      while (x < full) { val j = x % sep; r(j) = logAddF(r(j), t(x)); x += 1 }
      r
    }
    def sumOutEnd(t: Array[Float]): Array[Float] = {
      val r = Array.fill(sep)(NegInfF)
      var x = 0
      while (x < full) { val j = x / C; r(j) = logAddF(r(j), t(x)); x += 1 }
      r
    }
    i = 1
    while (i < n) {
      msgs(i - 1) = sumOutFront(tables(i - 1))
      val t = tables(i); val m = msgs(i - 1)
      var x = 0
      while (x < full) { t(x) += m(x / C); x += 1 }
      i += 1
    }
    i = n - 2
    while (i >= 0) {
      val so = sumOutEnd(tables(i + 1))
      val m = msgs(i)
      var x = 0
      while (x < sep) {
        if (so(x) != Float.NegativeInfinity || m(x) != Float.NegativeInfinity) so(x) -= m(x)
        x += 1
      }
      val t = tables(i)
      x = 0
      while (x < full) { t(x) += so(x % sep); x += 1 }
      i -= 1
    }

    // ---- value: conditional chain from the calibrated tables ----
    val z = logSumStridedF(tables(0), 0, 1, full)
    val given = Array.fill(W - 1)(layout.backgroundIndex)
    i = 0
    while (i < n) {
      var base = 0
      var d = 0
      while (d < W - 1) { base = base * C + given(d); d += 1 }
      val z2 = logSumStridedF(tables(i), base * C, 1, C)
      acc.v += tables(i)(base * C + labels(i)) - z2
      System.arraycopy(given, 1, given, 0, W - 2)
      given(W - 2) = labels(i)
      i += 1
    }

    // ---- E: model expectations per clique labeling ----
    i = 0
    while (i < n) {
      var j = 0
      while (j < doc(i).length) {
        val kcols = cols(j)
        val feats = doc(i)(j)
        var k = 0
        while (k < kcols.length) {
          val digits = kcols(k)
          var idx = 0
          var d = 0
          while (d < digits.length) { idx = idx * C + digits(d); d += 1 }
          val offset = graft.core.Crf.pow(C, digits.length)
          val u = logSumStridedF(tables(i), idx, offset, full / offset)
          val p = math.exp((u - z).toDouble).toFloat
          var m = 0
          while (m < feats.length) { e(layout.featOffset(feats(m)) + k) += p; m += 1 }
          k += 1
        }
        j += 1
      }
      i += 1
    }
  }

  /** Sequential (doc-order-faithful) full objective: value + gradient with
    * the QUADRATIC prior, float accumulation exactly like the reference's
    * calculate(). Used by the bit-level differential and small fits; the
    * distributed training path aggregates the same per-doc contributions
    * per-partition (float sums reassociated — documented, training-only).
    */
  def valueAndGrad(docs: IndexedSeq[(Array[Array[Array[Int]]], Array[Int])],
      weightsFlat: Array[Float], layout: WeightLayout,
      sigma: Float): (Float, Array[Float]) = {
    val n = layout.totalSize
    require(weightsFlat.length == n)
    val cols = colWindows(layout)
    val ehat = new Array[Float](n)
    docs.foreach { case (d, l) => ehatDoc(d, l, layout, ehat) }
    val e = new Array[Float](n)
    val acc = new FloatAcc
    docs.foreach { case (d, l) => docContrib(d, weightsFlat, layout, cols, l, e, acc) }
    finish(acc.v, e, ehat, weightsFlat, sigma)
  }

  /** The objective tail: derivative = E - Ehat + QUADRATIC prior, value =
    * -prob + Σ w²/2σ² through the reference's exact float/double op chain.
    */
  def finish(probSum: Float, e: Array[Float], ehat: Array[Float],
      weightsFlat: Array[Float], sigma: Float): (Float, Array[Float]) = {
    val n = e.length
    var value = -probSum
    val deriv = new Array[Float](n)
    var i = 0
    while (i < n) { deriv(i) = e(i) - ehat(i); i += 1 }
    val sigmaSq = sigma * sigma
    i = 0
    while (i < n) {
      val w = weightsFlat(i)
      value = (value + (1.0f * w * w / 2.0 / sigmaSq)).toFloat // Java: float op chain widens at /2.0
      deriv(i) += 1.0f * w / sigmaSq
      i += 1
    }
    (value, deriv)
  }
}
