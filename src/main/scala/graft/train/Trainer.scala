package graft.train

import breeze.linalg.DenseVector
import breeze.optimize.{DiffFunction, LBFGS}
import graft.core.Crf
import graft.ner.{Gazette, NerFeatures, NerModel}
import graft.text.WordShape
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** One training document: token words + gold labels (IO encoding, background
  * "O"), pre-tokenized — the unit the reference's column reader produces
  * (/root/reference/src/edu/stanford/nlp/sequences/ColumnDocumentReaderAndWriter.java:46-72).
  */
final case class LabeledDoc(words: Seq[String], labels: Seq[String])

/** Distributed CRF training: dictionary-build jobs + L-BFGS on the driver over
  * a `treeAggregate`d (value, gradient) — the classic Spark convex-optimization
  * shape (same as mllib.optimization.LBFGS). Semantics follow
  * CRFClassifier.train (/root/reference/src/edu/stanford/nlp/ie/crf/CRFClassifier.java:936-1108)
  * with the quadratic prior (sigma) of CRFLogConditionalObjectiveFunction.java:237-253.
  *
  * Scale notes (100 TB corpus): every per-iteration pass is a single map over
  * the cached encoded Dataset with a depth-2 tree reduction of the flat
  * gradient; the feature dictionary is built with a distributed distinct and
  * only the distinct feature strings are collected. At very large feature
  * counts, swap the driver-side zipWithIndex for a sorted zipWithIndex job and
  * a broadcast-hash dictionary join; the interfaces here don't change.
  */
object Trainer {

  final case class Config(
      sigma: Double = 20.0, // conllNoTags preset (SeqClassifierFlags.java:717)
      tolerance: Double = 1e-4, // flags.tolerance default (SeqClassifierFlags.java:67)
      maxIterations: Int = 200,
      lbfgsMemory: Int = 15, // QNsize under conllNoTags (SeqClassifierFlags.java:732)
      background: String = "O",
      // conllNoTags sets useObservedSequencesOnly (SeqClassifierFlags.java:690):
      // label windows never seen in training are forbidden (-inf factor entries,
      // matching the reference's NEGATIVE_INFINITY-initialized FactorTable) and
      // carry no weight columns.
      observedSequencesOnly: Boolean = true,
      // useGazettes: TYPE-GAZn features from a broadcast gazette, sloppy/clean
      // per the Gazette's modes (NERFeatureFactory.java:675-727,1211-1232)
      gazette: Gazette = Gazette.empty)

  def train(spark: SparkSession, docs: Dataset[LabeledDoc], cfg: Config = Config()): NerModel = {
    import spark.implicits._
    val sc = spark.sparkContext
    docs.cache()

    // Pass 1: corpus-derived known-lowercase words (ObjectBankWrapper.java:46-68).
    // Subtlety: the reference's pre-pass iterates through processDocument, so
    // it sees TIMEX-FIXED words — "Monday" is collected as "monday" and the
    // later shape pass emits "WT-Xxk" for weekday tokens. Collect fixed words.
    val knownLC: Set[String] = docs
      .flatMap(_.words.iterator.map(WordShape.fixWord)
        .filter(w => w.nonEmpty && Character.isLowerCase(w.charAt(0))))
      .distinct().collect().toSet

    // Class index: background first (index 0), then remaining labels sorted.
    val labels = docs.flatMap(_.labels).distinct().collect().sorted
    val classIndex = (cfg.background +: labels.filterNot(_ == cfg.background)).toArray
    val classOf = classIndex.zipWithIndex.toMap
    val bcastKnownLC = sc.broadcast(knownLC)
    val bcastGaz = sc.broadcast(cfg.gazette)

    // Pass 2: distinct (group, feature) strings -> driver-assembled dictionary.
    val distinctFeats: Array[(Int, String)] = docs
      .flatMap { d =>
        val toks = preprocess(d.words.toIndexedSeq, bcastKnownLC.value)
        (0 until toks.length).iterator.flatMap { pos =>
          val byGroup = NerFeatures.featuresAt(toks, pos, bcastGaz.value)
          byGroup.iterator.zipWithIndex.flatMap { case (fs, g) => fs.iterator.map(f => (g, f)) }
        }
      }
      .distinct().collect()
    // deterministic ids: sort by (group, feature string)
    val sorted = distinctFeats.sortBy(t => (t._1, t._2))
    val featureIndex = new java.util.HashMap[String, Integer](sorted.length * 2)
    val featGroup = new Array[Int](sorted.length)
    var f = 0
    while (f < sorted.length) {
      featureIndex.put(sorted(f)._2, Integer.valueOf(f))
      featGroup(f) = sorted(f)._1
      f += 1
    }
    val numClasses = classIndex.length
    val w = NerFeatures.WindowSize
    val layout =
      if (!cfg.observedSequencesOnly) WeightLayout.fullProduct(numClasses, w, 0, featGroup)
      else {
        // observed label windows per clique group (CRFClassifier.java:482-489)
        val classOfB = sc.broadcast(classOf)
        val observed: Array[(Int, Int)] = docs.flatMap { d =>
          val ids = d.labels.map(classOfB.value).toArray
          (0 until ids.length).iterator.flatMap { pos =>
            (0 until w).iterator.map { g =>
              var enc = 0
              var i = pos - g
              while (i <= pos) { enc = enc * numClasses + (if (i < 0) 0 else ids(i)); i += 1 }
              (g, enc)
            }
          }
        }.distinct().collect()
        val weightCol = Array.tabulate(w) { g =>
          val cols = Array.fill(graft.core.Crf.pow(numClasses, g + 1))(-1)
          observed.filter(_._1 == g).map(_._2).sorted.zipWithIndex
            .foreach { case (enc, k) => cols(enc) = k }
          cols
        }
        val numCols = weightCol.map(_.count(_ >= 0))
        new WeightLayout(numClasses, w, 0, featGroup, weightCol, numCols)
      }
    val bcastDict = sc.broadcast(featureIndex)

    // Pass 3: encode the corpus once and cache it (reference: documentsToDataAndLabels,
    // CRFClassifier.java:313-348 — its in-RAM int[][][][] becomes a cached Dataset).
    implicit val encEnc: Encoder[(Array[Array[Array[Int]]], Array[Int])] =
      Encoders.kryo[(Array[Array[Array[Int]]], Array[Int])]
    val nDocs = docs.count()
    val parts = math.max(1, math.min(sc.defaultParallelism, (nDocs / 50 + 1).toInt))
    val encoded = docs
      .repartition(parts)
      .map { d =>
        val toks = preprocess(d.words.toIndexedSeq, bcastKnownLC.value)
        val dict = bcastDict.value
        val enc = encodeWith(toks, dict, bcastGaz.value)
        (enc, d.labels.map(classOf).toArray)
      }
      .cache()
    encoded.count() // materialize
    docs.unpersist()

    val bLayout = sc.broadcast(layout)
    val n = layout.totalSize
    val lbfgs = new LBFGS[DenseVector[Double]](
      maxIter = cfg.maxIterations, m = cfg.lbfgsMemory, tolerance = cfg.tolerance)
    val sigmaSq = cfg.sigma * cfg.sigma

    val diff = new DiffFunction[DenseVector[Double]] {
      def calculate(x: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val bw = sc.broadcast(x.data)
        // locals only: referencing the enclosing DiffFunction's fields from the
        // task closures would pull this (non-serializable) object into the task
        val layoutRef = bLayout
        val partials = encoded.rdd.mapPartitions { it =>
          val lay = layoutRef.value
          val p = lay.params(bw.value) // ragged view built once per partition
          val g = new Array[Double](lay.totalSize)
          var v = 0.0
          it.foreach { case (doc, lab) => v += CrfObjective.docValueGrad(doc, lab, p, lay, g) }
          Iterator.single((v, g))
        }
        val (value, grad) = partials.treeReduce(
          { case ((v1, g1), (v2, g2)) =>
            var i = 0
            while (i < g1.length) { g1(i) += g2(i); i += 1 }
            (v1 + v2, g1)
          },
          depth = 2)
        bw.destroy()
        val g = if (grad == null) new Array[Double](n) else grad
        // quadratic prior
        var v = value
        var i = 0
        while (i < n) {
          val xi = x.data(i)
          v += xi * xi / (2.0 * sigmaSq)
          g(i) += xi / sigmaSq
          i += 1
        }
        (v, DenseVector(g))
      }
    }

    val x0 = DenseVector.zeros[Double](n)
    val xStar = lbfgs.minimize(diff, x0)
    encoded.unpersist()
    val weights = layout.toRagged(xStar.data)
    new NerModel(classIndex, 0, featureIndex, layout, weights, knownLC, cfg.gazette)
  }

  /** Shared preprocessing: shape from the original word (frozen knownLC), then
    * timex fix — identical to NerModel.preprocess but usable pre-model.
    */
  def preprocess(words: IndexedSeq[String], knownLC: Set[String]): IndexedSeq[NerFeatures.Tok] =
    words.map(w => NerFeatures.Tok(WordShape.fixWord(w), WordShape.dan2(w, knownLC.contains)))

  def encodeWith(toks: IndexedSeq[NerFeatures.Tok], dict: java.util.HashMap[String, Integer],
      gaz: Gazette = Gazette.empty): Crf.EncodedDoc = {
    val out = new Array[Array[Array[Int]]](toks.length)
    var pos = 0
    while (pos < toks.length) {
      out(pos) = NerFeatures.featuresAt(toks, pos, gaz).map { feats =>
        val b = new scala.collection.mutable.ArrayBuilder.ofInt
        var k = 0
        while (k < feats.length) {
          val id = dict.get(feats(k))
          if (id != null) b += id.intValue
          k += 1
        }
        b.result()
      }
      pos += 1
    }
    out
  }
}
