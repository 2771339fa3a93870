package graft.ner

import graft.train.WeightLayout
import java.io.{BufferedReader, InputStreamReader}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

/** Loader for the reference's gzip TEXT model format — "the parity bridge"
  * (SURVEY.md §2.1): a classifier trained by the reference
  * (`-serializeToText`, CRFClassifier.serializeTextClassifier,
  * /root/reference/src/edu/stanford/nlp/ie/crf/CRFClassifier.java:1480-1536)
  * loads directly into our engine, so reference-trained weights drive OUR
  * feature extraction + Viterbi. Tag agreement with the reference's own
  * output then proves the feature templates are byte-exact (a wrong template
  * string hashes to a missing dictionary entry and changes scores).
  *
  * Sections: labelIndices (per clique group, label windows oldest→newest as
  * classIndex ids), classIndex, featureIndex, <flags> (skipped — we know the
  * preset), <featureFactory>, <windowSize>, weights (one row per feature,
  * column k = labelIndices[group(f)][k]).
  *
  * knownLCWords is NOT part of the text format (only the binary one); the
  * caller supplies it — the reference's effective set at tagging time is
  * lowercase-initial words of train ∪ test corpora (ObjectBankWrapper's
  * pre-pass, ObjectBankWrapper.java:46-68).
  */
object RefTextModel {

  def load(path: String, knownLC: Set[String], gazette: Gazette = Gazette.empty): NerModel = {
    val r = new BufferedReader(new InputStreamReader(
      new GZIPInputStream(Files.newInputStream(Paths.get(path))), "UTF-8"))
    try {
      def intAfterTab(line: String): Int = line.split("\t")(1).trim.toInt
      val numGroups = intAfterTab(r.readLine()) // labelIndices.length
      val labelWindows = Array.tabulate(numGroups) { g =>
        val size = intAfterTab(r.readLine())
        Array.tabulate(size) { _ =>
          val parts = r.readLine().split("\t")
          parts(1).trim.split(" ").map(_.toInt) // oldest -> newest
        }
      }
      val numClasses = intAfterTab(r.readLine())
      val classIndex = Array.tabulate(numClasses) { _ =>
        val l = r.readLine(); l.substring(l.indexOf('\t') + 1)
      }
      val numFeatures = intAfterTab(r.readLine())
      val featureIndex = new java.util.HashMap[String, Integer](numFeatures * 2)
      val featStrings = new Array[String](numFeatures)
      var f = 0
      while (f < numFeatures) {
        val l = r.readLine()
        featStrings(f) = l.substring(l.indexOf('\t') + 1)
        featureIndex.put(featStrings(f), Integer.valueOf(f))
        f += 1
      }
      // skip <flags> ... </flags>, <featureFactory>, read <windowSize>
      var line = r.readLine()
      while (line != null && !line.startsWith("<windowSize>")) line = r.readLine()
      val windowSize = line.replace("<windowSize>", "").replace("</windowSize>", "").trim.toInt
      require(windowSize == numGroups, s"windowSize $windowSize != labelIndices groups $numGroups")
      val wCount = intAfterTab(r.readLine())
      require(wCount == numFeatures, s"weights rows $wCount != features $numFeatures")
      val weights = new Array[Array[Double]](numFeatures)
      f = 0
      while (f < numFeatures) {
        val l = r.readLine()
        weights(f) = l.substring(l.indexOf('\t') + 1).split(" ").map(_.toDouble)
        f += 1
      }
      RefModelAssembly.build(labelWindows, classIndex, featStrings, windowSize, weights,
        knownLC, gazette)
    } finally r.close()
  }
}

/** Shared assembly of a reference model bundle (text OR binary serialization)
  * into our NerModel: clique group from the feature suffix, observed-only
  * label-window columns, weight layout.
  */
private[ner] object RefModelAssembly {

  def build(
      labelWindows: Array[Array[Array[Int]]],
      classIndex: Array[String],
      featStrings: Array[String],
      windowSize: Int,
      weights: Array[Array[Double]],
      knownLC: Set[String],
      gazette: Gazette = Gazette.empty,
      normalizeTerms: Boolean = false,
      useOccurrencePatterns: Boolean = false,
      useReverse: Boolean = false,
      distSim: Option[DistSim] = None,
      useTags: Boolean = false,
      useTaggySequences: Boolean = false,
      useParenMatching: Boolean = false,
      ngramOpts: NerFeatures.NgramOpts = NerFeatures.NgramOpts.default,
      disjunctionWidth: Int = 4,
      miscOpts: NerFeatures.MiscOpts = NerFeatures.MiscOpts.default): NerModel = {
    val numGroups = labelWindows.length
    val numClasses = classIndex.length
    require(windowSize == numGroups, s"windowSize $windowSize != labelIndices groups $numGroups")
    require(weights.length == featStrings.length,
      s"weights rows ${weights.length} != features ${featStrings.length}")
    val featureIndex = new java.util.HashMap[String, Integer](featStrings.length * 2)
    featStrings.zipWithIndex.foreach { case (s, i) => featureIndex.put(s, Integer.valueOf(i)) }
    // clique group from the feature suffix after the last '|'
    val groupOfSuffix = Map("C" -> 0, "CpC" -> 1, "CnC" -> 1,
      "Cp2C" -> 2, "CpCp2C" -> 2, "CpCnC" -> 2,
      "Cp3C" -> 3, "CpCp2Cp3C" -> 3, "Cp4C" -> 4, "CpCp2Cp3Cp4C" -> 4, "Cp5C" -> 5)
    val featGroup = featStrings.map { s =>
      val sfx = s.substring(s.lastIndexOf('|') + 1)
      groupOfSuffix.getOrElse(sfx, throw new IllegalArgumentException(s"unknown clique suffix in '$s'"))
    }
    // weightCol(g): mixed-radix window encoding -> column (observed-only
    // windows get columns; the rest stay -1 = forbidden, matching the
    // reference's NEGATIVE_INFINITY-filled FactorTable, FactorTable.java:28)
    val weightCol = Array.tabulate(numGroups) { g =>
      val cols = Array.fill(graft.core.Crf.pow(numClasses, g + 1))(-1)
      labelWindows(g).zipWithIndex.foreach { case (win, k) =>
        require(win.length == g + 1, s"group $g window length ${win.length}")
        var enc = 0
        win.foreach(y => enc = enc * numClasses + y)
        cols(enc) = k
      }
      cols
    }
    val numCols = Array.tabulate(numGroups)(g => labelWindows(g).length)
    featGroup.zipWithIndex.foreach { case (g, i) =>
      require(weights(i).length == numCols(g),
        s"feature $i '${featStrings(i)}' group $g: row ${weights(i).length} != ${numCols(g)}")
    }
    val layout = new WeightLayout(numClasses, windowSize,
      classIndex.indexOf("O"), featGroup, weightCol, numCols)
    new NerModel(classIndex, classIndex.indexOf("O"), featureIndex, layout, weights, knownLC,
      gazette, normalizeTerms, useOccurrencePatterns, useReverse, distSim,
      useTags, useTaggySequences, useParenMatching, ngramOpts, disjunctionWidth, miscOpts)
  }
}
