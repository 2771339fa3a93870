package graft.tools

import graft.ner.{RefBinaryModel, RefTextModel}

/** Ad-hoc check: load the reference-trained BINARY bundle (ref.ser.gz) and
  * the TEXT export (ref.txt.gz) of the same training run, compare dictionaries
  * and weights exactly, and report the serialized knownLCWords size.
  * Usage: sbt "runMain graft.tools.RefBinaryCheck [/tmp/refbridge]"
  */
object RefBinaryCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/refbridge")
    val bin = RefBinaryModel.load(s"$dir/ref.ser.gz")
    println(s"[binary] features=${bin.numFeatures} classes=${bin.classIndex.mkString(",")} " +
      s"window=${bin.layout.windowSize} knownLC=${bin.knownLC.size}")
    val txt = RefTextModel.load(s"$dir/ref.txt.gz", knownLC = bin.knownLC)
    require(txt.classIndex.sameElements(bin.classIndex), "classIndex mismatch")
    require(txt.numFeatures == bin.numFeatures, s"features ${txt.numFeatures} != ${bin.numFeatures}")
    var diff = 0
    txt.featureIndex.forEach { (k, v) =>
      val bv = bin.featureIndex.get(k)
      if (bv == null || bv != v) diff += 1
    }
    require(diff == 0, s"$diff feature ids differ")
    var wdiff = 0
    for (f <- 0 until txt.numFeatures)
      if (!java.util.Arrays.equals(txt.weights(f), bin.weights(f))) wdiff += 1
    println(s"[binary] weight rows differing from text export: $wdiff (text is %.8g-rounded)")
    val sample = Vector("Alice", "monday", "tuesday", "the")
    println(s"[binary] knownLC sample hits: ${sample.map(w => s"$w=${bin.knownLC.contains(w.toLowerCase)}").mkString(" ")}")
    println(s"[binary] tag smoke: ${bin.tag(Vector("Alice", "Johnson", "works", "at", "Acme", "Corp.", "in", "Berlin", ".")).mkString(" ")}")
  }
}
