package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Differential for the `-searchGraphPrefix` lattice surface
  * (AbstractSequenceClassifier.classifyAndWriteViterbiSearchGraph →
  * ViterbiSearchGraphBuilder → DFSA.printAttFsmFormat) and for the maxLeft-1
  * (windowSize-2) model-loading capability it rides on.
  *
  * The reference's builder CRASHES for every windowSize-3 model (AIOOBE at
  * ViterbiSearchGraphBuilder.java:123 — the pad layer is allocated 1-sized
  * while predTag ranges over all classes), so the only models with reference
  * lattice output are maxLeft-1 ones; this spec trains such a model, writes
  * the reference's .lattice files, and compares our SearchGraph.attLattice
  * line by line: structure (ids, labels, topology, BFS line order) EXACTLY,
  * scores to 1e-9 absolute (observed max 4.8e-14 over 107,436 lines — pure
  * float-association noise; most lines are byte-exact as printed). Getting
  * here required reproducing the path's DOUBLE-WRAP quirk: getViterbiSearch
  * Graph re-runs ObjectBankWrapper.processDocument on the already-wrapped doc,
  * so shapes come from the timex-FIXED words (see SearchGraph.attLattice) —
  * without it, drift on month/day-bearing docs reached 2.92 nats.
  */
class RefLatticeSpec extends AnyFunSuite {

  private val refBuild = "/tmp/refbuild"
  private val dir = "/tmp/reflattice"
  private def crfClass = s"$refBuild/classes/edu/stanford/nlp/ie/crf/CRFClassifier.class"

  private def ensureRefCompiled(): Unit = {
    if (!Files.exists(Paths.get(crfClass))) {
      assume(Seq("bash", "-c",
        s"rm -rf $refBuild && mkdir -p $refBuild/classes && cp -r /root/reference/src $refBuild/src").! == 0)
      val tree = Paths.get(s"$refBuild/src/edu/stanford/nlp/trees/Tree.java")
      Files.writeString(tree, Files.readString(tree)
        .replace("return yield(", "return this.yield(")
        .replace("List<CoreLabel> s = yield();", "List<CoreLabel> s = this.yield();"))
      assume(Seq("bash", "-c",
        s"cd $refBuild && javac -nowarn -encoding UTF-8 -d classes $$(find src/edu -name '*.java') 2>javac.log").! == 0,
        "reference javac failed")
    }
  }

  private def ref(args: String*): Int =
    (Seq("java", "-Xmx4g", "-cp", s"$refBuild/classes",
      "edu.stanford.nlp.ie.crf.CRFClassifier") ++ args).!

  // maxLeft-1 training flags: word/prev/next context + real CpC coupling
  // (usePrevSequences) + dan2 shapes, timex fix on like every certified preset
  private val ml1Flags = Seq(
    "-map", "word=0,answer=1", "-wordShape", "dan2useLC",
    "-useWord", "true", "-usePrev", "true", "-useNext", "true",
    "-useSequences", "true", "-usePrevSequences", "true",
    "-normalizeTimex", "true", "-maxLeft", "1")

  private def lcWords(f: String): Set[String] = Files.readAllLines(Paths.get(s"$dir/$f")).asScala
    .filter(_.nonEmpty).map(l => graft.text.WordShape.fixWord(l.split("\t")(0)))
    .filter(w => w.nonEmpty && Character.isLowerCase(w.charAt(0))).toSet

  private def testDocs(): Vector[Vector[String]] = {
    val lines = Files.readAllLines(Paths.get(s"$dir/test.tsv")).asScala
    val b = Vector.newBuilder[Vector[String]]
    var cur = Vector.newBuilder[String]
    var any = false
    for (l <- lines) {
      if (l.trim.isEmpty) { if (any) b += cur.result(); cur = Vector.newBuilder; any = false }
      else { cur += l.split("\t")(0); any = true }
    }
    if (any) b += cur.result()
    b.result()
  }

  test("maxLeft-1 model trains in the reference, loads in our engine, and the reference emits lattices") {
    assume(Files.exists(Paths.get("/root/reference/src")), "reference source not present")
    ensureRefCompiled()
    graft.tools.RefFixtures.main(Array(dir))
    assert(ref(Seq("-trainFile", s"$dir/train.tsv", "-serializeTo", s"$dir/ml1.ser.gz") ++ ml1Flags: _*) == 0,
      "maxLeft-1 reference training failed")
    // tag run (for the tag-agreement leg) + search-graph run (for the lattice leg)
    val tagCmd = Seq("java", "-Xmx2g", "-cp", s"$refBuild/classes",
      "edu.stanford.nlp.ie.crf.CRFClassifier",
      "-loadClassifier", s"$dir/ml1.ser.gz", "-testFile", s"$dir/test.tsv")
    assert((tagCmd #> new java.io.File(s"$dir/ref_out.tsv")).! == 0, "reference tagging failed")
    assert(ref("-loadClassifier", s"$dir/ml1.ser.gz", "-testFile", s"$dir/test.tsv",
      "-searchGraphPrefix", s"$dir/sg") == 0, "reference search-graph run failed")
    assert(Files.exists(Paths.get(s"$dir/sg.0.lattice")), "no lattice output")
  }

  test("maxLeft-1 tag differential: our engine with the bridged weights reproduces the reference's tags") {
    assume(Files.exists(Paths.get(s"$dir/ref_out.tsv")), "lattice fixture run missing")
    val model = graft.ner.RefBinaryModel.load(s"$dir/ml1.ser.gz", extraKnownLC = lcWords("test.tsv"))
    assert(model.layout.windowSize == 2, s"expected windowSize 2, got ${model.layout.windowSize}")
    val refTags = graft.tools.RefCompare.parseRefOutput(Paths.get(s"$dir/ref_out.tsv"))
    val docs = testDocs()
    assert(docs.length == refTags.length, s"${docs.length} docs vs ${refTags.length} tagged docs")
    var agree = 0L; var total = 0L
    val bad = Vector.newBuilder[String]
    docs.zip(refTags).zipWithIndex.foreach { case ((words, theirs), d) =>
      val ours = model.tag(words)
      assert(ours.length == theirs.length, s"doc $d length")
      for (i <- ours.indices) {
        if (ours(i) == theirs(i)) agree += 1
        else bad += s"doc $d tok $i '${words(i)}': ours=${ours(i)} ref=${theirs(i)}"
        total += 1
      }
    }
    val agreement = agree.toDouble / total
    info(f"maxLeft-1 token agreement = $agreement%.5f over $total tokens")
    assert(agreement == 1.0, s"agreement $agreement; sample:\n${bad.result().take(8).mkString("\n")}")
  }

  test("LATTICE differential: SearchGraph.attLattice matches the reference's .lattice files") {
    assume(Files.exists(Paths.get(s"$dir/sg.0.lattice")), "lattice fixture run missing")
    val model = graft.ner.RefBinaryModel.load(s"$dir/ml1.ser.gz", extraKnownLC = lcWords("test.tsv"))
    val docs = testDocs()
    var exact = 0L; var tol = 0L; var total = 0L; var maxD = 0.0
    for (d <- docs.indices) {
      val ours = graft.ner.SearchGraph.attLattice(model, docs(d))
      val theirs = Files.readAllLines(Paths.get(s"$dir/sg.$d.lattice")).asScala.toVector
      assert(ours.length == theirs.length, s"doc $d: ${ours.length} vs ${theirs.length} lines")
      for (((o, t), ln) <- ours.zip(theirs).zipWithIndex) {
        val of = o.split("\t"); val tf = t.split("\t")
        assert(of.length == tf.length, s"doc $d line $ln: '$o' vs '$t'")
        // structure: every field but the score must match byte-for-byte
        for (k <- 0 until of.length - 1)
          assert(of(k) == tf(k), s"doc $d line $ln field $k: '$o' vs '$t'")
        val diff = math.abs(of.last.toDouble - tf.last.toDouble)
        maxD = math.max(maxD, diff)
        if (o == t) exact += 1
        else { assert(diff <= 1e-9, s"doc $d line $ln score: '$o' vs '$t'"); tol += 1 }
        total += 1
      }
    }
    info(f"lattice lines: $total total, $exact byte-exact, $tol within 1e-9 (max score diff $maxD%.3e) over ${docs.length} docs")
    assert(total > 0)
  }

  test("writeAll: the distributed -searchGraphPrefix surface writes per-doc lattice + empty wlattice files") {
    assume(Files.exists(Paths.get(s"$dir/ml1.ser.gz")), "lattice fixture run missing")
    val spark = graft.pipeline.SparkTestSession.spark
    import spark.implicits._
    val model = graft.ner.RefBinaryModel.load(s"$dir/ml1.ser.gz", extraKnownLC = lcWords("test.tsv"))
    val bc = spark.sparkContext.broadcast(model)
    val docs = testDocs().take(40)
    val prefix = s"$dir/our_sg"
    val n = graft.ner.SearchGraph.writeAll(
      docs.zipWithIndex.map { case (d, i) => (i.toLong, d: Seq[String]) }.toDS().repartition(4), bc, prefix)
    assert(n == docs.length.toLong)
    for (i <- docs.indices) {
      val got = Files.readAllLines(Paths.get(s"$prefix.$i.lattice")).asScala.toVector
      assert(got == graft.ner.SearchGraph.attLattice(model, docs(i)), s"doc $i lattice content")
      assert(Files.size(Paths.get(s"$prefix.$i.wlattice")) == 0L, s"doc $i wlattice not empty")
    }
    bc.destroy()
  }

  test("SHAPELESS differential: a wordShape-off (NOWORDSHAPE) model loads and tags identically") {
    assume(Files.exists(Paths.get(s"$dir/test.tsv")), "lattice fixture run missing")
    // no -wordShape: SeqClassifierFlags defaults to NOWORDSHAPE (-1); the
    // shape-reading closure (RefBinaryModel.validateFlags) is off, so the
    // dictionary holds no shape strings and our dan2 emissions hash-miss+drop
    val noShapeFlags = Seq(
      "-map", "word=0,answer=1",
      "-useWord", "true", "-usePrev", "true", "-useNext", "true",
      "-useSequences", "true", "-usePrevSequences", "true",
      "-normalizeTimex", "true", "-maxLeft", "1")
    assert(ref(Seq("-trainFile", s"$dir/train.tsv", "-serializeTo", s"$dir/noshape.ser.gz") ++ noShapeFlags: _*) == 0,
      "shapeless reference training failed")
    val tagCmd = Seq("java", "-Xmx2g", "-cp", s"$refBuild/classes",
      "edu.stanford.nlp.ie.crf.CRFClassifier",
      "-loadClassifier", s"$dir/noshape.ser.gz", "-testFile", s"$dir/test.tsv")
    assert((tagCmd #> new java.io.File(s"$dir/ref_noshape_out.tsv")).! == 0, "shapeless reference tagging failed")
    val model = graft.ner.RefBinaryModel.load(s"$dir/noshape.ser.gz")
    val refTags = graft.tools.RefCompare.parseRefOutput(Paths.get(s"$dir/ref_noshape_out.tsv"))
    val docs = testDocs()
    assert(docs.length == refTags.length)
    var agree = 0L; var total = 0L
    docs.zip(refTags).foreach { case (words, theirs) =>
      val ours = model.tag(words)
      for (i <- ours.indices) { if (ours(i) == theirs(i)) agree += 1; total += 1 }
    }
    info(f"shapeless token agreement = ${agree.toDouble / total}%.5f over $total tokens")
    assert(agree == total)
  }

  test("the reference's builder crashes for windowSize-3 models; our SearchGraph rejects them with the citation") {
    // our side: the committed conllNoTags model is windowSize 3
    val own = Paths.get("models/ner-conllnotags-v1.gz")
    assume(Files.exists(own), "committed model not present")
    val m3 = graft.ner.NerModel.load(own.toString)
    val e = intercept[IllegalArgumentException] {
      graft.ner.SearchGraph.attLattice(m3, Vector("Stark", "Systems", "opened"))
    }
    assert(e.getMessage.contains("ViterbiSearchGraphBuilder.java:123"), e.getMessage)

    // 1-word documents: the reference's other crash domain, same loud rejection
    assume(Files.exists(Paths.get(s"$dir/ml1.ser.gz")), "lattice fixture run missing")
    val m2 = graft.ner.RefBinaryModel.load(s"$dir/ml1.ser.gz")
    val e1 = intercept[IllegalArgumentException] {
      graft.ner.SearchGraph.attLattice(m2, Vector("Stark"))
    }
    assert(e1.getMessage.contains("ViterbiSearchGraphBuilder.java:110"), e1.getMessage)

    // reference side, pinned empirically: a windowSize-3 model (the bridge
    // suite's, when present) AIOOBEs inside ViterbiSearchGraphBuilder
    val w3 = "/tmp/refbridge/ref.ser.gz"
    assume(Files.exists(Paths.get(w3)), "bridge w3 model not present (RefBridgeSpec skipped?)")
    val err = new StringBuilder
    val code = (Seq("java", "-Xmx2g", "-cp", s"$refBuild/classes",
      "edu.stanford.nlp.ie.crf.CRFClassifier",
      "-loadClassifier", w3, "-testFile", s"$dir/test.tsv",
      "-searchGraphPrefix", s"$dir/w3sg") ! ProcessLogger(_ => (), l => err.append(l).append('\n')))
    assert(code != 0, "expected the reference to crash on a windowSize-3 search-graph run")
    assert(err.toString.contains("ArrayIndexOutOfBoundsException") &&
      err.toString.contains("ViterbiSearchGraphBuilder"),
      s"unexpected reference failure mode:\n${err.toString.takeRight(600)}")
  }
}
