package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._
import java.nio.file.{Files, Paths}

/** THE authoritative parity gate (BASELINE.json north rule): our pipeline's
  * (subj, pred, obj) triples vs triples derived from the REAL reference
  * classifier's tags, P/R >= 0.95. The reference (Jan-2009 source at
  * /root/reference) is compiled with javac into /tmp/refbuild, trained with
  * its own CLI (conllNoTags preset) on our rendered column-format corpus
  * (ColumnDocumentReaderAndWriter.java:46-72), and tags held-out transcripts;
  * both tag streams run through the same span fold + TripleRules.
  *
  * Cancels (does not fail) if the reference source or a JDK is unavailable.
  */
class RefParitySpec extends AnyFunSuite {

  test("triples match the compiled reference classifier at P/R >= 0.95") {
    assume(Files.exists(Paths.get("/root/reference/src")), "reference source not present")
    val dir = "/tmp/refdiff-test"
    val refBuild = "/tmp/refbuild"
    // 1. fixtures (pure-Scala, no Spark needed)
    graft.tools.RefFixtures.main(Array(dir))
    // 2. compile the reference once per machine
    val crf = s"$refBuild/classes/edu/stanford/nlp/ie/crf/CRFClassifier.class"
    if (!Files.exists(Paths.get(crf))) {
      assume(Seq("bash", "-c", s"rm -rf $refBuild && mkdir -p $refBuild/classes && cp -r /root/reference/src $refBuild/src").! == 0)
      // JDK 17 compatibility: 'yield' is restricted since Java 14
      val tree = Paths.get(s"$refBuild/src/edu/stanford/nlp/trees/Tree.java")
      Files.writeString(tree, Files.readString(tree)
        .replace("return yield(", "return this.yield(")
        .replace("List<CoreLabel> s = yield();", "List<CoreLabel> s = this.yield();"))
      val javac = Seq("bash", "-c",
        s"cd $refBuild && javac -nowarn -encoding UTF-8 -d classes $$(find src/edu -name '*.java') 2>javac.log")
      assume(javac.! == 0, "reference javac failed (see /tmp/refbuild/javac.log)")
    }
    // 3. train + tag with the reference CLI
    val train = Seq("java", "-Xmx4g", "-cp", s"$refBuild/classes",
      "edu.stanford.nlp.ie.crf.CRFClassifier",
      "-trainFile", s"$dir/train.tsv", "-serializeTo", s"$dir/ref.ser.gz",
      "-conllNoTags", "true")
    assert((train #> new java.io.File(s"$dir/ref_train.out")).! == 0, "reference training failed")
    def tag(testFile: String, outFile: String): Unit = {
      val cmd = Seq("java", "-Xmx2g", "-cp", s"$refBuild/classes",
        "edu.stanford.nlp.ie.crf.CRFClassifier",
        "-loadClassifier", s"$dir/ref.ser.gz", "-testFile", s"$dir/$testFile",
        "-conllNoTags", "true")
      assert((cmd #> new java.io.File(s"$dir/$outFile")).! == 0, s"reference tagging failed: $testFile")
    }
    tag("test.tsv", "ref_out.tsv")
    tag("test_novel.tsv", "ref_out_novel.tsv")
    // 4. compare triples on held-out turns (seen vocabulary)
    val (p, r) = graft.tools.RefCompare.compare(dir)
    assert(p >= 0.95 && r >= 0.95, f"seen-vocab parity P=$p%.4f R=$r%.4f")
    // 5. compare on UNSEEN entity surface forms (shape/context generalization)
    val (pn, rn) = graft.tools.RefCompare.compare(dir, novel = true)
    assert(pn >= 0.95 && rn >= 0.95, f"novel-entity parity P=$pn%.4f R=$rn%.4f")
  }
}
