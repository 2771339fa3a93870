package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** FEATURE-LEVEL differential: the per-(doc, position, clique) feature
  * MULTISETS that reach the factor tables, ours vs the compiled reference's
  * own `documentToDataAndLabels` (CRFClassifier.java:175-215 — the exact
  * arrays inference consumes, post dictionary filtering).
  *
  * Why this leg exists: every prior feature certificate was either
  * tag-agreement (robust to sub-decision-boundary drift), path parity
  * (our two paths against each other), or dictionary coverage — none can see
  * a feature emitted on the wrong TOKEN, or one side double-emitting a
  * string, when the weight involved is small. The marginals differential's
  * observed 2.6e-6 drift sits exactly in the magnitude band such a slip
  * would produce (tiny-weight feature × one position), far above float
  * noise; this leg either finds that slip or certifies the feature surface
  * at the only level that matters to the math — the multiset per factor.
  */
class RefFeatureDumpSpec extends AnyFunSuite {

  private val refBuild = "/tmp/refbuild"
  private val dir = "/tmp/reffeat"
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

  // the probe loads the serialized model, reads the test file through the
  // classifier's OWN ObjectBank (knownLCWords pre-pass and all), and prints
  // the feature strings of every data[i][j] array, sorted, -separated
  private val probeSrc =
    """import edu.stanford.nlp.ie.crf.CRFClassifier;
      |import edu.stanford.nlp.ling.CoreLabel;
      |import edu.stanford.nlp.objectbank.ObjectBank;
      |import edu.stanford.nlp.util.Index;
      |import edu.stanford.nlp.util.Pair;
      |import java.util.*;
      |
      |public class FeatDumpProbe {
      |  public static void main(String[] args) throws Exception {
      |    CRFClassifier crf = CRFClassifier.getClassifier(args[0]);
      |    java.lang.reflect.Field ff = CRFClassifier.class.getDeclaredField("featureIndex");
      |    ff.setAccessible(true);
      |    Index fi = (Index) ff.get(crf);
      |    ObjectBank<List<CoreLabel>> docs = crf.makeObjectBankFromFile(args[1]);
      |    java.io.PrintWriter out = new java.io.PrintWriter(new java.io.BufferedWriter(
      |      new java.io.OutputStreamWriter(new java.io.FileOutputStream(args[2]), "UTF-8")));
      |    int d = 0;
      |    for (List<CoreLabel> doc : docs) {
      |      Pair<int[][][],int[]> p = crf.documentToDataAndLabels(doc);
      |      int[][][] data = p.first();
      |      for (int i = 0; i < data.length; i++) {
      |        for (int j = 0; j < data[i].length; j++) {
      |          String[] fs = new String[data[i][j].length];
      |          for (int k = 0; k < fs.length; k++) fs[k] = (String) fi.get(data[i][j][k]);
      |          Arrays.sort(fs);
      |          out.println(d + "" + i + "" + j + "" + String.join("", fs));
      |        }
      |      }
      |      d++;
      |    }
      |    out.close();
      |  }
      |}
      |""".stripMargin

  test("feature multisets per (doc, position, clique) match the reference's documentToDataAndLabels exactly") {
    assume(Files.exists(Paths.get("/root/reference/src")), "reference source not present")
    ensureRefCompiled()
    graft.tools.RefFixtures.main(Array(dir))
    assert(ref("-trainFile", s"$dir/train.tsv", "-serializeTo", s"$dir/ref.ser.gz",
      "-conllNoTags", "true") == 0, "reference training failed")
    Files.writeString(Paths.get(s"$dir/FeatDumpProbe.java"), probeSrc)
    assert(Seq("javac", "-nowarn", "-cp", s"$refBuild/classes", "-d", dir,
      s"$dir/FeatDumpProbe.java").! == 0, "probe javac failed")
    assert(Seq("java", "-Xmx3g", "-cp", s"$dir${java.io.File.pathSeparator}$refBuild/classes",
      "FeatDumpProbe", s"$dir/ref.ser.gz", s"$dir/test.tsv", s"$dir/ref_featdump.txt").! == 0,
      "probe run failed")

    // knownLCWords at reference tagging time = train (grown during training)
    // ∪ test (the wrapper pre-pass), timex-fixed — same rule as RefBridgeSpec
    val model = graft.ner.RefBinaryModel.load(s"$dir/ref.ser.gz",
      extraKnownLC = lcWords("train.tsv") ++ lcWords("test.tsv"))
    val inv = new Array[String](model.featureIndex.size)
    model.featureIndex.forEach((k, v) => inv(v.intValue) = k)

    val docs = testDocs()
    val refLines = Files.readAllLines(Paths.get(s"$dir/ref_featdump.txt")).asScala.toVector
    var li = 0
    var factors = 0L; var feats = 0L
    val bad = Vector.newBuilder[String]
    for (d <- docs.indices) {
      val enc = model.encodeFast(docs(d))
      for (i <- enc.indices; j <- enc(i).indices) {
        assert(li < refLines.length, s"ref dump exhausted at doc $d pos $i clique $j")
        val parts = refLines(li).split('')
        li += 1
        assert(parts(0).toInt == d && parts(1).toInt == i && parts(2).toInt == j,
          s"dump misaligned: expected ($d,$i,$j) got (${parts(0)},${parts(1)},${parts(2)})")
        val theirs = parts.drop(3).toVector.sorted
        val ours = enc(i)(j).toVector.map(inv).sorted
        if (ours != theirs) {
          bad += s"doc $d pos $i clique $j word '${docs(d)(i)}':\n  ours-only:   ${(ours diff theirs).mkString(" | ")}\n  theirs-only: ${(theirs diff ours).mkString(" | ")}"
        }
        factors += 1; feats += ours.length
      }
    }
    assert(li == refLines.length, s"ref dump has ${refLines.length - li} unconsumed lines")
    val mismatches = bad.result()
    info(s"$factors factor feature-multisets compared ($feats feature instances), ${mismatches.length} mismatched")
    assert(mismatches.isEmpty, s"${mismatches.length} mismatched factors; first 5:\n${mismatches.take(5).mkString("\n")}")
  }
}
