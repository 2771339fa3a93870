package graft

import scala.sys.process._
import java.nio.file.{Files, Paths}

/** Shared compile-once helper for differential specs that drive the
  * reference build directly (RefBridgeSpec compiles the same tree inline;
  * suite order is not guaranteed, so every consumer ensures it).
  */
object RefBuild {
  val dir = "/tmp/refbuild"

  def ensureCompiled(): Boolean = synchronized {
    if (!Files.exists(Paths.get("/root/reference/src"))) return false
    val crf = s"$dir/classes/edu/stanford/nlp/ie/crf/CRFClassifier.class"
    if (Files.exists(Paths.get(crf))) return true
    if (Seq("bash", "-c", s"rm -rf $dir && mkdir -p $dir/classes && cp -r /root/reference/src $dir/src").! != 0) return false
    val tree = Paths.get(s"$dir/src/edu/stanford/nlp/trees/Tree.java")
    Files.writeString(tree, Files.readString(tree)
      .replace("return yield(", "return this.yield(")
      .replace("List<CoreLabel> s = yield();", "List<CoreLabel> s = this.yield();"))
    Seq("bash", "-c",
      s"cd $dir && javac -nowarn -encoding UTF-8 -d classes $$(find src/edu -name '*.java') 2>javac.log").! == 0
  }

  /** javac a probe source against the reference classes and run it with
    * `input` on stdin; returns stdout lines (None on any failure).
    */
  def runProbe(name: String, source: String, input: String): Option[Vector[String]] = {
    val work = Paths.get(s"/tmp/refprobe_$name")
    Files.createDirectories(work)
    Files.writeString(work.resolve(s"$name.java"), source)
    if (Seq("javac", "-nowarn", "-cp", s"$dir/classes", "-d", work.toString,
        work.resolve(s"$name.java").toString).! != 0) return None
    // output goes through a FILE read back as UTF-8: the forked test JVM may
    // run with an ASCII default charset, and ProcessLogger decodes child
    // stdout with it — any raw non-ASCII char in probe output would become
    // U+FFFD (seen with the word-shape probe)
    val outFile = work.resolve("out.txt")
    val rc = ((Seq("java", "-Dfile.encoding=UTF-8", "-cp",
      s"$work${java.io.File.pathSeparator}$dir/classes", name) #<
      new java.io.ByteArrayInputStream(input.getBytes("UTF-8"))) #> outFile.toFile).!
    if (rc != 0) None
    else Some(new String(Files.readAllBytes(outFile), "UTF-8").linesIterator.toVector)
  }
}
