package graft.kg

import graft.ner.NerModels
import graft.pipeline.{SparkTestSession, Transcripts}
import graft.ner.Tagger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("materialize writes partitioned nodes/edges with lineage; re-run resumes (skips)") {
    val model = NerModels.default(spark)
    val turns = Transcripts.synth(spark, 60L)
    val triples = KgPipeline.triples(turns, model)
    val linked = EntityLink.link(Tagger.mentions(turns, model))
    val out = Files.createTempDirectory("kgout").toString
    val (nodes, edges) = GraphMaterializer.materialize(triples, linked, out, fingerprint = "seed42-n60")
    assert(nodes.count() > 0 && edges.count() > 0)
    assert(Files.exists(Paths.get(out, "_lineage", "nodes.json")))
    assert(Files.exists(Paths.get(out, "_lineage", "edges.json")))
    // partition layout: etype=... dirs for nodes, bucket=... for edges
    val nodeDirs = new java.io.File(s"$out/nodes").listFiles().map(_.getName)
    assert(nodeDirs.exists(_.startsWith("etype=")), nodeDirs.mkString(","))
    // resume: same fingerprint -> no rewrite (file mtimes unchanged)
    def mtimes(p: String) = new java.io.File(p).listFiles().map(f => f.getName -> f.lastModified()).toMap
    val before = mtimes(s"$out/nodes")
    Thread.sleep(20)
    GraphMaterializer.materialize(triples, linked, out, fingerprint = "seed42-n60")
    assert(mtimes(s"$out/nodes") == before, "resume must skip completed stages")
    // changed fingerprint -> stage re-runs
    GraphMaterializer.materialize(triples, linked, out, fingerprint = "seed42-n60-v2")
    assert(mtimes(s"$out/nodes") != before, "new fingerprint must rewrite")
  }
}
