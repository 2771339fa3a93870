package graft.ner

import graft.pipeline.{SparkTestSession, Transcripts}
import org.scalatest.funsuite.AnyFunSuite

class TaggerGroupingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("conversation-grouped tagging equals the shuffle-free path") {
    val model = NerModels.default(spark)
    val turns = Transcripts.synth(spark, 120L)
    val flat = Tagger.mentions(turns, model).collect().toSet
    val grouped = Tagger.mentionsByConversation(turns, model).collect().toSet
    assert(grouped == flat)
    assert(flat.nonEmpty)
    // the grouped plan contains exactly one exchange; the flat plan none
    val gPlan = Tagger.mentionsByConversation(turns, model).queryExecution.executedPlan.toString
    val fPlan = Tagger.mentions(turns, model).queryExecution.executedPlan.toString
    assert(gPlan.contains("Exchange"))
    assert(!fPlan.contains("Exchange"))
  }

  test("triplesAndMentions tags the corpus exactly once for the whole q35 shape") {
    // round-2 review finding: q35 re-ran the tagger up to 4x (triples,
    // mentions, surfaceMap's count, final join). The shared-pass + pinned
    // intermediates version must scan the input turns exactly once, counted
    // by an accumulator on the input rows.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val model = NerModels.default(spark)
    val turns = Transcripts.synth(spark, 60L)
    val nTurns = turns.count()
    val scans = spark.sparkContext.longAccumulator("turnScans")
    val instrumented = turns.map { t => scans.add(1); t }
    scans.reset()
    val (tps, ments) = graft.kg.KgPipeline.triplesAndMentions(instrumented, model)
    val linked = graft.kg.EntityLink.link(ments).localCheckpoint()
    val surfMap = graft.kg.GraphMaterializer.surfaceMap(linked).drop("canonical_surface")
    val edges = tps.toDF()
      .join(surfMap.withColumnRenamed("etype", "subj_type").withColumnRenamed("surface", "subj")
        .withColumnRenamed("entity_id", "subj_id"), Seq("subj_type", "subj"))
      .join(surfMap.withColumnRenamed("etype", "obj_type").withColumnRenamed("surface", "obj")
        .withColumnRenamed("entity_id", "obj_id"), Seq("obj_type", "obj"))
      .groupBy(col("subj_id"), col("pred"), col("obj_id"))
      .agg(count(lit(1)).as("weight"))
    assert(edges.count() > 0)
    assert(scans.value == nTurns,
      s"expected exactly one scan of $nTurns turns, saw ${scans.value} row reads")
  }
}
