package graft.ner

import graft.pipeline.Transcripts
import graft.train.{LabeledDoc, Trainer}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Default-model management: the NER model is a build artifact derived purely
  * from the deterministic synthetic corpus (seed 42, 400 conversations), so it
  * is trained once and cached on disk; queries load + broadcast it. Set
  * GRAFT_MODEL_PATH to override; delete the file to force retraining.
  */
object NerModels {
  def defaultPath: String =
    sys.env.getOrElse("GRAFT_MODEL_PATH", "/root/repo/models/ner-conllnotags-v1.gz")

  // keyed by SparkContext: Bench restarts sessions at different parallelism
  // and a broadcast from a stopped context must not be reused
  @volatile private var cached: (org.apache.spark.SparkContext, Broadcast[NerModel]) = _

  def default(spark: SparkSession): Broadcast[NerModel] = synchronized {
    if (cached == null || (cached._1 ne spark.sparkContext)) {
      val path = defaultPath
      val model =
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) NerModel.load(path)
        else {
          import spark.implicits._
          val gold = Transcripts.synthGold(spark, nConvs = 400L, seed = 42L)
            .map(g => LabeledDoc(g.words, g.labels))
          val m = Trainer.train(spark, gold, Trainer.Config(maxIterations = 120))
          NerModel.save(m, path)
          m
        }
      cached = (spark.sparkContext, spark.sparkContext.broadcast(model))
    }
    cached._2
  }
}
