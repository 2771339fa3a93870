package graft.tools

import graft.pipeline.Transcripts
import graft.train.{LabeledDoc, Trainer}
import org.apache.spark.sql.SparkSession

/** Timed training-at-scale probe: train on N conversations (gold turns) with
  * a fixed iteration budget, then measure held-out token accuracy on unseen
  * conversations. Usage: TRAIN_CONVS=20000 TRAIN_ITERS=40 sbt "runMain graft.tools.TrainScale"
  */
object TrainScale {
  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("TRAIN_CONVS", "20000").toLong
    val iters = sys.env.getOrElse("TRAIN_ITERS", "40").toInt
    val cpus = sys.env.getOrElse("TRAIN_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val gold = Transcripts.synthGold(spark, nConvs, seed = 7L).map(g => LabeledDoc(g.words, g.labels))
    val nDocs = gold.count()
    val t0 = System.nanoTime()
    val model = Trainer.train(spark, gold, Trainer.Config(maxIterations = iters))
    val trainSec = (System.nanoTime() - t0) / 1e9
    // held-out token accuracy on 2000 unseen convs (different seed)
    var ok = 0L; var total = 0L
    for (conv <- 0L until 2000L; t <- 0 until Transcripts.numTurns(8L, conv)
         if !Transcripts.isToolTurn(8L, conv, t)) {
      val (words, labels) = Transcripts.turnTokens(8L, conv, t)
      val got = model.tag(words)
      for (i <- words.indices) { if (got(i) == labels(i)) ok += 1; total += 1 }
    }
    println(f"[trainscale] convs=$nConvs docs=$nDocs iters=$iters features=${model.numFeatures} trainSec=$trainSec%.1f heldoutAcc=${ok.toDouble / total}%.5f tokens=$total")
    spark.stop()
  }
}
