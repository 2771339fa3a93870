package graft.tools

import graft.kg.KgPipeline
import graft.ner.NerModels
import graft.pipeline.Transcripts
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Diagnostic for the round-1 bench collapse: run K consecutive full-size
  * NER jobs in one session and log wall, GC time delta, and heap after GC per
  * rep. If the rep-over-rep doubling (BENCH_r01: 73.5s -> 204.6s @32 cores)
  * reproduces on an idle machine, it's a leak in our code; if not, it was
  * environmental load during the driver's run.
  */
object BenchDiag {
  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("DIAG_CPUS", "32").toInt
    val reps = sys.env.getOrElse("DIAG_REPS", "6").toInt
    val convs = sys.env.getOrElse("DIAG_CONVS", "150000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-diag")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val model = NerModels.default(spark)
    var rep = 0
    while (rep < reps) {
      val turns = Transcripts.synth(spark, convs).cache()
      val nTurns = turns.count()
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      val nTriples = KgPipeline.triples(turns, model).toDF().count()
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMillis - gc0) / 1e3
      turns.unpersist(blocking = true)
      System.gc()
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory - rt.freeMemory) / 1024 / 1024
      System.err.println(f"[diag] rep=$rep turns=$nTurns triples=$nTriples sec=$sec%.2f gcSec=$gcSec%.2f heapAfterGcMb=$heapMb tput=${nTurns / sec}%.0f")
      rep += 1
    }
    spark.stop()
  }
}
