package graft

import graft.kg.KgPipeline
import graft.ner.NerModels
import graft.pipeline.Transcripts
import org.apache.spark.sql.SparkSession

/** Benchmark driver. Emits ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *    "turns_per_sec_8":...,"turns_per_sec_32":...,"scaling_efficiency":...}
  *
  * Scaling-evidence protocol (BASELINE.md): the same NER tagging job runs on
  * the same input at local[8] and local[32] (N and 4N cores, fresh JVM-local
  * sessions); efficiency = (tput32 / tput8) / 4. The tagging job is
  * shuffle-free, so this measures the parallel fraction of the whole pipeline
  * body (tokenize + featurize + Viterbi) rather than shuffle overhead.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Tag + extract triples over nConvs synthetic conversations; returns
    * (turns tagged, seconds).
    */
  private def nerJob(spark: SparkSession, nConvs: Long): (Long, Double) = {
    val turns = Transcripts.synth(spark, nConvs).cache()
    val nTurns = turns.count() // materialize input outside the timed window
    val model = NerModels.default(spark)
    val t0 = System.nanoTime()
    val nTriples = KgPipeline.triples(turns, model).toDF().count()
    val sec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[bench] nerJob convs=$nConvs turns=$nTurns triples=$nTriples cores=${spark.sparkContext.defaultParallelism} sec=$sec%.2f tput=${nTurns / sec}%.0f")
    turns.unpersist()
    (nTurns, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // ~1.35M turns: large enough that per-task scheduling overhead (~0.3s/job)
    // is <5% of even the 4N-core wall time, so efficiency measures compute.
    val scaleConvs = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "300000").toLong

    // ---- scaling protocol: N vs 4N cores on the identical job ----
    // Both measurements must run against a steady-state JIT: local mode keeps
    // one JVM across sessions, so an undersized warmup inflates whichever
    // parallelism level runs second. Warm with a full-size pass first.
    // Best-of-3 at full job size after a warmup pass: JIT tiering and GC make
    // single-shot timings of allocation-heavy closures noisy by 2-3x.
    def measure(s: SparkSession): (Long, Double) = {
      nerJob(s, math.max(2000L, scaleConvs / 4)) // warmup
      val runs = (1 to 3).map(_ => nerJob(s, scaleConvs))
      (runs.head._1, runs.map(_._2).min)
    }
    val sLow = session(cpus / 4)
    val (turnsLow, secLow) = measure(sLow)
    sLow.stop()
    val sHigh = session(cpus)
    val (turnsHigh, secHigh) = measure(sHigh)
    val tputLow = turnsLow / secLow
    val tputHigh = turnsHigh / secHigh
    val efficiency = (tputHigh / tputLow) / 4.0

    // ---- headline queries at full parallelism ----
    val spark = sHigh
    val headline = Seq(
      "q01_pricing_summary", "q02_revenue_by_nation", "q03_top_orders_per_customer",
      "q04_running_supplier_revenue", "q08_sessionize_events", "q11_tokens",
      "q12_token_stats", "q16_dedup_exact", "q18_jaccard_pairs", "q20_dedup_minhash",
      "q21_dedup_simhash", "q22_knn_brute", "q23_knn_lsh", "q25_windowed_events",
      "q31_mentions", "q32_triples")
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","ner_turns":$turnsHigh,"turns_per_sec_${cpus / 4}":$tputLow%.1f,"turns_per_sec_$cpus":$tputHigh%.1f,"scaling_efficiency":$efficiency%.3f}""")
    spark.stop()
  }
}
