package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: run named SparkEntry queries at a given sf dir
  * and parallelism, print per-query wall seconds (first run + warm rerun).
  * Usage: QTIME_QUERIES=q24_embed_pairs,q18_jaccard_pairs QTIME_SF=/root/testdata/sf0.1
  *        sbt "runMain graft.tools.QTime"
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("QTIME_SF", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("QTIME_CPUS", "32").toInt
    val names = sys.env.getOrElse("QTIME_QUERIES", "q24_embed_pairs").split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[qtime] $name rep=$rep rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
