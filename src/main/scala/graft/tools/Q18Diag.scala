package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-by-stage timing of the q18 exact-jaccard pipeline. */
object Q18Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("QTIME_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = 3
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q18diag] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      timed("tokens only")(docs.select(col("doc_id"), toks.as("t")).write.format("noop").mode("overwrite").save())
      val grams = docs.select(col("doc_id"),
        when(size(toks) >= n,
          array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n))))))
          .otherwise(array().cast("array<string>")).as("shingles"))
        .where(size(col("shingles")) > 0)
      timed("grams")(grams.write.format("noop").mode("overwrite").save())
      val exploded = grams.select(col("doc_id"), explode(col("shingles")).as("sh"))
      timed("exploded")(exploded.write.format("noop").mode("overwrite").save())
      val filtered = exploded
        .withColumn("freq", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .where(col("freq") <= 200).drop("freq")
      timed("windowed")(filtered.write.format("noop").mode("overwrite").save())
      val inter = filtered.as("a").join(filtered.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      timed("inter join")(inter.write.format("noop").mode("overwrite").save())
      timed("full q18")(graft.SparkEntry.queries("q18_jaccard_pairs")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
