package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew levers (north rule: "salted repartitioning and AQE skew-join
  * hints"). AQE's skew-join splitting handles sort-merge joins at runtime;
  * these utilities cover the two cases AQE cannot fix:
  * hot-key AGGREGATIONS (a single groupBy key landing on one task) and
  * hot-key broadcast-probe fan-out.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-like aggregates over a key with
    * pathological frequency (one entity surface in 50% of all turns). Phase 1
    * aggregates on (key, salt) — spreading the hot key over `buckets` tasks —
    * phase 2 combines the per-salt partials. Exact for algebraic aggregates.
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String], buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as("n"))
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right side:
    * the right side is replicated `buckets` times (one per salt), the left
    * side gets a random-but-deterministic salt, so one hot key's rows spread
    * over `buckets` tasks instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
