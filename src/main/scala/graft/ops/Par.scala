package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor (optimization guide §2.5 "input skew" /
  * §6 small files). The sandbox sf tables are single parquet files with ONE
  * row group, so every scan plans as exactly one task and the whole map side
  * of a query (tokenize/shingle/hash/cosine) runs single-threaded no matter
  * how many cores the session has — measured r6: q24's 2M-pair cosine loop,
  * q18/q20's shingle pass and q12's token scan all ran in one task at
  * local[32].
  *
  * `fan` repartitions ONLY when the source has fewer splits than the
  * session's parallelism, so it is a no-op at production scale (real inputs
  * have thousands of splits) and never a hard-coded constant: the target is
  * `sparkContext.defaultParallelism`. Callers must project to the needed
  * columns FIRST so the repartition does not defeat column pruning.
  */
object Par {
  def fan(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
