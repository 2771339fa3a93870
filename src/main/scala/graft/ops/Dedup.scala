package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, from exact through
  * near-dup. Scale notes per operator are inline; the common theme: collapse
  * to keys/signatures FIRST (map-side, no data movement), shuffle only the
  * small derived relations, and guard every self-join against skew.
  */
object Dedup {

  /** Exact dedup on a normalized content key (md5 of lowercased text).
    * One hash-aggregate (single shuffle of (key, doc_id) pairs — not the
    * documents). Output: one row per document with its keep/drop verdict so
    * the result is a filter mask usable downstream.
    */
  def exact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("dup_key"))
    docs.select(col("doc_id"), md5(lower(col("text"))).as("dup_key"))
      .withColumn("keep_doc_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("dup_key"), col("keep_doc_id"), col("group_size"),
        (col("doc_id") === col("keep_doc_id")).as("keep"))
  }

  /** Near-exact dedup on a prefix key: md5 of the first `k` word tokens of the
    * lowercased text (catches boilerplate with varying tails).
    */
  def prefixKey(docs: DataFrame, k: Int = 6): DataFrame = {
    val toks = TextAnalysis.tokensCol(lower(col("text")))
    val key = md5(concat_ws(" ", slice(toks, 1, k)))
    val w = Window.partitionBy(col("dup_key"))
    docs.select(col("doc_id"), key.as("dup_key"))
      .withColumn("keep_doc_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .where(col("group_size") > 1)
      .select(col("doc_id"), col("dup_key"), col("keep_doc_id"), col("group_size"))
  }

  /** Exact n-gram Jaccard pairs >= tau via the classic explode + self-join
    * formulation (this is also the DuckDB-oracle-checkable reference for the
    * MinHash path). Blocking: only pairs sharing at least one shingle are
    * generated; `maxShingleFreq` drops stop-shingles that would otherwise
    * produce quadratic hot-key blowup (the skew lever at 100 TB).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, tau: Double = 0.5,
      maxShingleFreq: Int = 200): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // Distinct word n-gram shingles per doc via the native codegen'd
    // expression (empty array for docs with < n tokens — round-1 review
    // finding: the interpreted sequence/slice formulation both CRASHED on
    // short docs and cost ~10s/5000 docs). The shingle table is materialized
    // ONCE (localCheckpoint): three consumers (sizes + both self-join sides)
    // would otherwise re-tokenize the corpus each.
    val grams = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.graft_shingles(col("text"), n).as("shingles"))
      .where(size(col("shingles")) > 0)
      .localCheckpoint()
    val sizes = grams.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    val exploded = grams.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val filtered = exploded
      .withColumn("freq", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .where(col("freq") <= maxShingleFreq)
      .drop("freq")
    val inter = filtered.as("a").join(filtered.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_id_1").withColumnRenamed("n_sh", "n1"), "doc_id_1")
      .join(sizes.withColumnRenamed("doc_id", "doc_id_2").withColumnRenamed("n_sh", "n2"), "doc_id_2")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")).cast("double"), 4))
      .where(col("jaccard") >= tau)
      .select(col("doc_id_1"), col("doc_id_2"), col("jaccard"))
  }

  /** MinHash + LSH banding near-dup pairs: signatures map-side, candidates via
    * a band-bucket equi-join, verified with exact Jaccard partition-locally.
    * The scale path: cost is O(docs * k) for signatures + candidate buckets,
    * never all-pairs. Verified against `ngramJaccardPairs` in DedupSpec.
    */
  def minHashPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      tau: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = numHashes / bands
    // localCheckpoint, not cache(): 3 consumers (banding + both verify-join
    // sides) replay pinned blocks, and nothing stays registered in the
    // cacheManager after the query (round-2 review finding; blocks are freed
    // by the ContextCleaner when the result is dropped)
    val withSh = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .as[(Long, String)]
      .map { case (id, t) => (id, Hashing.wordShingles(t, n).toArray) }
      .toDF("doc_id", "shingles")
      .where(size(col("shingles")) > 0)
      .localCheckpoint()
    val banded = withSh.as[(Long, Array[Long])].flatMap { case (id, sh) =>
      val sig = Hashing.minHash(sh, numHashes)
      Hashing.bandKeys(sig, bands, rows).iterator.zipWithIndex.map { case (k, b) => (id, b, k) }
    }.toDF("doc_id", "band", "key")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .distinct()
    cand
      .join(withSh.withColumnRenamed("doc_id", "doc_id_1").withColumnRenamed("shingles", "sh1"), "doc_id_1")
      .join(withSh.withColumnRenamed("doc_id", "doc_id_2").withColumnRenamed("shingles", "sh2"), "doc_id_2")
      .select(col("doc_id_1"), col("doc_id_2"), col("sh1"), col("sh2"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (d1, d2, sh1, sh2) =>
        (d1, d2, Hashing.jaccard(sh1.toSet, sh2.toSet))
      }
      .toDF("doc_id_1", "doc_id_2", "jaccard")
      // HALF_UP column round (not math.rint/half-even) so a tie at the 4th
      // decimal rounds identically to the DuckDB oracle's round()
      .withColumn("jaccard", round(col("jaccard"), 4))
      .where(col("jaccard") >= tau)
  }

  /** SimHash near-dup pairs: 64-bit sketch, candidates share one of four
    * 16-bit chunks (finds all pairs within Hamming distance 3 whenever the
    * differing bits fall in <= 3 chunks; exact Hamming check verifies).
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // localCheckpoint for the same cacheManager-hygiene reason as minHashPairs
    val sigs = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .as[(Long, String)]
      .map { case (id, t) => (id, Hashing.simHash(Hashing.wordShingles(t, 2))) }
      .toDF("doc_id", "sim")
      .localCheckpoint()
    val chunked = sigs.as[(Long, Long)].flatMap { case (id, s) =>
      (0 until 4).iterator.map(c => (id, s, c, (s >>> (c * 16)) & 0xffffL))
    }.toDF("doc_id", "sim", "chunk", "key")
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"),
        col("a.sim").as("s1"), col("b.sim").as("s2"))
      .distinct()
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_id_1"), col("doc_id_2"), col("hamming"))
  }

  /** Embedding cosine near-dup pairs >= tau, exact via the blocked tile
    * self-join (see Similarity.cosinePairsBlocked for the scale analysis).
    */
  def embeddingPairs(embeddings: DataFrame, tau: Double = 0.95): DataFrame =
    Similarity.cosinePairsBlocked(embeddings, tau)
}
