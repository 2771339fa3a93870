package graft.kg

import graft.ops.Hashing
import graft.pipeline.Mention
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Entity linking + surface-form canonicalization (north rule): MinHash-LSH
  * blocking over character-shingled normalized surfaces, a batched
  * candidate-pair scoring join, then iterative connected components to form
  * canonical entity clusters.
  *
  * Scale design:
  *  - blocking works on DISTINCT (etype, surface) pairs, not raw mentions —
  *    the groupBy collapses the 10^12-turn mention stream to the vocabulary
  *    of surface forms before any pairwise work (the only full shuffle).
  *  - candidate generation is an equi-join on (etype, band, bandKey); hot
  *    buckets (stop-word-like surfaces) are handled by AQE skew-join
  *    splitting plus a per-bucket cap; pairs are scored partition-locally
  *    with exact Jaccard (no second shuffle).
  *  - clustering uses ConnectedComponents (log-round star contraction).
  */
object EntityLink {

  final case class Config(
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8, // rows = numHashes / bands = 4
      minJaccard: Double = 0.55,
      maxBucketSize: Int = 64 // cap candidate bucket fan-out (skew guard)
  )

  private val titleTokens = Set("dr.", "mr.", "ms.", "mrs.", "prof.", "sen.", "miss", "sir")

  /** Normalized surface: lowercase; strip a leading title token for persons. */
  def normalize(etype: String, surface: String): String = {
    val lower = surface.toLowerCase
    if (etype == "PERSON") {
      val sp = lower.indexOf(' ')
      if (sp > 0 && titleTokens.contains(lower.substring(0, sp))) lower.substring(sp + 1) else lower
    } else lower
  }

  /** Distinct surface vocabulary with mention counts.
    * Output: (etype, surface, norm, n_mentions, surface_id).
    */
  def surfaces(mentions: Dataset[Mention]): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val norm = udf((t: String, s: String) => normalize(t, s))
    val sid = udf((t: String, s: String) => Hashing.fnv1a64(t + "\u0000" + s))
    mentions.groupBy($"etype", $"surface").agg(count(lit(1)).as("n_mentions"))
      .withColumn("norm", norm($"etype", $"surface"))
      .withColumn("surface_id", sid($"etype", $"surface"))
  }

  /** Similarity edges between surface ids of the same entity type.
    * r6 (guide §2.4, same rewrite as Dedup.minHashPairs): candidate pairs
    * come straight from each (etype, band, key) bucket's posting list — the
    * old self-join evaluated the banded minhash flatMap TWICE (probe +
    * broadcast build) at any scale and needed a separate window pass for the
    * bucket-size cap. One explicit-count shuffle (AQE would coalesce an
    * ENSURE_REQUIREMENTS exchange at small sizes), streamed run-grouping; a
    * bucket above maxBucketSize emits nothing, exactly like the old
    * `bsz <= cap` filter which dropped the whole bucket before pairing.
    */
  def similarityEdges(surfaces: DataFrame, cfg: Config = Config()): Dataset[(Long, Long)] = {
    val spark = surfaces.sparkSession
    import spark.implicits._
    val shSize = cfg.shingleSize; val k = cfg.numHashes; val bands = cfg.bands
    val rows = k / bands
    val p = spark.sparkContext.defaultParallelism
    val maxBucket = cfg.maxBucketSize
    // one row per (etype, band, bandKey, surface_id, norm)
    val banded = surfaces.select($"etype", $"surface_id", $"norm").as[(String, Long, String)]
      .flatMap { case (etype, sid, norm) =>
        val sig = Hashing.minHash(Hashing.charShingles(norm, shSize), k)
        Hashing.bandKeys(sig, bands, rows).iterator.zipWithIndex.map { case (bk, b) =>
          (etype, b, bk, sid, norm)
        }
      }.toDF("etype", "band", "key", "sid", "norm")
    val tau = cfg.minJaccard
    val jac = udf((a: String, b: String) =>
      Hashing.jaccard(Hashing.charShingles(a, shSize), Hashing.charShingles(b, shSize)))
    banded.repartition(p, $"etype", $"band", $"key")
      .sortWithinPartitions($"etype", $"band", $"key")
      .select($"etype", $"band", $"key", $"sid", $"norm").as[(String, Int, Long, Long, String)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Long, Long, String, String)] {
          private var pending: Iterator[(Long, Long, String, String)] = Iterator.empty
          private def advance(): Unit =
            while (!pending.hasNext && buf.hasNext) {
              val key = (buf.head._1, buf.head._2, buf.head._3)
              val rowsB = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
              var over = false
              while (buf.hasNext && (buf.head._1, buf.head._2, buf.head._3) == key) {
                val r = buf.next()
                if (!over) { rowsB += ((r._4, r._5)); if (rowsB.length > maxBucket) { over = true; rowsB.clear() } }
              }
              if (!over && rowsB.length >= 2) {
                val a = rowsB.sortBy(_._1).toArray
                pending = a.indices.iterator.flatMap(i =>
                  Iterator.range(i + 1, a.length).map(j =>
                    (a(i)._1, a(j)._1, a(i)._2, a(j)._2)))
              }
            }
          def hasNext: Boolean = { advance(); pending.hasNext }
          def next(): (Long, Long, String, String) = { advance(); pending.next() }
        }
      }
      .toDF("sid1", "sid2", "norm1", "norm2").distinct()
      .where(jac($"norm1", $"norm2") >= tau || $"norm1" === $"norm2")
      .select($"sid1".as("_1"), $"sid2".as("_2")).as[(Long, Long)]
  }

  /** Full linking: mentions → (surface_id → canonical entity) assignment.
    * Canonical surface of a cluster = highest-mention-count member
    * (ties: lexicographically smallest surface).
    * Output: (etype, surface, surface_id, n_mentions, entity_id, canonical_surface).
    */
  def link(mentions: Dataset[Mention], cfg: Config = Config()): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._
    // localCheckpoint, not cache(): one eager scan of the mention stream, no
    // entry left in the cacheManager after link() (round-1 review finding);
    // blocks are freed by the ContextCleaner when the result is dropped.
    val surf = surfaces(mentions).localCheckpoint()
    val edges = similarityEdges(surf, cfg)
    val cc = ConnectedComponents.run(edges) // (id, component)
    val assigned = surf.join(cc.withColumnRenamed("id", "surface_id"), Seq("surface_id"), "left")
      .withColumn("entity_id", coalesce($"component", $"surface_id"))
      .drop("component")
    // canonical representative per entity
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"entity_id")
      .orderBy($"n_mentions".desc, $"surface".asc)
    assigned
      .withColumn("canonical_surface", first($"surface").over(w))
      .select($"etype", $"surface", $"surface_id", $"n_mentions", $"entity_id", $"canonical_surface")
  }
}
