package graft.kg

import graft.pipeline.Triple
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Materializes the knowledge graph as partitioned node/edge tables with
  * PER-PARTITION lineage + counters for exact resume (north rule). In
  * production the sinks are Iceberg tables (`partitionedBy(etype,
  * bucket(n, entity_id))`); the sandbox writes the same layout as parquet
  * with an explicit bucket column (no Iceberg runtime jar ships here).
  *
  * Resume contract: each stage writes `_lineage/<stage>.json` containing the
  * input fingerprint and the ROW COUNT OF EVERY PARTITION after its table
  * write succeeds. Re-running with the same fingerprint:
  *   - all recorded partitions present on disk -> stage skipped entirely;
  *   - some partitions missing/damaged (killed mid-write, manual deletion)
  *     -> ONLY those partitions are recomputed and rewritten (dynamic
  *     partition overwrite), untouched partitions keep their files byte for
  *     byte. A different fingerprint always rewrites the whole stage.
  * The recorded counts double as the per-partition counters the lineage
  * table exposes for monitoring.
  */
object GraphMaterializer {

  object Lineage {
    def path(outDir: String, stage: String) = Paths.get(outDir, "_lineage", s"$stage.json")

    def record(outDir: String, stage: String, fingerprint: String,
        partCounts: Map[String, Long]): Unit = {
      val p = path(outDir, stage)
      Files.createDirectories(p.getParent)
      val parts = partCounts.toSeq.sorted
        .map { case (k, v) => s""""${k}":$v""" }.mkString("{", ",", "}")
      Files.writeString(p,
        s"""{"stage":"$stage","fingerprint":"$fingerprint","rows":${partCounts.values.sum},"partitions":$parts,"ts":${System.currentTimeMillis()}}""")
    }

    /** (fingerprint, partition dir -> row count), if a record exists. */
    def read(outDir: String, stage: String): Option[(String, Map[String, Long])] = {
      val p = path(outDir, stage)
      if (!Files.exists(p)) return None
      val s = Files.readString(p)
      val fp = "\"fingerprint\":\"([^\"]*)\"".r.findFirstMatchIn(s).map(_.group(1))
      val parts = "\"partitions\":\\{([^}]*)\\}".r.findFirstMatchIn(s).map(_.group(1)) match {
        case Some(body) if body.nonEmpty =>
          body.split(",").map { kv =>
            val Array(k, v) = kv.split(":", 2)
            k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
          }.toMap
        case _ => Map.empty[String, Long]
      }
      fp.map(f => (f, parts))
    }

    def shouldRun(outDir: String, stage: String, fingerprint: String): Boolean =
      !read(outDir, stage).exists(_._1 == fingerprint)
  }

  final case class Config(
      nodeBuckets: Int = 16,
      edgeBuckets: Int = 16,
      // Above this many surface rows the surface->entity map no longer gets a
      // broadcast hint: a blind broadcast of an unbounded vocabulary OOMs the
      // driver/executors at 100TB scale; past the cap the joins fall back to
      // shuffle joins with AQE (the triple stream shuffles — unavoidable once
      // the map exceeds executor memory).
      maxBroadcastSurfaces: Long = 5000000L)

  /** Surface->entity map with a size-guarded broadcast hint (see Config).
    * Callers that already know the surface count pass it via `knownCount` so
    * the guard is free; otherwise `linked` should be pinned (localCheckpoint)
    * before calling, or the count re-runs its whole lineage.
    */
  def surfaceMap(linked: DataFrame, maxBroadcastSurfaces: Long = 5000000L,
      knownCount: Option[Long] = None): DataFrame = {
    import linked.sparkSession.implicits._
    val sel = linked.select($"etype", $"surface", $"entity_id", $"canonical_surface")
    if (knownCount.getOrElse(linked.count()) <= maxBroadcastSurfaces) broadcast(sel) else sel
  }

  /** A partition is complete when its directory holds at least one parquet
    * part file (a killed executor leaves the dir absent or empty).
    */
  private def partitionComplete(tableDir: String, partPath: String): Boolean = {
    val d = new java.io.File(s"$tableDir/$partPath")
    d.isDirectory && d.listFiles() != null &&
      d.listFiles().exists(f => f.getName.endsWith(".parquet") && f.length() > 0)
  }

  /** Write `df` partitioned by `partCols` with per-partition lineage.
    * Returns the per-partition counts written (or previously recorded).
    */
  private def writeWithLineage(df: DataFrame, tableDir: String, partCols: Seq[String],
      outDir: String, stage: String, fingerprint: String): Map[String, Long] = {
    val partPath = concat_ws("/",
      partCols.map(c => concat(lit(s"$c="), col(c).cast("string"))): _*)
    Lineage.read(outDir, stage) match {
      case Some((fp, recorded)) if fp == fingerprint && recorded.nonEmpty =>
        val missing = recorded.keySet.filterNot(partitionComplete(tableDir, _))
        if (missing.isEmpty) return recorded // exact resume: nothing to do
        // selective repair: recompute ONLY the damaged partitions; dynamic
        // overwrite replaces just the partitions present in the written data
        df.where(partPath.isin(missing.toSeq: _*))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partCols: _*)
          .parquet(tableDir)
        recorded
      case _ =>
        df.write.mode(SaveMode.Overwrite)
          .partitionBy(partCols: _*)
          .parquet(tableDir)
        val counts = df.groupBy(partPath.as("p")).count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        Lineage.record(outDir, stage, fingerprint, counts)
        counts
    }
  }

  /** Write nodes + edges; returns (nodes, edges) DataFrames (also persisted).
    *
    * @param linked output of EntityLink.link
    * @param fingerprint identifies the input snapshot (e.g. seed + scale)
    */
  def materialize(
      triples: Dataset[Triple],
      linked: DataFrame,
      outDir: String,
      fingerprint: String,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val spark = triples.sparkSession
    import spark.implicits._

    // materialize the linking result once: it feeds nodes, the size guard and
    // both edge joins (4 consumers); vocabulary-sized, so cheap to pin
    val linkedM = linked.localCheckpoint()

    val nodes = linkedM
      .groupBy($"entity_id", $"etype")
      .agg(
        sum($"n_mentions").as("n_mentions"),
        max(struct($"n_mentions".as("c"), $"canonical_surface".as("s"))).getField("s").as("canonical_surface"),
        count(lit(1)).as("n_surfaces"))
      .withColumn("bucket", pmod(hash($"entity_id"), lit(cfg.nodeBuckets)))

    writeWithLineage(nodes, s"$outDir/nodes", Seq("etype", "bucket"), outDir, "nodes", fingerprint)

    // surface -> entity map is vocabulary-sized: broadcast it into both joins
    // (size-guarded) so the triple stream itself is never shuffled.
    val surfMap = surfaceMap(linkedM, cfg.maxBroadcastSurfaces)

    val edges = triples.toDF()
      .join(surfMap
          .withColumnRenamed("etype", "subj_type").withColumnRenamed("surface", "subj")
          .withColumnRenamed("entity_id", "subj_id").withColumnRenamed("canonical_surface", "subj_canonical"),
        Seq("subj_type", "subj"))
      .join(surfMap
          .withColumnRenamed("etype", "obj_type").withColumnRenamed("surface", "obj")
          .withColumnRenamed("entity_id", "obj_id").withColumnRenamed("canonical_surface", "obj_canonical"),
        Seq("obj_type", "obj"))
      .groupBy($"subj_id", $"pred", $"obj_id")
      .agg(
        count(lit(1)).as("weight"),
        first($"subj_canonical").as("subj_canonical"),
        first($"obj_canonical").as("obj_canonical"),
        min($"conv_id").as("sample_conv_id"))
      .withColumn("bucket", pmod(hash($"subj_id"), lit(cfg.edgeBuckets)))

    writeWithLineage(edges, s"$outDir/edges", Seq("bucket"), outDir, "edges", fingerprint)
    (nodes, edges)
  }
}
