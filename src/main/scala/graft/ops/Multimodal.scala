package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque `binary`
  * columns with typed metadata, processed in BATCHES inside `mapPartitions`
  * (the Scala analogue of an Arrow-batched pandas UDF — the batch boundary is
  * where a real decoder would amortize native-library calls / GPU transfers).
  *
  * STUB NOTICE: no image/audio codecs ship in this container, so `decodeBatch`
  * runs a clearly-marked deterministic fake decoder; everything AROUND it —
  * schema, binary payloads, batch shaping, partition-local execution, the
  * feature-vector output contract — is real and tested (MultimodalSpec).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class DecodedRow(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Attach a synthetic binary payload to each document (the sandbox stand-in
    * for reading a real media column from the lake).
    */
  def withPayload(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val mt = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      MediaRow(id, mt, text.getBytes("UTF-8"))
    }
  }

  val DefaultBatchSize = 64

  /** ===== STUB: deterministic fake decoder =====
    * A real implementation would hand `batch` to a native decoder (libjpeg /
    * ffmpeg / a JNI model runtime) ONCE per batch. The fake derives metadata
    * and an 8-dim "feature" purely from the payload bytes so outputs are
    * reproducible across runs and parallelism levels.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow] = {
    batch.map { r =>
      val h = Hashing.splitmix64(Hashing.fnv1a64(new String(r.payload, "UTF-8")))
      val width = 16 + ((h >>> 8) % 1024).toInt
      val height = 16 + ((h >>> 24) % 1024).toInt
      val frames = if (r.media_type == "video") 1 + ((h >>> 40) % 64).toInt else 1
      val feat = Array.tabulate(8)(i =>
        ((Hashing.splitmix64(h + i) >>> 11).toDouble / (1L << 53).toDouble).toFloat)
      DecodedRow(r.doc_id, r.media_type, r.payload.length, width, height, frames, feat)
    }
  }

  /** Batched decode over partitions: groups rows into `batchSize` chunks so
    * the (stubbed) decoder sees the batch shape a real pandas-UDF/Arrow path
    * would. Shuffle-free; output is a typed Dataset ready for the similarity
    * operators (feature column = Array[Float] like `embeddings.embedding`).
    */
  def decode(media: Dataset[MediaRow], batchSize: Int = DefaultBatchSize): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }
}
