package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads are opaque `binary`
  * columns with typed metadata, processed in BATCHES inside `mapPartitions`
  * (the Scala analogue of an Arrow-batched pandas UDF — the batch boundary is
  * where a real decoder amortizes native-library calls / GPU transfers).
  *
  * The codecs are REAL, using decoders that ship with the JDK:
  *   - image: PNG via javax.imageio (decode to pixels; quadrant luminance
  *     features + dimensions)
  *   - audio: RIFF/WAVE PCM-16 parsed from the container header (sample rate,
  *     channels, sample count; per-segment RMS features)
  *   - video: no video codec ships with the JDK, so "video" is a trivial
  *     length-prefixed container of PNG FRAMES (magic "GVID"); frame-sampled
  *     decode reads every k-th frame through the real PNG decoder.
  * The synthetic payload generator writes genuine PNG/WAV/GVID bytes derived
  * deterministically from the document text, so decode outputs are pure
  * functions of the input table at any parallelism.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class DecodedRow(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int, // image/video: pixel width; audio: sample rate
      height: Int, // image/video: pixel height; audio: channel count
      n_frames: Int, // video: frame count; audio: sample count; image: 1
      feature: Array[Float])

  // ---- deterministic synthetic payloads (real formats) ----

  private def rngStream(seed: Long): Iterator[Long] =
    Iterator.iterate(Hashing.splitmix64(seed))(Hashing.splitmix64)

  /** Render a real PNG whose dimensions and pixels derive from `seed`. */
  def synthPng(seed: Long): Array[Byte] = {
    val h0 = Hashing.splitmix64(seed)
    val w = 8 + ((h0 >>> 8) % 17).toInt
    val h = 8 + ((h0 >>> 16) % 13).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rng = rngStream(seed)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (rng.next() & 0xffffff).toInt)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Render a real RIFF/WAVE (PCM 16-bit mono, 8 kHz) from `seed`. */
  def synthWav(seed: Long): Array[Byte] = {
    val h0 = Hashing.splitmix64(seed ^ 0xa0d10L)
    val nSamples = 64 + ((h0 >>> 8) % 441).toInt
    val sampleRate = 8000
    val data = new Array[Byte](nSamples * 2)
    val rng = rngStream(seed ^ 0xa0d10L)
    var i = 0
    while (i < nSamples) {
      val s = (rng.next() & 0xffff).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    def le32(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    o.writeBytes("RIFF"); le32(36 + data.length); o.writeBytes("WAVE")
    o.writeBytes("fmt "); le32(16); le16(1); le16(1); le32(sampleRate)
    le32(sampleRate * 2); le16(2); le16(16)
    o.writeBytes("data"); le32(data.length); o.write(data)
    bos.toByteArray
  }

  /** Trivial video container: "GVID" magic, frame count, then length-prefixed
    * PNG frames (big-endian ints).
    */
  def synthGvid(seed: Long): Array[Byte] = {
    val nFrames = 2 + (Hashing.splitmix64(seed ^ 0x71de0L) % 5).toInt.abs
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeBytes("GVID")
    o.writeInt(nFrames)
    for (f <- 0 until nFrames) {
      val png = synthPng(seed ^ (0x8000000L + f)) // same dims per frame not required by the parser
      o.writeInt(png.length)
      o.write(png)
    }
    bos.toByteArray
  }

  /** Attach a real synthetic media payload to each document (the sandbox
    * stand-in for reading a media column from the lake).
    */
  def withPayload(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // fan (r6, guide §2.5): encode + downstream decode otherwise run in ONE
    // scan task (single parquet split)
    Par.fan(docs.select(col("doc_id"), col("text"))).as[(Long, String)].map { case (id, text) =>
      val seed = Hashing.fnv1a64(text) ^ id
      (id % 3) match {
        case 0 => MediaRow(id, "image", synthPng(seed))
        case 1 => MediaRow(id, "audio", synthWav(seed))
        case _ => MediaRow(id, "video", synthGvid(seed))
      }
    }
  }

  val DefaultBatchSize = 64

  // ---- real decoders ----

  private def lumaFeatures(img: BufferedImage): Array[Float] = {
    // mean luminance over a 4x2 grid: translation-stable, deterministic
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Float](8)
    for (gy <- 0 until 2; gx <- 0 until 4) {
      var sum = 0.0; var n = 0
      var y = gy * h / 2
      while (y < (gy + 1) * h / 2) {
        var x = gx * w / 4
        while (x < (gx + 1) * w / 4) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          n += 1; x += 1
        }
        y += 1
      }
      out(gy * 4 + gx) = (if (n == 0) 0.0 else sum / n / 255.0).toFloat
    }
    out
  }

  def decodeImage(row: MediaRow): DecodedRow = {
    val img = ImageIO.read(new ByteArrayInputStream(row.payload))
    require(img != null, s"doc ${row.doc_id}: not a decodable image")
    DecodedRow(row.doc_id, row.media_type, row.payload.length,
      img.getWidth, img.getHeight, 1, lumaFeatures(img))
  }

  /** Parse the RIFF/WAVE container directly (fmt + data chunks, PCM-16). */
  def decodeWav(row: MediaRow): DecodedRow = {
    val b = row.payload
    def le32(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    require(b.length > 44 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE", s"doc ${row.doc_id}: not a WAV")
    var off = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val len = le32(off + 4)
      if (id == "fmt ") { channels = le16(off + 10); sampleRate = le32(off + 12); bits = le16(off + 22) }
      else if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    require(dataOff >= 0 && bits == 16, s"doc ${row.doc_id}: unsupported WAV layout")
    val nSamples = dataLen / 2 / math.max(1, channels)
    // per-segment RMS over 8 equal spans
    val feat = new Array[Float](8)
    for (seg <- 0 until 8) {
      val from = seg * nSamples / 8; val until = (seg + 1) * nSamples / 8
      var sum = 0.0; var n = 0
      var i = from
      while (i < until) {
        val s = ((b(dataOff + 2 * i) & 0xff) | (b(dataOff + 2 * i + 1) << 8)).toShort
        sum += s.toDouble * s.toDouble; n += 1; i += 1
      }
      feat(seg) = (if (n == 0) 0.0 else math.sqrt(sum / n) / 32768.0).toFloat
    }
    DecodedRow(row.doc_id, row.media_type, b.length, sampleRate, channels, nSamples, feat)
  }

  /** Frame-sampled video decode: parse the container, PNG-decode every k-th
    * frame, average their luminance grids.
    */
  def decodeVideo(row: MediaRow, frameStep: Int = 2): DecodedRow = {
    val in = new DataInputStream(new ByteArrayInputStream(row.payload))
    val magic = new Array[Byte](4); in.readFully(magic)
    require(new String(magic, "US-ASCII") == "GVID", s"doc ${row.doc_id}: not a GVID container")
    val nFrames = in.readInt()
    val feat = new Array[Float](8)
    var sampled = 0
    var width = 0; var height = 0
    for (f <- 0 until nFrames) {
      val len = in.readInt()
      val frame = new Array[Byte](len); in.readFully(frame)
      if (f % frameStep == 0) {
        val img = ImageIO.read(new ByteArrayInputStream(frame))
        require(img != null, s"doc ${row.doc_id}: frame $f not decodable")
        if (f == 0) { width = img.getWidth; height = img.getHeight }
        val lf = lumaFeatures(img)
        var i = 0
        while (i < 8) { feat(i) += lf(i); i += 1 }
        sampled += 1
      }
    }
    var i = 0
    while (i < 8) { feat(i) /= math.max(1, sampled); i += 1 }
    DecodedRow(row.doc_id, row.media_type, row.payload.length, width, height, nFrames, feat)
  }

  private def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow] =
    // a native decoder would receive the whole batch here (one JNI/GPU call);
    // the JDK codecs are per-payload, so the batch loop lives at this boundary
    batch.map { r =>
      r.media_type match {
        case "image" => decodeImage(r)
        case "audio" => decodeWav(r)
        case "video" => decodeVideo(r)
        case other => throw new IllegalArgumentException(s"doc ${r.doc_id}: unknown media type '$other'")
      }
    }

  /** Batched decode over partitions: groups rows into `batchSize` chunks so
    * the decoder sees the batch shape an Arrow/pandas-UDF path would.
    * Shuffle-free; output is a typed Dataset whose feature column matches
    * `embeddings.embedding` (Array[Float]) for the similarity operators.
    */
  def decode(media: Dataset[MediaRow], batchSize: Int = DefaultBatchSize): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }
}
