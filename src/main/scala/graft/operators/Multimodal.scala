package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Extracted features for one media payload. `embedding` is the stubbed
  * "model output" — deterministic bytes-derived floats standing in for a real
  * encoder.
  */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    checksum: String,
    mean_byte: Double,
    byte_histogram: Array[Long],
    embedding: Array[Float])

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in batches.
  *
  * The actual decode kernel is STUBBED (this environment has no image/audio
  * codecs): `decodeStub` derives deterministic features from raw bytes where
  * a real pipeline would decode pixels / PCM frames. Everything around the
  * stub — binary columns, metadata struct, batch-shaped `mapPartitions`
  * (mirroring the arrow-batch shape a vectorized UDF would see), output
  * schema with an embedding column — is real Spark plumbing and is tested.
  *
  * Scale notes: payloads never shuffle (features are extracted in the scan
  * stage); batch size bounds peak memory per task; the feature table is the
  * only thing downstream operators (dedup, ANN) ever join on.
  */
object Multimodal {

  implicit private val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Wrap a text corpus as fake media rows: (doc_id, media_type, payload
    * BINARY, meta STRUCT). Stands in for reading real image/audio bytes.
    */
  def asMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      // deterministic fake modality assignment
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        md5(col(textCol)).as("checksum")).as("meta"))

  /** Frame sampling over a binary payload (the video/audio pattern: take
    * every `stride`-th window of `frameLen` bytes, at most `maxFrames`) —
    * pure Catalyst expressions, the payload never leaves the scan stage. A
    * real pipeline would hand each frame to a decoder; the frame *slicing*
    * plumbing here is the production shape.
    * Output: (doc_id, media_type, n_frames, frames ARRAY<BINARY>,
    * first_frame_checksum).
    */
  def frameSample(
      media: DataFrame,
      frameLen: Int = 32,
      stride: Int = 64,
      maxFrames: Int = 8): DataFrame = {
    val n = octet_length(col("payload"))
    val maxStart = floor((n - lit(frameLen)).cast("double") / lit(stride)).cast("long")
    val frames = when(n >= frameLen,
      transform(
        sequence(lit(0L), least(maxStart, lit(maxFrames - 1L))),
        i => substring(col("payload"), (i * stride + 1).cast("int"), lit(frameLen))))
      .otherwise(array())
    media.select(
      col("doc_id"), col("media_type"),
      frames.as("frames"))
      .withColumn("n_frames", size(col("frames")).cast("long"))
      .withColumn("first_frame_checksum",
        when(col("n_frames") > 0, md5(element_at(col("frames"), 1))).otherwise(lit(null)))
  }

  /** Batched feature extraction over binary payloads. The per-batch loop is
    * where a vectorized decode (pixels → resize → encoder) would run; the
    * stub computes deterministic byte statistics + a fake 8-dim embedding.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch-shaped kernel: one call per batch, like an arrow UDF
          batch.map { case (id, mt, bytes) => decodeStub(id, mt, bytes) }
        }
      }
  }

  /** Batched resize over binary payloads: the image/audio down-sampling
    * pattern. The KERNEL is stubbed (no codecs in this environment): instead
    * of decode→interpolate→encode it takes every `stride`-th byte with
    * `stride = max(1, n / targetLen)`, capped at `targetLen` samples — a
    * deterministic stand-in with the production Spark shape (binary in,
    * binary out, batch-sized mapPartitions, payload never shuffles).
    * Output: input columns + (resized BINARY, resized_n BIGINT).
    */
  def resize(media: DataFrame, targetLen: Int = 64, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(Long, String, Array[Byte], Array[Byte], Long)] =
      Encoders.product[(Long, String, Array[Byte], Array[Byte], Long)]
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, mt, bytes) =>
            val r = resizeStub(bytes, targetLen)
            (id, mt, bytes, r, r.length.toLong)
          }
        }
      }
      .toDF("doc_id", "media_type", "payload", "resized", "resized_n")
  }

  /** STUB resize kernel — strided byte sampling standing in for a real
    * decode→interpolate→encode. Deterministic and SQL-replicable.
    */
  private[graft] def resizeStub(bytes: Array[Byte], targetLen: Int): Array[Byte] = {
    val n = bytes.length
    if (n == 0) return Array.emptyByteArray
    val stride = math.max(1, n / targetLen)
    val out = new Array[Byte](math.min(targetLen, (n + stride - 1) / stride))
    var i = 0
    while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
    out
  }

  /** STUB decode kernel — deterministic features from raw bytes. A real
    * implementation would decode the payload (JPEG/PCM/frames) here.
    */
  private[graft] def decodeStub(id: Long, mediaType: String, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    val hist = new Array[Long](4)
    var sum = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      hist(b >>> 6) += 1
      sum += b
      i += 1
    }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    val emb = new Array[Float](8)
    var j = 0
    while (j < 8) {
      // fold every 8th byte into one embedding lane; mod-prime keeps the
      // accumulator positive and overflow-free (and thus SQL-replicable)
      var acc = 0L
      var k = j
      while (k < n) { acc = (acc * 31L + (bytes(k) & 0xFF)) % 1000000007L; k += 8 }
      emb(j) = ((acc % 1000L).toFloat) / 1000.0f
      j += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val checksum = md.digest(bytes).map("%02x".format(_)).mkString
    MediaFeatures(id, mediaType, n.toLong, checksum, mean, hist, emb)
  }
}
