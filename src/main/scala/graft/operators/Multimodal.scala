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
  * One decode path is REAL: [[decodePpm]] parses binary PPM (`P6`) images
  * in-engine — full netpbm header grammar, raw 8-bit RGB rasters — and
  * emits exact pixel statistics. The compressed-codec kernels remain
  * STUBBED (this environment has no JPEG/PCM libraries): `decodeStub`
  * derives deterministic features from raw bytes where a real pipeline
  * would decode pixels / PCM frames. Everything around the kernels —
  * binary columns, metadata struct, batch-shaped `mapPartitions`
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

  /** Build REAL P6 (binary PPM) image payloads from a text corpus: the
    * deterministic fixture generator for [[decodePpm]]. Text bytes become
    * the RGB sample stream (row-major, 3 bytes per pixel), zero-padded to a
    * whole `width x height` raster with `height = max(1, ceil(ceil(n/3) /
    * width))`; the header is the canonical `P6\n<w> <h>\n255\n`. Because
    * the pixel stream is a pure function of the text, the expected decoded
    * stats are SQL-expressible and the decode query is oracle-checkable —
    * while [[decodePpm]] itself is a full parser, not a fixture-shaped one.
    */
  def encodePpm(
      docs: DataFrame,
      width: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    docs.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val data = text.getBytes("UTF-8")
          val npix = (data.length + 2) / 3
          val h = math.max(1, (npix + width - 1) / width)
          val header = s"P6\n$width $h\n255\n".getBytes("US-ASCII")
          val out = new Array[Byte](header.length + width * h * 3)
          System.arraycopy(header, 0, out, 0, header.length)
          System.arraycopy(data, 0, out, header.length, data.length)
          (id, out)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Decoded stats of one P6 image: integer channel sums (exact) plus the
    * ITU-R 601 luma mean in MICRO-lumas — floor((299*sum_r + 587*sum_g +
    * 114*sum_b) * 1000 / n_pixels), pure integer arithmetic, so no engine
    * can disagree on a half-way rounding tie. `valid = false` rows carry
    * zeros (payload was not a parseable 8-bit P6).
    */
  final case class PpmStats(
      doc_id: Long,
      valid: Boolean,
      width: Long,
      height: Long,
      maxval: Long,
      n_pixels: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      luma_micro: Long)

  /** REAL image decode for one public format: binary PPM (`P6`, the netpbm
    * raw-RGB format — magic, whitespace/`#`-comment-separated width,
    * height, maxval ≤ 255, one whitespace byte, then `w*h*3` raw samples).
    * Runs as the same batch-shaped `mapPartitions` kernel as the stubbed
    * codecs — payloads never shuffle, stats are extracted in the scan
    * stage — but the kernel actually parses pixels instead of faking them.
    * Output: one [[PpmStats]] row per payload (invalid payloads flagged,
    * never dropped — the caller decides).
    */
  def decodePpm(media: DataFrame, batchSize: Int = 64): Dataset[PpmStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[PpmStats] = Encoders.product[PpmStats]
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            parsePpm(if (bytes == null) Array.emptyByteArray else bytes) match {
              case Some((w, h, mv, px)) =>
                var sr = 0L; var sg = 0L; var sb = 0L
                var i = 0
                while (i < px.length) {
                  sr += px(i) & 0xFF
                  sg += px(i + 1) & 0xFF
                  sb += px(i + 2) & 0xFF
                  i += 3
                }
                val npix = w.toLong * h
                val luma =
                  if (npix == 0) 0L
                  else (299L * sr + 587L * sg + 114L * sb) * 1000L / npix
                PpmStats(id, valid = true, w, h, mv, npix, sr, sg, sb, luma)
              case None =>
                PpmStats(id, valid = false, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
            }
          }
        }
      }
  }

  /** REAL image resize (the production kernel [[resize]] stubs): parse the
    * P6 raster, nearest-neighbor point-sample to `tw x th` — target pixel
    * (r, c) reads source pixel (r*srcH div th, c*srcW div tw), the classic
    * integer floor mapping, no float interpolation so every engine agrees
    * — and re-encode as a canonical P6 payload. Output: (doc_id, valid,
    * src_width, src_height, width, height, resized BINARY, sum_r, sum_g,
    * sum_b) with the channel sums over the RESIZED raster, exact integers.
    * Unparseable payloads emit valid=false, zeros, null payload.
    *
    * Same 100 TB shape as every kernel here: batch-sized mapPartitions,
    * binary in/binary out, the payload never shuffles.
    */
  def resizePpm(
      media: DataFrame, tw: Int = 8, th: Int = 8, batchSize: Int = 64): DataFrame = {
    require(tw >= 1 && th >= 1, "target dims must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[
        (Long, Boolean, Long, Long, Long, Long, Array[Byte], Long, Long, Long)] =
      Encoders.product[
        (Long, Boolean, Long, Long, Long, Long, Array[Byte], Long, Long, Long)]
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            parsePpm(if (bytes == null) Array.emptyByteArray else bytes) match {
              // w/h >= 1: a parseable zero-dimension raster has no source
              // pixels to sample, so it is invalid for resize (decodePpm
              // still reports it as a valid empty image).
              case Some((w, h, _, px)) if w >= 1 && h >= 1 =>
                val header = s"P6\n$tw $th\n255\n".getBytes("US-ASCII")
                val out = new Array[Byte](header.length + tw * th * 3)
                System.arraycopy(header, 0, out, 0, header.length)
                var sr = 0L; var sg = 0L; var sb = 0L
                var r = 0
                while (r < th) {
                  val sy = r.toLong * h / th
                  var c = 0
                  while (c < tw) {
                    val sx = c.toLong * w / tw
                    val src = ((sy * w + sx) * 3).toInt
                    val dst = header.length + (r * tw + c) * 3
                    out(dst) = px(src); out(dst + 1) = px(src + 1); out(dst + 2) = px(src + 2)
                    sr += px(src) & 0xFF; sg += px(src + 1) & 0xFF; sb += px(src + 2) & 0xFF
                    c += 1
                  }
                  r += 1
                }
                (id, true, w.toLong, h.toLong, tw.toLong, th.toLong, out, sr, sg, sb)
              case _ =>
                (id, false, 0L, 0L, 0L, 0L, null: Array[Byte], 0L, 0L, 0L)
            }
          }
        }
      }
      .toDF("doc_id", "valid", "src_width", "src_height", "width", "height",
        "resized", "sum_r", "sum_g", "sum_b")
  }

  /** 64-bit difference hash (dHash) of each P6 payload: the raster is
    * nearest-neighbor point-sampled onto the classic 9-wide x 8-tall
    * grayscale grid — source pixel (r*srcH div 8, c*srcW div 9), the same
    * integer floor mapping as [[resizePpm]] — and bit `r*8+c` is set iff
    * `gray(r, c+1) > gray(r, c)`, with gray the integer ITU-R 601 weight
    * `299*R + 587*G + 114*B` (no division: scale cannot change an order
    * comparison). All-integer, so the hash replays exactly in the DuckDB
    * oracle. The hash ships as two unsigned 32-bit halves in BIGINTs
    * (`dhash_hi`, `dhash_lo`): bit 63 of a single signed 64-bit column
    * would force HUGEINT gymnastics on the SQL side for zero analytical
    * gain. Unparseable payloads emit `valid = false` with zero halves.
    *
    * Same 100 TB shape as every kernel here: batch-shaped mapPartitions,
    * the payload never shuffles — 16 bytes of hash do.
    */
  def dhashPpm(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(Long, Boolean, Long, Long)] =
      Encoders.product[(Long, Boolean, Long, Long)]
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            parsePpm(if (bytes == null) Array.emptyByteArray else bytes) match {
              case Some((w, h, _, px)) if w >= 1 && h >= 1 =>
                val gray = new Array[Long](8 * 9)
                var r = 0
                while (r < 8) {
                  val sy = r.toLong * h / 8
                  var c = 0
                  while (c < 9) {
                    val sx = c.toLong * w / 9
                    val base = ((sy * w + sx) * 3).toInt
                    gray(r * 9 + c) = 299L * (px(base) & 0xFF) +
                      587L * (px(base + 1) & 0xFF) + 114L * (px(base + 2) & 0xFF)
                    c += 1
                  }
                  r += 1
                }
                var hash = 0L
                var b = 0
                while (b < 64) {
                  if (gray((b >> 3) * 9 + (b & 7) + 1) > gray((b >> 3) * 9 + (b & 7)))
                    hash |= 1L << b
                  b += 1
                }
                (id, true, hash >>> 32, hash & 0xFFFFFFFFL)
              case _ => (id, false, 0L, 0L)
            }
          }
        }
      }
      .toDF("doc_id", "valid", "dhash_hi", "dhash_lo")
  }

  /** CODEC-INVARIANT 64-bit dHash: [[dhashPpm]]'s 9x8 grayscale-grid hash
    * over ANY decodable image payload — the hand-parsed P6 fast path
    * first (no BufferedImage allocation for the common fixture format),
    * then the JDK's public ImageIO stack (PNG, JPEG, BMP, GIF). The grid
    * sampling and ITU-R 601 weights are byte-identical across both
    * decode paths, so the SAME raster hashes to the SAME 64 bits
    * whatever container it shipped in — which is the whole point of a
    * perceptual near-dup pass over a mixed-codec corpus (a PNG re-encode
    * of a PPM is Hamming-0, not a new image). Same kernel shape:
    * batch-sized mapPartitions, payloads never shuffle, 16 hash bytes do.
    */
  def dhashImage(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(Long, Boolean, Long, Long)] =
      Encoders.product[(Long, Boolean, Long, Long)]
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes0) =>
            val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
            val gray: Array[Long] = parsePpm(bytes) match {
              case Some((w, h, _, px)) if w >= 1 && h >= 1 =>
                val g = new Array[Long](8 * 9)
                var r = 0
                while (r < 8) {
                  val sy = r.toLong * h / 8
                  var c = 0
                  while (c < 9) {
                    val sx = c.toLong * w / 9
                    val base = ((sy * w + sx) * 3).toInt
                    g(r * 9 + c) = 299L * (px(base) & 0xFF) +
                      587L * (px(base + 1) & 0xFF) + 114L * (px(base + 2) & 0xFF)
                    c += 1
                  }
                  r += 1
                }
                g
              case _ =>
                val img =
                  if (bytes.isEmpty) null
                  else
                    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
                    catch { case scala.util.control.NonFatal(_) => null }
                if (img == null || img.getWidth < 1 || img.getHeight < 1) null
                else {
                  val w = img.getWidth; val h = img.getHeight
                  val g = new Array[Long](8 * 9)
                  var r = 0
                  while (r < 8) {
                    val sy = (r.toLong * h / 8).toInt
                    var c = 0
                    while (c < 9) {
                      val sx = (c.toLong * w / 9).toInt
                      val rgb = img.getRGB(sx, sy)
                      g(r * 9 + c) = 299L * ((rgb >> 16) & 0xFF) +
                        587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
                      c += 1
                    }
                    r += 1
                  }
                  g
                }
            }
            if (gray == null) (id, false, 0L, 0L)
            else {
              var hash = 0L
              var b = 0
              while (b < 64) {
                if (gray((b >> 3) * 9 + (b & 7) + 1) > gray((b >> 3) * 9 + (b & 7)))
                  hash |= 1L << b
                b += 1
              }
              (id, true, hash >>> 32, hash & 0xFFFFFFFFL)
            }
          }
        }
      }
      .toDF("doc_id", "valid", "dhash_hi", "dhash_lo")
  }

  /** The shared banded-Hamming candidate machinery of the perceptual
    * near-dup family: 64-bit signatures (as unsigned 32-bit halves)
    * blocked by a 4-band x 16-bit banded SELF-JOIN (two signatures are
    * candidates iff any 16-bit quarter matches exactly — the same
    * equi-join candidate bound as the MinHash/SimHash text families:
    * never all-pairs, collision mass N²/2^16 per band), then exact
    * Hamming verification on the candidates only. Pigeonhole
    * completeness holds to radius 3; beyond that the bands are a recall
    * heuristic — the standard banding trade, and the DuckDB oracles
    * replay the same bands, so the contract is exact either way.
    */
  private def bandedHammingPairs(
      sigs: DataFrame, hiCol: String, loCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val mask = lit(0xFFFFL)
    val bands = sigs.select(col("doc_id"), col(hiCol).as("__hi"), col(loCol).as("__lo"))
      .select(col("doc_id"), col("__hi"), col("__lo"),
        explode(array(
          struct(lit(0).as("k"), col("__lo").bitwiseAND(mask).as("band")),
          struct(lit(1).as("k"),
            shiftrightunsigned(col("__lo"), 16).bitwiseAND(mask).as("band")),
          struct(lit(2).as("k"), col("__hi").bitwiseAND(mask).as("band")),
          struct(lit(3).as("k"),
            shiftrightunsigned(col("__hi"), 16).bitwiseAND(mask).as("band")))).as("b"))
      .select(col("doc_id"), col("__hi"), col("__lo"),
        col("b.k").as("k"), col("b.band").as("band"))
    val ham = (bit_count(col("x.__hi").bitwiseXOR(col("y.__hi"))) +
      bit_count(col("x.__lo").bitwiseXOR(col("y.__lo")))).cast("int")
    bands.as("x").join(bands.as("y"), Seq("k", "band"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        ham.as("hamming"))
      .filter(col("hamming") <= lit(maxHamming))
      .distinct()
  }

  /** Perceptual near-duplicate image pairs over a (possibly mixed-codec)
    * corpus: [[dhashImage]] signatures — P6 and every ImageIO format hash
    * identically, so a pair can span codecs — through the banded-Hamming
    * machinery ([[bandedHammingPairs]]). Output: (id_a, id_b,
    * hamming INT), id_a < id_b, distinct.
    */
  def nearDupPairs(
      media: DataFrame, maxHamming: Int = 6, batchSize: Int = 64): DataFrame =
    bandedHammingPairs(
      dhashImage(media, batchSize).filter(col("valid")),
      "dhash_hi", "dhash_lo", maxHamming)

  /** 64-bit energy-envelope contour hash of a PCM WAV payload — the AUDIO
    * twin of [[dhashPpm]]: the signed 16-bit FRAME stream is cut into 65
    * contiguous floor-boundary windows (window j = frames
    * [j·n div 65, (j+1)·n div 65)), each window's energy is the exact
    * integer sum of absolute amplitudes over EVERY channel of its frames
    * (a stereo payload hashes its joint L+R loudness contour, not the
    * first half of its interleaved samples), and bit b is set iff window b+1's
    * MEAN energy exceeds window b's — compared cross-multiplied
    * (e_{b+1}·n_b > e_b·n_{b+1}), exact integers, no division. Loudness-
    * contour shape, not absolute level, is what survives small edits: a
    * one-sample change perturbs one window and flips at most its two
    * adjacent comparison bits. All-integer (exact to ~10^8 samples per
    * payload before the cross-product nears 2^63), so the DuckDB oracle
    * replays it bit-for-bit. Ships as two unsigned 32-bit halves
    * (`ehash_hi`, `ehash_lo`), mirroring [[dhashPpm]]'s contract;
    * unparseable payloads emit valid = false.
    */
  def envelopeHashWav(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(Long, Boolean, Long, Long)] =
      Encoders.product[(Long, Boolean, Long, Long)]
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            parseWav(if (bytes == null) Array.emptyByteArray else bytes) match {
              case Some((ch, _, _, data)) =>
                val n = data.length / (ch * 2) // frames
                val e = new Array[Long](65)
                val wn = new Array[Long](65)
                var j = 0
                while (j < 65) {
                  val lo = (j.toLong * n / 65).toInt
                  val hi = ((j + 1).toLong * n / 65).toInt
                  wn(j) = hi - lo
                  var i = lo
                  var s = 0L
                  while (i < hi) {
                    // frame energy = |sample| summed over ALL channels of
                    // frame i (samples are frame-interleaved L R L R …) —
                    // indexing 2*i alone would cover only the first n/ch
                    // frames of a stereo payload
                    var c = 0
                    while (c < ch) {
                      val o = 2 * (i * ch + c)
                      val v = ((data(o) & 0xFF) | (data(o + 1) << 8)).toShort.toLong
                      s += math.abs(v)
                      c += 1
                    }
                    i += 1
                  }
                  e(j) = s
                  j += 1
                }
                var hash = 0L
                var b = 0
                while (b < 64) {
                  if (e(b + 1) * wn(b) > e(b) * wn(b + 1)) hash |= 1L << b
                  b += 1
                }
                (id, true, hash >>> 32, hash & 0xFFFFFFFFL)
              case None => (id, false, 0L, 0L)
            }
          }
        }
      }
      .toDF("doc_id", "valid", "ehash_hi", "ehash_lo")
  }

  /** Perceptual near-duplicate AUDIO pairs: [[envelopeHashWav]] contour
    * signatures through the same banded-Hamming machinery as the image
    * family. Output: (id_a, id_b, hamming INT), id_a < id_b, distinct.
    */
  def nearDupPairsWav(
      media: DataFrame, maxHamming: Int = 6, batchSize: Int = 64): DataFrame =
    bandedHammingPairs(
      envelopeHashWav(media, batchSize).filter(col("valid")),
      "ehash_hi", "ehash_lo", maxHamming)

  /** The P6 parser: returns (width, height, maxval, samples) or None. Full
    * header grammar — any run of whitespace between tokens, `#` comments to
    * end-of-line inside the header, exactly one whitespace byte after
    * maxval — for 8-bit images (maxval <= 255; 2-byte-sample images are
    * reported invalid, not misread). Trailing bytes after the raster are
    * tolerated (netpbm readers ignore them); a short raster is invalid.
    */
  private[graft] def parsePpm(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    var pos = 0
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    pos = 2
    def readInt(): Long = {
      var skipping = true
      while (skipping && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else skipping = false
      }
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9' &&
          v <= Int.MaxValue) {
        v = v * 10 + (bytes(pos) - '0')
        pos += 1
      }
      if (pos == start || v > Int.MaxValue) -1L else v
    }
    val w = readInt(); val h = readInt(); val mv = readInt()
    if (w < 0 || h < 0 || mv < 1 || mv > 255) return None
    if (pos >= bytes.length || !isWs(bytes(pos))) return None
    pos += 1
    val need = w * h * 3
    if (need > bytes.length - pos) return None
    Some((w.toInt, h.toInt, mv.toInt,
      java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt)))
  }

  /** Build REAL PNG payloads from a text corpus via the JDK's ImageIO
    * (public `javax.imageio` API — the one codec stack every JVM ships):
    * the same RGB raster convention as [[encodePpm]] — text bytes become
    * the row-major 3-bytes-per-pixel stream, zero-padded to `width x h`
    * with `h = max(1, ceil(ceil(n/3)/width))` — losslessly compressed, so
    * the DECODED stats are the identical pure function of the text and the
    * PPM oracle replays them unchanged (the encoded bytes themselves may
    * differ across JDK encoder versions; only decoded pixels are
    * contractual, which is why the fixture is PNG and not JPEG).
    */
  def encodePng(
      docs: DataFrame,
      width: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    docs.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no tmp-file spooling per payload
        it.map { case (id, text) =>
          val data = text.getBytes("UTF-8")
          val npix = (data.length + 2) / 3
          val h = math.max(1, (npix + width - 1) / width)
          val img = new java.awt.image.BufferedImage(
            width, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var p = 0
          while (p < width * h) {
            def at(i: Int): Int = if (i < data.length) data(i) & 0xFF else 0
            img.setRGB(p % width, p / width,
              (at(3 * p) << 16) | (at(3 * p + 1) << 8) | at(3 * p + 2))
            p += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** REAL image decode for every format the JDK's ImageIO reads (PNG,
    * JPEG, BMP, GIF — `javax.imageio`, the public JVM codec stack): one
    * [[PpmStats]] row per payload with the same exact-integer stats
    * contract as [[decodePpm]] (channel sums over 8-bit RGB, ITU-R 601
    * micro-luma by floor division; maxval reports 255, the 8-bit-RGB
    * ceiling ImageIO normalizes to). Unreadable payloads emit
    * valid=false, never throw — same robustness contract as the other
    * kernels — and the 100 TB shape is unchanged: batch-sized
    * mapPartitions, payloads never shuffle, stats extracted in the scan
    * stage.
    */
  def decodeImage(media: DataFrame, batchSize: Int = 64): Dataset[PpmStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[PpmStats] = Encoders.product[PpmStats]
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // decode from memory, no tmp files
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val img =
              if (bytes == null || bytes.isEmpty) null
              else
                // corrupt payloads can surface as runtime exceptions from
                // format plugins, not just IOException — the kernel's
                // contract is flag-invalid, never fail the job
                try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
                catch { case scala.util.control.NonFatal(_) => null }
            if (img == null)
              PpmStats(id, valid = false, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
            else {
              val w = img.getWidth; val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xFF
                  sg += (rgb >> 8) & 0xFF
                  sb += rgb & 0xFF
                  x += 1
                }
                y += 1
              }
              val npix = w.toLong * h
              val luma =
                if (npix == 0) 0L
                else (299L * sr + 587L * sg + 114L * sb) * 1000L / npix
              PpmStats(id, valid = true, w, h, 255L, npix, sr, sg, sb, luma)
            }
          }
        }
      }
  }

  /** Build REAL RIFF/WAVE payloads (canonical PCM: mono, 16-bit,
    * little-endian) from a text corpus: the deterministic fixture
    * generator for [[decodeWav]], the audio twin of [[encodePpm]]. Text
    * bytes become the raw PCM stream (zero-padded to a whole 16-bit
    * sample), preceded by a `LIST/INFO` chunk so the decoder must actually
    * WALK chunks rather than assume fixed offsets. The sample stream is a
    * pure function of the text, so the expected decoded stats are
    * SQL-expressible and the decode query is oracle-checkable — while
    * [[decodeWav]] itself is a full chunk-walking parser.
    */
  def encodeWav(
      docs: DataFrame,
      sampleRate: Int = 8000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    docs.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val data0 = text.getBytes("UTF-8")
          val dataLen = data0.length + (data0.length & 1) // pad to a sample
          val info = "INFO".getBytes("US-ASCII")
          val out = java.nio.ByteBuffer
            .allocate(12 + (8 + info.length) + 24 + 8 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out.put("RIFF".getBytes("US-ASCII"))
          out.putInt(4 + (8 + info.length) + 24 + 8 + dataLen)
          out.put("WAVE".getBytes("US-ASCII"))
          out.put("LIST".getBytes("US-ASCII")); out.putInt(info.length); out.put(info)
          out.put("fmt ".getBytes("US-ASCII")); out.putInt(16)
          out.putShort(1)                        // PCM
          out.putShort(1)                        // mono
          out.putInt(sampleRate)
          out.putInt(sampleRate * 2)             // byte rate
          out.putShort(2)                        // block align
          out.putShort(16)                       // bits per sample
          out.put("data".getBytes("US-ASCII")); out.putInt(dataLen)
          out.put(data0)                          // zero-pad byte is implicit
          (id, out.array())
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Decoded stats of one PCM WAV: exact integer aggregates over the
    * signed 16-bit samples — no float op anywhere, so no engine can
    * disagree. `dur_micros = n_frames * 1_000_000 / sample_rate` (integer
    * division). `valid = false` rows carry zeros.
    */
  final case class WavStats(
      doc_id: Long,
      valid: Boolean,
      n_channels: Long,
      sample_rate: Long,
      bits: Long,
      n_frames: Long,
      dur_micros: Long,
      sum_abs: Long,
      peak_abs: Long,
      sum_sq: Long)

  /** REAL audio decode for one public format: RIFF/WAVE with 16-bit PCM
    * (format tag 1). A full chunk walker — `RIFF` size + `WAVE` form
    * check, then (id, little-endian u32 size) chunks with odd-size pad
    * bytes per the RIFF spec, `fmt ` and `data` accepted in either order,
    * unknown chunks skipped — not a fixed-offset fixture reader. Same
    * batch-shaped `mapPartitions` kernel as the other codecs: payloads
    * never shuffle, stats come out of the scan stage. Output: one
    * [[WavStats]] row per payload (invalid payloads flagged, never
    * dropped).
    */
  def decodeWav(media: DataFrame, batchSize: Int = 64): Dataset[WavStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[WavStats] = Encoders.product[WavStats]
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            parseWav(if (bytes == null) Array.emptyByteArray else bytes) match {
              case Some((ch, rate, bits, data)) =>
                var sumAbs = 0L; var peak = 0L; var sumSq = 0L
                var i = 0
                while (i + 1 < data.length) {
                  val s = ((data(i) & 0xFF) | (data(i + 1) << 8)).toShort.toLong
                  val a = math.abs(s)
                  sumAbs += a; sumSq += s * s
                  if (a > peak) peak = a
                  i += 2
                }
                val frames = data.length / (ch * 2)
                WavStats(id, valid = true, ch, rate, bits, frames,
                  frames * 1000000L / rate, sumAbs, peak, sumSq)
              case None =>
                WavStats(id, valid = false, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
            }
          }
        }
      }
  }

  /** The RIFF/WAVE parser: returns (channels, sample_rate, bits, data) or
    * None. Requires PCM format tag 1 and 16-bit samples (anything else is
    * reported invalid, not misread); data truncated short of its declared
    * size is invalid; trailing bytes after the RIFF payload are tolerated.
    */
  /** REAL audio resample (the audio twin of [[resizePpm]]): parse the
    * RIFF/PCM payload, point-sample the 16-bit mono frames to
    * `targetRate` — output frame t reads source frame
    * `t * srcRate div targetRate`, pure integer floor mapping, no
    * interpolation filter so every engine agrees — and re-encode a
    * canonical PCM WAV at the target rate (itself [[decodeWav]]-parseable).
    * Output: (doc_id, valid, src_rate, sample_rate, n_frames_src,
    * n_frames, resampled BINARY, sum_abs, peak_abs, sum_sq) with the
    * aggregates over the RESAMPLED signed samples, exact integers.
    * Same kernel shape: batch-sized mapPartitions, payload never shuffles.
    */
  def resampleWav(
      media: DataFrame, targetRate: Int = 3000, batchSize: Int = 64): DataFrame = {
    require(targetRate >= 1, "targetRate must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[
        (Long, Boolean, Long, Long, Long, Long, Array[Byte], Long, Long, Long)] =
      Encoders.product[
        (Long, Boolean, Long, Long, Long, Long, Array[Byte], Long, Long, Long)]
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            parseWav(if (bytes == null) Array.emptyByteArray else bytes) match {
              case Some((1, sr, 16, data)) =>
                val n = data.length / 2
                val nOut = (n.toLong * targetRate / sr).toInt
                val out = java.nio.ByteBuffer.allocate(44 + nOut * 2)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                out.put("RIFF".getBytes("US-ASCII")); out.putInt(36 + nOut * 2)
                out.put("WAVE".getBytes("US-ASCII"))
                out.put("fmt ".getBytes("US-ASCII")); out.putInt(16)
                out.putShort(1); out.putShort(1)
                out.putInt(targetRate); out.putInt(targetRate * 2)
                out.putShort(2); out.putShort(16)
                out.put("data".getBytes("US-ASCII")); out.putInt(nOut * 2)
                var sumAbs = 0L; var peak = 0L; var sumSq = 0L
                var t = 0
                while (t < nOut) {
                  val src = (t.toLong * sr / targetRate).toInt
                  val lo = data(2 * src) & 0xFF
                  val hi = data(2 * src + 1)
                  val s = (hi << 8) | lo
                  out.putShort(s.toShort)
                  val a = math.abs(s.toLong)
                  sumAbs += a; if (a > peak) peak = a; sumSq += s.toLong * s
                  t += 1
                }
                (id, true, sr.toLong, targetRate.toLong, n.toLong, nOut.toLong,
                  out.array(), sumAbs, peak, sumSq)
              case _ =>
                (id, false, 0L, 0L, 0L, 0L, null: Array[Byte], 0L, 0L, 0L)
            }
          }
        }
      }
      .toDF("doc_id", "valid", "src_rate", "sample_rate", "n_frames_src",
        "n_frames", "resampled", "sum_abs", "peak_abs", "sum_sq")
  }

  private[graft] def parseWav(
      bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    def u16(p: Int): Int = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
    def u32(p: Int): Long =
      (bytes(p) & 0xFFL) | ((bytes(p + 1) & 0xFFL) << 8) |
        ((bytes(p + 2) & 0xFFL) << 16) | ((bytes(p + 3) & 0xFFL) << 24)
    def tag(p: Int): String =
      new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(4))
    var pos = 12L
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[Array[Byte]] = None
    while (pos + 8 <= riffEnd) {
      val id = tag(pos.toInt)
      val size = u32(pos.toInt + 4)
      val body = pos + 8
      if (body + size > bytes.length) return None // truncated chunk
      id match {
        case "fmt " =>
          if (size < 16) return None
          val format = u16(body.toInt)
          val ch = u16(body.toInt + 2)
          val rate = u32(body.toInt + 4)
          val bits = u16(body.toInt + 14)
          if (format != 1 || ch < 1 || rate < 1 || rate > Int.MaxValue ||
              bits != 16) return None
          fmt = Some((ch, rate.toInt, bits))
        case "data" =>
          data = Some(java.util.Arrays.copyOfRange(
            bytes, body.toInt, (body + size).toInt))
        case _ => () // unknown chunk: skip
      }
      pos = body + size + (size & 1) // RIFF chunks pad to even
    }
    for ((ch, rate, bits) <- fmt; d <- data) yield (ch, rate, bits, d)
  }

  /** Deterministic uncompressed AVI fixtures (RIFF `AVI ` form, one
    * `vids/DIB ` stream of 24-bit raw frames) from a text corpus: the
    * video twin of [[encodeWav]]. The concatenated frame payload is the
    * text's UTF-8 bytes zero-padded to whole `width*height*3`-byte
    * frames (at least one frame, so empty docs still decode), split into
    * one `00db` chunk per frame inside the `movi` LIST. A `JUNK` chunk
    * rides between the header and `movi` so the decoder must actually
    * walk and skip, never assume offsets. Frame bytes are a pure function
    * of the text, so the decoded stats are SQL-expressible while
    * [[decodeAvi]] is a full container parser.
    */
  def encodeAvi(
      docs: DataFrame,
      width: Int = 8,
      height: Int = 4,
      usPerFrame: Int = 40000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val frameBytes = width * height * 3
    docs.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val data0 = text.getBytes("UTF-8")
          val nFrames = math.max(1, (data0.length + frameBytes - 1) / frameBytes)
          val junk = "graft-avi-fixture".getBytes("US-ASCII")
          val junkLen = junk.length + (junk.length & 1)
          // hdrl = avih(56) + LIST strl(4 + strh(8+56) + strf(8+40))
          val hdrlLen = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
          val moviLen = 4 + nFrames * (8 + frameBytes)
          val riffLen = 4 + (8 + hdrlLen) + (8 + junkLen) + (8 + moviLen)
          val out = java.nio.ByteBuffer.allocate(8 + riffLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          def fourcc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
          fourcc("RIFF"); out.putInt(riffLen); fourcc("AVI ")
          fourcc("LIST"); out.putInt(hdrlLen); fourcc("hdrl")
          fourcc("avih"); out.putInt(56)
          out.putInt(usPerFrame); out.putInt(0); out.putInt(0); out.putInt(0)
          out.putInt(nFrames); out.putInt(0); out.putInt(1); out.putInt(frameBytes)
          out.putInt(width); out.putInt(height)
          out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
          fourcc("LIST"); out.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
          fourcc("strh"); out.putInt(56)
          fourcc("vids"); fourcc("DIB ")
          out.putInt(0); out.putInt(0); out.putInt(0)              // flags, prio+lang, initial
          out.putInt(usPerFrame); out.putInt(1000000)              // scale, rate
          out.putInt(0); out.putInt(nFrames)                       // start, length
          out.putInt(frameBytes); out.putInt(0); out.putInt(0)     // bufsize, quality, samplesize
          out.putInt(0); out.putInt(0)                             // rcFrame
          fourcc("strf"); out.putInt(40)
          out.putInt(40); out.putInt(width); out.putInt(height)
          out.putShort(1); out.putShort(24)                        // planes, bpp
          out.putInt(0); out.putInt(frameBytes)                    // BI_RGB, image size
          out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
          fourcc("JUNK"); out.putInt(junkLen); out.put(junk)
          if ((junk.length & 1) == 1) out.put(0.toByte)
          fourcc("LIST"); out.putInt(moviLen); fourcc("movi")
          var f = 0
          while (f < nFrames) {
            fourcc("00db"); out.putInt(frameBytes)
            val lo = f * frameBytes
            val hi = math.min(data0.length, lo + frameBytes)
            if (hi > lo) out.put(data0, lo, hi - lo)
            var pad = frameBytes - math.max(0, hi - lo)
            while (pad > 0) { out.put(0.toByte); pad -= 1 }
            f += 1
          }
          (id, out.array())
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Decoded stats of one AVI with every `frameStride`-th frame sampled:
    * exact integer aggregates over the sampled frames' bytes — no float
    * op anywhere. `dur_micros = n_frames * us_per_frame`. `valid = false`
    * rows carry zeros.
    */
  final case class AviStats(
      doc_id: Long,
      valid: Boolean,
      width: Long,
      height: Long,
      us_per_frame: Long,
      n_frames: Long,
      dur_micros: Long,
      n_sampled: Long,
      sum_byte: Long,
      peak_byte: Long,
      sum_sq: Long)

  /** REAL video-container decode for one public format: uncompressed AVI
    * (RIFF `AVI ` form, `vids` stream, 24-bit `BI_RGB` DIB frames in
    * `00db`/`00dc` chunks). A full walker — RIFF size + form check, LIST
    * recursion into `hdrl` (for `avih` dimensions/timing and the `strf`
    * BITMAPINFOHEADER, which must declare 24 bpp uncompressed or the row
    * is flagged invalid, never misread) and `movi` (frame chunks counted
    * and every `frameStride`-th one aggregated), unknown chunks (`JUNK`,
    * `idx1`) skipped by size with RIFF odd-length padding honored.
    *
    * Frame SAMPLING at decode is the production video-pipeline shape:
    * at stride k only 1/k of the frame bytes are touched, and payloads
    * never leave the scan stage (same batch-shaped `mapPartitions` kernel
    * as the other codecs).
    */
  def decodeAvi(
      media: DataFrame,
      frameStride: Int = 2,
      batchSize: Int = 64): Dataset[AviStats] = {
    require(frameStride >= 1, "frameStride must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[AviStats] = Encoders.product[AviStats]
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            parseAvi(if (bytes == null) Array.emptyByteArray else bytes) match {
              case Some((w, h, usf, frames)) =>
                var sum = 0L; var peak = 0L; var sumSq = 0L; var sampled = 0L
                var f = 0
                while (f < frames.length) {
                  if (f % frameStride == 0) {
                    sampled += 1
                    val fr = frames(f)
                    var i = 0
                    while (i < fr.length) {
                      val b = (fr(i) & 0xFF).toLong
                      sum += b; sumSq += b * b
                      if (b > peak) peak = b
                      i += 1
                    }
                  }
                  f += 1
                }
                AviStats(id, valid = true, w, h, usf, frames.length,
                  frames.length.toLong * usf, sampled, sum, peak, sumSq)
              case None =>
                AviStats(id, valid = false, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
            }
          }
        }
      }
  }

  /** The AVI container parser: returns (width, height, us_per_frame,
    * frames) or None. Requires a 24-bpp uncompressed (`BI_RGB`) `strf` if
    * one is present; frame chunks truncated short of their declared size
    * are invalid; trailing bytes after the RIFF payload are tolerated.
    */
  private[graft] def parseAvi(
      bytes: Array[Byte]): Option[(Int, Int, Int, Array[Array[Byte]])] = {
    def u16(p: Int): Int = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
    def u32(p: Int): Long =
      (bytes(p) & 0xFFL) | ((bytes(p + 1) & 0xFFL) << 8) |
        ((bytes(p + 2) & 0xFFL) << 16) | ((bytes(p + 3) & 0xFFL) << 24)
    def tag(p: Int): String =
      new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(4))
    var width = 0; var height = 0; var usPerFrame = 0
    var sawAvih = false; var badStrf = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // walk one chunk run [pos, end); LISTs recurse with their form tag
    def walk(start: Long, end: Long, form: String): Boolean = {
      var pos = start
      while (pos + 8 <= end) {
        val id = tag(pos.toInt)
        val size = u32(pos.toInt + 4)
        val body = pos + 8
        if (body + size > bytes.length) return false // truncated chunk
        id match {
          case "LIST" =>
            if (size < 4) return false
            if (!walk(body + 4, body + size, tag(body.toInt))) return false
          case "avih" if size >= 40 =>
            usPerFrame = u32(body.toInt).toInt
            width = u32(body.toInt + 32).toInt
            height = u32(body.toInt + 36).toInt
            sawAvih = true
          case "strf" if form == "strl" && size >= 40 =>
            // BITMAPINFOHEADER: 24 bpp, BI_RGB only
            if (u16(body.toInt + 14) != 24 || u32(body.toInt + 16) != 0L)
              badStrf = true
          case "00db" | "00dc" if form == "movi" =>
            frames += java.util.Arrays.copyOfRange(
              bytes, body.toInt, (body + size).toInt)
          case _ => () // JUNK, idx1, strh, unknown: skip
        }
        pos = body + size + (size & 1) // RIFF chunks pad to even
      }
      true
    }
    if (!walk(12L, riffEnd, "AVI ")) return None
    if (!sawAvih || badStrf || width < 1 || height < 1 || usPerFrame < 1) None
    else Some((width, height, usPerFrame, frames.toArray))
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
