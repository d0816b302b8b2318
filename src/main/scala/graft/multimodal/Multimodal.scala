package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline: media
  * (image/audio/video) travels as an opaque `binary` payload column with
  * typed metadata, and per-batch feature extraction runs as a
  * `mapPartitions` pass (the Scala analog of `mapInPandas` batch UDFs).
  *
  * IMAGE decode is REAL: `image/`-kinded payloads go through the JDK's
  * `javax.imageio` (PNG/JPEG/GIF/BMP — no external dependency) and
  * featurize as a 16-bin pixel-luminance histogram
  * ([[Multimodal.decodeImage]]). Non-image kinds (audio/video codecs are
  * genuinely absent from the JDK) fall back to [[Multimodal.stubDecode]],
  * a deterministic byte histogram standing in for decode+featurize, as
  * does any payload ImageIO cannot parse. Everything around the codec is
  * real and tested: the schema contract, the binary payload round-trip,
  * partition-batched execution, and the feature vector shape a
  * downstream embedding/ANN stage consumes.
  */
object Multimodal {

  // ImageIO's default ImageInputStream/ImageOutputStream cache is a TEMP
  // FILE per read/write — for thousands of small in-memory payloads per
  // partition that is one create+delete syscall pair per image and
  // dominates decode cost. Payloads here are always in-memory byte
  // arrays, so the memory-backed cache is strictly better. Object-init
  // runs once per JVM, including on executors (the mapPartitions lambdas
  // reference this object).
  javax.imageio.ImageIO.setUseCache(false)

  val featureDim = 16

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("n_bytes", IntegerType, nullable = false)))

  /** Wrap a text corpus as opaque binary media rows (fixture stand-in for
    * real image/audio payload ingestion). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("media_id"),
      lit("text/plain").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      length(encode(col("text"), "UTF-8")).cast("int").as("n_bytes"))

  /** STUB decoder: a real deployment would decode the payload (JPEG
    * decode, audio resample, video frame-sample) and run a feature
    * extractor here. The deterministic fake is a 16-bin byte histogram
    * normalized to L1=1, which exercises the identical Spark plumbing
    * (binary in, fixed-width Array[Float] out, batch-per-partition). */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](featureDim)
    if (payload == null || payload.isEmpty) return hist
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) / featureDim) += 1f
      i += 1
    }
    var j = 0
    while (j < featureDim) { hist(j) /= payload.length; j += 1 }
    hist
  }

  /** Video-style frame sampling as plan-level plumbing: the payload is
    * split into fixed-size frames and every `stride`-th frame survives —
    * all with codegen'd expressions (sequence + substring on binary), no
    * UDF, so a 100 TB video table frame-samples inside the scan stage.
    * A real deployment would swap the byte-slice "frame" for a container
    *-aware keyframe index; the plan shape (explode of a per-row frame
    * list, then slice) is exactly what that version uses too. */
  def frameSample(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val nFrames = ceil(col("n_bytes").cast("double") / frameSize).cast("int")
    media
      .filter(col("n_bytes") > 0)
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), nFrames - 1),
          i => i % stride === 0)))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameSize + 1, $frameSize)")
          .as("frame"))
  }

  /** STUB resize: keeps every `factor`-th byte — the stand-in for an
    * image/audio down-scale. Same contract as a real resizer: smaller
    * payload, metadata updated, kind preserved. */
  def stubResize(payload: Array[Byte], factor: Int): Array[Byte] = {
    if (payload == null) return null
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Resize pass over media rows (payload shrunk by `factor`). */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    val rz = udf((p: Array[Byte]) => stubResize(p, factor))
    media
      .withColumn("payload", rz(col("payload")))
      .withColumn("n_bytes", coalesce(length(col("payload")), lit(0)).cast("int"))
  }

  /** Raw (un-normalized) byte histogram — integer counts. The clustering
    * path uses these instead of the L1-normalized float features because
    * cosine similarity is scale-invariant: integer counts make the
    * eps-threshold test exact (dot² ≥ (1-eps)²·|a|²·|b|² over integers)
    * and therefore bit-identical between engines, where a float-normalized
    * histogram would put near-threshold pairs on different sides. */
  def stubHistogram(payload: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](featureDim)
    if (payload == null) return hist
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) / featureDim) += 1L
      i += 1
    }
    hist
  }

  /** Batched integer-histogram extraction (same mapPartitions batch shape
    * as [[extractFeatures]]), emitting `(media_id, hist)`. */
  def extractHistograms(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getAs[Long]("media_id"),
          stubHistogram(r.getAs[Array[Byte]]("payload")).toSeq)
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // Real image codec — JDK javax.imageio, no external dependency.
  // ------------------------------------------------------------------

  /** Decoded-image features: dimensions plus a 16-bin luminance
    * histogram, `lum = (r + g + b) / 3` (integer division), `bin =
    * lum / 16`. Integer-exact, so it is bit-identical across engines. */
  final case class ImageFeatures(width: Int, height: Int, lumHist: Array[Long])

  /** REAL decode: parse the payload with `javax.imageio.ImageIO` (PNG,
    * JPEG, GIF, BMP — whatever the JDK registry supports) and compute the
    * luminance histogram over the decoded pixels. `None` when the payload
    * is empty, not a supported container, or corrupt — callers fall back
    * to the stub byte histogram so a mixed-media table never fails. */
  def decodeImage(payload: Array[Byte]): Option[ImageFeatures] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val hist = new Array[Long](featureDim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        hist(lum / featureDim) += 1L
        x += 1
      }
      y += 1
    }
    Some(ImageFeatures(img.getWidth, img.getHeight, hist))
  }

  /** Deterministic tiny RGB image for seed `k`, PNG-encoded:
    * `w = 4 + k % 5`, `h = 4 + k % 3`, and per pixel
    * `r = (k*31 + x*7 + y*13) % 256`, `g = (k*17 + x*11 + y*5) % 256`,
    * `b = (k*29 + x*3 + y*19) % 256`. PNG is lossless, so decoded pixel
    * statistics are recomputable from `k` alone — which is exactly what
    * the `pipe_multimodal_media` SQL oracle does, making the
    * encode→decode round-trip value-verifiable end-to-end. */
  def mintPng(k: Long): Array[Byte] = {
    val w = (4 + java.lang.Math.floorMod(k, 5L)).toInt
    val h = (4 + java.lang.Math.floorMod(k, 3L)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = java.lang.Math.floorMod(k * 31 + x * 7 + y * 13, 256L).toInt
        val g = java.lang.Math.floorMod(k * 17 + x * 11 + y * 5, 256L).toInt
        val b = java.lang.Math.floorMod(k * 29 + x * 3 + y * 19, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Textured variant of [[mintPng]] for the perceptual-hash fixture:
    * dims `w = 9 + k % 5`, `h = 8 + k % 3` (at least the 9x8 dHash grid,
    * so every grid cell samples a distinct pixel), per pixel
    * `r = (k*31 + x*7  + y*13 + (k%7 +1)·x²) % 256`  (+bump, then %256)
    * `g = (k*17 + x*11 + y*5  + (k%11+1)·x·y) % 256`
    * `b = (k*29 + x*3  + y*19 + (k%13+1)·y²) % 256`.
    * The quadratic cross-terms give every seed its own gradient-sign
    * pattern, so dHashes are diverse (the purely linear [[mintPng]]
    * formula makes thousands of images share a hash — LSH buckets
    * saturate and planted pairs fall past the probe cap). Still a
    * closed form over (k, x, y): the SQL oracle replays it exactly. */
  def mintPngTextured(k: Long, bump: Int): Array[Byte] = {
    val w = (9 + java.lang.Math.floorMod(k, 5L)).toInt
    val h = (8 + java.lang.Math.floorMod(k, 3L)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((java.lang.Math.floorMod(
          k * 31 + x * 7 + y * 13 + (java.lang.Math.floorMod(k, 7L) + 1) * x * x,
          256L) + bump) % 256).toInt
        val g = java.lang.Math.floorMod(
          k * 17 + x * 11 + y * 5 + (java.lang.Math.floorMod(k, 11L) + 1) * x * y,
          256L).toInt
        val b = java.lang.Math.floorMod(
          k * 29 + x * 3 + y * 19 + (java.lang.Math.floorMod(k, 13L) + 1) * y * y,
          256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Streaming-safe perceptual hashing: like [[imageDHash]] but carries
    * the arrival timestamp through and packs the four bands into ONE
    * 64-bit hash column — the shape a watermarked streaming dedup keys
    * its state on. Stateless mapPartitions, so it composes with
    * Structured Streaming directly. Input needs (media_id, payload,
    * arrival). */
  def imageDHashStamped(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("arrival", TimestampType, nullable = false),
      StructField("h", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        dHashBands(r.getAs[Array[Byte]]("payload")).map { b =>
          val h = (b(0).toLong & 0xffffL) | ((b(1).toLong & 0xffffL) << 16) |
            ((b(2).toLong & 0xffffL) << 32) | ((b(3).toLong & 0xffffL) << 48)
          Row(r.getAs[Long]("media_id"),
            r.getAs[java.sql.Timestamp]("arrival"), h)
        }
      }
    }(enc)
  }

  /** Textured image-media fixture rows for the perceptual-hash stage:
    * one [[mintPngTextured]] PNG per id (`bump = 0`), minted
    * executor-side like [[asImageMedia]]. */
  def asImageMediaTextured(docs: DataFrame): DataFrame = {
    val mint = udf((id: Long) => mintPngTextured(id, 0))
    docs.select(col("doc_id").cast("long").as("media_id"),
        lit("image/png").as("kind"),
        mint(col("doc_id").cast("long")).as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("int"))
  }

  /** Planted near-dup rows: `media_id = doc_id + 100000`, payload minted
    * from the ORIGINAL seed with the red channel bumped one level. */
  def asImageMediaTexturedBumped(docs: DataFrame): DataFrame = {
    val mint = udf((id: Long) => mintPngTextured(id, 1))
    docs.select((col("doc_id").cast("long") + 100000L).as("media_id"),
        lit("image/png").as("kind"),
        mint(col("doc_id").cast("long")).as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("int"))
  }

  /** 64-bit dHash (difference hash — the standard perceptual-hash
    * family: aHash/dHash/pHash; dHash is the gradient variant) over the
    * DECODED pixel grid, returned as four 16-bit bands for Hamming-ball
    * LSH bucketing.
    *
    * Nearest-neighbor sample the decoded W×H image on a 9×8 grid
    * (`sx = x·W/9`, `sy = y·H/8`, integer division), take integer
    * luminance `(r+g+b)/3`, and set bit `(y%2)·8 + x` of band `y/2`
    * when `lum(x+1,y) > lum(x,y)` — 64 adjacent-gradient bits total.
    * Every step is integer-exact, so the SQL oracle recomputes the hash
    * from the mint seed alone. `None` for undecodable payloads. */
  def dHashBands(payload: Array[Byte]): Option[Array[Int]] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val lum = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val rgb = img.getRGB(x * w / 9, y * h / 8)
        lum(y)(x) =
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    val bands = new Array[Int](4)
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(y)(x + 1) > lum(y)(x)) bands(y / 2) |= 1 << ((y % 2) * 8 + x)
        x += 1
      }
      y += 1
    }
    Some(bands)
  }

  /** Batched perceptual-hash extraction (same mapPartitions batch shape
    * as [[decodeMedia]]): real ImageIO decode → dHash bands, emitting
    * `(media_id, b0, b1, b2, b3)`. Undecodable payloads are dropped —
    * a near-dup stage has nothing to say about them. */
  def imageDHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("b0", IntegerType, nullable = false),
      StructField("b1", IntegerType, nullable = false),
      StructField("b2", IntegerType, nullable = false),
      StructField("b3", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        dHashBands(r.getAs[Array[Byte]]("payload")).map { b =>
          Row(r.getAs[Long]("media_id"), b(0), b(1), b(2), b(3))
        }
      }
    }(enc)
  }


  /** Image-media fixture rows: one minted PNG per document id. Minting
    * runs executor-side in the scan stage (a UDF over the id), so the
    * fixture is as distributed as a real payload column would be. */
  def asImageMedia(docs: DataFrame): DataFrame = {
    val mint = udf((id: Long) => mintPng(id))
    docs.select(col("doc_id").cast("long").as("media_id"),
        lit("image/png").as("kind"),
        mint(col("doc_id").cast("long")).as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("int"))
  }

  /** Batched decode over a mixed-media frame: `image/`-kinded payloads take the
    * REAL ImageIO path (width/height/luminance histogram); anything else
    * — or an unparseable image — falls back to the stub byte histogram
    * with `width = height = -1`. `feature` is the L1-normalized
    * histogram either way, the shape a downstream ANN stage consumes. */
  def decodeMedia(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("hist", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      // Per-partition setup would initialize a shared codec/model here.
      rows.map { r =>
        val kind = r.getAs[String]("kind")
        val payload = r.getAs[Array[Byte]]("payload")
        val decoded =
          if (kind != null && kind.startsWith("image/")) decodeImage(payload)
          else None
        val (w, h, hist) = decoded match {
          case Some(f) => (f.width, f.height, f.lumHist)
          case None    => (-1, -1, stubHistogram(payload))
        }
        val total = hist.sum
        val feature = new Array[Float](featureDim)
        if (total > 0) {
          var i = 0
          while (i < featureDim) {
            feature(i) = hist(i).toFloat / total; i += 1
          }
        }
        Row(r.getAs[Long]("media_id"), kind, w, h, hist.toSeq, feature.toSeq)
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // Real audio codec — JDK javax.sound.sampled (WAV/PCM), no external
  // dependency. Mirrors the ImageIO design: deterministic minted
  // payloads, real container decode, integer-exact features the SQL
  // oracle recomputes from the id alone.
  // ------------------------------------------------------------------

  /** Decoded-audio features: sample count, sample rate, a 16-bin
    * amplitude histogram over the unsigned 16-bit range
    * (`bin = (sample + 32768) / 4096`), and the exact sum of absolute
    * sample values. All integers, so bit-identical across engines. */
  final case class AudioFeatures(nSamples: Int, sampleRate: Int,
      ampHist: Array[Long], sumAbs: Long)

  /** REAL decode: parse the payload with
    * `javax.sound.sampled.AudioSystem` and featurize the PCM samples.
    * Handles 16-bit signed PCM (either endianness, any channel count —
    * channels are interleaved and all counted). `None` when the payload
    * is not a parseable audio container or not 16-bit PCM — callers fall
    * back to the stub byte histogram, as with images. */
  def decodeAudio(payload: Array[Byte]): Option[AudioFeatures] = {
    if (payload == null || payload.isEmpty) return None
    val stream =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (stream == null) return None
    try {
      val fmt = stream.getFormat
      val enc = fmt.getEncoding
      if (fmt.getSampleSizeInBits != 16 ||
        (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED))
        return None
      val bytes = stream.readAllBytes()
      val n = bytes.length / 2
      val hist = new Array[Long](featureDim)
      var sumAbs = 0L
      var i = 0
      while (i < n) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1) & 0xff
        val s =
          if (fmt.isBigEndian) ((lo << 8) | hi).toShort.toInt
          else ((hi << 8) | lo).toShort.toInt
        hist((s + 32768) / 4096) += 1L
        sumAbs += math.abs(s)
        i += 1
      }
      Some(AudioFeatures(n, fmt.getSampleRate.toInt, hist, sumAbs))
    } finally stream.close()
  }

  /** Deterministic 16-bit PCM mono WAV for seed `k`, encoded through the
    * JDK's own WAV writer: `n = 64 + k % 65` samples at 8 kHz, sample
    * `i` = `(k*131 + i*17) % 65536 - 32768`. WAV/PCM is lossless, so the
    * decoded statistics are recomputable from `k` alone — which is what
    * the `pipe_multimodal_audio` SQL oracle does, making the
    * encode→decode round-trip value-verifiable end-to-end. */
  def mintWav(k: Long): Array[Byte] = {
    val n = (64 + java.lang.Math.floorMod(k, 65L)).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (java.lang.Math.floorMod(k * 131 + i * 17, 65536L) - 32768L).toInt
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    // Canonical 44-byte RIFF/WAVE header, hand-rolled like the textured
    // mint: byte-identical to AudioSystem.write's output for PCM16 mono
    // (MultimodalSpec pins the equality per seed), at ~half the per-row
    // cost — AudioSystem.write's provider lookup + stream plumbing was
    // the bulk of the mint. The DECODE side still goes through the real
    // javax.sound codec, which is the parity that matters.
    riffWav(pcm, sampleRate = 8000, channels = 1)
  }

  /** The pre-r14 mint path (JDK WAV writer), kept as the spec's
    * reference face: MultimodalSpec asserts [[mintWav]] ==
    * [[mintWavViaAudioSystem]] byte-for-byte so the hand-rolled header
    * can never drift from the real codec's output. */
  private[graft] def mintWavViaAudioSystem(k: Long): Array[Byte] = {
    val n = (64 + java.lang.Math.floorMod(k, 65L)).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (java.lang.Math.floorMod(k * 131 + i * 17, 65536L) - 32768L).toInt
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Textured variant of [[mintWav]] for the fingerprint fixture:
    * `s_i = ((k·24097 + i·17 + (k%251+3)·i² + bump) % 65536) − 32768`
    * (large odd phase multiplier so neighbor seeds land far apart).
    * The plain mint is an arithmetic (+17 mod 2¹⁶) sequence — every
    * seed is a PHASE SHIFT of the same stream, so acoustic shingles
    * collide corpus-wide (4776 accidental pairs at sf0.01). The
    * per-seed quadratic term gives each stream its own shape. `bump=1`
    * is the planted near-dup: after 8-bit quantization at most 1/256 of
    * samples change bucket, so the variant's fingerprint set overlaps
    * the original's almost completely. Closed form over (k, i) — the
    * SQL oracle replays it exactly. */
  def mintWavTextured(k: Long, bump: Int): Array[Byte] = {
    val n = (64 + java.lang.Math.floorMod(k, 65L)).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (java.lang.Math.floorMod(
        k * 24097 + i * 17 + (java.lang.Math.floorMod(k, 251L) + 3) * i * i + bump,
        65536L) - 32768L).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    // Hand-rolled canonical 44-byte RIFF/WAVE header (PCM16 mono 8 kHz):
    // AudioSystem.write's stream plumbing was ~half the mint cost at 50k
    // payloads; the DECODE side still goes through the real
    // javax.sound codec, which is the parity that matters
    // (AudioFingerprintSpec checks decode == closed form).
    riffWav(pcm, sampleRate = 8000, channels = 1)
  }

  /** Minimal RIFF/WAVE container around raw PCM16 little-endian data. */
  private def riffWav(pcm: Array[Byte], sampleRate: Int,
      channels: Int): Array[Byte] = {
    val out = new Array[Byte](44 + pcm.length)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * 2
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort) // PCM, channels
      .putInt(sampleRate).putInt(byteRate)
      .putShort((channels * 2).toShort).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    out
  }

  /** REAL decode to the raw signed 16-bit sample stream (first channel
    * interleaved order, same parsing/guards as [[decodeAudio]]) — the
    * input a fingerprinting stage needs. `None` for non-PCM16/unparseable
    * payloads. */
  def decodeAudioSamples(payload: Array[Byte]): Option[Array[Int]] = {
    if (payload == null || payload.isEmpty) return None
    val stream =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (stream == null) return None
    try {
      val fmt = stream.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return None
      val bytes = stream.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1) & 0xff
        out(i) =
          if (fmt.isBigEndian) ((lo << 8) | hi).toShort.toInt
          else ((hi << 8) | lo).toShort.toInt
        i += 1
      }
      Some(out)
    } finally stream.close()
  }

  /** Batched sample extraction (mapPartitions, same batch shape as the
    * other decoders): `(media_id, smp array<int>)`; undecodable payloads
    * dropped. Downstream fingerprinting stays EXPRESSION work over the
    * bounded sample array — the decode is the only imperative step. */
  def audioSampleFrame(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("smp", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudioSamples(r.getAs[Array[Byte]]("payload")).map { s =>
          Row(r.getAs[Long]("media_id"), s.toSeq)
        }
      }
    }(enc)
  }

  /** Textured audio fixture rows (`bump = 0`), executor-side mint. */
  def asAudioMediaTextured(docs: DataFrame): DataFrame = {
    val mint = udf((id: Long) => mintWavTextured(id, 0))
    docs.select(col("doc_id").cast("long").as("media_id"),
        lit("audio/wav").as("kind"),
        mint(col("doc_id").cast("long")).as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("int"))
  }

  /** Planted audio near-dup rows: `media_id = doc_id + 100000`, payload
    * minted from the ORIGINAL seed with `bump = 1`. */
  def asAudioMediaTexturedBumped(docs: DataFrame): DataFrame = {
    val mint = udf((id: Long) => mintWavTextured(id, 1))
    docs.select((col("doc_id").cast("long") + 100000L).as("media_id"),
        lit("audio/wav").as("kind"),
        mint(col("doc_id").cast("long")).as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("int"))
  }

  /** Audio-media fixture rows: one minted WAV per document id,
    * executor-side like [[asImageMedia]]. */
  def asAudioMedia(docs: DataFrame): DataFrame = {
    val mint = udf((id: Long) => mintWav(id))
    docs.select(col("doc_id").cast("long").as("media_id"),
        lit("audio/wav").as("kind"),
        mint(col("doc_id").cast("long")).as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("int"))
  }

  /** Batched audio decode (same mapPartitions batch shape as
    * [[decodeMedia]]): `audio/`-kinded payloads take the REAL
    * javax.sound.sampled path; anything else — or an unparseable
    * payload — falls back to the stub byte histogram with
    * `n_samples = sample_rate = -1` and `sum_abs = -1`. */
  def decodeAudioMedia(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("amp_hist", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("sum_abs", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val kind = r.getAs[String]("kind")
        val payload = r.getAs[Array[Byte]]("payload")
        val decoded =
          if (kind != null && kind.startsWith("audio/")) decodeAudio(payload)
          else None
        decoded match {
          case Some(f) =>
            Row(r.getAs[Long]("media_id"), kind, f.nSamples, f.sampleRate,
              f.ampHist.toSeq, f.sumAbs)
          case None =>
            Row(r.getAs[Long]("media_id"), kind, -1, -1,
              stubHistogram(payload).toSeq, -1L)
        }
      }
    }(enc)
  }

  /** Batched feature extraction over media rows: one decoder pass per
    * partition (amortizes per-batch model/codec setup, the reason
    * mapInPandas exists), emitting `(media_id, kind, n_bytes, feature)`. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      // Per-partition setup would initialize the codec/model once here.
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
          r.getAs[Int]("n_bytes"), stubDecode(payload).toSeq)
      }
    }(enc)
  }
}
