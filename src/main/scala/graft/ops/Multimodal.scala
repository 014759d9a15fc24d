package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/
  * audio/video payloads ride as opaque `binary` columns with typed
  * metadata; decode / feature-extraction / frame-sampling run as
  * partition-local batch transforms.
  *
  * The Spark-side plumbing here (schema, partitioning, batched
  * `mapPartitions` signature, row explosion for frames) is real and
  * tested — and all three modalities now decode REAL containers with
  * JDK-built-in codecs, each verified exactly against an independent
  * algebraic restatement:
  *  - IMAGE: `javax.imageio` PNG ([[imageFeatures]], pixel-exact via
  *    `check_image_decode`);
  *  - AUDIO: `javax.sound.sampled` WAV/AIFF ([[audioWindowSums]]/
  *    [[audioFeatures]], sample-exact via the `audio_windows` DuckDB
  *    oracle + `check_audio_decode`);
  *  - VIDEO: `javax.imageio`'s multi-frame GIF reader
  *    ([[videoFrameSums]]/[[videoFrameFeatures]], pixel-exact via the
  *    `video_frames` DuckDB oracle — grayscale frames fit GIF's
  *    palette, so the container roundtrip is lossless).
  * A production pipeline would swap these codecs for JNI/ffmpeg ones
  * without touching any dataflow; `fakeDecode` remains only as the
  * generic stand-in for payloads with NO registered codec (the
  * `media_features` path). (Python twin would be `mapInPandas`; in
  * Scala the idiomatic equivalent is typed `mapPartitions`, which
  * batches per partition and keeps the decoder's state/model loaded
  * per-partition, not per-row.)
  */
object Multimodal {

  case class MediaFeature(media_id: Long, dim: Int, feature: Array[Float])
  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Wrap a text corpus as a media table (payload = utf-8 bytes) —
    * the stand-in source for binary columns in this container. */
  def packMedia(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      lit("application/octet-stream").as("mime"),
      length(col(textCol)).cast("long").as("n_bytes"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Generic no-codec stand-in (every real modality decodes via
    * [[imageFeatures]]/[[audioWindowSums]]/[[videoFrameSums]]; this
    * remains for opaque payloads with no registered reader).
    * Deterministic: rolling 64-bit hash of the bytes expanded into
    * `dim` floats in [-1, 1). Keeps the contract (bytes => fixed-dim
    * float vector) honest. */
  private[ops] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L // prime seed
    payload.foreach { b => h = h * 31 + (b & 0xFF) }
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L // LCG step
      out(i) = ((h >>> 24) & 0xFFFFFF).toFloat / (1 << 24).toFloat * 2f - 1f
      i += 1
    }
    out
  }

  /** Feature extraction: one decoder instance per partition (the
    * expensive model-load happens in the mapPartitions closure once,
    * not per row), batch shape = the partition iterator. */
  def extractFeatures(media: DataFrame, dim: Int): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // <- real decoder/model initialization would go here, once
        it.map { case (id, bytes) => MediaFeature(id, dim, fakeDecode(bytes, dim)) }
      }
  }

  /** Frame sampling: split the payload into `n` evenly-spaced byte
    * windows ("frames"); a real video path would seek keyframes. One
    * input row → n output rows (explode on the executor, no driver). */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 16): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes.isEmpty) Iterator.empty
        else (0 until n).iterator.map { f =>
          val start = math.min((bytes.length.toLong * f / n).toInt, math.max(0, bytes.length - 1))
          Frame(id, f, bytes.slice(start, math.min(start + frameBytes, bytes.length)))
        }
      }
  }

  /** Metadata + per-frame stats table: media_id, frame_no, n_bytes,
    * checksum — the relational face of the binary pipeline. */
  def frameStats(frames: Dataset[Frame]): DataFrame =
    frames.toDF()
      .select(col("media_id"), col("frame_no"),
        length(col("frame_bytes")).as("n_bytes"),
        crc32(col("frame_bytes")).as("checksum"))

  // ---- real image path (JDK-builtin javax.imageio — no codecs
  // needed beyond the JDK's PNG/BMP/JPEG readers) ----------------

  case class ImageFeature(media_id: Long, width: Int, height: Int,
                          feature: Array[Float])

  /** Deterministic synthetic pixel: channel `c` of pixel (x, y) in
    * image `id` is `(31·id + 7·x + 13·y + 17·c) mod 256`. The same
    * formula is restated INDEPENDENTLY in SQL by `check_image_decode`
    * so encode→decode→pool is verified against pure column algebra. */
  private[graft] def synthPixel(id: Long, x: Int, y: Int, c: Int): Int =
    ((31L * id + 7L * x + 13L * y + 17L * c) % 256L).toInt

  /** Synthesize a deterministic PNG corpus from an id column — the
    * binary-image stand-in for this container (PNG is lossless, so
    * decoded pixels are exactly the synth formula). Encoding happens
    * on the executors (typed mapPartitions), never on the driver. */
  def packSynthImages(ids: DataFrame, idCol: String = "doc_id",
                      w: Int = 16, h: Int = 16): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                (synthPixel(id, x, y, 0) << 16) |
                  (synthPixel(id, x, y, 1) << 8) |
                  synthPixel(id, x, y, 2))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val bytes = bos.toByteArray
          (id, "image/png", bytes.length.toLong, bytes)
        }
      }.toDF("media_id", "mime", "n_bytes", "payload")
  }

  // ---- real video path (JDK-builtin javax.imageio GIF reader —
  // multi-frame container, LZW-compressed; grayscale frames fit the
  // 256-entry palette, so the roundtrip is pixel-exact) -------------

  case class VideoFrame(media_id: Long, frame_no: Int, n_frames: Int,
                        width: Int, height: Int, sum_gray: Long)
  case class VideoFeature(media_id: Long, frame_no: Int,
                          width: Int, height: Int, feature: Array[Float])

  /** Deterministic synthetic gray level: pixel (x, y) of frame `f` in
    * video `id` is `(31·id + 29·f + 7·x + 13·y) mod 256`. Restated
    * INDEPENDENTLY in SQL by the `video_frames` DuckDB oracle, so GIF
    * encode → container parse → frame decode is verified end to end
    * with no tolerance. */
  private[graft] def synthFramePixel(id: Long, f: Int, x: Int, y: Int): Int =
    ((31L * id + 29L * f + 7L * x + 13L * y) % 256L).toInt

  /** Synthesize a deterministic multi-frame GIF corpus from an id
    * column — the binary-video stand-in for this container. Grayscale
    * keeps every frame inside GIF's 256-color palette, so the encode
    * is lossless; encoding runs on the executors. */
  def packSynthGifs(ids: DataFrame, idCol: String = "doc_id",
                    w: Int = 16, h: Int = 16, nFrames: Int = 4): DataFrame = {
    require(w > 0 && h > 0 && nFrames > 0, "w/h/nFrames must be positive")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // One writer per partition (encoder-handle-once, like the WAV
        // format object) — the IIORegistry lookup is not per-row work.
        val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        it.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          wr.reset()
          wr.setOutput(ios)
          wr.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.getRaster.setSample(x, y, 0, synthFramePixel(id, f, x, y))
                x += 1
              }
              y += 1
            }
            wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          wr.endWriteSequence()
          ios.close()
          val bytes = bos.toByteArray
          (id, "image/gif", bytes.length.toLong, bytes)
        }
      }.toDF("media_id", "mime", "n_bytes", "payload")
  }

  /** Parse a GIF container and eagerly decode every frame. Shared by
    * both video faces. The WHOLE parse — container scan and per-frame
    * LZW decode — is inside the catch, so a payload that is corrupt
    * anywhere (bad header or bit-rotted frame data) fails loudly with
    * the media_id; and the image input stream is always closed (an
    * unclosed FileCache stream would hold a file descriptor and a
    * disk-cache temp file per payload — at corpus scale that is an
    * FD-exhaustion bug, so we use a memory-cache stream and close it). */
  private def decodeGifFrames(rd: javax.imageio.ImageReader, id: Long,
                              bytes: Array[Byte])
      : IndexedSeq[java.awt.image.BufferedImage] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      rd.setInput(iis)
      val n = rd.getNumImages(true)
      (0 until n).map(rd.read)
    } catch {
      case e: Exception =>
        sys.error(s"video decode: unparseable payload for media_id=$id " +
          s"(${bytes.length} bytes): ${e.getMessage}")
    } finally iis.close()
  }

  /** REAL video decode, frame face: parse the GIF container, decode
    * every frame, and emit one row per frame with its gray-value sum —
    * exact integers, so the `video_frames` DuckDB oracle recomputes
    * them from the synth formula alone (it never sees a GIF byte).
    * One reader instance per partition (the decoder-load-once
    * contract); an unparseable payload fails loudly with the
    * media_id. */
  def videoFrameSums(media: DataFrame): Dataset[VideoFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        it.flatMap { case (id, bytes) =>
          val frames = decodeGifFrames(rd, id, bytes)
          val n = frames.length
          frames.zipWithIndex.map { case (img, f) =>
            val w = img.getWidth; val h = img.getHeight
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                sum += (img.getRGB(x, y) & 0xFF)
                x += 1
              }
              y += 1
            }
            VideoFrame(id, f, n, w, h, sum)
          }
        }
      }
  }

  /** Video feature face: per-frame `grid × grid` block-mean gray
    * vector (dim = grid², values in [0, 1]) — [[imageFeatures]]'s
    * pooling applied per container frame. */
  def videoFrameFeatures(media: DataFrame, grid: Int): Dataset[VideoFeature] = {
    require(grid > 0, "grid must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        it.flatMap { case (id, bytes) =>
          val frames = decodeGifFrames(rd, id, bytes)
          frames.zipWithIndex.map { case (img, f) =>
            val w = img.getWidth; val h = img.getHeight
            val sums = new Array[Long](grid * grid)
            val cnts = new Array[Long](grid * grid)
            var y = 0
            while (y < h) {
              val by = y * grid / h
              var x = 0
              while (x < w) {
                val blk = by * grid + x * grid / w
                sums(blk) += (img.getRGB(x, y) & 0xFF)
                cnts(blk) += 1
                x += 1
              }
              y += 1
            }
            val feat = Array.tabulate(grid * grid) { i =>
              if (cnts(i) == 0) 0f else sums(i).toFloat / (cnts(i) * 255f)
            }
            VideoFeature(id, f, w, h, feat)
          }
        }
      }
  }

  // ---- real audio path (JDK-builtin javax.sound.sampled — WAV/AIFF
  // PCM read+write is pure Java, no codec or audio device needed) ---

  case class AudioWindow(media_id: Long, sample_rate: Int, n_samples: Long,
                         win: Int, win_n: Long, sum_abs: Long)
  case class AudioFeature(media_id: Long, sample_rate: Int, n_samples: Long,
                          feature: Array[Float])

  /** Deterministic synthetic 16-bit PCM sample: sample `t` of media
    * `id` is `((31·id + 7·t) mod 65536) − 32768`. The same integer
    * algebra is restated INDEPENDENTLY in SQL by `check_audio_decode`
    * and the `audio_windows` DuckDB oracle, so WAV encode → container
    * decode → window pooling is verified end to end without any float
    * tolerance. */
  private[graft] def synthSample(id: Long, t: Int): Int =
    (((31L * id + 7L * t) % 65536L) - 32768L).toInt

  /** Synthesize a deterministic WAV corpus from an id column — the
    * binary-audio stand-in for this container (PCM is lossless, so
    * decoded samples are exactly the synth formula). Encoding happens
    * on the executors (typed mapPartitions), never on the driver. */
  def packSynthWavs(ids: DataFrame, idCol: String = "doc_id",
                    nSamples: Int = 2048, sampleRate: Int = 8000): DataFrame = {
    require(nSamples > 0 && sampleRate > 0, "nSamples/sampleRate must be positive")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // one format object per partition, like a real encoder handle
        val fmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
        it.map { id =>
          val pcm = new Array[Byte](nSamples * 2)
          var t = 0
          while (t < nSamples) {
            val s = synthSample(id, t)
            pcm(2 * t) = (s & 0xFF).toByte
            pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
            t += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          val bytes = bos.toByteArray
          (id, "audio/wav", bytes.length.toLong, bytes)
        }
      }.toDF("media_id", "mime", "n_bytes", "payload")
  }

  /** Parse an audio container (WAV/AIFF/AU — whatever the JDK's
    * readers accept) to 16-bit mono PCM samples. Both endiannesses
    * are handled; anything that isn't 16-bit mono PCM — or doesn't
    * parse at all — fails loudly with the offending media_id, for the
    * same reason [[imageFeatures]] does: a silent drop would skew
    * every downstream stage. */
  private def decodePcm16Mono(id: Long, bytes: Array[Byte]): (Int, Array[Short]) = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: Exception =>
          sys.error(s"audio decode: unparseable payload for media_id=$id " +
            s"(${bytes.length} bytes): ${e.getMessage}")
      }
    val fmt = ais.getFormat
    if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
      sys.error(s"audio decode: media_id=$id is not 16-bit mono PCM (got $fmt)")
    val raw = ais.readAllBytes()
    val n = raw.length / 2
    val out = new Array[Short](n)
    var i = 0
    if (fmt.isBigEndian)
      while (i < n) {
        out(i) = (((raw(2 * i) & 0xFF) << 8) | (raw(2 * i + 1) & 0xFF)).toShort
        i += 1
      }
    else
      while (i < n) {
        out(i) = (((raw(2 * i + 1) & 0xFF) << 8) | (raw(2 * i) & 0xFF)).toShort
        i += 1
      }
    (math.round(fmt.getSampleRate), out)
  }

  private def windowSums(samples: Array[Short], nWindows: Int): (Array[Long], Array[Long]) = {
    val sums = new Array[Long](nWindows)
    val cnts = new Array[Long](nWindows)
    val n = samples.length
    var t = 0
    while (t < n) {
      val w = (t.toLong * nWindows / n).toInt
      sums(w) += math.abs(samples(t).toLong)
      cnts(w) += 1
      t += 1
    }
    (sums, cnts)
  }

  /** REAL audio decode + window pooling: the JDK parses the container
    * per partition and the PCM samples pool into `nWindows` contiguous
    * windows of |amplitude| sums (sample `t` of `n` → window
    * `t·nWindows/n`). Sums are exact integers — the DuckDB oracle for
    * `audio_windows` and the `check_audio_decode` twin compare them
    * with no float tolerance, which is the whole point of this face:
    * it PINS the decoded samples, not a lossy summary of them. */
  def audioWindowSums(media: DataFrame, nWindows: Int): Dataset[AudioWindow] = {
    require(nWindows > 0, "nWindows must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val (rate, samples) = decodePcm16Mono(id, bytes)
          val (sums, cnts) = windowSums(samples, nWindows)
          (0 until nWindows).iterator.map(w =>
            AudioWindow(id, rate, samples.length.toLong, w, cnts(w), sums(w)))
        }
      }
  }

  /** Audio feature vector: per-window mean |amplitude| normalized to
    * [0, 1) — `sum_abs / (win_n · 32768)` computed in double then
    * narrowed to float, so `check_audio_decode` can restate each
    * entry exactly from the integer window sums. */
  def audioFeatures(media: DataFrame, nWindows: Int): Dataset[AudioFeature] = {
    require(nWindows > 0, "nWindows must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (rate, samples) = decodePcm16Mono(id, bytes)
          val (sums, cnts) = windowSums(samples, nWindows)
          val feat = Array.tabulate(nWindows) { w =>
            if (cnts(w) == 0) 0f else (sums(w) / (cnts(w) * 32768.0)).toFloat
          }
          AudioFeature(id, rate, samples.length.toLong, feat)
        }
      }
  }

  /** REAL image decode + feature extraction: `javax.imageio` decodes
    * the payload per partition and the pixels are pooled to a
    * `grid × grid` block-mean RGB vector (dim = grid²·3, layout
    * `(by·grid + bx)·3 + c`, values in [0, 1]) — the classic
    * thumbnail-pooling baseline feature. Undecodable payloads fail
    * loudly with the offending media_id: silently dropping rows would
    * skew any downstream dedup/similarity stage (filter upstream if
    * bad payloads are expected). */
  def imageFeatures(media: DataFrame, grid: Int): Dataset[ImageFeature] = {
    require(grid > 0, "grid must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null)
            sys.error(s"imageFeatures: undecodable payload for media_id=$id " +
              s"(${bytes.length} bytes) — no registered ImageIO reader matched")
          val w = img.getWidth; val h = img.getHeight
          val sums = new Array[Long](grid * grid * 3)
          val cnts = new Array[Long](grid * grid)
          var y = 0
          while (y < h) {
            val by = y * grid / h
            var x = 0
            while (x < w) {
              val blk = by * grid + x * grid / w
              val rgb = img.getRGB(x, y)
              sums(blk * 3) += (rgb >> 16) & 0xFF
              sums(blk * 3 + 1) += (rgb >> 8) & 0xFF
              sums(blk * 3 + 2) += rgb & 0xFF
              cnts(blk) += 1
              x += 1
            }
            y += 1
          }
          val feat = Array.tabulate(grid * grid * 3) { i =>
            val n = cnts(i / 3)
            if (n == 0) 0f else sums(i).toFloat / (n * 255f)
          }
          ImageFeature(id, w, h, feat)
        }
      }
  }
}
