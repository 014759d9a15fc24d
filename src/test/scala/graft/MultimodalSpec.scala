package graft

import graft.functions.ReservoirAgg
import graft.ops.Multimodal
import graft.queries.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("packMedia produces binary payloads with metadata") {
    val media = Multimodal.packMedia(Tables.documents(spark, sf0001))
    val row = media.head()
    assert(row.getAs[String]("mime").nonEmpty)
    assert(row.getAs[Array[Byte]]("payload").length == row.getAs[Long]("n_bytes"))
    assert(media.count() > 0)
  }

  test("extractFeatures: fixed-dim deterministic vectors") {
    val media = Multimodal.packMedia(Tables.documents(spark, sf0001)).limit(20)
    val f1 = Multimodal.extractFeatures(media, 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, 16).collect().sortBy(_.media_id)
    assert(f1.length == 20)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.forall(_.feature.forall(v => v >= -1f && v < 1f)))
    assert(f1.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
    // different payloads -> different features
    assert(f1.map(_.feature.toSeq).distinct.length == f1.length)
  }

  test("sampleFrames: n rows per media, in-bounds windows") {
    val media = Multimodal.packMedia(Tables.documents(spark, sf0001)).limit(10)
    val frames = Multimodal.sampleFrames(media, 4)
    val stats = Multimodal.frameStats(frames)
    assert(frames.count() == 40)
    val perMedia = frames.groupByKey(_.media_id).count().collect().toMap
    assert(perMedia.values.forall(_ == 4L))
    assert(stats.where(col("n_bytes") <= 0).count() == 0)
  }

  test("imageFeatures: PNG encode->decode->pool is pixel-exact vs the formula") {
    val ids = Seq(0L, 7L, 123L).toDF("doc_id")
    val media = Multimodal.packSynthImages(ids, "doc_id", w = 16, h = 16)
    assert(media.where(col("mime") =!= "image/png").count() == 0)
    val feats = Multimodal.imageFeatures(media, grid = 4).collect()
    assert(feats.length == 3)
    for (f <- feats) {
      assert(f.width == 16 && f.height == 16 && f.feature.length == 48)
      // hand-computed twin: block sums straight from synthPixel
      for (by <- 0 until 4; bx <- 0 until 4; c <- 0 until 3) {
        val exp = (for (y <- by * 4 until by * 4 + 4; x <- bx * 4 until bx * 4 + 4)
          yield Multimodal.synthPixel(f.media_id, x, y, c)).sum
        val got = math.round(f.feature((by * 4 + bx) * 3 + c) * 16 * 255)
        assert(got == exp, s"block ($bx,$by,$c) of image ${f.media_id}: $got != $exp")
      }
    }
  }

  test("imageFeatures: undecodable payload fails loudly with the media_id") {
    val bad = Seq((99L, "application/octet-stream", 4L, Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val e = intercept[Exception] { Multimodal.imageFeatures(bad, 4).count() }
    assert(msgs(e).exists(_.contains("media_id=99")), e.getMessage)
  }

  test("audio: WAV encode->decode->window sums are sample-exact vs the formula") {
    val nSamp = 512; val nWin = 4
    val ids = Seq(0L, 7L, 123L).toDF("doc_id")
    val media = Multimodal.packSynthWavs(ids, "doc_id", nSamples = nSamp, sampleRate = 8000)
    assert(media.where(col("mime") =!= "audio/wav").count() == 0)
    val wins = Multimodal.audioWindowSums(media, nWin).collect()
    assert(wins.length == 3 * nWin)
    for (w <- wins) {
      assert(w.sample_rate == 8000 && w.n_samples == nSamp)
      val ts = (0 until nSamp).filter(t => t.toLong * nWin / nSamp == w.win)
      assert(w.win_n == ts.length)
      val exp = ts.map(t => math.abs(Multimodal.synthSample(w.media_id, t).toLong)).sum
      assert(w.sum_abs == exp, s"window ${w.win} of media ${w.media_id}: ${w.sum_abs} != $exp")
    }
  }

  test("audio: features equal window sums narrowed to float") {
    val nSamp = 512; val nWin = 4
    val media = Multimodal.packSynthWavs(Seq(5L, 42L).toDF("doc_id"), "doc_id", nSamp, 8000)
    val sums = Multimodal.audioWindowSums(media, nWin).collect()
      .map(w => (w.media_id, w.win) -> ((w.sum_abs / (w.win_n * 32768.0)).toFloat)).toMap
    val feats = Multimodal.audioFeatures(media, nWin).collect()
    assert(feats.length == 2)
    for (f <- feats; w <- 0 until nWin) {
      assert(f.feature.length == nWin)
      assert(f.feature(w) == sums((f.media_id, w)),
        s"feature($w) of media ${f.media_id}")
    }
  }

  test("audio: big-endian AIFF decodes to the same sums as WAV") {
    // exercises the big-endian branch of the PCM reader: re-encode the
    // same synthetic samples as AIFF (the JDK's AIFF writer emits
    // big-endian PCM) and expect identical window sums
    val nSamp = 256
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, true)
    val pcm = new Array[Byte](nSamp * 2)
    for (t <- 0 until nSamp) {
      val s = Multimodal.synthSample(9L, t)
      pcm(2 * t) = ((s >> 8) & 0xFF).toByte
      pcm(2 * t + 1) = (s & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamp.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val aiff = Seq((9L, "audio/aiff", bos.size().toLong, bos.toByteArray))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val wav = Multimodal.packSynthWavs(Seq(9L).toDF("doc_id"), "doc_id", nSamp, 8000)
    val a = Multimodal.audioWindowSums(aiff, 4).collect().sortBy(_.win).map(_.sum_abs).toSeq
    val b = Multimodal.audioWindowSums(wav, 4).collect().sortBy(_.win).map(_.sum_abs).toSeq
    assert(a == b && a.length == 4)
  }

  test("audio: unparseable and wrong-format payloads fail loudly with the media_id") {
    val junk = Seq((77L, "audio/wav", 4L, Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val e1 = intercept[Exception] { Multimodal.audioWindowSums(junk, 4).count() }
    assert(msgs(e1).exists(_.contains("media_id=77")), e1.getMessage)
    // stereo PCM parses as a container but violates the 16-bit MONO contract
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](64)), fmt, 16L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val stereo = Seq((78L, "audio/wav", bos.size().toLong, bos.toByteArray))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val e2 = intercept[Exception] { Multimodal.audioWindowSums(stereo, 4).count() }
    assert(msgs(e2).exists(m => m.contains("media_id=78") && m.contains("not 16-bit mono")),
      e2.getMessage)
  }

  test("video: GIF encode->parse->frame decode is pixel-exact vs the formula") {
    val w = 16; val h = 16; val nf = 3
    val ids = Seq(0L, 7L, 123L).toDF("doc_id")
    val media = Multimodal.packSynthGifs(ids, "doc_id", w, h, nf)
    assert(media.where(col("mime") =!= "image/gif").count() == 0)
    val frames = Multimodal.videoFrameSums(media).collect()
    assert(frames.length == 3 * nf)
    for (fr <- frames) {
      assert(fr.n_frames == nf && fr.width == w && fr.height == h)
      val exp = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.synthFramePixel(fr.media_id, fr.frame_no, x, y).toLong).sum
      assert(fr.sum_gray == exp,
        s"frame ${fr.frame_no} of video ${fr.media_id}: ${fr.sum_gray} != $exp")
    }
  }

  test("video: frame features pool block means exactly") {
    val grid = 4; val w = 16; val h = 16
    val media = Multimodal.packSynthGifs(Seq(42L).toDF("doc_id"), "doc_id", w, h, 2)
    val feats = Multimodal.videoFrameFeatures(media, grid).collect()
    assert(feats.length == 2)
    for (f <- feats; by <- 0 until grid; bx <- 0 until grid) {
      assert(f.feature.length == grid * grid)
      val exp = (for (y <- by * 4 until by * 4 + 4; x <- bx * 4 until bx * 4 + 4)
        yield Multimodal.synthFramePixel(42L, f.frame_no, x, y)).sum
      val got = math.round(f.feature(by * grid + bx) * 16 * 255)
      assert(got == exp, s"block ($bx,$by) frame ${f.frame_no}: $got != $exp")
    }
  }

  test("video: unparseable payload fails loudly with the media_id") {
    val junk = Seq((55L, "image/gif", 4L, Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val e = intercept[Exception] { Multimodal.videoFrameSums(junk).count() }
    assert(msgs(e).exists(_.contains("media_id=55")), e.getMessage)
  }

  test("ReservoirAgg: size m, subset of input, reproducible, ~uniform") {
    val m = 25
    val ds = (0L until 5000L).toDS()
    val agg = new ReservoirAgg(m, seed = 7L).toColumn
    val s1 = ds.select(agg).head()
    val s2 = ds.select(agg).head()
    assert(s1.length == m)
    assert(s1.forall(x => x >= 0 && x < 5000))
    assert(s1.toSeq == s2.toSeq) // same partitioning -> reproducible
    // small input: sample == input
    val tiny = (0L until 10L).toDS().select(new ReservoirAgg(m, 1L).toColumn).head()
    assert(tiny.sorted.toSeq == (0L until 10L))
    // rough uniformity: mean of sampled values near 2500 over seeds
    val means = (0 until 30).map { s =>
      ds.select(new ReservoirAgg(m, s.toLong).toColumn).head().sum.toDouble / m
    }
    val grand = means.sum / means.size
    assert(math.abs(grand - 2500.0) < 300.0, s"grand mean $grand")
  }
}
