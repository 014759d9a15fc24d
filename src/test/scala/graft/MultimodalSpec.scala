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
