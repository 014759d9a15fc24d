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
