package graft.queries

import graft.functions.ReservoirAgg
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-pipeline queries (binary payload plumbing; decode STUB —
  * see [[graft.ops.Multimodal]]) and the custom reservoir Aggregator.
  * Non-SQL-expressible → rows-only checks + MultimodalSpec.
  */
object MediaQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary feature extraction (mapPartitions batch transform)
    "media_features" -> ((s, d) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.packMedia(Tables.documents(s, d)), dim = 16)
      feats.toDF().select(col("media_id"), col("dim"),
        round(aggregate(col("feature"),
          lit(0.0), (acc, v) => acc + v.cast("double")), 6).as("feat_sum"))
    }),
    // frame sampling + per-frame relational stats
    "media_frames" -> ((s, d) =>
      Multimodal.frameStats(Multimodal.sampleFrames(
        Multimodal.packMedia(Tables.documents(s, d)), n = 4))),
    // custom Catalyst Aggregator: distributed reservoir over events
    "media_reservoir_agg" -> ((s, d) => {
      import s.implicits._
      val items = Tables.events(s, d).select(col("user_id")).as[Long]
      items.select(new ReservoirAgg(32, 42L).toColumn.name("sample"))
        .select(explode(col("sample")).as("item"))
    }),
  )

  override def oracles: Map[String, String] = Map.empty
}
