package graft.queries

import graft.functions.ReservoirAgg
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-pipeline queries (binary payload plumbing — REAL image,
  * audio AND video decode via JDK-builtin codecs; only the generic
  * `media_features` face keeps the declared `fakeDecode` stand-in; see
  * [[graft.ops.Multimodal]]) and the custom reservoir Aggregator. The
  * stub-decode queries are non-SQL-expressible → rows-only checks +
  * MultimodalSpec; `audio_windows` and `video_frames` run the real
  * decodes under the full DuckDB hash gate.
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
    // REAL audio path under the full hash gate: synthesize WAV
    // containers on the executors, parse them back with the JDK's
    // javax.sound.sampled, pool the decoded PCM into per-window
    // |amplitude| sums — exact integers that DuckDB recomputes from
    // the synth formula alone (it never sees a WAV byte), so the
    // oracle match proves container encode→decode round-trips the
    // samples bit-exactly. 1/8 id slice keeps the encode cost a
    // fraction of the corpus scan; the laws are per-media, so the
    // slice loses no per-row strength.
    "audio_windows" -> ((s, d) => {
      val ids = Tables.documents(s, d).select(col("doc_id"))
        .where(pmod(col("doc_id"), lit(8)) === 0)
      val media = Multimodal.packSynthWavs(ids, "doc_id",
        nSamples = AudioN, sampleRate = AudioRate)
      Multimodal.audioWindowSums(media, AudioWin).toDF()
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          col("win").cast("long").as("win"), col("win_n"), col("sum_abs"))
    }),
    // REAL video path under the full hash gate: synthesize multi-frame
    // GIF containers on the executors, parse them back frame by frame
    // with the JDK's GIF reader, and emit per-frame gray sums — exact
    // integers DuckDB recomputes from the synth formula alone (it
    // never sees a GIF byte). Residue 4 mod 8 keeps the probe disjoint
    // from audio_windows' 0 mod 8.
    "video_frames" -> ((s, d) => {
      val ids = Tables.documents(s, d).select(col("doc_id"))
        .where(pmod(col("doc_id"), lit(8)) === 4)
      val media = Multimodal.packSynthGifs(ids, "doc_id",
        w = VideoW, h = VideoH, nFrames = VideoF)
      Multimodal.videoFrameSums(media).toDF()
        .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
          col("n_frames").cast("long").as("n_frames"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("sum_gray"))
    }),
  )

  /** audio_windows parameters, shared with the oracle SQL below. */
  private val AudioN = 2048
  private val AudioRate = 8000
  private val AudioWin = 8

  /** video_frames parameters, shared with the oracle SQL below. */
  private val VideoW = 16
  private val VideoH = 16
  private val VideoF = 4

  override def oracles: Map[String, String] = Map(
    // The oracle restates the decoded-sample windows purely from the
    // synth formula ((31·id + 7·t) mod 65536 − 32768): all-integer
    // algebra, no audio code, no floats. `//` is DuckDB integer
    // division (its `/` is true division).
    "audio_windows" ->
      s"""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 8 = 0),
         |s AS (SELECT doc_id, unnest(generate_series(0, ${AudioN - 1})) AS t FROM ids)
         |SELECT doc_id AS media_id,
         |  $AudioRate AS sample_rate,
         |  CAST($AudioN AS BIGINT) AS n_samples,
         |  (t * $AudioWin) // $AudioN AS win,
         |  CAST(count(*) AS BIGINT) AS win_n,
         |  CAST(sum(abs(((31 * doc_id + 7 * t) % 65536) - 32768)) AS BIGINT) AS sum_abs
         |FROM s GROUP BY 1, 2, 3, 4""".stripMargin,
    // per-frame gray sums restated purely from the synth formula
    // ((31·id + 29·f + 7·x + 13·y) mod 256) — all-integer algebra,
    // no imaging code
    "video_frames" ->
      s"""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 8 = 4),
         |fr AS (SELECT doc_id, unnest(generate_series(0, ${VideoF - 1})) AS f FROM ids),
         |px AS (SELECT doc_id, f, x.x, y.y FROM fr,
         |       (SELECT unnest(generate_series(0, ${VideoW - 1})) AS x) x,
         |       (SELECT unnest(generate_series(0, ${VideoH - 1})) AS y) y)
         |SELECT doc_id AS media_id, f AS frame_no,
         |  CAST($VideoF AS BIGINT) AS n_frames,
         |  CAST($VideoW AS BIGINT) AS width,
         |  CAST($VideoH AS BIGINT) AS height,
         |  CAST(sum((31 * doc_id + 29 * f + 7 * x + 13 * y) % 256) AS BIGINT) AS sum_gray
         |FROM px GROUP BY 1, 2""".stripMargin,
  )
}
