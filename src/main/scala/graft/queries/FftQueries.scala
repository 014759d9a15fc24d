package graft.queries

import graft.ops.Fft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries for the HW2 clustering surface (SURVEY.md §2.6 C1–C5).
  *
  * FFT is not SQL-expressible → no oracle entries; the driver records
  * rows-only checks, and ScalaTest property tests pin the semantics
  * (R ≤ 2·OPT on planted clusters, monotone-in-K, coreset parity).
  */
object FftQueries extends QueryPack {
  private val K = 16
  private val L = 32
  private val M = 10

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1–C3: the K centers themselves (deterministic coreset; no
    // radius scan — that's fft_radius's job)
    "fft_centers" -> ((s, d) => {
      val centers = Fft.centers(Tables.points(s, d), K, L)
      import s.implicits._
      centers.toSeq.toDF("x", "y").orderBy("x", "y")
    }),
    // C4: clustering radius as a one-row result
    "fft_radius" -> ((s, d) => {
      val (_, r) = Fft.mrfft(Tables.points(s, d), K, L)
      import s.implicits._
      Seq((K, r)).toDF("k", "radius")
    }),
    // C5: MRFFT → MRApproxOutliers composition (D = radius)
    "fft_outliers" -> ((s, d) =>
      Fft.mrfftOutliers(Tables.points(s, d), M, K, L)),
  )

  override def oracles: Map[String, String] = Map.empty
}
