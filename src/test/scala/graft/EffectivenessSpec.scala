package graft

import graft.ops.{Fft, Outliers}
import org.apache.spark.sql.functions._

/** Scaled-down replica of the reference's effectiveness study
  * (BASELINE.md Table 2: Artificial10M = 9 Gaussian clusters + 100
  * planted outliers; radius decreases with K and the planted outliers
  * are recovered with shrinking uncertainty as K grows). Here: 9
  * clusters x 2000 points + 40 uniform outliers.
  */
class EffectivenessSpec extends SparkSpec {
  import spark.implicits._

  private lazy val planted = {
    val rnd = new scala.util.Random(29)
    val centers = for { i <- 0 until 3; j <- 0 until 3 }
      yield Point(i * 40.0 + 10, j * 40.0 + 10)
    val cluster = centers.flatMap(c => Array.fill(2000)(
      Point(c.x + rnd.nextGaussian(), c.y + rnd.nextGaussian())))
    val outliers = Array.fill(40)(
      Point(rnd.nextDouble() * 120, rnd.nextDouble() * 120))
    (cluster ++ outliers, outliers.length)
  }

  test("radius decreases with K; planted outliers recovered at high K (BASELINE Table 2 shape)") {
    val (pts, nOutliers) = planted
    val df = pts.map(p => (p.x, p.y)).toSeq.toDF("x", "y").cache()
    val m = 3
    val results = Seq(9, 20, 40).map { k =>
      val (_, r) = Fft.mrfft(df, k, 8)
      val row = Outliers.approxOutlierCounts(df, r, m).head()
      (k, r, row.getLong(0), row.getLong(1))
    }
    val radii = results.map(_._2)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"radius not non-increasing: $results")
    // at K=40 the radius is at cluster scale and most planted outliers
    // are flagged (sure or uncertain), like K=130 in the reference
    val (_, rHi, sureHi, uncHi) = results.last
    assert(rHi < 10.0, s"high-K radius $rHi")
    assert(sureHi + uncHi >= nOutliers / 2,
      s"flagged ${sureHi + uncHi} of $nOutliers planted outliers: $results")
    // and flagged count is sane (not the whole dataset)
    assert(sureHi + uncHi < pts.length / 10)
    df.unpersist()
  }

  test("HLL sketch distinct counts within 5% of exact (approx_count_distinct)") {
    val ev = graft.queries.Tables.events(spark, sf001)
    val got = ev.agg(
      approx_count_distinct(col("user_id")).as("approx"),
      countDistinct(col("user_id")).as("exact")).head()
    val (approx, exact) = (got.getLong(0), got.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }
}
