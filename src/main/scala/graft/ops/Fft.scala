package graft.ops

import graft.Point
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** MapReduce Farthest-First Traversal (k-center clustering) + radius.
  *
  * Reference semantics (`HWK_2/G029HW2.py`):
  *  - `SequentialFFT` (lines 50-79): Gonzalez FFT — start from the
  *    first point, repeatedly add the point farthest from the current
  *    center set, maintaining per-point min-distance incrementally
  *    against the latest center only. 2-approximation of k-center.
  *  - `MRFFT` (lines 82-107): Round 1 builds an L·K coreset by running
  *    FFT per partition; Round 2 runs FFT on the coreset on the
  *    driver; Round 3 broadcasts the K centers and computes
  *    R = max_p min_c dist(p, c).
  *  - HW2 composition (lines 165-170): R becomes the D of
  *    MRApproxOutliers.
  *
  * Scale notes: Round 1 is embarrassingly parallel (`mapPartitions`,
  * no shuffle); the only driver-bound state is the L·K coreset —
  * callers must keep L·K small (e.g. 1000 executors × K=110 ≈ 10⁵
  * points ≈ MBs). Round 3 is a single scan with the centers folded
  * into a literal array column — no join, no shuffle, evaluated
  * inside whole-stage codegen via higher-order array functions.
  */
object Fft {

  /** C1 — Gonzalez farthest-first traversal, O(N·K).
    * Deterministic given input order (first center = pts(0), argmax
    * ties broken by lowest index, matching Python's max-scan). */
  def seqFFT(pts: Array[Point], k: Int): Array[Point] = {
    val n = pts.length
    if (n == 0 || k <= 0) return Array.empty
    val kk = math.min(k, n)
    val centers = new Array[Point](kk)
    centers(0) = pts(0)
    val minD = new Array[Double](n)
    var i = 0
    while (i < n) { minD(i) = Point.distSq(pts(i), centers(0)); i += 1 }
    var c = 1
    while (c < kk) {
      // incremental update vs latest center, then argmax
      var best = 0; var bestD = -1.0
      var j = 0
      while (j < n) {
        if (minD(j) > bestD) { bestD = minD(j); best = j }
        j += 1
      }
      centers(c) = pts(best)
      j = 0
      while (j < n) {
        val d = Point.distSq(pts(j), centers(c))
        if (d < minD(j)) minD(j) = d
        j += 1
      }
      c += 1
    }
    centers
  }

  /** n-dimensional Gonzalez FFT over dense vectors (the 2-D kernel
    * generalized; used as the IVF coarse quantizer and for embedding
    * k-center clustering). Deterministic given input order. */
  def seqFFTVec(pts: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val n = pts.length
    if (n == 0 || k <= 0) return Array.empty
    @inline def dSq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val kk = math.min(k, n)
    val centers = new Array[Array[Double]](kk)
    centers(0) = pts(0)
    val minD = Array.tabulate(n)(i => dSq(pts(i), centers(0)))
    var c = 1
    while (c < kk) {
      var best = 0; var bestD = -1.0
      var j = 0
      while (j < n) { if (minD(j) > bestD) { bestD = minD(j); best = j }; j += 1 }
      centers(c) = pts(best)
      j = 0
      while (j < n) {
        val d = dSq(pts(j), centers(c))
        if (d < minD(j)) minD(j) = d
        j += 1
      }
      c += 1
    }
    centers
  }

  /** C2 — Round 1: per-partition FFT coreset, L·K points to the driver.
    * Partitioning is made deterministic by hash-repartitioning on the
    * coordinates and sorting within partitions (the reference's
    * round-robin `repartition(L)` makes centers run-dependent; radius-
    * level results are equivalent — SURVEY.md §7.4). */
  /** Hard cap on the L·K coreset the driver collects: 10⁶ points
    * (~32 MB of (x, y) doubles plus row overhead) — far above any
    * sane configuration (1000 executors × K=110 ≈ 1.1·10⁵) but low
    * enough that a mis-sized call fails LOUDLY here instead of as a
    * driver OOM mid-collect. */
  val CoresetCap: Long = 1000000L

  def coreset(points: DataFrame, k: Int, l: Int): Array[Point] = {
    require(l.toLong * k <= CoresetCap,
      s"coreset: L*K = ${l.toLong * k} exceeds the driver-side cap $CoresetCap " +
        "(the R1 coreset is collected to the driver; lower L or K)")
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("x"), col("y"))
      .repartition(l, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .as[Point]
      .mapPartitions(it => seqFFT(it.toArray, k).iterator)
      .collect()
  }

  /** Squared min-distance of (x,y) to a literal center set — the
    * codegen'd [[graft.functions.MinDistSq]] loop over the centers
    * packed flat as an array<double> literal (broadcast by value in
    * the plan; no join, no shuffle). */
  def minDistSqCol(points: DataFrame, centers: Array[Point], x: Column, y: Column): Column =
    graft.functions.Native.minDistSqNative(points.sparkSession, x, y,
      lit(centers.flatMap(c => Array(c.x, c.y))))

  /** C1+C2+C3 — centers only (coreset + driver FFT), no radius scan. */
  def centers(points: DataFrame, k: Int, l: Int): Array[Point] =
    seqFFT(coreset(points, k, l), k)

  /** C4 — Round 3: R = max_p min_c dist(p,c), one scan, no shuffle
    * beyond the final scalar reduce. */
  def radius(points: DataFrame, centerArr: Array[Point]): Double = {
    val row = points
      .agg(max(minDistSqCol(points, centerArr, col("x"), col("y"))).as("r2"))
      .head()
    math.sqrt(row.getDouble(0))
  }

  /** C1+C2+C3+C4 — full MRFFT: (K centers, radius R). */
  def mrfft(points: DataFrame, k: Int, l: Int): (Array[Point], Double) = {
    val cs = centers(points, k, l)
    (cs, radius(points, cs))
  }

  /** C5 — HW2 composition: cluster, then grid-approximate outliers
    * with D = clustering radius (`HWK_2/G029HW2.py:165-170`). */
  def mrfftOutliers(points: DataFrame, m: Int, k: Int, l: Int): DataFrame = {
    val (_, r) = mrfft(points, k, l)
    Outliers.approxOutlierCounts(points, r, m)
      .withColumn("radius", lit(r))
  }
}
