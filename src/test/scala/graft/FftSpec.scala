package graft

import graft.ops.Fft

class FftSpec extends SparkSpec {
  import spark.implicits._

  private def planted(nPerCluster: Int, seed: Int): Array[Point] = {
    // 4 tight clusters (radius <= 0.05) at corners of a 20x20 square
    val rnd = new scala.util.Random(seed)
    val centers = Array(Point(0, 0), Point(20, 0), Point(0, 20), Point(20, 20))
    centers.flatMap(c => Array.fill(nPerCluster)(
      Point(c.x + (rnd.nextDouble() - 0.5) * 0.1, c.y + (rnd.nextDouble() - 0.5) * 0.1)))
  }

  test("seqFFT returns min(k,n) centers, first = pts(0)") {
    val pts = planted(10, 1)
    assert(Fft.seqFFT(pts, 4).length == 4)
    assert(Fft.seqFFT(pts, 100).length == pts.length)
    assert(Fft.seqFFT(pts, 4)(0) == pts(0))
    assert(Fft.seqFFT(Array.empty[Point], 3).isEmpty)
  }

  test("seqFFT k=n gives radius 0; planted clusters recovered (one center each)") {
    val pts = planted(25, 2)
    val centers = Fft.seqFFT(pts, 4)
    // one center per planted cluster => every point within cluster diameter
    val r = pts.map(p => centers.map(c => math.sqrt(Point.distSq(p, c))).min).max
    assert(r <= 0.15, s"radius $r") // cluster diameter bound
    val quadrants = centers.map(c => (c.x > 10, c.y > 10)).toSet
    assert(quadrants.size == 4)
  }

  test("seqFFT 2-approximation on random points") {
    val rnd = new scala.util.Random(3)
    val pts = Array.fill(200)(Point(rnd.nextDouble() * 10, rnd.nextDouble() * 10))
    val k = 8
    val centers = Fft.seqFFT(pts, k)
    val rFft = pts.map(p => centers.map(c => Point.distSq(p, c)).min).max
    // lower bound on OPT: the (k+1) FFT "anchors" are pairwise >= r_k apart,
    // so OPT >= r_fft/2 => r_fft <= 2*OPT always holds; sanity: radius
    // decreases monotonically with k
    val rFft2 = {
      val c2 = Fft.seqFFT(pts, 2 * k)
      pts.map(p => c2.map(c => Point.distSq(p, c)).min).max
    }
    assert(rFft2 <= rFft)
  }

  test("coreset refuses L*K over the driver cap — loudly, before collecting") {
    val df = planted(10, 9).map(p => (p.x, p.y)).toSeq.toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Fft.coreset(df, k = 2000, l = 1000) // 2e6 > CoresetCap
    }
    assert(e.getMessage.contains("driver-side cap"), e.getMessage)
    // at the cap boundary nothing throws (tiny df: the collect is cheap)
    assert(Fft.coreset(df, k = 2, l = 4).nonEmpty)
  }

  test("mrfft (distributed) recovers planted clusters like driver FFT") {
    val pts = planted(250, 4)
    val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p.x, p.y) }
      .toSeq.toDF("id", "x", "y")
    val (centers, r) = Fft.mrfft(df, 4, 8)
    assert(centers.length == 4)
    assert(r <= 0.15, s"mrfft radius $r")
  }

  test("mrfft radius equals a full scan min-dist max (round-3 correctness)") {
    val pts = planted(50, 5)
    val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p.x, p.y) }
      .toSeq.toDF("id", "x", "y")
    val (centers, r) = Fft.mrfft(df, 4, 4)
    val expected = pts.map(p => centers.map(c => math.sqrt(Point.distSq(p, c))).min).max
    assert(math.abs(r - expected) < 1e-12)
  }

  test("mrfftOutliers composition returns sure/uncertain/radius") {
    // k=5: one center per planted cluster + one for the isolated point,
    // so R stays at cluster-radius scale and the isolated point's cell
    // (size 1, empty 7x7 neighborhood) is a sure outlier at M=2
    val pts = planted(25, 6) ++ Array(Point(10, 10))
    val df = pts.map(p => (p.x, p.y)).toSeq.toDF("x", "y")
    val row = graft.ops.Fft.mrfftOutliers(df, 2, 5, 4).head()
    val r = row.getDouble(2)
    assert(r > 0 && r < 1.0, s"radius $r")
    assert(row.getLong(0) + row.getLong(1) >= 1)
  }
}
