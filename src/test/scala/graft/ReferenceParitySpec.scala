package graft

import graft.ops.Outliers
import graft.pipelines.Hw1

/** Value-level parity against the reference's OWN hand-checkable
  * micro-dataset (`HWK_1/TestN15-input.txt`, read-only test fixture):
  * the Hw1 façade must reproduce, on the actual reference file, the
  * outlier count and top-K points the driver-side O(N²) twin of the
  * reference's `ExactOutliers` (`HWK_1/G029HW1.py:16-49`) computes —
  * closing the loop PipelineSpec's synthesized lookalike leaves open.
  *
  * Tie-break note: the engine orders outliers by (cnt, id) where id is
  * the (x, y) rank (Points.withIds), so the twin is fed the points in
  * the same sorted order — then twin index order == engine id order
  * and the printed top-K sequences must agree exactly.
  */
class ReferenceParitySpec extends SparkSpec {

  private val refPath = "/root/reference/HWK_1/TestN15-input.txt"

  private lazy val refPoints: Array[Point] = {
    val src = scala.io.Source.fromFile(refPath)
    try src.getLines().filter(_.trim.nonEmpty).map { l =>
      val Array(x, y) = l.split(",")
      Point(x.trim.toDouble, y.trim.toDouble)
    }.toArray
    finally src.close()
  }

  test("Hw2 MRFFT on the reference's uber-10k.csv: structure + radius laws") {
    // the reference's real 10k-point NYC dataset (read-only fixture);
    // no published golden values exist for it, so assert structure +
    // the radius laws the algorithm guarantees
    val path = "/root/reference/HWK_1/uber-10k.csv"
    val lines = graft.pipelines.Hw2.run(spark, path, m = 3, k = 16, l = 4)
    assert(lines.contains("Number of points = 10000"))
    val radius = lines.find(_.startsWith("Radius = ")).get.split("= ")(1).toDouble
    // NYC lat/lon cloud spans ~1 degree; k-center radius must be
    // positive and below the data diameter
    assert(radius > 0.0 && radius < 2.0, s"radius $radius outside sane range")
    val sure = lines.find(_.startsWith("Number of sure outliers= ")).get.split("= ")(1).toLong
    val unc = lines.find(_.startsWith("Number of uncertain points= ")).get.split("= ")(1).toLong
    assert(sure >= 0 && unc >= 0 && sure + unc <= 10000)
  }

  test("Hw1+Hw2 on the reference's uber-100k.csv: 10x-scale structure + bracket laws") {
    // the reference's mid-scale real dataset (read-only fixture) — a
    // 10x scale-sanity run: no golden values exist, so assert the
    // cross-algorithm bracket law (grid-approx sure ≤ exact ≤
    // sure+uncertain, two INDEPENDENT formulations agreeing on real
    // data) and the radius laws at 100k points
    val path = "/root/reference/HWK_1/uber-100k.csv"
    val lines = graft.pipelines.Hw1.run(spark, path, d = 0.004, m = 5, k = 8, l = 8)
    assert(lines.contains("Number of points = 100000"))
    val exact = lines.find(_.startsWith("Number of Outliers = ")).get.split("= ")(1).toLong
    val sure = lines.find(_.startsWith("Number of sure outliers= ")).get.split("= ")(1).toLong
    val unc = lines.find(_.startsWith("Number of uncertain points= ")).get.split("= ")(1).toLong
    assert(sure <= exact && exact <= sure + unc,
      s"bracket law violated at 100k: sure=$sure exact=$exact unc=$unc")
    val l2 = graft.pipelines.Hw2.run(spark, path, m = 5, k = 16, l = 8)
    assert(l2.contains("Number of points = 100000"))
    val radius = l2.find(_.startsWith("Radius = ")).get.split("= ")(1).toDouble
    assert(radius > 0.0 && radius < 2.0, s"radius $radius outside sane range")
  }

  test("Hw1 on TestN15-input.txt matches the O(N²) reference twin, two parameter sets") {
    assert(refPoints.length == 15)
    val sorted = refPoints.sortBy(p => (p.x, p.y))
    for ((d, m, k) <- Seq((0.5, 2, 3), (1.0, 3, 5))) {
      val expected = Outliers.exactOutliersLocal(sorted, d, m) // (idx, cnt) by (cnt, idx)
      val lines = Hw1.run(spark, refPath, d = d, m = m, k = k, l = 2)
      assert(lines.contains("Number of points = 15"))
      assert(lines.contains(s"Number of Outliers = ${expected.length}"),
        s"outlier count diverged at D=$d M=$m")
      val expLines = expected.take(k).map { case (i, _) =>
        s"Point: (${sorted(i).x}, ${sorted(i).y})"
      }.toSeq
      val gotLines = lines.filter(_.startsWith("Point: ("))
      assert(gotLines == expLines, s"top-K points diverged at D=$d M=$m K=$k")
      // HW1 cross-validation on the same run: sure ≤ exact ≤ sure+unc
      val sure = lines.find(_.startsWith("Number of sure outliers= ")).get.split("= ")(1).toLong
      val unc = lines.find(_.startsWith("Number of uncertain points= ")).get.split("= ")(1).toLong
      assert(sure <= expected.length && expected.length <= sure + unc)
    }
  }
}
