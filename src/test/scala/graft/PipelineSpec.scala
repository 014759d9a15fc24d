package graft

import graft.pipelines.{Hw1, Hw2, Hw3}
import java.nio.file.Files

/** End-to-end pipeline façades on a desk-checkable 15-point fixture
  * (same shape as the reference's TestN15: small clusters + isolated
  * points, synthesized here — not copied). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // 2 tight pairs, one 4-cluster, 3 isolated points
  private val fixture = Seq(
    (0.0, 0.0), (0.1, 0.0),
    (5.0, 5.0), (5.1, 5.0), (5.0, 5.1), (5.1, 5.1),
    (9.0, 1.0), (9.1, 1.0),
    (2.0, 8.0), (7.0, 9.0), (1.0, 4.0),
    (3.0, 3.0), (3.1, 3.0), (3.0, 3.1), (2.9, 3.0),
  )

  private lazy val csvPath: String = {
    val dir = Files.createTempDirectory("graft_pts").toString
    val f = new java.io.File(dir, "pts.csv")
    val w = new java.io.PrintWriter(f)
    fixture.foreach { case (x, y) => w.println(s"$x,$y") }
    w.close()
    f.getAbsolutePath
  }

  test("Hw1: exact + approx outlier report, desk-checked") {
    // D=0.5, M=2: neighborhoods within 0.5 — the two pairs have
    // cnt 2 (self+1), the two 4-clusters cnt 4, isolated cnt 1.
    // Outliers (cnt<=2): 2 pairs (4 pts) + 3 isolated = 7 points
    val lines = Hw1.run(spark, csvPath, d = 0.5, m = 2, k = 3, l = 2)
    assert(lines.exists(_ == "Number of points = 15"))
    assert(lines.exists(_ == "Number of Outliers = 7"))
    assert(lines.count(_.startsWith("Point: (")) == 3)
    assert(lines.exists(_.startsWith("Number of sure outliers= ")))
    assert(lines.exists(_.startsWith("Cell: (")))
    // bracket invariant on the same run
    val sure = lines.find(_.startsWith("Number of sure outliers= ")).get.split("= ")(1).toLong
    val unc  = lines.find(_.startsWith("Number of uncertain points= ")).get.split("= ")(1).toLong
    assert(sure <= 7 && 7 <= sure + unc)
  }

  test("Hw2: MRFFT radius + outliers report") {
    val lines = Hw2.run(spark, csvPath, m = 2, k = 4, l = 2)
    assert(lines.exists(_ == "Number of points = 15"))
    val radius = lines.find(_.startsWith("Radius = ")).get.split("= ")(1).toDouble
    assert(radius > 0 && radius < 12)
    assert(lines.exists(_.startsWith("Running time of MRFFT Round 1 = ")))
    assert(lines.exists(_.startsWith("Running time of MRFFT Round 3 = ")))
  }

  test("Hw2.referenceConf: the reference's locality relaxation lands in the build conf") {
    // G029HW2.py:148 — conf.set("spark.locality.wait", "0s"); a
    // scheduler conf, so parity is at session BUILD time
    val c = Hw2.referenceConf(new org.apache.spark.SparkConf(false))
    assert(c.get("spark.locality.wait") === "0s")
  }

  test("Hw3: frequent-items report with +/- annotations") {
    val xs = (Seq.fill(40)(7L) ++ Seq.fill(25)(9L) ++ (100L until 135L))
    val items = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("ord", "item")
    val lines = Hw3.run(items, n = 100L, phi = 0.2, eps = 0.1, delta = 0.1, port = "test")
    assert(lines.exists(_ == "INPUT PROPERTIES"))
    assert(lines.exists(_ == "n = 100 phi = 0.2 epsilon = 0.1 delta = 0.1 port = test"))
    assert(lines.exists(_ == "Number of true frequent items = 2"))
    assert(lines.exists(_ == "Size m of the sample = 5"))
    // every annotated line is "<item> +" or "<item> -"
    val annotated = lines.filter(l => l.endsWith(" +") || l.endsWith(" -"))
    assert(annotated.nonEmpty)
    // true frequent (7, 9) printed as bare items in the exact section
    assert(lines.contains("7") && lines.contains("9"))
  }
}
