package graft

import graft.ops.{Fft, Freq, Outliers}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven invariants (SURVEY.md §5): bracket
  * property of the grid approximation, FFT 2-approximation /
  * monotonicity, sampling-size laws. Draws are seeded explicitly (no
  * scalatestplus bridge in the offline dep set), 8 cases per law.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val pointsGen: Gen[List[Point]] = for {
    n <- Gen.choose(5, 120)
    pts <- Gen.listOfN(n, for {
      x <- Gen.choose(0.0, 10.0); y <- Gen.choose(0.0, 10.0)
    } yield Point(x, y))
  } yield pts

  test("property: sure <= exact <= sure + uncertain for random point sets") {
    for (s <- 1 to 8) {
      val pts = draw(pointsGen, s)
      val d = draw(Gen.choose(0.3, 2.0), s + 100)
      val m = draw(Gen.choose(1, 5), s + 200)
      val exact = Outliers.exactOutliersLocal(pts.toArray, d, m).length
      val row = Outliers.approxOutlierCounts(
        pts.map(p => (p.x, p.y)).toDF("x", "y"), d, m).head()
      val (sure, unc) = (row.getLong(0), row.getLong(1))
      assert(sure <= exact && exact <= sure + unc,
        s"seed=$s d=$d m=$m sure=$sure exact=$exact unc=$unc")
    }
  }

  test("property: FFT radius is monotone non-increasing in k") {
    for (s <- 1 to 8) {
      val arr = draw(pointsGen, s + 300).toArray
      def radius(k: Int): Double = {
        val cs = Fft.seqFFT(arr, k)
        arr.map(p => cs.map(c => Point.distSq(p, c)).min).max
      }
      val rs = Seq(1, 2, 4, 8).map(radius)
      assert(rs.zip(rs.tail).forall { case (a, b) => b <= a + 1e-12 }, s"seed=$s radii $rs")
    }
  }

  test("property: FFT anchor spacing — the k+1 FFT picks are pairwise >= r_k apart") {
    // implies OPT_k >= r_k/2 (two anchors share a center by pigeonhole),
    // i.e. the Gonzalez 2-approximation bound
    for (s <- 1 to 8) {
      val arr = draw(pointsGen.suchThat(_.length >= 10), s + 400).toArray
      val k = draw(Gen.choose(2, 6), s + 500)
      val anchors = Fft.seqFFT(arr, k + 1)
      val rk = {
        val cs = anchors.take(k)
        arr.map(p => cs.map(c => Point.distSq(p, c)).min).max
      }
      val minAnchorDistSq = (for {
        i <- anchors.indices; j <- anchors.indices if i < j
      } yield Point.distSq(anchors(i), anchors(j))).min
      assert(minAnchorDistSq >= rk - 1e-9,
        s"seed=$s anchor spacing ${math.sqrt(minAnchorDistSq)} < r_k ${math.sqrt(rk)}")
    }
  }

  test("property: reservoir size law |sample| == min(m, n)") {
    for (s <- 1 to 8) {
      val n = draw(Gen.choose(1L, 300L), s + 600)
      val m = draw(Gen.choose(1, 40), s + 700)
      val df = (0L until n).map(i => (i, i % 13)).toDF("ord", "item")
      assert(Freq.reservoirSample(df, m, s.toLong).count() == math.min(m.toLong, n))
    }
  }

  test("property: sticky table is a sub-histogram (1 <= cnt <= true frequency)") {
    for (s <- 1 to 8) {
      val n = draw(Gen.choose(50, 400), s + 800)
      val p = draw(Gen.choose(0.05, 0.9), s + 900)
      val xs = (0 until n).map(i => (i % 9).toLong)
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("ord", "item")
      val hist = xs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      Freq.stickySample(df, p, s.toLong).as[(Long, Long)].collect().foreach {
        case (item, cnt) =>
          assert(cnt >= 1 && cnt <= hist(item), s"seed=$s item=$item cnt=$cnt true=${hist(item)}")
      }
    }
  }

  test("property: zValue is invertible and locality-ordered on random cells") {
    import graft.functions.InterleaveBits
    // deinterleave twin (test-only): undo the sign flip, split bits
    def unspread(z: Long): Long = {
      var x = z & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
      x
    }
    def invert(zv: Long): (Long, Long) = {
      val raw = zv ^ Long.MinValue
      (unspread(raw) - 0x80000000L, unspread(raw >>> 1) - 0x80000000L)
    }
    for (s <- 1 to 8) {
      val cells = draw(Gen.listOfN(100, for {
        i <- Gen.choose(Int.MinValue.toLong, Int.MaxValue.toLong)
        j <- Gen.choose(Int.MinValue.toLong, Int.MaxValue.toLong)
      } yield (i, j)), s)
      for ((i, j) <- cells)
        assert(invert(InterleaveBits.zValue(i, j)) == ((i, j)), s"seed=$s ($i,$j)")
      // locality: within any aligned 2x2 block, the 4 z-values are
      // contiguous (the block is one z-curve quad)
      val bi = draw(Gen.choose(-1000L, 1000L), s + 50) * 2
      val bj = draw(Gen.choose(-1000L, 1000L), s + 60) * 2
      val quad = for (di <- 0 to 1; dj <- 0 to 1)
        yield InterleaveBits.zValue(bi + di, bj + dj)
      assert(quad.max - quad.min == 3, s"2x2 block at ($bi,$bj) not contiguous: $quad")
    }
  }

  test("property: saltedJoin == plain join for random key skews and salt counts") {
    for (s <- 1 to 8) {
      val nP = draw(Gen.choose(50, 400), s)
      val hotShare = draw(Gen.choose(0.1, 0.95), s + 10)
      val salts = draw(Gen.choose(1, 32), s + 20)
      val rnd = new scala.util.Random(s)
      val probe = (0 until nP).map { i =>
        (if (rnd.nextDouble() < hotShare) 7L else rnd.nextInt(10).toLong, i.toLong)
      }.toDF("k", "pv")
      val build = (0 until 15).map(i => (rnd.nextInt(12).toLong, i.toLong))
        .toDF("bk", "bv")
      def ms(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "pv", "bk", "bv").as[(Long, Long, Long, Long)]
          .collect().groupBy(identity).view.mapValues(_.length).toMap
      assert(ms(graft.ops.Skew.saltedJoin(probe, build, "k", "bk", salts))
        == ms(probe.join(build, probe("k") === build("bk"))),
        s"seed=$s salts=$salts hotShare=$hotShare")
    }
  }

  test("property: fairShareBudgets closed form == iterative water-filling") {
    // reference: the textbook max-min loop — repeatedly grant every
    // open group an equal share of what's left, close groups whose
    // total is below their share, until no group closes; integer
    // floors exactly as the op documents
    def iterative(tots: Map[String, Long], budget: Long): Map[String, Long] = {
      var alloc = Map.empty[String, Long]
      var open = tots
      var left = budget
      var changed = true
      while (changed && open.nonEmpty) {
        val share = left / open.size
        val closing = open.filter { case (_, t) => t <= share }
        changed = closing.nonEmpty
        if (changed) {
          alloc ++= closing
          left -= closing.values.sum
          open --= closing.keySet
        } else open.keys.foreach(g => alloc += g -> share)
      }
      alloc // loop exits only with every group assigned (closed or leveled)
    }
    import org.apache.spark.sql.functions.{col, sum}
    for (s <- 1 to 10) {
      val nG = draw(Gen.choose(1, 12), s)
      val rnd = new scala.util.Random(s)
      val rows = (0 until nG).flatMap { g =>
        (0 to rnd.nextInt(6)).map(i => (s"g$g-$i", s"g$g", rnd.nextInt(500).toLong + 1L))
      }.toDF("id", "grp", "w")
      val tots = rows.groupBy("grp").agg(sum("w").as("t"))
        .as[(String, Long)].collect().toMap
      val budget = math.max(1L, (tots.values.sum * (0.2 + 0.7 * rnd.nextDouble())).toLong)
      val got = graft.ops.Freq.fairShareBudgets(rows, col("w"), budget, "grp")
        .select("group", "budget").as[(String, Long)].collect().toMap
      assert(got == iterative(tots, budget),
        s"seed=$s budget=$budget tots=$tots got=$got want=${iterative(tots, budget)}")
    }
  }

  test("property: stratifiedSample sizes are exact ceil(frac*|stratum|) for random fracs") {
    for (s <- 1 to 8) {
      val frac = draw(Gen.choose(0.05, 1.0), s + 30)
      val nStrata = draw(Gen.choose(1, 6), s + 40)
      val rnd = new scala.util.Random(s + 7)
      val df = (0 until 300).map(i =>
        (i.toLong, s"g${rnd.nextInt(nStrata)}")).toDF("id", "g")
      val sizes = df.groupBy("g").count().as[(String, Long)].collect().toMap
      val got = graft.ops.Freq.stratifiedSample(df, "g", "id", frac, s.toLong)
        .groupBy("g").count().as[(String, Long)].collect().toMap
      sizes.foreach { case (g, n) =>
        // exact-decimal expectation: double math.ceil(n*frac) shares the
        // operator's old FP bug and couldn't witness it
        val want = (BigDecimal(n) * BigDecimal(frac))
          .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
        assert(got.getOrElse(g, 0L) == want,
          s"seed=$s frac=$frac stratum=$g n=$n got=${got.get(g)}")
      }
    }
  }

  test("stratifiedSample: frac·n landing on an integer keeps EXACTLY that many rows") {
    // 55·0.2 = 11, but in binary doubles 55*0.2 == 11.000000000000002,
    // whose ceil is 12 — the decimal-arithmetic cutoff must keep 11
    val df = (0L until 55L).map((_, "g")).toDF("id", "g")
    val n = graft.ops.Freq.stratifiedSample(df, "g", "id", 0.2, 7L).count()
    assert(n == 11L, s"expected exact ceil(55*0.2)=11, got $n")
  }

  test("property: weightedSample with uniform weights has uniform inclusion") {
    // with all weights equal, A-Res degenerates to a uniform m-subset:
    // inclusion frequency per item across seeds ~ m/n
    val n = 400
    val m = 80
    val items = (1L to n.toLong).map((_, 1.0)).toDF("id", "w")
    val counts = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    for (s <- 1 to 25) {
      Freq.weightedSample(items, m, s.toLong).select("id").as[Long]
        .collect().foreach(id => counts(id) += 1)
    }
    // per-item spread, NOT the mean (the mean is fixed at 25·m/n by
    // construction — every run returns exactly m rows): a degenerate
    // sampler that repeats one fixed subset leaves 320 items at 0 and
    // pins 80 at 25; uniform Binomial(25, 0.2) leaves ~1.5 items at 0
    // and its max is ~12
    val neverSampled = (1L to n.toLong).count(id => counts(id) == 0)
    assert(neverSampled < 20, s"$neverSampled of $n items never sampled")
    assert(counts.values.max <= 16, s"max=${counts.values.max}")
  }
}
