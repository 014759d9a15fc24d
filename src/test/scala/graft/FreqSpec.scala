package graft

import graft.ops.Freq
import org.apache.spark.sql.functions._

class FreqSpec extends SparkSpec {
  import spark.implicits._

  private def streamDF(xs: Seq[Long]) =
    xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("ord", "item")

  test("capPerGroup: quota per group, small groups intact, deterministic") {
    val df = (1L to 50L).map(i => (i, if (i <= 44) "big" else "small"))
      .toDF("doc_id", "source")
    val capped = Freq.capPerGroup(df, "source", "doc_id", cap = 10, seed = 42L)
    val sizes = capped.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(sizes == Map("big" -> 10L, "small" -> 6L)) // min(cap, |group|)
    // kept rows come from the input, and the same seed keeps the same rows
    assert(capped.exceptAll(df.join(capped, Seq("doc_id", "source"), "left_semi"))
      .isEmpty)
    val again = Freq.capPerGroup(df, "source", "doc_id", cap = 10, seed = 42L)
    assert(capped.exceptAll(again).isEmpty && again.exceptAll(capped).isEmpty)
    // the seeded-hash order is not head-of-table: some kept big-group
    // id exceeds 10 (a prefix cap would keep exactly 1..10)
    val keptBig = capped.where(col("source") === "big")
      .select("doc_id").as[Long].collect().toSet
    assert(keptBig.exists(_ > 10L), s"cap kept the table prefix: $keptBig")
  }

  test("fairShareBudgets: closed-form water level == hand-computed max-min") {
    val df = (Seq.tabulate(10)(i => (s"a$i", "A", 1L)) ++
      Seq.tabulate(5)(i => (s"b$i", "B", 10L)) ++
      Seq.tabulate(10)(i => (s"c$i", "C", 10L))).toDF("id", "grp", "w")
    def alloc(budget: Long) =
      Freq.fairShareBudgets(df, col("w"), budget, "grp")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    // tots A=10 B=50 C=100; B=100: A saturates (10*3 <= 100), B does
    // not (50*2 > 90), level T = (100-10)//2 = 45 — allocation sums
    // to the budget exactly
    assert(alloc(100L) == Map("A" -> ((10L, 10L)), "B" -> ((50L, 45L)),
      "C" -> ((100L, 45L))))
    // budget >= total: every group saturates, allocation == tot
    assert(alloc(200L) == Map("A" -> ((10L, 10L)), "B" -> ((50L, 50L)),
      "C" -> ((100L, 100L))))
    // budget below every fair share: nobody saturates, T = B div n
    assert(alloc(9L) == Map("A" -> ((10L, 3L)), "B" -> ((50L, 3L)),
      "C" -> ((100L, 3L))))
  }

  test("fairShareSample: each group honors ITS budget with the crossing-doc rule") {
    val df = (Seq.tabulate(10)(i => (s"a$i", "A", 1L)) ++
      Seq.tabulate(5)(i => (s"b$i", "B", 10L)) ++
      Seq.tabulate(10)(i => (s"c$i", "C", 10L))).toDF("id", "grp", "w")
    val sample = Freq.fairShareSample(df, col("w"), 100L, "grp", "id").cache()
    // every kept row satisfies the exclusive-prefix rule vs its own
    // group's budget (the budget column carried through)
    assert(sample.where(col("cum") - col("w") >= col("budget")).isEmpty)
    // saturated A keeps everything; unsaturated B/C stop at the first
    // doc crossing 45: kept weight in [budget, budget + max w)
    val kept = sample.groupBy("group").agg(sum("w").as("kw"))
      .as[(String, Long)].collect().toMap
    assert(kept("A") == 10L)
    Seq("B", "C").foreach { g =>
      assert(kept(g) >= 45L && kept(g) < 45L + 10L, s"$g kept ${kept(g)}")
    }
    // kept rows are input rows, and the selection is deterministic
    assert(sample.select("id", "group", "w").exceptAll(
      df.select(col("id"), col("grp").as("group"), col("w"))
        .join(sample.select("id"), Seq("id"), "left_semi")).isEmpty)
    val again = Freq.fairShareSample(df, col("w"), 100L, "grp", "id")
    assert(sample.exceptAll(again).isEmpty && again.exceptAll(sample).isEmpty)
    sample.unpersist()
  }

  test("quantileThresholdFilter: exact rank, value-based keep, FP integer landing") {
    // group X: values 1..10, q=0.2 -> rank ceil(2)=2 -> thr=2, keep 9
    // group Y: 55 rows 1..55 -> 0.2*55 = 11 EXACTLY; double arithmetic
    // would ceil(11.000000000000002)=12 (thr 12, keep 44) — decimal
    // rank keeps thr=11 and 45 rows (the stratifiedSample FP lesson)
    val df = ((1 to 10).map(i => (s"x$i", "X", i.toLong)) ++
      (1 to 55).map(i => (s"y$i", "Y", i.toLong))).toDF("id", "grp", "v")
    val kept = Freq.quantileThresholdFilter(df, col("v"), "grp", "id", 0.2)
    val sizes = kept.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("X" -> 9L, "Y" -> 45L), sizes.toString)
    val thrs = kept.select("grp", "_thr").distinct()
      .as[(String, Long)].collect().toMap
    assert(thrs == Map("X" -> 2L, "Y" -> 11L), thrs.toString)
    // kept rows are exactly the at/above-threshold input rows
    assert(kept.select("id", "grp", "v").exceptAll(df.where(
      (col("grp") === "X" && col("v") >= 2) ||
      (col("grp") === "Y" && col("v") >= 11))).isEmpty)
  }

  test("histogram + frequentItems threshold semantics") {
    val xs = Seq.fill(60)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(10)(3L)
    val freq = Freq.frequentItems(streamDF(xs), 0.25).as[(Long, Long)].collect().toMap
    assert(freq == Map(1L -> 60L, 2L -> 30L)) // 3 has 10 < 25
  }

  test("annotate flags true-frequent membership") {
    val est = Seq((1L, 5L), (9L, 4L)).toDF("item", "cnt")
    val tf  = Seq(Tuple1(1L)).toDF("item")
    val ann = Freq.annotate(est, tf).select("item", "is_true")
      .as[(Long, Boolean)].collect().toMap
    assert(ann == Map(1L -> true, 9L -> false))
  }

  test("reservoirLocal: size == min(m, n), subset of stream") {
    val rnd = new scala.util.Random(1)
    val xs = (1L to 100L)
    val r = Freq.reservoirLocal(xs.iterator, 15, rnd)
    assert(r.length == 15 && r.forall(xs.contains))
    assert(Freq.reservoirLocal((1L to 5L).iterator, 15, rnd).length == 5)
  }

  test("reservoirSample: deterministic uniform m-subset") {
    val xs = (0L until 500L).map(i => i % 37)
    val df = streamDF(xs)
    val s1 = Freq.reservoirSample(df, 20, 42L).as[(Long, Long)].collect().sortBy(_._1)
    val s2 = Freq.reservoirSample(df, 20, 42L).as[(Long, Long)].collect().sortBy(_._1)
    assert(s1.toSeq == s2.toSeq)          // deterministic under a seed
    assert(s1.length == 20)
    assert(s1.forall { case (ord, item) => xs(ord.toInt) == item })
    val s3 = Freq.reservoirSample(df, 20, 43L).as[(Long, Long)].collect().sortBy(_._1)
    assert(s3.toSeq != s1.toSeq)          // seed changes the draw
  }

  test("reservoirSample distribution: element inclusion ~ m/n over seeds") {
    val df = streamDF((0L until 200L))
    val hits = Array.fill(200)(0)
    (0 until 60).foreach { seed =>
      Freq.reservoirSample(df, 20, seed.toLong).select("ord")
        .as[Long].collect().foreach(o => hits(o.toInt) += 1)
    }
    // E[hits] = 60 * 20/200 = 6; loose 3-sigma-ish band
    val mean = hits.sum.toDouble / hits.length
    assert(math.abs(mean - 6.0) < 0.5, s"mean inclusion $mean")
    assert(hits.max <= 20 && hits.min >= 0)
  }

  test("tokenBudgetSample: two-level prefix sum == single window; budget laws") {
    import org.apache.spark.sql.expressions.Window
    // 3 groups with lumpy weights; group "c" total < budget (kept whole)
    val df = (1L to 200L).map(i =>
        (if (i % 7 == 0) "c" else if (i % 2 == 0) "b" else "a",
         i, 1L + i % 17)).toDF("g", "id", "w")
    val budget = 150L
    // reference: ONE window per group, inclusive running sum
    val w1 = Window.partitionBy("g").orderBy(md5(col("id").cast("string")), col("id"))
    val ref = df.withColumn("cum", sum(col("w")).over(w1))
      .where(col("cum") - col("w") < budget)
      .select(col("g").as("group"), col("id"), col("w"), col("cum"))
    for (oc <- Seq(1, 2)) {
      val got = Freq.tokenBudgetSample(df, col("w"), budget, "g", "id", orderChars = oc)
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"orderChars=$oc diverged from the single-window reference")
    }
    val got = Freq.tokenBudgetSample(df, col("w"), budget, "g", "id")
      .select("group", "id", "w", "cum").as[(String, Long, Long, Long)].collect()
    // exclusive-prefix rule: weight BEFORE each kept doc is < budget
    assert(got.forall { case (_, _, w, cum) => cum - w < budget })
    val totals = df.groupBy("g").agg(sum("w").as("t"))
      .as[(String, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (g, rows) =>
      val kept = rows.map(_._3).sum
      // kept weight is the least prefix total >= budget (or the whole
      // group when it cannot reach the budget)
      assert(kept == rows.map(_._4).max, s"$g: cum bookkeeping broken")
      if (totals(g) >= budget) {
        val lastW = rows.maxBy(_._4)._3
        assert(kept >= budget && kept - lastW < budget,
          s"$g: kept $kept not the least prefix total >= $budget")
      } else assert(kept == totals(g), s"$g: under-budget group must be kept whole")
    }
    assert(got.map(_._1).toSet == Set("a", "b", "c"), "every group represented")
  }

  test("stickyLocal: tracked items count every later occurrence") {
    // p = 1 => every item tracked from first occurrence => exact histogram
    val rnd = new scala.util.Random(2)
    val xs = Seq(5L, 5L, 7L, 5L, 7L, 9L)
    val tab = Freq.stickyLocal(xs.iterator, 1.0, rnd)
    assert(tab == Map(5L -> 3L, 7L -> 2L, 9L -> 1L))
    // p = 0 => nothing ever tracked
    assert(Freq.stickyLocal(xs.iterator, 0.0, rnd).isEmpty)
  }

  test("stickySample: p=1 equals exact histogram; p=0 empty; deterministic") {
    val xs = (0L until 300L).map(i => i % 7)
    val df = streamDF(xs)
    val full = Freq.stickySample(df, 1.0, 42L).as[(Long, Long)].collect().toMap
    val hist = Freq.histogram(df).as[(Long, Long)].collect().toMap
    assert(full == hist)
    assert(Freq.stickySample(df, 0.0, 42L).count() == 0)
    val a = Freq.stickySample(df, 0.3, 7L).as[(Long, Long)].collect().toSet
    val b = Freq.stickySample(df, 0.3, 7L).as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("stickySample counts suffix after first successful coin") {
    // with any 0<p<1 and a single item, cnt must be n - t0 where t0 is
    // the first successful ord; verify internal consistency: cnt <= n and
    // the sticky guarantee: items with true freq >= phi*n appear with
    // high prob when p is large enough
    val n = 400
    val xs = Seq.fill(n)(1L)
    val df = streamDF(xs)
    val res = Freq.stickySample(df, 0.2, 5L).as[(Long, Long)].collect()
    assert(res.length == 1)
    assert(res(0)._2 >= 1 && res(0)._2 <= n)
  }

  test("sticky guarantee (distributional): all phi-frequent found at eps, delta") {
    val phi = 0.2; val eps = 0.1; val delta = 0.1
    // stream: item 1 x 300, item 2 x 250, tail 450 distinct singletons
    val xs = Seq.fill(300)(1L) ++ Seq.fill(250)(2L) ++ (100L until 550L)
    val n = xs.length
    val p = math.min(1.0, Freq.stickyRate(phi, eps, delta) / n)
    var ok = 0
    (0 until 20).foreach { seed =>
      val est = Freq.stickyFrequent(
        Freq.stickySample(streamDF(xs), p, seed.toLong), phi, eps, n)
        .select("item").as[Long].collect().toSet
      if (Set(1L, 2L).subsetOf(est)) ok += 1
    }
    assert(ok >= 18, s"sticky recovered heavy hitters in $ok/20 runs") // >= 1-delta
  }

  test("weightedSample: size/subset/determinism; n <= m returns all positive-weight rows") {
    val items = (1L to 300L).map(i => (i, (i % 7 + 1).toDouble)).toDF("id", "w")
    val s1 = Freq.weightedSample(items, 50, 9L).as[(Long, Double)].collect()
    val s2 = Freq.weightedSample(items, 50, 9L).as[(Long, Double)].collect()
    assert(s1.length == 50 && s1.toSeq == s2.toSeq)
    val src = items.as[(Long, Double)].collect().toSet
    assert(s1.forall(src))
    val tiny = Freq.weightedSample(items.limit(10), 50, 9L).collect()
    assert(tiny.length == 10)
  }

  test("weightedSample: heavier items are sampled far more often (distributional)") {
    // 500 light (w=1) + 500 heavy (w=10); m=100 of 1000. Expected
    // heavy inclusion ≈ 10x light per unit item until saturation.
    val items = ((1L to 500L).map(i => (i, 1.0)) ++ (501L to 1000L).map(i => (i, 10.0)))
      .toDF("id", "w")
    var heavy = 0L; var light = 0L
    for (seed <- 1 to 15) {
      val ids = Freq.weightedSample(items, 100, seed.toLong)
        .select("id").as[Long].collect()
      heavy += ids.count(_ > 500L)
      light += ids.count(_ <= 500L)
    }
    assert(heavy + light == 1500L)
    assert(heavy.toDouble / math.max(1L, light) > 3.0,
      s"heavy/light = $heavy/$light — weighting had no effect?")
  }

  test("weightedSample: non-positive weight fails loudly") {
    val bad = Seq((1L, 1.0), (2L, 0.0)).toDF("id", "w")
    val e = intercept[Exception] { Freq.weightedSample(bad, 5, 1L).count() }
    assert(msgs(e).exists(_.contains("non-positive or null weight")), e.getMessage)
  }

  test("weightedSample: null weight fails loudly and names nullness") {
    val bad = Seq((1L, Some(1.0)), (2L, Option.empty[Double])).toDF("id", "w")
    val e = intercept[Exception] { Freq.weightedSample(bad, 5, 1L).count() }
    assert(msgs(e).exists(m =>
      m.contains("non-positive or null weight") && m.contains("null")), e.getMessage)
  }
}
