package graft

import graft.functions.MisraGriesAgg

/** Misra-Gries Aggregator: laws on skewed multi-partition data (the
  * merge path), plus the exact single-counter degenerate case. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("laws hold across a 16-partition merge on skewed data; heavy item covered") {
    val xs: Seq[Long] = (0 until 20000).map(i => (i % 97).toLong) ++ Seq.fill(5000)(7L)
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = xs.size.toLong
    val k = 10
    val out = xs.toDF("item").repartition(16).as[Long]
      .select(new MisraGriesAgg(k).toColumn.name("mg"))
      .head().toSeq
      .map(e => (e.item, e.est, e.err, e.n))
    assert(out.nonEmpty && out.size <= k)
    val err = out.head._3
    assert(out.forall(_._4 == n), "n must equal the stream length")
    assert(err <= n / (k + 1), s"error bound $err exceeds n/(k+1)")
    out.foreach { case (item, est, e, _) =>
      val t = truth(item)
      assert(est <= t && t <= est + e, s"undercount law broken for $item: est=$est true=$t err=$e")
    }
    // coverage: item 7 has true count 5000 + 20000/97-ish ≈ 5206 > err
    val summarized = out.map(_._1).toSet
    truth.foreach { case (item, t) =>
      if (t > err) assert(summarized(item), s"heavy item $item (true=$t > err=$err) missing")
    }
    assert(summarized(7L))
  }

  test("k >= distinct items degenerates to the exact histogram (err 0)") {
    val xs: Seq[Long] = Seq(1L, 1L, 2L, 3L, 3L, 3L)
    val out = xs.toDF("item").repartition(3).as[Long]
      .select(new MisraGriesAgg(8).toColumn.name("mg"))
      .head().toSeq
      .map(e => (e.item, e.est, e.err))
    assert(out.map(t => (t._1, t._2)).toMap == Map(1L -> 2L, 2L -> 1L, 3L -> 3L))
    assert(out.forall(_._3 == 0L), "no decrements can occur when counters never overflow")
  }
}
