package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** Range join: hand-checkable edges (hi exclusive, bucket-boundary
  * points, intervals spanning many buckets), equivalence with the
  * naive theta-join twin on seeded random data, and the plan guard
  * (equi-join on the bucket key, never a nested-loop join). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("edges: hi exclusive, boundary points, multi-bucket and sub-bucket intervals") {
    val pts = Seq((0.0, 1L), (5.0, 2L), (9.999, 3L), (10.0, 4L), (42.0, 5L))
      .toDF("v", "pid")
    val ivs = Seq((0.0, 10.0, 10L), (9.0, 9.5, 11L), (5.0, 50.0, 12L))
      .toDF("lo", "hi", "iid")
    val got = RangeJoin.pointInInterval(pts, ivs, bucketWidth = 4.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val exp = Set(
      (1L, 10L), (2L, 10L), (3L, 10L), // v=10.0 excluded (hi exclusive)
      (2L, 12L), (3L, 12L), (4L, 12L), (5L, 12L))
    assert(got == exp)
  }

  test("equivalence with the naive theta-join twin on seeded random data") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(400)(i => (rnd.nextDouble() * 100, i.toLong))
      .toDF("v", "pid").repartition(8)
    val ivs = Seq.tabulate(60) { i =>
      val lo = rnd.nextDouble() * 95
      (lo, lo + rnd.nextDouble() * 20, (1000 + i).toLong)
    }.toDF("lo", "hi", "iid").repartition(4)
    val got = RangeJoin.pointInInterval(pts, ivs, bucketWidth = 7.0)
      .select("pid", "iid").as[(Long, Long)].collect()
    val naive = pts.join(ivs, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect()
    // sets equal AND no duplicate pairs from multi-bucket intervals
    assert(got.length == naive.length, "pair multiset size diverged (duplicates?)")
    assert(got.toSet == naive.toSet)
  }

  test("a pathological giant interval fails loudly instead of exploding") {
    val pts = Seq((1.0, 1L)).toDF("v", "pid")
    // 1e9 buckets at width 1.0 — would be a billion exploded rows
    val ivs = Seq((0.0, 1e9, 10L)).toDF("lo", "hi", "iid")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pts, ivs, bucketWidth = 1.0).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("spans more than")), e.getMessage)
    // the same interval passes with an explicit higher cap
    assert(RangeJoin.pointInInterval(pts, ivs, 1e6, maxBucketsPerInterval = 2000L)
      .count() == 1)
  }

  test("plan: equi-join on the bucket key, no nested-loop join") {
    val pts = Seq((1.0, 1L)).toDF("v", "pid")
    val ivs = Seq((0.0, 2.0, 10L)).toDF("lo", "hi", "iid")
    val p = RangeJoin.pointInInterval(pts, ivs, 1.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), s"range join degenerated:\n${p.take(600)}")
    assert(p.contains("Join") || p.contains("join"), p.take(400))
  }
}
