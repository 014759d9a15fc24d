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
    assert(msgs(e).exists(_.contains("spans more than")), e.getMessage)
    // the same interval passes with an explicit higher cap
    assert(RangeJoin.pointInInterval(pts, ivs, 1e6, maxBucketsPerInterval = 2000L)
      .count() == 1)
  }

  test("overlap: pair sharing many buckets emits exactly once (canonical bucket)") {
    // both intervals span buckets 0..99 at width 1.0 — 100 shared
    // buckets, one canonical (where the overlap starts) → one row
    val l = Seq((0.0, 100.0, 1L)).toDF("lo", "hi", "aid")
    val r = Seq((0.5, 99.5, 2L), (200.0, 300.0, 3L)).toDF("lo2", "hi2", "bid")
    val got = RangeJoin.intervalOverlap(l, r, bucketWidth = 1.0)
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L)), got.mkString(","))
  }

  test("overlap: equivalence with the naive theta twin, incl. touch-only non-matches") {
    val rnd = new scala.util.Random(13)
    val l = Seq.tabulate(150) { i =>
      val lo = rnd.nextDouble() * 100
      (lo, lo + rnd.nextDouble() * 25, i.toLong)
    }.toDF("lo", "hi", "aid").repartition(8)
    val r = Seq.tabulate(150) { i =>
      val lo = rnd.nextDouble() * 100
      (lo, lo + rnd.nextDouble() * 25, (1000 + i).toLong)
    }.toDF("lo2", "hi2", "bid").repartition(4)
    // width much smaller than typical span → pairs share many buckets
    val got = RangeJoin.intervalOverlap(l, r, bucketWidth = 2.0)
      .select("aid", "bid").as[(Long, Long)].collect()
    val naive = l.join(r, col("lo") < col("hi2") && col("lo2") < col("hi"))
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(got.length == naive.length, "pair multiset size diverged (duplicates?)")
    assert(got.toSet == naive.toSet)
  }

  test("overlap: key-scoped self-join with renamed sides") {
    val sess = Seq(
      (7L, 0.0, 10.0, 1L), (7L, 5.0, 15.0, 2L), (7L, 20.0, 30.0, 3L),
      (8L, 0.0, 10.0, 4L), (9L, 5.0, 15.0, 5L)) // users 8,9 overlap in time but not key
      .toDF("user_id", "lo", "hi", "sid")
    val left = sess.select(col("user_id"), col("lo"), col("hi"), col("sid").as("a"))
    val right = sess.select(col("user_id"), col("lo").as("lo2"),
      col("hi").as("hi2"), col("sid").as("b"))
    val got = RangeJoin.intervalOverlap(left, right, 4.0, keys = Seq("user_id"))
      .where(col("a") < col("b"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("overlap: a pathological giant interval fails loudly") {
    val l = Seq((0.0, 1e9, 1L)).toDF("lo", "hi", "aid")
    val r = Seq((1.0, 2.0, 2L)).toDF("lo2", "hi2", "bid")
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(l, r, bucketWidth = 1.0).count()
    }
    assert(msgs(e).exists(_.contains("spans more than")), e.getMessage)
  }

  test("overlap: misuse guards — missing key column, payload collision") {
    val l = Seq((0.0, 1.0, 1L)).toDF("lo", "hi", "aid")
    val r = Seq((0.0, 1.0, 2L)).toDF("lo2", "hi2", "bid")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, r, 1.0, keys = Seq("user_id"))
    }
    val rClash = Seq((0.0, 1.0, 2L)).toDF("lo2", "hi2", "aid")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, rClash, 1.0)
    }
  }

  test("overlap plan: equi-join on (keys, bucket), no nested-loop join") {
    val l = Seq((7L, 0.0, 1.0, 1L)).toDF("user_id", "lo", "hi", "aid")
    val r = Seq((7L, 0.0, 1.0, 2L)).toDF("user_id", "lo2", "hi2", "bid")
    val p = RangeJoin.intervalOverlap(l, r, 1.0, keys = Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), s"overlap join degenerated:\n${p.take(600)}")
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
