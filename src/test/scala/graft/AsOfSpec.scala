package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** As-of join: hand-checkable cases + equivalence with the naive
  * range-theta-join twin on seeded random data (inclusive and strict),
  * and the no-quadratic-join plan shape. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def naive(left: org.apache.spark.sql.DataFrame,
                    right: org.apache.spark.sql.DataFrame,
                    inclusive: Boolean): Map[Long, Long] = {
    // independent formulation: theta-join + argmax by (t, rid)
    val cond = if (inclusive) col("rt") <= col("t") else col("rt") < col("t")
    left.join(right.select(col("k"), col("t").as("rt"), col("rid")), Seq("k"))
      .where(cond)
      .groupBy("lid")
      .agg(max_by(col("rid"), struct(col("rt"), col("rid"))).as("rid"))
      .as[(Long, Long)].collect().toMap
  }

  test("hand-checkable: latest prior row, tie on time -> max rid, strict excludes equal t") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 15L, 3L), (2L, 6L, 4L))
      .toDF("k", "t", "rid")
    val inc = AsOf.asOfJoin(left, right)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    // lid 100 at t=10: inclusive ties at t=10 -> max rid 9
    assert(inc(100L).contains(9L))
    // lid 101 at t=20: latest right is t=15 -> rid 3
    assert(inc(101L).contains(3L))
    // lid 102 at t=5: no right row at or before 5 -> null (left outer)
    assert(inc(102L).isEmpty)
    val strict = AsOf.asOfJoin(left, right, inclusive = false)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    // strict: t=10 right rows no longer admissible for lid 100
    assert(strict(100L).isEmpty)
    assert(strict(101L).contains(3L))
  }

  test("equivalence with the naive theta-join twin on seeded random data") {
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(500)(i => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid").repartition(8)
    val right = Seq.tabulate(300)(i => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, (1000 + i).toLong))
      .toDF("k", "t", "rid").repartition(8)
    for (inclusive <- Seq(true, false)) {
      val got = AsOf.asOfJoin(left, right, inclusive)
        .where(col("rid").isNotNull)
        .select("lid", "rid").as[(Long, Long)].collect().toMap
      assert(got == naive(left, right, inclusive), s"diverged at inclusive=$inclusive")
    }
  }

  test("tolerance: stale matches null out; equivalence with a bounded naive twin") {
    val left = Seq((1L, 100L, 100L), (1L, 200L, 101L)).toDF("k", "t", "lid")
    val right = Seq((1L, 95L, 7L)).toDF("k", "t", "rid")
    val got = AsOf.asOfJoin(left, right, tolerance = Some(10L))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(got(100L).contains(7L)) // 5 ticks stale, within 10
    assert(got(101L).isEmpty)      // 105 ticks stale -> nulled
    // seeded equivalence: naive twin with the staleness bound applied
    val rnd = new scala.util.Random(5)
    val l = Seq.tabulate(400)(i => (rnd.nextInt(10).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "t", "lid").repartition(8)
    val r = Seq.tabulate(250)(i => (rnd.nextInt(10).toLong, rnd.nextInt(500).toLong, (1000 + i).toLong))
      .toDF("k", "t", "rid").repartition(8)
    val tol = 40L
    val gotBig = AsOf.asOfJoin(l, r, tolerance = Some(tol))
      .where(col("rid").isNotNull)
      .select("lid", "rid").as[(Long, Long)].collect().toMap
    val naiveBig = l.join(r.select(col("k"), col("t").as("rt"), col("rid")), Seq("k"))
      .where(col("rt") <= col("t") && col("t") - col("rt") <= tol)
      .groupBy("lid")
      .agg(max_by(col("rid"), struct(col("rt"), col("rid"))).as("rid"))
      .as[(Long, Long)].collect().toMap
    assert(gotBig == naiveBig)
  }

  test("forward: earliest at-or-after row, strict, tolerance, naive twin equivalence") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 25L, 3L)).toDF("k", "t", "rid")
    val fwd = AsOf.asOfJoin(left, right, forward = true)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(fwd(100L).contains(9L)) // ties at t=10 -> max rid
    assert(fwd(101L).contains(3L)) // next at t=25
    assert(fwd(102L).isEmpty)      // nothing after 30
    val strict = AsOf.asOfJoin(left, right, inclusive = false, forward = true)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(strict(100L).contains(3L)) // t=10 rows excluded -> next is 25
    val tol = AsOf.asOfJoin(left, right, forward = true, tolerance = Some(3L))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(tol(100L).contains(9L))  // 0 ahead, within 3
    assert(tol(101L).isEmpty)       // 5 ahead > 3 -> nulled
    // seeded equivalence with the naive forward twin
    val rnd = new scala.util.Random(11)
    val l = Seq.tabulate(400)(i => (rnd.nextInt(10).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "t", "lid").repartition(8)
    val r = Seq.tabulate(250)(i => (rnd.nextInt(10).toLong, rnd.nextInt(500).toLong, (1000 + i).toLong))
      .toDF("k", "t", "rid").repartition(8)
    val got = AsOf.asOfJoin(l, r, forward = true)
      .where(col("rid").isNotNull)
      .select("lid", "rid").as[(Long, Long)].collect().toMap
    val naiveFwd = l.join(r.select(col("k"), col("t").as("rt"), col("rid")), Seq("k"))
      .where(col("rt") >= col("t"))
      .groupBy("lid")
      // earliest rt; at equal rt the max rid — mirror the contract
      .agg(max_by(col("rid"), struct((-col("rt")).as("nrt"), col("rid"))).as("rid"))
      .as[(Long, Long)].collect().toMap
    assert(got == naiveFwd)
  }

  test("tolerance guards: negative tolerance and non-numeric t are rejected") {
    val l = Seq((1L, 10L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, 5L, 2L)).toDF("k", "t", "rid")
    intercept[IllegalArgumentException] {
      AsOf.asOfJoin(l, r, tolerance = Some(-1L))
    }
    val lt = Seq((1L, "2024-01-01", 1L)).toDF("k", "t", "lid")
      .withColumn("t", col("t").cast("timestamp"))
    intercept[IllegalArgumentException] {
      AsOf.asOfJoin(lt, r, tolerance = Some(10L))
    }
  }

  test("hot key: 20k x 20k rows on ONE key completes linearly (naive would be 400M pairs)") {
    // expected answer from a driver-side two-pointer merge over the
    // sorted arrays — O(n log n), independent of the operator
    val rnd = new scala.util.Random(11)
    val lts = Array.fill(20000)(rnd.nextInt(1000000).toLong).sorted
    val rts = Array.fill(20000)(rnd.nextInt(1000000).toLong)
    val rSorted = rts.zipWithIndex.map { case (t, i) => (t, (5000000 + i).toLong) }
      .sortBy(x => (x._1, x._2))
    val left = lts.zipWithIndex.map { case (t, i) => (1L, t, i.toLong) }.toSeq
      .toDF("k", "t", "lid").repartition(8)
    val right = rSorted.map { case (t, rid) => (1L, t, rid) }.toSeq
      .toDF("k", "t", "rid").repartition(8)
    val got = AsOf.asOfJoin(left, right)
      .select("lid", "rid").as[(Long, Option[Long])].collect()
      .map { case (l, r) => l -> r }.toMap
    // two-pointer: for each left t (ascending), advance over right
    // rows with t' <= t keeping the (t', rid)-max — inclusive as-of
    var j = 0
    var best: Option[Long] = None
    val expected = lts.zipWithIndex.map { case (t, i) =>
      while (j < rSorted.length && rSorted(j)._1 <= t) { best = Some(rSorted(j)._2); j += 1 }
      i.toLong -> best
    }.toMap
    assert(got.size == 20000)
    assert(got == expected, "hot-key as-of diverged from the two-pointer twin")
  }

  test("guards: internal-column collisions and non-integral rid are rejected") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 5L, 7L)).toDF("k", "t", "rid")
    // payload named like a working column would be silently clobbered
    val eL = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left.withColumnRenamed("lid", "_m"), right)
    }
    assert(eL.getMessage.contains("_m"))
    val eR = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, right.withColumn("_side", lit(1)))
    }
    assert(eR.getMessage.contains("_side"))
    // a string rid would cast to null and break the deterministic tie-break
    val eRid = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, right.withColumn("rid", lit("x7")))
    }
    assert(eRid.getMessage.contains("integral"))
  }

  test("plan: one shuffle window, no join node (never per-key quadratic)") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 5L, 7L)).toDF("k", "t", "rid")
    val p = AsOf.asOfJoin(left, right).queryExecution.executedPlan.toString
    assert(p.contains("Window"), p.take(400))
    assert(!p.toLowerCase.contains("join"), s"as-of must not plan a join:\n${p.take(600)}")
  }
}
