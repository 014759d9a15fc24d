package graft.ops

import graft.Point
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** (D,M)-outlier detection: exact and grid-approximate.
  *
  * Reference semantics (`HWK_1/G029HW1.py`):
  *  - Exact (`ExactOutliers`, lines 16-49): for each point, count the
  *    points at distance ≤ D (the point itself counts, init 1); a
  *    (D,M)-outlier has count ≤ M. Output the outlier count and the
  *    first K outliers by non-decreasing neighbor count.
  *  - Approximate (`MRApproxOutliers`, lines 96-120): on the
  *    side = D/(2√2) grid, a cell's points are *sure* outliers when
  *    N7 ≤ M, *uncertain* when N3 ≤ M < N7; also report the K
  *    smallest non-empty cells.
  *
  * The reference's exact path is a driver-side O(N²) loop capped at
  * N ≤ 200 000 (`HWK_1/G029HW1.py:18-32,155`). Here the all-pairs
  * distance theta-join is rewritten as a grid-bucketed EQUI-join
  * (side = D, 3×3 neighbor buckets): each point is joined only with
  * points of the 9 surrounding buckets, then the exact distance
  * predicate filters. Catalyst plans a shuffled hash / sort-merge join
  * on the bucket key, so the same query runs on 60 k points locally
  * and on 10⁹ points on a cluster — no driver collect anywhere.
  */
object Outliers {

  private def distSqCol(x1: Column, y1: Column, x2: Column, y2: Column): Column = {
    val dx = x1 - x2; val dy = y1 - y2
    dx * dx + dy * dy
  }

  /** Per-point neighbor counts within distance D.
    *
    * Input: points with unique `id`, coords `x`, `y`.
    * Output: `id, cnt` where cnt includes the point itself (reference
    * init `counter = 1`, `HWK_1/G029HW1.py:24`).
    *
    * Self-join is bucketed on a side-D grid: a disc of radius D around
    * any point only intersects the 3×3 neighborhood of its bucket, so
    * exploding 9 offsets on the probe side makes the join an equi-join
    * on (bi, bj) with an exact distance post-filter.
    */
  def neighborCounts(points0: DataFrame, d: Double): DataFrame = {
    // single-file scans are one task — fan the pair-generation out
    // (the reference's explicit repartition(L), HWK_1/G029HW1.py:148).
    // NOT cached, deliberately (r20 A/B): caching the bucketed points
    // to spare the 3× upstream recompute made every variant unstable
    // (4.7 s stable uncached vs 11–68 s cached — the cached blocks
    // compete with the ~30M-row pair join's execution memory and the
    // eviction/recompute thrash dwarfs the saved scans); the upstream
    // projection is a cheap pruned scan + one per-id window.
    val bucketed = points0
      .repartition(points0.sparkSession.sparkContext.defaultParallelism)
      .withColumn("bi", floor(col("x") / lit(d)))
      .withColumn("bj", floor(col("y") / lit(d)))
    val rhs = bucketed.select(col("bi"), col("bj"), col("id").as("id2"),
      col("x").as("x2"), col("y").as("y2"))
    // each unordered pair is generated exactly ONCE (half-plane trick,
    // 2x fewer candidates than the full 3x3 probe): the probe explodes
    // 5 offsets — (0,0) pairs only with id<id2 inside the cell, and
    // {(1,0),(1,1),(0,1),(-1,1)} cover each cell adjacency once.
    // Single equi-join; the same/cross distinction is a residual
    // predicate, so there is one probe shuffle, not two.
    val offs5 = array((Seq((0, 0), (1, 0), (1, 1), (0, 1), (-1, 1)).map { case (di, dj) =>
      struct(lit(di).as("di"), lit(dj).as("dj"), lit(di == 0 && dj == 0).as("same"))
    }): _*)
    val probe = bucketed
      .select(col("id"), col("x"), col("y"), explode(offs5).as("off"),
        col("bi"), col("bj"))
      .select(col("id"), col("x"), col("y"), col("off.same").as("same"),
        (col("bi") + col("off.di")).as("bi"),
        (col("bj") + col("off.dj")).as("bj"))
    // SHUFFLE_HASH, pinned: the planner's size estimates here put the
    // 5×-exploded probe under the broadcast threshold and built a
    // multi-million-row broadcast hash relation (r20 A/B: stable-ish
    // uncached, catastrophically GC-bound once the inputs were
    // cached). Hash-partitioning both sides on the cell key is the
    // shape that survives any scale — no driver-sized build, no
    // per-key sort (SMJ would re-sort the dense cells), AQE splits a
    // skewed cell at runtime.
    val pairs = probe
      .join(rhs.hint("shuffle_hash"), Seq("bi", "bj"))
      .where((!col("same") || col("id") < col("id2")) &&
        distSqCol(col("x"), col("y"), col("x2"), col("y2")) <= lit(d * d))
    // scatter each surviving pair to both endpoints, count, then +1
    // for the self-pair; points with no neighbor re-enter via left join
    val counts = pairs
      .select(explode(array(col("id"), col("id2"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("npairs"))
    bucketed.select(col("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id"), (coalesce(col("npairs"), lit(0L)) + 1L).as("cnt"))
  }

  /** Exact (D,M)-outliers: points with ≤ M neighbors (self included),
    * first K by (cnt, id) — the id tiebreak replaces the reference's
    * input-order-dependent stable sort (`HWK_1/G029HW1.py:45-49`). */
  def exactOutliers(points: DataFrame, d: Double, m: Int, k: Int): DataFrame =
    neighborCounts(points, d)
      .where(col("cnt") <= lit(m))
      .orderBy(col("cnt"), col("id"))
      .limit(k)

  /** Driver-side O(N²) twin of the reference's `ExactOutliers`
    * (`HWK_1/G029HW1.py:16-49`) — used in tests to cross-validate the
    * distributed formulation on small inputs. */
  def exactOutliersLocal(pts: Array[Point], d: Double, m: Int): Array[(Int, Int)] = {
    val n = pts.length
    val counts = Array.fill(n)(1)
    val d2 = d * d
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (Point.distSq(pts(i), pts(j)) <= d2) { counts(i) += 1; counts(j) += 1 }
        j += 1
      }
      i += 1
    }
    (0 until n).filter(counts(_) <= m).map(i => (i, counts(i))).sortBy(t => (t._2, t._1)).toArray
  }

  /** Cell-level stats of MRApproxOutliers: `ci, cj, sz, n3, n7`. */
  def cellStats(points: DataFrame, d: Double): DataFrame =
    Grid.n3n7(Grid.cellHistogram(points, Grid.sideFor(d)))

  /** The two scalars of MRApproxOutliers (`HWK_1/G029HW1.py:112-113`):
    * sure = Σ sz where N7 ≤ M; uncertain = Σ sz where N3 ≤ M < N7. */
  def approxOutlierCounts(points: DataFrame, d: Double, m: Int): DataFrame =
    cellStats(points, d).agg(
      coalesce(sum(when(col("n7") <= m, col("sz"))), lit(0L)).as("sure"),
      coalesce(sum(when(col("n3") <= m && col("n7") > m, col("sz"))), lit(0L)).as("uncertain"))

  /** First K non-empty cells by non-decreasing size
    * (`HWK_1/G029HW1.py:114-120`), (ci,cj) tiebreak for determinism. */
  def smallestCells(points: DataFrame, d: Double, k: Int): DataFrame =
    Grid.cellHistogram(points, Grid.sideFor(d))
      .orderBy(col("sz"), col("ci"), col("cj"))
      .limit(k)
}
