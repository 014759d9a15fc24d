package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range (interval) join — the second join shape Spark's
  * optimizer has no native strategy for: `point.v ∈ [lo, hi)` plans as
  * BroadcastNestedLoopJoin (|L|×|R| comparisons) when written as a raw
  * theta-join. Same family as the engine's 2-D distance join
  * (`Outliers.neighborCounts`): quantize to a grid so the predicate
  * becomes an EQUI-join on the bucket key plus a residual filter.
  *
  * Buckets of width `bucketWidth`: a point falls in exactly one
  * bucket; an interval explodes to every bucket it overlaps. A
  * (point, interval) pair can therefore meet on at most ONE bucket —
  * no post-join dedup. Cost ∝ Σ interval-span/width + matches, never
  * |L|×|R|; both sides shuffle on the bucket key, so matches stay
  * co-located on a cluster. Pick `bucketWidth` near the typical
  * interval length: much smaller explodes intervals into many buckets,
  * much larger funnels unrelated points into shared buckets (both
  * still correct — the residual filter decides — just wasteful; a
  * pathological giant interval is bounded by `maxBucketsPerInterval`,
  * enforced at runtime with a loud error, the same knob as grid
  * side-length in the outlier join).
  */
object RangeJoin {

  /** `points` must carry a double column `v` (+ payload); `intervals`
    * must carry double columns `lo`, `hi` (+ payload); payload names
    * must not collide. Returns every (point, interval) row pair with
    * `lo ≤ v < hi` — inner semantics, all columns from both sides.
    *
    * An interval spanning more than `maxBucketsPerInterval` buckets
    * fails the job with a clear message instead of silently exploding
    * to millions of rows (or tripping Spark's sequence-length limit
    * with an opaque error) — mis-sized `bucketWidth` is a planning
    * bug the caller must see. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty, s"column collision: ${collisions.mkString(",")}")
    val pB = points.withColumn("_b", floor(col("v") / bucketWidth))
    val b0 = floor(col("lo") / bucketWidth).cast("long")
    val b1 = floor(col("hi") / bucketWidth).cast("long")
    // hi is exclusive but sequence() is inclusive — the extra edge
    // bucket is harmless (residual filter rejects v == hi)
    val iB = intervals.withColumn("_b",
      explode(when(b1 - b0 < lit(maxBucketsPerInterval), sequence(b0, b1))
        .otherwise(raise_error(format_string(
          s"RangeJoin: interval [%s, %s) spans more than $maxBucketsPerInterval " +
            s"buckets at bucketWidth=$bucketWidth — widen bucketWidth or raise " +
            "maxBucketsPerInterval", col("lo"), col("hi"))))))
    pB.join(iB, Seq("_b"))
      .where(col("v") >= col("lo") && col("v") < col("hi"))
      .drop("_b")
  }
}
