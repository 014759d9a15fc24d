package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed as-of (point-in-time) join — an operator Spark's
  * DataFrame API lacks natively (the reference engine has nothing like
  * it either; this is part of the training-pipeline breadth, e.g.
  * "attach the latest prior model-score / click / price to every
  * event").
  *
  * Semantics: for every left row, the SINGLE right row with the
  * greatest time `t` ≤ the left row's `t` (strictly `<` when
  * `inclusive = false`) within the same key `k`; among right rows at
  * that same time, the greatest `rid` wins (deterministic tie-break).
  *
  * The naive formulation is a per-key range theta-join
  * (`l.k = r.k AND r.t <= l.t` then argmax) — quadratic in rows per
  * key, a scale-killer on hot keys. This is the union-sort
  * reformulation: tag both sides, union, ONE window over
  * `(partition k; order t, side, rid)` carrying the latest right row
  * forward with `last(_, ignoreNulls)`. Cost: a single shuffle on `k`
  * plus a per-partition sort — linear in rows, the same plan any
  * windowed analytic needs, and the standard distributed as-of design
  * (same shape as Flink's temporal join / kdb's aj reformulations on
  * sorted partitions).
  *
  * Ordering correctness of the frame: right rows sort before left
  * rows at equal `t` when inclusive (after, when strict), so the
  * running `last` at each left row has seen exactly the admissible
  * right rows; right rows never tie with each other (`rid` unique),
  * so the result is deterministic even though left rows may tie.
  */
object AsOf {

  /** Contract: `left` has columns `k`, `t`, + payload; `right` has
    * `k`, `t`, `rid` (unique within (k, t)) + payload; payload names
    * must not collide across sides. Output: all left columns + right
    * payload columns (null when no admissible right row —
    * left-outer semantics; filter `rid IS NOT NULL` for inner).
    *
    * `tolerance`: maximum staleness — a right row older than
    * `t - tolerance` does not match (the pandas `merge_asof`
    * tolerance face). Requires a numeric `t` (the bound is
    * `l.t - r.t <= tolerance` in t's own units). Enforced by carrying
    * the matched row's time in a second `last` over the SAME window
    * spec — Spark evaluates both in one Window exec, so the plan
    * stays one shuffle + one sort.
    *
    * `forward`: match the EARLIEST right row at-or-after `t` instead
    * (pandas direction="forward"). Same machinery with the window
    * ordered by `t` DESC: the running `last` right row then is the
    * nearest one ABOVE the current time; the tie-break and tolerance
    * bound flip sign accordingly. Identical cost. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               inclusive: Boolean = true,
               tolerance: Option[Long] = None,
               forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val meta = Set("k", "t")
    val leftPayload = left.columns.toSeq.filterNot(meta)
    val rightPayload = right.columns.toSeq.filterNot(meta) // includes rid
    require(right.columns.contains("rid"), "right side needs a unique `rid` tie-break column")
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"payload name collision: ${leftPayload.intersect(rightPayload).mkString(",")}")
    tolerance.foreach { tol =>
      require(tol >= 0, s"tolerance must be non-negative, got $tol")
      require(left.schema("t").dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"tolerance requires a numeric t column, got ${left.schema("t").dataType}")
    }
    // the reformulation adds working columns — a payload column with one
    // of these names would be silently clobbered by withColumn
    val internal = Set("_side", "_tb", "_r", "_m", "_mt")
    val clash = (left.columns ++ right.columns).filter(internal).distinct
    require(clash.isEmpty,
      s"payload columns collide with asOfJoin internals: ${clash.mkString(",")} " +
        s"(reserved: ${internal.mkString(",")})")
    // rid is cast to long for the tie-break — a non-integral rid would
    // cast to null silently and break determinism
    val ridType = right.schema("rid").dataType
    require(Seq("byte", "short", "integer", "long").contains(ridType.typeName),
      s"rid must have an integral type, got $ridType")

    val (rightSide, leftSide) = if (inclusive) (0, 1) else (1, 0)
    val rStructCol = struct(rightPayload.map(col): _*)
    val rType = right.select(rStructCol.as("_r")).schema("_r").dataType

    val l2 = left.select(
      Seq(col("k"), col("t"), lit(leftSide).as("_side"),
        lit(Long.MaxValue).as("_tb"), lit(null).cast(rType).as("_r")) ++
        leftPayload.map(col): _*)
    val r2 = right.select(
      Seq(col("k"), col("t"), lit(rightSide).as("_side"),
        col("rid").cast("long").as("_tb"), rStructCol.as("_r")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val tOrder = if (forward) col("t").desc else col("t").asc
    val w = Window.partitionBy("k")
      .orderBy(tOrder, col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.unionByName(r2)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
    // _mt is non-null exactly where _r is (right rows), so the two
    // `last`s resolve to the same row — the matched row's time
    val staleness =
      if (forward) col("_mt") - col("t") else col("t") - col("_mt")
    val bounded = tolerance match {
      case Some(tol) => matched
        .withColumn("_mt",
          last(when(col("_side") === rightSide, col("t")), ignoreNulls = true).over(w))
        .withColumn("_m", when(staleness <= tol, col("_m")))
      case None => matched
    }
    bounded
      .where(col("_side") === leftSide)
      .select(
        Seq(col("k"), col("t")) ++ leftPayload.map(col) ++
          rightPayload.map(p => col("_m").getField(p).as(p)): _*)
  }
}
