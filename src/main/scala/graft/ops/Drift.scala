package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE definition of the exact-integer total-variation-distance
  * plumbing shared by the token-level `corpus_drift` monitor and the
  * embedding-index `occupancyDrift` monitor — the two restated it
  * independently until round 12, and the whole point of the
  * discipline is that a fix lands everywhere:
  *
  *  - Σ |cnt_a·tot_b − cnt_b·tot_a| in DECIMAL(38,0) — exact, and a
  *    100 TB count cannot overflow the widened cross products;
  *  - ONE final double division (0.5·sn / (ta·tb)) — no per-row
  *    transcendental, no order-dependent double summation, so the
  *    result is deterministic and survives the cross-engine hash
  *    gate;
  *  - totals join in as broadcast 1-row aggregates — no driver
  *    collect;
  *  - an empty side fails LOUDLY (a drift of nothing is a monitoring
  *    bug, not a zero).
  */
object Drift {

  /** Attach exact-TVD columns to a per-key count table: input is any
    * frame with long columns `cntA`/`cntB` (one row per key); output
    * is the input plus `_ta`, `_tb` (the two totals) and `_tvd` (the
    * UNROUNDED total-variation distance, identical on every row) —
    * callers shape/round their own report from these. */
  def withExactTvd(j: DataFrame, cntA: String, cntB: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tot = j.agg(sum(cntA).as("_ta"), sum(cntB).as("_tb"))
    val wj = j.crossJoin(broadcast(tot))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val tvdRow = wj
      .agg(sum(abs(dec(col(cntA)) * dec(col("_tb"))
        - dec(col(cntB)) * dec(col("_ta")))).as("_sn"),
        first("_ta").as("_ta"), first("_tb").as("_tb"))
      .select(when(col("_ta") > 0 && col("_tb") > 0,
        lit(0.5) * col("_sn").cast("double")
          / (col("_ta").cast("double") * col("_tb").cast("double")))
        .otherwise(raise_error(format_string(
          "exact TVD over an empty side (totals %s vs %s)",
          col("_ta").cast("string"), col("_tb").cast("string")))).as("_tvd"))
    wj.crossJoin(broadcast(tvdRow))
  }
}
